package graft

import org.apache.spark.sql.functions._
import graft.sampling.Dsir

/** DSIR importance resampling: feature extraction, the smoothed
  * log-ratio model, weight ranking, and both samplers. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // two "domains" with disjoint vocabulary: target-like docs repeat
  // "alpha beta", background docs repeat "gamma delta"
  private def corpus() = Seq(
    (1L, "alpha beta alpha"), // target-like
    (2L, "alpha beta beta"), // target-like
    (3L, "gamma delta gamma"), // background
    (4L, "gamma delta delta"), // background
    (5L, "alpha delta"), // mixed
    (6L, ""), // empty: weight 0
    (7L, "   ") // whitespace-only: weight 0
  ).toDF("doc_id", "text")
  private def target() = Seq(
    (101L, "alpha beta"), (102L, "beta alpha alpha")
  ).toDF("doc_id", "text")

  test("featureBuckets emits one bucket row per unigram and bigram") {
    val f = Dsir.featureBuckets(corpus(), "doc_id", "text")
      .groupBy($"doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // n tokens → n unigrams + (n-1) bigrams; empty docs emit nothing
    assert(f == Map(1L -> 5L, 2L -> 5L, 3L -> 5L, 4L -> 5L, 5L -> 3L))
    // identical text hashes to identical buckets regardless of doc
    val b = Dsir.featureBuckets(
        Seq((1L, "x y"), (2L, "x y")).toDF("doc_id", "text"),
        "doc_id", "text")
      .groupBy($"bucket").count().collect().map(_.getLong(1))
    assert(b.sorted.toSeq == Seq(2L, 2L, 2L)) // "x", "y", "x y" — twice each
  }

  test("weights replay the closed-form smoothed log-ratio and rank by domain") {
    val w = Dsir.importanceWeights(corpus(), target(), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(w.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L, 7L))
    assert(w(6L) == (0L, 0.0) && w(7L) == (0L, 0.0))
    // closed form: raw corpus has 23 feature occurrences, target 8;
    // B = 4096 buckets. Weight(doc) = Σ_f [ln((ct+1)/(8+4096)) −
    // ln((cr+1)/(23+4096))] over the doc's own features — replayed
    // driver-side with the SAME bucket collisions (md5-keyed counts).
    val feats = Dsir.featureBuckets(corpus(), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toSeq
    val tfeats = Dsir.featureBuckets(target(), "doc_id", "text")
      .collect().map(_.getString(1)).toSeq
    val rawC = feats.groupBy(_._2).view.mapValues(_.size).toMap
    val tgtC = tfeats.groupBy(identity).view.mapValues(_.size).toMap
    val (nr, nt) = (feats.size.toDouble, tfeats.size.toDouble)
    assert(nr == 23.0 && nt == 8.0)
    def ref(id: Long): Double = {
      val s = feats.filter(_._1 == id).map(_._2).map { b =>
        math.log((tgtC.getOrElse(b, 0) + 1) / (nt + 4096.0)) -
          math.log((rawC(b) + 1) / (nr + 4096.0))
      }.sum
      BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    Seq(1L, 2L, 3L, 4L, 5L).foreach(id =>
      assert(w(id)._2 == ref(id), s"doc $id: ${w(id)._2} != ${ref(id)}"))
    // target-vocabulary docs outrank background; mixed sits between
    assert(Seq(w(1L), w(2L)).map(_._2).min >
      Seq(w(3L), w(4L)).map(_._2).max)
    assert(w(5L)._2 > Seq(w(3L), w(4L)).map(_._2).max)
    assert(w(5L)._2 < Seq(w(1L), w(2L)).map(_._2).min)
  }

  // content docs only: at toy scale the add-one smoothing offset makes
  // EVERY content doc's weight negative (raw counts systematically
  // exceed target counts against the same +1/B floor), so zero-weight
  // empty docs would top any ranking — the invariant worth pinning is
  // the ORDER AMONG CONTENT DOCS, which the offset cannot move
  private def contentCorpus() = corpus().filter($"doc_id" <= 5)

  test("resampleTopK keeps the k most target-like docs in weight order") {
    val sel = Dsir.resampleTopK(contentCorpus(), target(),
        "doc_id", "text", k = 3)
      .orderBy($"sample_rank")
      .collect().map(r => (r.getLong(0), r.getInt(3)))
    assert(sel.map(_._2).toSeq == Seq(1, 2, 3))
    // target-vocab docs 1, 2 lead; the mixed doc 5 beats pure background
    assert(sel.map(_._1).toSeq == Seq(1L, 2L, 5L), sel.mkString(","))
    // the plan selects k without a global sort
    val plan = Dsir.resampleTopK(contentCorpus(), target(),
        "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k selection is not TakeOrderedAndProject:\n$plan")
  }

  test("resampleGumbel is seed-deterministic and converges to top-k as T→0") {
    val g1 = Dsir.resampleGumbel(corpus(), target(), "doc_id", "text",
      k = 3, seed = 7L).collect().map(r => (r.getLong(0), r.getDouble(3)))
    val g2 = Dsir.resampleGumbel(corpus(), target(), "doc_id", "text",
      k = 3, seed = 7L).collect().map(r => (r.getLong(0), r.getDouble(3)))
    assert(g1.toSeq == g2.toSeq, "same seed must reproduce the sample")
    // cold temperature on DISTINCT weights: the weight/T term dwarfs the
    // O(1) noise, so the sample equals deterministic top-k in order
    // (exactly-tied weights would legitimately order by noise instead)
    val cold = Dsir.resampleGumbel(contentCorpus(), target(), "doc_id",
        "text", k = 3, seed = 7L, temperature = 1e-9)
      .orderBy($"sample_rank").collect().map(_.getLong(0))
    val det = Dsir.resampleTopK(contentCorpus(), target(), "doc_id",
        "text", 3)
      .orderBy($"sample_rank").collect().map(_.getLong(0))
    assert(cold.toSeq == det.toSeq)
  }

  test("hexChars guards are honest: bucket relations cap at 6, the " +
      "frozen plan-literal model at 4") {
    // 16^7 would be a 268M-row "bounded" relation — the guard must
    // refuse what the implementation cannot honor (r12 review item)
    val e1 = intercept[IllegalArgumentException](
      Dsir.featureBuckets(corpus(), "doc_id", "text", hexChars = 7))
    assert(e1.getMessage.contains("1..6"))
    val e2 = intercept[IllegalArgumentException](
      Dsir.fitModel(corpus(), target(), "doc_id", "text", hexChars = 5))
    assert(e2.getMessage.contains("1..4"))
    // the honored ceilings still work end-to-end at gate scale
    assert(Dsir.importanceWeights(corpus(), target(), "doc_id", "text",
      hexChars = 6).count() > 0)
    assert(Dsir.scoreWithModel(corpus(), "doc_id", "text",
      Dsir.fitModel(corpus(), target(), "doc_id", "text", hexChars = 4))
      .count() > 0)
  }
}
