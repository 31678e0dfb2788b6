package graft

import org.apache.spark.sql.functions._
import graft.ops.Skew
import graft.similarity.Ann

/** Skew utilities equal their unsalted forms; IVF ANN returns exact
  * cosines for its probed cells and finds planted exact matches. */
class SkewAnnIvfSpec extends SparkSpec {
  import spark.implicits._

  test("saltedAggregate equals plain groupBy sum under heavy skew") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 20000).map { i =>
      val k = if (i % 10 != 0) "hot" else s"k${rnd.nextInt(50)}"
      (k, rnd.nextInt(100).toDouble, i.toLong)
    }
    val df = rows.toDF("k", "v", "w")
    val plain = df.groupBy($"k")
      .agg(sum($"v").as("sv"), sum($"w").as("sw"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val salted = Skew.saltedAggregate(df, Seq("k"),
        Seq("sv" -> $"v", "sw" -> $"w"), buckets = 8)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(salted.keySet == plain.keySet)
    salted.foreach { case (k, (sv, sw)) =>
      assert(approxEqual(sv, plain(k)._1, 1e-9))
      assert(sw == plain(k)._2)
    }
  }

  test("saltedJoin equals plain join under heavy skew") {
    val left = (1 to 5000).map(i =>
      (if (i % 5 != 0) 1L else (i % 97).toLong, i)).toDF("k", "payload")
    val right = (0L to 100L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = left.join(right, Seq("k")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sortBy(t => (t._1, t._2))
    val salted = Skew.saltedJoin(left, right, Seq("k"), buckets = 8).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sortBy(t => (t._1, t._2))
    assert(salted.toSeq == plain.toSeq)
  }

  test("IVF top-k finds planted scaled copies with cosine 1") {
    val rnd = new scala.util.Random(21)
    val base = (0L until 60L).map(i => (i, Array.fill(8)(rnd.nextGaussian().toFloat)))
    val scaled = base.take(5).map { case (i, v) => (i + 500L, v.map(_ * 3.0f)) }
    val df = (base ++ scaled).toDF("vec_id", "embedding")
    val top = Ann.ivfTopK(df.filter($"vec_id" < 5), df, "vec_id", "embedding",
      k = 3, nLists = 4, nProbe = 2).cache()
    val rank1 = top.filter($"rank" === 1).collect()
    // a scaled copy is direction-identical → same k-means cell → rank 1
    rank1.foreach { r =>
      assert(r.getAs[Long]("cand_id") == r.getAs[Long]("query_id") + 500L)
      assert(approxEqual(r.getAs[Double]("cosine"), 1.0, 1e-5))
    }
    // cosines match brute force for probed candidates
    val brute = Ann.bruteForceTopK(df.filter($"vec_id" < 5), df, "vec_id",
      "embedding", k = 30).collect()
      .map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3))).toMap
    top.collect().foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      brute.get(key).foreach(c => assert(approxEqual(c, r.getDouble(3), 1e-9)))
    }
  }

  test("PQ top-k: scaled copies reconstruct cosine ~1; recall beats floor; layout-invariant") {
    val rnd = new scala.util.Random(21)
    val base = (0L until 60L).map(i => (i, Array.fill(8)(rnd.nextGaussian().toFloat)))
    val scaled = base.take(5).map { case (i, v) => (i + 500L, v.map(_ * 3.0f)) }
    val df = (base ++ scaled).toDF("vec_id", "embedding")
    val q = df.filter($"vec_id" < 5)
    val top = Ann.pqTopK(q, df, "vec_id", "embedding", k = 3,
      m = 4, ksub = 16).cache()
    // a scaled copy has the SAME normalized vector -> identical codes ->
    // ADC distance 0 to the query's quantized self -> reconstructed
    // cosine near 1 and rank 1 (with ksub=16 over 65 sample points the
    // quantization error is small but nonzero)
    top.filter($"rank" === 1).collect().foreach { r =>
      assert(r.getAs[Long]("cand_id") == r.getAs[Long]("query_id") + 500L,
        s"rank-1 not the planted copy: $r")
      assert(r.getAs[Double]("cosine") > 0.95)
    }
    val exact = Ann.bruteForceTopK(q, df, "vec_id", "embedding", k = 3)
    val rec = Ann.recallAtK(top, exact).head().getDouble(0)
    assert(rec >= 0.5, s"PQ recall@3 $rec below floor")
    // exact re-rank of an ADC shortlist recovers full recall here: the
    // true top-3 all sit inside the top-20 compressed shortlist
    val refined = Ann.pqTopK(q, df, "vec_id", "embedding", k = 3,
      m = 4, ksub = 16, rerank = 20)
    val recR = Ann.recallAtK(refined, exact).head().getDouble(0)
    assert(recR == 1.0, s"reranked PQ recall@3 $recR != 1.0")
    // deterministic under any partitioning
    val re = Ann.pqTopK(q, df.repartition(7), "vec_id", "embedding",
      k = 3, m = 4, ksub = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val orig = top.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(re.sortBy(x => (x._1, x._2)).toSeq == orig.sortBy(x => (x._1, x._2)).toSeq)
  }

  test("PQ rejects a dimension that does not split into m subspaces") {
    val df = Seq((1L, Array(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Ann.pqTopK(df, df, "vec_id", "embedding", k = 1, m = 2, ksub = 2)
    }
    assert(e.getMessage.contains("subspaces"))
  }

  test("recallAtK: exact overlap fraction; self-recall is 1") {
    val exact = Seq((1L, 1, 10L, 0.9), (1L, 2, 11L, 0.8),
      (2L, 1, 20L, 0.7), (2L, 2, 21L, 0.6))
      .toDF("query_id", "rank", "cand_id", "cosine")
    // approx hits 3 of the 4 exact pairs (misses (2,21)); its extra
    // pair (2,99) must not count
    val approx = Seq((1L, 1, 10L, 0.9), (1L, 2, 11L, 0.8),
      (2L, 1, 20L, 0.7), (2L, 2, 99L, 0.5))
      .toDF("query_id", "rank", "cand_id", "cosine")
    assert(Ann.recallAtK(approx, exact).head().getDouble(0) == 0.75)
    assert(Ann.recallAtK(exact, exact).head().getDouble(0) == 1.0)
    assert(Ann.recallAtK(exact.limit(0), exact).head().getDouble(0) == 0.0)
  }

  test("IVF trains without a corpus-sizing count job") {
    // the bottom-4096-by-hash sample must plan as TakeOrderedAndProject;
    // a standalone count() before training was the round-6 advisory nit
    val rnd = new scala.util.Random(5)
    val df = (0L until 200L).map(i => (i, Array.fill(4)(rnd.nextGaussian())))
      .toDF("vec_id", "embedding")
    assert(Ann.ivfTopK(df.limit(3), df, "vec_id", "embedding", k = 2,
      nLists = 4, nProbe = 1).count() > 0)
    // a local relation has known maxRows so Catalyst may eliminate the
    // Limit (sample = whole small corpus — still deterministic); the
    // production shape is a parquet scan with unknown maxRows, where the
    // orderBy+limit MUST plan as the per-partition-heap top-k
    val dir = java.nio.file.Files.createTempDirectory("ivf_plan").toString
    df.write.mode("overwrite").parquet(dir)
    val fromDisk = spark.read.parquet(dir)
    val trainPlan = fromDisk.select($"vec_id".as("cand_id"))
      .orderBy(xxhash64($"cand_id"), $"cand_id").limit(4096)
      .queryExecution.executedPlan.toString
    assert(trainPlan.contains("TakeOrderedAndProject"), trainPlan)
  }

  test("routed large-k IVF finds planted scaled copies; deterministic under repartition") {
    // nLists past FlatQuantizerMax dispatches to the two-level routed
    // arm: assignment routes O(sqrt k) per row and queries probe the
    // ROUTED space. Planted 2x copies are direction-identical with
    // their base, so base-as-query routes to the copy's cell first and
    // must return it at rank 1 with exact cosine 1.0.
    val isCopy = pmod($"id", lit(101)) === 0 && $"id" > 0
    val srcId = when(isCopy, $"id" - 1).otherwise($"id")
    val dims = (0 until 16).map(i =>
      ((pmod(xxhash64(srcId, lit(i)), lit(2001)).cast("double") / 1000.0
        - 1.0) * when(isCopy, 2.0).otherwise(1.0)).cast("float"))
    val df = spark.range(2000)
      .select($"id".as("vec_id"), array(dims: _*).as("embedding"))
    val probes = df.filter(pmod($"vec_id", lit(101)) === 100 &&
      $"vec_id" < 101L * 6)
    def rank1(c: org.apache.spark.sql.DataFrame) =
      Ann.ivfTopK(probes, c, "vec_id", "embedding", k = 3,
          nLists = 300, nProbe = 4)
        .filter($"rank" === 1).orderBy($"query_id").collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSeq
    val got = rank1(df)
    assert(got.size == 6)
    got.foreach { case (q, cand, cos) =>
      assert(cand == q + 1 && cos == 1.0, s"planted copy not rank-1: $q -> $cand ($cos)")
    }
    assert(rank1(df.repartition(7)) == got, "routed IVF not layout-deterministic")
  }
}
