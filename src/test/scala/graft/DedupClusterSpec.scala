package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Connected-component cluster assignment + benchmark decontamination
  * (Dedup.clusterAssignments / Dedup.decontaminate). */
class DedupClusterSpec extends SparkSpec {
  import spark.implicits._

  private def assignments(docIds: Seq[Long], pairs: Seq[(Long, Long)],
      maxRounds: Int = 20): Map[Long, (Long, Int)] = {
    val docs = docIds.toDF("doc_id")
    val p = pairs.toDF("id_a", "id_b")
    Dedup.clusterAssignments(docs, "doc_id", p, maxRounds)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2)))
      .toMap
  }

  test("chain component converges to the minimum across hops") {
    // 1-2, 2-3, 3-4: label 1 must travel 3 hops — pure transitivity, no
    // direct pair between 1 and 4
    val m = assignments(Seq(1L, 2L, 3L, 4L, 9L),
      Seq((1L, 2L), (2L, 3L), (3L, 4L)))
    assert(m(1L) == (1L, 1))
    assert(m(2L) == (1L, 0))
    assert(m(3L) == (1L, 0))
    assert(m(4L) == (1L, 0))
    assert(m(9L) == (9L, 1)) // isolated doc = its own canonical singleton
  }

  test("independent components keep independent minima") {
    val m = assignments(Seq(1L, 2L, 5L, 6L, 7L),
      Seq((1L, 2L), (6L, 5L), (6L, 7L)))
    assert(m(1L)._1 == 1L && m(2L)._1 == 1L)
    assert(m(5L)._1 == 5L && m(6L)._1 == 5L && m(7L)._1 == 5L)
    assert(m.values.count(_._2 == 1) == 2)
  }

  test("empty pair set yields all-singleton clusters") {
    val m = assignments(Seq(3L, 8L), Seq.empty)
    assert(m == Map(3L -> (3L, 1), 8L -> (8L, 1)))
  }

  test("pairs over docs absent from the doc frame do not create rows") {
    // (100, 101) is fully outside docs; (2, 100) is half outside — neither
    // may create a phantom output row or relabel through the phantom
    val m = assignments(Seq(1L, 2L), Seq((1L, 2L), (100L, 101L), (2L, 100L)))
    assert(m.keySet == Set(1L, 2L))
    assert(m(2L) == (1L, 0))
  }

  test("exceeding maxRounds fails loudly, not half-converged") {
    val e = intercept[IllegalArgumentException] {
      assignments(Seq(1L, 2L, 3L, 4L, 5L),
        Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)), maxRounds = 2)
    }
    assert(e.getMessage.contains("maxRounds"))
  }

  test("decontaminate counts shared distinct n-grams against the benchmark") {
    // train doc 1 embeds the benchmark 3-gram "a b c" twice (distinct
    // counts once); doc 2 has no 3-gram overlap; doc 3 is the full
    // benchmark string
    val train = Seq(
      (1L, "a b c x a b c"), // shingles: {a b c, b c x, c x a, x a b}
      (2L, "p q r s"),
      (3L, "a b c d")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "a b c d")).toDF("doc_id", "text")
    val got = Dedup.decontaminate(train, "doc_id", "text", bench, 3)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, 1L, 4L, 0.25), // only "a b c" shared, of 4 distinct shingles
      (3L, 2L, 2L, 1.0))) // "a b c" and "b c d" both in the benchmark
  }

  test("decontaminate short-doc partial shingle matches whole-string only") {
    // doc shorter than the shingle size contributes its full token
    // sequence as ONE shingle (shingleHashes contract) — it can only hit
    // a benchmark doc with the same property
    val train = Seq((1L, "a b"), (2L, "c d")).toDF("doc_id", "text")
    val bench = Seq((100L, "a b"), (101L, "a b c d")).toDF("doc_id", "text")
    val got = Dedup.decontaminate(train, "doc_id", "text", bench, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // "a b" (partial) matches bench partial "a b"; "c d" matches nothing
    // (bench 101 contributes full 3-grams, not the "c d" suffix)
    assert(got.toSeq == Seq((1L, 1L, 1L)))
  }

  test("nearDupSurvivors keeps one canonical doc per component") {
    val base = "q w e r t y u i o p"
    val docs = Seq(
      1L -> base, 2L -> s"$base a", 3L -> s"$base b", // 3-member component
      4L -> "z x c v b n m k j h",                    // unrelated singleton
      5L -> "f g h j k l m n b v", 6L -> "f g h j k l m n b v" // exact pair
    ).toDF("doc_id", "text")
    val got = Dedup.nearDupSurvivors(docs, "doc_id", "text",
      threshold = 0.7)
    assert(got.schema.fieldNames.toSeq == Seq("doc_id", "text")) // unchanged
    assert(got.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 4L, 5L))
  }

  test("decontaminate returns nothing on a disjoint corpus") {
    val train = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val bench = Seq((100L, "v w x y z")).toDF("doc_id", "text")
    assert(Dedup.decontaminate(train, "doc_id", "text", bench, 3).count() == 0L)
  }

  test("decontaminateBloom equals exact decontaminate, even under forced FPs") {
    val train = Seq(
      (1L, "a b c x a b c"), (2L, "p q r s"), (3L, "a b c d"),
      (4L, "m n o p q r"), (5L, "z z z y y y x x x w w w")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "a b c d"), (101L, "m n o p")).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSeq
    val exact = rows(Dedup.decontaminate(train, "doc_id", "text", bench, 3))
    assert(exact.nonEmpty)
    // healthy sizing
    val healthy = rows(Dedup.decontaminateBloom(train, "doc_id", "text",
      bench, 3, expectedItems = 1 << 12, fpp = 0.01))
    assert(healthy == exact)
    // pathological sizing (1 expected item, 40% fpp) floods the prefilter
    // with false positives — the verify join must still land on exact
    val flooded = rows(Dedup.decontaminateBloom(train, "doc_id", "text",
      bench, 3, expectedItems = 1, fpp = 0.4))
    assert(flooded == exact)
  }

  test("decontaminateBloom returns nothing on a disjoint corpus") {
    val train = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val bench = Seq((100L, "v w x y z")).toDF("doc_id", "text")
    assert(Dedup.decontaminateBloom(train, "doc_id", "text", bench, 3)
      .count() == 0L)
  }
}
