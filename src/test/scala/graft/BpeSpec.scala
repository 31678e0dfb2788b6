package graft

import graft.functions.Bpe
import org.apache.spark.sql.functions._

/** Real merge-table BPE: trainer determinism on the classic corpus,
  * GPT-2 encode semantics (all-occurrence merges, overlap handling),
  * one-occurrence-per-step replay equivalence (the DuckDB oracle form),
  * consistency of trained tables, the Column surface, and sequence
  * packing driven by real trained-BPE counts. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // Sennrich et al. (2016) worked example
  private val classic =
    Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("trainer reproduces the classic merge order with deterministic ties") {
    val merges = Bpe.trainFromCounts(classic, 4)
    // (e,s) and (s,t) tie at 9 -> pair-ASC break picks (e,s); then
    // (es,t)=9; then (l,o)/(o,w) tie at 7 -> (l,o); then (lo,w)=7
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
  }

  test("encodeWord applies lowest-rank merges to a fixed point") {
    val rk = Bpe.ranks(Bpe.trainFromCounts(classic, 4))
    assert(Bpe.encodeWord("lowest", rk).toSeq == Seq("low", "est"))
    assert(Bpe.encodeWord("lows", rk).toSeq == Seq("low", "s"))
    assert(Bpe.encodeWord("xyz", rk).toSeq == Seq("x", "y", "z"))
    assert(Bpe.encodeWord("", rk).toSeq == Seq.empty)
  }

  test("overlapping occurrences merge left-to-right, non-overlapping") {
    val merges = Bpe.trainFromCounts(Seq(("aaaa", 3L)), 4)
    assert(merges == Seq(("a", "a"), ("aa", "aa")))
    val rk = Bpe.ranks(merges)
    assert(Bpe.encodeWord("aaa", rk).toSeq == Seq("aa", "a"))
    assert(Bpe.encodeWord("aaaa", rk).toSeq == Seq("aaaa"))
    assert(Bpe.encodeWord("aaaaa", rk).toSeq == Seq("aaaa", "a"))
  }

  /** The DuckDB oracle replays ONE occurrence of the best pair per
    * recursion step; encodeWord merges ALL occurrences per step. For
    * consistent (trained) tables the two agree — pinned here by a direct
    * simulation of the one-step form. */
  private def encodeOneAtATime(word: String,
      rk: Map[(String, String), Int]): Seq[String] = {
    var syms = word.toCharArray.map(_.toString).toVector
    var cont = true
    while (cont && syms.length > 1) {
      val ranks = syms.indices.dropRight(1)
        .map(i => rk.getOrElse((syms(i), syms(i + 1)), Int.MaxValue))
      val br = ranks.min
      if (br == Int.MaxValue) cont = false
      else {
        val bi = ranks.indexOf(br)
        syms = (syms.take(bi) :+ (syms(bi) + syms(bi + 1))) ++ syms.drop(bi + 2)
      }
    }
    syms
  }

  test("one-occurrence-per-step replay equals GPT-2 all-occurrence encode") {
    val corpus = Seq(("banana", 4L), ("bandana", 3L), ("anagram", 2L),
      ("naan", 5L), ("aaaa", 2L))
    val merges = Bpe.trainFromCounts(corpus, 10)
    val rk = Bpe.ranks(merges)
    val probes = corpus.map(_._1) ++ Seq("ana", "nanana", "banal", "aaab", "b")
    probes.foreach { w =>
      assert(Bpe.encodeWord(w, rk).toSeq == encodeOneAtATime(w, rk),
        s"replay divergence on '$w'")
    }
  }

  test("trained tables are consistent: every symbol is a char or an earlier merge") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val merges = Bpe.train(docs, "text", numMerges = 48)
    assert(merges.size == 48)
    val formed = scala.collection.mutable.Set[String]()
    merges.foreach { case (a, b) =>
      Seq(a, b).foreach { s =>
        assert(s.codePointCount(0, s.length) == 1 || formed.contains(s),
          s"symbol '$s' used before being formed")
      }
      formed += (a + b)
    }
    // training actually compresses: trained count strictly below the
    // char count and at or below the pre-tokenizer proxy ceiling is not
    // guaranteed in general, but ON THIS CORPUS (repeated small vocab)
    // trained tokens must beat per-char by a wide margin
    val rk = Bpe.ranks(merges)
    val sample = docs.select("text").limit(20).as[String].collect()
    sample.foreach { t =>
      val n = Bpe.preTokenize(t).map(w => Bpe.encodeWord(w, rk).length).sum
      assert(n < t.length * 7 / 10,
        s"no compression: $n tokens for ${t.length} chars")
    }
  }

  test("column surface matches driver encode; null text stays null") {
    val merges = Bpe.trainFromCounts(classic, 4)
    val df = Seq((1L, "the lowest low"), (2L, "newest widest"))
      .toDF("id", "text")
    val got = df.select($"id",
        Bpe.bpeTokens(spark, $"text", merges).as("toks"),
        Bpe.bpeTokenCountTrained(spark, $"text", merges).as("n"))
      .orderBy($"id").collect()
    def direct(t: String) =
      Bpe.preTokenize(t).flatMap(w => Bpe.encodeWord(w, Bpe.ranks(merges)))
    assert(got(0).getSeq[String](1) == direct("the lowest low"))
    assert(got(0).getInt(2) == direct("the lowest low").size)
    assert(got(1).getSeq[String](1) == direct("newest widest"))
    val withNull = Seq((1L, Option("low")), (2L, Option.empty[String]))
      .toDF("id", "text")
      .select(Bpe.bpeTokenCountTrained(spark, $"text", merges).as("n"))
      .orderBy($"n").collect()
    assert(withNull.exists(_.isNullAt(0)))
  }

  test("packSequences bins by real trained-BPE counts") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val merges = Bpe.train(docs, "text", numMerges = 48)
    val packed = graft.sampling.Sampling.packSequences(
      docs.withColumn("grp", lit("all")),
      "doc_id",
      Bpe.bpeTokenCountTrained(spark, col("text"), merges)
        .cast("long"),
      budgetTokens = 2048, partitionCols = Seq("grp"))
    val rows = packed.select($"doc_id", $"n_tokens", $"bin")
      .orderBy($"doc_id").collect()
    assert(rows.length == 500)
    // bins reproduce the exclusive-cumsum rule on the trained counts
    var cum = 0L
    rows.foreach { r =>
      assert(r.getLong(2) == cum / 2048L, s"bin mismatch at ${r.getLong(0)}")
      cum += r.getLong(1)
    }
    // counts are the REAL trained counts, not the proxy
    val rk = Bpe.ranks(merges)
    val d0 = docs.orderBy($"doc_id").select("text").as[String].head()
    assert(rows.head.getLong(1) ==
      Bpe.preTokenize(d0).map(w => Bpe.encodeWord(w, rk).length).sum)
  }
}
