package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility: A/B-time row-local column formulations over a synthetic
  * corpus with the noop sink (guide §1.4) — used to measure candidate
  * expression-layer rewrites in isolation before integrating them.
  *
  * args: <nDocs> [arm ...]  (default: all arms, 2 passes each)
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 200000L
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // synthetic corpus: ~40 tokens/doc, zipf-ish vocabulary, stable
    val docs = spark.range(n).select($"id".as("doc_id"),
        concat_ws(" ", (0 until 40).map(j =>
          concat(lit("w"), pmod(xxhash64($"id" + lit(j * 7919)), lit(997)))): _*)
          .as("text"))
      .localCheckpoint() // corpus generation out of the timed region

    val k = 13
    val sentinel = lit(0x9E3779B97F4A7C15L)

    // OLD docShingles column form (HOFs)
    def oldShingles(text: Column): Column = {
      val toks = graft.functions.TextFunctions.tokens(text)
      val ths = transform(toks, t => xxhash64(t))
      val nn = size(ths)
      def shingleAt(i: Column): Column =
        xxhash64((0 until k).map(j =>
          coalesce(get(ths, i + lit(j)), sentinel)): _*)
      array_distinct(
        when(nn >= k,
            transform(sequence(lit(0), nn - k), i => shingleAt(i)))
          .otherwise(array(shingleAt(lit(0)))))
    }

    def newShingles(text: Column): Column =
      org.apache.spark.sql.GraftColumnBridge.column(
        graft.functions.ShingleHashes(
          org.apache.spark.sql.GraftColumnBridge.expression(text), k))

    def time(label: String, c: Column): Unit = {
      for (pass <- 1 to 2) {
        val t0 = System.nanoTime()
        docs.select($"doc_id", c.as("hs"))
          .select(sum(size($"hs"))) // force full evaluation, tiny result
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[microbench] $label pass=$pass wall=$dt%.2fs")
      }
    }

    // OLD streamingSpanDedup gram form (HOFs) vs GramHashes
    val gk = 5
    def oldGrams(text: Column): Column = {
      val ths = transform(graft.functions.TextFunctions.tokens(text),
        t => xxhash64(t))
      val sz = size(ths)
      def gramAt(i: Column): Column =
        xxhash64((0 until gk).map(j => get(ths, i + lit(j))): _*)
      when(sz >= gk,
          transform(sequence(lit(0), sz - gk),
            i => struct((i + 1).as("p"), gramAt(i).as("h"))))
        .otherwise(array().cast("array<struct<p:int,h:bigint>>"))
    }
    def newGrams(text: Column): Column =
      org.apache.spark.sql.GraftColumnBridge.column(
        graft.functions.GramHashes(
          org.apache.spark.sql.GraftColumnBridge.expression(text), gk))

    // tokenCount formulations: the regex counting loop vs a byte scan
    // (size(tokens) upper-bounds the byte-scan cost — it also slices
    // and materializes every token; a count-only kernel does neither)
    def timeCount(label: String, c: Column): Unit = {
      for (pass <- 1 to 2) {
        val t0 = System.nanoTime()
        docs.select(sum(c)).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[microbench] $label pass=$pass wall=$dt%.2fs")
      }
    }

    val arms = if (args.length > 1) args.drop(1).toSet else Set("old", "new")
    if (arms("tc")) {
      timeCount("tokenCount-regexloop",
        graft.functions.TextFunctions.tokenCount($"text"))
      timeCount("tokenCount-sizeTokens",
        size(graft.functions.TextFunctions.tokens($"text")))
      val tcDiff = docs.select(sum(
        (graft.functions.TextFunctions.tokenCount($"text") -
          size(graft.functions.TextFunctions.tokens($"text"))).cast("long")))
        .head().getLong(0)
      println(s"[microbench] tokenCount parity sum-of-diffs = $tcDiff (want 0)")
    }
    if (arms("old")) time("docShingles-HOF", oldShingles($"text"))
    if (arms("new")) time("docShingles-expr", newShingles($"text"))
    if (arms("old")) time("spanGrams-HOF", oldGrams($"text"))
    if (arms("new")) time("spanGrams-expr", newGrams($"text"))

    // sanity: identical distinct-hash MULTISETS per doc (order-free
    // compare here; the order-sensitive pin lives in DedupAnnSpec)
    val a = docs.limit(2000).select($"doc_id",
      array_sort(oldShingles($"text")).as("hs"))
    val b = docs.limit(2000).select($"doc_id",
      array_sort(newShingles($"text")).as("hs"))
    val diff = a.except(b).count() + b.except(a).count()
    println(s"[microbench] parity diff rows = $diff (want 0)")
    spark.stop()
  }
}
