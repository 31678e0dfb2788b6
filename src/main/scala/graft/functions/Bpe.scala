package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Real merge-table byte-pair-encoding tokenization (Sennrich et al. 2016;
  * the GPT-2 application algorithm): train merge rules from a corpus, then
  * encode text by repeatedly applying the lowest-rank applicable merge.
  * This is the trained-vocab path behind [[TextFunctions.bpeTokenCount]]'s
  * pre-tokenizer PROXY — a production pipeline meters and packs by actual
  * tokenizer counts ([[graft.sampling.Sampling.packSequences]] consumes
  * these directly).
  *
  * Scale design:
  *  - TRAINING runs on the word-frequency dict, not the corpus stream —
  *    one distributed pre-tokenize + groupBy pass reduces 100 TB of text
  *    to (distinct pre-token, count) rows, and only the top `maxWords`
  *    of those (frequency-ranked; rare words contribute negligibly to
  *    pair counts) are collected for the driver-side merge loop. This is
  *    the standard practical trainer shape (HF/sentencepiece train from
  *    in-memory word dicts the same way).
  *  - ENCODING is row-local: the ranks table rides an executor broadcast,
  *    and each task memoizes word → tokens (Zipf's law makes the cache
  *    hit rate extreme), so the corpus pass stays one narrow map.
  *  - Determinism: pair ties in training break on (count DESC, pair ASC);
  *    the word-dict cut breaks on (count DESC, word ASC). Same corpus →
  *    same merges on any partitioning, any engine.
  *
  * Encode/replay equivalence: [[encodeWord]] merges ALL occurrences of
  * the chosen pair per step (GPT-2 form). A one-occurrence-per-step
  * replay (the DuckDB recursive-CTE oracle form) produces the same final
  * sequence for any CONSISTENT merge table — one where every rule's
  * non-char symbol is produced by an earlier rule — because a new pair
  * created by a merge always carries a HIGHER rank than the rule just
  * applied, so the chosen pair stays chosen until its occurrences are
  * exhausted, left-to-right in both forms. Trained tables are consistent
  * by construction; BpeSpec asserts it.
  */
object Bpe {

  /** GPT-2-style pre-tokenizer — the SAME pattern as
    * [[TextFunctions.bpeTokenCount]] (x62 proved Spark/DuckDB regex
    * parity for it corpus-wide). Pure whitespace is dropped; a token
    * keeps its single leading space (" world" form). */
  val PreTokenPattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+"

  private val preTokenRegex = java.util.regex.Pattern.compile(PreTokenPattern)

  /** Pre-tokens of `text` in order (Java regex — identical engine family
    * to Spark's regexp_count, so counts always agree with the proxy). */
  def preTokenize(text: String): List[String] = {
    val m = preTokenRegex.matcher(text)
    val out = List.newBuilder[String]
    while (m.find()) out += m.group()
    out.result()
  }

  /** One word as its initial symbol sequence (Unicode code points, so a
    * surrogate pair is ONE symbol — matching DuckDB's per-codepoint '.'
    * regex split in the oracle replay). */
  private def codePoints(w: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** Classic BPE training over a word-frequency dict: `numMerges`
    * iterations of (count adjacent symbol pairs weighted by word count →
    * merge the most frequent everywhere). Stops early when no pair
    * repeats. Ties break on (count DESC, pair ASC) — deterministic. */
  def trainFromCounts(wordCounts: Seq[(String, Long)],
      numMerges: Int): Seq[(String, String)] = {
    var words: Array[(Array[String], Long)] =
      wordCounts.map { case (w, c) => (codePoints(w), c) }.toArray
    val merges = Seq.newBuilder[(String, String)]
    var iter = 0
    var done = false
    while (iter < numMerges && !done) {
      val counts = new java.util.HashMap[(String, String), Long]()
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.merge(p, c, _ + _)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        var best: (String, String) = null
        var bestC = Long.MinValue
        counts.forEach { (p, c) =>
          if (c > bestC || (c == bestC &&
              (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2))))
            { best = p; bestC = c }
        }
        // a pair seen once per corpus can't compress; standard stop
        if (bestC < 2) done = true
        else {
          merges += best
          words = words.map { case (syms, c) => (mergeAll(syms, best), c) }
          iter += 1
        }
      }
    }
    merges.result()
  }

  /** Distributed word-dict extraction + driver-side merge loop: ONE
    * corpus pass builds (pre-token, count); the top `maxWords` rows by
    * (count DESC, word ASC) train the merges. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      maxWords: Int = 50000): Seq[(String, String)] = {
    val wc = df
      .select(explode(regexp_extract_all(col(textCol),
        lit(PreTokenPattern), lit(0))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    trainFromCounts(wc, numMerges)
  }

  /** rank lookup table: pair → position in the merge list. */
  def ranks(merges: Seq[(String, String)]): Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  /** Merge every left-to-right non-overlapping occurrence of `pair`. */
  private def mergeAll(syms: Array[String],
      pair: (String, String)): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** GPT-2 encode of one pre-token: start from code points; repeatedly
    * merge all occurrences of the lowest-rank adjacent pair present in
    * the table until none applies. */
  def encodeWord(word: String,
      rk: Map[(String, String), Int]): Array[String] = {
    var syms = codePoints(word)
    var cont = syms.length > 1
    while (cont) {
      var best: (String, String) = null
      var bestR = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = rk.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestR) { bestR = r; best = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (best == null) cont = false
      else {
        syms = mergeAll(syms, best)
        cont = syms.length > 1
      }
    }
    syms
  }

  /** Serializable encoder function with a per-task word → tokens memo
    * (transient — rebuilt on each deserialization; Zipf makes the hit
    * rate extreme so each distinct word is merged once per task). */
  private final class Encoder(bc: Broadcast[Map[(String, String), Int]])
      extends (String => Seq[String]) with Serializable {
    @transient private lazy val cache =
      new java.util.HashMap[String, Array[String]]()
    def apply(text: String): Seq[String] = {
      if (text == null) return null
      val out = scala.collection.immutable.ArraySeq.newBuilder[String]
      preTokenize(text).foreach { w =>
        var enc = cache.get(w)
        if (enc == null) {
          enc = encodeWord(w, bc.value)
          if (cache.size < 200000) cache.put(w, enc)
        }
        out ++= enc
      }
      out.result()
    }
  }

  /** Trained-BPE tokens of `text` as an array column. The merges table
    * broadcasts once per session call site. */
  def bpeTokens(spark: SparkSession, text: Column,
      merges: Seq[(String, String)]): Column = {
    val bc = spark.sparkContext.broadcast(ranks(merges))
    udf(new Encoder(bc)).apply(text)
  }

  /** Trained-BPE token count — the metered budget surface
    * ([[TextFunctions.bpeTokenCount]] with a real vocabulary). */
  def bpeTokenCountTrained(spark: SparkSession, text: Column,
      merges: Seq[(String, String)]): Column =
    size(bpeTokens(spark, text, merges))
}
