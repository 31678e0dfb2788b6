package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis functions for training-data pipelines: token counting,
  * quality scoring, language ID, shingling, and document fingerprinting.
  * All are composed from codegen'd built-ins (regexp, higher-order array
  * functions, xxhash64) — no UDFs, fully distributed, deterministic.
  */
object TextFunctions {

  /** Deterministic train/val/test assignment by content hash — the
    * reproducible-split primitive a training-data pipeline needs: the same
    * (key) lands in the same split on any engine, any partitioning, any
    * run. Buckets compare the first two lowercase-hex chars of md5(key)
    * (256 buckets): [0, trainHi) -> train, [trainHi, valHi) -> val, rest
    * test. Engine-portable (DuckDB md5 produces the identical string), so
    * the op is value-oracled end-to-end. */
  def deterministicSplit(key: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    require(trainPct >= 0 && valPct >= 0, "split percentages must be non-negative")
    require(trainPct + valPct < 100, "need a non-empty test split")
    def hex2(n: Int): String = f"${n * 256 / 100}%02x"
    val bucket = substring(md5(key.cast("string")), 1, 2)
    when(bucket < lit(hex2(trainPct)), lit("train"))
      .when(bucket < lit(hex2(trainPct + valPct)), lit("val"))
      .otherwise(lit("test"))
  }

  /** Token count: number of \S+ runs (whitespace pre-tokenization). */
  def tokenCount(text: Column): Column = regexp_count(text, lit("\\S+"))

  /** BPE-ish token count: GPT-2-style pre-tokenizer pattern — contractions,
    * letter runs, digit runs, punctuation runs (each optionally preceded by
    * a space). A cheap, deterministic proxy for LLM token budgets. */
  def bpeTokenCount(text: Column): Column =
    regexp_count(text,
      lit("'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+"))

  /** Whitespace tokens as an array (empty tokens removed). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** Punctuation character count (explicit class — portable regex). */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,!?;:'\"()\\-]", ""))

  /** Ratio of tokens that are in `stopwords`. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(text)
    val stops = filter(toks, t => t.isin(stopwords.map(lit): _*))
    when(size(toks) > 0, size(stops).cast("double") / size(toks).cast("double"))
  }

  /** Composite quality score in [0,1]: length sweet-spot, low punctuation
    * density, healthy stopword ratio — the standard cheap pre-filter for
    * web-scale corpora. */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val nTok = tokenCount(text).cast("double")
    val lenScore = least(nTok / lit(50.0), lit(1.0))
    val punctDensity = punctCount(text).cast("double") / greatest(length(text), lit(1)).cast("double")
    val punctScore = greatest(lit(1.0) - punctDensity * lit(5.0), lit(0.0))
    val swr = coalesce(stopwordRatio(text, stopwords), lit(0.0))
    val swScore = least(swr * lit(4.0), lit(1.0))
    round((lenScore + punctScore + swScore) / lit(3.0), 6)
  }

  /** Marker words per language for the n-gram/stopword language-ID
    * heuristic. Deterministic argmax with lexicographic tie-break. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "est"),
    "zh" -> Seq("的", "了", "是", "我", "不", "在", "有", "这"))

  /** Language ID: most marker hits wins; ties resolve to the
    * lexicographically-earliest tied language (deterministic); zero hits
    * for every language → "und". */
  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    val scores: Seq[(String, Column)] = langMarkers.toSeq.sortBy(_._1).map {
      case (lang, markers) =>
        lang -> size(filter(toks, t => t.isin(markers.map(lit): _*)))
    }
    // argmax with deterministic tie-break: earlier (lexicographic) lang wins
    // strictly-greater comparison.
    val best = scores.tail.foldLeft((lit(scores.head._1), scores.head._2)) {
      case ((bl, bs), (lang, sc)) =>
        (when(sc > bs, lit(lang)).otherwise(bl), when(sc > bs, sc).otherwise(bs))
    }
    when(best._2 > 0, best._1).otherwise(lit("und"))
  }

  /** Word n-gram shingles from the token array. */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - lit(n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** Rolling-hash document fingerprint (winnowing-lite): min/max/count of
    * shingle hashes — a compact, deterministic signature for fast
    * candidate filtering. */
  def fingerprint(text: Column, n: Int): Column = {
    val hs = transform(shingles(text, n), s => xxhash64(s))
    struct(
      array_min(hs).as("min_hash"),
      array_max(hs).as("max_hash"),
      size(hs).as("n_shingles"))
  }
}
