package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions, VectorFunctions}

/** Document deduplication at corpus scale: exact, MinHash+LSH, SimHash,
  * n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Scale design: every variant is
  *   per-row signature (codegen'd expressions, no UDFs)
  *   → band/bucket key explode
  *   → shuffle ON THE BUCKET KEY ONLY (candidate generation)
  *   → pairwise verify INSIDE buckets.
  * The quadratic blow-up is confined to same-bucket groups; there is no
  * corpus-wide cross join anywhere. Signatures are deterministic
  * (xxhash64-derived), so recomputation on another cluster or a re-run
  * yields identical buckets — no fitted model to persist.
  */
object Dedup {

  /** Exact dedup: keep the smallest id per identical content hash.
    * One hash-shuffle; the md5 pre-hash keeps the shuffle rows narrow
    * (16 bytes instead of full documents). */
  def exactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), md5(col(textCol)).as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** MinHash signature component `i`: min over shingle hashes with the
    * hash family indexed by seeding the input. */
  private def minhashComponent(shingles: Column, i: Int): Column =
    array_min(transform(shingles, s => xxhash64(s, lit(i))))

  /** MinHash + LSH banding near-dup candidate pairs, verified with exact
    * shingle-set Jaccard. `bands`×`rowsPerBand` hash functions; a pair is a
    * candidate if any band agrees fully.
    *
    * @return (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold
    */
  def minhashNearDuplicates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      bands: Int = 4,
      rowsPerBand: Int = 4,
      threshold: Double = 0.7): DataFrame = {
    val sh = TextFunctions.shingles(col(textCol), shingleSize)
    val sig = df.select(col(idCol).as("id"), sh.as("sh"))
      .withColumn("bands", array((0 until bands).map { b =>
        // band hash = hash of the concatenated minhash components
        hash((0 until rowsPerBand).map(r =>
          minhashComponent(col("sh"), b * rowsPerBand + r)): _*)
      }: _*))
    val banded = sig.select(col("id"), col("sh"),
      posexplode(col("bands")).as(Seq("band_id", "band_hash")))
    val a = banded.select(col("band_id"), col("band_hash"),
      col("id").as("id_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band_id"), col("band_hash"),
      col("id").as("id_b"), col("sh").as("sh_b"))
    val cand = a.join(b, Seq("band_id", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b").distinct()
    cand
      .withColumn("jaccard", jaccardArrays(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Exact Jaccard similarity of two array columns (as sets). */
  def jaccardArrays(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni > 0, inter / uni).otherwise(lit(0.0))
  }

  /** 64-bit SimHash over token hashes: bit b of the signature is the sign
    * of Σ_tokens (±1 by bit b of xxhash64(token)). Pure HOF expressions —
    * the token-hash array is computed once and scanned per bit; packing
    * uses compile-time shifts (bit ops, ANSI-safe). */
  def simhash(text: Column): Column = {
    val hs = transform(TextFunctions.tokens(text), t => xxhash64(t))
    (0 until 64).map { b =>
      when(aggregate(hs, lit(0L), (acc, h) =>
        acc + when(shiftrightunsigned(h, b).bitwiseAND(1L) === 1L, lit(1L))
          .otherwise(lit(-1L))) > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
  }

  /** SimHash near-dups: LSH on 16-bit sub-bands of the 64-bit signature,
    * verified by Hamming distance <= maxHamming. */
  def simhashNearDuplicates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sig = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sig"))
    val banded = sig.select(col("id"), col("sig"), posexplode(array(
      (0 until 4).map(b =>
        shiftrightunsigned(col("sig"), b * 16).bitwiseAND(0xFFFFL)): _*))
      .as(Seq("band_id", "band_val")))
    val a = banded.select(col("band_id"), col("band_val"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band_id"), col("band_val"),
      col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band_id", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** n-gram Jaccard near-dups with a cheap single-minhash pre-bucket to
    * avoid the full cross join; verify with exact Jaccard. */
  def ngramJaccardNearDuplicates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val base = df.select(col(idCol).as("id"),
      TextFunctions.shingles(col(textCol), n).as("sh"))
    // bucket on the k smallest shingle hashes — near-dups share one with
    // high probability
    val k = 3
    val banded = base
      .withColumn("hs", array_sort(transform(col("sh"), s => xxhash64(s))))
      .select(col("id"), col("sh"),
        explode(slice(col("hs"), 1, k)).as("bucket"))
    val a = banded.select(col("bucket"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = banded.select(col("bucket"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b").distinct()
      .withColumn("jaccard", jaccardArrays(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Embedding-cosine near-dups via hyperplane-LSH buckets; exact cosine
    * verify inside buckets. */
  def embeddingNearDuplicates(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      nPlanes: Int = 8,
      threshold: Double = 0.95): DataFrame = {
    val v = df.select(col(idCol).as("id"),
      VectorFunctions.asDouble(col(vecCol)).as("v"))
      .withColumn("bucket", VectorFunctions.lshBucket(col("v"), nPlanes))
    val a = v.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val b = v.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", VectorFunctions.cosine(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }
}
