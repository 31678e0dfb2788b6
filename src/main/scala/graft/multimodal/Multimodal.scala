package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video payloads ride as opaque `binary` columns with typed metadata;
  * decode / feature-extract / resize / frame-sample are per-row or
  * per-batch transforms over those columns.
  *
  * The actual codec step is STUBBED (no image/audio libraries in this
  * container): [[decodeStub]] produces a deterministic fake decode from the
  * bytes. Everything around it — schema, batching shape, partitioning,
  * column plumbing — is real and tested, so a real codec drops into
  * [[processBatches]] unchanged.
  *
  * Scale notes: binary payloads make rows wide — keep
  * `spark.sql.files.maxPartitionBytes` low enough that a task's batch fits
  * memory, and never shuffle the binary column (derive features first,
  * then drop the payload before joins/aggregations).
  */
object Multimodal {

  /** Canonical media-table schema. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = true), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  /** STUB decode: a real implementation would parse the codec header. This
    * deterministic fake derives plausible dimensions from the payload hash
    * so downstream plumbing (schema, nullability, partitioning) is
    * exercised honestly. */
  def decodeStub(payload: Column): Column = {
    val h = xxhash64(payload)
    struct(
      (pmod(h, lit(1920)) + lit(1)).cast(IntegerType).as("width"),
      (pmod(shiftrightunsigned(h, 16), lit(1080)) + lit(1)).cast(IntegerType).as("height"),
      pmod(shiftrightunsigned(h, 32), lit(600000)).cast(LongType).as("duration_ms"))
  }

  /** Deterministic fixed-dim feature vector from the payload bytes (the
    * shape a real embedding model would emit). Codegen'd HOFs — no UDF. */
  def featureExtract(payload: Column, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)), i =>
      (pmod(xxhash64(payload, i), lit(2000)).cast(DoubleType) - lit(1000.0)) / lit(1000.0))

  /** STUB resize: recomputes metadata for a target box preserving aspect
    * ratio (the payload itself would be re-encoded by a real codec; here it
    * rides through untouched, clearly marked). */
  def resizeStub(meta: Column, maxW: Int, maxH: Int): Column = {
    val w = meta.getField("width").cast(DoubleType)
    val h = meta.getField("height").cast(DoubleType)
    val scale = least(lit(maxW) / w, lit(maxH) / h, lit(1.0))
    struct(
      ceil(w * scale).cast(IntegerType).as("width"),
      ceil(h * scale).cast(IntegerType).as("height"),
      meta.getField("duration_ms").as("duration_ms"))
  }

  /** Sample `n` fixed-width byte windows ("frames") from the payload. */
  def frameSample(payload: Column, n: Int, frameBytes: Int): Column = {
    val len = length(payload)
    transform(sequence(lit(0), lit(n - 1)), i => {
      val pos = (i * greatest(len - lit(frameBytes), lit(1)) / lit(n)) + lit(1)
      substring(payload, pos.cast(IntegerType), lit(frameBytes))
    })
  }

  /** Batched per-partition processing — the Scala analogue of a
    * pandas-UDF/`mapInPandas` pipeline: rows are chunked into fixed-size
    * batches and handed to `batchFn` (where a real vectorized decoder would
    * run), preserving the input schema plus the appended columns. */
  def processBatches(
      df: DataFrame,
      batchSize: Int,
      appended: StructType)(
      batchFn: Seq[Row] => Seq[Seq[Any]]): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ appended.fields)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val extras = batchFn(batch)
        require(extras.length == batch.length,
          s"batchFn returned ${extras.length} rows for a batch of ${batch.length}")
        batch.iterator.zip(extras.iterator).map { case (r, e) =>
          Row.fromSeq(r.toSeq ++ e)
        }
      }
    }(Encoders.row(outSchema))
  }
}
