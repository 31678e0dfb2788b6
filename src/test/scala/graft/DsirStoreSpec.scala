package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import graft.lake.Lake
import graft.sampling.{Dsir, DsirStore}

/** Incremental DSIR ≡ the one-shot operator, exactly: counts are
  * additive integers, so batch composition and takedown carry none of
  * the vector indexes' frozen-trainer drift caveats. */
class DsirStoreSpec extends SparkSpec {
  import spark.implicits._

  private def raw() = Seq(
    (1L, "alpha beta alpha"), (2L, "alpha beta beta"),
    (3L, "gamma delta gamma"), (4L, "gamma delta delta"),
    (5L, "alpha delta"), (6L, "")
  ).toDF("doc_id", "text")
  private def target() = Seq(
    (101L, "alpha beta"), (102L, "beta alpha alpha")
  ).toDF("doc_id", "text")

  private def rows(df: DataFrame): Seq[(Long, Long, Double)] =
    df.orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("two-batch composition equals the one-shot weights byte-for-byte") {
    val store = new DsirStore(
      new Lake(spark, Files.createTempDirectory("dsirstore").toString))
    store.appendRaw(raw().filter($"doc_id" <= 3), "doc_id", "text", 1L)
    store.appendRaw(raw().filter($"doc_id" > 3), "doc_id", "text", 2L)
    store.appendTarget(target(), "doc_id", "text", 3L)
    val got = rows(store.weights(raw(), "doc_id", "text"))
    val oneShot = rows(Dsir.importanceWeights(raw(), target(),
      "doc_id", "text"))
    assert(got == oneShot && got.nonEmpty)
  }

  test("the memoized model serves repeated weights() calls and every " +
      "mutation invalidates it") {
    val store = new DsirStore(
      new Lake(spark, Files.createTempDirectory("dsirstore_c").toString))
    store.appendRaw(raw(), "doc_id", "text", 1L)
    store.appendTarget(target().filter($"doc_id" === 101L),
      "doc_id", "text", 2L)
    val w1 = rows(store.weights(raw(), "doc_id", "text"))
    // repeat without mutation: cache-served, identical bytes
    assert(rows(store.weights(raw(), "doc_id", "text")) == w1)
    // a target append CHANGES the model — a stale cache would keep w1
    store.appendTarget(target().filter($"doc_id" === 102L),
      "doc_id", "text", 3L)
    val w2 = rows(store.weights(raw(), "doc_id", "text"))
    assert(w2 == rows(Dsir.importanceWeights(raw(), target(),
      "doc_id", "text")), "post-append weights diverged from one-shot")
    assert(w2 != w1, "the appended target sample did not move the model")
    // compact must also invalidate (it rewrites the delta relations)
    store.compact(4L)
    assert(rows(store.weights(raw(), "doc_id", "text")) == w2)
    // takedown invalidates too: removing 102 restores the w1 model
    store.deleteTarget(target().filter($"doc_id" === 102L),
      "doc_id", "text", 5L)
    assert(rows(store.weights(raw(), "doc_id", "text")) == w1)
  }

  test("takedown equals a pool that never ingested the victims") {
    val store = new DsirStore(
      new Lake(spark, Files.createTempDirectory("dsirstoreDel").toString))
    store.appendRaw(raw(), "doc_id", "text", 1L)
    store.appendTarget(target(), "doc_id", "text", 2L)
    val victims = raw().filter($"doc_id".isin(3L, 4L))
    store.deleteRaw(victims, "doc_id", "text", 3L)
    val kept = raw().filter(!$"doc_id".isin(3L, 4L))
    val got = rows(store.weights(kept, "doc_id", "text"))
    val never = rows(Dsir.importanceWeights(kept, target(), "doc_id", "text"))
    assert(got == never && got.nonEmpty, "takedown != never-ingested")
    // compact collapses deltas and drops zeroed buckets; model unchanged
    val lake = new Lake(spark,
      Files.createTempDirectory("dsirstoreDel2").toString)
    val s2 = new DsirStore(lake)
    s2.appendRaw(raw(), "doc_id", "text", 1L)
    s2.appendTarget(target(), "doc_id", "text", 2L)
    s2.deleteRaw(victims, "doc_id", "text", 3L)
    s2.compact(4L)
    assert(rows(s2.weights(kept, "doc_id", "text")) == never)
    // gamma/delta-only buckets zeroed out by the takedown are PHYSICALLY
    // gone after compact: stored rows = live buckets of the kept corpus
    val liveBuckets = Dsir.featureBuckets(kept, "doc_id", "text")
      .select($"bucket").distinct().count()
    assert(lake.table(s2.rawTable).count() == liveBuckets)
  }

  test("streaming ingestion through foreachBatch equals the one-shot model") {
    // count deltas are additive, so micro-batch appends compose exactly —
    // the streaming leg of the DSIR matrix is the incremental store fed
    // from a stream, no separate operator needed
    import org.apache.spark.sql.types._
    val docDir = Files.createTempDirectory("dsirstream2").toString
    raw().write.mode("append").parquet(docDir)
    val lake = new Lake(spark,
      Files.createTempDirectory("dsirstoreStream").toString)
    val store = new DsirStore(lake)
    store.appendTarget(target(), "doc_id", "text", 1L)
    val version = new java.util.concurrent.atomic.AtomicLong(2L)
    val q = spark.readStream.schema(StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType))))
      .parquet(docDir)
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        store.appendRaw(b, "doc_id", "text", version.getAndIncrement())
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = rows(store.weights(raw(), "doc_id", "text"))
    val oneShot = rows(Dsir.importanceWeights(raw(), target(),
      "doc_id", "text"))
    assert(got == oneShot && got.nonEmpty,
      "stream-fed store diverges from the one-shot operator")
  }

  test("deleting never-ingested docs fails loudly at model time") {
    val store = new DsirStore(
      new Lake(spark, Files.createTempDirectory("dsirstoreBad").toString))
    store.appendRaw(raw().filter($"doc_id" <= 2), "doc_id", "text", 1L)
    store.appendTarget(target(), "doc_id", "text", 2L)
    store.deleteRaw(Seq((99L, "totally novel words")).toDF("doc_id", "text"),
      "doc_id", "text", 3L)
    val e = intercept[IllegalStateException] {
      store.model(spark).collect()
    }
    assert(e.getMessage.contains("negative merged count"))
    // compact refuses to persist the corruption too
    val e2 = intercept[IllegalStateException] { store.compact(4L) }
    assert(e2.getMessage.contains("refusing to compact"))
  }
}
