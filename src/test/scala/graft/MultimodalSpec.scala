package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.multimodal.Multimodal

/** Multimodal binary-column plumbing: stub decode determinism, feature
  * vector shape, frame sampling, and the batched processing path. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = (1L to 10L).map { i =>
    (i, "image", Array.tabulate(256)(b => ((b * i) % 251).toByte))
  }.toDF("media_id", "media_type", "payload")

  test("decode stub is deterministic with plausible dimensions") {
    val d1 = media.select($"media_id", Multimodal.decodeStub($"payload").as("meta"))
      .select($"media_id", $"meta.width", $"meta.height", $"meta.duration_ms")
      .collect()
    val d2 = media.select($"media_id", Multimodal.decodeStub($"payload").as("meta"))
      .select($"media_id", $"meta.width", $"meta.height", $"meta.duration_ms")
      .collect()
    assert(d1.toSeq == d2.toSeq)
    d1.foreach { r =>
      assert(r.getAs[Int]("width") >= 1 && r.getAs[Int]("width") <= 1920)
      assert(r.getAs[Int]("height") >= 1 && r.getAs[Int]("height") <= 1080)
    }
  }

  test("feature extraction emits fixed-dim bounded vectors") {
    val f = media.select(Multimodal.featureExtract($"payload", 32).as("feat"))
      .collect()
    f.foreach { r =>
      val v = r.getSeq[Double](0)
      assert(v.length == 32)
      assert(v.forall(x => x >= -1.0 && x <= 1.0))
    }
  }

  test("resize stub preserves aspect ratio within the target box") {
    val out = media.select(Multimodal.decodeStub($"payload").as("meta"))
      .select(Multimodal.resizeStub($"meta", 640, 480).as("r"), $"meta")
      .collect()
    out.foreach { row =>
      val r = row.getStruct(0)
      val m = row.getStruct(1)
      val (w, h) = (r.getInt(0), r.getInt(1))
      assert(w <= 640 && h <= 480 && w >= 1 && h >= 1)
      // no upscaling
      assert(w <= m.getInt(0) && h <= m.getInt(1))
    }
  }

  test("frame sampling slices n windows of the payload") {
    val frames = media.select(Multimodal.frameSample($"payload", 4, 16).as("fr"))
      .collect()
    frames.foreach { r =>
      val fs = r.getSeq[Array[Byte]](0)
      assert(fs.length == 4)
      fs.foreach(f => assert(f.length == 16))
    }
  }

  test("batched processing preserves rows and appends columns") {
    val out = Multimodal.processBatches(media, batchSize = 3,
      StructType(Seq(StructField("n_bytes", IntegerType)))) { batch =>
      batch.map(r => Seq(r.getAs[Array[Byte]]("payload").length))
    }
    val rows = out.collect()
    assert(rows.length == 10)
    rows.foreach(r => assert(r.getAs[Int]("n_bytes") == 256))
  }
}
