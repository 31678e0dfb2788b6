package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import graft.dedup.{Dedup, SemDeDupIndex}
import graft.lake.Lake

/** Incremental SemDeDup ≡ the one-shot batch operator with the
  * quantizer frozen: one-shot parity, batch-composition associativity,
  * cluster merges that move prior labels, and the id-collision guard. */
class SemDeDupIndexSpec extends SparkSpec {
  import spark.implicits._

  // deterministic embeddings with planted semantic twins: every 5th id
  // carries a 0.5-scaled copy under id+1000 (the x83 construction)
  private def vec(id: Long): Seq[Float] = {
    val base = if (id >= 1000) id - 1000 else id
    val rnd = new scala.util.Random(base)
    val center = (base % 3).toInt
    val v = (0 until 6).map(d =>
      (if (d % 3 == center) 2.0 else 0.0) + rnd.nextGaussian() * 0.2)
    val s = if (id >= 1000) 0.5 else 1.0
    v.map(x => (x * s).toFloat)
  }
  private def corpus(ids: Seq[Long]): DataFrame =
    ids.map(i => (i, vec(i))).toDF("vec_id", "embedding")

  private def rows(df: DataFrame): Seq[(Long, Long, Int)] =
    df.orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq

  private val allIds: Seq[Long] =
    (0L until 200L) ++ (0L until 200L).filter(_ % 5 == 0).map(_ + 1000L)

  test("build + single append equals one-shot semanticDedup byte-for-byte") {
    val dir = Files.createTempDirectory("semidx1").toString
    val idx = new SemDeDupIndex(new Lake(spark, dir), nClusters = 8)
    val c = corpus(allIds)
    idx.build(c, "vec_id", "embedding", 1L)
    val got = rows(idx.append(c, "vec_id", "embedding", 2L))
    val oneShot = rows(Dedup.semanticDedup(c, "vec_id", "embedding",
      nClusters = 8))
    assert(got == oneShot && got.nonEmpty)
    // planted twins all dedup into their base's cluster
    val m = got.map(r => r._1 -> r).toMap
    allIds.filter(_ >= 1000L).foreach { i =>
      assert(m(i)._3 == 0 && m(i)._2 <= i - 1000L, s"twin $i not deduped")
    }
  }

  test("two-batch composition equals the one-batch append byte-for-byte") {
    val c = corpus(allIds)
    val dirA = Files.createTempDirectory("semidxA").toString
    val a = new SemDeDupIndex(new Lake(spark, dirA), nClusters = 8)
    a.build(c, "vec_id", "embedding", 1L)
    a.append(c, "vec_id", "embedding", 2L)
    val dirB = Files.createTempDirectory("semidxB").toString
    val b = new SemDeDupIndex(new Lake(spark, dirB), nClusters = 8)
    b.build(c, "vec_id", "embedding", 1L)
    // split that SEPARATES twins from their bases: the cross-batch pair
    // generation is what connects them
    val (b1, b2) = (allIds.filter(_ < 1000L), allIds.filter(_ >= 1000L))
    b.append(corpus(b1), "vec_id", "embedding", 2L)
    b.append(corpus(b2), "vec_id", "embedding", 3L)
    assert(rows(a.assignments()) == rows(b.assignments()))
  }

  test("a later batch merges two existing clusters and prior labels move") {
    // u-direction pair in batch 1 (ids 10, 11 exact copies), a second
    // exact pair (ids 20, 21) at 25 degrees: separate clusters after
    // batch 1 (cos 25 < .95). Batch 2 adds id 30 halfway (12.5 degrees,
    // cos 12.5 = .976 to both) — one merged cluster labelled 10, so 20's
    // canonical status is REVOKED by the merge.
    def at(deg: Double): Seq[Float] = {
      val r = math.toRadians(deg)
      Seq(math.cos(r).toFloat, math.sin(r).toFloat)
    }
    val b1 = Seq((10L, at(0)), (11L, at(0)), (20L, at(25)), (21L, at(25)))
      .toDF("vec_id", "embedding")
    val b2 = Seq((30L, at(12.5))).toDF("vec_id", "embedding")
    val dir = Files.createTempDirectory("semidxM").toString
    val idx = new SemDeDupIndex(new Lake(spark, dir), nClusters = 1)
    idx.build(b1.unionByName(b2), "vec_id", "embedding", 1L)
    val after1 = rows(idx.append(b1, "vec_id", "embedding", 2L))
    assert(after1 == Seq((10L, 10L, 1), (11L, 10L, 0),
      (20L, 20L, 1), (21L, 20L, 0)))
    val after2 = rows(idx.append(b2, "vec_id", "embedding", 3L))
    assert(after2 == Seq((10L, 10L, 1), (11L, 10L, 0),
      (20L, 10L, 0), (21L, 10L, 0), (30L, 10L, 0)))
  }

  test("append writes label DELTAS; untouched clusters are never rewritten") {
    def at(deg: Double): Seq[Float] = {
      val r = math.toRadians(deg)
      Seq(math.cos(r).toFloat, math.sin(r).toFloat)
    }
    // the merge construction plus an UNTOUCHED third cluster at 90°
    val b1 = Seq((10L, at(0)), (11L, at(0)), (20L, at(25)), (21L, at(25)),
      (40L, at(90)), (41L, at(90))).toDF("vec_id", "embedding")
    val b2 = Seq((30L, at(12.5))).toDF("vec_id", "embedding")
    val dir = Files.createTempDirectory("semidxD").toString
    val lake = new Lake(spark, dir)
    val idx = new SemDeDupIndex(lake, nClusters = 1)
    idx.build(b1.unionByName(b2), "vec_id", "embedding", 1L)
    idx.append(b1, "vec_id", "embedding", 2L)
    val expected = Seq((10L, 10L, 1), (11L, 10L, 0), (20L, 10L, 0),
      (21L, 10L, 0), (30L, 10L, 0), (40L, 40L, 1), (41L, 40L, 0))
    assert(rows(idx.append(b2, "vec_id", "embedding", 3L)) == expected)
    // raw label rows per doc: the merge-touched docs carry a superseding
    // second row; the 90° cluster's rows were NOT rewritten by batch 2 —
    // the write was O(batch + touched), not O(store)
    val perDoc = lake.table(idx.labelTable).groupBy($"doc_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perDoc == Map(10L -> 2L, 11L -> 2L, 20L -> 2L, 21L -> 2L,
      30L -> 1L, 40L -> 1L, 41L -> 1L), s"unexpected delta layout: $perDoc")
    // compact drops superseded rows; the served view is unchanged
    idx.compact()
    assert(lake.table(idx.labelTable).count() == 7L)
    assert(rows(idx.assignments()) == expected)
  }

  test("re-ingesting a stored id fails loudly") {
    val dir = Files.createTempDirectory("semidxR").toString
    val idx = new SemDeDupIndex(new Lake(spark, dir), nClusters = 2)
    val c = corpus(0L until 20L)
    idx.build(c, "vec_id", "embedding", 1L)
    idx.append(c, "vec_id", "embedding", 2L)
    val e = intercept[IllegalArgumentException] {
      idx.append(corpus(Seq(5L)), "vec_id", "embedding", 3L)
    }
    assert(e.getMessage.contains("re-ingest"))
    // the drift shape: a stored id arriving with a DIFFERENT embedding
    // may route to a different cell — the guard must catch it anyway
    // (it checks the label view, not the touched cells' vectors)
    val e2 = intercept[IllegalArgumentException] {
      idx.append(Seq((5L, vec(17L))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", 4L)
    }
    assert(e2.getMessage.contains("re-ingest"))
  }

  test("large-k build stores the router and two-batch still equals one-shot") {
    import org.apache.spark.sql.functions._
    // 300 cells > FlatQuantizerMax: index build persists the top-router
    // table, append assigns O(sqrt k) routed — and must still match the
    // one-shot operator (which dispatches through the same quantizer)
    // byte-for-byte under batch composition
    val dims = (0 until 8).map(d =>
      (pmod(xxhash64(when($"id" >= 10000L, $"id" - 10000L).otherwise($"id"),
        lit(d)), lit(1000)).cast("double") / 500.0 - 1.0) *
        when($"id" >= 10000L, 0.5).otherwise(1.0))
    val base = spark.range(600).toDF("id")
    val docs = base.unionByName(
        base.filter(pmod($"id", lit(10)) === 0).select(($"id" + 10000L).as("id")))
      .select($"id".as("vec_id"), array(dims: _*).as("embedding"))
    val dir = Files.createTempDirectory("semidxL").toString
    val idx = new SemDeDupIndex(new Lake(spark, dir), nClusters = 300)
    idx.build(docs, "vec_id", "embedding", 1L)
    assert(new java.io.File(s"$dir/semdedup_top").exists(),
      "top-router table missing for a large-k build")
    idx.append(docs.filter($"vec_id" < 10000L), "vec_id", "embedding", 2L)
    idx.append(docs.filter($"vec_id" >= 10000L), "vec_id", "embedding", 3L)
    val oneShot = rows(Dedup.semanticDedup(docs, "vec_id", "embedding",
      nClusters = 300))
    assert(rows(idx.assignments()) == oneShot && oneShot.nonEmpty)
  }

  test("rebuild retrains on the stored corpus and equals the one-shot") {
    val dir = Files.createTempDirectory("semidxRB").toString
    val idx = new SemDeDupIndex(new Lake(spark, dir), nClusters = 8)
    val (h1, h2) = (allIds.filter(_ % 2 == 0), allIds.filter(_ % 2 == 1))
    // quantizer trained on HALF the corpus, the other half appended
    // against it — the drift shape rebuild() exists to recover from
    idx.build(corpus(h1), "vec_id", "embedding", 1L)
    idx.append(corpus(h1), "vec_id", "embedding", 2L)
    idx.append(corpus(h2), "vec_id", "embedding", 3L)
    val got = rows(idx.rebuild(4L))
    val oneShot = rows(Dedup.semanticDedup(corpus(allIds),
      "vec_id", "embedding", nClusters = 8))
    assert(got == oneShot && got.nonEmpty)
    assert(rows(idx.assignments()) == oneShot)
  }

  test("append before build fails loudly") {
    val dir = Files.createTempDirectory("semidxE").toString
    val idx = new SemDeDupIndex(new Lake(spark, dir), nClusters = 2)
    val e = intercept[IllegalArgumentException] {
      idx.append(corpus(Seq(1L)), "vec_id", "embedding", 1L)
    }
    assert(e.getMessage.contains("build"))
  }

  test("delete re-elects canonicals and equals a never-ingested store") {
    val c = corpus(allIds)
    val dir = Files.createTempDirectory("semidxDel").toString
    val lake = new Lake(spark, dir)
    val idx = new SemDeDupIndex(lake, nClusters = 8)
    idx.build(c, "vec_id", "embedding", 1L)
    idx.append(c, "vec_id", "embedding", 2L)
    // victims are twin BASES (each the min-id canonical of its cluster):
    // the surviving twin must be re-elected canonical
    val victims = Seq(0L, 5L, 10L)
    val got = rows(idx.delete(victims.toDF("vec_id"), "vec_id", 3L))
    assert(!got.exists(r => victims.contains(r._1)))
    // byte-parity with an index on the SAME frozen quantizer (trained on
    // the full corpus) that never ingested the victims
    val idx2 = new SemDeDupIndex(
      new Lake(spark, Files.createTempDirectory("semidxDel2").toString),
      nClusters = 8)
    idx2.build(c, "vec_id", "embedding", 1L)
    idx2.append(corpus(allIds.filterNot(victims.contains)),
      "vec_id", "embedding", 2L)
    assert(got == rows(idx2.assignments()) && got.nonEmpty,
      "delete != never-ingested")
    // compact removes victims physically; the served view is unchanged,
    // tombstones drain, markers drop
    idx.compact(4L)
    assert(rows(idx.assignments()) == got)
    assert(!lake.exists(idx.tombTable.name))
    assert(lake.table(idx.vectorTable).count() ==
      (allIds.size - victims.size).toLong)
    assert(lake.table(idx.labelTable).filter($"cluster_id".isNull).isEmpty)
    // a deleted id re-appends at a higher version: the pair re-forms and
    // the min-id canonical flips back — equal to never deleting it
    val after = rows(idx.append(corpus(Seq(0L)), "vec_id", "embedding", 5L))
    val idx3 = new SemDeDupIndex(
      new Lake(spark, Files.createTempDirectory("semidxDel3").toString),
      nClusters = 8)
    idx3.build(c, "vec_id", "embedding", 1L)
    idx3.append(corpus(allIds.filterNot(Seq(5L, 10L).contains)),
      "vec_id", "embedding", 2L)
    assert(after == rows(idx3.assignments()), "revived id != never-deleted")
  }

  test("farthest serving equals the one-shot farthest run; delete re-elects under it") {
    val c = corpus(allIds)
    val dir = Files.createTempDirectory("semidxFar").toString
    val idx = new SemDeDupIndex(new Lake(spark, dir), nClusters = 8)
    idx.build(c, "vec_id", "embedding", 1L)
    idx.append(c, "vec_id", "embedding", 2L)
    val got = rows(idx.assignments("farthest"))
    val oneShot = rows(Dedup.semanticDedup(c, "vec_id", "embedding",
      nClusters = 8, keepPolicy = "farthest"))
    assert(got == oneShot && got.nonEmpty, "index farthest != one-shot")
    // clusters identical to min-id serving; exactly one canonical each
    val minId = rows(idx.assignments())
    assert(got.map(r => (r._1, r._2)) == minId.map(r => (r._1, r._2)))
    got.groupBy(_._2).foreach { case (cl, ms) =>
      assert(ms.count(_._3 == 1) == 1, s"cluster $cl canonicals != 1")
    }
    // delete a farthest-canonical of a multi-member cluster: the
    // surviving members' max score is re-elected at serve time, equal
    // to a never-ingested store under the SAME frozen quantizer
    val victim = got.groupBy(_._2).values.filter(_.size >= 2)
      .flatMap(_.filter(_._3 == 1)).map(_._1).min
    idx.delete(Seq(victim).toDF("vec_id"), "vec_id", 3L)
    val after = rows(idx.assignments("farthest"))
    val idx2 = new SemDeDupIndex(
      new Lake(spark, Files.createTempDirectory("semidxFar2").toString),
      nClusters = 8)
    idx2.build(c, "vec_id", "embedding", 1L)
    idx2.append(corpus(allIds.filterNot(_ == victim)),
      "vec_id", "embedding", 2L)
    assert(after == rows(idx2.assignments("farthest")) && after.nonEmpty,
      "farthest re-election != never-ingested")
  }

  test("delete after a revival ignores the revived doc's stale vector") {
    def at(deg: Double): Seq[Float] = {
      val r = math.toRadians(deg)
      Seq(math.cos(r).toFloat, math.sin(r).toFloat)
    }
    // 30 starts at the 12.5° bridge, is deleted, then REVIVES at 2°
    // (near the 0° pair, not the 25° pair) before any compact — its
    // stale 12.5° vector row is still on disk under the pending
    // tombstone. A later delete touching both pairs' clusters re-reads
    // survivor vectors; the stale row is within threshold of 25°
    // (cos 12.5° = .976) while the live 2° row is not (cos 23° = .921),
    // so reading it would phantom-merge the two survivor clusters.
    val all = Seq((10L, at(0)), (11L, at(0)), (20L, at(25)), (21L, at(25)),
      (30L, at(12.5))).toDF("vec_id", "embedding")
    val dir = Files.createTempDirectory("semidxRev").toString
    val idx = new SemDeDupIndex(new Lake(spark, dir), nClusters = 1)
    idx.build(all, "vec_id", "embedding", 1L)
    assert(rows(idx.append(all, "vec_id", "embedding", 2L))
      .forall(_._2 == 10L))
    idx.delete(Seq(30L).toDF("vec_id"), "vec_id", 3L)
    val revived = Seq((30L, at(2))).toDF("vec_id", "embedding")
    assert(rows(idx.append(revived, "vec_id", "embedding", 4L)) ==
      Seq((10L, 10L, 1), (11L, 10L, 0), (20L, 20L, 1), (21L, 20L, 0),
        (30L, 10L, 0)))
    val got = rows(idx.delete(Seq(11L, 21L).toDF("vec_id"), "vec_id", 5L))
    assert(got == Seq((10L, 10L, 1), (20L, 20L, 1), (30L, 10L, 0)),
      s"stale revived vector leaked into re-pairing: $got")
    // byte-parity with a never-ingested twin on the same frozen quantizer
    val idx2 = new SemDeDupIndex(
      new Lake(spark, Files.createTempDirectory("semidxRev2").toString),
      nClusters = 1)
    idx2.build(all, "vec_id", "embedding", 1L)
    idx2.append(Seq((10L, at(0)), (20L, at(25)), (30L, at(2)))
      .toDF("vec_id", "embedding"), "vec_id", "embedding", 2L)
    assert(got == rows(idx2.assignments()), "revival delete != never-ingested")
  }

  test("deleting a bridge doc splits its component back apart") {
    def at(deg: Double): Seq[Float] = {
      val r = math.toRadians(deg)
      Seq(math.cos(r).toFloat, math.sin(r).toFloat)
    }
    val all = Seq((10L, at(0)), (11L, at(0)), (20L, at(25)), (21L, at(25)),
      (30L, at(12.5))).toDF("vec_id", "embedding")
    val dir = Files.createTempDirectory("semidxBridge").toString
    // ONE cell: pairing is within-cell, so a multi-cell layout would
    // route the 12.5-degree bridge away from one of the pairs
    val idx = new SemDeDupIndex(new Lake(spark, dir), nClusters = 1)
    idx.build(all, "vec_id", "embedding", 1L)
    val merged = rows(idx.append(all, "vec_id", "embedding", 2L))
    assert(merged.forall(_._2 == 10L), s"expected one merged cluster: $merged")
    // id 30 is the only path between the 0° and 25° pairs (cos 25° < .95
    // directly) — deleting it must SPLIT the component, re-electing 20
    val got = rows(idx.delete(Seq(30L).toDF("vec_id"), "vec_id", 3L))
    assert(got == Seq((10L, 10L, 1), (11L, 10L, 0), (20L, 20L, 1),
      (21L, 20L, 0)), s"bridge delete did not split: $got")
  }
}
