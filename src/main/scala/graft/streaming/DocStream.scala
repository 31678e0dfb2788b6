package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}

/** Structured Streaming twins of the document-pipeline operators: the
  * batch engine dedups a daily batch against persisted state
  * ([[graft.dedup.IncrementalDedup]]); a streaming ingest wants the same
  * decision per arriving document without a batch boundary at all. */
object DocStream {

  /** Streaming exact dedup: emit (doc_id, canonical_id) for every arriving
    * document whose content was first seen under a smaller id — the
    * streaming twin of [[graft.dedup.Dedup.exactIncremental]] applied
    * batch-by-batch (DocStreamSpec pins micro-batch ≡ batch parity, with
    * state carrying across restarts via the checkpoint).
    *
    * Keyed state: ONE long (the smallest id seen) per distinct content
    * hash — the same size class as the batch path's content-hash store,
    * growing with distinct corpus content, not with stream length or
    * redelivery (NoTimeout is deliberate: content seen a year ago is still
    * a duplicate today). Re-delivered ids and re-ingested smaller ids
    * follow the batch min-merge semantics: a doc that undercuts the stored
    * minimum becomes the new canonical and is NOT a duplicate.
    *
    * Input columns: doc_id LONG, text STRING. */
  def streamingExactDedup(docs: Dataset[Row]): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .selectExpr("doc_id", "md5(text) AS content_hash")
      .as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, rows: Iterator[(Long, String)],
            state: GroupState[Long]) => {
          var canon = state.getOption.getOrElse(Long.MaxValue)
          // ascending id order inside the micro-batch mirrors the batch
          // path's group-min: the smallest id is canonical, later ids dup
          val out = rows.map(_._1).toSeq.sorted.flatMap { id =>
            if (id < canon) { canon = id; Nil } // first seen (or undercut)
            else if (id == canon) Nil           // redelivery of canonical
            else Seq((id, canon))
          }
          state.update(canon)
          out.iterator
        })
      .toDF("doc_id", "canonical_id")
  }
}
