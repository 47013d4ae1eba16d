package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact streaming deduplication — the ingest-time guard of the pipeline:
  * re-delivered rows (at-least-once sources, replayed batches) are dropped
  * on their identity columns while their event time is within the watermark
  * horizon.
  *
  * `dropDuplicatesWithinWatermark` keeps one state entry per key only until
  * the watermark passes it, so state is bounded by arrival rate × horizon —
  * the property that makes exact dedup feasible on an unbounded 100 TB/day
  * stream (full-history exactness belongs to the batch operators q24/q53).
  */
object StreamingDedup {

  /** Drop re-deliveries of the same `idCols` within `horizon` of event time. */
  def dedup(stream: DataFrame, idCols: Seq[String], eventTime: String,
      horizon: String): DataFrame =
    stream
      .withWatermark(eventTime, horizon)
      .dropDuplicatesWithinWatermark(idCols.head, idCols.tail: _*)

  /** Content-hash variant: identity is the md5 fingerprint of a payload
    * column (exact-dup semantics of q24, streaming).
    */
  def dedupByContent(stream: DataFrame, payloadCol: String, eventTime: String,
      horizon: String): DataFrame =
    dedup(stream.withColumn("__fp", md5(col(payloadCol))), Seq("__fp"),
      eventTime, horizon).drop("__fp")
}
