package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuous maintenance of a per-group KMV distinct sketch (q172's
  * summary) in a catalog table: each micro-batch's values are hashed,
  * merged with the stored sketch, and the k smallest hashes per group
  * survive through [[MaterializedView.upsert]]'s shadow-swap.
  *
  * The KMV merge is COMMUTATIVE and IDEMPOTENT (min-k of a union is
  * insensitive to order and duplicates), so unlike a streamed COUNT the
  * sketch state is correct under any batch split and under at-least-once
  * re-delivery — no dedup operator, no watermark, no exactly-once sink
  * needed for state correctness; SketchMergeSpec pins both properties.
  *
  * Scale: per-batch work is one distinct over the batch's (group, hash)
  * pairs plus a top-k window over (stored ∪ incoming) — the stored side is
  * O(groups·k) rows regardless of stream history, so refresh cost is
  * bounded by sketch size exactly like the MV's bounded-by-view-size
  * discipline.
  */
object SketchMaintenance {

  /** First 8 md5 hex chars as a non-negative long — the engine-portable
    * hash every sketch query shares with its DuckDB oracle.
    */
  def kmvHash(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long")

  /** Merge one batch into the sketch table (create on first batch). */
  def mergeKmvBatch(batch: DataFrame, groupCol: String, valueCol: String,
      target: String, k: Int): Unit = {
    val spark = batch.sparkSession
    MaterializedView.recover(spark, target)
    val incoming = batch
      .select(col(groupCol), kmvHash(col(valueCol)).as("h"))
      .distinct()
    val merged0 =
      if (spark.catalog.tableExists(target))
        spark.table(target).unionByName(incoming).distinct()
      else incoming
    val sketch = merged0
      .withColumn("rn", row_number().over(
        Window.partitionBy(groupCol).orderBy("h")))
      .filter(col("rn") <= k).drop("rn")
    MaterializedView.upsert(sketch, Seq(groupCol), target, snapshotPartitions = 1)
  }

  /** Start continuous sketch maintenance over a stream. */
  def start(stream: DataFrame, groupCol: String, valueCol: String,
      target: String, checkpointDir: String, k: Int): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeKmvBatch(batch, groupCol, valueCol, target, k)
      }
      .start()
}
