package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuous redistribution — the reference's one data-path operation
  * (`INSERT INTO canonical SELECT * FROM versioned`, reference
  * `sharding_recreation.py:159-160`) as a stream: arriving rows are
  * scattered into a hash-sharded directory layout as they land, instead of
  * in one bulk move.
  *
  * The shard function is the engine's portable md5-derived bucket (same
  * arithmetic as the deterministic sampler q52 and every DuckDB oracle), so
  * placement is reproducible across engines and runs. The file sink gives
  * exactly-once output (checkpointed offsets + transactional file commit
  * log); `partitionBy(shard)` makes each shard a self-contained directory a
  * downstream consumer can read (and prune) independently.
  *
  * Scale: each micro-batch shuffles only its own rows into `shards` output
  * groups — continuous rebalance cost is proportional to arrival rate, not
  * corpus size, the same property q53 gives incremental dedup.
  */
object StreamingRebalance {

  /** Portable hash shard: md5-prefix of the key's string form, mod shards. */
  def shardOf(key: Column, shards: Int): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long"),
      lit(shards.toLong))

  /** Start scattering `stream` into `dest/shard=N/...` keyed on `key`. */
  def start(
      stream: DataFrame,
      key: String,
      shards: Int,
      dest: String,
      checkpointDir: String): StreamingQuery =
    stream
      .withColumn("shard", shardOf(col(key), shards))
      .writeStream
      .format("parquet")
      .option("path", dest)
      .option("checkpointLocation", checkpointDir)
      .partitionBy("shard")
      .trigger(Trigger.AvailableNow())
      .outputMode("append")
      .start()
}
