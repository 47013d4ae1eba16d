package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class ChunkingSpec extends AnyFunSuite with SparkSpec {

  test("sequence packing tiles every document exactly, within block bounds") {
    val sf = "/root/testdata/sf0.001"
    val segs = Chunking.q128SequencePacking.fn(spark, sf).cache()

    // every document's segments sum to its full token count (no token lost
    // or duplicated by the block cuts)
    val docs = graft.Tables.documents(spark, sf)
      .select(col("lang"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("tok"))
    val bad = segs.groupBy("lang", "doc_id")
      .agg(sum("seg_len").as("packed"))
      .join(docs, Seq("lang", "doc_id"))
      .filter(col("packed") =!= col("tok"))
    assert(bad.count() == 0, "segment lengths must sum to the doc token count")

    // shards are a partition of each language: every doc lands in exactly
    // the shard its id hashes to, and blocks never mix shards
    val wrongShard = segs.filter(col("shard") =!= col("doc_id") % 8)
    assert(wrongShard.count() == 0, "shard must be doc_id mod 8")

    // no block overfills: per (lang, shard, block) the segment lengths sum
    // to at most the 2048-token capacity, and all interior blocks of each
    // sub-stream are exactly full — the tiling invariant holds per shard,
    // not just per language
    val blocks = segs.groupBy("lang", "shard", "block_id")
      .agg(sum("seg_len").as("fill")).cache()
    assert(blocks.filter(col("fill") > 2048).count() == 0)
    val lastBlock = blocks.groupBy("lang", "shard").agg(max("block_id").as("lb"))
    val interiorUnderfull = blocks.join(lastBlock, Seq("lang", "shard"))
      .filter(col("block_id") < col("lb") && col("fill") =!= 2048)
    assert(interiorUnderfull.count() == 0,
      "every non-final block of every (lang, shard) stream must be packed to exactly 2048 tokens")

    // block ids are dense from 0 within each sub-stream (no gaps: each
    // block boundary is crossed by some document segment)
    val denseViolation = blocks.groupBy("lang", "shard")
      .agg(min("block_id").as("b0"), max("block_id").as("bn"),
        count(lit(1)).as("nblk"))
      .filter(col("b0") =!= 0 || col("nblk") =!= col("bn") + 1)
    assert(denseViolation.count() == 0, "block ids must be dense from 0 per stream")

    // segment starts are consistent: each doc's segments are contiguous
    // from offset 0 (seg_start ordering by block_id)
    val firstSeg = segs.groupBy("lang", "doc_id")
      .agg(min("seg_start").as("s0"))
      .filter(col("s0") =!= 0)
    assert(firstSeg.count() == 0)
    segs.unpersist(); blocks.unpersist()
  }

  test("length-bucketed batches: full except stream tails, correct accounting") {
    val sf = "/root/testdata/sf0.001"
    val batches = Chunking.q138LengthBatches.fn(spark, sf).cache()

    // batch accounting is internally consistent and padding is non-negative:
    // a batch's pad is exactly n_docs * max_tok - tok_sum
    assert(batches.filter(
      col("pad_tokens") =!= col("n_docs") * col("max_tok") - col("tok_sum")
        || col("pad_tokens") < 0 || col("n_docs") > 8).count() == 0)

    // every batch except possibly the LAST of its (bucket, shard) stream
    // holds exactly batchSize docs (descending-length order fills greedily)
    val lastBatch = batches.groupBy("bucket", "shard")
      .agg(max("batch_id").as("lb"))
    val shortInterior = batches.join(lastBatch, Seq("bucket", "shard"))
      .filter(col("batch_id") < col("lb") && col("n_docs") =!= 8)
    assert(shortInterior.count() == 0,
      "only a stream's final batch may be short")

    // batches partition the corpus: total docs across batches = corpus size
    val total = batches.agg(sum("n_docs")).collect()(0).getLong(0)
    val corpus = graft.Tables.documents(spark, sf).count()
    assert(total == corpus, "every document lands in exactly one batch")

    // bucket homogeneity: a batch's max_tok stays inside its bucket's
    // length range (bucket = tok div 16 capped at 7), so padding per doc
    // is bounded by the bucket width
    val badBucket = batches.filter(
      least(expr("max_tok div 16"), lit(7L)) =!= col("bucket"))
    assert(badBucket.count() == 0, "batch max length must stay in its bucket")
    batches.unpersist()
  }
}
