package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.hash60

/** q424: streaming ingest receipt — the q420 modular hash-sum
  * fingerprint maintained as a STREAMING aggregation over the
  * document feed: count, token mass and Σ (hash60(doc_id) mod 10⁶)
  * in complete mode. Because the receipt is a pure commutative sum,
  * it is exactly the aggregate a streaming pipeline can keep forever
  * in O(1) state — every micro-batch folds in, and at any point the
  * emitted row certifies WHAT has been ingested so far (the batch
  * q420 receipt over the same set matches it bit-for-bit, which is
  * the drain equivalence the oracle states).
  *
  * Scale: one streaming agg row of state; no keys, no watermark
  * needed (nothing is ever dropped), partial aggregation per batch.
  */
object StreamReceipt {

  def streamIngestReceipt(spark: SparkSession, dir: String): DataFrame = {
    val receipt = EventStreams
      .readTableStream(spark, dir, "documents")
      .select(
        col("doc_id"),
        size(graft.functions.TextFunctions.tokens(col("text")))
          .cast("long").as("tk"),
        pmod(hash60(col("doc_id")), lit(1000000L)).as("m")
      )
      .agg(
        count(lit(1)).as("n_ingested"),
        sum(col("tk")).as("ingested_tokens"),
        sum(col("m")).as("receipt_mod")
      )
    EventStreams.runAvailableNow(
      receipt,
      "q424_stream_receipt_out",
      "complete"
    )
  }
}
