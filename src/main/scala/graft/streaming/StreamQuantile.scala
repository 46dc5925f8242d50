package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.QuantileSketch
import graft.functions.TextFunctions.hash60

/** q486: streaming twin of the q484 bottom-k quantile sketch — the
  * same typed Aggregator run as a complete-mode streaming aggregation
  * over the lineitem file stream, five-point read from the drained
  * terminal state. The point being pinned: the sketch's merge law is
  * what makes it STREAMABLE — micro-batch boundaries are just another
  * arbitrary split of the input multiset, so the terminal sketch is
  * bit-identical to the batch one (same DuckDB oracle as q484's
  * sample side), and state is O(k) per group forever — the
  * monitoring-quantile shape that ships at 100 TB: no per-event
  * retention, no window sort, exact mergeable state.
  */
object StreamQuantile {

  def streamQuantileSketch(spark: SparkSession, dir: String): DataFrame = {
    val rows = EventStreams
      .readTableStream(spark, dir, "lineitem")
      .select(
        col("l_returnflag").as("grp"),
        hash60(
          concat(
            col("l_orderkey").cast("string"),
            lit("_"),
            col("l_linenumber").cast("string")
          )
        ).as("h"),
        round(col("l_extendedprice") * 100).cast("long").as("v")
      )
    val sk = rows
      .groupBy(col("grp"))
      .agg(QuantileSketch.bottomKValues(col("h"), col("v")).as("vals"))
    val drained = EventStreams
      .runAvailableNow(sk, "q486_stream_quantile_out", "complete")
    def at(idx: org.apache.spark.sql.Column) =
      element_at(col("vals"), idx.cast("int"))
    val j = col("j")
    drained
      .select(col("grp"), col("vals"), size(col("vals")).cast("long").as("j"))
      .select(
        col("grp").as("l_returnflag"),
        col("j"),
        at(lit(1)).as("est_min"),
        at(((j + 3) / 4).cast("long")).as("est_p25"),
        at(((j + 1) / 2).cast("long")).as("est_p50"),
        at(((j * 3 + 3) / 4).cast("long")).as("est_p75"),
        at(j).as("est_max")
      )
  }
}
