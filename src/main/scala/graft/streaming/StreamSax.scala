package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Caches._

/** q471: streaming SAX symbol census — the ONLINE half of q462's
  * symbolic aggregate approximation: event counts fold into
  * epoch-aligned 8-hour tumbling windows as a STREAMING aggregation
  * (one bounded-key aggregate of state — window count is the
  * archetypal streaming rollup), and the drained window frame is
  * then symbolized against its own quartile breakpoints exactly as
  * the batch operator does. Output: per symbol (0..3), windows at
  * that symbol and the event mass they carry. A capacity monitor
  * runs precisely this split at scale: cheap always-on window
  * counting in the stream, periodic offline re-symbolization of the
  * window ledger.
  *
  * Scale: streaming state is one row per open 8-hour window
  * (calendar-bounded); the post-drain symbolization runs on the
  * window frame (value-domain bounded quartile cumsum, the q462
  * convention).
  */
object StreamSax {

  def streamSaxSymbols(spark: SparkSession, dir: String): DataFrame = {
    val counts = EventStreams
      .readEvents(spark, dir)
      .groupBy(window(col("ts"), "8 hours").as("w"))
      .agg(count(lit(1)).as("s"))
      .select(unix_micros(col("w.start")).as("ws"), col("s"))
    val drained = EventStreams
      .runAvailableNow(counts, "q471_stream_sax_out", "complete")
      .cacheTracked()
    val g = drained.groupBy(col("s")).agg(count(lit(1)).as("c"))
    val wv = Window
      .orderBy(col("s").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = g
      .withColumn("cw", sum(col("c")).over(wv))
      .crossJoin(broadcast(drained.agg(count(lit(1)).as("n"))))
    def pick(p: Int, name: String) =
      cum
        .filter(col("cw") * 4 >= col("n") * p)
        .agg(min(col("s")).as(name))
    val bounds = pick(1, "q1")
      .crossJoin(pick(2, "q2"))
      .crossJoin(pick(3, "q3"))
    drained
      .crossJoin(broadcast(bounds))
      .select(
        when(col("s") <= col("q1"), lit(0L))
          .when(col("s") <= col("q2"), lit(1L))
          .when(col("s") <= col("q3"), lit(2L))
          .otherwise(lit(3L)).as("sym"),
        col("s")
      )
      .groupBy(col("sym"))
      .agg(
        count(lit(1)).as("n_windows"),
        sum(col("s")).as("n_events")
      )
  }
}
