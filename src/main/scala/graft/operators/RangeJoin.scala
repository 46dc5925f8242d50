package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interval/range join via time bucketing — the operator Spark has no
  * native optimization for (a plain `ts BETWEEN start AND end` theta
  * join plans as BroadcastNestedLoop / cartesian).
  *
  * Technique: bucket the point side by a fixed width, explode each
  * interval into the buckets it overlaps, equi-join on
  * (key, bucket), then apply the exact range predicate. Cost becomes
  * |points| + Σ interval-spans instead of |points|·|intervals| — the
  * standard distributed interval-join topology, and it shuffles on
  * (key, bucket) so hot keys spread across buckets for free.
  */
object RangeJoin {

  /** Join point rows to interval rows on `key` + containment
    * (lo <= point <= hi), bucketed at `bucketSeconds` granularity.
    * Timestamp columns.
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      key: String,
      pointTs: String,
      lo: String,
      hi: String,
      bucketSeconds: Long
  ): DataFrame = {
    val w = bucketSeconds
    def bucketOf(c: Column): Column = floor(unix_timestamp(c) / w)
    val p = points.withColumn("__bucket", bucketOf(col(pointTs)))
    val iv = intervals
      .withColumn(
        "__bucket",
        explode(sequence(bucketOf(col(lo)), bucketOf(col(hi))))
      )
    p.join(iv, Seq(key, "__bucket"))
      .filter(col(pointTs) >= col(lo) && col(pointTs) <= col(hi))
      .drop("__bucket")
  }

  /** q41: per purchase, the count of errors by the same user in the
    * preceding hour — the batch twin of the stream-stream join in
    * graft.streaming (each purchase is the interval [ts-1h, ts],
    * errors are the points). Purchases with no recent error keep a
    * zero count via the left join back onto the purchase set.
    */
  def purchasesWithRecentErrors(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev
      .filter(col("event_type") === "purchase")
      .select(
        col("event_id").as("purchase_id"),
        col("user_id"),
        col("ts"),
        col("ts") - expr("INTERVAL 1 HOUR") as "lo"
      )
    val errors = ev
      .filter(col("event_type") === "error")
      .select(col("user_id"), col("ts").as("err_ts"))
    val counts = pointInInterval(
      errors,
      purchases.select(col("user_id"), col("purchase_id"), col("lo"),
        col("ts").as("hi")),
      key = "user_id",
      pointTs = "err_ts",
      lo = "lo",
      hi = "hi",
      bucketSeconds = 3600
    )
      .groupBy(col("purchase_id"))
      .agg(count(lit(1)).as("n_recent_errors"))
    purchases
      .join(counts, Seq("purchase_id"), "left")
      .select(
        col("purchase_id"),
        col("user_id"),
        col("ts"),
        coalesce(col("n_recent_errors"), lit(0L)).as("n_recent_errors")
      )
  }

  /** q40: events range-joined into their own sessions (intervals from
    * the sessionization operator) — per-session event counts, which
    * must reproduce the session sizes sessionize computed directly.
    */
  def eventsInSessions(spark: SparkSession, dir: String): DataFrame = {
    val sessions = Events.sessionize(spark, dir)
    val events = Tables
      .events(spark, dir)
      .select(col("user_id"), col("ts"))
    pointInInterval(
      events,
      sessions,
      key = "user_id",
      pointTs = "ts",
      lo = "session_start",
      hi = "session_end",
      bucketSeconds = 3600
    )
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_in_range"))
  }
}
