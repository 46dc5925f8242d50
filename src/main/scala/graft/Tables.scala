package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All reads are plain parquet scans so Catalyst's column pruning and
  * predicate pushdown reach the file source (`PushedFilters` in
  * `.explain("formatted")`). At 100 TB these would be partitioned
  * directories; the loader keeps a single call site so a partitioned
  * layout (or a catalog table) is a one-line swap.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  /** `events.ts` is parquet TIMESTAMP(MICROS) with
    * `isAdjustedToUTC=false`, which Spark reads as TIMESTAMP_NTZ.
    * Cast to session-zone TimestampType (the session runs UTC, so the
    * wall-clock is preserved) so downstream window/interval/unix-time
    * arithmetic and the DuckDB oracle — which reads the same column as
    * a naive TIMESTAMP — agree. The cast sits above the scan and does
    * not block column pruning or pushdown of non-ts predicates.
    */
  def events(s: SparkSession, d: String): DataFrame =
    table(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.col("ts")
        .cast(org.apache.spark.sql.types.TimestampType))
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    table(s, d, "embeddings")
}
