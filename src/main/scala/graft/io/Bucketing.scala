package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout (SURVEY §4 / builder prompt: "bucketing for
  * co-located joins"). Writing both sides of a recurring join
  * bucketed+sorted by the join key lets Spark plan a sort-merge join
  * with NO exchange and NO sort — at 100 TB this converts the
  * dominant shuffle of every downstream join/aggregation on that key
  * into a metadata lookup.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted external table at
    * `path`, registered as `table` in the session catalog.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      path: String,
      key: String,
      numBuckets: Int
  ): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — planned
    * shuffle-free when bucket counts match.
    */
  def bucketedJoin(
      spark: SparkSession,
      left: String,
      right: String,
      key: String
  ): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
