package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction (the other half of lake hygiene next to
  * `Bucketing` and `PartitionedLake`): streaming ingest and
  * fine-grained partitioning leave thousands of KB-scale files, and
  * at 100 TB the resulting task-per-file scheduling and file-open
  * overhead dominate scan cost long before bytes do. Compaction
  * rewrites a directory to ⌈bytes / target⌉ right-sized files; the
  * data is bit-identical, the layout is the operator.
  */
object Compaction {

  private def parquetFiles(dir: java.io.File): Array[java.io.File] =
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))

  /** Write the events table fragmented into `nSmall` files, then
    * compact to ⌈bytes / targetBytes⌉ files; returns (smallDir,
    * compactDir). One-time per (process, sf); shutdown-hook cleanup.
    */
  def compactedEventsLake(
      spark: SparkSession,
      dir: String,
      nSmall: Int = 64,
      targetBytes: Long = 4L << 20
  ): (String, String) = {
    val base = LayoutOnce.ensure("graft-compact", dir) { b =>
      val small = new java.io.File(b, "small")
      val compact = new java.io.File(b, "compact")
      // the "bad" layout: 64 shards of a table that fits in a few MB
      graft.Tables
        .events(spark, dir)
        .repartition(nSmall)
        .write
        .mode(SaveMode.Overwrite)
        .parquet(small.getAbsolutePath)
      val bytes = parquetFiles(small).map(_.length()).sum
      val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
      // compact: one scan, coalesce (no shuffle — file merge is a
      // read-side concern, not a key redistribution), right-sized
      // write
      spark.read
        .parquet(small.getAbsolutePath)
        .coalesce(nFiles)
        .write
        .mode(SaveMode.Overwrite)
        .parquet(compact.getAbsolutePath)
    }
    (new java.io.File(base, "small").getAbsolutePath,
      new java.io.File(base, "compact").getAbsolutePath)
  }

  /** Layout facts for the spec — (smallFiles, compactFiles,
    * smallBytes): the engine sizes the compacted file count from the
    * SMALL layout's bytes, so the spec must derive its expectation
    * from the same total.
    */
  def layoutStats(spark: SparkSession, dir: String): (Int, Int, Long) = {
    val (s, c) = compactedEventsLake(spark, dir)
    val sf = parquetFiles(new java.io.File(s))
    (sf.length, parquetFiles(new java.io.File(c)).length, sf.map(_.length()).sum)
  }

  /** q163: a per-type rollup READ OFF THE COMPACTED LAKE — the
    * oracle is the plain aggregate over the original table, so the
    * gate proves compaction moved bytes without touching a row. The
    * spec pins the layout change itself (64 small files → ⌈bytes /
    * target⌉ compacted files).
    */
  def compactedRollup(spark: SparkSession, dir: String): DataFrame = {
    val (_, compact) = compactedEventsLake(spark, dir)
    spark.read
      .parquet(compact)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        round(sum(col("value")), 2).as("total_value")
      )
  }
}
