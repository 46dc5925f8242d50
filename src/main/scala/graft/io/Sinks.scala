package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Sinks (SURVEY §2.2 K1-K6): JSONL corpus writers with the
  * reference's ordering contract, the union-merge, and tiny-result
  * JSON dumps.
  *
  * Scale stance: the parallel writer is the default (one file per
  * partition, cluster-wide throughput). The single-file ordered writer
  * exists only for byte-comparable corpus export — it is explicitly
  * the non-scalable path and says so in its name.
  */
object Sinks {

  /** K2/K3 — parallel JSONL write, sorted within partitions after a
    * range repartition on the sort keys: globally ordered across the
    * file sequence (file N's keys ≤ file N+1's), each file internally
    * sorted — the scalable form of the reference's ordered corpus.
    */
  def writeJsonlOrdered(
      df: DataFrame,
      path: String,
      sortKeys: Seq[String],
      numFiles: Option[Int] = None
  ): Unit = {
    val ranged = numFiles match {
      // explicit file count pins the range shuffle (AQE coalesces an
      // unpinned one on small data)
      case Some(n) => df.repartitionByRange(n, sortKeys.map(col): _*)
      case None => df.repartitionByRange(sortKeys.map(col): _*)
    }
    ranged
      .sortWithinPartitions(sortKeys.map(col): _*)
      .write
      .mode(SaveMode.Overwrite)
      .json(path)
  }

  /** K2 single-file variant — exact total order in one file, for
    * byte-comparable export of small corpora (drives everything
    * through one task; do not use at scale).
    */
  def writeJsonlSingleFile(
      df: DataFrame,
      path: String,
      sortKeys: Seq[String],
      projectTo: Seq[String] = Nil
  ): Unit = {
    val sorted = df
      .coalesce(1)
      .sortWithinPartitions(sortKeys.map(col): _*)
    // a projection after the sort keeps per-partition order (no
    // exchange), so ordering keys can be dropped from the output shape
    val out =
      if (projectTo.isEmpty) sorted
      else sorted.select(projectTo.map(col): _*)
    out.write
      .mode(SaveMode.Overwrite)
      .json(path)
  }

  /** K3 — ordered union-merge of per-branch frames (utils.py:159-182):
    * missing inputs are skipped by the caller's frame list; branch
    * order is preserved via an explicit rank column.
    */
  def unionMerge(branches: Seq[DataFrame]): DataFrame =
    branches.zipWithIndex
      .map { case (df, i) => df.withColumn("branch_rank", lit(i)) }
      .reduce(_.unionByName(_))

  /** K4 — stats dump: tiny aggregate results written as a single JSON
    * file (driver-side size by construction).
    */
  def writeStatsJson(stats: DataFrame, path: String): Unit =
    stats.coalesce(1).write.mode(SaveMode.Overwrite).json(path)

  /** Hive-style partitioned parquet layout — the lake layout for the
    * 100 TB corpus: one directory per partition value, so reads with a
    * partition predicate list only matching directories
    * (`PartitionFilters` in the scan — zero data files of other
    * partitions are even opened) and incremental jobs replace single
    * partitions atomically via dynamic overwrite without touching the
    * rest. PartitionedLayoutSpec pins both properties.
    */
  def writePartitionedParquet(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      dynamicOverwrite: Boolean = false
  ): Unit = {
    val w = df.write
      .partitionBy(partitionCols: _*)
      .mode(SaveMode.Overwrite)
    (if (dynamicOverwrite) w.option("partitionOverwriteMode", "dynamic")
     else w).parquet(path)
  }

  /** q107 — streaming → partitioned parquet lake through Spark's
    * built-in file sink: the manifest (`_spark_metadata`) commits
    * files atomically per micro-batch, so a crashed/replayed batch
    * never double-counts — exactly-once END TO END when paired with
    * the checkpointed source offsets. Restarting the drained stream
    * on the same checkpoint writes nothing new (pinned by spec).
    * This is the continuous-ingest twin of
    * [[writePartitionedParquet]] — the path a 100 TB/day corpus
    * actually lands through, day-partitioned for downstream pruning.
    */
  def streamEventsToLake(
      events: DataFrame,
      outPath: String,
      checkpoint: String
  ): Unit = {
    val q = events
      .withColumn("day", to_date(col("ts")))
      .writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .partitionBy("day")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** F7 — file size in megabytes (utils.py:185-198: bytes ÷ 1024²,
    * 0.0 for a missing path). Accepts a plain file or a Spark output
    * directory (sums data files; `_SUCCESS`/hidden markers excluded),
    * since the engine's "one JSONL file" is a single-part directory.
    */
  def fileSizeMb(path: String): Double = {
    def bytes(f: java.io.File): Long =
      // marker exclusion applies to directories too: a streaming
      // sink's _spark_metadata/ manifest must not count as data
      if (f.getName.startsWith("_") || f.getName.startsWith(".")) 0L
      else if (f.isFile) f.length
      else Option(f.listFiles()).map(_.map(bytes).sum).getOrElse(0L)
    val f = new java.io.File(path)
    if (!f.exists()) 0.0 else bytes(f) / (1024.0 * 1024.0)
  }

  /** K1 — raw JSON *array* writer (scraper.py:339-356 parity form):
    * one file holding a JSON array of row objects. Collects on the
    * driver — correct only for bounded exports (the reference's
    * per-project raw dumps); the engine-native parallel form is the
    * JSONL writer above. `maxRows` guards the collect: pointing this
    * at a corpus fails fast (cheap limit+count probe) instead of
    * OOMing the driver.
    */
  def writeRawJsonArray(
      df: DataFrame,
      file: String,
      maxRows: Int = 100000
  ): Unit = {
    val probe = df.limit(maxRows + 1).count()
    require(
      probe <= maxRows,
      s"writeRawJsonArray is a driver-side bounded export: input exceeds " +
        s"maxRows=$maxRows rows — use writeJsonlOrdered for corpus-scale " +
        "output"
    )
    val rows = df.toJSON.collect()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(file),
      rows.mkString("[\n", ",\n", "\n]").getBytes("UTF-8")
    )
  }
}
