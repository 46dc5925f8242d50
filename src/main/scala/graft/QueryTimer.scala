package graft

import org.apache.spark.sql.SparkSession

/** Dev profiler: run one named SparkEntry query N times and print each
  * timing, to separate real plan cost from JIT/codegen/listing noise.
  *
  * Usage: tools/run.sh graft.QueryTimer <name> <sfDir> [n] [explain]
  */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = if (args.length > 2) args(2).toInt else 4
    val doExplain = args.contains("explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    if (doExplain) fn(spark, sfDir).explain("formatted")
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      // Bench.force materializes every output column — a bare count()
      // lets ColumnPruning strip all expressive work from
      // projection-only queries and time nothing but the scan.
      val rows = Bench.force(fn(spark, sfDir))
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s  ($rows rows)")
    }
    spark.stop()
  }
}
