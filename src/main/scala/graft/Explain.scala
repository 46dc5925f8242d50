package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of one SparkEntry
  * query — the plan-audit loop PERF.md's notes come from.
  * Usage: tools/run.sh graft.Explain <query_name> <sfDir>
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val mode = if (args.length > 2) args(2) else "formatted"
    val df = SparkEntry.queries(args(0))(spark, dir)
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString(mode)))
    spark.stop()
  }
}
