package graft

import org.apache.spark.sql.SparkSession

/** Plan-shape audit tool: prints the executed (AQE-final initial)
  * physical plan of named SparkEntry queries so join strategies,
  * exchanges, and pushed filters can be reviewed without a notebook.
  *
  * Usage: tools/run.sh graft.PlanAudit <sfDir> q26,q37 [--full]
  * Default output is a per-query summary (join operators + exchange
  * count); --full dumps the whole plan tree.
  */
object PlanAudit {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.lift(1).map(_.split(',').toSeq).getOrElse(Nil)
    val full = args.contains("--full")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val selected =
      if (names.isEmpty) SparkEntry.queries.toSeq.sortBy(_._1)
      else SparkEntry.queries.toSeq
        .filter(kv => names.exists(kv._1.startsWith)).sortBy(_._1)
    selected.foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val joins = plan.linesIterator
          .map(_.trim.replaceAll("^[+:\\-\\s*]+", ""))
          .filter(l => l.contains("Join") || l.contains("Cartesian"))
          .map(_.takeWhile(_ != '[').take(90))
          .toSeq
        val exchanges =
          plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
        println(s"== $name  (hash exchanges: $exchanges)")
        joins.foreach(j => println(s"   join: $j"))
        if (full) println(plan)
      } catch {
        case e: Throwable => println(s"== $name  FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
