package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable.ArrayBuffer

/** Dev profiler: run one named SparkEntry query (warmup + measured,
  * the Bench methodology) with a stage listener, and print the
  * measured pass's stages ranked by summed task run time — the
  * local-mode stand-in for the Spark UI's stage table (the UI is off
  * in this sandbox). Each line: task-time, wall ms, #tasks, shuffle
  * read/write MB, input MB, and the stage's call site.
  *
  * Usage: tools/run.sh graft.ProfileQuery <name> [sfDir] [top]
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val top = if (args.length > 2) args(2).toInt else 30
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

    case class Row(
        stage: Int,
        taskMs: Long,
        wallMs: Long,
        nTasks: Int,
        shReadMb: Double,
        shWriteMb: Double,
        inputMb: Double,
        site: String)
    val rows = ArrayBuffer.empty[Row]
    @volatile var record = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        if (record) {
          val i = s.stageInfo
          val m = i.taskMetrics
          val wall = (for {
            a <- i.completionTime; b <- i.submissionTime
          } yield a - b).getOrElse(-1L)
          rows += Row(
            i.stageId,
            m.executorRunTime,
            wall,
            i.numTasks,
            m.shuffleReadMetrics.totalBytesRead / 1e6,
            m.shuffleWriteMetrics.bytesWritten / 1e6,
            m.inputMetrics.bytesRead / 1e6,
            (i.name.take(60) + " | " +
              i.details.linesIterator
                .filter(_.contains("graft."))
                .filterNot(_.contains("graft.ProfileQuery"))
                .filterNot(_.contains("graft.Bench"))
                .take(3).mkString(" | ")).take(260)
          )
        }
    })

    def once(): Double = {
      val t0 = System.nanoTime()
      Bench.force(fn(spark, sfDir))
      (System.nanoTime() - t0) / 1e9
    }
    val w = once() // warmup: codegen + JIT + the query's own caches
    record = true
    val t = once()
    record = false
    println(f"warmup $w%.3f s, measured $t%.3f s, stages ${rows.size}")
    println(
      "  taskS  wallS tasks  shRdMB  shWrMB   inMB  site")
    rows.sortBy(-_.taskMs).take(top).foreach { r =>
      println(
        f"${r.taskMs / 1e3}%7.2f ${r.wallMs / 1e3}%6.2f ${r.nTasks}%5d " +
          f"${r.shReadMb}%7.1f ${r.shWriteMb}%7.1f ${r.inputMb}%6.1f  " +
          f"[${r.stage}%4d] ${r.site}")
    }
    val totalTask = rows.map(_.taskMs).sum / 1e3
    val totalWall = rows.map(_.wallMs).sum / 1e3
    println(f"total task-time $totalTask%.1f s, summed stage wall $totalWall%.1f s across ${rows.size} stages")
    spark.stop()
  }
}
