package graft.operators

import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The composed training-data pipeline as ONE lazy DAG
  * (clean → quality gate → exact dedup → task fan-out → corpus stats):
  * what a user of this engine actually runs end-to-end. Catalyst sees
  * the whole graph, so filters push through the fan-out into the scan
  * and the only shuffles are the dedup groupBy and the final stats
  * aggregation.
  */
object PipelineE2E {

  val QualityThreshold = 0.5

  def corpusPipeline(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables
      .documents(spark, dir)
      .withColumn("quality", qualityScore(col("text")))
      .filter(col("quality") >= QualityThreshold)
      // production observability: named metrics collected DURING the
      // run (CollectMetrics — no extra pass, no effect on results);
      // at 100 TB this is how yield/quality drift is monitored
      // per-job without a second aggregation query. Read back via
      // df.queryExecution.observedMetrics after an action.
      .observe(
        "gate_metrics",
        count(lit(1)).as("docs_passed_gate"),
        round(avg(col("quality")), 6).as("mean_gate_quality")
      )

    // exact dedup: survivor per text hash (min doc_id wins)
    val survivors = docs
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))

    val deduped = docs.join(survivors, Seq("doc_id"), "left_semi")

    // fan-out: same guarded-task explode as TextAnalysis.taskFanout,
    // applied to the filtered+deduped corpus
    val nTokens = tokenCount(col("text")).cast("long")
    val taskType = struct(
      lit("token_stats").as("task_type"),
      nTokens.cast("string").as("output")
    )
    val summarize = when(
      col("n_chars") > 250,
      struct(
        lit("summarize").as("task_type"),
        cleanText(col("text"), 80).as("output")
      )
    )
    val langVerify = when(
      col("lang") =!= "en",
      struct(lit("lang_verify").as("task_type"), col("lang").as("output"))
    )
    val tasks = deduped.select(
      col("doc_id"),
      col("quality"),
      explode(
        filter(array(taskType, summarize, langVerify), t => t.isNotNull)
      ).as("task")
    )

    tasks
      .groupBy(col("task.task_type").as("task_type"))
      .agg(
        count(lit(1)).as("n_examples"),
        countDistinct(col("doc_id")).as("n_docs"),
        // mean of the driver-proven 6-rounded quality recovered as an
        // exact micro integer (the q166/q167 trick)
        graft.functions.IntMath
          .idivHalfUp(
            sum(round(round(col("quality"), 6) * 1e6).cast("long")),
            count(lit(1)))
          .as("avg_quality_micro")
      )
  }
}
