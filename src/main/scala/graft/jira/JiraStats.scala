package graft.jira

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Statistics stage (transformer.py:316-357, main.py:99-106;
  * SURVEY §2.6).
  *
  * Distinct-value lists are sorted (`sort_array∘collect_set`) — the
  * reference's Python set iteration order is nondeterministic, so the
  * deterministic sorted form is the comparable one (SURVEY §2.10).
  * Both aggregations are partial-aggregated map-side; the distribution
  * map is built with map_from_entries over a sorted entry list so the
  * map's key order is deterministic too.
  */
object JiraStats {

  /** Per-project dataset statistics over generated examples. */
  def perProject(examples: DataFrame): DataFrame = {
    val byType = examples
      .groupBy(col("metadata.project").as("project"), col("task_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("project"))
      .agg(
        sum(col("n")).as("total_examples"),
        map_from_entries(
          array_sort(collect_list(struct(col("task_type"), col("n"))))
        ).as("task_type_distribution")
      )
    val sets = examples
      .groupBy(col("metadata.project").as("project"))
      .agg(
        sort_array(collect_set(col("metadata.project"))).as("projects"),
        sort_array(collect_set(col("metadata.issue_type"))).as("issue_types"),
        sort_array(collect_set(col("metadata.priority"))).as("priorities"),
        sort_array(collect_set(col("metadata.status"))).as("statuses")
      )
    byType.join(sets, Seq("project"))
  }

  /** Combined stats across projects (main.py:99-106). `issueCounts`
    * carries (project, raw_issues_count) from the flatten stage.
    */
  def combined(perProjectStats: DataFrame, issueCounts: DataFrame): DataFrame =
    perProjectStats
      .join(issueCounts, Seq("project"), "left")
      .agg(
        sum(col("total_examples")).as("total_examples"),
        sum(col("raw_issues_count")).as("total_issues"),
        count(lit(1)).as("projects_processed"),
        sort_array(collect_list(col("project"))).as("projects")
      )
}
