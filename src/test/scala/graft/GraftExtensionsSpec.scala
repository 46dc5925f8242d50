package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extensions entry point must make the custom functions available
  * in SQL on a session built with withExtensions — no manual
  * registration calls.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("withExtensions(GraftExtensions) exposes vec_dot and jira_tasks") {
    val spark = SparkSession
      .builder()
      .master("local[2]")
      .appName("extensions-spec")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val d = spark
        .sql(
          "SELECT vec_dot(array(CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT))) AS d"
        )
        .collect()(0)
        .getDouble(0)
      assert(d == 6.0)
      val flat = jira.JiraFlatten.flatten(
        jira.JiraPipeline.readRaw(
          spark,
          s"${jira.JiraPipeline.FixtureDir}/raw_issues_TEST.jsonl"
        ),
        "TEST"
      )
      flat.createOrReplaceTempView("iss_ext")
      val n = spark
        .sql(
          s"""SELECT count(*) FROM iss_ext
              LATERAL VIEW jira_tasks(struct(${flat.columns.mkString(", ")})) v AS t"""
        )
        .collect()(0)
        .getLong(0)
      assert(n == 39L)
    } finally {
      // the shared-JVM session for other suites is rebuilt on demand
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
