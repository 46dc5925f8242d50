package graft.jira

import org.apache.spark.sql.types._

/** Schemas for the Jira pipeline (SURVEY.md §1.3, FIXTURES.md §1-§3).
  *
  * The raw schema is explicit — never inferred — mirroring the field
  * list the reference requests from the server
  * (/root/reference/config.py:68-85). The flattened/example shapes are
  * both StructTypes (for DataFrame ops) and case classes (for the
  * typed flatMap twin used in differential tests).
  */
object JiraSchemas {

  private val userType = StructType(
    Seq(
      StructField("displayName", StringType),
      StructField("name", StringType)
    )
  )

  private val nameObj = StructType(Seq(StructField("name", StringType)))

  val rawCommentType: StructType = StructType(
    Seq(
      StructField("author", userType),
      StructField("created", StringType),
      StructField("body", StringType)
    )
  )

  /** Raw JIRA issue as served by the REST /search endpoint. */
  val rawIssueSchema: StructType = StructType(
    Seq(
      StructField("key", StringType),
      StructField("id", StringType),
      StructField(
        "fields",
        StructType(
          Seq(
            StructField("summary", StringType),
            StructField("description", StringType),
            StructField("status", nameObj),
            StructField("priority", nameObj),
            StructField("issuetype", nameObj),
            StructField("project", StructType(Seq(StructField("key", StringType)))),
            StructField("reporter", userType),
            StructField("assignee", userType),
            StructField("created", StringType),
            StructField("updated", StringType),
            StructField("resolutiondate", StringType),
            StructField("labels", ArrayType(StringType)),
            StructField("components", ArrayType(nameObj)),
            StructField("versions", ArrayType(nameObj)),
            StructField("fixVersions", ArrayType(nameObj)),
            StructField(
              "comment",
              StructType(
                Seq(StructField("comments", ArrayType(rawCommentType)))
              )
            )
          )
        )
      )
    )
  )

  /** Raw issue schema plus the absent-vs-null presence probes
    * ([[JiraFlatten.ProbeFieldsKeys]]/[[JiraFlatten.ProbeTopKeys]]).
    * The DSv2 source serves this shape so the connector path carries
    * the same drop semantics as the file path (scraper.py:217,
    * 316-318); both probe columns prune away like any other column
    * when unreferenced.
    */
  val rawIssueSchemaWithProbes: StructType = rawIssueSchema
    .add(StructField(JiraFlatten.ProbeFieldsKeys, ArrayType(StringType)))
    .add(StructField(JiraFlatten.ProbeTopKeys, ArrayType(StringType)))
}

/** Flattened issue record — the reference's "table row"
  * (scraper.py:203-257 shape, SURVEY §1.3).
  */
case class IssueComment(author: String, created: String, body: String)

case class IssueRecord(
    issue_key: String,
    issue_id: String,
    project: String,
    url: String,
    title: String,
    description: String,
    status: String,
    priority: String,
    issue_type: String,
    reporter: String,
    assignee: String,
    created: String,
    updated: String,
    resolved: String,
    labels: Seq[String],
    components: Seq[String],
    versions: Seq[String],
    fix_versions: Seq[String],
    comments: Seq[IssueComment],
    comment_count: Int
)

/** Unified metadata: the 9 base fields (base wins on collision,
  * transformer.py:228-238) ∪ question_type (QA rows only).
  */
case class ExampleMetadata(
    issue_key: String,
    project: String,
    issue_type: String,
    priority: String,
    status: String,
    created: String,
    url: String,
    labels: Seq[String],
    components: Seq[String],
    question_type: Option[String]
)

case class TrainingExample(
    task_type: String,
    instruction: String,
    input: String,
    output: String,
    metadata: ExampleMetadata
)
