package graft

import graft.jira.{IssueComment, IssueRecord, JiraGeneratorsTyped}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based tests (SURVEY §5.2.2) over the pure-Scala twins of
  * the engine's scalar/generator semantics. The Spark column forms are
  * proven equal to these twins by the differential tests in
  * JiraParitySpec, so properties verified here hold for the engine.
  */
class PropertiesSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  // clean_text reference semantics, pure form (utils.py:84-105).
  // (?U) makes \s the Unicode whitespace class — Python's str.split()
  // splits on NBSP/ideographic space etc., which Java's ASCII \s does
  // not (SURVEY §7.5 risk 1); this twin must match the column form.
  private def cleanText(s: String, maxLen: Option[Int] = None): String = {
    val collapsed = s.split("(?U)\\s+").filter(_.nonEmpty).mkString(" ")
    maxLen match {
      case Some(l) if collapsed.length > l => collapsed.take(l) + "..."
      case _ => collapsed
    }
  }

  private val text: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumStr, Gen.oneOf(" ", "\n", "\t", "  ")))
      .map(_.mkString)

  test("cleanText is idempotent") {
    check(Prop.forAll(text)(s => cleanText(cleanText(s)) == cleanText(s)))
  }

  test("cleanText(maxLen) length is bounded by maxLen + 3") {
    check(Prop.forAll(text, Gen.choose(1, 50)) { (s, l) =>
      cleanText(s, Some(l)).length <= l + 3
    })
  }

  test("cleanText never contains runs of whitespace") {
    check(Prop.forAll(text)(s => !cleanText(s).matches(".*\\s\\s.*")))
  }

  private val comment: Gen[IssueComment] =
    for {
      a <- Gen.alphaStr
      b <- Gen.alphaNumStr.suchThat(_.nonEmpty)
    } yield IssueComment(a, "2024-01-01T00:00:00.000+0000", b)

  private val issue: Gen[IssueRecord] =
    for {
      key <- Gen.identifier.map("K-" + _.take(6))
      title <- Gen.oneOf(Gen.const(""), Gen.alphaNumStr)
      desc <- Gen.oneOf(Gen.const(""), Gen.alphaNumStr)
      status <- Gen.oneOf("Open", "Resolved", "Closed", "In Progress")
      priority <- Gen.oneOf("Blocker", "Major", "Unknown")
      assignee <- Gen.oneOf("Unknown", "", "dev one")
      comments <- Gen.listOfN(3, comment).flatMap(cs =>
        Gen.choose(0, 3).map(cs.take))
    } yield IssueRecord(
      key, "1", "P", s"https://x/browse/$key", title, desc, status,
      priority, "Bug", "rep", assignee, "2024-01-01T00:00:00.000+0000",
      "", "", Nil, Nil, Nil, Nil, comments, comments.length
    )

  test("fan-out emits 2..7 examples with the exact guard arithmetic") {
    check(Prop.forAll(issue) { i =>
      val out = JiraGeneratorsTyped.transformIssue(i)
      val expected =
        (if (i.description.nonEmpty || i.comments.nonEmpty) 1 else 0) +
          (if (i.title.nonEmpty && i.priority.nonEmpty) 1 else 0) +
          (if (i.title.nonEmpty && i.status.nonEmpty) 1 else 0) +
          2 +
          (if (i.assignee.nonEmpty && i.assignee != "Unknown") 1 else 0) +
          (if (i.comments.nonEmpty &&
               Seq("Resolved", "Closed").contains(i.status)) 1 else 0)
      out.size == expected && out.size >= 2 && out.size <= 7
    })
  }

  test("QA tasks are always present and carry question_type") {
    check(Prop.forAll(issue) { i =>
      val qa = JiraGeneratorsTyped
        .transformIssue(i)
        .filter(_.task_type == "question_answering")
      qa.size >= 2 && qa.forall(_.metadata.question_type.isDefined)
    })
  }
}
