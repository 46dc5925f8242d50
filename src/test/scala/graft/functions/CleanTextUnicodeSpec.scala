package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Differential test for the SURVEY §7.5 whitespace risk: the Spark
  * column cleanText must collapse the same characters Python's
  * str.split() does — including Unicode whitespace (NBSP, ideographic
  * space, line/paragraph separators, NEL) that Java's default ASCII
  * `\s` misses.
  */
class CleanTextUnicodeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // Python str.split() semantics: split on Unicode whitespace
  private def pythonClean(s: String): String =
    s.split("(?U)\\s+").filter(_.nonEmpty).mkString(" ")

  private val wsChars: Seq[String] = Seq(
    " ", "\t", "\n", "\r", "", "",
    "", // NEL
    " ", // NBSP
    " ", // ogham space
    " ", " ", " ", // en quad / em space / thin space
    " ", " ", // line / paragraph separator
    " ", " ", // narrow NBSP / math space
    "　" // ideographic space
  )

  private val chunk: Gen[String] =
    Gen.oneOf(Gen.alphaNumStr.map(_.take(8)), Gen.oneOf(wsChars))

  private val text: Gen[String] = Gen.listOf(chunk).map(_.mkString)

  test("column cleanText matches Python split semantics incl. Unicode ws") {
    import spark.implicits._
    val samples =
      (Gen.listOfN(300, text).sample.get :+ wsChars.mkString :+ "").distinct
    val got = samples
      .toDF("v")
      .select(col("v"), TextFunctions.cleanText(col("v")).as("c"))
      .collect()
      .map(r => r.getString(0) -> r.getString(1))
    got.foreach { case (in, out) =>
      val hex = in.map(c => f"\\u${c.toInt}%04x").mkString
      assert(out == pythonClean(in), s"mismatch for [$hex]")
    }
  }

  test("filenameSafe replaces all reserved characters") {
    import spark.implicits._
    val got = Seq("""a<b>c:d"e/f\g|h?i*j.json""")
      .toDF("v")
      .select(TextFunctions.filenameSafe(col("v")))
      .collect()(0)
      .getString(0)
    assert(got == "a_b_c_d_e_f_g_h_i_j.json")
  }

  test("specific Unicode whitespace cases") {
    import spark.implicits._
    val cases = Seq(
      "a b" -> "a b", // NBSP
      "a　b" -> "a b", // ideographic space
      "a b" -> "a b", // line separator
      "   " -> "",
      "ab" -> "a b" // NEL
    )
    val got = cases
      .map(_._1)
      .toDF("v")
      .select(TextFunctions.cleanText(col("v")))
      .collect()
      .map(_.getString(0))
    assert(got.toSeq == cases.map(_._2))
  }
}
