package graft.operators

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for the round-7 operator batch. */
class Round7OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  test("q150 unimax matches the sequential smallest-first allocation") {
    val epochCap = 2
    val out = Sampling
      .unimaxAllocation(spark, dir, epochCap = epochCap)
      .collect()
      .map(r =>
        r.getAs[String]("lang") ->
          ((r.getAs[Long]("alloc_chars"), r.getAs[Boolean]("capped"),
            r.getAs[Double]("epochs"))))
      .toMap

    // naive reference: walk languages smallest-first, cap or share
    val perLang = Tables
      .documents(spark, dir)
      .groupBy("lang")
      .agg(sum("n_chars").as("c"))
      .collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("c")))
      .sortBy(t => (t._2, t._1))
    val budget = math.floor(0.5 * perLang.map(_._2).sum).toLong
    var remaining = budget.toDouble
    var left = perLang.length
    val naive = perLang.map { case (lang, c) =>
      val share = remaining / left
      val cap = (epochCap.toLong * c).toDouble
      val alloc = math.min(cap, share)
      remaining -= alloc
      left -= 1
      (lang, c, alloc < share)
    }

    naive.foreach { case (lang, c, isCapped) =>
      val (alloc, capped, epochs) = out(lang)
      assert(capped == isCapped, s"$lang capped flag")
      if (isCapped) assert(alloc == epochCap.toLong * c, s"$lang capped alloc")
      assert(math.abs(epochs - alloc.toDouble / c) < 1e-6)
      assert(epochs <= epochCap + 1e-9, s"$lang exceeds the epoch cap")
    }
    // every uncapped language gets the same floor'd share
    val uncapped = naive.filterNot(_._3).map(t => out(t._1)._1).distinct
    assert(uncapped.length <= 1, "uncapped languages share equally")
    // allocation never exceeds the budget
    assert(out.values.map(_._1).sum <= budget)
    // and leaves at most (#langs) chars unallocated (floor slack)
    assert(out.values.map(_._1).sum >= budget - perLang.length)
  }
}
