package graft.operators

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for the round-3 operators: banded sign-LSH,
  * label centroids, BPE-ish token counting, grouping sets,
  * lag/lead deltas, stratified sampling.
  */
class Round3OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  test("q70 LSH pairs are a recalled subset of q26-style all-pairs") {
    val lsh = Similarity
      .lshNearDupPairs(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b")) ->
        (r.getAs[Long]("n_shared_bands"), r.getAs[Double]("sim")))
      .toMap
    assert(lsh.nonEmpty, "banded LSH must recall some pairs")
    lsh.values.foreach { case (b, _) => assert(b >= 1 && b <= 4) }
    // exact all-pairs ground truth at the same threshold (computed
    // directly — q26 is itself banded since round 5, so it is no
    // longer an exact superset; q70 shares its uncapped 4×4 coder
    // since round 6)
    val e = Tables.embeddings(spark, dir)
    val all = e
      .select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
      .join(
        e.select(col("vec_id").as("vec_b"), col("embedding").as("eb")),
        col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(Similarity.cosine(col("ea"), col("eb")), 6).as("sim"))
      .filter(col("sim") > 0.4)
      .collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b")) ->
        r.getAs[Double]("sim"))
      .toMap
    lsh.foreach { case (pair, (_, sim)) =>
      assert(all.contains(pair), s"$pair not in exact all-pairs")
      assert(all(pair) == sim, s"$pair sim mismatch")
    }
    // OR-amplified recall should be substantial at this similarity
    assert(lsh.size * 2 >= all.size,
      s"recall ${lsh.size}/${all.size} below 50%")
  }

  test("LSH band coding pass is shuffle-free (broadcast planes only)") {
    val plan = Similarity
      .lshBandCodes(spark, dir, None, planesPerBand = 4)
      .queryExecution
      .executedPlan
      .toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"band coding must not shuffle:\n$plan")
  }

  test("q69 centroid vectors assemble the flat rows, dim-complete") {
    val flat = Similarity.labelCentroids(spark, dir)
    val n = flat.agg(sum(col("n_vecs"))).collect()(0).getLong(0)
    val nVecs = Tables.embeddings(spark, dir).count()
    assert(n == nVecs * 64, "every (label, dim) cell counted")
    val vecs = Similarity.labelCentroidVectors(spark, dir).collect()
    assert(vecs.nonEmpty)
    vecs.foreach { r =>
      assert(r.getAs[collection.Seq[Double]]("centroid").length == 64)
    }
    // vector form equals the flat form, per (label, dim)
    val flatMap = flat
      .collect()
      .map(r => (r.getAs[Int]("label"), r.getAs[Int]("dim")) ->
        r.getAs[Double]("centroid_val"))
      .toMap
    vecs.foreach { r =>
      val label = r.getAs[Int]("label")
      r.getAs[collection.Seq[Double]]("centroid").zipWithIndex.foreach {
        case (v, d) => assert(flatMap((label, d)) == v, s"label $label dim $d")
      }
    }
  }

  test("q66 BPE segment counts match java.util.regex on edge cases") {
    import spark.implicits._
    val cases = Seq(
      "don't stop",
      "  leading and trailing  ",
      "a1b2 c3",
      "!!!",
      "",
      "   ",
      "héllo wörld",
      "中文 text 42",
      "it's we're I'll they'd you've I'm"
    )
    val p = java.util.regex.Pattern.compile(TextAnalysis.BpePattern)
    val expected = cases.map { s =>
      val m = p.matcher(s)
      var n = 0L
      while (m.find()) n += 1
      s -> n
    }.toMap
    val got = cases
      .toDF("text")
      .select(
        col("text"),
        size(regexp_extract_all(col("text"),
          lit(TextAnalysis.BpePattern), lit(0))).cast("long").as("n"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(got == expected)
  }

  test("q68 grouping sets: gid semantics and totals line up") {
    val rows = Relational
      .groupingSets(spark, dir)
      .collect()
      .map(r => (Option(r.getAs[String]("l_returnflag")),
        Option(r.getAs[String]("l_linestatus")),
        r.getAs[Int]("gid"), r.getAs[Long]("n")))
    // gid 0 = (flag, status); gid 1 = (flag) subtotal; gid 3 = total
    assert(rows.count(_._3 == 3) == 1)
    rows.foreach {
      case (f, s, 0, _) => assert(f.isDefined && s.isDefined)
      case (f, s, 1, _) => assert(f.isDefined && s.isEmpty)
      case (f, s, 3, _) => assert(f.isEmpty && s.isEmpty)
      case (_, _, g, _) => fail(s"unexpected gid $g (set (status) not asked)")
    }
    val total = rows.filter(_._3 == 3).map(_._4).sum
    val detail = rows.filter(_._3 == 0).map(_._4).sum
    val subtotal = rows.filter(_._3 == 1).map(_._4).sum
    assert(total == detail && total == subtotal)
  }

  test("q67 deltas: secs_since_prev is non-negative and rank is dense") {
    val rows = Events
      .lagLeadDeltas(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getAs[java.lang.Long]("us_since_prev")
      if (d != null) assert(d >= 0L, "events ordered by ts within user")
    }
    val perUser = rows.groupBy(_.getAs[Long]("user_id"))
    perUser.foreach { case (_, rs) =>
      val ranks = rs.map(_.getAs[Int]("event_rank")).sorted
      assert(ranks.toSeq == (1 to rs.length))
      // exactly one head per user (no prev), one tail (no next)
      assert(rs.count(_.getAs[java.lang.Long]("prev_value_cents") == null) == 1)
      assert(rs.count(_.getAs[java.lang.Long]("next_value_cents") == null) == 1)
    }
  }

  test("q67 plan: five window functions share one shuffle + one sort") {
    val plan = Events
      .lagLeadDeltas(spark, dir)
      .queryExecution
      .executedPlan
      .toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    val windows = "\\bWindow\\b".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly one shuffle:\n$plan")
    assert(windows == 1,
      s"all window functions must fuse into one Window op:\n$plan")
  }

  test("q69 plan: one shuffle; vectors never cross the exchange whole") {
    val plan = Similarity
      .labelCentroids(spark, dir)
      .queryExecution
      .executedPlan
      .toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
      s"per-(label,dim) partial agg then one exchange:\n$plan")
    assert(plan.contains("partial_avg") || plan.contains("partial_average")
      || plan.toLowerCase.contains("partial"),
      s"map-side partial aggregation expected:\n$plan")
  }

  test("q71 stratified sample: rates applied per stratum, map-only plan") {
    val df = Sampling.stratifiedSample(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling must not shuffle:\n$plan")
    val byLang = df
      .groupBy(col("lang"), col("keep_permille"))
      .agg(count(lit(1)).as("n"), sum(col("sampled").cast("long")).as("kept"))
      .collect()
    byLang.foreach { r =>
      val rate = r.getAs[Int]("keep_permille")
      val n = r.getAs[Long]("n")
      val kept = r.getAs[Long]("kept")
      if (rate == 1000) assert(kept == n, "full-keep stratum")
      else {
        // md5 buckets ≈ uniform: kept/n within a loose band of rate
        val frac = kept.toDouble / n
        assert(math.abs(frac - rate / 1000.0) < 0.2,
          s"${r.getAs[String]("lang")}: kept $kept of $n at rate $rate")
      }
    }
  }
}
