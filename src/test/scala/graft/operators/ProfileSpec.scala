package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ProfileSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  test("profile rows cover each column with zero nulls in test data") {
    val rows = Profile
      .lineitemProfile(spark, dir)
      .collect()
      .map(r => r.getAs[String]("column_name") -> r)
      .toMap
    assert(rows.keySet == Set("l_quantity", "l_extendedprice",
      "l_returnflag", "l_orderkey"))
    assert(rows.values.forall(_.getAs[Long]("n_null") == 0L))
    assert(rows("l_returnflag").getAs[Long]("n_distinct") == 3L)
  }

  test("HLL sketch cardinality stays inside its error bound") {
    val r = Profile.cardinalitySketch(spark, dir).collect()(0)
    val exact = r.getAs[Long]("exact").toDouble
    val d = r.getAs[Long]("approx_default").toDouble
    val p1 = r.getAs[Long]("approx_rsd_1pct").toDouble
    assert(math.abs(d - exact) / exact < 0.10)
    assert(math.abs(p1 - exact) / exact < 0.05)
  }
}
