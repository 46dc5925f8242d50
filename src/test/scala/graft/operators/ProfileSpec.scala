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

  test("KMV sketch: exact below k, inside ~2/sqrt(k) above, merge-stable") {
    import graft.functions.KmvSketch
    // below k the sketch is exact
    val small = (1L to 100L).foldLeft(KmvSketch.zero)(KmvSketch.reduce)
    assert(KmvSketch.finish(small) == 100.0)
    // duplicates don't inflate
    val dup = (1L to 100L).foldLeft(small)(KmvSketch.reduce)
    assert(KmvSketch.finish(dup) == 100.0)
    // above k: estimate within ~2/sqrt(k) relative error for a
    // deterministic well-spread hash stream
    val n = 50000
    val hashes = (1 to n).map { i =>
      var h = i.toLong * 0x9e3779b97f4a7c15L
      h ^= (h >>> 32); (h & ((1L << 60) - 1))
    }
    val full = hashes.foldLeft(KmvSketch.zero)(KmvSketch.reduce)
    val est = KmvSketch.finish(full)
    assert(math.abs(est - n) / n < 2.0 / math.sqrt(KmvSketch.K.toDouble))
    // merge of a split stream equals the sequential sketch
    val (l, r2) = hashes.splitAt(n / 3)
    val merged = KmvSketch.merge(
      l.foldLeft(KmvSketch.zero)(KmvSketch.reduce),
      r2.foldLeft(KmvSketch.zero)(KmvSketch.reduce)
    )
    assert(KmvSketch.finish(merged) == est)
    assert(merged.toSeq == full.toSeq)
  }
}
