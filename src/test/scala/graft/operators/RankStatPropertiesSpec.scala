package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based tests over pure-Scala twins of the round-8 rank and
  * sequential-statistics kernels. The DataFrame forms are pinned to
  * the same arithmetic by the 3-SF oracle gates (q283/q308/q285); the
  * properties here verify the MATH the kernels implement, over random
  * inputs far outside the bench corpus.
  */
class RankStatPropertiesSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  /** The q283 doubled-average-rank construction over a value multiset:
    * returns value -> 2x average rank as exact integers.
    */
  private def rank2(values: Seq[Long]): Map[Long, Long] = {
    val groups = values.groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.sortBy(_._1)
    var cum = 0L
    groups.map { case (v, c) =>
      val r2 = 2 * cum + c + 1
      cum += c
      v -> r2
    }.toMap
  }

  private val sample: Gen[List[Long]] =
    Gen.nonEmptyListOf(Gen.choose(0L, 20L))

  test("doubled average ranks sum to N(N+1) for any tie structure") {
    check(Prop.forAll(sample) { xs =>
      val r = rank2(xs)
      xs.map(r).sum == xs.length.toLong * (xs.length + 1)
    })
  }

  test("Mann-Whitney U2 from group ranks equals the brute-force count") {
    val twoGroups = for {
      a <- Gen.nonEmptyListOf(Gen.choose(0L, 10L))
      b <- Gen.nonEmptyListOf(Gen.choose(0L, 10L))
    } yield (a, b)
    check(Prop.forAll(twoGroups) { case (a, b) =>
      val r = rank2(a ++ b)
      val r2a = a.map(r).sum
      val u2 = r2a - a.length.toLong * (a.length + 1)
      // brute force: 2*U = 2*#(a>b pairs) + #(ties)
      val brute = (for { x <- a; y <- b } yield {
        if (x > y) 2L else if (x == y) 1L else 0L
      }).sum
      u2 == brute
    })
  }

  test("CUSUM closed form equals the sequential recursion") {
    val series = Gen.nonEmptyListOf(Gen.choose(-50L, 50L))
    check(Prop.forAll(series) { ds =>
      var s = 0L
      val rec = ds.map { d => s = math.max(0L, s + d); s }
      // the q308 form: S_t = P_t - min(0, min_{j<=t} P_j)
      var p = 0L
      var minP = 0L
      val closed = ds.map { d =>
        p += d
        minP = math.min(minP, p)
        p - math.min(minP, 0L)
      }
      rec == closed
    })
  }

  test("Theil decomposition: between + weighted within equals total") {
    val grouped = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(0, 3), Gen.choose(1L, 100L)))
    check(Prop.forAll(grouped) { xs =>
      val all = xs.map(_._2.toDouble)
      val mu = all.sum / all.length
      val total = all.map(x => x / mu * math.log(x / mu)).sum / all.length
      val bySrc = xs.groupBy(_._1).values.toSeq.map(_.map(_._2.toDouble))
      val n = all.length.toDouble
      val tot = all.sum
      val decomposed = bySrc.map { g =>
        val ms = g.sum / g.length
        val within = g.map(x => x / ms * math.log(x / ms)).sum / g.length
        val share = g.sum / tot
        share * within + share * math.log(ms / mu)
      }.sum
      math.abs(total - decomposed) < 1e-9
    })
  }

  test("Hamilton rounding always hits the budget exactly") {
    val quotas = Gen.nonEmptyListOf(Gen.choose(0L, 1000000L))
    check(Prop.forAll(quotas, Gen.choose(1L, 1000L)) { (raw, budget) =>
      // normalize raw weights to micro-quotas summing ~ budget*1e6
      val tot = raw.sum.max(1L)
      val micro = raw.map(r =>
        math.round(r.toDouble / tot * budget * 1e6))
      val base = micro.map(_ / 1000000L)
      val rem = micro.map(_ % 1000000L)
      val leftover = math.max(budget - base.sum, 0L)
      val order = rem.zipWithIndex.sortBy { case (r, i) => (-r, i) }
      val bonus = order.take(leftover.toInt).map(_._2).toSet
      val alloc = base.zipWithIndex.map { case (b, i) =>
        b + (if (bonus(i)) 1L else 0L)
      }
      // leftover can exceed the list size only if rounding removed
      // more than one whole unit per cell — impossible
      leftover <= raw.length.toLong && alloc.sum == budget
    })
  }
}
