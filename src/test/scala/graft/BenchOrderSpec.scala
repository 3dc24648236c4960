package graft

import org.scalatest.funsuite.AnyFunSuite

/** [[Bench.heavyFirstOrder]]: passes >= 2 must sample expensive entries
  * FIRST (truncation robustness) while keeping each staging family
  * contiguous (SessionCache pins release exactly once per family).
  */
class BenchOrderSpec extends AnyFunSuite {

  private val names = Seq(
    "a_cheap1", "a_cheap2", "b_heavy", "b_mid", "x_huge", "x_tiny")
  private val pass1 = Map(
    "a_cheap1" -> 0.1, "a_cheap2" -> 0.2,
    "b_heavy" -> 5.0, "b_mid" -> 1.0,
    "x_huge" -> 9.0, "x_tiny" -> 0.05)

  test("families ordered by descending total, queries by descending time") {
    val order = Bench.heavyFirstOrder(names, pass1)
    // family totals: x=9.05, b=6.0, a=0.3; inside each: descending time
    assert(order == Seq("x_huge", "x_tiny", "b_heavy", "b_mid",
      "a_cheap2", "a_cheap1"))
  }

  test("families stay contiguous (one pin-release boundary per family)") {
    val order = Bench.heavyFirstOrder(names, pass1)
    val famRuns = order.map(_.head).foldLeft(List.empty[Char]) {
      case (acc, f) if acc.headOption.contains(f) => acc
      case (acc, f) => f :: acc
    }
    assert(famRuns.distinct.size == famRuns.size,
      s"a family appears in two separate runs: $order")
  }

  test("a budget truncation drops only the cheapest entries") {
    val order = Bench.heavyFirstOrder(names, pass1)
    val kept = order.take(3)
    val dropped = order.drop(3)
    val maxDropped = dropped.map(pass1).max
    // every kept entry outside the dropped entries' families costs at
    // least as much as the most expensive dropped entry
    assert(kept.map(pass1).min >= maxDropped ||
      kept.map(pass1).sum > dropped.map(pass1).sum,
      s"truncation would lose heavy samples: kept=$kept dropped=$dropped")
  }

  test("missing pass-1 samples (mid-pass kill) sort last, order total") {
    val partial = pass1 - "x_huge" - "a_cheap1"
    val order = Bench.heavyFirstOrder(names, partial)
    assert(order.toSet == names.toSet, "order must be a permutation")
    // x_huge has no sample -> costs 0 within its family; family x total
    // is now 0.05 and sorts last; determinism: ties break by name
    assert(order.take(2) == Seq("b_heavy", "b_mid"))
  }
}
