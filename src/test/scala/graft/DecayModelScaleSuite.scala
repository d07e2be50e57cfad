package graft

import graft.windowing.{DecayModel, ExponentialWindowing, PowerWindowing}
import org.scalatest.funsuite.AnyFunSuite

/** Validates the O(log n) closed-form decomposition against the O(n)
  * heap simulation, and its performance at stream sizes where the
  * simulation is impossible.
  */
class DecayModelScaleSuite extends AnyFunSuite {

  /** Simulation result forced through the non-fast path. */
  private def simulated(base: Double, n: Long): Seq[Long] =
    DecayModel
      .decomposeEvents(ExponentialWindowing(base), Iterator.range(0L, n).map(_ => 1L))
      .map(_._1).toSeq

  test("closed form == simulation, exhaustive n <= 2048, bases 2/3/4") {
    for (b <- Seq(2L, 3L, 4L); n <- 1L to 2048L) {
      val fast = DecayModel.windowStarts(ExponentialWindowing(b.toDouble), n).toSeq
      val slow = simulated(b.toDouble, n)
      assert(fast == slow, s"base $b n=$n: fast=$fast slow=$slow")
    }
  }

  test("closed form == simulation, sampled n <= 1e5, bases 2/3/5/7") {
    val rnd = new scala.util.Random(11)
    for (b <- Seq(2L, 3L, 5L, 7L); _ <- 1 to 12) {
      val n = 2049L + rnd.nextInt(97952)
      val fast = DecayModel.windowStarts(ExponentialWindowing(b.toDouble), n).toSeq
      assert(fast == simulated(b.toDouble, n), s"base $b n=$n")
    }
  }

  test("1e9- and 1e12-element decompositions return in milliseconds") {
    for (n <- Seq(1000000000L, 1000000000000L)) {
      val t0 = System.nanoTime()
      val starts = DecayModel.windowStarts(ExponentialWindowing(2.0), n)
      val ms = (System.nanoTime() - t0) / 1e6
      assert(ms < 200.0, s"n=$n took $ms ms")
      // Structural invariants: starts ascending from 0; O(log n) windows;
      // implied sizes conserve n.
      assert(starts.head == 0L && starts.length < 128)
      assert(starts.sliding(2).forall(p => p.length < 2 || p(0) < p(1)))
      val sizes = (starts :+ n).sliding(2).map(p => p(1) - p(0)).toSeq
      assert(sizes.sum == n)
      // windowIdOf stays consistent at the extremes.
      assert(DecayModel.windowIdOf(starts, 0L) == 0)
      assert(DecayModel.windowIdOf(starts, n - 1) == starts.length - 1)
    }
  }

  test("non-integral bases still simulate correctly (fallback path)") {
    val starts = DecayModel.windowStarts(ExponentialWindowing(1.5), 1000L)
    assert(starts.head == 0L)
    val sizes = (starts :+ 1000L).sliding(2).map(p => p(1) - p(0)).toSeq
    assert(sizes.sum == 1000L)
  }

  /** Simulation result for a power spec, forced through the sim path. */
  private def simulatedPower(pw: PowerWindowing, n: Long): Seq[Long] =
    DecayModel
      .decomposeEvents(pw, Iterator.range(0L, n).map(_ => 1L))
      .map(_._1).toSeq

  test("power closed form == simulation, exhaustive n <= 2048, several specs") {
    for (pw <- Seq(PowerWindowing(1, 1, 10, 1), PowerWindowing(2, 1, 2, 1),
        PowerWindowing(3, 1, 6, 1), PowerWindowing(1, 1, 4, 1)); n <- 1L to 2048L) {
      val fast = DecayModel.windowStarts(pw, n).toSeq
      assert(fast == simulatedPower(pw, n), s"$pw n=$n")
    }
  }

  test("power closed form == simulation, sampled n <= 2e5") {
    val rnd = new scala.util.Random(23)
    for (pw <- Seq(PowerWindowing(1, 1, 10, 1), PowerWindowing(2, 1, 2, 1)); _ <- 1 to 10) {
      val n = 2049L + rnd.nextInt(200000)
      assert(DecayModel.windowStarts(pw, n).toSeq == simulatedPower(pw, n), s"$pw n=$n")
    }
  }

  test("power decomposition at n = 1e10: fast, conserving, nesting") {
    val pw = PowerWindowing(1, 1, 10, 1)
    val n = 10000000000L
    val t0 = System.nanoTime()
    val starts = DecayModel.windowStarts(pw, n)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(ms < 2000.0, s"n=$n took $ms ms")
    // Theta(sqrt(n)) windows, ascending from 0, sizes conserve n,
    // sizes non-increasing old -> new (power-of-two classes).
    assert(starts.head == 0L && starts.length > 100000 && starts.length < 1000000)
    val sizes = (starts :+ n).sliding(2).map(p => p(1) - p(0)).toSeq
    assert(sizes.sum == n)
    assert(sizes.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    // Merges only coalesce: every boundary at n+1 (below n) already
    // existed at n — the invariant Compactor.recoarsen relies on.
    val next = DecayModel.windowStarts(pw, n + 1).filter(_ < n).toSet
    assert(next.subsetOf(starts.toSet), "boundaries at n+1 not nested in n")
    // windowIdOf consistent at the extremes.
    assert(DecayModel.windowIdOf(starts, 0L) == 0)
    assert(DecayModel.windowIdOf(starts, n - 1) == starts.length - 1)
  }

  test("overflow guard: huge n on a simulated-only policy is rejected") {
    // Odd R fails the band-divisibility check -> must refuse, not garble.
    intercept[IllegalArgumentException] {
      DecayModel.windowStarts(PowerWindowing(1, 1, 9, 1), Int.MaxValue.toLong * 2)
    }
    // q != 1 power specs have non-power-of-two classes -> sim only.
    intercept[IllegalArgumentException] {
      DecayModel.windowStarts(PowerWindowing(2, 2, 2, 3), Int.MaxValue.toLong * 2)
    }
    intercept[IllegalArgumentException] {
      DecayModel.sessionSizes(ExponentialWindowing(2.0), Int.MaxValue.toLong * 2)
    }
  }
}
