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

  test("overflow guard: huge n on a simulated-only policy is rejected") {
    intercept[IllegalArgumentException] {
      DecayModel.windowStarts(PowerWindowing(1, 1, 10, 1), Int.MaxValue.toLong * 2)
    }
    intercept[IllegalArgumentException] {
      DecayModel.sessionSizes(ExponentialWindowing(2.0), Int.MaxValue.toLong * 2)
    }
  }
}
