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

  test("power closed form == simulation, exhaustive n <= 2048, odd AND even R") {
    for (pw <- Seq(PowerWindowing(1, 1, 10, 1), PowerWindowing(2, 1, 2, 1),
        PowerWindowing(3, 1, 6, 1), PowerWindowing(1, 1, 4, 1),
        // Odd R: the boundary form's floor carries the phase the old
        // binary-digit form could not express.
        PowerWindowing(1, 1, 1, 1), PowerWindowing(1, 1, 3, 1),
        PowerWindowing(1, 1, 9, 1), PowerWindowing(2, 1, 5, 1),
        PowerWindowing(3, 1, 7, 1)); n <- 1L to 2048L) {
      val fast = DecayModel.windowStarts(pw, n).toSeq
      assert(fast == simulatedPower(pw, n), s"$pw n=$n")
    }
  }

  test("power closed form == simulation, sampled n <= 2e5") {
    val rnd = new scala.util.Random(23)
    for (pw <- Seq(PowerWindowing(1, 1, 10, 1), PowerWindowing(2, 1, 2, 1),
        PowerWindowing(1, 1, 9, 1), PowerWindowing(1, 1, 3, 1)); _ <- 1 to 10) {
      val n = 2049L + rnd.nextInt(200000)
      assert(DecayModel.windowStarts(pw, n).toSeq == simulatedPower(pw, n), s"$pw n=$n")
    }
  }

  test("power decomposition at n = 1e10: fast, conserving, nesting — odd and even R") {
    for (pw <- Seq(PowerWindowing(1, 1, 10, 1), PowerWindowing(1, 1, 9, 1))) {
      val n = 10000000000L
      val t0 = System.nanoTime()
      val starts = DecayModel.windowStarts(pw, n)
      val ms = (System.nanoTime() - t0) / 1e6
      assert(ms < 2000.0, s"$pw n=$n took $ms ms")
      // Theta(sqrt(n)) windows, ascending from 0, sizes conserve n,
      // sizes non-increasing old -> new (power-of-two classes).
      assert(starts.head == 0L && starts.length > 100000 && starts.length < 1000000)
      val sizes = (starts :+ n).sliding(2).map(p => p(1) - p(0)).toSeq
      assert(sizes.sum == n)
      assert(sizes.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
      // Merges only coalesce: every boundary at n+1 (below n) already
      // existed at n — the invariant Compactor.recoarsen relies on.
      val next = DecayModel.windowStarts(pw, n + 1).filter(_ < n).toSet
      assert(next.subsetOf(starts.toSet), s"$pw boundaries at n+1 not nested in n")
      // windowIdOf consistent at the extremes.
      assert(DecayModel.windowIdOf(starts, 0L) == 0)
      assert(DecayModel.windowIdOf(starts, n - 1) == starts.length - 1)
    }
  }

  /** Simulation forced through decomposeEvents (no checkpoints). */
  private def simulatedBuffered(spec: graft.windowing.WindowingSpec, n: Long, buf: Long): Seq[Long] =
    DecayModel
      .decomposeEvents(spec, DecayModel.sessionSizes(spec, n, buf))
      .map(_._1).toSeq

  test("checkpointed simulation == direct simulation (buffered + non-integral)") {
    // Buffered exp-2 across buffer phases, both query orders (the
    // checkpoint store must be correct resuming forward AND re-serving
    // shorter lengths from geometric snapshots).
    val spec = ExponentialWindowing(2.0)
    val ns = Seq(1L, 30L, 31L, 62L, 93L, 100L, 1000L, 4097L, 9999L, 10000L)
    for (n <- ns ++ ns.reverse)
      assert(DecayModel.windowStarts(spec, n, bufferSize = 62L).toSeq ==
        simulatedBuffered(spec, n, 62L), s"buffered exp-2 n=$n")
    // Non-integral base, unbuffered: checkpoint path, increasing then
    // revisited lengths.
    val frac = ExponentialWindowing(1.5)
    for (n <- Seq(10L, 500L, 1000L, 5000L, 999L, 5000L))
      assert(DecayModel.windowStarts(frac, n).toSeq ==
        simulatedBuffered(frac, n, 0L), s"exp-1.5 n=$n")
    // Exotic power spec (q != 1): simulation-only family.
    val exotic = PowerWindowing(2, 2, 2, 3)
    for (n <- Seq(100L, 1500L, 701L))
      assert(DecayModel.windowStarts(exotic, n).toSeq ==
        simulatedBuffered(exotic, n, 0L), s"power(2,2,2,3) n=$n")
  }

  test("buffered exp-2 at n = 1e10 (2^20 buffer): no length cap, invariants hold") {
    val spec = ExponentialWindowing(2.0)
    val buf = 1L << 20
    val n = 10000000000L
    val t0 = System.nanoTime()
    val starts = DecayModel.windowStarts(spec, n, bufferSize = buf)
    val sec = (System.nanoTime() - t0) / 1e9
    assert(sec < 60.0, s"n=$n buffered took $sec s")
    assert(starts.head == 0L && starts.length < 4096, s"windows=${starts.length}")
    assert(starts.sliding(2).forall(p => p.length < 2 || p(0) < p(1)))
    val sizes = (starts :+ n).sliding(2).map(p => p(1) - p(0)).toSeq
    assert(sizes.sum == n)
    // Amortization: a follow-up query slightly ahead resumes from the
    // snapshot instead of replaying 10^10 elements' worth of events.
    val t1 = System.nanoTime()
    val more = DecayModel.windowStarts(spec, n + (1L << 21), bufferSize = buf)
    val sec2 = (System.nanoTime() - t1) / 1e9
    assert(sec2 < 10.0, s"incremental advance took $sec2 s")
    val sizes2 = (more :+ (n + (1L << 21))).sliding(2).map(p => p(1) - p(0)).toSeq
    assert(sizes2.sum == n + (1L << 21))
  }
}
