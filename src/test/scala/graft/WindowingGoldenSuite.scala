package graft

import graft.windowing._
import org.scalatest.funsuite.AnyFunSuite

/** Golden vectors from the reference test suite (FIXTURES.md §2.1-2.3):
  * `/root/reference/window/generic_windowing_test.go`,
  * `/root/reference/window/power_windowing_test.go`,
  * `/root/reference/window/window_lengths_seq_test.go`,
  * `/root/reference/core/pipeline_test.go:13-71`,
  * `/root/reference/core/db_test.go:200-340`.
  */
class WindowingGoldenSuite extends AnyFunSuite {

  test("exp-2 lengths sequence") {
    val s = ExponentialWindowing(2.0).newSequence()
    assert((1 to 6).map(_ => s.next()) == Seq(1L, 2L, 4L, 8L, 16L, 32L))
  }

  test("power(1,1,10,1) lengths: first 100 are 1 + i/10") {
    val s = PowerWindowing(1, 1, 10, 1).newSequence()
    val got = (0 until 100).map(_ => s.next())
    val want = (0 until 100).map(i => 1L + i / 10)
    assert(got == want)
  }

  test("windowsCoveringUpto goldens") {
    def exp2 = ExponentialWindowing(2.0).newWindowing()
    assert(exp2.windowsCoveringUpto(62) == Seq(1L, 2L, 4L, 8L, 16L))
    assert(exp2.windowsCoveringUpto(63) == Seq(1L, 2L, 4L, 8L, 16L, 32L))
    def pw = PowerWindowing(2, 2, 2, 3).newWindowing()
    assert(pw.windowsCoveringUpto(62) == Seq(3L, 3L, 12L, 12L, 12L, 12L))
    assert(pw.windowsCoveringUpto(100) == Seq(3L, 3L, 12L, 12L, 12L, 12L, 27L))
  }

  test("firstContainingTime goldens: exp-2") {
    val w = ExponentialWindowing(2.0).newWindowing()
    assert(w.firstContainingTime(98, 99, 100).contains(101L))
    assert(w.firstContainingTime(96, 99, 100).contains(103L))
    assert(w.firstContainingTime(92, 99, 100).contains(107L))
    assert(w.firstContainingTime(84, 99, 100).contains(115L))
    assert(w.firstContainingTime(80, 100, 200).contains(200L))
  }

  test("firstContainingTime goldens: closed-form power (power_windowing_test.go)") {
    val w1 = new PowerClosedFormWindowing(1, 1, 10, 1)
    assert(w1.firstContainingTime(119, 123, 130).contains(131L))
    val w2 = new PowerClosedFormWindowing(1, 2, 1, 1)
    assert(w2.firstContainingTime(98, 99, 100).contains(104L))
    assert(w2.firstContainingTime(96, 99, 100).contains(104L))
    assert(w2.firstContainingTime(92, 99, 100).contains(109L))
    assert(w2.firstContainingTime(84, 99, 100).contains(116L))
    assert(w2.firstContainingTime(80, 100, 200).contains(200L))
  }

  test("closed-form power: coveringUpto + first window size goldens") {
    val w = new PowerClosedFormWindowing(2, 2, 2, 3)
    assert(w.windowsCoveringUpto(62) == Seq(3L, 3L, 12L, 12L, 12L, 12L))
    assert(w.windowsCoveringUpto(100) == Seq(3L, 3L, 12L, 12L, 12L, 12L, 27L))
    assert(new PowerClosedFormWindowing(1, 1, 1, 1337).sizeOfFirstWindow == 1337L)
  }

  // Window sizes oldest -> newest after n unbuffered appends.
  private def sizes(spec: WindowingSpec, n: Long, buf: Long = 0): Seq[Long] =
    DecayModel.decompose(spec, n, buf).map { case (s, e) => e - s + 1 }.toSeq

  test("per-append evolution golden: exp-2, 31 steps (pipeline_test.go:13-45)") {
    val golden = Seq(
      Seq(1), Seq(1, 1), Seq(2, 1), Seq(2, 1, 1), Seq(2, 2, 1), Seq(2, 2, 1, 1),
      Seq(4, 2, 1), Seq(4, 2, 1, 1), Seq(4, 2, 2, 1), Seq(4, 2, 2, 1, 1),
      Seq(4, 4, 2, 1), Seq(4, 4, 2, 1, 1), Seq(4, 4, 2, 2, 1), Seq(4, 4, 2, 2, 1, 1),
      Seq(8, 4, 2, 1), Seq(8, 4, 2, 1, 1), Seq(8, 4, 2, 2, 1), Seq(8, 4, 2, 2, 1, 1),
      Seq(8, 4, 4, 2, 1), Seq(8, 4, 4, 2, 1, 1), Seq(8, 4, 4, 2, 2, 1),
      Seq(8, 4, 4, 2, 2, 1, 1), Seq(8, 8, 4, 2, 1), Seq(8, 8, 4, 2, 1, 1),
      Seq(8, 8, 4, 2, 2, 1), Seq(8, 8, 4, 2, 2, 1, 1), Seq(8, 8, 4, 4, 2, 1),
      Seq(8, 8, 4, 4, 2, 1, 1), Seq(8, 8, 4, 4, 2, 2, 1), Seq(8, 8, 4, 4, 2, 2, 1, 1),
      Seq(16, 8, 4, 2, 1),
    ).map(_.map(_.toLong))
    for (n <- 1 to 31)
      assert(sizes(ExponentialWindowing(2.0), n) == golden(n - 1), s"at n=$n")
  }

  test("per-append evolution golden: power(1,1,4,1), 22 steps (pipeline_test.go:46-70)") {
    // Even-R power spec driven through the closed form; the reference's
    // buffered each-step variant flushes after every append, so the
    // same table covers both its modes.
    val golden = Seq(
      Seq(1), Seq(1, 1), Seq(1, 1, 1), Seq(1, 1, 1, 1), Seq(1, 1, 1, 1, 1),
      Seq(2, 1, 1, 1, 1), Seq(2, 1, 1, 1, 1, 1), Seq(2, 2, 1, 1, 1, 1),
      Seq(2, 2, 1, 1, 1, 1, 1), Seq(2, 2, 2, 1, 1, 1, 1), Seq(2, 2, 2, 1, 1, 1, 1, 1),
      Seq(2, 2, 2, 2, 1, 1, 1, 1), Seq(2, 2, 2, 2, 1, 1, 1, 1, 1),
      Seq(2, 2, 2, 2, 2, 1, 1, 1, 1), Seq(2, 2, 2, 2, 2, 1, 1, 1, 1, 1),
      Seq(2, 2, 2, 2, 2, 2, 1, 1, 1, 1), Seq(2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1),
      Seq(2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1), Seq(2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1),
      Seq(2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1), Seq(2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1),
      Seq(2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1),
    ).map(_.map(_.toLong))
    for (n <- 1 to 22)
      assert(sizes(PowerWindowing(1, 1, 4, 1), n) == golden(n - 1), s"at n=$n")
  }

  test("conservation: sum of window counts == N for all N, both policies") {
    for (n <- 1 to 500) {
      assert(sizes(ExponentialWindowing(2.0), n).sum == n, s"exp-2 n=$n")
      assert(sizes(PowerWindowing(1, 1, 4, 1), n).sum == n, s"power n=$n")
    }
  }

  test("windows are contiguous and ordered for sampled N") {
    for (n <- Seq(1L, 7L, 100L, 1234L)) {
      val d = DecayModel.decompose(ExponentialWindowing(2.0), n)
      assert(d.head._1 == 0L && d.last._2 == n - 1)
      d.sliding(2).foreach {
        case Array((_, e1), (s2, _)) => assert(s2 == e1 + 1)
        case _                       =>
      }
    }
  }

  test("final window counts: db_test.go:200-340 goldens (buffered, buf=32)") {
    // testStub: append N (buffered, flush), reopen, append N more (flush);
    // window counts asserted after each phase.
    def phases(spec: WindowingSpec, n: Long): (Int, Int) = {
      val one = DecayModel.decompose(spec, n, 32).length
      val two = DecayModel
        .decomposeEvents(
          spec,
          DecayModel.sessionSizes(spec, n, 32) ++ DecayModel.sessionSizes(spec, n, 32))
        .length
      (one, two)
    }
    assert(phases(ExponentialWindowing(2.0), 5000) == ((16, 18)))
    assert(phases(ExponentialWindowing(2.0), 10000) == ((18, 20)))
    assert(phases(ExponentialWindowing(1.5), 10000) == ((33, 35)))
    assert(phases(PowerWindowing(1, 1, 10, 1), 5000) == ((442, 598)))
    assert(phases(PowerWindowing(1, 1, 10, 1), 10000) == ((598, 910)))
  }

  test("unbuffered end-to-end golden: exp-2 N=100 -> 9 windows (db_test.go:11-59)") {
    assert(sizes(ExponentialWindowing(2.0), 100).size == 9)
  }

  // ------------------------- summarizer buffer-cut goldens
  // `/root/reference/core/summarizer_test.go:106-206` sets window
  // lengths [2,4,6,8] with a capacity-20 buffer; that lengths sequence
  // is exactly PowerWindowing(p=1,q=1,r=1,s=2) (one window of each
  // length 2k). The reference asserts the summarizer's PRE-merge writer
  // output — on our side that surface is `DecayModel.sessionSizes`
  // (flush-time merge-event sizes), which cumulative-sums to the same
  // (cs, ce) spans (ts == element index in the reference fixture).

  private val cutSpec = PowerWindowing(1, 1, 1, 2)

  private def spans(sizes: Seq[Long]): Seq[(Long, Long)] =
    sizes.scanLeft((0L, -1L)) { case ((_, e), len) => (e + 1, e + len) }.tail

  test("summarizer cut golden: one full buffer (summarizer_test.go:106-131)") {
    assert(cutSpec.newWindowing().windowsCoveringUpto(20) == Seq(2L, 4L, 6L, 8L))
    val s = DecayModel.sessionSizes(cutSpec, 20, 20).toSeq
    assert(s == Seq(8L, 6L, 4L, 2L)) // largest-first cut
    assert(spans(s) == Seq((0L, 7L), (8L, 13L), (14L, 17L), (18L, 19L)))
  }

  test("summarizer cut golden: ten full buffers (summarizer_test.go:134-164)") {
    val s = DecayModel.sessionSizes(cutSpec, 200, 20).toSeq
    assert(s == Seq.fill(10)(Seq(8L, 6L, 4L, 2L)).flatten)
    val want = (0 until 10).flatMap { j =>
      Seq((20L * j, 20L * j + 7), (20L * j + 8, 20L * j + 13),
        (20L * j + 14, 20L * j + 17), (20L * j + 18, 20L * j + 19))
    }
    assert(spans(s) == want)
  }

  test("summarizer cut golden: partial tail buffer (summarizer_test.go:166-206)") {
    // 20 full + 10 partial: the partial cuts into the longest descending
    // suffix that fits ([4,2] here -> windows (20,23)(24,25)) and the
    // 4-element leftover stays unbuffered (the reference's partial
    // buffer with timestamps 26..29 -> size-1 events on flush).
    val s = DecayModel.sessionSizes(cutSpec, 30, 20).toSeq
    assert(s == Seq(8L, 6L, 4L, 2L, 4L, 2L, 1L, 1L, 1L, 1L))
    assert(spans(s).take(6) == Seq(
      (0L, 7L), (8L, 13L), (14L, 17L), (18L, 19L), (20L, 23L), (24L, 25L)))
    assert(spans(s).drop(6) == Seq((26L, 26L), (27L, 27L), (28L, 28L), (29L, 29L)))
  }
}
