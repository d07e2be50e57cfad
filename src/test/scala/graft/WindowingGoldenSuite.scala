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
}
