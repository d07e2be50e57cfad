package graft.windowing

import scala.collection.mutable

/** Materializes a [[LengthsSequence]] into window start markers on the
  * age axis and answers the three windowing questions the engine needs.
  *
  * Age axis: the k-th decay window covers ages
  * `[marker(k), marker(k+1) - 1]` where `marker(0) = 0` and markers are
  * cumulative sums of the lengths. Behavioral contract matches the
  * reference's `GenericWindowing`
  * (`/root/reference/window/generic_windowing.go:20-175`), including its
  * inclusive-right-marker containment test in the "past the first
  * marker" branch.
  *
  * Instances are stateful (markers grow on demand) and synchronized;
  * they are cheap, so prefer one instance per use-site over sharing.
  */
final class GenericWindowing(seq: LengthsSequence) {
  // Window start markers, ascending. markers(i) = start age of window i.
  private val markers = mutable.ArrayBuffer.empty[Long]
  // length -> start marker of the first window having that length.
  private val firstOfLength = mutable.TreeMap.empty[Long, Long]
  private var lastWindowStart = 0L
  private var lastWindowLength = 0L
  private val firstWindowLength: Long = seq.next()
  addWindow(firstWindowLength)

  def spec: WindowingSpec = seq.spec

  private def addWindow(length: Long): Unit = {
    lastWindowStart += lastWindowLength
    if (length > lastWindowLength) firstOfLength.update(length, lastWindowStart)
    markers += lastWindowStart
    lastWindowLength = length
  }

  private def addWindowsUntilLength(target: Long): Boolean =
    if (target > seq.maxWindowSize) false
    else {
      while (lastWindowLength < target) addWindow(seq.next())
      true
    }

  private def addWindowsPastMarker(target: Long): Unit =
    while (lastWindowStart <= target) addWindow(seq.next())

  /** Index of the largest marker <= x (markers(0) == 0 <= x required). */
  private def floorIdx(x: Long): Int = {
    var lo = 0
    var hi = markers.length - 1
    while (lo < hi) {
      val mid = (lo + hi + 1) >>> 1
      if (markers(mid) <= x) lo = mid else hi = mid - 1
    }
    lo
  }

  /** First T' >= t such that at T', the count interval [tl, tr] (0-based
    * element indices) lies within a single decay window; None if the
    * interval is longer than any achievable window.
    */
  def firstContainingTime(tl: Long, tr: Long, t: Long): Option[Long] = synchronized {
    val l = t - 1 - tr
    val length = tr - tl + 1
    if (!addWindowsUntilLength(length)) return None

    val firstMarker = firstOfLength.iteratorFrom(length).nextOption() match {
      case Some((_, marker)) => marker
      case None              => return None
    }
    if (firstMarker >= l) return Some(firstMarker + tr + 1)

    // Already past the first window of sufficient length: either [l, r]
    // sits in the current window, or wait for it to enter the next one.
    addWindowsPastMarker(l)
    val li = floorIdx(l)
    val currWindowL = markers(li)
    val currWindowR = markers(li + 1) // exists: lastWindowStart > l
    val r = t - 1 - tl
    if (r <= currWindowR) Some(t)
    else if (currWindowR - currWindowL + 1 < length) None
    else Some(currWindowR + tr + 2)
  }

  def sizeOfFirstWindow: Long = firstWindowLength

  /** Lengths of the first K windows such that they cover <= n elements
    * and K+1 would cover more. `windowsCoveringUpto(62)` for exp-2 is
    * `[1,2,4,8,16]` (`/root/reference/window/generic_windowing_test.go:65-70`).
    */
  def windowsCoveringUpto(n: Long): Seq[Long] = synchronized {
    if (n <= 0) return Seq.empty
    addWindowsPastMarker(n)
    val out = Seq.newBuilder[Long]
    var prev = 0L
    val it = markers.iterator
    var done = false
    while (it.hasNext && !done) {
      val m = it.next()
      if (m <= n) {
        if (m != 0) { out += (m - prev); prev = m }
      } else done = true
    }
    out.result()
  }
}
