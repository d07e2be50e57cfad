package graft.windowing

import scala.collection.mutable

/** Closed-form power windowing, mirroring the reference's
  * `PowerWindowing` (`/root/reference/window/power_windowing.go`).
  *
  * The reference marks this class "broken. Fix it"
  * (`power_windowing.go:23`) and never uses it from the DB path
  * (`core/db.go:66` always wraps the lengths sequence in
  * `GenericWindowing`). We reproduce its *observable* behavior — its own
  * unit goldens (`power_windowing_test.go:8-51`) — for surface
  * completeness, including the two swapped tuple lookups in
  * `GetFirstContainingTime` (`power_windowing.go:120,128`: the length
  * Ceiling uses the tree key rather than the marker value, and the
  * marker Floor assigns key/value crosswise). Do not use for new
  * streams; prefer `GenericWindowing(PowerLengthsSequence)`.
  */
final class PowerClosedFormWindowing(p: Long, q: Long, r: Long, s: Long) {
  private var k = 0L
  private var lastLength = 0L
  private var lastMarker = 0L
  // distinct length l = S*(k+1)^q -> first marker, and inverse
  private val lengthToFirstMarker = mutable.TreeMap.empty[Long, Long]
  private val firstMarkerToLength = mutable.TreeMap.empty[Long, Long]

  private def int64Pow(a: Long, b: Long): Long = math.pow(a.toDouble, b.toDouble).toLong

  private def addOne(): Unit = {
    lastLength = s * int64Pow(k + 1, q)
    lastMarker += r * int64Pow(k, p + q - 1)
    k += 1
    lengthToFirstMarker.update(lastLength, lastMarker)
    firstMarkerToLength.update(lastMarker, lastLength)
  }
  addOne()

  private def addUntilLength(target: Long): Unit =
    if (q != 0) while (lastLength < target) addOne()

  private def addPastMarker(target: Long): Unit =
    if (q != 0) while (lastMarker <= target) addOne()

  def firstContainingTime(tl: Long, tr: Long, t: Long): Option[Long] = synchronized {
    val l = t - 1 - tr
    val rr = t - 1 - tl
    val length = tr - tl + 1
    if (q == 0 && length > s) return None

    addUntilLength(length)
    // Reference uses the Ceiling *key* (a length) where a marker was
    // intended; mirrored as-is.
    val ceilKey = lengthToFirstMarker.iteratorFrom(length).nextOption().map(_._1).getOrElse(0L)
    if (ceilKey >= l) return Some(t + ceilKey - l)

    addPastMarker(l)
    // Reference swaps key/value here: targetLength := floor *marker*,
    // lengthMarker := mapped *length*; mirrored as-is.
    val (floorMarker, floorLength) = firstMarkerToLength.rangeTo(l).last
    var targetLength = floorMarker
    val lengthMarker = floorLength
    if (targetLength == 0) targetLength = 1
    val wl = lengthMarker + (l - lengthMarker) / targetLength
    val wr = wl + targetLength - 1
    if (rr <= wr) Some(t) else Some(t + wr + 1 - l)
  }

  def sizeOfFirstWindow: Long = s

  def windowsCoveringUpto(n: Long): Seq[Long] = {
    if (n <= 0) return Seq.empty
    val out = Seq.newBuilder[Long]
    var soFar = 0L
    var kk = 1L
    while (true) {
      val count = r * int64Pow(kk, p - 1)
      val size = s * int64Pow(kk, q)
      var i = 0L
      while (i < count) {
        if (soFar + size > n) return out.result()
        out += size
        soFar += size
        i += 1
      }
      kk += 1
    }
    out.result() // unreachable
  }
}
