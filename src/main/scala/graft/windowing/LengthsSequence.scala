package graft.windowing

/** Infinite, non-decreasing sequence of decay-window lengths.
  *
  * Semantics match the reference's `window.LengthsSequence`
  * (`/root/reference/window/window_lengths_seq.go:24-30`): each call
  * returns the length of the next (older) decay window, measured in
  * element counts (ages).
  */
trait LengthsSequence {
  /** Length of the next decay window; stateful iterator. */
  def next(): Long

  /** Largest representable window; requests beyond this are unsatisfiable. */
  def maxWindowSize: Long

  /** Identity of the policy, used as a cache key for decompositions. */
  def spec: WindowingSpec

  /** A fresh iterator of the same policy (instances are stateful). */
  def fresh(): LengthsSequence
}

/** Which windowing policy a stream uses; serializable catalog form.
  * Mirrors the reference's capnp stream window union
  * (`/root/reference/protos/summarydb.capnp:47-54`).
  */
sealed trait WindowingSpec extends Serializable {
  def newSequence(): LengthsSequence
  def newWindowing(): GenericWindowing = new GenericWindowing(newSequence())
}

/** Lengths 1, b, b^2, ... (each `ceil`ed), reference
  * `window/window_lengths_seq.go:49-98`. N raw elements collapse into
  * O(log N) windows.
  */
final case class ExponentialWindowing(base: Double) extends WindowingSpec {
  def newSequence(): LengthsSequence = new ExponentialLengthsSequence(base, this)
}

/** R*k^(p-1) windows of length S*k^q for k = 1, 2, ...; decay
  * O(n^(-q/(p+q))). Reference `window/window_lengths_seq.go:100-168`.
  */
final case class PowerWindowing(p: Long, q: Long, r: Long, s: Long) extends WindowingSpec {
  def newSequence(): LengthsSequence = new PowerLengthsSequence(p, q, r, s, this)
}

final class ExponentialLengthsSequence(base: Double, val spec: WindowingSpec)
    extends LengthsSequence {
  private[this] var nxt: Double = 1.0
  def next(): Long = {
    val prev = nxt
    nxt *= base
    math.ceil(prev).toLong
  }
  // math.MaxUint32, as in the reference.
  def maxWindowSize: Long = 0xFFFFFFFFL
  def fresh(): LengthsSequence = new ExponentialLengthsSequence(base, spec)
}

final class PowerLengthsSequence(p: Long, q: Long, r: Long, s: Long, val spec: WindowingSpec)
    extends LengthsSequence {
  private[this] var k: Long = 1L
  private[this] var curr: Long = 0L

  private def pow(base: Long, exp: Long): Long = {
    var result = 1L
    var b = base
    var e = exp
    while (e > 0) {
      if ((e & 1L) == 1L) result *= b
      b *= b
      e >>= 1
    }
    result
  }

  def next(): Long = {
    val count = r * pow(k, p - 1)
    if (count <= curr) { k += 1; curr = 0 }
    curr += 1
    s * pow(k, q)
  }
  def maxWindowSize: Long = 0xFFFFFFFFL
  def fresh(): LengthsSequence = new PowerLengthsSequence(p, q, r, s, spec)
}
