package graft.windowing

import java.util.concurrent.ConcurrentHashMap
import scala.collection.mutable

/** Computes the decayed-window decomposition of a stream of N elements.
  *
  * The reference maintains this incrementally with a merge heap + RB-tree
  * index (`/root/reference/core/merger.go:241-260`,
  * `/root/reference/core/merger_index.go`). The key observation (SURVEY
  * §7.0) is that the resulting partition of [0, N) into count ranges is a
  * deterministic function of (windowing policy, sequence of merge-event
  * sizes) — independent of values, timestamps, and `windowsPerBatch`
  * (which only batches persistence, not index state). So on Spark we
  * compute the partition once per distinct N on the driver, broadcast the
  * O(#windows) boundary array, and assign elements to windows by rank —
  * no distributed mutable state at all.
  *
  * Event-size sequences:
  *  - unbuffered mode: N events of size 1
  *    (`/root/reference/core/pipeline.go:109-117`);
  *  - buffered mode with buffer capacity B = sum(windowsCoveringUpto(b)):
  *    each full buffer is cut into those lengths largest-first
  *    (`/root/reference/core/summarizer.go:83-107`), and the tail
  *    (flush) is appended as size-1 events
  *    (`/root/reference/core/pipeline.go:119-140`).
  *
  * Scale note: the simulation is O(N log W) per *distinct* N and is
  * memoized, but two closed forms replace it entirely on the hot specs:
  * integral-base exponential windowing (self-similar recurrence,
  * O(log N)) and q=1/s=1/even-R power windowing (banded binary-digit
  * form, O(#windows) = O(N^(1/(p+1))) — see [[powerSizesClosedForm]]).
  * Only non-integral exponential bases, exotic power specs, and
  * buffered-ingest decompositions still simulate, capped at
  * Int.MaxValue elements.
  */
object DecayModel {

  /** One merge event: a freshly summarized window of `size` elements. */
  private final class Simulator(windowing: GenericWindowing) {
    // Window id -> count end (inclusive). Ids are creation-order indices;
    // iteration order == stream order (old -> new).
    private val index = new java.util.TreeMap[java.lang.Long, Long]()
    // Scheduled merge times: (time, id, gen). An entry is live iff its gen
    // equals the window's current gen; rescheduling/unscheduling bumps gen
    // (lazy deletion — mirrors the reference's explicit heap removal).
    private val heap = mutable.PriorityQueue.empty[(Long, Long, Long)](
      Ordering.by[(Long, Long, Long), (Long, Long)](e => (e._1, e._2)).reverse)
    private val gen = new java.util.HashMap[java.lang.Long, Long]()
    private var numElements = 0L
    private var nextId = 0L

    private def cStart(id: java.lang.Long): Long = {
      val lower = index.lowerEntry(id)
      if (lower == null) 0L else lower.getValue + 1L
    }

    private def bumpGen(id: java.lang.Long): Long =
      gen.merge(id, 1L, (a, b) => a + b)

    /** (Re)schedule the merge of `id` with its successor over the combined
      * count span [c0, c1]; mirrors `updateMergeCountFor`
      * (`/root/reference/core/merger.go:116-138`).
      */
    private def updateMergeCount(id: java.lang.Long, c0: Long, c1: Long): Unit = {
      val g = bumpGen(id) // invalidates any previous entry
      windowing.firstContainingTime(c0, c1, numElements) match {
        case Some(t) => heap.enqueue((t, id, g))
        case None    => ()
      }
    }

    def process(size: Long): Unit = {
      numElements += size
      if (!index.isEmpty) {
        val last = index.lastKey()
        updateMergeCount(last, cStart(last), numElements - 1)
      }
      val id = nextId
      nextId += 1
      index.put(id, numElements - 1)

      // Pop due merges; mirrors `updatePendingMerges`
      // (/root/reference/core/merger.go:209-239).
      var continue = true
      while (continue && heap.nonEmpty) {
        val (t, _, _) = heap.head
        if (t > numElements) continue = false
        else {
          val (_, w1raw, g) = heap.dequeue()
          val w1: java.lang.Long = w1raw
          if (gen.get(w1) == g && index.containsKey(w1)) {
            bumpGen(w1) // popped == unscheduled
            val w2 = index.higherKey(w1)
            if (w2 != null) {
              val w0 = index.lowerKey(w1)
              val w3 = index.higherKey(w2)
              val w1NewStart = cStart(w1)
              val w1NewEnd = index.get(w2)
              bumpGen(w2) // drop w2's scheduled entry with it
              index.remove(w2)
              index.put(w1, w1NewEnd)
              if (w0 != null) updateMergeCount(w0, cStart(w0), w1NewEnd)
              if (w3 != null) updateMergeCount(w1, w1NewStart, index.get(w3))
            }
          }
        }
      }
    }

    /** Count spans oldest -> newest as (cStart, cEnd) inclusive. */
    def result(): Array[(Long, Long)] = {
      val out = Array.newBuilder[(Long, Long)]
      var prevEnd = -1L
      val it = index.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        out += ((prevEnd + 1, e.getValue))
        prevEnd = e.getValue
      }
      out.result()
    }
  }

  /** Decomposition after an explicit merge-event size sequence (e.g. to
    * model multiple ingest sessions separated by flushes).
    */
  def decomposeEvents(spec: WindowingSpec, sizes: Iterator[Long]): Array[(Long, Long)] =
    simulate(spec, sizes)

  /** The flush-time merge-event sizes for one ingest session of n
    * elements through a buffer (0 = unbuffered).
    */
  def sessionSizes(spec: WindowingSpec, n: Long, bufferSize: Long = 0L): Iterator[Long] = {
    require(n <= Int.MaxValue.toLong, s"session of n=$n elements: simulate path is capped at Int.MaxValue")
    if (bufferSize <= 0) unbufferedSizes(n) else bufferedSizes(spec, bufferSize, n)
  }

  private def simulate(spec: WindowingSpec, sizes: Iterator[Long]): Array[(Long, Long)] = {
    val sim = new Simulator(spec.newWindowing())
    sizes.foreach(sim.process)
    sim.result()
  }

  /** Merge-event sizes for N appends in unbuffered mode. Long-counted:
    * Iterator.fill(n.toInt) would silently truncate for n > Int.MaxValue.
    */
  private def unbufferedSizes(n: Long): Iterator[Long] =
    Iterator.range(0L, n).map(_ => 1L)

  /** Merge-event sizes for N appends through a buffer of nominal size
    * `bufferSize`, then a flush. Full buffers are cut largest-first into
    * `windowsCoveringUpto(bufferSize)`. At flush, the partial active
    * buffer also goes through the summarizer — cut into the longest
    * descending suffix of the lengths that fits
    * (`/root/reference/core/summarizer.go:37-52,83-107`) — and only the
    * leftover is appended unbuffered as size-1 events
    * (`/root/reference/core/pipeline.go:119-140,185-196`).
    */
  private def bufferedSizes(spec: WindowingSpec, bufferSize: Long, n: Long): Iterator[Long] = {
    val lengths = spec.newWindowing().windowsCoveringUpto(bufferSize)
    val capacity = lengths.sum
    if (capacity <= 0) unbufferedSizes(n)
    else {
      val cut = lengths.reverse // largest first
      val fullBuffers = n / capacity
      val tail = n - fullBuffers * capacity
      // getNumWindowsCovering: #prefix lengths with cumulative sum <= tail.
      var acc = 0L
      val prefix = lengths.takeWhile { len => acc += len; acc <= tail }
      val tailCut = prefix.reverse
      val leftover = tail - prefix.sum
      Iterator.range(0L, fullBuffers).flatMap(_ => cut.iterator) ++
        tailCut.iterator ++ Iterator.range(0L, leftover).map(_ => 1L)
    }
  }

  /** Closed-form decomposition for exponential windowing with an
    * integral base b and unbuffered ingest, via the self-similarity
    *
    *   D(b*m + s) = b * D(m) ++ D(s)   for 1 <= s <= b, m >= 1,
    *
    * (sizes oldest -> newest; b*D scales every window size). The state
    * after n appends is a scaled copy of the state after floor((n-s)/b)
    * appends plus a fresh tail — O(log_b n) recursion instead of the
    * O(n) heap simulation. Verified against the simulator for all
    * n <= 4096 and sampled n <= 10^5 (DecayModelScaleSuite); the base
    * cases n <= b^2 come from the simulator itself.
    */
  private def sizesClosedForm(base: Long, n: Long): Array[Long] = {
    require(n >= 1)
    if (n <= base * base)
      simulate(ExponentialWindowing(base.toDouble), unbufferedSizes(n))
        .map { case (s, e) => e - s + 1 }
    else {
      val s = (n - 1) % base + 1
      val m = (n - s) / base
      val head = sizesClosedForm(base, m)
      val tail = sizesClosedForm(base, s)
      val out = new Array[Long](head.length + tail.length)
      var i = 0
      while (i < head.length) { out(i) = head(i) * base; i += 1 }
      System.arraycopy(tail, 0, out, head.length, tail.length)
      out
    }
  }

  private def integralBase(spec: WindowingSpec): Option[Long] = spec match {
    case ExponentialWindowing(b) if b >= 2.0 && b == math.rint(b) && b <= 1e6 =>
      Some(b.toLong)
    case _ => None
  }

  // ------------------------------------------- power closed form

  /** Exact Sum_{k=1}^K k^p via the binomial recursion
    * (p+1)·S_p = (K+1)^(p+1) - 1 - Sum_{i<p} C(p+1,i)·S_i, in BigInt so
    * band boundaries near 2^63 stay exact.
    */
  private def sumPow(k: Long, p: Long): BigInt = {
    if (k <= 0) return BigInt(0)
    if (p == 0) BigInt(k)
    else {
      var acc = (BigInt(k) + 1).pow(p.toInt + 1) - 1
      var i = 0L
      while (i < p) { acc -= binom(p + 1, i) * sumPow(k, i); i += 1 }
      acc / (p + 1)
    }
  }

  private def binom(n: Long, r: Long): BigInt = {
    var b = BigInt(1)
    var i = 0L
    while (i < r) { b = b * (n - i) / (i + 1); i += 1 }
    b
  }

  /** Closed-form decomposition for power windowing with q == 1, s == 1
    * (decay lengths 1,2,3,... with R·k^(p-1) windows of length k) and R
    * even. Derived from the simulator's steady state and verified
    * exhaustively against it (DecayModelScaleSuite):
    *
    * Summary windows only ever pair-merge, so their sizes are powers of
    * two; size-2^j windows tile exactly the age band [B_j, B_(j+1))
    * where B_j = R·Sum_(k<2^j) k^p is the marker at which decay length
    * reaches 2^j. At stream length n the exact per-class counts are
    *
    *   J     = max { j : B_j + 2^j <= n }    (largest class present)
    *   c_J   = floor((n - B_J) / 2^J)        (head class, still filling)
    *   c_j   = (B_(j+1) - B_j)/2^j + bit_j(n)  for j < J
    *
    * where bit_j(n) is the j-th binary digit of n — the +-1 "phase
    * wobble" of each saturated class is literally the binary expansion
    * of n. Total telescopes to B_J + (n mod 2^J) + 2^J·c_J = n exactly
    * when every B_j = 0 (mod 2^j), which holds for even R (checked at
    * runtime; any failure falls back to the simulator). Sizes are
    * emitted largest (oldest) first, matching the simulator's order.
    *
    * O(#windows) time and space — #windows is Theta(n^(1/(p+1)))
    * (the whole point of power decay: polynomially many windows), so a
    * 10^10-element stream decomposes in ~10^5 array slots instead of an
    * impossible 10^10-step heap simulation.
    */
  private def powerSizesClosedForm(pw: PowerWindowing, n: Long): Option[Array[Long]] = {
    if (pw.q != 1L || pw.s != 1L || pw.r % 2 != 0 || pw.p < 1 || n < 1) return None
    def band(j: Int): BigInt = BigInt(pw.r) * sumPow((1L << j) - 1, pw.p)
    var jMax = 0
    while (band(jMax + 1) + (BigInt(1) << (jMax + 1)) <= n) jMax += 1
    var j = 1
    while (j <= jMax) {
      if (band(j) % (BigInt(1) << j) != 0) return None
      j += 1
    }
    val bJ = band(jMax).toLong
    val cJ = (n - bJ) >> jMax
    var total = cJ
    var jj = jMax - 1
    val counts = new Array[Long](jMax)
    while (jj >= 0) {
      counts(jj) = ((band(jj + 1) - band(jj)).toLong >> jj) +
        (if ((n & (1L << jj)) != 0) 1L else 0L)
      total += counts(jj)
      jj -= 1
    }
    require(total <= Int.MaxValue.toLong, s"power decomposition of n=$n has $total windows")
    val out = new Array[Long](total.toInt)
    var idx = 0
    var c = cJ
    while (c > 0) { out(idx) = 1L << jMax; idx += 1; c -= 1 }
    jj = jMax - 1
    while (jj >= 0) {
      c = counts(jj)
      while (c > 0) { out(idx) = 1L << jj; idx += 1; c -= 1 }
      jj -= 1
    }
    if (out.sum == n) Some(out) else None // defensive: never emit a bad partition
  }

  // Memo for windowStarts. Evaluated PER ROW inside executor UDFs
  // (Summarizer/Compactor), so it must be bounded by memory, not entry
  // count: a power decomposition at n=10^10 is ~450k longs, while an
  // exp-2 one is ~34 — bounding entries alone either thrashes small
  // arrays or OOMs on big ones. Budget ~16M longs (~128 MB); coarse
  // clear-all on overflow, after which hot keys repopulate.
  private val cache = new ConcurrentHashMap[(WindowingSpec, Long, Long), Array[Long]]()
  private val cachedSlots = new java.util.concurrent.atomic.AtomicLong(0L)
  private val MaxCachedSlots = 16L * 1024 * 1024

  /** Window start ranks (cStart of each window, ascending; first is 0)
    * for a stream of `n` elements. `bufferSize <= 0` = unbuffered.
    * Element with 0-based rank `s` belongs to the window
    * `upperBound(starts, s) - 1`. Memoized per (spec, bufferSize, n).
    */
  private def toStarts(sizes: Array[Long]): Array[Long] = {
    val starts = new Array[Long](sizes.length)
    var acc = 0L
    var i = 0
    while (i < sizes.length) { starts(i) = acc; acc += sizes(i); i += 1 }
    starts
  }

  def windowStarts(spec: WindowingSpec, n: Long, bufferSize: Long = 0L): Array[Long] = {
    if (cachedSlots.get() > MaxCachedSlots) {
      cache.clear()
      cachedSlots.set(0L)
    }
    cache.computeIfAbsent((spec, bufferSize, n), { _ =>
      // (insertion races may overshoot the budget slightly; the next
      // call's clear-all corrects it — bound, not invariant)
      val fastExp = integralBase(spec).filter(_ => bufferSize <= 0)
      val fastPower = spec match {
        case pw: PowerWindowing if bufferSize <= 0 => powerSizesClosedForm(pw, n)
        case _                                     => None
      }
      val starts = (fastExp, fastPower) match {
        case (Some(b), _) => toStarts(sizesClosedForm(b, n))
        case (_, Some(sizes)) => toStarts(sizes)
        case _ =>
          // The O(n) simulation path is driver-side; cap it rather than wrap.
          require(n <= Int.MaxValue.toLong,
            s"simulated decomposition for n=$n not supported (integral exponential bases and even-R/q=1/s=1 power specs have O(#windows) closed forms)")
          val sizes =
            if (bufferSize <= 0) unbufferedSizes(n) else bufferedSizes(spec, bufferSize, n)
          simulate(spec, sizes).map(_._1)
      }
      cachedSlots.addAndGet(starts.length.toLong)
      starts
    })
  }

  /** Full (cStart, cEnd) spans, for tests and compaction planning. */
  def decompose(spec: WindowingSpec, n: Long, bufferSize: Long = 0L): Array[(Long, Long)] = {
    val starts = windowStarts(spec, n, bufferSize)
    starts.zipWithIndex.map { case (s, i) =>
      val end = if (i == starts.length - 1) n - 1 else starts(i + 1) - 1
      (s, end)
    }
  }

  /** Window index (0-based, oldest window = 0) of element rank `s`. */
  def windowIdOf(starts: Array[Long], s: Long): Int = {
    var lo = 0
    var hi = starts.length - 1
    while (lo < hi) {
      val mid = (lo + hi + 1) >>> 1
      if (starts(mid) <= s) lo = mid else hi = mid - 1
    }
    lo
  }
}
