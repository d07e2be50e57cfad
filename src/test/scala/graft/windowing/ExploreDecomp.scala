package graft.windowing

/** Scratch exploration harness (not a test): dumps simulator
  * decompositions for spec families that lack closed forms, to find the
  * pattern. Run: sbt "Test/runMain graft.windowing.ExploreDecomp".
  */
object ExploreDecomp {
  private def sizes(spec: WindowingSpec, n: Long, buf: Long = 0L): Seq[Long] =
    DecayModel
      .decomposeEvents(spec, DecayModel.sessionSizes(spec, n, buf))
      .map { case (s, e) => e - s + 1 }.toSeq

  def main(args: Array[String]): Unit = {
    // Per-class counts (class j = windows of size 2^j) vs consecutive n,
    // for odd R. Columns: n, binary(n), counts oldest-class-first.
    for (r <- Seq(3L, 9L)) {
      println(s"=== power p=1 q=1 s=1 R=$r: class counts per n ===")
      val pw = PowerWindowing(1, 1, r, 1)
      for (n <- 1L to 120L) {
        val ss = sizes(pw, n)
        val byClass = ss.groupBy(identity).toSeq.sortBy(-_._1)
          .map { case (sz, xs) => s"$sz:${xs.size}" }.mkString(" ")
        println(f"n=$n%4d ${n.toBinaryString}%10s  $byClass")
      }
    }
  }
}
