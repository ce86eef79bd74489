package graft.app

/** Driver-side BPE-training cost probe at REALISTIC merge counts (the
  * r16 verdict item: the vocabulary-collapse argument makes train cost
  * corpus-free, but the greedy loop itself is O(merges × vocab) if
  * naively recounted — this measures the incremental-update trainer at
  * production-shaped vocabularies, since the synthetic corpus's own
  * vocabulary is 31 words). Words are seeded-pseudorandom so runs are
  * comparable. Usage: runMain graft.app.BpeScale [vocab,merges;...]
  */
object BpeScale {
  def main(args: Array[String]): Unit = {
    val points = args.headOption
      .map(_.split(";").toSeq.map { p =>
        val Array(v, m) = p.split(","); (v.trim.toInt, m.trim.toInt)
      })
      .getOrElse(Seq((100000, 1024), (100000, 4096), (500000, 1024)))
    points.foreach { case (nw, nm) =>
      val rnd = new scala.util.Random(31)
      val alpha = "abcdefghijklmnopqrstuvwxyz"
      val wf = (1 to nw).map { i =>
        val w = (1 to (4 + rnd.nextInt(12)))
          .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
        (w + "x" + i.toString) -> (1L + rnd.nextInt(999))
      }.toMap.toArray.sortBy(_._1)
      val t0 = System.nanoTime()
      val (m, _) = graft.llm.TextOps.trainBpeFromWordFreq(wf, nm)
      println(f"[bpe-scale] vocab=${wf.length} merges=$nm " +
        f"learned=${m.length} wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
  }
}
