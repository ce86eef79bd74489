package graft.app

import org.apache.spark.sql.SparkSession

/** Throwaway measurement: q94 textrank top-30 stability vs iteration
  * count — how early does the ranked term list (membership AND order)
  * freeze relative to the 8-round reference? Run per SF dir. */
object IterStudy {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val which = if (args.length > 1) args(1) else "q94"
    val spark = graft.core.Sessions.get()
    graft.core.Sessions.sizeShufflePartitionsFor(spark, dir)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def runAt(it: Int): Array[(String, Double)] = (which match {
      case "q90" => graft.llm.DedupOps.pagerank(
        graft.llm.DedupOps.jaccardPairs(docs)
          .filter(org.apache.spark.sql.functions.col("jac") >= 0.8)
          .select("d1", "d2"),
        docs.select("doc_id"), iters = it)
      case _ => graft.llm.TextOps.textrank(docs, iters = it)
    }).collect().map(r => (String.valueOf(r.get(0)), r.getDouble(1)))
    val ref = runAt(8)
    (1 to 6).foreach { it =>
      val got = runAt(it)
      val sameOrder = got.map(_._1).sameElements(ref.map(_._1))
      val sameSet = got.map(_._1).toSet == ref.map(_._1).toSet
      val firstDiff = got.map(_._1).zip(ref.map(_._1))
        .indexWhere(p => p._1 != p._2)
      val refMap = ref.toMap
      val maxD = got.collect { case (t, s) if refMap.contains(t) =>
        math.abs(s - refMap(t)) }.maxOption.getOrElse(-1.0)
      println(f"ITERSTUDY iters=$it sameOrder=$sameOrder sameSet=$sameSet" +
        f" firstOrderDiffAt=$firstDiff n=${got.length} maxAbsScoreDelta=$maxD%.6f")
    }
    spark.stop()
  }
}
