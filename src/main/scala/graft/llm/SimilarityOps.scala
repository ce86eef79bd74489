package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.functions.GraftFunctions

/** Approximate-nearest-neighbor search over the `embeddings` table —
  * SURVEY.md §2b Q24.
  *
  * Baseline: brute-force cosine top-k — the query side is tiny (fixed ids)
  * and broadcast, so the scan side streams once with no shuffle until the
  * per-query top-k (window over qid). At 100 TB this is the standard
  * "broadcast the queries, mapPartitions the corpus" shape.
  *
  * Scale path: random-hyperplane LSH (sign bits of seeded projections) —
  * corpus is bucketed once (a cheap narrow map), queries probe their own
  * bucket plus all hamming-1 neighbors, and only candidates are scored.
  * Approximate ⇒ no SQL oracle (rows-only check); SimilaritySpec asserts
  * recall ≥ 0.8 against the brute-force baseline.
  */
object SimilarityOps {
  type QFn = (SparkSession, String) => DataFrame

  val QueryIds: Seq[Long] = Seq(0L, 100L, 250L)
  private val TopK = 5
  private val Dim = 64
  // 6 planes → 64 buckets: sized so the small test corpora keep ~8+
  // vectors per bucket; at larger corpus sizes raise toward log2(n/target).
  private val NumPlanes = 6

  /** Deterministic random hyperplanes (java.util.Random LCG is spec-fixed). */
  lazy val planes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(1234)
    Array.fill(NumPlanes, Dim)(rnd.nextGaussian())
  }

  /** q24a — brute-force cosine top-k for fixed query vectors. */
  def knnBrute(s: SparkSession, d: String): DataFrame = {
    GraftFunctions.register(s)
    val em = Tables.embeddings(s, d)
    val q = em.filter(col("vec_id").isin(QueryIds: _*))
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val scored = em.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", expr("cosine_sim(qe, embedding)"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= TopK)
      .select(col("qid"), col("rnk"), col("vec_id").as("neighbor"),
        round(col("cos"), 4).as("cos"))
      .orderBy("qid", "rnk")
  }
  val knnBruteSql: String =
    s"""WITH n AS (SELECT vec_id, embedding,
       |  sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |    list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
       |    (acc, v) -> acc + v)) AS nrm
       |  FROM embeddings),
       |q AS (SELECT vec_id AS qid, embedding AS qe, nrm AS qnrm FROM n
       |  WHERE vec_id IN (${QueryIds.mkString(", ")})),
       |scored AS (
       |  SELECT q.qid, n.vec_id,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list_transform(generate_series(1, len(q.qe)),
       |        i -> CAST(q.qe[i] AS DOUBLE) * CAST(n.embedding[i] AS DOUBLE))),
       |      (acc, v) -> acc + v) / (q.qnrm * n.nrm) AS cos
       |  FROM q, n WHERE n.vec_id <> q.qid),
       |r AS (SELECT qid, vec_id, cos,
       |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rnk
       |  FROM scored)
       |SELECT qid, rnk, vec_id AS neighbor, round(cos, 4) AS cos
       |FROM r WHERE rnk <= $TopK ORDER BY qid, rnk""".stripMargin

  /** LSH bucket id = sign bits of the vector against the seeded planes. */
  private def bucketExpr(e: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val bits = planes.zipWithIndex.map { case (p, j) =>
      val dot = aggregate(
        zip_with(e, typedlit(p.toSeq), (x, y) => x.cast("double") * y),
        lit(0.0), (acc, v) => acc + v)
      when(dot >= 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** q24b — LSH-bucketed ANN with multi-probe (hamming ≤ 2 of the query's
    * bucket: 22 of 64 buckets ≈ ⅓ of the corpus scanned — this corpus is
    * near-isotropic, so deeper probing is what buys recall; on clustered
    * real-world embeddings fewer probes suffice). */
  def knnLsh(s: SparkSession, d: String): DataFrame = {
    GraftFunctions.register(s)
    val em = Tables.embeddings(s, d).withColumn("bucket", bucketExpr(col("embedding")))
    val masks = (0 until NumPlanes).map(1L << _)
    val probeMasks = masks ++
      (for { i <- 0 until NumPlanes; j <- (i + 1) until NumPlanes }
        yield (1L << i) | (1L << j))
    val probes = probeMasks.map(m => col("bucket").bitwiseXOR(lit(m)))
    val q = em.filter(col("vec_id").isin(QueryIds: _*))
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        explode(array(col("bucket") +: probes: _*)).as("probe"))
    val scored = em.join(broadcast(q), col("bucket") === col("probe"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", expr("cosine_sim(qe, embedding)"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= TopK)
      .select(col("qid"), col("rnk"), col("vec_id").as("neighbor"),
        round(col("cos"), 4).as("cos"))
      .orderBy("qid", "rnk")
  }

  val all: Seq[(String, QFn, Option[String])] = Seq(
    ("q24_knn_brute", knnBrute _, Some(knnBruteSql)),
    ("q24_knn_lsh", knnLsh _, None))
}
