package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic embedding fixtures for the ANN audit family
  * (q139/q159/q171/q172/q173).
  *
  * The driver testdata's `embeddings` table is near-ISOTROPIC — the
  * hardest regime for every cell-probe index, and the measured recall
  * cliffs in BASELINE §x (IVF 0.67 @ 62% corpus scanned, PQ 0.19) are
  * properties of that geometry, not of the implementations. Real
  * embedding stores are CLUSTERED (that is why IVF/PQ are the deployed
  * defaults); this generator produces both regimes at any scale so the
  * audits can show each tier in the regime it is deployed for — the
  * isotropic cliff AND the clustered win, side by side
  * (Round19OpsSpec pins both; BASELINE §y carries the measured table).
  *
  * Everything is a pure projection over `spark.range(n)` — no rand()
  * (replay/resume-stable by construction, the kmeansCentroidsSampled
  * discipline), no driver-side data: cluster centers are a
  * `nClusters × dim` literal from a splitmix64 mix of the seed
  * (model-scale), per-vector jitter is in-plan xxhash64. Schema matches
  * the testdata table: (vec_id LONG, embedding ARRAY<FLOAT>, label INT)
  * with label = the generating cluster, so label-relevance audits
  * (q174) work unchanged — on the clustered fixture nearest neighbors
  * really DO share the label, the regime where P@k is meaningful. */
object EmbeddingFixtures {

  /** splitmix64 (Steele et al. '14) — the standard stateless mixer. */
  private def mix(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Driver-side uniform in [-1, 1) from a mixed long. */
  private def unitOf(h: Long): Double =
    (Math.floorMod(h, 2000000L) / 1000000.0) - 1.0

  /** In-plan uniform in [-1, 1) from a hash column. */
  private def unitCol(h: Column): Column =
    pmod(h, lit(2000000L)).cast("double") / lit(1000000.0) - lit(1.0)

  /** Near-isotropic embeddings: every component an independent
    * hash-uniform — neighbors barely correlate in any projection, the
    * documented worst case for cell-probe and sign-pattern indexes. */
  def isotropic(spark: SparkSession, n: Long, dim: Int = 64,
      seed: Long = 42L): DataFrame =
    spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)),
        d => unitCol(xxhash64(lit(seed), col("id"), d)).cast("float"))
        .as("embedding"),
      pmod(col("id"), lit(8)).cast("int").as("label"))

  /** Jittered-cluster embeddings: vector v belongs to cluster
    * v % nClusters; its components are the cluster center plus a
    * `jitter`-scaled hash-uniform perturbation. With the default
    * jitter, within-cluster cosine ≫ cross-cluster cosine, so cell
    * probes find true neighbors in the first list — the regime IVF/PQ
    * are deployed for. */
  /** Mixed-regime corpus for the tier router (q-router study,
    * BASELINE §z.7): the first half is the clustered fixture, the
    * second half (ids offset by n/2) the isotropic one — one corpus
    * whose queries genuinely need different tiers. Even/odd of the
    * ORIGINAL id is preserved within each half, so modulus query
    * sampling draws from both regimes. */
  def mixed(spark: SparkSession, n: Long, dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    val half = n / 2
    clustered(spark, half, dim, seed = seed)
      .unionByName(
        isotropic(spark, n - half, dim, seed)
          .withColumn("vec_id", col("vec_id") + lit(half))
          // labels 8..15: the isotropic half never collides with the
          // clustered half's 0..7 cluster labels
          .withColumn("label", (col("label") + lit(8)).cast("int")))
  }

  def clustered(spark: SparkSession, n: Long, dim: Int = 64,
      nClusters: Int = 8, jitter: Double = 0.15,
      seed: Long = 42L): DataFrame = {
    val centers = array((0 until nClusters).map { c =>
      array((0 until dim).map { d =>
        lit(unitOf(mix(seed * 1000003L + c.toLong * dim + d)).toFloat)
      }: _*)
    }: _*)
    spark.range(n)
      .select(col("id").as("vec_id"),
        pmod(col("id"), lit(nClusters)).as("c"))
      .select(col("vec_id"),
        zip_with(
          element_at(centers, (col("c") + 1).cast("int")),
          transform(sequence(lit(0), lit(dim - 1)),
            d => unitCol(xxhash64(lit(seed), col("vec_id"), d))),
          (cv, j) => (cv + lit(jitter) * j).cast("float"))
          .as("embedding"),
        col("c").cast("int").as("label"))
  }
}
