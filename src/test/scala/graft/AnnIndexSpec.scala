package graft

import graft.core.Tables
import graft.llm.SimilarityOps

/** The "computed once, persisted, reused" ANN posture, demonstrated: the
  * LSH/IVF index is written out as a bucketed catalog table, queries run
  * against the persisted index, results are identical to the direct path,
  * and the plan proves the index construction never reruns — no plane
  * arithmetic / assignment window, and no exchange on the corpus side
  * (the probe set is broadcast; the index's own bucketing satisfies the
  * histogram's clustering requirement). */
class AnnIndexSpec extends SparkSpec {

  test("persisted LSH index: identical top-k, no bucket recompute, no corpus exchange") {
    val em = Tables.embeddings(spark, sf0001)
    SimilarityOps.writeLshIndex(em, "ann_lsh_idx", nBuckets = 8)
    val fromIndex = SimilarityOps.knnLshIndexed(spark.table("ann_lsh_idx"))
    val direct = SimilarityOps.knnLsh(em)
    assert(fromIndex.collect().toSeq == direct.collect().toSeq)

    val plan = fromIndex.queryExecution.executedPlan.toString
    // the bucket column is READ from storage — the plane projections
    // (aggregate over zip_with) appear nowhere in the query plan
    assert(!plan.contains("zip_with"),
      s"indexed LSH plan re-derives corpus buckets:\n$plan")
    // the corpus side streams into the broadcast probe join unshuffled,
    // and the bucket histogram rides the table's own bucketing
    assert(!plan.contains("Exchange hashpartitioning(bucket"),
      s"indexed LSH plan shuffles the corpus on bucket:\n$plan")
  }

  test("persisted IVF index: identical top-k, assignment window never reruns") {
    val em = Tables.embeddings(spark, sf0001)
    SimilarityOps.writeIvfIndex(em, "ann_ivf_idx", nBuckets = 8)
    val fromIndex = SimilarityOps.knnIvfIndexed(spark.table("ann_ivf_idx"))
    val direct = SimilarityOps.knnIvf(em)
    assert(fromIndex.collect().toSeq == direct.collect().toSeq)

    val plan = fromIndex.queryExecution.executedPlan.toString
    // the corpus-wide nearest-centroid assignment is a window over
    // vec_id — its exchange must not reappear on the query path
    assert(!plan.contains("Exchange hashpartitioning(vec_id"),
      s"indexed IVF plan reruns the corpus assignment:\n$plan")
  }
}
