package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Aggregated registry of the LLM-training-pipeline operators. */
object LlmOps {
  val all: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    DedupOps.all ++ SimilarityOps.all ++ GraphAnnOps.all ++ TextOps.all ++
      MultimodalOps.all ++ SketchOps.all ++ CorpusOps.all ++ ChunkOps.all ++
      ClassifyOps.all ++ TakedownOps.all
}
