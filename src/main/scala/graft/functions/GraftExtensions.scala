package graft.functions

import org.apache.spark.sql.{AnalysisException, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.IntegerType

/** `spark.sql.extensions` entry point: registers graft's custom Catalyst
  * expressions in every session built with this extension — the idiomatic
  * injection seam (SURVEY.md §4.2), so SQL text, `expr(...)`, and thriftier
  * downstream users all see the functions without calling a register()
  * helper first. [[GraftFunctions.register]] remains for sessions built
  * without the config (tests embedding ad-hoc sessions).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, clazz, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(clazz, name), builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinPrefilter)
    ext.injectPlannerStrategy(_ => graft.plans.RunningStatsStrategy)
  }
}

object GraftExtensions {
  private[functions] val functions
      : Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("cosine_sim", classOf[CosineSimilarity].getName,
      exprs => CosineSimilarity(exprs(0), exprs(1))),
    ("minhash_bands", classOf[MinHashBands].getName,
      exprs => MinHashBands(exprs(0))),
    ("shingle_hashes", classOf[ShingleHashes].getName,
      // k must be resolvable at analysis time; a clean AnalysisException
      // beats the ClassCastException a blind eval() would throw from deep
      // inside resolution for SQL users passing a column here
      exprs => exprs(1) match {
        case e if e.foldable && e.dataType == IntegerType && e.eval() != null =>
          ShingleHashes(exprs(0), e.eval().asInstanceOf[Int])
        case _ => throw new AnalysisException("NON_FOLDABLE_ARGUMENT",
          Map("funcName" -> "`shingle_hashes`", "paramName" -> "`k`",
            "paramType" -> "\"INT\""))
      }),
    ("simhash64", classOf[SimHash64].getName,
      exprs => SimHash64(exprs(0))),
    ("pq_adc", classOf[PqAdc].getName,
      exprs => PqAdc(exprs(0), exprs(1))),
    ("sq_dist", classOf[SqDist].getName,
      exprs => SqDist(exprs(0), exprs(1))),
    ("pq_encode", classOf[PqEncode].getName,
      // subspaces must be resolvable at analysis time (the
      // shingle_hashes convention)
      exprs => exprs(3) match {
        case e if e.foldable && e.dataType == IntegerType && e.eval() != null =>
          PqEncode(exprs(0), exprs(1), exprs(2), e.eval().asInstanceOf[Int])
        case _ => throw new AnalysisException("NON_FOLDABLE_ARGUMENT",
          Map("funcName" -> "`pq_encode`", "paramName" -> "`subspaces`",
            "paramType" -> "\"INT\""))
      }),
    ("mat_vec6", classOf[MatVec6].getName,
      exprs => MatVec6(exprs(0), exprs(1))),
    ("vec_dot", classOf[VecDot].getName,
      exprs => VecDot(exprs(0), exprs(1))),
    ("graft_tokens", classOf[Tokens].getName,
      exprs => Tokens(exprs(0))),
    ("ngram_occurrences", classOf[NgramJoin].getName,
      exprs => exprs(1) match {
        case e if e.foldable && e.dataType == IntegerType && e.eval() != null =>
          NgramJoin(exprs(0), e.eval().asInstanceOf[Int], distinct = false)
        case _ => throw new AnalysisException("NON_FOLDABLE_ARGUMENT",
          Map("funcName" -> "`ngram_occurrences`", "paramName" -> "`k`",
            "paramType" -> "\"INT\""))
      }),
    ("shingle_strings", classOf[NgramJoin].getName,
      exprs => exprs(1) match {
        case e if e.foldable && e.dataType == IntegerType && e.eval() != null =>
          NgramJoin(exprs(0), e.eval().asInstanceOf[Int], distinct = true)
        case _ => throw new AnalysisException("NON_FOLDABLE_ARGUMENT",
          Map("funcName" -> "`shingle_strings`", "paramName" -> "`k`",
            "paramType" -> "\"INT\""))
      }),
    ("upper_products", classOf[UpperProducts].getName,
      exprs => UpperProducts(exprs(0))),
    ("cosine_sim_int8", classOf[CosineSimInt8].getName,
      exprs => CosineSimInt8(exprs(0), exprs(1))),
    ("double_sort_bits", classOf[DoubleSortBits].getName,
      exprs => DoubleSortBits(exprs(0))),
    // Spark's own runtime-filter machinery (InjectRuntimeFilter's
    // BloomFilterAggregate / BloomFilterMightContain), surfaced as named
    // functions so a pipeline can build and apply a bloom semi-join
    // prune DECLARATIVELY (PruneOps) instead of hoping the optimizer's
    // thresholds fire. Not reimplemented: the engine's battle-tested
    // sketch, merged map-side like any partial aggregate.
    ("bloom_agg", classOf[BloomFilterAggregate].getName,
      exprs => exprs.length match {
        case 1 => new BloomFilterAggregate(exprs(0))
        case 2 => new BloomFilterAggregate(exprs(0), exprs(1))
        case _ => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2))
      }),
    ("bloom_might_contain", classOf[BloomFilterMightContain].getName,
      exprs => BloomFilterMightContain(exprs(0), exprs(1))))
}
