package graft.functions

import org.apache.spark.sql.{AnalysisException, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
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
      exprs => SimHash64(exprs(0))))
}
