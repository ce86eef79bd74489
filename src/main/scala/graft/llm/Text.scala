package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared deterministic text primitives for the LLM-pipeline operators.
  *
  * Tokenizer contract (mirrored exactly in every DuckDB oracle):
  * lowercase → split on `[^a-z0-9]+` → drop empty tokens. Shingles are
  * k-token windows joined with a single space, deduplicated per document.
  */
object Text {
  /** lowercase + split on non-alphanumerics + drop empties — the
    * native codegen expression (functions/Tokens.scala, registered by
    * GraftExtensions in every engine session): bit-identical output to
    * the `filter(split(lower(c), "[^a-z0-9]+"), t -> t <> '')` HOF
    * form it replaces (Round21OpsSpec pins exact equality over the
    * documents fixture), without the interpreted per-field lambda and
    * the dropped empty-string allocations — this is the first pass of
    * every text-family operator (~55 call sites). */
  def tokens(c: Column): Column = call_function("graft_tokens", c)

  /** DuckDB twin of [[tokens]] for embedding into oracle SQL. */
  def tokensSql(c: String): String =
    s"list_filter(string_split_regex(lower($c), '[^a-z0-9]+'), t -> t <> '')"

  /** Distinct k-token shingles; empty array when the doc has < k
    * tokens. The window join runs in the native NgramJoin expression
    * (bit-identical to the replaced array_distinct(transform(...))
    * HOF — Round21OpsSpec); the < k / null guard stays out here so the
    * replaced expression's null semantics are preserved verbatim. */
  def shingles(toks: Column, k: Int): Column =
    when(size(toks) >= k, call_function("shingle_strings", toks, lit(k)))
      .otherwise(array().cast("array<string>"))

  /** DuckDB twin of [[shingles]]. `toks` must reference a list column. */
  def shinglesSql(toks: String, k: Int): String =
    s"""CASE WHEN len($toks) >= $k
       | THEN list_distinct(list_transform(generate_series(1, len($toks) - ${k - 1}),
       |   i -> array_to_string($toks[i:i+${k - 1}], ' ')))
       | ELSE [] END""".stripMargin

  /** k-token n-gram OCCURRENCES — [[shingles]] without the dedup: every
    * window kept with multiplicity, as language-model counting requires
    * (shingle sets are for resemblance; LM statistics are multisets). */
  def ngramOccurrences(toks: Column, k: Int): Column =
    when(size(toks) >= k, call_function("ngram_occurrences", toks, lit(k)))
      .otherwise(array().cast("array<string>"))

  /** DuckDB twin of [[ngramOccurrences]]. */
  def ngramOccurrencesSql(toks: String, k: Int): String =
    s"""CASE WHEN len($toks) >= $k
       | THEN list_transform(generate_series(1, len($toks) - ${k - 1}),
       |   i -> array_to_string($toks[i:i+${k - 1}], ' '))
       | ELSE [] END""".stripMargin

  /** Fixed stopword list for term statistics / quality scoring. */
  val stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  def stopwordsSqlList: String =
    stopwords.map(w => s"'$w'").mkString("[", ", ", "]")
}
