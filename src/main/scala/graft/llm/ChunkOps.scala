package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Training-example assembly: document chunking, sequence packing, and
  * token-budget mixture selection — the steps between a cleaned corpus and
  * a tokenized training set. The reference stops at delivering records
  * (/root/reference/src/Kinesis/Coordination.hs:53); these are the consumer
  * payloads a pretraining pipeline plugs in.
  *
  * All three are narrow per-row expressions plus at most one window over a
  * bounded partition key (`source` / `lang`), so each is a single shuffle on
  * a low-cardinality key with map-side partial work — they stream at any
  * scale. Library surface: `DataFrame => DataFrame` over the `documents`
  * shape; registry entries adapt the fixtures.
  */
object ChunkOps {
  type QFn = (SparkSession, String) => DataFrame

  /** q34a — fixed-width sliding-window chunking: windows of `width` chars
    * every `stride` chars (overlap = width − stride), the standard long-doc
    * split in front of a bounded-context encoder. Chunk k covers chars
    * [k·stride, k·stride + width); the last window may run short. Emits one
    * row per chunk with its md5 so the oracle pins exact chunk content, not
    * just counts. Pure per-row generate — no shuffle at all; at 100 TB this
    * is a map stage whose output is `width/stride`× the input, which is why
    * the overlap ratio is the knob that matters there. */
  def chunk(docs: DataFrame, width: Int = 200, stride: Int = 150): DataFrame =
    docs
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0L),
          greatest(floor((length(col("text")) - 1) / stride), lit(0))
            .cast("long"))).as("chunk_ix"))
      .select(col("doc_id"), col("chunk_ix"),
        col("text").substr(
          (col("chunk_ix") * stride + 1).cast("int"), lit(width))
          .as("chunk"))
      .select(col("doc_id"), col("chunk_ix"),
        length(col("chunk")).cast("long").as("chunk_len"),
        md5(col("chunk")).as("chunk_md5"))
      .orderBy("doc_id", "chunk_ix")

  def chunkSql(width: Int = 200, stride: Int = 150): String =
    s"""WITH c AS (
       |  SELECT doc_id,
       |    unnest(generate_series(0,
       |      greatest((length(text)-1)//$stride, 0))) AS chunk_ix,
       |    text
       |  FROM documents),
       |s AS (
       |  SELECT doc_id, chunk_ix,
       |    substring(text, CAST(chunk_ix*$stride+1 AS INT), $width) AS chunk
       |  FROM c)
       |SELECT doc_id, chunk_ix, length(chunk) AS chunk_len,
       |  md5(chunk) AS chunk_md5
       |FROM s ORDER BY doc_id, chunk_ix""".stripMargin

  /** q34a2 — token-window chunking: the token-level twin of [[chunk]].
    * Chars are a stand-in; tokens are what a bounded-context encoder
    * actually consumes. Chunk k covers tokens [k·stride, k·stride + width)
    * of `Text.tokens(text)` (the shared tokenizer contract); content is
    * pinned by md5 over the space-joined token window, so the oracle checks
    * exact token content, not just counts. Same shape as [[chunk]]: a pure
    * per-row generate, no shuffle, output `width/stride`× the input. */
  def chunkTokens(docs: DataFrame, width: Int = 40, stride: Int = 30): DataFrame =
    docs
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0L),
          greatest(floor((size(col("toks")) - 1) / stride), lit(0))
            .cast("long"))).as("chunk_ix"))
      .select(col("doc_id"), col("chunk_ix"),
        slice(col("toks"), (col("chunk_ix") * stride + 1).cast("int"),
          lit(width)).as("chunk"))
      .select(col("doc_id"), col("chunk_ix"),
        size(col("chunk")).cast("long").as("chunk_tok"),
        md5(array_join(col("chunk"), " ")).as("chunk_md5"))
      .orderBy("doc_id", "chunk_ix")

  def chunkTokensSql(width: Int = 40, stride: Int = 30): String =
    s"""WITH t AS (
       |  SELECT doc_id, ${Text.tokensSql("text")} AS toks FROM documents),
       |c AS (
       |  SELECT doc_id, toks,
       |    unnest(generate_series(0,
       |      greatest((len(toks)-1)//$stride, 0))) AS chunk_ix
       |  FROM t),
       |s AS (
       |  SELECT doc_id, chunk_ix,
       |    toks[CAST(chunk_ix*$stride+1 AS BIGINT)
       |         :CAST(chunk_ix*$stride+$width AS BIGINT)] AS chunk
       |  FROM c)
       |SELECT doc_id, chunk_ix, CAST(len(chunk) AS BIGINT) AS chunk_tok,
       |  md5(array_to_string(chunk, ' ')) AS chunk_md5
       |FROM s ORDER BY doc_id, chunk_ix""".stripMargin

  /** q34b — sequence-packing audit (concatenate-and-cut, the GPT-style
    * packing strategy): per source, documents are concatenated in doc_id
    * order into one token stream that is cut into fixed `capacity`-token
    * training sequences. A running-sum window gives each doc its token span
    * [start, end); a doc crosses a cut iff its span straddles a multiple of
    * `capacity`. Output per source: sequence count, boundary-crossing docs
    * (they lose attention context — the quantity packing tries to
    * minimize), and tail padding. One shuffle on `source`; the window state
    * is a single running sum, so a skewed source degrades to one long but
    * still O(n) partition — at real scale pack within finer deterministic
    * groups (e.g. source × hash-bucket) to bound partition length. */
  def packingStats(docs: DataFrame, capacity: Int = 256): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    val perDoc = docs
      .select(col("source"), col("doc_id"),
        size(Text.tokens(col("text"))).cast("long").as("n_tok"))
      .withColumn("cum_end", sum(col("n_tok")).over(w))
      .withColumn("cum_start", col("cum_end") - col("n_tok"))
    perDoc
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("total_tokens"),
        ((sum(col("n_tok")) + capacity - 1) / capacity).cast("long")
          .as("n_seqs"),
        count(when(col("n_tok") > 0 &&
          floor(col("cum_start") / capacity) =!=
            floor((col("cum_end") - 1) / capacity), 1)).as("n_boundary_docs"))
      .withColumn("tail_pad",
        col("n_seqs") * capacity - col("total_tokens"))
      .orderBy("source")
  }

  def packingStatsSql(capacity: Int = 256): String =
    s"""WITH d AS (
       |  SELECT source, doc_id,
       |    CAST(len(${Text.tokensSql("text")}) AS BIGINT) AS n_tok
       |  FROM documents),
       |spans AS (
       |  SELECT source, n_tok,
       |    sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS UNBOUNDED PRECEDING) AS cum_end
       |  FROM d),
       |agg AS (
       |  SELECT source, count(*) AS n_docs,
       |    CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       |    CAST((sum(n_tok) + $capacity - 1) // $capacity AS BIGINT) AS n_seqs,
       |    CAST(sum(CASE WHEN n_tok > 0 AND
       |        (cum_end - n_tok) // $capacity <> (cum_end - 1) // $capacity
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_boundary_docs
       |  FROM spans GROUP BY source)
       |SELECT source, n_docs, total_tokens, n_seqs, n_boundary_docs,
       |  n_seqs * $capacity - total_tokens AS tail_pad
       |FROM agg ORDER BY source""".stripMargin

  /** q34b2 — materialized packing assignment: the doc-level twin of
    * [[packingStats]] the way [[mixtureSelectDocs]] twins the mixture
    * audit. Each document gets its landing coordinates in the packed
    * training set: `seq_ix` (the capacity-token sequence where the doc
    * starts), `seq_offset` (its start position inside that sequence), and
    * `n_seqs_spanned` (how many sequences its tokens touch — >1 means the
    * doc is split across a cut). This is the actual doc → training-example
    * assignment a writer consumes to emit packed sequences; the stats
    * query only audits its aggregate shape. Same single shuffle on
    * `source` + running-sum window; at real scale pack within
    * source × hash-bucket groups to bound partition length. */
  def packSequences(docs: DataFrame, capacity: Int = 256): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    docs
      .select(col("source"), col("doc_id"),
        size(Text.tokens(col("text"))).cast("long").as("n_tok"))
      .withColumn("cum_end", sum(col("n_tok")).over(w))
      .withColumn("cum_start", col("cum_end") - col("n_tok"))
      .select(col("source"), col("doc_id"), col("n_tok"),
        floor(col("cum_start") / capacity).cast("long").as("seq_ix"),
        (col("cum_start") % capacity).cast("long").as("seq_offset"),
        when(col("n_tok") === 0, lit(0L))
          .otherwise(floor((col("cum_end") - 1) / capacity).cast("long")
            - floor(col("cum_start") / capacity).cast("long") + 1)
          .as("n_seqs_spanned"))
      .orderBy("source", "doc_id")
  }

  def packSequencesSql(capacity: Int = 256): String =
    s"""WITH d AS (
       |  SELECT source, doc_id,
       |    CAST(len(${Text.tokensSql("text")}) AS BIGINT) AS n_tok
       |  FROM documents),
       |spans AS (
       |  SELECT source, doc_id, n_tok,
       |    sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS UNBOUNDED PRECEDING) AS cum_end
       |  FROM d)
       |SELECT source, doc_id, n_tok,
       |  CAST((cum_end - n_tok) // $capacity AS BIGINT) AS seq_ix,
       |  CAST((cum_end - n_tok) % $capacity AS BIGINT) AS seq_offset,
       |  CAST(CASE WHEN n_tok = 0 THEN 0
       |    ELSE (cum_end - 1) // $capacity - (cum_end - n_tok) // $capacity + 1
       |  END AS BIGINT) AS n_seqs_spanned
       |FROM spans ORDER BY source, doc_id""".stripMargin

  /** Mixture weights: target share of the token budget per language —
    * the dataset-composition knob of a pretraining run. */
  val mixtureWeights: Seq[(String, Double)] =
    Seq("en" -> 0.4, "zh" -> 0.2, "es" -> 0.2, "de" -> 0.1, "fr" -> 0.1)

  /** Doc-level view of the mixture selection: the kept documents with
    * their token counts and per-language budget (the set [[mixtureSelect]]
    * aggregates). Exposed so callers can materialize the selected corpus,
    * not just audit its composition. */
  def mixtureSelectDocs(docs: DataFrame,
      totalBudget: Long = 8000L): DataFrame = {
    val budget: Column = mixtureWeights
      .foldLeft(lit(0L)) { case (acc, (lg, wt)) =>
        when(col("lang") === lg, lit((totalBudget * wt).round)).otherwise(acc)
      }
    val w = Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    docs
      .select(col("lang"), col("doc_id"),
        size(Text.tokens(col("text"))).cast("long").as("n_tok"),
        budget.as("budget"))
      .withColumn("cum_start",
        sum(col("n_tok")).over(w) - col("n_tok"))
      .filter(col("cum_start") < col("budget"))
  }

  /** q34c — token-budget mixture selection: give each language
    * `weight × totalBudget` tokens; within a language take docs in
    * deterministic md5(doc_id) order (an unbiased, reproducible shuffle —
    * the same trick as q25_train_split) until the budget is crossed. A doc
    * is kept iff its span *starts* inside the budget, so the realized count
    * overshoots by at most one doc — the deterministic convention both
    * engines share. Output per language: docs kept, tokens kept, budget.
    * One shuffle on `lang`; the per-language running sum is the same
    * bounded-state window as packing. */
  def mixtureSelect(docs: DataFrame, totalBudget: Long = 8000L): DataFrame =
    mixtureSelectDocs(docs, totalBudget)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_tok")).as("tokens_kept"),
        first(col("budget")).as("budget"))
      .orderBy("lang")

  def mixtureSelectSql(totalBudget: Long = 8000L): String = {
    val cases = mixtureWeights
      .map { case (lg, wt) => s"WHEN '$lg' THEN ${(totalBudget * wt).round}" }
      .mkString(" ")
    s"""WITH d AS (
       |  SELECT lang, doc_id,
       |    CAST(len(${Text.tokensSql("text")}) AS BIGINT) AS n_tok,
       |    CAST(CASE lang $cases ELSE 0 END AS BIGINT) AS budget
       |  FROM documents),
       |spans AS (
       |  SELECT lang, n_tok, budget,
       |    sum(n_tok) OVER (PARTITION BY lang
       |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
       |      ROWS UNBOUNDED PRECEDING) - n_tok AS cum_start
       |  FROM d)
       |SELECT lang, count(*) AS n_kept,
       |  CAST(sum(n_tok) AS BIGINT) AS tokens_kept, any_value(budget) AS budget
       |FROM spans WHERE cum_start < budget
       |GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** q140 — mixture epoch plan (the data-constrained planning table,
    * Muennighoff et al. '23 "Scaling Data-Constrained Language Models":
    * repeating data is near-free up to ~4 epochs, then decays): given the
    * corpus's NATURAL per-language token supply, the target mixture
    * ([[mixtureWeights]]) and a total token budget, how many epochs of
    * each language the budget demands (`epochs` = target / supply), what
    * that becomes under a repetition cap (`epochs_capped`), the tokens
    * actually deliverable (`effective_tokens`), and the shortfall the
    * mixture designer must reallocate (`deficit`). This is the step
    * BEFORE q34_mixture: mixture selection assumes the budget is
    * satisfiable per stratum; the epoch plan is the audit that says
    * whether it is, and by how much it over-asks the scarce languages —
    * the table a run owner reads to decide between lowering a weight and
    * accepting >cap repetition. Languages outside the weight map get
    * target 0 (present in the corpus, absent from the plan — explicit
    * zero rows, not dropped).
    *
    * Scale shape: one token-count aggregate over one corpus scan
    * (map-side partial sums; the tokenizer is the shared q25 contract),
    * then pure arithmetic on the |languages|-row frame with the weights
    * folded in as literals — no joins, no second scan, metadata-scale
    * output on one partition. */
  def epochPlan(docs: DataFrame, totalBudget: Long = 60000L,
      maxEpochs: Int = 4): DataFrame = {
    val target: Column = mixtureWeights
      .foldLeft(lit(0L)) { case (acc, (lg, wt)) =>
        when(col("lang") === lg, lit((totalBudget * wt).round)).otherwise(acc)
      }
    docs
      .select(col("lang"), size(Text.tokens(col("text"))).cast("long")
        .as("n_tok"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tokens"))
      .withColumn("target_tokens", target)
      .withColumn("epochs", round(
        col("target_tokens").cast("double") / col("tokens") + lit(1e-9), 4))
      .withColumn("effective_tokens",
        least(col("target_tokens"), col("tokens") * maxEpochs))
      .withColumn("epochs_capped", round(
        col("effective_tokens").cast("double") / col("tokens") + lit(1e-9), 4))
      .withColumn("deficit", col("target_tokens") - col("effective_tokens"))
      // |languages|-bounded output: one-partition sort, no sampling job
      .coalesce(1).sortWithinPartitions("lang")
  }

  def epochPlanSql(totalBudget: Long = 60000L, maxEpochs: Int = 4): String = {
    val cases = mixtureWeights
      .map { case (lg, wt) => s"WHEN '$lg' THEN ${(totalBudget * wt).round}" }
      .mkString(" ")
    s"""WITH d AS (
       |  SELECT lang, CAST(len(${Text.tokensSql("text")}) AS BIGINT) AS n_tok
       |  FROM documents),
       |a AS (SELECT lang, count(*) AS n_docs,
       |    CAST(sum(n_tok) AS BIGINT) AS tokens
       |  FROM d GROUP BY lang),
       |p AS (SELECT lang, n_docs, tokens,
       |    CAST(CASE lang $cases ELSE 0 END AS BIGINT) AS target_tokens
       |  FROM a)
       |SELECT lang, n_docs, tokens, target_tokens,
       |  round(CAST(target_tokens AS DOUBLE) / tokens + 1e-9, 4) AS epochs,
       |  least(target_tokens, tokens * $maxEpochs) AS effective_tokens,
       |  round(CAST(least(target_tokens, tokens * $maxEpochs) AS DOUBLE)
       |    / tokens + 1e-9, 4) AS epochs_capped,
       |  target_tokens - least(target_tokens, tokens * $maxEpochs) AS deficit
       |FROM p ORDER BY lang""".stripMargin
  }

  private def onDocs(f: DataFrame => DataFrame): QFn =
    (s, d) => f(Tables.documents(s, d))

  /** q150 — context-window planning table: for each candidate window
    * size, what share of corpus tokens survives one-window-per-doc
    * truncation, what share of docs truncate at all, and the mean
    * padding a single-doc-per-window layout would waste. The
    * three-column tradeoff (coverage vs truncation vs padding) is the
    * table a training team reads before fixing max_seq_len — q34's
    * chunk/pack operators then implement whichever point is chosen.
    *
    * Scale shape: one scan computes per-doc token counts; each row fans
    * into |windows| (window, stats) cells that map-side-combine — the
    * |windows|-row result is the only shuffle. */
  def contextWindowPlan(docs: DataFrame,
      windows: Seq[Int] = Seq(64, 128, 256, 512),
      bpeMerges: Option[Seq[(String, String)]] = None): DataFrame = {
    require(windows.nonEmpty, "need candidate windows")
    // Optional trained-tokenizer re-basing (q154's merge table): token
    // counts become BPE symbol counts, so the window plan budgets the
    // units the model actually consumes. Default stays the whitespace
    // contract the registry oracle mirrors.
    val nToks = bpeMerges match {
      case Some(m) => size(graft.llm.TextOps.bpeTokens(col("text"), m))
      case None => size(Text.tokens(col("text")))
    }
    val wArr = array(windows.map(lit): _*)
    Tables.fanout(docs)
      .select(col("doc_id"), nToks.cast("long").as("n"))
      .select(explode(wArr).as("w"), col("n"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n")).as("total_tokens"),
        sum(least(col("n"), col("w"))).as("kept_tokens"),
        sum((col("n") > col("w")).cast("long")).as("n_truncated"),
        sum(when(col("n") < col("w"), col("w") - col("n"))
          .otherwise(0L)).as("pad_tokens"))
      .select(col("w").as("window"), col("n_docs"),
        round(col("kept_tokens") / col("total_tokens") + lit(1e-9), 4)
          .as("token_coverage"),
        round(col("n_truncated") / col("n_docs") + lit(1e-9), 4)
          .as("truncated_share"),
        round(col("pad_tokens") /
          (col("n_docs") * col("w")) + lit(1e-9), 4).as("pad_share"))
      .orderBy("window")
  }
  def contextWindowPlanSql(
      windows: Seq[Int] = Seq(64, 128, 256, 512)): String =
    s"""WITH d AS (SELECT doc_id,
       |    CAST(len(${Text.tokensSql("text")}) AS BIGINT) AS n
       |  FROM documents),
       |f AS (SELECT t.w, n FROM d,
       |  unnest([${windows.mkString(", ")}]) t(w))
       |SELECT w AS "window", count(*) AS n_docs,
       |  round(sum(least(n, w)) / CAST(sum(n) AS DOUBLE) + 1e-9, 4)
       |    AS token_coverage,
       |  round(sum(CASE WHEN n > w THEN 1 ELSE 0 END)
       |    / CAST(count(*) AS DOUBLE) + 1e-9, 4) AS truncated_share,
       |  round(sum(CASE WHEN n < w THEN w - n ELSE 0 END)
       |    / (CAST(count(*) AS DOUBLE) * w) + 1e-9, 4) AS pad_share
       |FROM f GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------------
  // q167 — deterministic training-order shuffle + sharding
  // ------------------------------------------------------------------

  /** q167 — the reproducible global shuffle a training export runs
    * last: every doc gets a position in a pseudo-random but
    * DETERMINISTIC global order (md5 of the id + seed — the q34c
    * mixture convention, so reruns and the oracle agree byte-for-byte)
    * and a (shard, pos) address at fixed `shardSize`. Downstream
    * loaders read shard files sequentially and still see an unbiased
    * interleave of sources/languages — order randomization without a
    * nondeterministic `rand()` that would break replay, resume, and
    * cross-engine verification.
    *
    * Scale shape: the global row number is the q35 machinery
    * (GlobalWindows.withGlobalOrderStats — ONE range exchange, linear
    * per-partition pass, metadata-scale offset patch), never a
    * single-partition window; everything after it is per-row
    * arithmetic. */
  def trainingShuffle(docs: DataFrame, seed: Long = 42L,
      shardSize: Long = 100L): DataFrame = {
    val keyed = Tables.fanout(docs).select(col("doc_id"),
      md5(concat(col("doc_id").cast("string"), lit(s":$seed")))
        .as("_shuf"))
    graft.operators.GlobalWindows
      .withGlobalOrderStats(keyed,
        Seq("_shuf" -> true, "doc_id" -> true), Set("row_number"))
      .select(col("doc_id"),
        ((col("gw_row_number") - 1) / shardSize).cast("long").as("shard"),
        ((col("gw_row_number") - 1) % shardSize).cast("long").as("pos"))
      .orderBy(col("shard"), col("pos"))
  }

  def trainingShuffleSql(seed: Long = 42L, shardSize: Long = 100L): String =
    s"""WITH r AS (SELECT doc_id,
       |  row_number() OVER (
       |    ORDER BY md5(CAST(doc_id AS VARCHAR) || ':$seed'), doc_id)
       |    AS rn
       |  FROM documents)
       |SELECT doc_id, CAST((rn - 1) // $shardSize AS BIGINT) AS shard,
       |  CAST((rn - 1) % $shardSize AS BIGINT) AS pos
       |FROM r ORDER BY shard, pos""".stripMargin

  val all: Seq[(String, QFn, Option[String])] = Seq(
    ("q167_training_shuffle", onDocs(trainingShuffle(_)),
      Some(trainingShuffleSql())),
    ("q150_context_window_plan", onDocs(contextWindowPlan(_)),
      Some(contextWindowPlanSql())),
    ("q34_chunk", onDocs(chunk(_)), Some(chunkSql())),
    ("q34_chunk_tokens", onDocs(chunkTokens(_)), Some(chunkTokensSql())),
    ("q34_pack", onDocs(packingStats(_)), Some(packingStatsSql())),
    ("q34_pack_docs", onDocs(packSequences(_)), Some(packSequencesSql())),
    ("q34_mixture", onDocs(mixtureSelect(_)), Some(mixtureSelectSql())),
    ("q140_epoch_plan", onDocs(epochPlan(_)), Some(epochPlanSql())))
}
