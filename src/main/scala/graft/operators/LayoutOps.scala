package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Z-order (Morton) data layout — SURVEY.md §2b Q50: multi-dimensional
  * clustering for scan pruning. Sorting 100 TB by one column makes ONE
  * predicate cheap; interleaving the bits of two (bucketized) columns
  * makes range predicates on EITHER column land in few contiguous files
  * (Morton 1966; the technique behind Delta/Iceberg Z-ORDER clustering —
  * public canon). This module keeps everything expression-only so both
  * the layout key and its audit run codegen'd, with a SQL-text twin of
  * the exact same arithmetic for the DuckDB oracle.
  *
  * Pieces:
  *  - [[bucketize]]: value → integer cell in [0, 2^bits) from a caller-
  *    declared range (deterministic — no data-dependent quantiles, so a
  *    file written yesterday and a file written today agree on cells);
  *  - [[zValue]]: bit interleave of two cells (LSB-first, x in even
  *    bits, y in odd);
  *  - [[zorderLayout]]: `repartitionByRange` + local sort on the z key —
  *    ONE shuffle and each output file covers a narrow z range, i.e. a
  *    small axis-aligned tile of (x, y) space;
  *  - [[zorderAudit]] (q50): per-tile occupancy + per-dimension spans —
  *    the measurable claim behind the layout: every tile touches at most
  *    a (2^tileBits)-cell-wide slice of each dimension, so a predicate
  *    on either column prunes to ~span/range of the files.
  */
object LayoutOps {

  /** Clamp-and-scale `c` from [lo, hi) onto integer cells 0..2^bits−1.
    * Fixed arithmetic (floor of a single multiply-divide) — identical
    * across engines, no quantile estimation. */
  def bucketize(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val cells = 1 << bits
    least(greatest(
      floor((c.cast("double") - lo) * cells / (hi - lo)).cast("long"),
      lit(0L)), lit(cells - 1L))
  }

  /** Morton interleave of two `bits`-wide cells: x fills even bit
    * positions, y odd. Pure shift/mask/add — codegen folds it into one
    * projection. */
  def zValue(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { b =>
      (shiftright(x, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b))) +
        (shiftright(y, b).bitwiseAND(lit(1L)) * lit(1L << (2 * b + 1)))
    }.reduce(_ + _)

  /** The SQL-text twin of [[bucketize]] ∘ [[zValue]] (DuckDB + Spark SQL
    * share the operators), so oracles assert the exact layout key. */
  def zValueSql(x: String, y: String, bits: Int): String = {
    val terms = (0 until bits).flatMap { b =>
      Seq(s"(($x >> $b) & 1) * ${1L << (2 * b)}",
        s"(($y >> $b) & 1) * ${1L << (2 * b + 1)}")
    }
    terms.mkString("(", " + ", ")")
  }

  def bucketizeSql(c: String, lo: Double, hi: Double, bits: Int): String = {
    val cells = 1 << bits
    s"least(greatest(CAST(floor((CAST($c AS DOUBLE) - $lo) * $cells / ${hi - lo}) AS BIGINT), 0), ${cells - 1})"
  }

  /** Cluster `df` for writing: range-partition into `numFiles` splits of
    * the z key and sort within each — one shuffle, and every output file
    * covers a contiguous z range (a small (x, y) tile). The caller
    * writes the result with its own sink options. */
  def zorderLayout(df: DataFrame, x: Column, y: Column, bits: Int,
      numFiles: Int, xRange: (Double, Double),
      yRange: (Double, Double)): DataFrame = {
    val z = zValue(bucketize(x, xRange._1, xRange._2, bits),
      bucketize(y, yRange._1, yRange._2, bits), bits)
    df.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
  }

  /** The locality audit: assign each row its z value, coarsen to a tile
    * (drop the low `2·tileBits` z bits — a 2^tileBits × 2^tileBits cell
    * square), and report per-tile occupancy and the span each dimension
    * actually covers. Narrow spans = the pruning claim holds. One
    * groupBy shuffle on the (bounded) tile key. */
  def zorderAudit(df: DataFrame, x: Column, y: Column, bits: Int,
      tileBits: Int, xRange: (Double, Double),
      yRange: (Double, Double)): DataFrame = {
    val xb = bucketize(x, xRange._1, xRange._2, bits)
    val yb = bucketize(y, yRange._1, yRange._2, bits)
    val z = zValue(xb, yb, bits)
    df.select(xb.as("_xb"), yb.as("_yb"),
        shiftright(z, 2 * tileBits).as("tile"))
      .groupBy(col("tile"))
      .agg(count(lit(1)).as("n"),
        (max(col("_xb")) - min(col("_xb"))).as("x_span"),
        (max(col("_yb")) - min(col("_yb"))).as("y_span"))
      .orderBy("tile")
  }

  /** q50 registry entry: orders z-ordered on (customer, value) — 8-bit
    * cells, 16×16-cell tiles. The spans prove every tile stays inside a
    * 16-cell slice of both dimensions (the scan-pruning guarantee a
    * 100 TB layout job buys). */
  def ordersZorderAudit(orders: DataFrame): DataFrame =
    zorderAudit(orders, col("o_custkey"), col("o_totalprice"),
      bits = 8, tileBits = 4, xRange = (0.0, 16384.0),
      yRange = (0.0, 600000.0))

  val q50ZorderSql: String = {
    val xb = bucketizeSql("o_custkey", 0.0, 16384.0, 8)
    val yb = bucketizeSql("o_totalprice", 0.0, 600000.0, 8)
    val z = zValueSql("xb", "yb", 8)
    s"""WITH cells AS (SELECT $xb AS xb, $yb AS yb FROM orders),
       |zs AS (SELECT xb, yb, $z >> 8 AS tile FROM cells)
       |SELECT tile, count(*) AS n,
       |  max(xb) - min(xb) AS x_span, max(yb) - min(yb) AS y_span
       |FROM zs GROUP BY tile ORDER BY tile""".stripMargin
  }

  /** q77 — small-file compaction planner (the Delta/Iceberg OPTIMIZE
    * bin-packing shape, public canon): assign size-carrying items to
    * contiguous target-size output bins, per group, in a stable order —
    * item i's bin is `floor(start_offset / target)` where start_offset
    * is the running size sum before it. First-fit-in-order: every bin
    * except a group's last is ≥ target minus one item, bins never split
    * an item, and the plan is a pure function of (order, sizes) — two
    * runs over the same metadata agree.
    *
    * Scale shape: the input is the FILE-METADATA table (one row per
    * file/object — millions of rows where the data is 100 TB), so this
    * is metadata-scale by construction. One shuffle on the group key;
    * the running sum and the per-bin rollup reuse the same
    * Exchange+Sort. A single group whose file list dwarfs the rest
    * swaps in the grouped [[GlobalWindows.withGlobalRunningSum]] pass —
    * same law, range-partitioned. */
  def compactionPlan(files: DataFrame, groupCol: String, orderCol: String,
      sizeCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(orderCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    files
      .withColumn("_cum", sum(col(sizeCol)).over(w))
      .withColumn("bin",
        floor((col("_cum") - col(sizeCol)) / lit(targetBytes.toDouble))
          .cast("long"))
      .groupBy(col(groupCol), col("bin"))
      .agg(count(lit(1)).as("n_files"), sum(col(sizeCol)).as("bytes"),
        min(col(orderCol)).as("lo"), max(col(orderCol)).as("hi"))
      .orderBy(groupCol, "bin")
  }

  /** q77 registry entry: documents as the file-metadata fixture —
    * compact each source's docs (in doc_id order, n_chars as the size)
    * into ~4 KiB bins. */
  def documentsCompactionPlan(docs: DataFrame): DataFrame =
    compactionPlan(docs, "source", "doc_id", "n_chars", 4096L)

  val q77CompactionSql: String =
    """WITH c AS (SELECT source, doc_id, n_chars,
      |    sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM documents),
      |b AS (SELECT source, doc_id, n_chars,
      |    CAST(floor((cum - n_chars) / 4096.0) AS BIGINT) AS bin FROM c)
      |SELECT source, bin, CAST(count(*) AS BIGINT) AS n_files,
      |  CAST(sum(n_chars) AS BIGINT) AS bytes,
      |  min(doc_id) AS lo, max(doc_id) AS hi
      |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  type QFn = (SparkSession, String) => DataFrame
  val all: Seq[(String, QFn, Option[String])] = Seq(
    ("q50_zorder_layout",
      (s: SparkSession, d: String) => ordersZorderAudit(Tables.orders(s, d)),
      Some(q50ZorderSql)),
    ("q77_compaction_plan",
      (s: SparkSession, d: String) =>
        documentsCompactionPlan(Tables.documents(s, d)),
      Some(q77CompactionSql)))
}
