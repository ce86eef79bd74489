package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution, Partitioning}
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}
import org.apache.spark.unsafe.types.UTF8String

/** The per-partition linear pass of the distributed order-statistics /
  * running-sum machinery ([[graft.operators.GlobalWindows]], SURVEY.md
  * §2b Q35), as a first-class physical operator.
  *
  * Why a custom `SparkPlan` and not `Dataset.mapPartitions`: the typed
  * API funnels every row through `DeserializeToObject` →
  * `SerializeFromObject` — a full external-Row round trip per row, PER
  * CONSUMER (the offset branch re-executes the pass from the reused
  * shuffle). On the q71 CDF (1.2M distinct values, three consumers) the
  * encoder was ~all of the 9.6 task-seconds. This node runs the same
  * O(1)-state pass on `InternalRow` directly: field reads via
  * `row.get(ordinal, type)`, output assembled with one `JoinedRow` + an
  * `UnsafeProjection` — no object conversion, no codegen break wider
  * than the node itself.
  *
  * Semantics: after range-partitioning + in-partition sorting by
  * `sortOrder` (declared as `requiredChildDistribution` /
  * `requiredChildOrdering` — EnsureRequirements plans the exchange, so
  * the operator composes with whatever partitioning is already there),
  * append per-partition-LOCAL statistics: partition id, local
  * row_number / rank / dense_rank (reset on every `groupAttrs` change)
  * and local running sums of `sumAttrs` (integral inputs accumulate as
  * LONG, fractional as DOUBLE, NULLs contribute nothing). The caller
  * patches local → global with the |partitions × groups|-row offset
  * join (GlobalWindows.scala) — this node deliberately does NOT know
  * about offsets, keeping it a pure, shuffle-free map.
  *
  * The node echoes every child column ([[references]] = full child
  * output), which also pins both consumer branches to the IDENTICAL
  * child exchange — column pruning must not specialize one branch into
  * a second range exchange with independently sampled boundaries.
  */
case class LocalRunningStats(
    sortOrder: Seq[SortOrder],
    groupAttrs: Seq[Attribute],
    keyAttrs: Seq[Attribute],
    sumAttrs: Seq[Attribute],
    needRowNumber: Boolean,
    needRank: Boolean,
    needDense: Boolean,
    statsAttrs: Seq[Attribute],
    child: LogicalPlan) extends UnaryNode {
  require(statsAttrs.size == 1 + (if (needRowNumber) 1 else 0) +
    (if (needRank) 1 else 0) + (if (needDense) 1 else 0) + sumAttrs.size,
    "statsAttrs must be pid [+rn] [+rank] [+dense] ++ sums")
  override def output: Seq[Attribute] = child.output ++ statsAttrs
  override def references: AttributeSet = child.outputSet
  override def producedAttributes: AttributeSet = AttributeSet(statsAttrs)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): LocalRunningStats =
    copy(child = newChild)
}

case class LocalRunningStatsExec(
    sortOrder: Seq[SortOrder],
    groupAttrs: Seq[Attribute],
    keyAttrs: Seq[Attribute],
    sumAttrs: Seq[Attribute],
    needRowNumber: Boolean,
    needRank: Boolean,
    needDense: Boolean,
    statsAttrs: Seq[Attribute],
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output ++ statsAttrs
  override def producedAttributes: AttributeSet = AttributeSet(statsAttrs)
  override def requiredChildDistribution: Seq[Distribution] =
    OrderedDistribution(sortOrder) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = sortOrder :: Nil
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering
  override protected def withNewChildInternal(newChild: SparkPlan): LocalRunningStatsExec =
    copy(child = newChild)

  // values retained across rows (prev group/key) may be backed by the
  // shuffle reader's reused buffer — copy the buffer-backed kinds
  private def copyValue(v: Any): Any = v match {
    case s: UTF8String => s.clone()
    case a: ArrayData => a.copy()
    case m: MapData => m.copy()
    case r: InternalRow => r.copy()
    case x => x
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val childOut = child.output
    def idxOf(a: Attribute): Int = {
      val i = childOut.indexWhere(_.exprId == a.exprId)
      require(i >= 0, s"column ${a.name} missing from child output"); i
    }
    val gIdx = groupAttrs.map(idxOf).toArray
    val gTypes: Array[DataType] = gIdx.map(childOut(_).dataType)
    val kIdx = keyAttrs.map(idxOf).toArray
    val kTypes: Array[DataType] = kIdx.map(childOut(_).dataType)
    val sIdx = sumAttrs.map(idxOf).toArray
    val sTypes: Array[DataType] = sIdx.map(childOut(_).dataType)
    val sIsLong = sTypes.map {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
    val (nRn, nRk, nDr) = (needRowNumber, needRank, needDense)
    val nSums = sIdx.length
    val nExtra = statsAttrs.length
    val outAttrs = output

    child.execute().mapPartitionsWithIndex { (pid, iter) =>
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val extraVals = new Array[Any](nExtra)
      val extraRow = new GenericInternalRow(extraVals)
      var rn = 0L; var rk = 0L; var dr = 0L
      val accL = new Array[Long](nSums)
      val accD = new Array[Double](nSums)
      var prevKey: Array[Any] = null
      var prevGroup: Array[Any] = null
      def vals(row: InternalRow, idx: Array[Int], types: Array[DataType]): Array[Any] = {
        val out = new Array[Any](idx.length)
        var i = 0
        while (i < idx.length) {
          out(i) = copyValue(row.get(idx(i), types(i))); i += 1
        }
        out
      }
      def same(a: Array[Any], b: Array[Any]): Boolean = {
        var i = 0; var ok = true
        while (ok && i < a.length) {
          ok = java.util.Objects.deepEquals(a(i), b(i)); i += 1
        }
        ok
      }
      iter.map { row =>
        if (gIdx.nonEmpty) {
          val g = vals(row, gIdx, gTypes)
          if (prevGroup == null || !same(g, prevGroup)) {
            rn = 0L; rk = 0L; dr = 0L; prevKey = null
            java.util.Arrays.fill(accL, 0L)
            java.util.Arrays.fill(accD, 0.0)
            prevGroup = g
          }
        }
        rn += 1
        var p = 0
        extraVals(p) = pid; p += 1
        if (nRn) { extraVals(p) = rn; p += 1 }
        if (nRk || nDr) {
          val k = vals(row, kIdx, kTypes)
          if (prevKey == null || !same(k, prevKey)) { rk = rn; dr += 1; prevKey = k }
          if (nRk) { extraVals(p) = rk; p += 1 }
          if (nDr) { extraVals(p) = dr; p += 1 }
        }
        var j = 0
        while (j < nSums) {
          if (!row.isNullAt(sIdx(j))) {
            val v = row.get(sIdx(j), sTypes(j))
            if (sIsLong(j)) accL(j) += v.asInstanceOf[Number].longValue()
            else accD(j) += v.asInstanceOf[Number].doubleValue()
          }
          extraVals(p) = if (sIsLong(j)) accL(j) else accD(j)
          p += 1; j += 1
        }
        proj(joined(row, extraRow))
      }
    }
  }
}

/** Planner strategy mapping the logical node to its physical twin —
  * registered in [[graft.functions.GraftExtensions]]. */
object RunningStatsStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case LocalRunningStats(so, g, k, s, rn, rk, dr, attrs, child) =>
      LocalRunningStatsExec(so, g, k, s, rn, rk, dr, attrs, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Call-site helper: resolves names against `df`'s analyzed plan, mints
  * the appended attributes, and wraps the node back into a DataFrame. */
object RunningStats {
  import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending}

  /** Appends `_gw_pid` (+ requested local order stats + local running
    * sums, in [[LocalRunningStats]]'s positional contract) to `df`,
    * range-partitioned and sorted by `groups ++ keys`. `sums` maps
    * input column → output column name. */
  def local(df: DataFrame, groups: Seq[String], keys: Seq[(String, Boolean)],
      sums: Seq[(String, String)], needRowNumber: Boolean,
      needRank: Boolean, needDense: Boolean): DataFrame = {
    val analyzed = df.queryExecution.analyzed
    // mirror Dataset.resolve: a name matching several attributes (common
    // after joins) must fail loudly, not silently bind the first side
    def attr(n: String): Attribute = analyzed.output
      .filter(_.name == n) match {
        case Seq(a) => a
        case Seq() => throw new IllegalArgumentException(
          s"column $n not in ${analyzed.output.map(_.name).mkString(",")}")
        case many => throw new IllegalArgumentException(
          s"column $n is ambiguous: matches ${many.size} attributes " +
            s"(${many.map(_.qualifiedName).mkString(", ")})")
      }
    val sortOrder = (groups.map(_ -> true) ++ keys).map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending) }
    val sumAttrs = sums.map { case (in, _) => attr(in) }
    val statsAttrs: Seq[Attribute] =
      Seq(AttributeReference("_gw_pid", IntegerType, nullable = false)()) ++
      (if (needRowNumber)
        Seq(AttributeReference("_gw_lrn", LongType, nullable = false)()) else Nil) ++
      (if (needRank)
        Seq(AttributeReference("_gw_lrk", LongType, nullable = false)()) else Nil) ++
      (if (needDense)
        Seq(AttributeReference("_gw_ldr", LongType, nullable = false)()) else Nil) ++
      sums.map { case (in, out) =>
        val long = attr(in).dataType match {
          case LongType | IntegerType | ShortType | ByteType => true
          case _ => false
        }
        AttributeReference(out, if (long) LongType else
          org.apache.spark.sql.types.DoubleType, nullable = false)()
      }
    val raw = org.apache.spark.sql.graft.Bridge.ofRows(df.sparkSession,
      LocalRunningStats(sortOrder, groups.map(attr), keys.map(k => attr(k._1)),
        sumAttrs, needRowNumber, needRank, needDense, statsAttrs, analyzed))
    // Re-alias the produced columns through a Project. The offset patch
    // self-joins this frame (local ⋈ agg(local)); DeduplicateRelations
    // regenerates Project aliases on the duplicated side but cannot
    // renew a custom node's produced attributes, so without this the
    // join fails CheckAnalysis with conflicting `_gw_pid` references.
    import org.apache.spark.sql.functions.col
    raw.select(analyzed.output.map(a => col(a.name)) ++
      statsAttrs.map(a => col(a.name).as(a.name)): _*)
  }
}
