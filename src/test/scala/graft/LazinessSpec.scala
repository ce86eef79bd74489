package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Constructing a registry query must not run Spark jobs: a driver action
  * at construction time (the old `.agg(max).first` split in DedupOps) costs
  * an extra scheduler round-trip per invocation and breaks lazy plan
  * composition — callers embedding a registry query into a larger plan
  * would trigger hidden work. Splits must ride in-plan as broadcast
  * scalars (the q17 pattern).
  *
  * Two kinds of construction-time jobs are legitimate: first-touch parquet
  * footer/schema reads (one per table per session; memoized by
  * Tables.load — pre-warmed here before counting), and operators that
  * DECLARE themselves eager by registering through
  * [[graft.core.EagerByDesign]] — iterative CC fixpoints
  * (localCheckpoint per round: bounded plan depth), once-per-plan model
  * fits with multiple consumers, and eagerly-materialized cached bases
  * that concurrent broadcast consumers would otherwise race cold. The
  * marker carries a mandatory reason string at the REGISTRATION site, so
  * the exemption can't rot out of sync with the registry the way a
  * hand-maintained name list here did — an unmarked eager entry still
  * fails this spec. */
class LazinessSpec extends SparkSpec {

  test("constructing registry queries fires no Spark job") {
    // pre-warm per-table schema resolution so first-touch footer reads
    // don't count against the queries that happen to read a table first
    graft.core.Tables.names.foreach(t =>
      graft.core.Tables.load(spark, sf0001, t))

    val (eager, lazyQs) = SparkEntry.queries.toSeq.sortBy(_._1)
      .partition(_._2.isInstanceOf[graft.core.EagerByDesign])
    // the marker population is sane: the known-iterative families are
    // marked, and no reason is blank (EagerByDesign enforces non-empty
    // at construction — this guards against an accidental mass-wrap)
    assert(eager.nonEmpty && eager.size < SparkEntry.queries.size / 4,
      s"suspicious eager-marker population: ${eager.size} of " +
        s"${SparkEntry.queries.size}")
    assert(eager.map(_._1).contains("q23_dedup_keeper"))

    val jobs = new AtomicLong
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    // drain any in-flight events from earlier suites before counting
    Thread.sleep(200)
    spark.sparkContext.addSparkListener(listener)
    try {
      val before = jobs.get()
      val dfs = lazyQs.map { case (name, fn) => name -> fn(spark, sf0001) }
      Thread.sleep(500) // listener bus is async: give stray events time
      assert(jobs.get() == before,
        s"query construction fired ${jobs.get() - before} Spark job(s)")
      // the lazily-built plans still execute
      val (name, df) = dfs.head
      assert(df.count() >= 0, s"$name failed to execute")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
