package graft.core

import org.apache.spark.sql.SparkSession

/** Single place for engine session configuration so every entry point
  * (Bench, Verify, Profile, ConsumeApp, tests) runs the same tuned engine.
  *
  * Settings and the 100 TB rationale:
  *  - AQE OFF at this data scale, ON at cluster scale — a latency/adaptivity
  *    tradeoff that flips with data size, so it is configured per
  *    deployment like any Spark app. AQE executes a query stage-by-stage
  *    (each materialized shuffle is its own job) to buy re-planning
  *    opportunities: skew-join splits, runtime broadcast conversion,
  *    partition coalescing. At the test/bench scale there is nothing to
  *    re-plan — every post-shuffle partition is already below the advisory
  *    size and no join is skewed — so the stage-by-stage scheduling is pure
  *    fixed cost: measured across the 79-query suite at sf0.1 (local[32],
  *    unloaded), 39.9 s with AQE on vs 31.5 s off, ~0.11 s per query, with
  *    byte-identical results and zero adaptive plan changes. At 100 TB the
  *    same adaptivity is worth minutes per query (one skew split pays for
  *    every stage boundary of the day), so deployments flip
  *    `spark.sql.adaptive.enabled=true`; the engine's behavior under AQE
  *    stays covered (SkewSpec pins the skew split with AQE enabled, and
  *    `coalescePartitions.parallelismFirst=false` below keeps the
  *    production-recommended coalescing posture whenever AQE is on).
  *  - `shuffle.partitions` = cores as the static default;
  *    [[sizeShufflePartitionsFor]] re-sizes it to the DATA at hand for
  *    entry points that know their input (Bench, Verify). Reduce-task
  *    count is the other half of the AQE finding above: at sf0.1 every
  *    post-shuffle partition holds a few thousand rows, so 32 reduce
  *    tasks per exchange are dispatch overhead, not parallelism —
  *    re-measured at 28.5 s vs 34.1 s across the 86-pair suite just by
  *    sizing them to data (AQE's partition coalescing is the cluster-
  *    scale fix for exactly this; with AQE off at test scale the static
  *    rule recovers the same win without the stage-by-stage jobs).
  *  - Kryo serializer: faster broadcast/shuffle record serialization.
  *  - `locality.wait=0`: no executor topology in local mode; at cluster
  *    scale this would be left at default.
  *  - UTC session TZ + ANSI off: the determinism contract with the DuckDB
  *    oracle (FIXTURES.md §3) — hash-mixing arithmetic wraps 64-bit.
  *  - `legacy.parquet.nanosAsLong`: events.parquet carries TIMESTAMP(NANOS);
  *    Tables.events converts ns→µs explicitly.
  */
object Sessions {
  def builder(cores: String = "32"): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft-warehouse")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.locality.wait", "0s")
      .config("spark.sql.session.timeZone", "UTC")
      // fixture parquet writes timestamp[us] without the UTC flag; read
      // it as TIMESTAMP (LTZ, session tz UTC) — the same naive-as-UTC
      // reading DuckDB uses — instead of Spark 4's inferred NTZ, which
      // rejects unix_micros()/watermarks and breaks cross-engine equality
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  /** Size `spark.sql.shuffle.partitions` (a runtime conf) to the input
    * under `dataDir`: one reduce partition per ~32 MB of input, floored at
    * 8 (don't serialize tiny suites onto one task) and capped at the
    * session's core count (local mode: beyond-core partitions only buy
    * memory headroom, and the inputs here fit). The cap wins over the
    * floor: on a machine with fewer than 8 cores the result is the core
    * count. The 100 TB posture is the same rule at cluster constants —
    * size reducers to data, not to the machine — where AQE coalescing
    * applies it automatically. */
  def sizeShufflePartitionsFor(spark: SparkSession, dataDir: String): Int = {
    def bytes(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).map(bytes).sum
      else f.length()
    val cores = spark.sparkContext.defaultParallelism
    val n = math.min(cores.toLong, math.max(8L,
      bytes(new java.io.File(dataDir)) / (32L << 20) + 1)).toInt
    spark.conf.set("spark.sql.shuffle.partitions", n)
    n
  }

  def get(cores: String = "32"): SparkSession = {
    // Ad-hoc experiment hook: SPARK_GRAFT_EXTRA_CONF="k1=v1,k2=v2"
    val b = sys.env.get("SPARK_GRAFT_EXTRA_CONF").toSeq
      .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
      .map(_.split("=", 2))
      .foldLeft(builder(cores)) {
        case (bb, Array(k, v)) => bb.config(k, v)
        case (bb, other) =>
          System.err.println(s"[sessions] ignoring malformed conf entry '${other.mkString("=")}'")
          bb
      }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
