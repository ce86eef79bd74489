package graft.core

import org.apache.spark.sql.SparkSession

/** Single place for engine session configuration so every entry point
  * (Bench, Verify, Profile, ConsumeApp, tests) runs the same tuned engine.
  *
  * Settings and the 100 TB rationale:
  *  - AQE on (Spark default) with `coalescePartitions.parallelismFirst=false`:
  *    respect the advisory partition size instead of fanning every tiny
  *    post-shuffle stage out to one partition per core — the configuration
  *    the Spark docs recommend for production. At cluster scale it right-sizes
  *    reducers; at test scale it stops 1 ms tasks from dominating latency.
  *  - `shuffle.partitions` = cores here; a real deployment sizes this (or
  *    lets AQE's initialPartitionNum handle it) to data volume.
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
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft-warehouse")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.locality.wait", "0s")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

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
