package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Dataset manifest / content fingerprint — SURVEY.md §2b Q41: an
  * order-invariant, partitioning-invariant content hash per dataset
  * slice, the primitive behind corpus versioning ("is the corpus byte-
  * identical to the one that trained run X?"), cross-cluster replication
  * checks, and cheap drift detection between pipeline stages that are
  * supposed to be row-preserving.
  *
  * Each row folds to one 60-bit integer (md5 of its concatenated fields —
  * the same cross-engine md5→bigint idiom as SampleOps/TextOps), and a
  * slice's fingerprint is the XOR of its row hashes: XOR is commutative/
  * associative with identity 0, so the fingerprint is independent of row
  * order, partition count, and aggregation tree shape — any single-row
  * change, insert, or delete flips it (a swap of two entire identical
  * rows is invisible, which is exactly the dedup-relevant semantics:
  * multisets differing only by duplicates of the SAME row collide only
  * in pairs).
  *
  * Plan shape: ONE scan, map-side partial XOR per partition, a
  * |groups|-row shuffle. At 100 TB the network moves one long per
  * (partition × group) — the cheapest possible whole-corpus integrity
  * check.
  */
object ManifestOps {

  /** 60-bit row hash of `cols` rendered as text and joined with a
    * U+0001 separator. NULLs encode positionally as a U+0002 sentinel —
    * concat_ws's skip-null would make (a, NULL, b) and (a, b, NULL)
    * collide, breaking the "any single-row change flips it" contract.
    * Exact types only (ints/strings/dates): float formatting differs
    * across engines. Residual documented collision: a VALUE that itself
    * contains the U+0001 separator at a field boundary, or that equals
    * the U+0002 sentinel, can alias a neighboring row shape; corpora
    * that may carry control chars should pre-strip them (the
    * TextOps normalize step does). */
  def rowHash(cols: Seq[Column]): Column =
    conv(substring(md5(to_binary(
      concat_ws("\u0001",
        cols.map(c => coalesce(c.cast("string"), lit("\u0002"))): _*),
      lit("utf-8"))),
      1, 15), 16, 10).cast("long")

  /** Per-group manifest of `df`: row count and order-invariant content
    * fingerprint over `cols`. */
  def manifest(df: DataFrame, groupBy: Seq[String],
      cols: Seq[String]): DataFrame =
    df.groupBy(groupBy.map(col): _*)
      .agg(count(lit(1)).as("n"),
        expr(s"bit_xor(${manifestHashSql(cols)})").as("fingerprint"))

  private def manifestHashSql(cols: Seq[String]): String = {
    // the SQL-text twin of rowHash, so `manifest` stays expression-only
    val concat = cols
      .map(c => s"coalesce(cast($c as string), '\\u0002')")
      .mkString("concat_ws('\\u0001', ", ", ", ")")
    s"cast(conv(substring(md5(to_binary($concat, 'utf-8')), 1, 15), 16, 10) as bigint)"
  }

  /** q41 registry entry: the documents corpus manifest per source —
    * count + content fingerprint over every exact-typed column. */
  def documentsManifest(docs: DataFrame): DataFrame =
    manifest(docs, Seq("source"),
      Seq("doc_id", "text", "lang", "n_chars"))
      .orderBy("source")

  val q41ManifestSql: String =
    """SELECT source, count(*) AS n,
      |  bit_xor(CAST(('0x' || substring(md5(
      |    concat_ws(chr(1),
      |      coalesce(CAST(doc_id AS VARCHAR), chr(2)),
      |      coalesce(text, chr(2)), coalesce(lang, chr(2)),
      |      coalesce(CAST(n_chars AS VARCHAR), chr(2)))),
      |    1, 15)) AS BIGINT))
      |    AS fingerprint
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  type QFn = (SparkSession, String) => DataFrame
  val all: Seq[(String, QFn, Option[String])] = Seq(
    ("q41_manifest",
      (s: SparkSession, d: String) => documentsManifest(Tables.documents(s, d)),
      Some(q41ManifestSql)))
}
