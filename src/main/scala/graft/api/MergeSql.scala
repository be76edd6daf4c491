package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A `MERGE INTO` SQL-text entry point for [[UpsertStore]] — the
  * ergonomic surface Spark users expect from Delta/Iceberg MERGE
  * targets, routed to the engine's parquet-native bucketed store.
  *
  * Supported dialect (the CDC-upsert shape; clause order fixed):
  * {{{
  *   MERGE INTO '<storeDir>' [AS] t
  *   USING <tempViewName | '<parquetPath>'> [AS] s
  *   ON t.<key> = s.<key>
  *   [LATEST BY <versionCol>]
  *   [WHEN MATCHED AND <pred> THEN DELETE]
  *   WHEN MATCHED THEN UPDATE SET *
  *   WHEN NOT MATCHED THEN INSERT *
  * }}}
  *
  * The conditional-DELETE clause is the CDC tombstone: after version
  * arbitration, a source row matching `<pred>` (UNQUALIFIED source
  * column references, e.g. `op = 'D'`) removes its key instead of
  * upserting it — Debezium-style change feeds apply directly.
  *
  * Semantics are exactly [[UpsertStore.update]]: source rows override
  * stored rows per key; within the source batch the greatest
  * `LATEST BY` column wins. `LATEST BY` is this dialect's one
  * extension over ANSI — standard MERGE makes a duplicate-key source
  * an error, while CDC batches routinely carry several versions of a
  * key; `LATEST BY` names the column that arbitrates them (omitted, it
  * defaults to the join key itself, which is only meaningful when the
  * source is already unique per key). Everything runs under the store
  * writer lease with the applied-batch ledger, so a replayed MERGE
  * with the same `batchId` is a no-op.
  */
object MergeSql {

  final case class Stmt(
      targetDir: String,
      source: String,
      key: String,
      version: String,
      deleteWhere: Option[String] = None)

  private val re = (
    """(?is)\s*MERGE\s+INTO\s+'([^']+)'(?:\s+AS)?(?:\s+(\w+))?\s+""" +
      """USING\s+('[^']+'|[\w.]+)(?:\s+AS)?(?:\s+(\w+))?\s+""" +
      """ON\s+(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s+""" +
      """(?:LATEST\s+BY\s+(\w+)\s+)?""" +
      """(?:WHEN\s+MATCHED\s+AND\s+(.+?)\s+THEN\s+DELETE\s+)?""" +
      """WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*\s+""" +
      """WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*\s*;?\s*""").r

  /** Parse one MERGE statement of the supported dialect; throws with
    * the expected shape on any deviation (unsupported clause bodies
    * must fail loudly, never silently change semantics).
    */
  def parse(sql: String): Stmt = sql match {
    case re(dir, tAlias, src, sAlias, q1, c1, q2, c2, version, delWhere) =>
      val t = Option(tAlias).getOrElse("t")
      val s = Option(sAlias).getOrElse("s")
      val (tCol, sCol) =
        if (q1 == t && q2 == s) (c1, c2)
        else if (q1 == s && q2 == t) (c2, c1)
        else throw new IllegalArgumentException(
          s"MERGE ON clause qualifiers ($q1, $q2) do not match aliases ($t, $s)")
      if (tCol != sCol) throw new IllegalArgumentException(
        s"MERGE ON must equate the same column name on both sides ($tCol vs $sCol)")
      Stmt(dir, src, tCol, Option(version).getOrElse(tCol), Option(delWhere))
    case _ =>
      throw new IllegalArgumentException(
        "unsupported MERGE statement; expected: MERGE INTO '<dir>' [AS] t " +
          "USING <view|'<path>'> [AS] s ON t.<k> = s.<k> [LATEST BY <col>] " +
          "[WHEN MATCHED AND <pred> THEN DELETE] " +
          "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
  }

  private def sourceDf(spark: SparkSession, src: String): DataFrame =
    if (src.startsWith("'")) spark.read.parquet(src.stripPrefix("'").stripSuffix("'"))
    else spark.table(src)

  /** Execute one MERGE statement. Returns false when `batchId` is
    * already in the store's applied ledger (replay no-op).
    */
  def run(
      spark: SparkSession,
      sql: String,
      nBuckets: Int = UpsertStore.defaultBuckets,
      batchId: Option[String] = None,
      leaseStaleMs: Long = 600000L): Boolean = {
    val st = parse(sql)
    UpsertStore.update(
      sourceDf(spark, st.source), st.targetDir, st.key, st.version,
      nBuckets = nBuckets, batchId = batchId, leaseStaleMs = leaseStaleMs,
      deleteWhere = st.deleteWhere.map(org.apache.spark.sql.functions.expr))
  }

  private val delRe =
    """(?is)\s*DELETE\s+FROM\s+'([^']+)'\s+WHERE\s+(.+?)\s*;?\s*""".r

  /** Execute a `DELETE FROM '<storeDir>' WHERE <predicate>` statement
    * against an [[UpsertStore]] target — the second mutation-SQL verb
    * beside MERGE (the GDPR-erasure / retention-sweep shape). The
    * predicate is any Spark SQL boolean expression over the stored
    * columns. Returns rows removed (0 on a ledger replay).
    */
  def runDelete(
      spark: SparkSession,
      sql: String,
      batchId: Option[String] = None,
      leaseStaleMs: Long = 600000L): Long = sql match {
    case delRe(dir, pred) =>
      UpsertStore.delete(spark, dir,
        org.apache.spark.sql.functions.expr(pred), batchId, leaseStaleMs)
    case _ =>
      throw new IllegalArgumentException(
        "unsupported DELETE statement; expected: DELETE FROM '<dir>' WHERE <predicate>")
  }

  /** Read back a MERGE target (the store's current generation). */
  def readTarget(spark: SparkSession, dir: String): DataFrame =
    UpsertStore.read(spark, dir)
}
