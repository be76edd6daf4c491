package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, lit, max}

/** The mutation-SQL surface for [[UpsertStore]] — MERGE / DELETE /
  * UPDATE statements over the engine's parquet-native bucketed store,
  * the ergonomic triad Spark users expect from Delta/Iceberg targets.
  *
  * Supported MERGE dialect (the CDC-upsert shape; clause order fixed):
  * {{{
  *   MERGE INTO '<storeDir>' [AS] t
  *   USING <tempViewName | '<parquetPath>'> [AS] s
  *   ON t.<key> = s.<key>
  *   [LATEST BY <versionCol>]
  *   [WHEN MATCHED AND <pred> THEN DELETE]
  *   WHEN MATCHED THEN UPDATE SET *
  *   WHEN NOT MATCHED THEN INSERT *
  *   [WHEN NOT MATCHED BY SOURCE [AND <pred>] THEN UPDATE SET col = expr, ...]
  *   [WHEN NOT MATCHED BY SOURCE [AND <pred>] THEN DELETE]
  * }}}
  *
  * The conditional matched-DELETE clause is the CDC tombstone: after
  * version arbitration, a source row matching `<pred>` (UNQUALIFIED
  * source column references, e.g. `op = 'D'`) removes its key instead
  * of upserting it — Debezium-style change feeds apply directly.
  *
  * The NOT MATCHED BY SOURCE clauses are the full-sync family, over
  * stored rows whose key is absent from the source batch (predicates
  * and assignments reference UNQUALIFIED target columns): the UPDATE
  * arm applies its assignments to matching rows (flag stale rows —
  * right-hand sides see the PRE-update row, ANSI), the DELETE arm
  * removes them ("make the store equal the snapshot"); where both
  * match, UPDATE wins (first-match-wins in the fixed clause order).
  * Either form inherently examines every bucket — reserve them for
  * genuine full-snapshot sources (the examination is O(1) Spark jobs,
  * and only buckets that actually change rewrite).
  *
  * Semantics are exactly [[UpsertStore.update]]: source rows override
  * stored rows per key; within the source batch the greatest
  * `LATEST BY` column wins. `LATEST BY` is this dialect's one
  * extension over ANSI — standard MERGE makes a duplicate-key source
  * an error, while CDC batches routinely carry several versions of a
  * key; `LATEST BY` names the column that arbitrates them (omitted, it
  * defaults to the join key itself, which is only meaningful when the
  * source is already unique per key).
  *
  * ANSI deviations beyond LATEST BY — read before assuming standard
  * MERGE behavior:
  *  - A source row matching the `WHEN MATCHED AND <pred> THEN DELETE`
  *    predicate whose key is ABSENT from the target is DROPPED
  *    entirely; ANSI would route it to `WHEN NOT MATCHED THEN INSERT`.
  *    This is deliberate: the clause marks CDC tombstones, and a
  *    tombstone for a never-seen key must not resurrect it as an
  *    insert on replay.
  *  - The clause list is fixed-order and `UPDATE SET * / INSERT *`
  *    only — per-column assignment lists belong to the UPDATE verb.
  *
  * Everything runs under the store writer lease with the applied-batch
  * ledger, so a replayed statement with the same `batchId` is a no-op.
  */
object MergeSql {

  final case class Stmt(
      targetDir: String,
      source: String,
      key: String,
      version: String,
      deleteWhere: Option[String] = None,
      notMatchedBySourceDelete: Option[String] = None,
      notMatchedBySourceUpdate: Option[(String, String)] = None)

  private val re = (
    """(?is)\s*MERGE\s+INTO\s+'([^']+)'(?:\s+AS)?(?:\s+(\w+))?\s+""" +
      """USING\s+('[^']+'|[\w.]+)(?:\s+AS)?(?:\s+(\w+))?\s+""" +
      """ON\s+(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s+""" +
      """(?:LATEST\s+BY\s+(\w+)\s+)?""" +
      """(?:WHEN\s+MATCHED\s+AND\s+(.+?)\s+THEN\s+DELETE\s+)?""" +
      """WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*\s+""" +
      """WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*""" +
      """(?:\s+WHEN\s+NOT\s+MATCHED\s+BY\s+SOURCE""" +
      """(?:\s+AND\s+(.+?))?\s+THEN\s+UPDATE\s+SET\s+(.+?))?""" +
      """(?:\s+WHEN\s+NOT\s+MATCHED\s+BY\s+SOURCE""" +
      """(?:\s+AND\s+(.+?))?\s+THEN\s+DELETE)?\s*;?\s*""").r

  /** Parse one MERGE statement of the supported dialect; throws with
    * the expected shape on any deviation (unsupported clause bodies
    * must fail loudly, never silently change semantics).
    */
  def parse(sql: String): Stmt = sql match {
    case re(dir, tAlias, src, sAlias, q1, c1, q2, c2, version, delWhere,
        syncUpdWhere, syncUpdSet, syncWhere) =>
      val t = Option(tAlias).getOrElse("t")
      val s = Option(sAlias).getOrElse("s")
      val (tCol, sCol) =
        if (q1 == t && q2 == s) (c1, c2)
        else if (q1 == s && q2 == t) (c2, c1)
        else throw new IllegalArgumentException(
          s"MERGE ON clause qualifiers ($q1, $q2) do not match aliases ($t, $s)")
      if (tCol != sCol) throw new IllegalArgumentException(
        s"MERGE ON must equate the same column name on both sides ($tCol vs $sCol)")
      // the unconditional full-sync clause parses with a null predicate —
      // re-probe the text to tell "clause absent" from "present, no AND"
      val sync = Option(syncWhere).orElse(
        if ("(?is).*WHEN\\s+NOT\\s+MATCHED\\s+BY\\s+SOURCE\\s+THEN\\s+DELETE.*"
              .r.matches(sql)) Some("true")
        else None)
      // UPDATE arm: the SET list group is the presence marker (absent
      // clause ⇒ null); a missing AND means unconditional
      val syncUpd = Option(syncUpdSet).map(set =>
        (Option(syncUpdWhere).getOrElse("true"), set))
      Stmt(dir, src, tCol, Option(version).getOrElse(tCol),
        Option(delWhere), sync, syncUpd)
    case _ =>
      throw new IllegalArgumentException(
        "unsupported MERGE statement; expected: MERGE INTO '<dir>' [AS] t " +
          "USING <view|'<path>'> [AS] s ON t.<k> = s.<k> [LATEST BY <col>] " +
          "[WHEN MATCHED AND <pred> THEN DELETE] " +
          "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT * " +
          "[WHEN NOT MATCHED BY SOURCE [AND <pred>] THEN UPDATE SET col = expr, ...] " +
          "[WHEN NOT MATCHED BY SOURCE [AND <pred>] THEN DELETE]")
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
      deleteWhere = st.deleteWhere.map(expr),
      notMatchedBySourceDelete = st.notMatchedBySourceDelete.map(expr),
      notMatchedBySourceUpdate = st.notMatchedBySourceUpdate.map {
        case (pred, set) =>
          (expr(pred), splitAssignments(set).map { case (c, e) => c -> expr(e) })
      })
  }

  private val delRe =
    """(?is)\s*DELETE\s+FROM\s+'([^']+)'\s+WHERE\s+(.+?)\s*;?\s*""".r

  /** Execute a `DELETE FROM '<storeDir>' WHERE <predicate>` statement
    * against an [[UpsertStore]] target — the GDPR-erasure /
    * retention-sweep shape. The predicate is any Spark SQL boolean
    * expression over the stored columns. Returns rows removed (0 on a
    * ledger replay).
    */
  def runDelete(
      spark: SparkSession,
      sql: String,
      batchId: Option[String] = None,
      leaseStaleMs: Long = 600000L): Long = sql match {
    case delRe(dir, pred) =>
      UpsertStore.delete(spark, dir, expr(pred), batchId, leaseStaleMs)
    case _ =>
      throw new IllegalArgumentException(
        "unsupported DELETE statement; expected: DELETE FROM '<dir>' WHERE <predicate>")
  }

  private val updRe =
    """(?is)\s*UPDATE\s+'([^']+)'\s+SET\s+(.+?)(?:\s+WHERE\s+(.+?))?\s*;?\s*$""".r

  /** Execute an `UPDATE '<storeDir>' SET col = expr [, col = expr]*
    * [WHERE <predicate>]` statement — the third DML verb. Assignment
    * right-hand sides are Spark SQL expressions evaluated against the
    * PRE-UPDATE row (ANSI UPDATE semantics); a missing WHERE updates
    * every row; a NULL predicate leaves the row untouched. Only
    * buckets containing matches are rewritten, under lease + ledger.
    * Returns rows updated (0 on a ledger replay).
    */
  def runUpdate(
      spark: SparkSession,
      sql: String,
      batchId: Option[String] = None,
      leaseStaleMs: Long = 600000L): Long = sql match {
    case updRe(dir, setList, where) =>
      UpsertStore.updateRows(spark, dir,
        splitAssignments(setList).map { case (c, e) => c -> expr(e) },
        Option(where).map(expr).getOrElse(lit(true)),
        batchId, leaseStaleMs)
    case _ =>
      throw new IllegalArgumentException(
        "unsupported UPDATE statement; expected: " +
          "UPDATE '<dir>' SET col = expr [, col = expr]* [WHERE <predicate>]")
  }

  /** Split a SET list on top-level commas only: assignment expressions
    * may carry commas inside function calls AND inside string literals
    * (`SET note = 'a,b'`), so the scanner tracks single-quote state
    * beside paren/bracket depth — separators and brackets inside a
    * quoted literal are content, not structure. SQL's doubled-quote
    * escape (`''`) falls out of plain toggling: the closing quote and
    * the immediate reopen cancel for splitting purposes.
    */
  private[graft] def splitAssignments(s: String): Seq[(String, String)] = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    var inQuote = false
    val cur = new StringBuilder
    s.foreach {
      case c @ '\'' => inQuote = !inQuote; cur += c
      case c if inQuote => cur += c
      case c @ ('(' | '[') => depth += 1; cur += c
      case c @ (')' | ']') => depth -= 1; cur += c
      case ',' if depth == 0 => parts += cur.result(); cur.clear()
      case c => cur += c
    }
    require(!inQuote, s"unterminated string literal in SET list: $s")
    parts += cur.result()
    val asg = """(?s)\s*(\w+)\s*=\s*(.+?)\s*""".r
    parts.toSeq.map {
      case asg(c, e) => c -> e
      case bad => throw new IllegalArgumentException(
        s"malformed SET assignment: '$bad' (expected col = expr)")
    }
  }

  /** Read back a MERGE target — the current table, a `versionAsOf`
    * commit-seq snapshot, or a `timestampAsOf` wall-clock snapshot
    * (epoch millis, resolved through the commit log's `ts_ms`).
    */
  def readTarget(
      spark: SparkSession,
      dir: String,
      versionAsOf: Option[Long] = None,
      timestampAsOf: Option[Long] = None): DataFrame =
    (versionAsOf, timestampAsOf) match {
      case (Some(_), Some(_)) => throw new IllegalArgumentException(
        "readTarget: VERSION AS OF and TIMESTAMP AS OF are mutually exclusive")
      case (Some(seq), None) => UpsertStore.readAsOf(spark, dir, seq)
      case (None, Some(ts)) => UpsertStore.readAsOfTime(spark, dir, ts)
      case (None, None) => UpsertStore.read(spark, dir)
    }

  private val selRe = ("""(?is)\s*SELECT\s+\*\s+FROM\s+'([^']+)'""" +
    """(?:\s+VERSION\s+AS\s+OF\s+(\d+)|\s+TIMESTAMP\s+AS\s+OF\s+('[^']+'|\d+))?""" +
    """\s*;?\s*""").r

  /** The read-back statement, completing the SQL-text time-travel
    * surface: `SELECT * FROM '<dir>'` with optional
    * `VERSION AS OF <seq>` or `TIMESTAMP AS OF '<ts>'` — the
    * wall-clock form is what analysts actually type. The timestamp
    * literal is `yyyy-MM-dd HH:mm:ss[.SSS]` interpreted as UTC (the
    * engine's session timezone), or raw epoch millis.
    */
  def runSelect(spark: SparkSession, sql: String): DataFrame = sql match {
    case selRe(dir, ver, ts) =>
      readTarget(spark, dir,
        versionAsOf = Option(ver).map(_.toLong),
        timestampAsOf = Option(ts).map(parseTsMs))
    case _ =>
      throw new IllegalArgumentException(
        "unsupported SELECT statement; expected: SELECT * FROM '<dir>' " +
          "[VERSION AS OF <seq> | TIMESTAMP AS OF '<yyyy-MM-dd HH:mm:ss[.SSS]>' " +
          "| TIMESTAMP AS OF <epoch_millis>]")
  }

  private def parseTsMs(lit: String): Long =
    if (!lit.startsWith("'")) lit.toLong
    else {
      val s = lit.stripPrefix("'").stripSuffix("'")
      val fmt = new java.time.format.DateTimeFormatterBuilder()
        .appendPattern("yyyy-MM-dd HH:mm:ss")
        .optionalStart()
        .appendFraction(java.time.temporal.ChronoField.NANO_OF_SECOND, 1, 9, true)
        .optionalEnd()
        .toFormatter()
      java.time.LocalDateTime.parse(s, fmt)
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    }

  private val descRe = """(?is)\s*DESCRIBE\s+'([^']+)'\s*;?\s*""".r

  /** `DESCRIBE '<dir>'` — the table's catalog card as rows of
    * (name, value): layout properties (bucket modulus, retention
    * horizon, head seq), every column with its type (from the
    * meta-recorded schema — no data read), and every CHECK constraint.
    * Ordered: properties, then columns in schema order, then
    * constraints by name.
    */
  def runDescribe(spark: SparkSession, sql: String): DataFrame = sql match {
    case descRe(dir) =>
      import spark.implicits._
      val props = Seq(
        "n_buckets" -> UpsertStore.buckets(spark, dir).toString,
        "base_seq" -> UpsertStore.baseSeq(spark, dir).toString,
        "snapshot_seq" -> UpsertStore.snapshotSeq(spark, dir).toString)
      val cols = UpsertStore.tableSchema(spark, dir).fields.toSeq
        .map(f => s"col:${f.name}" -> f.dataType.simpleString)
      val cons = UpsertStore.constraints(spark, dir)
        .map { case (n, ck) => s"constraint:$n" -> ck }
      (props ++ cols ++ cons).toDF("name", "value")
    case _ =>
      throw new IllegalArgumentException(
        "unsupported DESCRIBE statement; expected: DESCRIBE '<dir>'")
  }

  private val optRe =
    """(?is)\s*OPTIMIZE\s+'([^']+)'(?:\s+ZORDER\s+BY\s+\(([^)]+)\))?\s*;?\s*""".r
  private val vacRe =
    """(?is)\s*VACUUM\s+'([^']+)'\s+RETAIN\s+(\d+)\s+COMMITS\s*;?\s*""".r
  private val rstRe = ("""(?is)\s*RESTORE\s+'([^']+)'\s+TO\s+""" +
    """(?:VERSION\s+AS\s+OF\s+(\d+)|TIMESTAMP\s+AS\s+OF\s+('[^']+'|\d+))\s*;?\s*""").r
  private val clnRe = ("""(?is)\s*CLONE\s+'([^']+)'\s+TO\s+'([^']+)'""" +
    """(?:\s+VERSION\s+AS\s+OF\s+(\d+))?\s*;?\s*""").r
  private val addConRe = ("""(?is)\s*ALTER\s+'([^']+)'\s+ADD\s+CONSTRAINT\s+""" +
    """(\w+)\s+CHECK\s*\((.+)\)\s*;?\s*""").r
  private val dropConRe =
    """(?is)\s*ALTER\s+'([^']+)'\s+DROP\s+CONSTRAINT\s+(\w+)\s*;?\s*""".r
  private val anlRe = """(?is)\s*ANALYZE\s+'([^']+)'\s*;?\s*""".r

  /** Maintenance verbs over a store target, completing the SQL-text
    * surface beside MERGE/DELETE/UPDATE:
    * `OPTIMIZE '<dir>' [ZORDER BY (col, ...)]` — small-file compaction,
    * optionally z-order-clustering every bucket on the named columns
    * while it rewrites ([[UpsertStore.optimize]]; returns buckets
    * rewritten), and
    * `VACUUM '<dir>' RETAIN <n> COMMITS` — keep-N history retention
    * ([[UpsertStore.retain]] then [[StoreIO.vacuum]] for crash debris;
    * returns the new reconstruction horizon `base_seq`),
    * `RESTORE '<dir>' TO VERSION AS OF <n> | TO TIMESTAMP AS OF <ts>` —
    * undo to a retained state as one new commit
    * ([[UpsertStore.restore]]; returns the new head seq), and
    * `CLONE '<src>' TO '<dst>' [VERSION AS OF <n>]` — deep clone into a
    * new store ([[UpsertStore.cloneStore]]; returns the cloned version).
    */
  def runMaintenance(spark: SparkSession, sql: String): Long = sql match {
    case optRe(dir, zcols) =>
      UpsertStore.optimize(spark, dir,
        zorderBy = Option(zcols).toSeq
          .flatMap(_.split(',').map(_.trim).filter(_.nonEmpty))).toLong
    case vacRe(dir, n) =>
      UpsertStore.retain(spark, dir, n.toInt)
      StoreIO.vacuum(spark, dir): Unit
      UpsertStore.baseSeq(spark, dir)
    case rstRe(dir, ver, ts) =>
      val seq = Option(ver).map(_.toLong).getOrElse {
        val tsMs = parseTsMs(ts)
        val at = UpsertStore.commits(spark, dir)
          .where(col("ts_ms") <= tsMs).agg(max("seq")).head()
        require(!at.isNullAt(0),
          s"store $dir has no commit at or before ts $tsMs")
        at.getLong(0)
      }
      UpsertStore.restore(spark, dir, seq)
    case clnRe(src, dst, ver) =>
      UpsertStore.cloneStore(spark, src, dst, Option(ver).map(_.toLong))
    case addConRe(dir, name, check) =>
      UpsertStore.addConstraint(spark, dir, name, check)
      UpsertStore.constraints(spark, dir).size.toLong
    case dropConRe(dir, name) =>
      UpsertStore.dropConstraint(spark, dir, name)
      UpsertStore.constraints(spark, dir).size.toLong
    case anlRe(dir) =>
      UpsertStore.analyze(spark, dir).toLong
    case _ =>
      throw new IllegalArgumentException(
        "unsupported maintenance statement; expected: " +
          "OPTIMIZE '<dir>' [ZORDER BY (col, ...)] | " +
          "VACUUM '<dir>' RETAIN <n> COMMITS | " +
          "RESTORE '<dir>' TO VERSION AS OF <n> | " +
          "RESTORE '<dir>' TO TIMESTAMP AS OF <ts> | " +
          "CLONE '<src>' TO '<dst>' [VERSION AS OF <n>] | " +
          "ALTER '<dir>' ADD CONSTRAINT <name> CHECK (<expr>) | " +
          "ALTER '<dir>' DROP CONSTRAINT <name> | " +
          "ANALYZE '<dir>'")
  }
}
