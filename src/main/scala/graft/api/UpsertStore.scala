package graft.api

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Persistent key-bucketed upsert table — the parquet-native stand-in
  * for a MERGE INTO target (Delta/Iceberg) that stays DELTA-SIZED per
  * merge: keys hash into `nBuckets` fixed buckets, a micro-batch
  * rewrites ONLY the buckets its keys land in, and (since round 11)
  * every bucket rewrite lands as a NEW IMMUTABLE GENERATION directory
  * `b<k>/g<seq>` named by the commit that produced it, with a commit
  * log at `<dir>/commits`. That layout buys four things the round-9/10
  * rename-swap layout could not:
  *
  *  - **Atomic publish, no retire window.** A generation becomes
  *    visible through ONE rename of a finished staged write; there is
  *    no retire-promote-delete dance and no `<bucket>-old` crash
  *    fallback to consult — readers listing a bucket see only complete
  *    generations.
  *  - **Snapshot isolation for readers.** [[read]] serves each
  *    bucket's newest generation (torn only ACROSS buckets while a
  *    commit is mid-publish, same as before), but
  *    `readAsOf(snapshotSeq(dir))` is a fully consistent snapshot:
  *    the commit log only advances after every touched bucket has
  *    landed, so the max committed seq never names a half-published
  *    state.
  *  - **Time travel.** [[readAsOf]] reconstructs the table at any
  *    retained commit: per bucket, the newest generation `<= seq`
  *    (a bucket first touched later contributes nothing — it was
  *    empty then). [[readAsOfTime]] resolves a wall-clock instant
  *    through the commit log's timestamps first.
  *  - **Keep-N retention instead of unconditional vacuuming.**
  *    [[retain]] (also run inline by every update via
  *    `retainCommits`) drops only generations not needed to
  *    reconstruct the newest N commits, and records the horizon in
  *    `meta.base_seq` so a time travel below it fails loudly instead
  *    of silently returning a partial table.
  *
  * Merge semantics (unchanged): batch rows override stored rows per
  * key; within a batch the greatest `versionCol` wins (ties broken
  * deterministically via row_number on version desc). Schema
  * EVOLUTION is supported end-to-end: a batch may add columns (old
  * generations are read with parquet schema merging and surface NULL
  * for them) — see `core_store_schema_evolution`.
  *
  * Crash windows (all converge under foreachBatch replay):
  *  - mid-publish within a commit: some buckets carry `g<seq>`, some
  *    don't; the commit log was not advanced, so the replay recomputes
  *    the SAME seq and re-publishes every touched bucket (the merge is
  *    idempotent per key — deleting a half-written `g<seq>` before the
  *    rename makes the overwrite safe).
  *  - there is NO commit-vs-ledger gap: the commit log line carries the
  *    batch id, so the replay check and the commit record are one
  *    atomic metadata append.
  *
  * At 100 TB: pick `nBuckets` so a bucket is a few GB (the unit of
  * rewrite); the touched-bucket read is a path-pruned scan, never a
  * table scan, and untouched buckets are not even listed. Retention
  * bounds the generation count per bucket, so listings stay
  * O(nBuckets x retainCommits) in the worst case and O(nBuckets + a
  * few) in the steady state.
  */
object UpsertStore {

  val defaultBuckets = 32

  /** Commits kept reconstructable by default — every update prunes
    * generations older than the newest `retainCommits` commits, so a
    * long-running CDC sink does not accumulate unbounded history.
    * Pass `Int.MaxValue` to keep everything (audit stores).
    */
  val defaultRetain = 16

  private def bucketExpr(key: String, n: Int) =
    pmod(xxhash64(col(key)), lit(n.toLong)).cast("int")

  private def bucketDir(dir: String, b: Int): String = s"$dir/b$b"

  private def genName(seq: Long): String = f"g$seq%012d"

  private def hp(s: String) = new org.apache.hadoop.fs.Path(s)

  /** Root resolution with the rebucket crash-window fallback: rebucket
    * publishes a whole new store layout with ONE root swap; a crash
    * between its two renames leaves the complete old store at
    * `<dir>-old`. Readers must consult it — `<dir>` may even EXIST yet
    * be empty (a concurrent lease acquisition mkdirs the root), so the
    * probe is for the meta file, not the directory.
    */
  private def rootOf(spark: SparkSession, dir: String): String = {
    val f = StoreIO.fs(spark, dir)
    def hasMeta(d: String) = f.exists(hp(s"$d/meta.json"))
    if (!hasMeta(dir) && hasMeta(s"$dir-old")) s"$dir-old" else dir
  }

  // Store METADATA lives in small JSON files read/written driver-side
  // (StoreIO.readSmall / writeSmallAtomic) — the Iceberg/Delta posture.
  // Going through parquet + Spark jobs for a 1-row meta and a
  // few-hundred-row commit log cost 3-5 scheduler round-trips PER
  // COMMIT and one per store READ; at 100 TB metadata latency gates
  // micro-batch cadence, not data throughput.

  private final case class Meta(nBuckets: Int, baseSeq: Long)

  private val jackson = new com.fasterxml.jackson.databind.ObjectMapper()

  private def jstr(s: String): String = jackson.writeValueAsString(s)

  private def metaOf(spark: SparkSession, root: String): Meta = {
    val txt = StoreIO.readSmall(spark, s"$root/meta.json").getOrElse(
      sys.error(s"upsert store $root has no meta.json"))
    val n = jackson.readTree(txt)
    Meta(n.get("n_buckets").asInt(), n.get("base_seq").asLong())
  }

  private def writeMeta(spark: SparkSession, root: String, m: Meta): Unit =
    StoreIO.writeSmallAtomic(spark, s"$root/meta.json",
      s"""{"n_buckets":${m.nBuckets},"base_seq":${m.baseSeq}}""")

  /** Stored bucket count (meta is written once at bootstrap, so every
    * later batch agrees on the hash modulus whatever the caller says).
    */
  def buckets(spark: SparkSession, dir: String): Int =
    metaOf(spark, rootOf(spark, dir)).nBuckets

  /** Oldest commit still reconstructable by [[readAsOf]] — advanced by
    * retention and by [[rebucket]] (which compacts history into one
    * full generation).
    */
  def baseSeq(spark: SparkSession, dir: String): Long =
    metaOf(spark, rootOf(spark, dir)).baseSeq

  def exists(spark: SparkSession, dir: String): Boolean =
    StoreIO.exists(spark, s"${rootOf(spark, dir)}/meta.json")

  private val commitsSchema = StructType(Seq(
    StructField("seq", LongType), StructField("batch_id", StringType),
    StructField("kind", StringType), StructField("ts_ms", LongType)))

  private final case class Commit(
      seq: Long, batchId: Option[String], kind: String, tsMs: Long)

  /** The commit log as JSON lines (newest last). */
  private def commitLog(spark: SparkSession, root: String): Seq[Commit] =
    StoreIO.readSmall(spark, s"$root/commits.json").toSeq
      .flatMap(_.split('\n')).filter(_.nonEmpty).map { line =>
        val n = jackson.readTree(line)
        Commit(n.get("seq").asLong(),
          Option(n.get("batch_id")).filterNot(_.isNull).map(_.asText()),
          n.get("kind").asText(), n.get("ts_ms").asLong())
      }

  /** The commit log: (seq, batch_id, kind, ts_ms), one row per
    * state-changing commit (merge / delete / update / rebucket).
    */
  def commits(spark: SparkSession, dir: String): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(commitLog(spark, rootOf(spark, dir)).map(c =>
        Row(c.seq, c.batchId.orNull, c.kind, c.tsMs)): _*),
      commitsSchema)

  /** Newest committed seq — `readAsOf(snapshotSeq(dir))` is the
    * torn-proof consistent read (the log advances only after every
    * touched bucket's generation has landed).
    */
  def snapshotSeq(spark: SparkSession, dir: String): Long = {
    val root = rootOf(spark, dir)
    val log = commitLog(spark, root)
    if (log.isEmpty) metaOf(spark, root).baseSeq else log.map(_.seq).max
  }

  private def recordCommit(
      spark: SparkSession, root: String, seq: Long,
      batchId: Option[String], kind: String): Unit = {
    val prev = StoreIO.readSmall(spark, s"$root/commits.json").getOrElse("")
    val line = s"""{"seq":$seq,"batch_id":${batchId.map(jstr).getOrElse("null")},""" +
      s""""kind":${jstr(kind)},"ts_ms":${System.currentTimeMillis()}}"""
    StoreIO.writeSmallAtomic(spark, s"$root/commits.json",
      if (prev.isEmpty) line + "\n" else prev + line + "\n")
  }

  /** The commit log IS the applied-batch ledger: `batch_id` rides every
    * commit line, so the replay check and the commit record are ONE
    * atomic metadata append — there is no commit-log-vs-ledger crash
    * gap, and the check costs an FS read, not a Spark job. Mutations
    * that change nothing still commit (an empty line, no generations)
    * when a batchId is present, so their replays stay exact no-ops.
    */
  private def appliedInLog(
      spark: SparkSession, root: String, batchId: String): Boolean =
    commitLog(spark, root).exists(_.batchId.contains(batchId))

  /** All generations of one bucket: (seq, path), unsorted. */
  private def genList(
      f: org.apache.hadoop.fs.FileSystem,
      bdir: String): Seq[(Long, String)] =
    if (!f.exists(hp(bdir))) Seq.empty
    else f.listStatus(hp(bdir)).toSeq.filter(_.isDirectory).flatMap { st =>
      val n = st.getPath.getName
      if (n.length == 13 && n.head == 'g' && n.drop(1).forall(_.isDigit))
        Some(n.drop(1).toLong -> st.getPath.toString)
      else None
    }

  /** Per-bucket newest-generation-`<= seq`, the reconstruction rule. */
  private def pathsAt(
      spark: SparkSession, root: String, seq: Long): Seq[String] = {
    val n = buckets(spark, root)
    val f = StoreIO.fs(spark, root)
    (0 until n).flatMap { b =>
      val gens = genList(f, bucketDir(root, b)).filter(_._1 <= seq)
      if (gens.isEmpty) None else Some(gens.maxBy(_._1)._2)
    }
  }

  private def readAt(spark: SparkSession, dir: String, seq: Long): DataFrame = {
    val root = rootOf(spark, dir)
    val paths = pathsAt(spark, root, seq)
    require(paths.nonEmpty, s"upsert store $dir has no generations at seq $seq")
    // mergeSchema: generations written before a schema-evolving batch
    // lack its columns; the merged read surfaces them as NULL
    spark.read.option("mergeSchema", "true").parquet(paths: _*)
  }

  /** The current table: one path-pruned multi-path read over the
    * newest generation of every non-empty bucket.
    */
  def read(spark: SparkSession, dir: String): DataFrame =
    readAt(spark, dir, Long.MaxValue)

  /** The table as of commit `seq` (inclusive). Fails loudly when the
    * history below `seq` has been retired by retention or rebucket —
    * a silent partial reconstruction would be a wrong answer.
    */
  def readAsOf(spark: SparkSession, dir: String, seq: Long): DataFrame = {
    val base = baseSeq(spark, dir)
    require(seq >= base,
      s"store $dir retains history from commit $base; asked for $seq")
    readAt(spark, dir, seq)
  }

  /** The table as of a wall-clock instant, resolved through the commit
    * log's `ts_ms` (the newest commit at-or-before `tsMs`).
    */
  def readAsOfTime(spark: SparkSession, dir: String, tsMs: Long): DataFrame = {
    val root = rootOf(spark, dir)
    val at = commitLog(spark, root).filter(_.tsMs <= tsMs)
    require(at.nonEmpty, s"store $dir has no commit at or before ts $tsMs")
    readAsOf(spark, root, at.map(_.seq).max)
  }

  /** Merge one batch. Returns false when `batchId` is already in the
    * applied ledger (a foreachBatch redelivery) — nothing is touched.
    * The whole read-modify-write runs under the store writer lease
    * (StoreIO.withLease): a concurrent distinct-batch writer raises
    * LeaseHeldException instead of silently last-write-winning a
    * bucket generation.
    *
    * `deleteWhere` is the CDC-tombstone clause (MERGE's `WHEN MATCHED
    * AND <pred> THEN DELETE`): after the per-key version arbitration, a
    * batch row matching the predicate REMOVES its key from the store
    * instead of upserting it (a NULL predicate upserts — SQL
    * three-valued semantics). Tombstones ride the same bucket routing;
    * a tombstone for an absent key is a no-op.
    *
    * `notMatchedBySourceDelete` is MERGE's full-sync clause (`WHEN NOT
    * MATCHED BY SOURCE [AND <pred>] THEN DELETE`): stored rows whose
    * key is ABSENT from the batch and that match the predicate
    * (`lit(true)` for the unconditional form) are removed. Unlike the
    * delta path this inherently visits EVERY bucket — unmatched rows
    * can live anywhere — so reserve it for genuine full-snapshot
    * sources; each untouched bucket pays one scan and is rewritten
    * only if it actually loses rows.
    *
    * `retainCommits` bounds history growth inline (see
    * [[defaultRetain]]); pass `Int.MaxValue` to keep all generations.
    */
  def update(
      batch: DataFrame,
      dir: String,
      key: String,
      versionCol: String,
      nBuckets: Int = defaultBuckets,
      batchId: Option[String] = None,
      leaseStaleMs: Long = 600000L,
      deleteWhere: Option[org.apache.spark.sql.Column] = None,
      notMatchedBySourceDelete: Option[org.apache.spark.sql.Column] = None,
      retainCommits: Int = defaultRetain): Boolean =
    StoreIO.withLease(batch.sparkSession, dir, leaseStaleMs) {
      updateLocked(batch, dir, key, versionCol, nBuckets, batchId,
        deleteWhere, notMatchedBySourceDelete, retainCommits)
    }

  /** Delete every stored row matching `predicate` (SQL DELETE
    * semantics: a NULL predicate keeps the row). Runs under the writer
    * lease with the applied-batch ledger, so a replayed delete is a
    * no-op. Work is per-bucket: each bucket's newest generation is
    * read once, and only buckets that actually contain matches gain a
    * new generation. Returns the number of rows removed (0 on a
    * ledger replay).
    */
  def delete(
      spark: SparkSession,
      dir: String,
      predicate: org.apache.spark.sql.Column,
      batchId: Option[String] = None,
      leaseStaleMs: Long = 600000L): Long =
    StoreIO.withLease(spark, dir, leaseStaleMs) {
      val root = rootOf(spark, dir)
      if (batchId.exists(appliedInLog(spark, root, _))) 0L
      else {
        val hit = coalesce(predicate, lit(false))
        rewriteBuckets(spark, root, "delete", batchId) {
          cur => (cur.where(hit).count(), cur.where(!hit))
        }
      }
    }

  /** SQL UPDATE: rewrite rows matching `predicate` with the `set`
    * assignments (column -> expression over the OLD row — every
    * right-hand side sees pre-update values, per ANSI). NULL predicate
    * leaves the row untouched. Per-bucket work like [[delete]]: only
    * buckets containing matches gain a generation. Returns rows
    * updated (0 on a ledger replay).
    */
  def updateRows(
      spark: SparkSession,
      dir: String,
      set: Seq[(String, org.apache.spark.sql.Column)],
      predicate: org.apache.spark.sql.Column,
      batchId: Option[String] = None,
      leaseStaleMs: Long = 600000L): Long =
    StoreIO.withLease(spark, dir, leaseStaleMs) {
      val root = rootOf(spark, dir)
      if (batchId.exists(appliedInLog(spark, root, _))) 0L
      else {
        val schema = read(spark, root).schema
        val cols = schema.fieldNames.toSet
        set.foreach { case (c, _) =>
          require(cols.contains(c), s"UPDATE SET names unknown column $c")
        }
        val hit = coalesce(predicate, lit(false))
        val setMap = set.toMap
        rewriteBuckets(spark, root, "update", batchId) { cur =>
          val n = cur.where(hit).count()
          // one SELECT so every assignment reads the pre-update row
          (n, cur.select(schema.fieldNames.toSeq.map { c =>
            setMap.get(c) match {
              case Some(e) => when(hit, e).otherwise(col(c)).as(c)
              case None => col(c)
            }
          }: _*))
        }
      }
    }

  /** Shared per-bucket rewrite loop for predicate-driven mutations:
    * `f(alignedBucket)` returns (affected-row count, replacement
    * frame); buckets with zero affected rows keep their current
    * generation. Buckets are aligned to the store's merged schema
    * before `f` so predicates over evolved columns see NULLs rather
    * than failing on pre-evolution generations.
    */
  private def rewriteBuckets(
      spark: SparkSession, dir: String, kind: String,
      batchId: Option[String])(
      f: DataFrame => (Long, DataFrame)): Long = {
    val root = rootOf(spark, dir)
    val n = buckets(spark, root)
    val fullSchema = read(spark, root).schema
    val seq = snapshotSeq(spark, root) + 1
    val fsys = StoreIO.fs(spark, root)
    var affected = 0L
    var touched = false
    (0 until n).foreach { b =>
      val gens = genList(fsys, bucketDir(root, b))
      if (gens.nonEmpty) {
        val cur = align(spark.read.parquet(gens.maxBy(_._1)._2), fullSchema)
        val (hits, next) = f(cur)
        if (hits > 0) {
          affected += hits
          publishDf(next, spark, bucketDir(root, b), seq)
          touched = true
        }
      }
    }
    // a ledgered no-change mutation still commits (empty line, no
    // generations) so its replay is an exact no-op
    if (touched || batchId.nonEmpty) recordCommit(spark, root, seq, batchId, kind)
    affected
  }

  private def align(cur: DataFrame, full: StructType): DataFrame = {
    val have = cur.columns.toSet
    cur.select(full.fields.toSeq.map { fld =>
      if (have(fld.name)) col(fld.name)
      else lit(null).cast(fld.dataType).as(fld.name)
    }: _*)
  }

  /** Delete by KEY SET — the scalable form for erasure queues: the key
    * frame routes through the same bucket hash as the data, so each
    * touched bucket is ONE anti-join against its own slice of the keys
    * (never a table-wide pass; untouched buckets are not even listed).
    * Runs under lease + ledger like [[delete]]; returns rows removed.
    */
  def deleteKeys(
      keys: DataFrame,
      dir: String,
      key: String,
      batchId: Option[String] = None,
      leaseStaleMs: Long = 600000L): Long = {
    val spark = keys.sparkSession
    StoreIO.withLease(spark, dir, leaseStaleMs) {
      val root = rootOf(spark, dir)
      if (batchId.exists(appliedInLog(spark, root, _))) 0L
      else {
        val n = buckets(spark, root)
        val fsys = StoreIO.fs(spark, root)
        val k = keys.select(key).distinct()
          .withColumn("__b", bucketExpr(key, n))
          .localCheckpoint()
        val touched = k.select("__b").distinct().collect()
          .map(_.getInt(0)).sorted // bounded by nBuckets, never by data
        val seq = snapshotSeq(spark, root) + 1
        var removed = 0L
        var wrote = false
        touched.foreach { b =>
          val gens = genList(fsys, bucketDir(root, b))
          if (gens.nonEmpty) {
            val cur = spark.read.parquet(gens.maxBy(_._1)._2)
            val slice = k.where(col("__b") === b).drop("__b")
            val hits = cur.join(slice, Seq(key), "left_semi").count()
            if (hits > 0) {
              removed += hits
              publishDf(cur.join(slice, Seq(key), "left_anti"),
                spark, bucketDir(root, b), seq)
              wrote = true
            }
          }
        }
        if (wrote || batchId.nonEmpty)
          recordCommit(spark, root, seq, batchId, "delete_keys")
        removed
      }
    }
  }

  /** Bucket-pruned point lookup: the probe keys route through the
    * store's own bucket hash, so ONLY the buckets they land in are
    * read (and semi-joined against the key slice) — the O(touched
    * buckets) read path the bucketing buys, never a table scan. At
    * 100 TB a handful of probe keys reads a handful of bucket
    * generations; untouched buckets are not even listed.
    */
  def lookup(keys: DataFrame, dir: String, key: String): DataFrame = {
    val spark = keys.sparkSession
    val root = rootOf(spark, dir)
    val n = buckets(spark, root)
    val fsys = StoreIO.fs(spark, root)
    val k = keys.select(key).distinct()
      .withColumn("__b", bucketExpr(key, n))
      .localCheckpoint()
    val touched = k.select("__b").distinct().collect()
      .map(_.getInt(0)).sorted // bounded by nBuckets, never by data
    val paths = touched.toIndexedSeq.flatMap { b =>
      val gens = genList(fsys, bucketDir(root, b))
      if (gens.isEmpty) None else Some(gens.maxBy(_._1)._2)
    }
    if (paths.isEmpty) read(spark, root).limit(0)
    else spark.read.option("mergeSchema", "true").parquet(paths: _*)
      .join(k.drop("__b"), Seq(key), "left_semi")
  }

  /** CDC-OUT off the generation log: the row-level changes between two
    * committed snapshots — `change` is `insert` (key only in `toSeq`),
    * `delete` (key only in `fromSeq`; values are the before-image) or
    * `update` (key in both with any column differing; values are the
    * after-image). Unchanged rows emit nothing. This is the read side
    * of `core_apply_changefeed`: downstream consumers re-derive a
    * change feed FROM the store instead of re-diffing full snapshots.
    *
    * Path-pruned by construction: a bucket whose newest-generation
    * path is IDENTICAL at both seqs cannot contain a change and is
    * skipped without being read — between adjacent commits that is
    * every untouched bucket, so the diff costs O(changed buckets), not
    * O(table). Both sides route through the same bucket hash, so at
    * scale the join is effectively co-partitioned.
    */
  def changesBetween(
      spark: SparkSession,
      dir: String,
      fromSeq: Long,
      toSeq: Long,
      key: String): DataFrame = {
    val root = rootOf(spark, dir)
    require(fromSeq <= toSeq, s"changesBetween: fromSeq $fromSeq > toSeq $toSeq")
    val base = baseSeq(spark, root)
    require(fromSeq >= base,
      s"store $dir retains history from commit $base; asked for $fromSeq")
    val n = buckets(spark, root)
    val fsys = StoreIO.fs(spark, root)
    val perBucket = (0 until n).map { b =>
      val gens = genList(fsys, bucketDir(root, b))
      def at(s: Long) = {
        val g = gens.filter(_._1 <= s)
        if (g.isEmpty) None else Some(g.maxBy(_._1)._2)
      }
      (at(fromSeq), at(toSeq))
    }.filter { case (a, b) => a != b } // identical path == identical rows
    def side(paths: Seq[String]): Option[DataFrame] =
      if (paths.isEmpty) None
      else Some(spark.read.option("mergeSchema", "true").parquet(paths: _*))
    val aOpt = side(perBucket.flatMap(_._1))
    val bOpt = side(perBucket.flatMap(_._2))
    (aOpt, bOpt) match {
      case (None, None) =>
        // no changed buckets: an empty frame in the change-feed shape
        val cur = read(spark, root)
        cur.limit(0).withColumn("change", lit(""))
          .select(col("change") +: cur.columns.map(col).toIndexedSeq: _*)
      case _ =>
        val schema = (aOpt, bOpt) match {
          case (Some(a), Some(b)) =>
            StructType((a.schema ++ b.schema.filterNot(f =>
              a.schema.fieldNames.contains(f.name))).toSeq)
          case _ => aOpt.orElse(bOpt).get.schema
        }
        def aligned(o: Option[DataFrame]) =
          align(o.getOrElse(emptyOf(spark, schema)), schema)
        val others = schema.fieldNames.filterNot(_ == key).toIndexedSeq
        val a = aligned(aOpt).select(col(key),
          struct(others.map(col): _*).as("__before"))
        val b = aligned(bOpt).select(col(key),
          struct(others.map(col): _*).as("__after"))
        a.join(b, Seq(key), "full_outer")
          .withColumn("change",
            when(col("__before").isNull, lit("insert"))
              .when(col("__after").isNull, lit("delete"))
              .when(!(col("__before") <=> col("__after")), lit("update")))
          .where(col("change").isNotNull)
          .select(col("change") +: col(key) +: others.map(c =>
            coalesce(col(s"__after.$c"), col(s"__before.$c")).as(c)): _*)
    }
  }

  /** Incremental changefeed consumption: the pending changes since the
    * cursor's last consumed commit, plus the head seq to pass to
    * [[commitCursor]] once the consumer has durably processed them —
    * at-least-once by construction (a consumer that crashes before
    * committing re-reads the same window; the changes are a
    * deterministic function of the two snapshots, so redelivery is
    * idempotent for idempotent consumers). A missing cursor starts at
    * the store's base seq, so the first consumption is the initial
    * load (every row an `insert`). A cursor that fell behind the
    * retention horizon fails loudly via [[changesBetween]]'s guard —
    * silently skipping unreconstructable history would lose deletes.
    */
  def changesSince(
      spark: SparkSession,
      dir: String,
      key: String,
      cursorPath: String): (DataFrame, Long) = {
    val root = rootOf(spark, dir)
    val from = StoreIO.readSmall(spark, cursorPath)
      .map(jackson.readTree(_).get("last_seq").asLong())
      .getOrElse(metaOf(spark, root).baseSeq)
    val head = snapshotSeq(spark, root)
    (changesBetween(spark, root, from, head, key), head)
  }

  /** Durably advance a consumer cursor (atomic replace — a crash
    * leaves the old or the new cursor, never a torn one).
    */
  def commitCursor(spark: SparkSession, cursorPath: String, seq: Long): Unit =
    StoreIO.writeSmallAtomic(spark, cursorPath, s"""{"last_seq":$seq}""")

  /** Compact the newest generation of every bucket whose file count
    * exceeds what its data volume needs (the Delta OPTIMIZE analog):
    * each staged write leaves up to `shuffle.partitions` part files
    * per bucket, so a long-running CDC sink accretes small files that
    * tax every subsequent scan's task scheduling. Compaction rewrites
    * only over-fragmented buckets into `ceil(bytes / targetFileBytes)`
    * files as ONE new commit (kind `optimize`) — content is unchanged
    * (time travel still reconstructs pre-compaction states from the
    * retained generations), readers never see a partial rewrite, and
    * a replay converges like any other commit. Returns the number of
    * buckets rewritten.
    */
  def optimize(
      spark: SparkSession,
      dir: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Int =
    StoreIO.withLease(spark, dir) {
      val root = rootOf(spark, dir)
      val n = buckets(spark, root)
      val fsys = StoreIO.fs(spark, root)
      val seq = snapshotSeq(spark, root) + 1
      var rewrote = 0
      (0 until n).foreach { b =>
        val gens = genList(fsys, bucketDir(root, b))
        if (gens.nonEmpty) {
          val cur = gens.maxBy(_._1)._2
          val parts = fsys.listStatus(hp(cur))
            .filter(s => !s.isDirectory && s.getPath.getName.startsWith("part-"))
          val bytes = parts.map(_.getLen).sum
          val want = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes)
          if (parts.length > want) {
            publishDf(spark.read.parquet(cur).coalesce(want.toInt),
              spark, bucketDir(root, b), seq)
            rewrote += 1
          }
        }
      }
      if (rewrote > 0) recordCommit(spark, root, seq, None, "optimize")
      rewrote
    }

  /** Per-bucket row counts off the newest generations — layout
    * introspection for skew reads and rebucket decisions. One count per
    * existing bucket dir; no key rehash, no table-wide pass.
    */
  def bucketCounts(spark: SparkSession, dir: String): Seq[(Int, Long)] = {
    val root = rootOf(spark, dir)
    val n = buckets(spark, root)
    val f = StoreIO.fs(spark, root)
    (0 until n).flatMap { b =>
      val gens = genList(f, bucketDir(root, b))
      if (gens.isEmpty) None
      else Some(b -> spark.read.parquet(gens.maxBy(_._1)._2).count())
    }
  }

  /** Drop generations not needed to reconstruct the newest
    * `keepCommits` commits and advance `meta.base_seq` to the new
    * horizon. Per bucket the rule is: keep everything `>= cutoff` plus
    * the newest generation `<= cutoff` (the reconstruction base for
    * `readAsOf(cutoff)`); everything older is unreachable. Runs under
    * the writer lease; O(directory listing), never O(data).
    */
  def retain(spark: SparkSession, dir: String, keepCommits: Int): Unit =
    StoreIO.withLease(spark, dir) {
      retainLocked(spark, rootOf(spark, dir), keepCommits)
    }

  private def retainLocked(
      spark: SparkSession, root: String, keepCommits: Int): Unit = {
    if (keepCommits == Int.MaxValue) return
    require(keepCommits >= 1, "retention must keep at least the newest commit")
    val maxS = snapshotSeq(spark, root)
    val cutoff = maxS - keepCommits + 1
    if (cutoff <= baseSeq(spark, root)) return
    val n = buckets(spark, root)
    val f = StoreIO.fs(spark, root)
    (0 until n).foreach { b =>
      val gens = genList(f, bucketDir(root, b))
      val atOrBelow = gens.filter(_._1 <= cutoff)
      if (atOrBelow.nonEmpty) {
        val base = atOrBelow.maxBy(_._1)._1
        gens.filter(_._1 < base).foreach(g => f.delete(hp(g._2), true))
      }
    }
    writeMeta(spark, root, Meta(n, cutoff))
  }

  /** Re-bucket the store to `newBuckets` — the maintenance move when a
    * store outgrows its bucket count (buckets are the unit of rewrite;
    * a few GB each is the sweet spot). The new layout (meta + carried
    * ledger + carried commit log + re-hashed buckets, ONE full
    * generation per bucket at the current snapshot seq) is built
    * OFFLINE under a staged sibling dir and promoted with ONE atomic
    * root swap, so readers never see a mixed-modulus layout and a
    * crash anywhere leaves either the old store or the new one
    * complete (`<dir>-old` is the in-swap fallback, which
    * [[rootOf]] honours on every read path; an orphaned staged
    * sibling is vacuum debris for the PARENT directory). The applied
    * ledger carries over, so a replay of any pre-rebucket batch is
    * still a no-op afterwards. History COMPACTS: `base_seq` advances
    * to the snapshot seq — time travel below it is retired (the old
    * per-bucket generations do not exist under the new modulus).
    *
    * The staged layout is born holding the writer lease (`.lease` is
    * created inside it before the swap), so the promoted root is
    * never lease-free while this call is still inside its critical
    * section; and the promote is verified to have landed at exactly
    * `<dir>/meta` — a concurrent lease-acquirer re-creating `<dir>`
    * mid-swap would otherwise absorb the staged tree as a subdirectory
    * while the rename still "succeeds".
    */
  def rebucket(
      spark: SparkSession,
      dir: String,
      key: String,
      newBuckets: Int): Unit =
    StoreIO.withLease(spark, dir) {
      val root0 = rootOf(spark, dir)
      val cur = read(spark, dir).localCheckpoint()
      // the commit log doubles as the applied ledger; carrying it over
      // keeps pre-rebucket replays no-ops under the new modulus
      val log = StoreIO.readSmall(spark, s"$root0/commits.json")
      val seq = snapshotSeq(spark, dir)
      val staged = s"$dir-staged-${java.util.UUID.randomUUID().toString.take(8)}"
      writeMeta(spark, staged, Meta(newBuckets, seq))
      log.foreach(StoreIO.writeSmallAtomic(spark, s"$staged/commits.json", _))
      val tmp = s"$staged/rehash-tmp"
      cur.withColumn("__b", bucketExpr(key, newBuckets))
        .write.partitionBy("__b").mode("overwrite").parquet(tmp)
      val f = StoreIO.fs(spark, dir)
      var placed = 0
      (0 until newBuckets).foreach { b =>
        if (StoreIO.exists(spark, s"$tmp/__b=$b")) {
          f.mkdirs(hp(s"$staged/b$b"))
          require(f.rename(hp(s"$tmp/__b=$b"),
            hp(s"$staged/b$b/${genName(seq)}")),
            s"rebucket: cannot place bucket $b")
          placed += 1
        }
      }
      // an empty store must stay readable (schema-carrying) post-swap
      if (placed == 0)
        publishDf(emptyOf(spark, cur.schema), spark, s"$staged/b0", seq)
      StoreIO.delete(spark, tmp)
      // the promoted root must hold the lease this critical section owns
      f.create(hp(s"$staged/.lease"), true).close()
      StoreIO.swapInDir(spark, staged, dir)
      require(StoreIO.exists(spark, s"$dir/meta.json"),
        s"rebucket: promote of $dir raced a concurrent writer; " +
          s"store intact at $dir-old")
    }

  private def emptyOf(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(java.util.Collections.emptyList[Row](), schema)

  /** Stage-write `df` under the bucket dir and publish it as
    * generation `seq` with one rename. A pre-existing `g<seq>` is a
    * half-published predecessor of THIS commit (the log had not
    * advanced, so the replay recomputed the same seq) — overwrite it.
    */
  private def publishDf(
      df: DataFrame, spark: SparkSession, bdir: String, seq: Long): Unit = {
    val staged = s"$bdir/staged-${java.util.UUID.randomUUID().toString.take(8)}"
    df.write.mode("overwrite").parquet(staged)
    publishDir(spark, staged, bdir, seq)
  }

  private def publishDir(
      spark: SparkSession, staged: String, bdir: String, seq: Long): Unit = {
    val f = StoreIO.fs(spark, bdir)
    f.mkdirs(hp(bdir))
    val tgt = hp(s"$bdir/${genName(seq)}")
    if (f.exists(tgt)) f.delete(tgt, true)
    require(f.rename(hp(staged), tgt), s"publish: cannot promote $staged")
  }

  private def updateLocked(
      batch: DataFrame,
      dir: String,
      key: String,
      versionCol: String,
      nBuckets: Int,
      batchId: Option[String],
      deleteWhere: Option[org.apache.spark.sql.Column],
      notMatchedBySourceDelete: Option[org.apache.spark.sql.Column],
      retainCommits: Int): Boolean = {
    val spark = batch.sparkSession
    val bootstrap = !exists(spark, dir)
    if (bootstrap) writeMeta(spark, dir, Meta(nBuckets, 0L))
    val root = rootOf(spark, dir)
    if (batchId.exists(appliedInLog(spark, root, _))) return false
    val n = buckets(spark, root)
    val seq = snapshotSeq(spark, root) + 1
    val fsys = StoreIO.fs(spark, root)

    val wLatest = Window.partitionBy(key).orderBy(col(versionCol).desc)
    val latest = batch
      .withColumn("__rn", row_number().over(wLatest)).where("__rn = 1").drop("__rn")
      .withColumn("__b", bucketExpr(key, n))
      .localCheckpoint() // one pass over the batch; feeds the touched
                         // scan, the anti-join and the staged write
    val touched = latest.select("__b").distinct().collect()
      .map(_.getInt(0)).sorted // bounded by nBuckets, never by data
    if (bootstrap && touched.isEmpty) {
      // an empty first batch must still leave a readable (schema-carrying)
      // store: one empty bucket generation
      publishDf(emptyOf(spark, latest.drop("__b").schema),
        spark, bucketDir(root, 0), seq)
      recordCommit(spark, root, seq, batchId, "merge")
      return true
    }
    val existingPaths = touched.toIndexedSeq.flatMap { b =>
      val gens = genList(fsys, bucketDir(root, b))
      if (gens.isEmpty) None else Some(gens.maxBy(_._1)._2)
    }
    // tombstone split: EVERY arbitrated batch key overrides its stored
    // row (the anti-join below), but only non-tombstone rows re-insert
    val upserts = deleteWhere
      .map(c => latest.where(!coalesce(c, lit(false))))
      .getOrElse(latest)
    val merged =
      if (existingPaths.isEmpty) upserts
      else {
        val kept0 = spark.read.option("mergeSchema", "true")
          .parquet(existingPaths: _*)
          .withColumn("__b", bucketExpr(key, n))
          .join(latest.select(key), Seq(key), "left_anti")
        // full-sync: unmatched stored rows matching the clause predicate
        // leave the touched buckets here (untouched buckets below)
        val kept = notMatchedBySourceDelete
          .map(c => kept0.where(!coalesce(c, lit(false))))
          .getOrElse(kept0)
        // allowMissingColumns both ways: the batch may ADD columns
        // (schema evolution) or a pre-evolution replay may LACK some
        kept.unionByName(upserts, allowMissingColumns = true)
      }
    val outSchema = StructType(merged.schema.filterNot(_.name == "__b"))

    // ONE staged write covering every touched bucket, then one atomic
    // rename per bucket publishing generation `seq`
    val staged = s"$root/staged-${java.util.UUID.randomUUID().toString.take(8)}"
    merged.write.partitionBy("__b").mode("overwrite").parquet(staged)
    touched.foreach { b =>
      // a bucket whose every surviving row was tombstoned away writes no
      // staged partition — publish an explicit EMPTY generation instead
      // (built from the schema directly: nothing here may depend on the
      // retired generations still being scannable)
      if (StoreIO.exists(spark, s"$staged/__b=$b"))
        publishDir(spark, s"$staged/__b=$b", bucketDir(root, b), seq)
      else
        publishDf(emptyOf(spark, outSchema), spark, bucketDir(root, b), seq)
    }
    StoreIO.delete(spark, staged)

    // full-sync over the UNtouched buckets: every stored row there is
    // by construction not-matched-by-source; rewrite only buckets that
    // actually lose rows
    notMatchedBySourceDelete.foreach { c =>
      val hit = coalesce(c, lit(false))
      (0 until n).filterNot(touched.contains).foreach { b =>
        val gens = genList(fsys, bucketDir(root, b))
        if (gens.nonEmpty) {
          val cur = align(spark.read.parquet(gens.maxBy(_._1)._2), outSchema)
          if (cur.where(hit).limit(1).count() > 0)
            publishDf(cur.where(!hit), spark, bucketDir(root, b), seq)
        }
      }
    }

    recordCommit(spark, root, seq, batchId, "merge")
    retainLocked(spark, root, retainCommits)
    true
  }
}
