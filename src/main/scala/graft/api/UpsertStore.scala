package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persistent key-bucketed upsert table — the parquet-native stand-in
  * for a MERGE INTO target (Delta/Iceberg) that stays DELTA-SIZED per
  * merge: keys hash into `nBuckets` fixed buckets, each bucket is an
  * independent [[StoreIO]] generation, and a micro-batch rewrites ONLY
  * the buckets its keys land in. The round-8 shape (read the whole
  * table, anti-join, rewrite everything, overwrite in place) did
  * O(table) work per batch and had a non-atomic in-place overwrite;
  * here per-batch work is O(batch + touched-bucket data) and every
  * bucket promotion is the staged-write + atomic-rename swap every
  * other store in the engine uses.
  *
  * Merge semantics (unchanged from the sink it backs): batch rows
  * override stored rows per key; within a batch the greatest
  * `versionCol` wins (ties broken deterministically by the row's
  * bucket-input hash order via row_number on version desc).
  *
  * Crash windows:
  *  - inside one bucket swap: [[StoreIO.swapInDir]] leaves the retired
  *    generation complete at `<bucket>-old`; [[read]] falls back.
  *  - between bucket swaps: some buckets carry the batch, some don't —
  *    each is a complete generation, so reads stay consistent
  *    per-bucket, and since the applied-ledger entry is recorded only
  *    AFTER the last swap, the foreachBatch replay re-merges; the
  *    merge is idempotent per key (already-applied rows anti-join away
  *    and re-insert identically), so replay converges to the same
  *    table.
  *
  * At 100 TB: pick `nBuckets` so a bucket is a few GB (the unit of
  * rewrite); the touched-bucket read is a path-pruned scan, never a
  * table scan, and untouched buckets are not even listed.
  */
object UpsertStore {

  val defaultBuckets = 32

  private def bucketExpr(key: String, n: Int) =
    pmod(xxhash64(col(key)), lit(n.toLong)).cast("int")

  private def bucketDir(dir: String, b: Int): String = s"$dir/b$b"

  /** Stored bucket count (meta is written once at bootstrap, so every
    * later batch agrees on the hash modulus whatever the caller says).
    */
  def buckets(spark: SparkSession, dir: String): Int =
    StoreIO.read(spark, dir, "meta").head().getInt(0)

  def exists(spark: SparkSession, dir: String): Boolean =
    StoreIO.exists(spark, s"$dir/meta") || StoreIO.exists(spark, s"$dir/meta-old")

  /** The current table: one path-pruned multi-path read over the
    * current generation of every non-empty bucket.
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val n = buckets(spark, dir)
    val paths = (0 until n).map(b => StoreIO.genPath(spark, bucketDir(dir, b)))
      .filter(StoreIO.exists(spark, _))
    require(paths.nonEmpty, s"upsert store $dir has no buckets")
    spark.read.parquet(paths: _*)
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
    */
  def update(
      batch: DataFrame,
      dir: String,
      key: String,
      versionCol: String,
      nBuckets: Int = defaultBuckets,
      batchId: Option[String] = None,
      leaseStaleMs: Long = 600000L,
      deleteWhere: Option[org.apache.spark.sql.Column] = None): Boolean =
    StoreIO.withLease(batch.sparkSession, dir, leaseStaleMs) {
      updateLocked(batch, dir, key, versionCol, nBuckets, batchId, deleteWhere)
    }

  /** Delete every stored row matching `predicate` (SQL DELETE
    * semantics: a NULL predicate keeps the row). Runs under the writer
    * lease with the applied-batch ledger, so a replayed delete is a
    * no-op. Work is per-bucket: each bucket generation is read once,
    * and only buckets that actually contain matches are rewritten
    * (staged-write + atomic swap — a crash mid-delete leaves every
    * bucket a complete generation, some deleted, some not, and the
    * replay converges). Returns the number of rows removed (0 on a
    * ledger replay).
    */
  def delete(
      spark: SparkSession,
      dir: String,
      predicate: org.apache.spark.sql.Column,
      batchId: Option[String] = None,
      leaseStaleMs: Long = 600000L): Long =
    StoreIO.withLease(spark, dir, leaseStaleMs) {
      if (batchId.exists(StoreIO.applied(spark, dir, _))) 0L
      else {
        val n = buckets(spark, dir)
        val hit = coalesce(predicate, lit(false))
        var removed = 0L
        (0 until n).foreach { b =>
          val path = StoreIO.genPath(spark, bucketDir(dir, b))
          if (StoreIO.exists(spark, path)) {
            val cur = spark.read.parquet(path)
            val hits = cur.where(hit).count()
            if (hits > 0) {
              removed += hits
              StoreIO.swapIn(cur.where(!hit), spark, bucketDir(dir, b))
            }
          }
        }
        batchId.foreach(StoreIO.recordApplied(spark, dir, _))
        removed
      }
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
      if (batchId.exists(StoreIO.applied(spark, dir, _))) 0L
      else {
        val n = buckets(spark, dir)
        val k = keys.select(key).distinct()
          .withColumn("__b", bucketExpr(key, n))
          .localCheckpoint()
        val touched = k.select("__b").distinct().collect()
          .map(_.getInt(0)).sorted // bounded by nBuckets, never by data
        var removed = 0L
        touched.foreach { b =>
          val path = StoreIO.genPath(spark, bucketDir(dir, b))
          if (StoreIO.exists(spark, path)) {
            val cur = spark.read.parquet(path)
            val slice = k.where(col("__b") === b).drop("__b")
            val hits = cur.join(slice, Seq(key), "left_semi").count()
            if (hits > 0) {
              removed += hits
              StoreIO.swapIn(cur.join(slice, Seq(key), "left_anti"),
                spark, bucketDir(dir, b))
            }
          }
        }
        batchId.foreach(StoreIO.recordApplied(spark, dir, _))
        removed
      }
    }
  }

  /** Per-bucket row counts off the current generations — layout
    * introspection for skew reads and rebucket decisions. One count per
    * existing bucket dir; no key rehash, no table-wide pass.
    */
  def bucketCounts(spark: SparkSession, dir: String): Seq[(Int, Long)] = {
    val n = buckets(spark, dir)
    (0 until n).flatMap { b =>
      val p = StoreIO.genPath(spark, bucketDir(dir, b))
      if (StoreIO.exists(spark, p)) Some(b -> spark.read.parquet(p).count())
      else None
    }
  }

  /** Re-bucket the store to `newBuckets` — the maintenance move when a
    * store outgrows its bucket count (buckets are the unit of rewrite;
    * a few GB each is the sweet spot). The new layout (meta + carried
    * ledger + re-hashed buckets) is built OFFLINE under a staged
    * sibling dir and promoted with ONE atomic root swap, so readers
    * never see a mixed-modulus layout and a crash anywhere leaves
    * either the old store or the new one complete (`<dir>-old` is the
    * in-swap fallback; an orphaned staged sibling is vacuum debris for
    * the PARENT directory). The applied ledger carries over, so a
    * replay of any pre-rebucket batch is still a no-op afterwards.
    */
  def rebucket(
      spark: SparkSession,
      dir: String,
      key: String,
      newBuckets: Int): Unit =
    StoreIO.withLease(spark, dir) {
      val cur = read(spark, dir).localCheckpoint()
      val ledger = StoreIO.read(spark, dir, "applied").localCheckpoint()
      val staged = s"$dir-staged-${java.util.UUID.randomUUID().toString.take(8)}"
      import spark.implicits._
      StoreIO.swapIn(Seq(newBuckets).toDF("n_buckets"), spark, s"$staged/meta")
      StoreIO.swapIn(ledger, spark, s"$staged/applied")
      val tmp = s"$staged/rehash-tmp"
      cur.withColumn("__b", bucketExpr(key, newBuckets))
        .write.partitionBy("__b").mode("overwrite").parquet(tmp)
      val f = fs0(spark, dir)
      var placed = 0
      (0 until newBuckets).foreach { b =>
        if (StoreIO.exists(spark, s"$tmp/__b=$b")) {
          require(f.rename(
            new org.apache.hadoop.fs.Path(s"$tmp/__b=$b"),
            new org.apache.hadoop.fs.Path(s"$staged/b$b")),
            s"rebucket: cannot place bucket $b")
          placed += 1
        }
      }
      // an empty store must stay readable (schema-carrying) post-swap
      if (placed == 0) StoreIO.swapIn(cur.limit(0), spark, s"$staged/b0")
      StoreIO.delete(spark, tmp)
      StoreIO.swapInDir(spark, staged, dir)
    }

  private def fs0(spark: SparkSession, dir: String) = StoreIO.fs(spark, dir)

  private def updateLocked(
      batch: DataFrame,
      dir: String,
      key: String,
      versionCol: String,
      nBuckets: Int,
      batchId: Option[String],
      deleteWhere: Option[org.apache.spark.sql.Column] = None): Boolean = {
    val spark = batch.sparkSession
    val bootstrap = !exists(spark, dir)
    if (bootstrap) {
      import spark.implicits._
      StoreIO.swapIn(Seq(nBuckets).toDF("n_buckets"), spark, s"$dir/meta")
      StoreIO.swapIn(StoreIO.ledgerDf(spark, Seq.empty), spark, s"$dir/applied")
    }
    if (batchId.exists(StoreIO.applied(spark, dir, _))) return false
    val n = buckets(spark, dir)

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
      StoreIO.swapIn(latest.drop("__b"), spark, bucketDir(dir, 0))
      batchId.foreach(StoreIO.recordApplied(spark, dir, _))
      return true
    }
    val existingPaths = touched
      .map(b => StoreIO.genPath(spark, bucketDir(dir, b)))
      .filter(StoreIO.exists(spark, _))
    // tombstone split: EVERY arbitrated batch key overrides its stored
    // row (the anti-join below), but only non-tombstone rows re-insert
    val upserts = deleteWhere
      .map(c => latest.where(!coalesce(c, lit(false))))
      .getOrElse(latest)
    val merged =
      if (existingPaths.isEmpty) upserts
      else spark.read.parquet(existingPaths.toIndexedSeq: _*)
        .withColumn("__b", bucketExpr(key, n))
        .join(latest.select(key), Seq(key), "left_anti")
        .unionByName(upserts)

    // ONE staged write covering every touched bucket, then one atomic
    // promotion per bucket (metadata renames, no second data pass)
    val staged = s"$dir/staged-${java.util.UUID.randomUUID().toString.take(8)}"
    merged.write.partitionBy("__b").mode("overwrite").parquet(staged)
    touched.foreach { b =>
      // a bucket whose every surviving row was tombstoned away writes no
      // staged partition — promote an explicit EMPTY generation instead
      if (StoreIO.exists(spark, s"$staged/__b=$b"))
        StoreIO.swapInDir(spark, s"$staged/__b=$b", bucketDir(dir, b))
      else
        StoreIO.swapIn(merged.drop("__b").limit(0), spark, bucketDir(dir, b))
    }
    StoreIO.delete(spark, staged)
    batchId.foreach(StoreIO.recordApplied(spark, dir, _))
    true
  }
}
