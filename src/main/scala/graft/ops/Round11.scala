package graft.ops

import graft.{Op, Tables => T}
import org.apache.spark.sql.functions._

/** Round 11: the store's DML triad completed (UPDATE verb, full-sync
  * MERGE) and the generation-log store features (time travel, keep-N
  * retention, schema evolution) — all over the immutable-generation
  * UpsertStore layout.
  */
object Round11 {

  /** Latest-order-per-customer seed frame with exact integer money
    * (cents) — the shared fixture for the DML ops, so every oracle is
    * integer-exact on both engines.
    */
  private def seedSrc(s: org.apache.spark.sql.SparkSession, d: String) =
    T.t(s, d, "orders").select(
      col("o_custkey"), col("o_orderkey"),
      expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("total_cents"),
      expr("o_orderkey % 100").as("disc_cents"))

  /** DuckDB CTE `l`: the same latest-per-customer seed. */
  private val oSeed =
    "f AS (SELECT o_custkey, o_orderkey, " +
      "CAST(floor(o_totalprice * 100) AS BIGINT) AS total_cents, " +
      "o_orderkey % 100 AS disc_cents, " +
      "row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey DESC) AS rn " +
      "FROM orders), " +
      "l AS (SELECT o_custkey, o_orderkey, total_cents, disc_cents FROM f WHERE rn = 1)"

  val ops: Seq[Op] = Seq(

    // The THIRD mutation-SQL verb, completing the MERGE/DELETE/UPDATE
    // DML triad: `UPDATE '<dir>' SET col = expr, ... WHERE pred`
    // against the upsert store. Assignment right-hand sides evaluate
    // against the PRE-UPDATE row (ANSI): the op's second assignment
    // zeroes the column the first one reads, and the oracle pins that
    // both saw the old values. Only buckets with matches gain a new
    // generation, under lease + ledger; a replay with the same batchId
    // is a no-op (asserted inline — 0 rows on the second run).
    Op("core_update_sql",
      (s, d) => {
        val dir = s"target/tmp/update_sql_${java.util.UUID.randomUUID().toString.take(8)}"
        seedSrc(s, d).createOrReplaceTempView("graft_update_src")
        graft.api.MergeSql.run(s,
          s"MERGE INTO '$dir' USING graft_update_src ON t.o_custkey = s.o_custkey " +
            "LATEST BY o_orderkey WHEN MATCHED THEN UPDATE SET * " +
            "WHEN NOT MATCHED THEN INSERT *",
          nBuckets = 8, batchId = Some("seed")): Unit
        val sql = s"UPDATE '$dir' SET total_cents = total_cents + disc_cents, " +
          "disc_cents = CAST(0 AS BIGINT) WHERE o_custkey % 5 = 0"
        graft.api.MergeSql.runUpdate(s, sql, batchId = Some("u1")): Unit
        val n2 = graft.api.MergeSql.runUpdate(s, sql, batchId = Some("u1"))
        require(n2 == 0L, s"replayed UPDATE must be a ledger no-op, touched $n2")
        val got = graft.api.MergeSql.readTarget(s, dir).localCheckpoint()
        graft.api.StoreIO.delete(s, dir)
        got.orderBy("o_custkey")
      },
      Some(s"WITH $oSeed " +
        "SELECT o_custkey, o_orderkey, " +
        "CASE WHEN o_custkey % 5 = 0 THEN total_cents + disc_cents ELSE total_cents END AS total_cents, " +
        "CASE WHEN o_custkey % 5 = 0 THEN CAST(0 AS BIGINT) ELSE disc_cents END AS disc_cents " +
        "FROM l ORDER BY o_custkey")),

    // MERGE's full-sync clause: `WHEN NOT MATCHED BY SOURCE AND <pred>
    // THEN DELETE` — the snapshot-reconciliation shape (source is the
    // new full state; stored keys it no longer carries are swept,
    // here conditionally: every 7th customer is contractually
    // retained). Matched keys take the source row as usual; the clause
    // inherently visits every bucket, which is exactly what a
    // full-snapshot reconcile means.
    Op("core_merge_full_sync",
      (s, d) => {
        val dir = s"target/tmp/full_sync_${java.util.UUID.randomUUID().toString.take(8)}"
        seedSrc(s, d).select("o_custkey", "o_orderkey", "total_cents")
          .createOrReplaceTempView("graft_sync_seed")
        graft.api.MergeSql.run(s,
          s"MERGE INTO '$dir' USING graft_sync_seed ON t.o_custkey = s.o_custkey " +
            "LATEST BY o_orderkey WHEN MATCHED THEN UPDATE SET * " +
            "WHEN NOT MATCHED THEN INSERT *",
          nBuckets = 8, batchId = Some("seed")): Unit
        seedSrc(s, d).where("o_custkey % 3 <> 1")
          .select(col("o_custkey"), col("o_orderkey"),
            (col("total_cents") + 1).as("total_cents"))
          .createOrReplaceTempView("graft_sync_snap")
        graft.api.MergeSql.run(s,
          s"MERGE INTO '$dir' USING graft_sync_snap ON t.o_custkey = s.o_custkey " +
            "LATEST BY o_orderkey WHEN MATCHED THEN UPDATE SET * " +
            "WHEN NOT MATCHED THEN INSERT * " +
            "WHEN NOT MATCHED BY SOURCE AND o_custkey % 7 <> 0 THEN DELETE",
          nBuckets = 8, batchId = Some("sync")): Unit
        val got = graft.api.MergeSql.readTarget(s, dir).localCheckpoint()
        graft.api.StoreIO.delete(s, dir)
        got.orderBy("o_custkey")
      },
      Some(s"WITH $oSeed " +
        "SELECT o_custkey, o_orderkey, total_cents + 1 AS total_cents FROM l " +
        "WHERE o_custkey % 3 <> 1 " +
        "UNION ALL " +
        "SELECT o_custkey, o_orderkey, total_cents FROM l " +
        "WHERE o_custkey % 3 = 1 AND o_custkey % 7 = 0 " +
        "ORDER BY o_custkey")),

    // TIME TRAVEL over the generation-log store: three CDC batches
    // commit as seqs 1..3; `readAsOf(2)` reconstructs the two-batch
    // state (per bucket, the newest generation <= 2 — buckets first
    // touched by batch 3 contribute nothing, exactly the state a
    // reader at that commit saw), while the plain read serves seq 3.
    // Both snapshots ship under one oracle, tagged — the DuckDB side
    // replays the two- and three-batch latest-wins semantics directly.
    Op("core_store_time_travel",
      (s, d) => {
        val dir = s"target/tmp/time_travel_${java.util.UUID.randomUUID().toString.take(8)}"
        val t = T.t(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
          .withColumn("b", pmod(col("o_orderkey"), lit(3)))
        (0 to 2).foreach { b =>
          graft.api.UpsertStore.update(
            t.where(col("b") === b).drop("b"), dir, "o_custkey", "o_orderkey",
            nBuckets = 8, batchId = Some(s"b$b")): Unit
        }
        require(graft.api.UpsertStore.snapshotSeq(s, dir) == 3L,
          "three batches must commit as seqs 1..3")
        val asof = graft.api.UpsertStore.readAsOf(s, dir, 2L)
          .withColumn("snap", lit("asof2"))
        val cur = graft.api.UpsertStore.read(s, dir)
          .withColumn("snap", lit("current"))
        val got = asof.unionByName(cur).localCheckpoint()
        graft.api.StoreIO.delete(s, dir)
        got.orderBy("snap", "o_custkey")
      },
      Some("WITH t AS (SELECT o_custkey, o_orderkey, o_totalprice, o_orderkey % 3 AS b FROM orders), " +
        "m2 AS (SELECT o_custkey, max(b) AS mb FROM t WHERE b <= 1 GROUP BY 1), " +
        "f2 AS (SELECT t.o_custkey, t.o_orderkey, t.o_totalprice, " +
        "row_number() OVER (PARTITION BY t.o_custkey ORDER BY t.o_orderkey DESC) AS rn " +
        "FROM t JOIN m2 ON t.o_custkey = m2.o_custkey AND t.b = m2.mb), " +
        "m3 AS (SELECT o_custkey, max(b) AS mb FROM t GROUP BY 1), " +
        "f3 AS (SELECT t.o_custkey, t.o_orderkey, t.o_totalprice, " +
        "row_number() OVER (PARTITION BY t.o_custkey ORDER BY t.o_orderkey DESC) AS rn " +
        "FROM t JOIN m3 ON t.o_custkey = m3.o_custkey AND t.b = m3.mb) " +
        "SELECT o_custkey, o_orderkey, o_totalprice, 'asof2' AS snap FROM f2 WHERE rn = 1 " +
        "UNION ALL " +
        "SELECT o_custkey, o_orderkey, o_totalprice, 'current' AS snap FROM f3 WHERE rn = 1 " +
        "ORDER BY snap, o_custkey")),

    // SCHEMA EVOLUTION on the store: batch 2 ADDS a column (and is
    // deliberately a SMALL key slice into a 32-bucket store, so most
    // buckets keep their pre-evolution generations on disk). The
    // merged read surfaces the new column across generation schemas
    // (parquet schema merge) with NULL backfill for keys whose newest
    // row predates it — the Delta-style additive evolution a
    // long-lived CDC target needs.
    Op("core_store_schema_evolution",
      (s, d) => {
        val dir = s"target/tmp/schema_evo_${java.util.UUID.randomUUID().toString.take(8)}"
        val t = T.t(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
          .withColumn("b", pmod(col("o_orderkey"), lit(2)))
        graft.api.UpsertStore.update(
          t.where("b = 0").select("o_custkey", "o_orderkey"),
          dir, "o_custkey", "o_orderkey", nBuckets = 32, batchId = Some("v1")): Unit
        graft.api.UpsertStore.update(
          t.where("b = 1 AND o_custkey % 10 = 7")
            .select("o_custkey", "o_orderkey", "o_totalprice"),
          dir, "o_custkey", "o_orderkey", nBuckets = 32, batchId = Some("v2")): Unit
        val r = graft.api.UpsertStore.read(s, dir)
        // a degenerate fixture (empty/one-row) may never run batch 2, so
        // the column never evolves in — surface it as all-NULL then
        val evolved =
          if (r.columns.contains("o_totalprice")) r
          else r.withColumn("o_totalprice", lit(null).cast("double"))
        val got = evolved
          .select("o_custkey", "o_orderkey", "o_totalprice").localCheckpoint()
        graft.api.StoreIO.delete(s, dir)
        got.orderBy("o_custkey")
      },
      Some("WITH t AS (SELECT o_custkey, o_orderkey, o_totalprice, o_orderkey % 2 AS b FROM orders), " +
        "u AS (SELECT o_custkey, o_orderkey, o_totalprice, 1 AS src FROM t " +
        "WHERE b = 1 AND o_custkey % 10 = 7 " +
        "UNION ALL SELECT o_custkey, o_orderkey, o_totalprice, 0 AS src FROM t WHERE b = 0), " +
        "m AS (SELECT o_custkey, max(src) AS ms FROM u GROUP BY 1), " +
        "f AS (SELECT u.o_custkey, u.o_orderkey, u.o_totalprice, u.src, " +
        "row_number() OVER (PARTITION BY u.o_custkey ORDER BY u.o_orderkey DESC) AS rn " +
        "FROM u JOIN m ON u.o_custkey = m.o_custkey AND u.src = m.ms) " +
        "SELECT o_custkey, o_orderkey, " +
        "CASE WHEN src = 1 THEN o_totalprice ELSE NULL END AS o_totalprice " +
        "FROM f WHERE rn = 1 ORDER BY o_custkey")),

    // KEEP-N RETENTION: four batches commit as seqs 1..4; retain(2)
    // advances the reconstruction horizon (base_seq) to 3 — asOf(3)
    // and asOf(4) stay reconstructable, older history is retired and
    // a deeper readAsOf fails loudly (spec-pinned). The op ships the
    // horizon numbers plus row counts at the horizon and head; the
    // counts are data-derived and the oracle replays them, the
    // core_store_stats pattern.
    Op("core_store_retention",
      (s, d) => {
        val dir = s"target/tmp/retention_${java.util.UUID.randomUUID().toString.take(8)}"
        val t = T.t(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"))
          .withColumn("b", pmod(col("o_orderkey"), lit(4)))
        (0 to 3).foreach { b =>
          graft.api.UpsertStore.update(
            t.where(col("b") === b).drop("b"), dir, "o_custkey", "o_orderkey",
            nBuckets = 8, batchId = Some(s"b$b"),
            retainCommits = Int.MaxValue): Unit
        }
        graft.api.UpsertStore.retain(s, dir, keepCommits = 2)
        val base = graft.api.UpsertStore.baseSeq(s, dir)
        val head = graft.api.UpsertStore.snapshotSeq(s, dir)
        val nCur = graft.api.UpsertStore.read(s, dir).count()
        val nBase = graft.api.UpsertStore.readAsOf(s, dir, base).count()
        graft.api.StoreIO.delete(s, dir)
        import s.implicits._
        Seq((base, head, nCur, nBase))
          .toDF("base_seq", "snapshot_seq", "rows_current", "rows_asof_base")
      },
      Some("SELECT CAST(3 AS BIGINT) AS base_seq, CAST(4 AS BIGINT) AS snapshot_seq, " +
        "(SELECT count(DISTINCT o_custkey) FROM orders) AS rows_current, " +
        "(SELECT count(DISTINCT o_custkey) FROM orders WHERE o_orderkey % 4 <= 2) AS rows_asof_base")),

    // BUCKET-PRUNED POINT LOOKUP: the probe keys route through the
    // store's own hash, so only the buckets they land in are read and
    // semi-joined — the O(probe) read path that justifies key
    // bucketing (a spec pins that the physical scan touches only the
    // probed buckets' paths). Probe set: every ~97th customer.
    Op("core_store_point_lookup",
      (s, d) => {
        val dir = s"target/tmp/lookup_${java.util.UUID.randomUUID().toString.take(8)}"
        graft.api.UpsertStore.update(
          T.t(s, d, "orders").select("o_custkey", "o_orderkey", "o_totalprice"),
          dir, "o_custkey", "o_orderkey", nBuckets = 16, batchId = Some("seed")): Unit
        val probes = T.t(s, d, "orders")
          .where("o_custkey % 97 = 0").select("o_custkey").distinct()
        val got = graft.api.UpsertStore.lookup(probes, dir, "o_custkey")
          .localCheckpoint()
        graft.api.StoreIO.delete(s, dir)
        got.orderBy("o_custkey")
      },
      Some("WITH f AS (SELECT o_custkey, o_orderkey, o_totalprice, " +
        "row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey DESC) AS rn " +
        "FROM orders) " +
        "SELECT o_custkey, o_orderkey, o_totalprice FROM f " +
        "WHERE rn = 1 AND o_custkey % 97 = 0 ORDER BY o_custkey")),

    // CHANGEFEED OUT of the generation log (the read twin of
    // core_apply_changefeed): row-level insert/update/delete between
    // commit 1 (first batch) and commit 3 (second batch + a DELETE
    // sweep). Buckets whose newest-generation path is identical at
    // both seqs are skipped unread, so the diff costs O(changed
    // buckets); keys whose winning row did not change emit nothing
    // (including insert-then-delete inside the window — snapshot-diff
    // semantics).
    Op("core_store_changefeed",
      (s, d) => {
        val dir = s"target/tmp/changefeed_${java.util.UUID.randomUUID().toString.take(8)}"
        val t = T.t(s, d, "orders")
          .where("o_orderkey % 3 <= 1")
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
          .withColumn("b", pmod(col("o_orderkey"), lit(3)))
        (0 to 1).foreach { b =>
          graft.api.UpsertStore.update(
            t.where(col("b") === b).drop("b"), dir, "o_custkey", "o_orderkey",
            nBuckets = 8, batchId = Some(s"b$b")): Unit
        }
        graft.api.UpsertStore.delete(s, dir, expr("o_custkey % 10 = 3"),
          batchId = Some("sweep")): Unit
        val got = graft.api.UpsertStore
          .changesBetween(s, dir, fromSeq = 1L, toSeq = 3L, key = "o_custkey")
          .localCheckpoint()
        graft.api.StoreIO.delete(s, dir)
        got.orderBy("o_custkey")
      },
      Some("WITH t AS (SELECT o_custkey, o_orderkey, o_totalprice, o_orderkey % 3 AS b " +
        "FROM orders WHERE o_orderkey % 3 <= 1), " +
        "s1 AS (SELECT o_custkey, o_orderkey, o_totalprice FROM " +
        "(SELECT o_custkey, o_orderkey, o_totalprice, " +
        "row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey DESC) AS rn " +
        "FROM t WHERE b = 0) WHERE rn = 1), " +
        "m AS (SELECT o_custkey, max(b) AS mb FROM t GROUP BY 1), " +
        "s3 AS (SELECT o_custkey, o_orderkey, o_totalprice FROM " +
        "(SELECT t.o_custkey, t.o_orderkey, t.o_totalprice, " +
        "row_number() OVER (PARTITION BY t.o_custkey ORDER BY t.o_orderkey DESC) AS rn " +
        "FROM t JOIN m ON t.o_custkey = m.o_custkey AND t.b = m.mb) " +
        "WHERE rn = 1 AND o_custkey % 10 <> 3) " +
        "SELECT CASE WHEN s1.o_custkey IS NULL THEN 'insert' " +
        "WHEN s3.o_custkey IS NULL THEN 'delete' ELSE 'update' END AS change, " +
        "coalesce(s3.o_custkey, s1.o_custkey) AS o_custkey, " +
        "coalesce(s3.o_orderkey, s1.o_orderkey) AS o_orderkey, " +
        "coalesce(s3.o_totalprice, s1.o_totalprice) AS o_totalprice " +
        "FROM s1 FULL OUTER JOIN s3 ON s1.o_custkey = s3.o_custkey " +
        "WHERE s1.o_custkey IS NULL OR s3.o_custkey IS NULL " +
        "OR s1.o_orderkey IS DISTINCT FROM s3.o_orderkey " +
        "OR s1.o_totalprice IS DISTINCT FROM s3.o_totalprice " +
        "ORDER BY o_custkey")),

    // INCREMENTAL CHANGEFEED CONSUMPTION — the CDC-consumer loop over
    // the store (changesSince + commitCursor): run 1 consumes the
    // 2-batch state as its initial load (every row an insert, cursor
    // advances 0 -> 2); batch 3 and a DELETE sweep land; run 2
    // consumes exactly the delta (cursor 2 -> 4). At-least-once by
    // construction: the cursor only advances after the consumer has
    // its batch; a replayed window re-derives the identical changes.
    Op("core_store_incremental_consume",
      (s, d) => {
        val base = s"target/tmp/consume_${java.util.UUID.randomUUID().toString.take(8)}"
        val dir = s"$base/table"
        val cursor = s"$base/cursor.json"
        val t = T.t(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
          .withColumn("b", pmod(col("o_orderkey"), lit(3)))
        def batch(b: Int): Unit = graft.api.UpsertStore.update(
          t.where(col("b") === b).drop("b"), dir, "o_custkey", "o_orderkey",
          nBuckets = 8, batchId = Some(s"b$b")): Unit
        batch(0); batch(1)
        val (run1, head1) = graft.api.UpsertStore
          .changesSince(s, dir, "o_custkey", cursor)
        val r1 = run1.withColumn("run", lit("r1")).localCheckpoint()
        graft.api.UpsertStore.commitCursor(s, cursor, head1)
        batch(2)
        graft.api.UpsertStore.delete(s, dir, expr("o_custkey % 10 = 3"),
          batchId = Some("sweep")): Unit
        val (run2, head2) = graft.api.UpsertStore
          .changesSince(s, dir, "o_custkey", cursor)
        val r2 = run2.withColumn("run", lit("r2")).localCheckpoint()
        graft.api.UpsertStore.commitCursor(s, cursor, head2)
        graft.api.StoreIO.delete(s, base)
        r1.unionByName(r2).orderBy("run", "o_custkey")
      },
      Some("WITH t AS (SELECT o_custkey, o_orderkey, o_totalprice, o_orderkey % 3 AS b FROM orders), " +
        "m2 AS (SELECT o_custkey, max(b) AS mb FROM t WHERE b <= 1 GROUP BY 1), " +
        "s2 AS (SELECT o_custkey, o_orderkey, o_totalprice FROM " +
        "(SELECT t.o_custkey, t.o_orderkey, t.o_totalprice, " +
        "row_number() OVER (PARTITION BY t.o_custkey ORDER BY t.o_orderkey DESC) AS rn " +
        "FROM t JOIN m2 ON t.o_custkey = m2.o_custkey AND t.b = m2.mb) WHERE rn = 1), " +
        "m4 AS (SELECT o_custkey, max(b) AS mb FROM t GROUP BY 1), " +
        "s4 AS (SELECT o_custkey, o_orderkey, o_totalprice FROM " +
        "(SELECT t.o_custkey, t.o_orderkey, t.o_totalprice, " +
        "row_number() OVER (PARTITION BY t.o_custkey ORDER BY t.o_orderkey DESC) AS rn " +
        "FROM t JOIN m4 ON t.o_custkey = m4.o_custkey AND t.b = m4.mb) " +
        "WHERE rn = 1 AND o_custkey % 10 <> 3) " +
        "SELECT 'insert' AS change, o_custkey, o_orderkey, o_totalprice, 'r1' AS run FROM s2 " +
        "UNION ALL " +
        "SELECT CASE WHEN s2.o_custkey IS NULL THEN 'insert' " +
        "WHEN s4.o_custkey IS NULL THEN 'delete' ELSE 'update' END AS change, " +
        "coalesce(s4.o_custkey, s2.o_custkey) AS o_custkey, " +
        "coalesce(s4.o_orderkey, s2.o_orderkey) AS o_orderkey, " +
        "coalesce(s4.o_totalprice, s2.o_totalprice) AS o_totalprice, 'r2' AS run " +
        "FROM s2 FULL OUTER JOIN s4 ON s2.o_custkey = s4.o_custkey " +
        "WHERE s2.o_custkey IS NULL OR s4.o_custkey IS NULL " +
        "OR s2.o_orderkey IS DISTINCT FROM s4.o_orderkey " +
        "OR s2.o_totalprice IS DISTINCT FROM s4.o_totalprice " +
        "ORDER BY run, o_custkey")),

    // SMALL-FILE COMPACTION (the Delta OPTIMIZE analog): a CDC batch's
    // staged write leaves up to shuffle.partitions part files per
    // bucket; optimize() rewrites over-fragmented buckets to their
    // size-appropriate file count as ONE new commit, content
    // unchanged (the oracle pins it), file-count reduction asserted
    // engine-side. Pre-compaction states stay time-travelable.
    Op("core_store_optimize",
      (s, d) => {
        val dir = s"target/tmp/optimize_${java.util.UUID.randomUUID().toString.take(8)}"
        graft.api.UpsertStore.update(
          T.t(s, d, "orders").select("o_custkey", "o_orderkey", "o_totalprice"),
          dir, "o_custkey", "o_orderkey", nBuckets = 8, batchId = Some("seed")): Unit
        def maxFiles(): Int = {
          val f = graft.api.StoreIO.fs(s, dir)
          (0 until 8).map { b =>
            val p = new org.apache.hadoop.fs.Path(s"$dir/b$b")
            if (!f.exists(p)) 0
            else f.listStatus(p).filter(_.isDirectory).map(_.getPath)
              .map(g => f.listStatus(g)
                .count(st => !st.isDirectory && st.getPath.getName.startsWith("part-")))
              .maxOption.getOrElse(0)
          }.maxOption.getOrElse(0)
        }
        val before = maxFiles()
        graft.api.UpsertStore.optimize(s, dir): Unit
        val after = maxFiles()
        require(after <= math.max(1, before),
          s"optimize must not fragment: $before -> $after files/bucket")
        val got = graft.api.UpsertStore.read(s, dir).localCheckpoint()
        graft.api.StoreIO.delete(s, dir)
        got.orderBy("o_custkey")
      },
      Some("WITH f AS (SELECT o_custkey, o_orderkey, o_totalprice, " +
        "row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey DESC) AS rn " +
        "FROM orders) " +
        "SELECT o_custkey, o_orderkey, o_totalprice FROM f WHERE rn = 1 " +
        "ORDER BY o_custkey")),

    // The MAINTENANCE SQL verbs closing the store's SQL-text surface
    // (OPTIMIZE / VACUUM ... RETAIN N COMMITS beside MERGE/DELETE/
    // UPDATE), plus VERSION AS OF read-back: four batches land via
    // MERGE, VACUUM RETAIN 2 advances the horizon to seq 3, OPTIMIZE
    // compacts, and the op ships the seq-3 snapshot and the current
    // table under one oracle — the SQL path driving retention, time
    // travel and compaction end-to-end.
    Op("core_store_maintenance_sql",
      (s, d) => {
        val dir = s"target/tmp/maint_sql_${java.util.UUID.randomUUID().toString.take(8)}"
        val t = T.t(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
          .withColumn("b", pmod(col("o_orderkey"), lit(4)))
        (0 to 3).foreach { b =>
          t.where(col("b") === b).drop("b")
            .createOrReplaceTempView(s"graft_maint_src_$b")
          graft.api.MergeSql.run(s,
            s"MERGE INTO '$dir' USING graft_maint_src_$b ON t.o_custkey = s.o_custkey " +
              "LATEST BY o_orderkey WHEN MATCHED THEN UPDATE SET * " +
              "WHEN NOT MATCHED THEN INSERT *",
            nBuckets = 8, batchId = Some(s"b$b")): Unit
        }
        val horizon = graft.api.MergeSql.runMaintenance(s,
          s"VACUUM '$dir' RETAIN 2 COMMITS")
        require(horizon == 3L, s"RETAIN 2 of 4 commits must set base_seq 3, got $horizon")
        graft.api.MergeSql.runMaintenance(s, s"OPTIMIZE '$dir'"): Unit
        val asof = graft.api.MergeSql.readTarget(s, dir, versionAsOf = Some(3L))
          .withColumn("snap", lit("asof3"))
        val cur = graft.api.MergeSql.readTarget(s, dir)
          .withColumn("snap", lit("current"))
        val got = asof.unionByName(cur).localCheckpoint()
        graft.api.StoreIO.delete(s, dir)
        got.orderBy("snap", "o_custkey")
      },
      Some("WITH t AS (SELECT o_custkey, o_orderkey, o_totalprice, o_orderkey % 4 AS b FROM orders), " +
        "m3 AS (SELECT o_custkey, max(b) AS mb FROM t WHERE b <= 2 GROUP BY 1), " +
        "f3 AS (SELECT t.o_custkey, t.o_orderkey, t.o_totalprice, " +
        "row_number() OVER (PARTITION BY t.o_custkey ORDER BY t.o_orderkey DESC) AS rn " +
        "FROM t JOIN m3 ON t.o_custkey = m3.o_custkey AND t.b = m3.mb), " +
        "m4 AS (SELECT o_custkey, max(b) AS mb FROM t GROUP BY 1), " +
        "f4 AS (SELECT t.o_custkey, t.o_orderkey, t.o_totalprice, " +
        "row_number() OVER (PARTITION BY t.o_custkey ORDER BY t.o_orderkey DESC) AS rn " +
        "FROM t JOIN m4 ON t.o_custkey = m4.o_custkey AND t.b = m4.mb) " +
        "SELECT o_custkey, o_orderkey, o_totalprice, 'asof3' AS snap FROM f3 WHERE rn = 1 " +
        "UNION ALL " +
        "SELECT o_custkey, o_orderkey, o_totalprice, 'current' AS snap FROM f4 WHERE rn = 1 " +
        "ORDER BY snap, o_custkey")),

    // Chi-squared independence test (market segment x nation band on
    // customer) — the categorical companion to rel_ks_drift_test /
    // rel_psi_drift / rel_ab_welch_ttest: per-cell observed counts,
    // expected under independence, and the chi2 contribution, all in
    // integer fixed point ((o*n - r*c)^2 * 1e6 div (r*c*n) — no
    // cross-engine float summation to trust; DECIMAL(38) headroom
    // holds to ~1e8 rows x 1e8 cell counts, normalize first beyond).
    // One map-side-combinable groupBy builds the 25-cell contingency;
    // margins and the total are bounded broadcast joins off it.
    Op("rel_chi2_independence",
      (s, d) => {
        val cell = T.t(s, d, "customer")
          .groupBy(col("c_mktsegment"), expr("c_nationkey % 5").as("nat_band"))
          .agg(count(lit(1)).as("o"))
        val rm = cell.groupBy("c_mktsegment").agg(sum("o").as("r"))
        val cm = cell.groupBy("nat_band").agg(sum("o").as("c"))
        val nn = cell.agg(sum("o").as("n"))
        val dlt = "(CAST(o AS DECIMAL(38,0)) * n - CAST(r AS DECIMAL(38,0)) * c)"
        cell.join(broadcast(rm), "c_mktsegment")
          .join(broadcast(cm), "nat_band")
          .crossJoin(broadcast(nn))
          .select(col("c_mktsegment"), col("nat_band"), col("o").as("n_obs"),
            expr("CAST(CAST(r AS DECIMAL(38,0)) * c * 1000000 div n AS BIGINT)")
              .as("expected_ppm"),
            expr(s"CAST($dlt * $dlt * 1000000 div " +
              "(CAST(r AS DECIMAL(38,0)) * c * n) AS BIGINT)").as("contrib_ppm"))
          .orderBy("c_mktsegment", "nat_band")
      },
      Some("WITH cell AS (SELECT c_mktsegment, c_nationkey % 5 AS nat_band, " +
        "count(*) AS o FROM customer GROUP BY 1, 2), " +
        "r AS (SELECT c_mktsegment, sum(o) AS r FROM cell GROUP BY 1), " +
        "c AS (SELECT nat_band, sum(o) AS c FROM cell GROUP BY 1), " +
        "nn AS (SELECT sum(o) AS n FROM cell) " +
        "SELECT cell.c_mktsegment, cell.nat_band, o AS n_obs, " +
        "CAST(CAST(r.r AS HUGEINT) * c.c * 1000000 // nn.n AS BIGINT) AS expected_ppm, " +
        "CAST((CAST(o AS HUGEINT) * nn.n - CAST(r.r AS HUGEINT) * c.c) * " +
        "(CAST(o AS HUGEINT) * nn.n - CAST(r.r AS HUGEINT) * c.c) * 1000000 // " +
        "(CAST(r.r AS HUGEINT) * c.c * nn.n) AS BIGINT) AS contrib_ppm " +
        "FROM cell JOIN r USING (c_mktsegment) JOIN c USING (nat_band), nn " +
        "ORDER BY c_mktsegment, nat_band")),
  )
}
