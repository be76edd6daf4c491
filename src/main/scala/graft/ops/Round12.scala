package graft.ops

import graft.{Op, Tables => T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round 12: the store's 100-TB posture hardening surfaced as ops —
  * the MERGE full-sync UPDATE arm, the wall-clock time-travel SQL
  * surface, OPTIMIZE ZORDER, the live changefeed source, the
  * retained-store consumer bootstrap (the round-11 ADVICE fix),
  * RESTORE / deep CLONE / DESCRIBE HISTORY / DESCRIBE, row-version
  * audit, CHECK constraints, CDF pre/post images, incremental
  * materialized views (batch + continuous), and a Holt-Winters
  * seasonal forecast.
  */
object Round12 {

  /** Latest-order-per-customer seed frame with exact integer money
    * (cents) — the same shared DML fixture Round11 uses, so every
    * oracle is integer-exact on both engines.
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

    // MERGE's full-sync UPDATE arm: `WHEN NOT MATCHED BY SOURCE AND
    // <pred> THEN UPDATE SET ...` — flag stale rows instead of (or
    // beside) sweeping them. Stored keys absent from the snapshot:
    // every 7th customer gets its discount column rewritten FROM the
    // pre-update row (ANSI), even customers are swept by the DELETE
    // arm, and where both arms match, UPDATE wins (first-match-wins in
    // the fixed clause order — the oracle pins a customer divisible by
    // both 7 and 2 as updated, not deleted). Replay with the same
    // batchId asserted a no-op inline.
    Op("core_merge_full_sync_update",
      (s, d) => {
        val dir = s"target/tmp/sync_upd_${java.util.UUID.randomUUID().toString.take(8)}"
        seedSrc(s, d).createOrReplaceTempView("graft_syncu_seed")
        graft.api.MergeSql.run(s,
          s"MERGE INTO '$dir' USING graft_syncu_seed ON t.o_custkey = s.o_custkey " +
            "LATEST BY o_orderkey WHEN MATCHED THEN UPDATE SET * " +
            "WHEN NOT MATCHED THEN INSERT *",
          nBuckets = 8, batchId = Some("seed")): Unit
        seedSrc(s, d).where("o_custkey % 3 <> 1")
          .select(col("o_custkey"), col("o_orderkey"),
            (col("total_cents") + 1).as("total_cents"), col("disc_cents"))
          .createOrReplaceTempView("graft_syncu_snap")
        val sync =
          s"MERGE INTO '$dir' USING graft_syncu_snap ON t.o_custkey = s.o_custkey " +
            "LATEST BY o_orderkey WHEN MATCHED THEN UPDATE SET * " +
            "WHEN NOT MATCHED THEN INSERT * " +
            "WHEN NOT MATCHED BY SOURCE AND o_custkey % 7 = 0 " +
            "THEN UPDATE SET disc_cents = total_cents " +
            "WHEN NOT MATCHED BY SOURCE AND o_custkey % 2 = 0 THEN DELETE"
        graft.api.MergeSql.run(s, sync, nBuckets = 8, batchId = Some("sync")): Unit
        require(!graft.api.MergeSql.run(s, sync, nBuckets = 8, batchId = Some("sync")),
          "replayed full-sync MERGE must be a ledger no-op")
        val got = graft.api.MergeSql.readTarget(s, dir).localCheckpoint()
        graft.api.StoreIO.delete(s, dir)
        got.orderBy("o_custkey")
      },
      Some(s"WITH $oSeed " +
        "SELECT o_custkey, o_orderkey, total_cents + 1 AS total_cents, disc_cents " +
        "FROM l WHERE o_custkey % 3 <> 1 " +
        "UNION ALL " +
        "SELECT o_custkey, o_orderkey, total_cents, total_cents AS disc_cents " +
        "FROM l WHERE o_custkey % 3 = 1 AND o_custkey % 7 = 0 " +
        "UNION ALL " +
        "SELECT o_custkey, o_orderkey, total_cents, disc_cents " +
        "FROM l WHERE o_custkey % 3 = 1 AND o_custkey % 7 <> 0 AND o_custkey % 2 <> 0 " +
        "ORDER BY o_custkey")),

    // TIMESTAMP AS OF on the SQL surface — the wall-clock time-travel
    // form analysts actually type, resolved through the commit log's
    // ts_ms to the newest commit at-or-before the instant. Three CDC
    // batches commit as seqs 1..3 (a short sleep pins strictly
    // increasing timestamps); both literal forms — epoch millis and a
    // quoted UTC 'yyyy-MM-dd HH:mm:ss.SSS' — read back the seq-2
    // snapshot under one oracle.
    Op("core_store_timestamp_as_of",
      (s, d) => {
        val dir = s"target/tmp/ts_asof_${java.util.UUID.randomUUID().toString.take(8)}"
        val t = T.t(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
          .withColumn("b", pmod(col("o_orderkey"), lit(3)))
        (0 to 2).foreach { b =>
          graft.api.UpsertStore.update(
            t.where(col("b") === b).drop("b"), dir, "o_custkey", "o_orderkey",
            nBuckets = 8, batchId = Some(s"b$b")): Unit
          Thread.sleep(15) // commit timestamps must strictly increase
        }
        val ts = graft.api.UpsertStore.commits(s, dir)
          .select("seq", "ts_ms").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        require(ts(3L) > ts(2L), "commit timestamps must strictly increase")
        val quoted = java.time.Instant.ofEpochMilli(ts(2L))
          .atOffset(java.time.ZoneOffset.UTC).toLocalDateTime
          .format(java.time.format.DateTimeFormatter
            .ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
        val viaMillis = graft.api.MergeSql.runSelect(s,
          s"SELECT * FROM '$dir' TIMESTAMP AS OF ${ts(2L)}")
          .withColumn("form", lit("millis"))
        val viaQuoted = graft.api.MergeSql.runSelect(s,
          s"SELECT * FROM '$dir' TIMESTAMP AS OF '$quoted'")
          .withColumn("form", lit("quoted"))
        val got = viaMillis.unionByName(viaQuoted).localCheckpoint()
        graft.api.StoreIO.delete(s, dir)
        got.orderBy("form", "o_custkey")
      },
      Some("WITH t AS (SELECT o_custkey, o_orderkey, o_totalprice, o_orderkey % 3 AS b FROM orders), " +
        "m2 AS (SELECT o_custkey, max(b) AS mb FROM t WHERE b <= 1 GROUP BY 1), " +
        "f2 AS (SELECT t.o_custkey, t.o_orderkey, t.o_totalprice, " +
        "row_number() OVER (PARTITION BY t.o_custkey ORDER BY t.o_orderkey DESC) AS rn " +
        "FROM t JOIN m2 ON t.o_custkey = m2.o_custkey AND t.b = m2.mb) " +
        "SELECT o_custkey, o_orderkey, o_totalprice, 'millis' AS form FROM f2 WHERE rn = 1 " +
        "UNION ALL " +
        "SELECT o_custkey, o_orderkey, o_totalprice, 'quoted' AS form FROM f2 WHERE rn = 1 " +
        "ORDER BY form, o_custkey")),

    // OPTIMIZE ... ZORDER BY: compaction that also CLUSTERS — every
    // bucket rewrites as one commit whose files cover contiguous
    // ranges of the cluster key (range partition on (bucket, morton
    // key) + sort within partitions), so a stats-pruning reader skips
    // files the way Delta's OPTIMIZE ZORDER buys. The SQL grammar form
    // runs first; a second pass with a tiny file target forces
    // multi-file buckets and the op audits engine-side that per-file
    // key spans within a bucket are near-disjoint slices (sum of
    // spans <~ bucket span, vs ~span x nFiles unclustered). Content
    // and time travel are pinned unchanged by the oracle.
    Op("core_store_optimize_zorder",
      (s, d) => {
        val dir = s"target/tmp/opt_z_${java.util.UUID.randomUUID().toString.take(8)}"
        graft.api.UpsertStore.update(
          T.t(s, d, "orders").select("o_custkey", "o_orderkey", "o_totalprice"),
          dir, "o_custkey", "o_orderkey", nBuckets = 8, batchId = Some("seed")): Unit
        graft.api.MergeSql.runMaintenance(s,
          s"OPTIMIZE '$dir' ZORDER BY (o_orderkey)"): Unit
        graft.api.UpsertStore.optimize(s, dir,
          targetFileBytes = 16L * 1024, zorderBy = Seq("o_orderkey")): Unit
        // clustering audit: within each bucket, per-file o_orderkey
        // ranges must be near-disjoint (only meaningful with several
        // files; degenerate fixtures skip the check, not the op)
        val perFile = graft.api.UpsertStore.read(s, dir)
          .groupBy(regexp_extract(input_file_name(), "/(b\\d+)/g\\d{12}/", 1).as("bk"),
            input_file_name().as("fn"))
          .agg(min("o_orderkey").as("mn"), max("o_orderkey").as("mx"))
          .groupBy("bk").agg(
            count(lit(1)).as("nf"),
            sum(col("mx") - col("mn")).as("sum_span"),
            (max("mx") - min("mn")).as("span"))
          .collect()
        perFile.filter(r => r.getLong(1) >= 3 && r.getLong(3) > 0).foreach { r =>
          require(r.getLong(2) <= 2 * r.getLong(3),
            s"bucket ${r.getString(0)}: files not z-clustered " +
              s"(sum of per-file spans ${r.getLong(2)} vs bucket span ${r.getLong(3)})")
        }
        // pre-optimize history must still reconstruct (time travel
        // unaffected by clustering commits)
        val n1 = graft.api.UpsertStore.readAsOf(s, dir, 1L).count()
        val nc = graft.api.UpsertStore.read(s, dir).count()
        require(n1 == nc, s"optimize must not change content: $n1 vs $nc rows")
        val got = graft.api.UpsertStore.read(s, dir).localCheckpoint()
        graft.api.StoreIO.delete(s, dir)
        got.orderBy("o_custkey")
      },
      Some("WITH f AS (SELECT o_custkey, o_orderkey, o_totalprice, " +
        "row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey DESC) AS rn " +
        "FROM orders) " +
        "SELECT o_custkey, o_orderkey, o_totalprice FROM f WHERE rn = 1 " +
        "ORDER BY o_custkey")),

    // The store changefeed as a LIVE STREAMING SOURCE (Delta CDF
    // streaming-read analog): a rate-ticker-driven relay polls
    // changesSince per trigger, lands each commit window into the
    // output partitioned by its head seq (dynamic overwrite — crash
    // redelivery overwrites, never duplicates), and advances the
    // durable cursor. Window 1 (the initial load, every row an insert)
    // drains through the RUNNING STREAM; window 2 (a batch + a delete
    // sweep) through the identical per-trigger relay unit. Parity: the
    // oracle is core_store_incremental_consume's — the streaming path
    // must equal the batch consumer exactly.
    Op("strm_changefeed_source",
      (s, d) => {
        val base = s"target/tmp/cfsrc_${java.util.UUID.randomUUID().toString.take(8)}"
        val dir = s"$base/table"
        val cursor = s"$base/cursor.json"
        val out = s"$base/out"
        val t = T.t(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
          .withColumn("b", pmod(col("o_orderkey"), lit(3)))
        def batch(b: Int): Unit = graft.api.UpsertStore.update(
          t.where(col("b") === b).drop("b"), dir, "o_custkey", "o_orderkey",
          nBuckets = 8, batchId = Some(s"b$b")): Unit
        batch(0); batch(1)
        def cursorAt(): Long = graft.api.StoreIO.readSmall(s, cursor)
          .map(new com.fasterxml.jackson.databind.ObjectMapper()
            .readTree(_).get("last_seq").asLong()).getOrElse(-1L)
        val q = graft.streaming.Streams.changefeedStream(
          s, dir, "o_custkey", cursor, out, s"$base/ckpt", pollIntervalMs = 200L)
        try {
          val deadline = System.currentTimeMillis() + 120000L
          while (cursorAt() < 2L && System.currentTimeMillis() < deadline)
            Thread.sleep(25) // cursor check is a driver-side file read;
                             // a tight poll shaves dead time after the
                             // relay's first trigger has already drained
          require(cursorAt() == 2L,
            s"stream must drain the 2-commit window, cursor at ${cursorAt()}")
        } finally q.stop()
        batch(2)
        graft.api.UpsertStore.delete(s, dir, expr("o_custkey % 10 = 3"),
          batchId = Some("sweep")): Unit
        graft.streaming.Streams.changefeedRelayOnce(
          s, dir, "o_custkey", cursor, out): Unit
        require(cursorAt() == 4L, s"relay must advance to head 4, at ${cursorAt()}")
        // an all-empty-window run writes no parquet files at all
        val raw = scala.util.Try(s.read.parquet(out)).getOrElse(
          s.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](),
            StructType(Seq(
              StructField("change", StringType), StructField("o_custkey", LongType),
              StructField("o_orderkey", LongType),
              StructField("o_totalprice", DoubleType),
              StructField("to_seq", IntegerType)))))
        val got = raw
          .withColumn("run", when(col("to_seq") === 2, lit("r1")).otherwise(lit("r2")))
          .drop("to_seq").localCheckpoint()
        graft.api.StoreIO.delete(s, base)
        got.orderBy("run", "o_custkey")
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

    // CONSUMER BOOTSTRAP ON A RETAINED STORE — the round-11 ADVICE
    // fix pinned as an op: four batches commit, retention advances the
    // horizon to seq 3, and only THEN does a brand-new consumer attach
    // (no cursor). It must receive the FULL snapshot as inserts — the
    // pre-fix behavior diffed from the horizon snapshot and silently
    // omitted every row already present and unchanged at base_seq,
    // losing most of the table with no error.
    Op("core_changefeed_bootstrap",
      (s, d) => {
        val base = s"target/tmp/cf_boot_${java.util.UUID.randomUUID().toString.take(8)}"
        val dir = s"$base/table"
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
        require(graft.api.UpsertStore.baseSeq(s, dir) == 3L,
          "retention must advance the horizon to seq 3")
        val (changes, head) = graft.api.UpsertStore
          .changesSince(s, dir, "o_custkey", s"$base/cursor.json")
        require(head == 4L, s"head must be seq 4, got $head")
        val got = changes.localCheckpoint()
        graft.api.StoreIO.delete(s, base)
        got.orderBy("o_custkey")
      },
      Some("WITH t AS (SELECT o_custkey, o_orderkey, o_orderkey % 4 AS b FROM orders), " +
        "m AS (SELECT o_custkey, max(b) AS mb FROM t GROUP BY 1), " +
        "f AS (SELECT t.o_custkey, t.o_orderkey, " +
        "row_number() OVER (PARTITION BY t.o_custkey ORDER BY t.o_orderkey DESC) AS rn " +
        "FROM t JOIN m ON t.o_custkey = m.o_custkey AND t.b = m.mb) " +
        "SELECT 'insert' AS change, o_custkey, o_orderkey FROM f WHERE rn = 1 " +
        "ORDER BY o_custkey")),

    // RESTORE — Delta's undo verb: `RESTORE '<dir>' TO VERSION AS OF
    // 2` republishes the seq-2 state as a NEW head commit (seq 4), so
    // a bad merge is undone WITHOUT losing the history after it —
    // asOf(3) still serves the pre-restore head until retention
    // retires it. O(1) jobs: only buckets whose head generation
    // differs from the asof one are copied back; the op ships both the
    // restored current table and the still-travelable pre-restore
    // snapshot under one oracle.
    Op("core_store_restore",
      (s, d) => {
        val dir = s"target/tmp/restore_${java.util.UUID.randomUUID().toString.take(8)}"
        val t = T.t(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
          .withColumn("b", pmod(col("o_orderkey"), lit(3)))
        (0 to 2).foreach { b =>
          graft.api.UpsertStore.update(
            t.where(col("b") === b).drop("b"), dir, "o_custkey", "o_orderkey",
            nBuckets = 8, batchId = Some(s"b$b")): Unit
        }
        val newHead = graft.api.MergeSql.runMaintenance(s,
          s"RESTORE '$dir' TO VERSION AS OF 2")
        require(newHead == 4L, s"restore must commit as head 4, got $newHead")
        val restored = graft.api.UpsertStore.read(s, dir)
          .withColumn("snap", lit("restored"))
        val pre = graft.api.UpsertStore.readAsOf(s, dir, 3L)
          .withColumn("snap", lit("pre"))
        val got = pre.unionByName(restored).localCheckpoint()
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
        "SELECT o_custkey, o_orderkey, o_totalprice, 'pre' AS snap FROM f3 WHERE rn = 1 " +
        "UNION ALL " +
        "SELECT o_custkey, o_orderkey, o_totalprice, 'restored' AS snap FROM f2 WHERE rn = 1 " +
        "ORDER BY snap, o_custkey")),

    // Deep CLONE at a version — the dev/test branch verb: `CLONE
    // '<src>' TO '<dst>' VERSION AS OF 2` builds a NEW store holding
    // the seq-2 state (one generation per bucket, base_seq pinned
    // there). The carried ledger is TRIMMED to the cloned version:
    // a replay of a batch the clone contains is a no-op (asserted
    // inline), while later source batches re-apply as fresh data.
    // Source and clone then evolve independently — a sweep on the
    // source leaves the clone untouched, pinned by the oracle.
    Op("core_store_clone",
      (s, d) => {
        val base = s"target/tmp/clone_${java.util.UUID.randomUUID().toString.take(8)}"
        val dir = s"$base/src"
        val dst = s"$base/branch"
        val t = T.t(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
          .withColumn("b", pmod(col("o_orderkey"), lit(3)))
        (0 to 2).foreach { b =>
          graft.api.UpsertStore.update(
            t.where(col("b") === b).drop("b"), dir, "o_custkey", "o_orderkey",
            nBuckets = 8, batchId = Some(s"b$b")): Unit
        }
        val v = graft.api.MergeSql.runMaintenance(s,
          s"CLONE '$dir' TO '$dst' VERSION AS OF 2")
        require(v == 2L, s"clone must report version 2, got $v")
        require(!graft.api.UpsertStore.update(
          t.where(col("b") === 1).drop("b"), dst, "o_custkey", "o_orderkey",
          nBuckets = 8, batchId = Some("b1")),
          "replay of a contained batch into the clone must be a ledger no-op")
        graft.api.UpsertStore.delete(s, dir, expr("o_custkey % 10 = 3"),
          batchId = Some("sweep")): Unit
        val got = graft.api.UpsertStore.read(s, dst).withColumn("snap", lit("clone"))
          .unionByName(
            graft.api.UpsertStore.read(s, dir).withColumn("snap", lit("src")))
          .localCheckpoint()
        graft.api.StoreIO.delete(s, base)
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
        "SELECT o_custkey, o_orderkey, o_totalprice, 'clone' AS snap FROM f2 WHERE rn = 1 " +
        "UNION ALL " +
        "SELECT o_custkey, o_orderkey, o_totalprice, 'src' AS snap FROM f3 " +
        "WHERE rn = 1 AND o_custkey % 10 <> 3 " +
        "ORDER BY snap, o_custkey")),

    // DESCRIBE HISTORY: the commit log as a queryable table — one row
    // per state-changing commit with its seq, kind and applied-batch
    // id (timestamps excluded: wall-clock). A scripted
    // merge/merge/delete/restore sequence yields a fully deterministic
    // audit trail on EVERY fixture (ledgered mutations commit even
    // when they change nothing, which is exactly what makes their
    // replays exact no-ops).
    Op("core_store_history",
      (s, d) => {
        val dir = s"target/tmp/history_${java.util.UUID.randomUUID().toString.take(8)}"
        val t = T.t(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"))
          .withColumn("b", pmod(col("o_orderkey"), lit(2)))
        (0 to 1).foreach { b =>
          graft.api.UpsertStore.update(
            t.where(col("b") === b).drop("b"), dir, "o_custkey", "o_orderkey",
            nBuckets = 8, batchId = Some(s"b$b")): Unit
        }
        graft.api.UpsertStore.delete(s, dir, expr("o_custkey % 10 = 3"),
          batchId = Some("sweep")): Unit
        graft.api.UpsertStore.restore(s, dir, 1L, batchId = Some("rst")): Unit
        val got = graft.api.UpsertStore.commits(s, dir)
          .select("seq", "kind", "batch_id").localCheckpoint()
        graft.api.StoreIO.delete(s, dir)
        got.orderBy("seq")
      },
      Some("SELECT * FROM (VALUES (CAST(1 AS BIGINT), 'merge', 'b0'), " +
        "(2, 'merge', 'b1'), (3, 'delete', 'sweep'), (4, 'restore', 'rst')) " +
        "AS t(seq, kind, batch_id) ORDER BY seq")),

    // CDF IMAGE FEED (Delta CDF parity): an update emits BOTH rows —
    // update_preimage (replaced values) and update_postimage (new
    // ones) — beside insert/delete. The pair is what downstream
    // incremental maintenance consumes (subtract pre, add post), and
    // what the after-image-only feed cannot express when an update
    // moves a row between groups. Same bucket-path pruning as the
    // plain changefeed; the pair explodes from ONE joined row.
    Op("core_store_cdf_images",
      (s, d) => {
        val dir = s"target/tmp/cdf_img_${java.util.UUID.randomUUID().toString.take(8)}"
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
          .changesBetweenImages(s, dir, fromSeq = 1L, toSeq = 3L, key = "o_custkey")
          .localCheckpoint()
        graft.api.StoreIO.delete(s, dir)
        got.orderBy("o_custkey", "change")
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
        "WHERE rn = 1 AND o_custkey % 10 <> 3), " +
        "cls AS (SELECT s1.o_custkey AS k1, s1.o_orderkey AS ok1, s1.o_totalprice AS tp1, " +
        "s3.o_custkey AS k3, s3.o_orderkey AS ok3, s3.o_totalprice AS tp3 " +
        "FROM s1 FULL OUTER JOIN s3 ON s1.o_custkey = s3.o_custkey " +
        "WHERE s1.o_custkey IS NULL OR s3.o_custkey IS NULL " +
        "OR s1.o_orderkey IS DISTINCT FROM s3.o_orderkey " +
        "OR s1.o_totalprice IS DISTINCT FROM s3.o_totalprice) " +
        "SELECT CASE WHEN k3 IS NULL THEN 'delete' ELSE 'update_preimage' END AS change, " +
        "k1 AS o_custkey, ok1 AS o_orderkey, tp1 AS o_totalprice FROM cls WHERE k1 IS NOT NULL " +
        "UNION ALL " +
        "SELECT CASE WHEN k1 IS NULL THEN 'insert' ELSE 'update_postimage' END AS change, " +
        "k3 AS o_custkey, ok3 AS o_orderkey, tp3 AS o_totalprice FROM cls WHERE k3 IS NOT NULL " +
        "ORDER BY o_custkey, change")),

    // INCREMENTAL MATERIALIZED VIEW — grouped sum/count maintained
    // from the CDF image feed, never recomputed from the fact table:
    // refresh 1 seeds from the snapshot; batch 3 + a delete sweep
    // land; refresh 2 folds exactly the image window (subtract
    // preimages, add postimages — the group key derives from
    // o_orderkey, so every updated customer MOVES groups and both
    // sides must adjust). The oracle is the from-scratch recompute
    // over the final store state: incremental == full, exactly. A
    // third refresh with nothing new is a no-op (asserted inline).
    Op("core_incremental_matview",
      (s, d) => {
        val base = s"target/tmp/matview_${java.util.UUID.randomUUID().toString.take(8)}"
        val dir = s"$base/fact"
        val view = s"$base/view"
        val t = T.t(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("cents"))
          .withColumn("b", pmod(col("o_orderkey"), lit(3)))
        def batch(b: Int): Unit = graft.api.UpsertStore.update(
          t.where(col("b") === b).drop("b"), dir, "o_custkey", "o_orderkey",
          nBuckets = 8, batchId = Some(s"b$b")): Unit
        def refresh(): Long = graft.api.MatView.refresh(s, dir, "o_custkey", view,
          groupCols = Seq("grp" -> pmod(col("o_orderkey"), lit(10))),
          sumCols = Seq("cents"))
        batch(0); batch(1)
        require(refresh() == 2L, "first refresh must reach head 2")
        batch(2)
        graft.api.UpsertStore.delete(s, dir, expr("o_custkey % 10 = 3"),
          batchId = Some("sweep")): Unit
        require(refresh() == 4L, "second refresh must reach head 4")
        require(refresh() == 4L, "refresh with nothing new must be a no-op")
        val got = graft.api.MatView.read(s, view).localCheckpoint()
        graft.api.StoreIO.delete(s, base)
        got.orderBy("grp")
      },
      Some("WITH t AS (SELECT o_custkey, o_orderkey, " +
        "CAST(floor(o_totalprice * 100) AS BIGINT) AS cents, o_orderkey % 3 AS b FROM orders), " +
        "m AS (SELECT o_custkey, max(b) AS mb FROM t GROUP BY 1), " +
        "f AS (SELECT t.o_custkey, t.o_orderkey, t.cents, " +
        "row_number() OVER (PARTITION BY t.o_custkey ORDER BY t.o_orderkey DESC) AS rn " +
        "FROM t JOIN m ON t.o_custkey = m.o_custkey AND t.b = m.mb), " +
        "cur AS (SELECT o_custkey, o_orderkey, cents FROM f " +
        "WHERE rn = 1 AND o_custkey % 10 <> 3) " +
        "SELECT o_orderkey % 10 AS grp, count(*) AS n_rows, " +
        "CAST(sum(cents) AS BIGINT) AS sum_cents " +
        "FROM cur GROUP BY 1 ORDER BY grp")),

    // CHECK CONSTRAINTS (Delta parity): `ALTER '<dir>' ADD CONSTRAINT
    // nonneg CHECK (total_cents >= 0)` validates the EXISTING table
    // first (a green ADD is a guarantee), then every write validates
    // its staged output BEFORE any generation publishes — the
    // violating merge here throws with the constraint name, the store
    // stays at its prior state and its commit seq does not advance
    // (asserted inline). After DROP CONSTRAINT the same batch applies.
    Op("core_store_constraints",
      (s, d) => {
        import s.implicits._
        val dir = s"target/tmp/constraints_${java.util.UUID.randomUUID().toString.take(8)}"
        seedSrc(s, d).createOrReplaceTempView("graft_cons_seed")
        graft.api.MergeSql.run(s,
          s"MERGE INTO '$dir' USING graft_cons_seed ON t.o_custkey = s.o_custkey " +
            "LATEST BY o_orderkey WHEN MATCHED THEN UPDATE SET * " +
            "WHEN NOT MATCHED THEN INSERT *",
          nBuckets = 8, batchId = Some("seed")): Unit
        require(graft.api.MergeSql.runMaintenance(s,
          s"ALTER '$dir' ADD CONSTRAINT nonneg CHECK (total_cents >= 0)") == 1L)
        graft.api.MergeSql.runUpdate(s,
          s"UPDATE '$dir' SET total_cents = total_cents + 1 WHERE o_custkey % 2 = 0",
          batchId = Some("u1")): Unit
        val badRow = Seq((-7L, 0L, -5L, 0L))
          .toDF("o_custkey", "o_orderkey", "total_cents", "disc_cents")
        val rejected =
          try { graft.api.UpsertStore.update(badRow, dir, "o_custkey", "o_orderkey",
            nBuckets = 8, batchId = Some("bad")): Unit; false }
          catch { case e: IllegalArgumentException =>
            e.getMessage.contains("CHECK constraint nonneg") }
        require(rejected, "a violating merge batch must be rejected by name")
        require(graft.api.UpsertStore.snapshotSeq(s, dir) == 2L,
          "a rejected batch must not advance the commit seq")
        require(graft.api.MergeSql.runMaintenance(s,
          s"ALTER '$dir' DROP CONSTRAINT nonneg") == 0L)
        graft.api.UpsertStore.update(badRow, dir, "o_custkey", "o_orderkey",
          nBuckets = 8, batchId = Some("bad")): Unit
        val got = graft.api.UpsertStore.read(s, dir).localCheckpoint()
        graft.api.StoreIO.delete(s, dir)
        got.orderBy("o_custkey")
      },
      Some(s"WITH $oSeed " +
        "SELECT o_custkey, o_orderkey, " +
        "CASE WHEN o_custkey % 2 = 0 THEN total_cents + 1 ELSE total_cents END AS total_cents, " +
        "disc_cents FROM l " +
        "UNION ALL SELECT CAST(-7 AS BIGINT), CAST(0 AS BIGINT), " +
        "CAST(-5 AS BIGINT), CAST(0 AS BIGINT) " +
        "ORDER BY o_custkey")),

    // ROW-LEVEL AUDIT HISTORY (UpsertStore.rowVersions): a probed
    // key's full value timeline over the retention window, in ONE
    // bucket-pruned scan of every retained generation of ONLY its
    // bucket — the query the immutable generation log answers that a
    // mutate-in-place table cannot. Each probed customer appears once
    // per commit that rewrote its bucket while present (single-bucket
    // store here so every commit rewrites — the semantics under test;
    // bucket pruning is spec-pinned separately). Oracle replays the
    // per-commit last-batch-wins states.
    Op("core_store_row_history",
      (s, d) => {
        val dir = s"target/tmp/row_hist_${java.util.UUID.randomUUID().toString.take(8)}"
        val t = T.t(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"))
          .withColumn("b", pmod(col("o_orderkey"), lit(3)))
        (0 to 2).foreach { b =>
          graft.api.UpsertStore.update(
            t.where(col("b") === b).drop("b"), dir, "o_custkey", "o_orderkey",
            nBuckets = 1, batchId = Some(s"b$b")): Unit
        }
        val probes = T.t(s, d, "orders")
          .where("o_custkey % 101 = 0").select("o_custkey").distinct()
        val got = graft.api.UpsertStore.rowVersions(probes, dir, "o_custkey")
          .select("o_custkey", "commit_seq", "o_orderkey").localCheckpoint()
        graft.api.StoreIO.delete(s, dir)
        got.orderBy("o_custkey", "commit_seq")
      },
      Some("WITH t AS (SELECT o_custkey, o_orderkey, o_orderkey % 3 AS b FROM orders), " +
        "f AS (SELECT h.commit_seq, t.o_custkey, t.o_orderkey, " +
        "row_number() OVER (PARTITION BY h.commit_seq, t.o_custkey " +
        "ORDER BY t.b DESC, t.o_orderkey DESC) AS rn " +
        "FROM (VALUES (1), (2), (3)) h(commit_seq) JOIN t ON t.b < h.commit_seq) " +
        "SELECT o_custkey, CAST(commit_seq AS BIGINT) AS commit_seq, o_orderkey " +
        "FROM f WHERE rn = 1 AND o_custkey % 101 = 0 " +
        "ORDER BY o_custkey, commit_seq")),

    // CONTINUOUS IVM — the materialized view maintained by a LIVE
    // streaming query (rate ticker -> MatView.refresh per trigger):
    // the stream drains the 2-batch seed window, stops; batch 3 and a
    // delete sweep land; a second live run folds exactly the delta.
    // Oracle = the from-scratch recompute over the final store — the
    // streaming-maintained view must equal it exactly, same contract
    // as the batch refresh op (the per-trigger unit IS the same).
    Op("strm_matview_sink",
      (s, d) => {
        val base = s"target/tmp/mv_strm_${java.util.UUID.randomUUID().toString.take(8)}"
        val dir = s"$base/fact"
        val view = s"$base/view"
        val t = T.t(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("cents"))
          .withColumn("b", pmod(col("o_orderkey"), lit(3)))
        def batch(b: Int): Unit = graft.api.UpsertStore.update(
          t.where(col("b") === b).drop("b"), dir, "o_custkey", "o_orderkey",
          nBuckets = 8, batchId = Some(s"b$b")): Unit
        val gcols = Seq("grp" -> pmod(col("o_orderkey"), lit(10)))
        def drainTo(untilSeq: Long): Unit = {
          val deadline = System.currentTimeMillis() + 120000L
          while (graft.api.MatView.cursor(s, view) < untilSeq &&
              System.currentTimeMillis() < deadline)
            Thread.sleep(25)
          require(graft.api.MatView.cursor(s, view) == untilSeq,
            s"live view must reach seq $untilSeq, at ${graft.api.MatView.cursor(s, view)}")
        }
        batch(0); batch(1)
        // ONE long-lived stream follows the store across BOTH commit
        // windows — the production shape (a live view is not restarted
        // per upstream batch), and one stream start/stop lifecycle
        // instead of two. The view cursor stays the source of truth
        // per trigger; the fresh-checkpoint restart semantics this op
        // used to re-demonstrate in its second window is pinned by
        // StreamingParitySpec ("matviewStream: fresh checkpoint
        // resumes from the view cursor").
        val q = graft.streaming.Streams.matviewStream(s, dir, "o_custkey", view,
          gcols, Seq("cents"), s"$base/ckpt1", pollIntervalMs = 200L)
        try {
          drainTo(2L)
          batch(2)
          graft.api.UpsertStore.delete(s, dir, expr("o_custkey % 10 = 3"),
            batchId = Some("sweep")): Unit
          drainTo(4L)
        } finally q.stop()
        val got = graft.api.MatView.read(s, view).localCheckpoint()
        graft.api.StoreIO.delete(s, base)
        got.orderBy("grp")
      },
      Some("WITH t AS (SELECT o_custkey, o_orderkey, " +
        "CAST(floor(o_totalprice * 100) AS BIGINT) AS cents, o_orderkey % 3 AS b FROM orders), " +
        "m AS (SELECT o_custkey, max(b) AS mb FROM t GROUP BY 1), " +
        "f AS (SELECT t.o_custkey, t.o_orderkey, t.cents, " +
        "row_number() OVER (PARTITION BY t.o_custkey ORDER BY t.o_orderkey DESC) AS rn " +
        "FROM t JOIN m ON t.o_custkey = m.o_custkey AND t.b = m.mb), " +
        "cur AS (SELECT o_custkey, o_orderkey, cents FROM f " +
        "WHERE rn = 1 AND o_custkey % 10 <> 3) " +
        "SELECT o_orderkey % 10 AS grp, count(*) AS n_rows, " +
        "CAST(sum(cents) AS BIGINT) AS sum_cents " +
        "FROM cur GROUP BY 1 ORDER BY grp")),

    // HOLT-WINTERS additive seasonal forecast — the seasonal companion
    // to rel_forecast_des: level + trend via the same 8-tap geometric
    // windows (alpha ~ 0.5, integer-exact), plus a weekly seasonal
    // index per day-of-week = the mean deviation of y from its
    // CENTERED 7-day moving average over the training span (held-out
    // last week never peeks: dev rows stop 3 days before the anchor so
    // the centered window sees no test actuals). All integer fixed
    // point; the one portability trap is negative integer division
    // (Spark `div` truncates toward zero, flooring engines differ), so
    // every div rides a large positive offset — numerators stay
    // positive and trunc == floor on both engines. Day-of-week derives
    // from an epoch subtraction, not dayofweek() (whose origin
    // convention differs across engines).
    Op("rel_forecast_hw",
      (s, d) => {
        val w = Window.orderBy("day")
        val K = 1000000000000L // positivity offset for exact cross-engine div
        val daily = T.t(s, d, "orders")
          .groupBy(expr("CAST(o_orderdate AS DATE)").as("day"))
          .agg(count(lit(1)).as("y"))
        val base = daily
          .withColumn("rn", row_number().over(w))
          .withColumn("n_days", count(lit(1)).over(
            Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
          .withColumn("dy", col("y") - lag("y", 1).over(w))
          .withColumn("lnum", (0 to 7)
            .map(j => coalesce(lag(col("y"), j).over(w), lit(0L)) * lit(1L << (7 - j)))
            .reduce(_ + _))
          .withColumn("tnum", (0 to 7)
            .map(j => coalesce(lag(col("dy"), j).over(w), lit(0L)) * lit(1L << (7 - j)))
            .reduce(_ + _))
          .withColumn("dowk", expr("datediff(day, DATE '1992-01-01') % 7"))
          .withColumn("ma7sum", sum("y").over(w.rowsBetween(-3, 3)))
          .withColumn("ma7cnt", count(lit(1)).over(w.rowsBetween(-3, 3)))
        val anchor = base.where("rn = n_days - 7 AND rn >= 16")
          .select(col("rn").as("arn"), col("lnum").as("alnum"), col("tnum").as("atnum"))
        val season = base.crossJoin(broadcast(anchor.select("arn")))
          .where("ma7cnt = 7 AND rn <= arn - 3")
          .groupBy("dowk")
          .agg(sum(lit(7L) * col("y") - col("ma7sum")).as("dev_sum"),
            count(lit(1)).as("dev_cnt"))
        base.select("rn", "y", "dowk").crossJoin(broadcast(anchor))
          .withColumn("h", expr("CAST(rn - arn AS BIGINT)"))
          .where("h >= 1 AND h <= 7")
          .join(broadcast(season), Seq("dowk"), "left")
          .withColumn("s_adj", expr(
            s"(coalesce(dev_sum, 0) + ${7 * K} * coalesce(dev_cnt, 1)) " +
              s"div (7 * coalesce(dev_cnt, 1)) - $K"))
          .withColumn("forecast", expr(
            s"(alnum + h * atnum + ${255 * K}) div 255 - $K + s_adj"))
          .withColumn("abs_err", expr("abs(forecast - y)"))
          .select(col("h"), col("dowk").cast("long").as("dowk"), col("forecast"),
            col("y").as("actual"), col("abs_err"))
          .orderBy("h")
      },
      Some("WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS y " +
        "FROM orders GROUP BY 1), " +
        "lagd AS (SELECT day, y, lag(y, 1) OVER (ORDER BY day) AS lag_y FROM daily), " +
        "base AS (SELECT row_number() OVER w AS rn, count(*) OVER () AS n_days, day, y, " +
        (0 to 7).map(j => s"coalesce(lag(y, $j) OVER w, 0) * ${1L << (7 - j)}")
          .mkString(" + ") + " AS lnum, " +
        (0 to 7).map(j => s"coalesce(lag(y - lag_y, $j) OVER w, 0) * ${1L << (7 - j)}")
          .mkString(" + ") + " AS tnum, " +
        "(day - DATE '1992-01-01') % 7 AS dowk, " +
        "sum(y) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS ma7sum, " +
        "count(*) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS ma7cnt " +
        "FROM lagd WINDOW w AS (ORDER BY day)), " +
        "anchor AS (SELECT rn AS arn, lnum AS alnum, tnum AS atnum FROM base " +
        "WHERE rn = n_days - 7 AND rn >= 16), " +
        "season AS (SELECT dowk, CAST(sum(7 * y - ma7sum) AS BIGINT) AS dev_sum, " +
        "count(*) AS dev_cnt " +
        "FROM base, anchor WHERE ma7cnt = 7 AND rn <= arn - 3 GROUP BY 1) " +
        "SELECT CAST(rn - arn AS BIGINT) AS h, base.dowk, " +
        "CAST((alnum + CAST(rn - arn AS BIGINT) * atnum + 255000000000000) // 255 " +
        "- 1000000000000 + " +
        "((coalesce(dev_sum, 0) + 7000000000000 * coalesce(dev_cnt, 1)) " +
        "// (7 * coalesce(dev_cnt, 1)) - 1000000000000) AS BIGINT) AS forecast, " +
        "y AS actual, " +
        "CAST(abs((alnum + CAST(rn - arn AS BIGINT) * atnum + 255000000000000) // 255 " +
        "- 1000000000000 + " +
        "((coalesce(dev_sum, 0) + 7000000000000 * coalesce(dev_cnt, 1)) " +
        "// (7 * coalesce(dev_cnt, 1)) - 1000000000000) - y) AS BIGINT) AS abs_err " +
        "FROM base CROSS JOIN anchor LEFT JOIN season ON season.dowk = base.dowk " +
        "WHERE rn - arn >= 1 AND rn - arn <= 7 ORDER BY h")),

    // DESCRIBE '<dir>' — the store's catalog card from metadata alone
    // (no data read): layout properties, every column with its type
    // (meta-recorded schema, including one evolved in by batch 2), and
    // the CHECK constraints. Fully deterministic on every fixture —
    // ledgered commits advance the seq whether or not rows flowed.
    Op("core_store_describe",
      (s, d) => {
        val dir = s"target/tmp/describe_${java.util.UUID.randomUUID().toString.take(8)}"
        val t = T.t(s, d, "orders")
        graft.api.UpsertStore.update(
          t.select("o_custkey", "o_orderkey"), dir, "o_custkey", "o_orderkey",
          nBuckets = 8, batchId = Some("b0")): Unit
        graft.api.UpsertStore.update(
          t.select(col("o_custkey"), col("o_orderkey"),
            expr("CAST(o_orderkey % 100 AS BIGINT)").as("disc_cents")),
          dir, "o_custkey", "o_orderkey", nBuckets = 8, batchId = Some("b1")): Unit
        graft.api.MergeSql.runMaintenance(s,
          s"ALTER '$dir' ADD CONSTRAINT nonneg CHECK (disc_cents >= 0 OR disc_cents IS NULL)"): Unit
        val got = graft.api.MergeSql.runDescribe(s, s"DESCRIBE '$dir'")
          .localCheckpoint()
        graft.api.StoreIO.delete(s, dir)
        got.orderBy("name")
      },
      Some("SELECT * FROM (VALUES " +
        "('base_seq', '0'), ('col:disc_cents', 'bigint'), " +
        "('col:o_custkey', 'bigint'), ('col:o_orderkey', 'bigint'), " +
        "('constraint:nonneg', 'disc_cents >= 0 OR disc_cents IS NULL'), " +
        "('n_buckets', '8'), ('snapshot_seq', '2')) " +
        "AS t(name, value) ORDER BY name")),

    // ANALYZE '<dir>' — catalog statistics for the store, persisted in
    // the metadata (the Delta/Iceberg posture): one scan computes
    // per-column n_nonnull / sketch ndv / min-max / n_rows over the
    // current snapshot; tableStats() then serves them from meta.json
    // with ZERO data access (the op reads the persisted copy, not the
    // scan's return — pinning the round trip). NDV is HLL++-sketched
    // (exact multi-column count(DISTINCT) Expand-replicates the fact
    // table — see Stats.columnStats), so its parity check is the
    // error-bound boolean: the persisted estimate must land within 15%
    // of the exact NDV the op recomputes over the latest-wins state,
    // which the oracle rebuilds independently.
    Op("core_store_analyze",
      (s, d) => {
        val dir = s"target/tmp/analyze_${java.util.UUID.randomUUID().toString.take(8)}"
        val t = T.t(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
          .withColumn("b", pmod(col("o_orderkey"), lit(2)))
        (0 to 1).foreach { b =>
          graft.api.UpsertStore.update(
            t.where(col("b") === b).drop("b"), dir, "o_custkey", "o_orderkey",
            nBuckets = 8, batchId = Some(s"b$b")): Unit
        }
        val nCols = graft.api.MergeSql.runMaintenance(s, s"ANALYZE '$dir'")
        require(nCols == 3L, s"ANALYZE must cover 3 columns, got $nCols")
        val (seq, stats) = graft.api.UpsertStore.tableStats(s, dir)
          .getOrElse(sys.error("ANALYZE must persist stats"))
        require(seq == 2L, s"stats must be tagged with the analyzed seq, got $seq")
        val exact = graft.api.Stats.columnStats(
            graft.api.UpsertStore.read(s, dir),
            Seq("o_custkey", "o_orderkey", "o_totalprice"), exactNdv = true)
          .select(col("column"), col("ndv").as("ndv_exact"))
        val got = stats.join(exact, Seq("column"))
          .select(col("column"), col("n_nonnull"),
            (abs(col("ndv") - col("ndv_exact")) <=
              col("ndv_exact") * lit(0.15)).as("ndv_within_bounds"),
            col("n_rows"))
          .localCheckpoint()
        graft.api.StoreIO.delete(s, dir)
        got.orderBy("column")
      },
      Some("WITH t AS (SELECT o_custkey, o_orderkey, o_totalprice, o_orderkey % 2 AS b FROM orders), " +
        "m AS (SELECT o_custkey, max(b) AS mb FROM t GROUP BY 1), " +
        "f AS (SELECT t.o_custkey, t.o_orderkey, t.o_totalprice, " +
        "row_number() OVER (PARTITION BY t.o_custkey ORDER BY t.o_orderkey DESC) AS rn " +
        "FROM t JOIN m ON t.o_custkey = m.o_custkey AND t.b = m.mb), " +
        "cur AS (SELECT o_custkey, o_orderkey, o_totalprice FROM f WHERE rn = 1) " +
        "SELECT 'o_custkey' AS \"column\", count(o_custkey) AS n_nonnull, " +
        "true AS ndv_within_bounds, (SELECT count(*) FROM cur) AS n_rows FROM cur " +
        "UNION ALL SELECT 'o_orderkey', count(o_orderkey), " +
        "true, (SELECT count(*) FROM cur) FROM cur " +
        "UNION ALL SELECT 'o_totalprice', count(o_totalprice), " +
        "true, (SELECT count(*) FROM cur) FROM cur " +
        "ORDER BY \"column\"")),
  )
}
