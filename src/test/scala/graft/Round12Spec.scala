package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round 12: single-job full-sweep mutations (job count pinned O(1) in
  * nBuckets), commit-log trimming at the retention horizon, the
  * rebucket crash-heal, the full-sync UPDATE arm, TIMESTAMP AS OF,
  * OPTIMIZE ZORDER, and the streaming changefeed source's redelivery
  * contract.
  */
class Round12Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(tag: String) = s"target/tmp/${tag}_${System.nanoTime()}"

  private def kab(rows: (Long, Long, Long)*) = rows.toDF("k", "a", "b")

  // ---- O(1) Spark jobs for full sweeps -----------------------------------

  test("full-sweep UPDATE submits the same job count at 4 and at 32 buckets") {
    val seed = (1L to 200L).map(k => (k, k * 10, k % 7)).toDF("k", "a", "b")
    def jobsFor(n: Int): Int = {
      val d = tmpDir(s"jobs_$n")
      api.UpsertStore.update(seed, d, "k", "k", nBuckets = n,
        batchId = Some("seed"), retainCommits = Int.MaxValue)
      val group = s"sweep_jobs_$n"
      spark.sparkContext.setJobGroup(group, "full-sweep UPDATE job count")
      try api.UpsertStore.updateRows(spark, d,
        Seq("a" -> expr("a + 1")), expr("k % 3 = 0"), batchId = Some("u")): Unit
      finally spark.sparkContext.clearJobGroup()
      api.StoreIO.delete(spark, d)
      spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
    }
    val j4 = jobsFor(4)
    val j32 = jobsFor(32)
    assert(j4 == j32,
      s"full-sweep UPDATE must be O(1) Spark jobs in nBuckets: $j4 @4 vs $j32 @32")
    assert(j32 <= 8, s"full-sweep UPDATE submitted $j32 jobs; expected a handful")
  }

  test("full-sweep DELETE and deleteKeys stay correct under the single-job sweep") {
    val d = tmpDir("sweep_del")
    api.UpsertStore.update(kab((1L, 1L, 0L), (2L, 2L, 0L), (3L, 3L, 0L),
      (4L, 4L, 0L), (5L, 5L, 0L)), d, "k", "a", nBuckets = 4)
    assert(api.UpsertStore.delete(spark, d, expr("k % 2 = 0")) == 2L)
    assert(api.UpsertStore.read(spark, d).select("k")
      .as[Long].collect().sorted.toSeq == Seq(1L, 3L, 5L))
    assert(api.UpsertStore.deleteKeys(Seq(1L, 99L).toDF("k"), d, "k") == 1L)
    assert(api.UpsertStore.read(spark, d).select("k")
      .as[Long].collect().sorted.toSeq == Seq(3L, 5L))
    // untouched buckets kept their generation: only the commits moved
    assert(api.UpsertStore.snapshotSeq(spark, d) == 3L)
    api.StoreIO.delete(spark, d)
  }

  test("sweep mutations see evolved columns as NULL on pre-evolution generations") {
    val d = tmpDir("sweep_evo")
    api.UpsertStore.update(Seq((1L, 10L)).toDF("k", "a"), d, "k", "k",
      nBuckets = 4, batchId = Some("v1"))
    api.UpsertStore.update(Seq((2L, 20L, 5L)).toDF("k", "a", "extra"), d, "k", "k",
      nBuckets = 4, batchId = Some("v2"))
    // predicate + assignment over the evolved column must not fail on
    // the k=1 bucket whose generation predates `extra`
    val n = api.UpsertStore.updateRows(spark, d,
      Seq("a" -> expr("a + coalesce(extra, 100)")), expr("extra IS NULL OR extra > 1"))
    assert(n == 2L)
    val got = api.UpsertStore.read(spark, d).select("k", "a")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 110L), (2L, 25L)))
    api.StoreIO.delete(spark, d)
  }

  // ---- commit-log trimming ------------------------------------------------

  test("retention trims the commit log to the keep window plus one horizon line") {
    val d = tmpDir("log_trim")
    (0 until 30).foreach { i =>
      api.UpsertStore.update(kab((i.toLong % 5, i.toLong, 0L)), d, "k", "a",
        nBuckets = 4, batchId = Some(s"b$i"), retainCommits = Int.MaxValue)
    }
    api.UpsertStore.retain(spark, d, keepCommits = 3)
    val txt = api.StoreIO.readSmall(spark, s"$d/commits.json").get
    val lines = txt.split('\n').filter(_.nonEmpty)
    assert(lines.length == 4, s"expected 3 live + 1 horizon line, got ${lines.length}")
    assert(lines.head.contains("\"kind\":\"horizon\""))
    // a replayed pre-horizon batch is STILL a no-op (id preserved in the
    // horizon's bounded ledger window)
    assert(!api.UpsertStore.update(kab((0L, 999L, 0L)), d, "k", "a",
      nBuckets = 4, batchId = Some("b5"), retainCommits = Int.MaxValue))
    // commits() serves the live window; time travel works over it and
    // fails loudly below the horizon
    val live = api.UpsertStore.commits(spark, d)
      .select("seq").as[Long].collect().sorted.toSeq
    assert(live == Seq(28L, 29L, 30L))
    val ts29 = api.UpsertStore.commits(spark, d)
      .where("seq = 29").select("ts_ms").as[Long].head()
    assert(api.UpsertStore.readAsOfTime(spark, d, ts29).count() ==
      api.UpsertStore.readAsOf(spark, d, 29L).count())
    intercept[IllegalArgumentException] {
      api.UpsertStore.readAsOf(spark, d, 27L)
    }
    // a second retention cycle merges into the same bounded horizon line
    (30 until 40).foreach { i =>
      api.UpsertStore.update(kab((i.toLong % 5, i.toLong, 0L)), d, "k", "a",
        nBuckets = 4, batchId = Some(s"b$i"), retainCommits = Int.MaxValue)
    }
    api.UpsertStore.retain(spark, d, keepCommits = 2)
    val lines2 = api.StoreIO.readSmall(spark, s"$d/commits.json").get
      .split('\n').filter(_.nonEmpty)
    assert(lines2.length == 3, s"expected 2 live + 1 horizon, got ${lines2.length}")
    assert(!api.UpsertStore.update(kab((0L, 999L, 0L)), d, "k", "a",
      nBuckets = 4, batchId = Some("b33"), retainCommits = Int.MaxValue))
    api.StoreIO.delete(spark, d)
  }

  // ---- rebucket crash heal ------------------------------------------------

  test("rebucket heals an interrupted root swap instead of deleting the fallback") {
    val d = tmpDir("heal")
    api.UpsertStore.update(kab((1L, 1L, 0L), (2L, 2L, 0L), (3L, 3L, 0L)),
      d, "k", "a", nBuckets = 4, batchId = Some("seed"))
    // simulate the crash window: the swap retired the store to <dir>-old
    // and died before promoting the staged tree
    val f = api.StoreIO.fs(spark, d)
    def hp(s: String) = new org.apache.hadoop.fs.Path(s)
    assert(f.rename(hp(d), hp(s"$d-old")))
    // reads already survive via the rootOf fallback
    assert(api.UpsertStore.read(spark, d).count() == 3L)
    api.UpsertStore.rebucket(spark, d, "k", newBuckets = 8)
    assert(api.StoreIO.exists(spark, s"$d/meta.json"))
    assert(!api.StoreIO.exists(spark, s"$d-old"))
    assert(api.UpsertStore.buckets(spark, d) == 8)
    assert(api.UpsertStore.read(spark, d).select("k")
      .as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
    // the pre-rebucket ledger carried through the heal: replay no-op
    assert(!api.UpsertStore.update(kab((9L, 9L, 0L)), d, "k", "a",
      nBuckets = 8, batchId = Some("seed")))
    api.StoreIO.delete(spark, d)
  }

  // ---- NOT MATCHED BY SOURCE ... UPDATE ----------------------------------

  test("full-sync UPDATE arm: ANSI pre-update RHS, UPDATE wins over DELETE, replay") {
    val d1 = tmpDir("nmbsu_sql")
    val d2 = tmpDir("nmbsu_api")
    val seed = kab((1L, 10L, 5L), (2L, 20L, 7L), (3L, 30L, 9L), (4L, 40L, 2L))
    Seq(d1, d2).foreach(d =>
      api.UpsertStore.update(seed, d, "k", "k", nBuckets = 4, batchId = Some("seed")))
    // source carries only k=1; k=2,3,4 are not-matched-by-source:
    //   UPDATE arm (k <= 3): a = a + b, b = a  — RHS reads the OLD row
    //   DELETE arm (k >= 3): k=3 matches BOTH arms -> UPDATE wins; k=4 deleted
    Seq((1L, 100L, 0L)).toDF("k", "a", "b").createOrReplaceTempView("graft_nmbsu_src")
    val sql = s"MERGE INTO '$d1' USING graft_nmbsu_src ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT * " +
      "WHEN NOT MATCHED BY SOURCE AND k <= 3 THEN UPDATE SET a = a + b, b = a " +
      "WHEN NOT MATCHED BY SOURCE AND k >= 3 THEN DELETE"
    assert(api.MergeSql.run(spark, sql, nBuckets = 4, batchId = Some("sync")))
    assert(api.UpsertStore.update(Seq((1L, 100L, 0L)).toDF("k", "a", "b"),
      d2, "k", "k", nBuckets = 4, batchId = Some("sync"),
      notMatchedBySourceUpdate =
        Some((expr("k <= 3"), Seq("a" -> expr("a + b"), "b" -> expr("a")))),
      notMatchedBySourceDelete = Some(expr("k >= 3"))))
    def state(d: String) = api.UpsertStore.read(spark, d)
      .select("k", "a", "b").as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val want = Seq((1L, 100L, 0L), (2L, 27L, 20L), (3L, 39L, 30L))
    assert(state(d1) == want, "SQL path")
    assert(state(d2) == want, "programmatic path")
    // replay with the same batchId is a ledger no-op on both paths
    assert(!api.MergeSql.run(spark, sql, nBuckets = 4, batchId = Some("sync")))
    assert(state(d1) == want)
    // unknown assignment column fails loudly
    intercept[IllegalArgumentException] {
      api.UpsertStore.update(Seq((1L, 1L, 1L)).toDF("k", "a", "b"), d2, "k", "k",
        nBuckets = 4,
        notMatchedBySourceUpdate = Some((lit(true), Seq("nope" -> lit(1)))))
    }
    Seq(d1, d2).foreach(api.StoreIO.delete(spark, _))
  }

  test("unconditional full-sync UPDATE arm parses and applies") {
    val d = tmpDir("nmbsu_uncond")
    api.UpsertStore.update(kab((1L, 1L, 0L), (2L, 2L, 0L)), d, "k", "k",
      nBuckets = 2, batchId = Some("seed"))
    Seq((1L, 5L, 0L)).toDF("k", "a", "b").createOrReplaceTempView("graft_nmbsu2_src")
    api.MergeSql.run(spark,
      s"MERGE INTO '$d' USING graft_nmbsu2_src ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT * " +
        "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET b = 99", batchId = Some("m"))
    assert(api.UpsertStore.read(spark, d).select("k", "a", "b")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq ==
      Seq((1L, 5L, 0L), (2L, 2L, 99L)))
    api.StoreIO.delete(spark, d)
  }

  // ---- TIMESTAMP AS OF ----------------------------------------------------

  test("SELECT ... TIMESTAMP AS OF: millis and quoted forms, loud edges") {
    val d = tmpDir("ts_asof")
    api.UpsertStore.update(kab((1L, 1L, 0L)), d, "k", "a", nBuckets = 2,
      batchId = Some("c1"))
    Thread.sleep(15)
    api.UpsertStore.update(kab((2L, 2L, 0L)), d, "k", "a", nBuckets = 2,
      batchId = Some("c2"))
    val ts = api.UpsertStore.commits(spark, d)
      .select("seq", "ts_ms").as[(Long, Long)].collect().toMap
    assert(api.MergeSql.runSelect(spark,
      s"SELECT * FROM '$d' TIMESTAMP AS OF ${ts(1L)}").count() == 1L)
    val quoted = java.time.Instant.ofEpochMilli(ts(1L))
      .atOffset(java.time.ZoneOffset.UTC).toLocalDateTime
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSS"))
    assert(api.MergeSql.runSelect(spark,
      s"SELECT * FROM '$d' TIMESTAMP AS OF '$quoted'").count() == 1L)
    assert(api.MergeSql.runSelect(spark, s"SELECT * FROM '$d'").count() == 2L)
    assert(api.MergeSql.runSelect(spark,
      s"SELECT * FROM '$d' VERSION AS OF 1").count() == 1L)
    // an instant before the first commit has no resolvable snapshot
    intercept[IllegalArgumentException] {
      api.MergeSql.runSelect(spark,
        s"SELECT * FROM '$d' TIMESTAMP AS OF ${ts(1L) - 10000}")
    }
    intercept[IllegalArgumentException] {
      api.MergeSql.readTarget(spark, d,
        versionAsOf = Some(1L), timestampAsOf = Some(ts(1L)))
    }
    api.StoreIO.delete(spark, d)
  }

  // ---- OPTIMIZE ZORDER ----------------------------------------------------

  test("OPTIMIZE ZORDER clusters within buckets; content and history unchanged") {
    val d = tmpDir("opt_z")
    val seed = (1L to 4000L).map(k => (k, (k * 2654435761L) % 10000L))
      .toDF("k", "x")
    api.UpsertStore.update(seed.repartition(8), d, "k", "k", nBuckets = 4,
      batchId = Some("seed"))
    val rewrote = api.UpsertStore.optimize(spark, d,
      targetFileBytes = 4L * 1024, zorderBy = Seq("x"))
    assert(rewrote == 4, "ZORDER must rewrite every non-empty bucket")
    // per bucket: several files whose x-ranges are near-disjoint slices
    val audit = api.UpsertStore.read(spark, d)
      .groupBy(regexp_extract(input_file_name(), "/(b\\d+)/g\\d{12}/", 1).as("bk"),
        input_file_name().as("fn"))
      .agg(min("x").as("mn"), max("x").as("mx"))
      .groupBy("bk").agg(count(lit(1)).as("nf"),
        sum(col("mx") - col("mn")).as("sumspan"),
        (max("mx") - min("mn")).as("span"))
      .as[(String, Long, Long, Long)].collect()
    assert(audit.exists(_._2 >= 3), "tiny file target must force multi-file buckets")
    audit.filter(a => a._2 >= 3 && a._4 > 0).foreach { a =>
      assert(a._3 <= 2 * a._4,
        s"bucket ${a._1}: per-file spans ${a._3} vs bucket span ${a._4} — not clustered")
    }
    // content identical, pre-optimize snapshot still reconstructs
    assert(api.UpsertStore.read(spark, d).count() == 4000L)
    assert(api.UpsertStore.readAsOf(spark, d, 1L).count() == 4000L)
    assert(api.UpsertStore.read(spark, d).agg(sum("x")).as[Long].head() ==
      api.UpsertStore.readAsOf(spark, d, 1L).agg(sum("x")).as[Long].head())
    // the SQL grammar drives the same path
    assert(api.MergeSql.runMaintenance(spark,
      s"OPTIMIZE '$d' ZORDER BY (x, k)") == 4L)
    assert(api.UpsertStore.read(spark, d).count() == 4000L)
    api.StoreIO.delete(spark, d)
  }

  // ---- splitAssignments quoting ------------------------------------------

  test("SET-list splitter honors string literals") {
    assert(api.MergeSql.splitAssignments("note = 'a,b', x = 1") ==
      Seq("note" -> "'a,b'", "x" -> "1"))
    assert(api.MergeSql.splitAssignments("tag = ':-)', x = concat('(', name)") ==
      Seq("tag" -> "':-)'", "x" -> "concat('(', name)"))
    assert(api.MergeSql.splitAssignments("s = 'it''s, fine', y = 2") ==
      Seq("s" -> "'it''s, fine'", "y" -> "2"))
    intercept[IllegalArgumentException] {
      api.MergeSql.splitAssignments("s = 'unterminated")
    }
  }

  test("UPDATE verb applies assignments with quoted commas end-to-end") {
    val d = tmpDir("upd_quote")
    api.UpsertStore.update(Seq((1L, "x")).toDF("k", "note"), d, "k", "k",
      nBuckets = 2, batchId = Some("seed"))
    assert(api.MergeSql.runUpdate(spark,
      s"UPDATE '$d' SET note = 'a,b' WHERE k = 1") == 1L)
    assert(api.UpsertStore.read(spark, d).select("note").as[String].head() == "a,b")
    api.StoreIO.delete(spark, d)
  }

  // ---- schema evolution guard ---------------------------------------------

  test("a retyped column fails loudly instead of merging implicitly") {
    val d = tmpDir("retype")
    api.UpsertStore.update(Seq((1L, 10L)).toDF("k", "v"), d, "k", "k", nBuckets = 2)
    val e = intercept[IllegalArgumentException] {
      api.UpsertStore.update(Seq((2L, "oops")).toDF("k", "v"), d, "k", "k",
        nBuckets = 2)
    }
    assert(e.getMessage.contains("retyping is not supported"))
    // the store is untouched by the rejected batch
    assert(api.UpsertStore.read(spark, d).count() == 1L)
    assert(api.UpsertStore.snapshotSeq(spark, d) == 1L)
    api.StoreIO.delete(spark, d)
  }

  test("tableSchema serves the meta-recorded schema and widens on evolution") {
    val d = tmpDir("meta_schema")
    api.UpsertStore.update(Seq((1L, 10L)).toDF("k", "v"), d, "k", "k", nBuckets = 2)
    assert(api.UpsertStore.tableSchema(spark, d).fieldNames.toSeq == Seq("k", "v"))
    api.UpsertStore.update(Seq((2L, 20L, "x")).toDF("k", "v", "w"), d, "k", "k",
      nBuckets = 2)
    assert(api.UpsertStore.tableSchema(spark, d).fieldNames.toSeq == Seq("k", "v", "w"))
    api.StoreIO.delete(spark, d)
  }

  // ---- changefeed source --------------------------------------------------

  test("changefeed relay: a crash between window write and cursor commit redelivers identically") {
    val base = tmpDir("cf_crash")
    val d = s"$base/table"
    val cursor = s"$base/cursor.json"
    val out = s"$base/out"
    api.UpsertStore.update(kab((1L, 1L, 0L), (2L, 2L, 0L)), d, "k", "a",
      nBuckets = 4, batchId = Some("b0"))
    assert(graft.streaming.Streams.changefeedRelayOnce(spark, d, "k", cursor, out) == 1L)
    api.UpsertStore.update(kab((2L, 22L, 0L), (3L, 3L, 0L)), d, "k", "a",
      nBuckets = 4, batchId = Some("b1"))
    // simulate the crash: window 2's partition landed PARTIAL/CORRUPT
    // (a stray row) and the consumer died before the cursor advanced
    Seq(("bogus", 99L, 99L, 99L, 2)).toDF("change", "k", "a", "b", "to_seq")
      .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
      .partitionBy("to_seq").parquet(out)
    // redelivery: same window, same partition — an OVERWRITE, never a
    // duplicate beside the debris
    assert(graft.streaming.Streams.changefeedRelayOnce(spark, d, "k", cursor, out) == 2L)
    val got = spark.read.parquet(out)
      .select("to_seq", "change", "k", "a")
      .as[(Int, String, Long, Long)].collect().sortBy(r => (r._1, r._3)).toSeq
    assert(got == Seq(
      (1, "insert", 1L, 1L), (1, "insert", 2L, 2L),
      (2, "update", 2L, 22L), (2, "insert", 3L, 3L)))
    // nothing new -> the relay is a no-op (no cursor move, no write)
    assert(graft.streaming.Streams.changefeedRelayOnce(spark, d, "k", cursor, out) == -1L)
    // a RESTARTED stream with a FRESH checkpoint resumes from the
    // durable cursor (the ticker's offsets are just a clock)
    api.UpsertStore.update(kab((4L, 4L, 0L)), d, "k", "a",
      nBuckets = 4, batchId = Some("b2"))
    val q = graft.streaming.Streams.changefeedStream(spark, d, "k", cursor, out,
      s"$base/ckpt_fresh", pollIntervalMs = 100L)
    try {
      val deadline = System.currentTimeMillis() + 60000L
      def cursorAt(): Long = api.StoreIO.readSmall(spark, cursor)
        .map(new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(_).get("last_seq").asLong()).getOrElse(-1L)
      while (cursorAt() < 3L && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(cursorAt() == 3L)
    } finally q.stop()
    val w3 = spark.read.parquet(out).where("to_seq = 3")
      .select("change", "k").as[(String, Long)].collect().toSeq
    assert(w3 == Seq(("insert", 4L)))
    api.StoreIO.delete(spark, base)
  }

  // ---- RESTORE / CLONE ----------------------------------------------------

  test("RESTORE: undo as a new commit, history intact, replay no-op, loud edges") {
    val d = tmpDir("restore")
    api.UpsertStore.update(kab((1L, 1L, 0L), (2L, 2L, 0L)), d, "k", "a",
      nBuckets = 4, batchId = Some("c1"))
    api.UpsertStore.update(kab((2L, 22L, 0L), (3L, 3L, 0L)), d, "k", "a",
      nBuckets = 4, batchId = Some("c2"))
    assert(api.UpsertStore.restore(spark, d, 1L, batchId = Some("undo")) == 3L)
    def ks(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "a").as[(Long, Long)].collect().sortBy(_._1).toSeq
    // current == state at 1; the undone commit is STILL travelable
    assert(ks(api.UpsertStore.read(spark, d)) == Seq((1L, 1L), (2L, 2L)))
    assert(ks(api.UpsertStore.readAsOf(spark, d, 2L)) ==
      Seq((1L, 1L), (2L, 22L), (3L, 3L)))
    // replay of the restore is a ledger no-op (head unchanged)
    assert(api.UpsertStore.restore(spark, d, 1L, batchId = Some("undo")) == 3L)
    assert(api.UpsertStore.snapshotSeq(spark, d) == 3L)
    // merging continues on top of the restored state
    api.UpsertStore.update(kab((4L, 4L, 0L)), d, "k", "a",
      nBuckets = 4, batchId = Some("c3"))
    assert(ks(api.UpsertStore.read(spark, d)) ==
      Seq((1L, 1L), (2L, 2L), (4L, 4L)))
    // future and sub-horizon targets fail loudly
    intercept[IllegalArgumentException] {
      api.UpsertStore.restore(spark, d, 99L)
    }
    api.UpsertStore.retain(spark, d, keepCommits = 1)
    intercept[IllegalArgumentException] {
      api.UpsertStore.restore(spark, d, 1L)
    }
    api.StoreIO.delete(spark, d)
  }

  test("CLONE: branch at a version, trimmed ledger, independent evolution") {
    val base = tmpDir("clone")
    val d = s"$base/src"
    val c = s"$base/branch"
    api.UpsertStore.update(kab((1L, 1L, 0L), (2L, 2L, 0L)), d, "k", "a",
      nBuckets = 4, batchId = Some("c1"))
    api.UpsertStore.update(kab((3L, 3L, 0L)), d, "k", "a",
      nBuckets = 4, batchId = Some("c2"))
    assert(api.UpsertStore.cloneStore(spark, d, c, Some(1L)) == 1L)
    def ks(dir: String) = api.UpsertStore.read(spark, dir)
      .select("k").as[Long].collect().sorted.toSeq
    assert(ks(c) == Seq(1L, 2L))
    assert(api.UpsertStore.baseSeq(spark, c) == 1L)
    // contained batch replays as a no-op; post-clone-version batch applies fresh
    assert(!api.UpsertStore.update(kab((1L, 1L, 0L)), c, "k", "a",
      nBuckets = 4, batchId = Some("c1")))
    assert(api.UpsertStore.update(kab((3L, 3L, 0L)), c, "k", "a",
      nBuckets = 4, batchId = Some("c2")))
    assert(ks(c) == Seq(1L, 2L, 3L))
    // divergence: mutate the source; the clone is untouched
    api.UpsertStore.delete(spark, d, expr("k = 2")): Unit
    assert(ks(d) == Seq(1L, 3L))
    assert(ks(c) == Seq(1L, 2L, 3L))
    // an existing target fails loudly
    intercept[IllegalArgumentException] {
      api.UpsertStore.cloneStore(spark, d, c)
    }
    api.StoreIO.delete(spark, base)
  }

  test("RESTORE TO TIMESTAMP AS OF resolves through the commit log") {
    val d = tmpDir("restore_ts")
    api.UpsertStore.update(kab((1L, 1L, 0L)), d, "k", "a", nBuckets = 2,
      batchId = Some("c1"))
    Thread.sleep(15)
    api.UpsertStore.update(kab((2L, 2L, 0L)), d, "k", "a", nBuckets = 2,
      batchId = Some("c2"))
    val ts1 = api.UpsertStore.commits(spark, d)
      .where("seq = 1").select("ts_ms").as[Long].head()
    assert(api.MergeSql.runMaintenance(spark,
      s"RESTORE '$d' TO TIMESTAMP AS OF $ts1") == 3L)
    assert(api.UpsertStore.read(spark, d).count() == 1L)
    api.StoreIO.delete(spark, d)
  }

  // ---- row-version audit history -----------------------------------------

  test("rowVersions: complete value timeline, bucket-pruned to the probed keys") {
    val d = tmpDir("rowv")
    api.UpsertStore.update(kab((1L, 1L, 0L), (2L, 2L, 0L)), d, "k", "a",
      nBuckets = 8, batchId = Some("c1"))
    api.UpsertStore.update(kab((1L, 11L, 0L)), d, "k", "a",
      nBuckets = 8, batchId = Some("c2"))
    api.UpsertStore.delete(spark, d, expr("k = 1"), batchId = Some("c3")): Unit
    val hist = api.UpsertStore.rowVersions(Seq(1L).toDF("k"), d, "k")
    val got = hist.select("commit_seq", "k", "a").as[(Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    // present at c1 and c2 (its bucket rewrote), gone from the c3 gen
    assert(got == Seq((1L, 1L, 1L), (2L, 1L, 11L)))
    // the scan reads ONLY generations of the probed key's bucket
    val scanned = hist.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.rootPaths.map(_.toString)
    }.flatten.filter(_.contains(d))
      .map(_.replaceAll(".*/(b\\d+)/.*", "$1")).toSet
    val own = api.UpsertStore.lookup(Seq(1L).toDF("k"), d, "k")
      .queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.rootPaths.map(_.toString)
      }.flatten.map(_.replaceAll(".*/(b\\d+)/.*", "$1")).toSet
    assert(scanned == own, s"rowVersions scanned $scanned, key lives in $own")
    // a probe on an absent key is empty, not an error
    assert(api.UpsertStore.rowVersions(Seq(999L).toDF("k"), d, "k")
      .where("k = 999").count() == 0)
    api.StoreIO.delete(spark, d)
  }

  // ---- ANALYZE / catalog statistics ---------------------------------------

  test("ANALYZE persists stats in metadata; tableStats serves them without a scan") {
    val d = tmpDir("analyze")
    api.UpsertStore.update(kab((1L, 5L, 0L), (2L, 5L, 1L), (3L, 7L, 2L)),
      d, "k", "k", nBuckets = 4, batchId = Some("c1"))
    assert(api.UpsertStore.tableStats(spark, d).isEmpty)
    assert(api.MergeSql.runMaintenance(spark, s"ANALYZE '$d'") == 3L)
    val (seq, stats) = api.UpsertStore.tableStats(spark, d).get
    assert(seq == 1L)
    val byCol = stats.select("column", "n_nonnull", "ndv", "min_v", "max_v", "n_rows")
      .as[(String, Long, Long, String, String, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(byCol("k") == (("k", 3L, 3L, "1", "3", 3L)))
    assert(byCol("a") == (("a", 3L, 2L, "5", "7", 3L)))
    // serving is metadata-only: no file scan in the served frame's plan
    assert(stats.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.isEmpty)
    // stats are a snapshot: a later mutation + re-ANALYZE replaces them
    api.UpsertStore.delete(spark, d, expr("k = 3"), batchId = Some("c2")): Unit
    api.UpsertStore.analyze(spark, d): Unit
    val (seq2, stats2) = api.UpsertStore.tableStats(spark, d).get
    assert(seq2 == 2L)
    assert(stats2.where("column = 'k'").select("ndv").as[Long].head() == 2L)
    api.StoreIO.delete(spark, d)
  }

  // ---- CHECK constraints --------------------------------------------------

  test("constraints: ADD validates existing data; writes validate staged output") {
    val d = tmpDir("cons")
    api.UpsertStore.update(kab((1L, 5L, 0L), (2L, 7L, 0L)), d, "k", "k",
      nBuckets = 4, batchId = Some("seed"))
    // an aspiration the data already violates is rejected outright
    intercept[IllegalArgumentException] {
      api.UpsertStore.addConstraint(spark, d, "big", "a > 6")
    }
    assert(api.UpsertStore.constraints(spark, d).isEmpty)
    api.UpsertStore.addConstraint(spark, d, "pos", "a > 0")
    // UPDATE verb producing a violating row: rejected, state intact
    val e = intercept[IllegalArgumentException] {
      api.MergeSql.runUpdate(spark, s"UPDATE '$d' SET a = a - 10 WHERE k = 1")
    }
    assert(e.getMessage.contains("CHECK constraint pos"))
    assert(api.UpsertStore.read(spark, d).select("a")
      .as[Long].collect().sorted.toSeq == Seq(5L, 7L))
    assert(api.UpsertStore.snapshotSeq(spark, d) == 1L)
    // the full-sync UPDATE arm validates too
    intercept[IllegalArgumentException] {
      api.UpsertStore.update(kab((1L, 6L, 0L)), d, "k", "k", nBuckets = 4,
        notMatchedBySourceUpdate = Some((lit(true), Seq("a" -> lit(-1L)))))
    }
    assert(api.UpsertStore.read(spark, d).select("a")
      .as[Long].collect().sorted.toSeq == Seq(5L, 7L))
    // NULL checks PASS (SQL semantics: only FALSE violates)
    api.UpsertStore.addConstraint(spark, d, "nullish", "b / nullif(a - a, 0) > 0")
    assert(api.UpsertStore.update(kab((3L, 9L, 1L)), d, "k", "k", nBuckets = 4))
    // dropping an unknown constraint is loud
    intercept[IllegalArgumentException] {
      api.UpsertStore.dropConstraint(spark, d, "nope")
    }
    api.UpsertStore.dropConstraint(spark, d, "pos")
    assert(api.UpsertStore.constraints(spark, d).map(_._1) == Seq("nullish"))
    api.StoreIO.delete(spark, d)
  }

  // ---- CDF images + incremental materialized views -----------------------

  test("changesBetweenImages: update emits a pre/post pair, insert/delete one row") {
    val d = tmpDir("cdf_img")
    api.UpsertStore.update(kab((1L, 1L, 0L), (2L, 2L, 0L)), d, "k", "a",
      nBuckets = 4, batchId = Some("c1"))
    api.UpsertStore.update(kab((2L, 22L, 0L), (3L, 3L, 0L)), d, "k", "a",
      nBuckets = 4, batchId = Some("c2"))
    api.UpsertStore.delete(spark, d, expr("k = 1"), batchId = Some("c3")): Unit
    val got = api.UpsertStore.changesBetweenImages(spark, d, 1L, 3L, "k")
      .select("change", "k", "a").as[(String, Long, Long)]
      .collect().sortBy(r => (r._2, r._1)).toSeq
    assert(got == Seq(
      ("delete", 1L, 1L),              // before-image
      ("update_postimage", 2L, 22L),
      ("update_preimage", 2L, 2L),
      ("insert", 3L, 3L)))             // after-image
    // parity: collapsing images reproduces the plain feed exactly
    val plain = api.UpsertStore.changesBetween(spark, d, 1L, 3L, "k")
      .select("change", "k", "a").as[(String, Long, Long)].collect().toSet
    val collapsed = api.UpsertStore.changesBetweenImages(spark, d, 1L, 3L, "k")
      .where("change <> 'update_preimage'")
      .withColumn("change",
        when(col("change") === "update_postimage", "update").otherwise(col("change")))
      .select("change", "k", "a").as[(String, Long, Long)].collect().toSet
    assert(collapsed == plain)
    api.StoreIO.delete(spark, d)
  }

  test("matview: group-moving updates adjust both groups; incremental == recompute") {
    val base = tmpDir("mv")
    val d = s"$base/fact"
    val v = s"$base/view"
    def refresh(): Long = api.MatView.refresh(spark, d, "k", v,
      groupCols = Seq("grp" -> expr("a % 2")), sumCols = Seq("b"))
    def state(): Seq[(Long, Long, Long)] = api.MatView.read(spark, v)
      .select("grp", "n_rows", "sum_b").as[(Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    api.UpsertStore.update(kab((1L, 0L, 10L), (2L, 1L, 20L), (3L, 2L, 30L)),
      d, "k", "k", nBuckets = 4, batchId = Some("c1"))
    assert(refresh() == 1L)
    assert(state() == Seq((0L, 2L, 40L), (1L, 1L, 20L)))
    // k=1 moves grp 0 -> 1 (a 0 -> 3); k=3 deleted; k=4 inserted grp 0
    api.UpsertStore.update(kab((1L, 3L, 11L), (4L, 4L, 40L)),
      d, "k", "k", nBuckets = 4, batchId = Some("c2"))
    api.UpsertStore.delete(spark, d, expr("k = 3"), batchId = Some("c3")): Unit
    assert(refresh() == 3L)
    assert(state() == Seq((0L, 1L, 40L), (1L, 2L, 31L)))
    // incremental state == from-scratch recompute over the final table
    val full = api.UpsertStore.read(spark, d)
      .groupBy(expr("a % 2").as("grp"))
      .agg(count(lit(1)).as("n"), sum("b").as("s"))
      .select("grp", "n", "s").as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(state() == full)
    // a group whose count reaches zero vanishes (no phantom rows)
    api.UpsertStore.delete(spark, d, expr("a % 2 = 0"), batchId = Some("c4")): Unit
    assert(refresh() == 4L)
    assert(state() == Seq((1L, 2L, 31L)))
    api.StoreIO.delete(spark, base)
  }

  test("matview state+cursor survive a crash between the swap's renames") {
    val base = tmpDir("mv_crash")
    val d = s"$base/fact"
    val v = s"$base/view"
    api.UpsertStore.update(kab((1L, 1L, 10L), (2L, 2L, 20L)), d, "k", "k",
      nBuckets = 4, batchId = Some("c1"))
    api.MatView.refresh(spark, d, "k", v,
      groupCols = Seq("grp" -> lit(0)), sumCols = Seq("b")): Unit
    // simulate the crash window: generation retired, promote never landed
    val f = api.StoreIO.fs(spark, v)
    def hp(s: String) = new org.apache.hadoop.fs.Path(s)
    assert(f.rename(hp(s"$v/gen"), hp(s"$v/gen-old")))
    // reads serve the fallback; cursor too — so the next refresh folds
    // EXACTLY the missing window, never a double-apply
    assert(api.MatView.cursor(spark, v) == 1L)
    assert(api.MatView.read(spark, v).select("sum_b").as[Long].head() == 30L)
    api.UpsertStore.update(kab((3L, 3L, 5L)), d, "k", "k",
      nBuckets = 4, batchId = Some("c2"))
    assert(api.MatView.refresh(spark, d, "k", v,
      groupCols = Seq("grp" -> lit(0)), sumCols = Seq("b")) == 2L)
    assert(api.MatView.read(spark, v).select("n_rows", "sum_b")
      .as[(Long, Long)].head() == ((3L, 35L)))
    assert(!api.StoreIO.exists(spark, s"$v/gen-old"))
    api.StoreIO.delete(spark, base)
  }

  // ---- maintenance-vs-writer concurrency soak -----------------------------

  test("OPTIMIZE and RESTORE racing a MERGE writer: lease serializes, nothing lost") {
    val d = tmpDir("maint_soak")
    api.UpsertStore.update(
      (1 to 40).map(i => (i.toLong, 1L, 0L)).toDF("k", "a", "b"),
      d, "k", "a", nBuckets = 4, batchId = Some("seed"))
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val deadline = System.currentTimeMillis() + 120000L
    def retrying(body: => Unit): Unit = {
      var done = false
      while (!done) {
        try { body; done = true }
        catch {
          case _: api.StoreIO.LeaseHeldException
              if System.currentTimeMillis() < deadline => Thread.sleep(100L)
        }
      }
    }
    val writer = new Thread(() => {
      try (1 to 5).foreach { i =>
        retrying(api.UpsertStore.update(
          Seq((100L + i, i.toLong, 0L)).toDF("k", "a", "b"),
          d, "k", "a", nBuckets = 4, batchId = Some(s"m$i")): Unit)
      } catch { case t: Throwable => errs.add(t) }
    })
    val maintainer = new Thread(() => {
      try (1 to 5).foreach { _ =>
        retrying(api.UpsertStore.optimize(spark, d, targetFileBytes = 1L): Unit)
        Thread.sleep(50L)
      } catch { case t: Throwable => errs.add(t) }
    })
    writer.start(); maintainer.start()
    writer.join(150000L); maintainer.join(150000L)
    assert(errs.isEmpty, s"soak errors: ${errs.toArray.mkString("; ")}")
    // every merged key present exactly once, seed keys intact
    val ks = api.UpsertStore.read(spark, d).select("k")
      .as[Long].collect().sorted.toSeq
    assert(ks == ((1L to 40L) ++ (101L to 105L)).toSeq)
    // replays of every batch are still no-ops after the interleaving
    (1 to 5).foreach { i =>
      assert(!api.UpsertStore.update(
        Seq((100L + i, 99L, 0L)).toDF("k", "a", "b"),
        d, "k", "a", nBuckets = 4, batchId = Some(s"m$i")))
    }
    api.StoreIO.delete(spark, d)
  }

  // ---- retained-store consumer attach ------------------------------------

  test("a cursor-less consumer on a retained store receives the full snapshot") {
    val base = tmpDir("cf_attach")
    val d = s"$base/table"
    (0 until 6).foreach { i =>
      api.UpsertStore.update(kab((i.toLong, i.toLong * 10, 0L)), d, "k", "a",
        nBuckets = 4, batchId = Some(s"b$i"), retainCommits = Int.MaxValue)
    }
    api.UpsertStore.retain(spark, d, keepCommits = 2)
    assert(api.UpsertStore.baseSeq(spark, d) == 5L)
    val (changes, head) = api.UpsertStore.changesSince(spark, d, "k", s"$base/cur.json")
    assert(head == 6L)
    val got = changes.select("change", "k").as[(String, Long)]
      .collect().sortBy(_._2).toSeq
    // ALL six keys arrive as inserts — not just those changed after the
    // horizon (the pre-fix behavior lost k=0..4)
    assert(got == (0L to 5L).map(k => ("insert", k)).toSeq)
    api.StoreIO.delete(spark, base)
  }
}
