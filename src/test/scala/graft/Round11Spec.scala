package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round 11: UPDATE verb, full-sync MERGE, store time travel, keep-N
  * retention, schema evolution, and the concurrent-MERGE soak.
  */
class Round11Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(rows: (Long, Long, String)*) =
    rows.toDF("k", "version", "payload")

  private def tmpDir(tag: String) = s"target/tmp/${tag}_${System.nanoTime()}"

  private def state(dir: String): Seq[(Long, Long, String)] =
    api.UpsertStore.read(spark, dir)
      .select("k", "version", "payload")
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq

  // ---- UPDATE verb -------------------------------------------------------

  test("UPDATE: SQL path == programmatic path; RHS sees pre-update row") {
    val d1 = tmpDir("upd_sql")
    val d2 = tmpDir("upd_api")
    val seed = Seq((1L, 10L, 5L), (2L, 20L, 7L), (3L, 30L, 9L))
      .toDF("k", "a", "b")
    Seq(d1, d2).foreach { d =>
      api.UpsertStore.update(seed, d, "k", "k", nBuckets = 4,
        batchId = Some("seed"))
    }
    // a = a + b, b = a  — both RHS must read the OLD row (ANSI): the
    // new b is the old a, not the incremented one
    val n1 = api.MergeSql.runUpdate(spark,
      s"UPDATE '$d1' SET a = a + b, b = a WHERE k <> 3", batchId = Some("u"))
    val n2 = api.UpsertStore.updateRows(spark, d2,
      Seq("a" -> expr("a + b"), "b" -> expr("a")), expr("k <> 3"),
      batchId = Some("u"))
    assert(n1 == 2L && n2 == 2L)
    def rows(d: String) = api.UpsertStore.read(spark, d)
      .select("k", "a", "b").as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(rows(d1) == rows(d2))
    assert(rows(d1) == Seq((1L, 15L, 10L), (2L, 27L, 20L), (3L, 30L, 9L)))
    // replay is a ledger no-op
    assert(api.MergeSql.runUpdate(spark,
      s"UPDATE '$d1' SET a = a + b WHERE k <> 3", batchId = Some("u")) == 0L)
    // NULL predicate leaves rows untouched (three-valued logic)
    assert(api.MergeSql.runUpdate(spark,
      s"UPDATE '$d1' SET a = a + 1 WHERE CASE WHEN k = 1 THEN NULL ELSE true END",
      batchId = Some("u2")) == 2L)
    assert(rows(d1).head == (1L, 15L, 10L))
  }

  test("UPDATE: unknown SET column and malformed statements fail loudly") {
    val d = tmpDir("upd_bad")
    api.UpsertStore.update(df((1L, 1L, "a")), d, "k", "version", nBuckets = 2)
    intercept[IllegalArgumentException] {
      api.UpsertStore.updateRows(spark, d,
        Seq("ghost" -> lit(1)), lit(true))
    }
    intercept[IllegalArgumentException] {
      api.MergeSql.runUpdate(spark, s"UPDATE '$d' WHERE k = 1")
    }
    intercept[IllegalArgumentException] {
      api.MergeSql.runUpdate(spark, s"UPDATE '$d' SET = 1")
    }
  }

  test("splitAssignments: top-level commas only; function commas survive") {
    assert(api.MergeSql.splitAssignments("a = 1, b = greatest(x, y), c = d") ==
      Seq("a" -> "1", "b" -> "greatest(x, y)", "c" -> "d"))
    assert(api.MergeSql.splitAssignments(
      "v = element_at(array(1, 2, 3), 2)") ==
      Seq("v" -> "element_at(array(1, 2, 3), 2)"))
  }

  test("UPDATE WHERE is optional: missing predicate updates every row") {
    val d = tmpDir("upd_all")
    api.UpsertStore.update(df((1L, 1L, "a"), (2L, 2L, "b")), d, "k", "version",
      nBuckets = 2)
    assert(api.MergeSql.runUpdate(spark,
      s"UPDATE '$d' SET payload = upper(payload)") == 2L)
    assert(state(d).map(_._3) == Seq("A", "B"))
  }

  // ---- full-sync MERGE ---------------------------------------------------

  test("MERGE NOT MATCHED BY SOURCE: unconditional sweep makes store == source") {
    val d = tmpDir("sync_all")
    api.UpsertStore.update(
      df((1L, 1L, "a"), (2L, 1L, "b"), (3L, 1L, "c"), (4L, 1L, "d")),
      d, "k", "version", nBuckets = 4, batchId = Some("seed"))
    df((2L, 5L, "b5"), (5L, 1L, "e")).createOrReplaceTempView("r11_sync_src")
    assert(api.MergeSql.run(spark,
      s"MERGE INTO '$d' USING r11_sync_src ON t.k = s.k LATEST BY version " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT * " +
        "WHEN NOT MATCHED BY SOURCE THEN DELETE",
      nBuckets = 4, batchId = Some("sync")))
    assert(state(d) == Seq((2L, 5L, "b5"), (5L, 1L, "e")))
    // replay is a no-op
    assert(!api.MergeSql.run(spark,
      s"MERGE INTO '$d' USING r11_sync_src ON t.k = s.k LATEST BY version " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT * " +
        "WHEN NOT MATCHED BY SOURCE THEN DELETE",
      nBuckets = 4, batchId = Some("sync")))
  }

  test("full-sync + LATEST BY + tombstones interact correctly in one statement") {
    val d = tmpDir("sync_cdc")
    api.UpsertStore.update(
      df((1L, 1L, "a"), (2L, 1L, "b"), (3L, 1L, "c")),
      d, "k", "version", nBuckets = 4, batchId = Some("seed"))
    // source: key 1 has two versions, latest is a delete-op; key 2
    // updates; key 3 absent (full-sync sweeps it); key 4 inserts
    Seq((1L, 2L, "x", "U"), (1L, 3L, "y", "D"), (2L, 2L, "b2", "U"),
        (4L, 1L, "d", "U"))
      .toDF("k", "version", "payload", "op")
      .createOrReplaceTempView("r11_sync_cdc")
    assert(api.MergeSql.run(spark,
      s"MERGE INTO '$d' USING r11_sync_cdc ON t.k = s.k LATEST BY version " +
        "WHEN MATCHED AND op = 'D' THEN DELETE " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT * " +
        "WHEN NOT MATCHED BY SOURCE THEN DELETE",
      nBuckets = 4, batchId = Some("cdc")))
    val got = api.UpsertStore.read(spark, d)
      .select("k", "version", "payload")
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq((2L, 2L, "b2"), (4L, 1L, "d")))
  }

  test("MergeSql.parse: full-sync clause shapes; absent clause stays None") {
    val base = "MERGE INTO '/x' USING v ON t.k = s.k " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
    assert(api.MergeSql.parse(base).notMatchedBySourceDelete.isEmpty)
    assert(api.MergeSql.parse(
      base + " WHEN NOT MATCHED BY SOURCE THEN DELETE")
      .notMatchedBySourceDelete.contains("true"))
    assert(api.MergeSql.parse(
      base + " WHEN NOT MATCHED BY SOURCE AND stale = true THEN DELETE")
      .notMatchedBySourceDelete.contains("stale = true"))
  }

  // ---- time travel -------------------------------------------------------

  test("readAsOf reconstructs every commit; snapshots are immutable under later writes") {
    val d = tmpDir("tt")
    api.UpsertStore.update(df((1L, 1L, "a1"), (2L, 1L, "b1")), d, "k", "version",
      nBuckets = 4, batchId = Some("c1"))
    api.UpsertStore.update(df((1L, 2L, "a2"), (3L, 1L, "c1")), d, "k", "version",
      nBuckets = 4, batchId = Some("c2"))
    api.UpsertStore.delete(spark, d, expr("k = 2"), batchId = Some("c3"))
    def asOf(s: Long) = api.UpsertStore.readAsOf(spark, d, s)
      .select("k", "version", "payload")
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(api.UpsertStore.snapshotSeq(spark, d) == 3L)
    assert(asOf(1) == Seq((1L, 1L, "a1"), (2L, 1L, "b1")))
    assert(asOf(2) == Seq((1L, 2L, "a2"), (2L, 1L, "b1"), (3L, 1L, "c1")))
    assert(asOf(3) == Seq((1L, 2L, "a2"), (3L, 1L, "c1")))
    assert(asOf(3) == state(d))
    // a time-travel read survives a CONCURRENT later update untouched:
    // generations are immutable, so the same seq re-reads identically
    val before = asOf(2)
    api.UpsertStore.update(df((1L, 9L, "a9")), d, "k", "version",
      nBuckets = 4, batchId = Some("c4"))
    assert(asOf(2) == before, "later commits must not disturb a held snapshot seq")
    // timestamp resolution goes through the commit log
    val ts = api.UpsertStore.commits(spark, d)
      .where("seq = 2").select("ts_ms").head().getLong(0)
    assert(api.UpsertStore.readAsOfTime(spark, d, ts)
      .select("k", "version", "payload")
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq == before)
    intercept[IllegalArgumentException] {
      api.UpsertStore.readAsOfTime(spark, d, -1L)
    }
  }

  // ---- retention ---------------------------------------------------------

  test("retain keeps the newest N commits reconstructable and prunes the rest") {
    val d = tmpDir("ret")
    (1 to 5).foreach { i =>
      api.UpsertStore.update(df((i.toLong, 1L, s"v$i")), d, "k", "version",
        nBuckets = 2, batchId = Some(s"c$i"), retainCommits = Int.MaxValue)
    }
    def genCount() = new java.io.File(d).listFiles()
      .filter(_.getName.matches("b\\d+"))
      .map(_.listFiles().count(_.getName.startsWith("g"))).sum
    val before = genCount()
    api.UpsertStore.retain(spark, d, keepCommits = 2)
    assert(api.UpsertStore.baseSeq(spark, d) == 4L)
    assert(genCount() < before, "retention must actually delete generations")
    // head and horizon still reconstruct; deeper history fails loudly
    assert(api.UpsertStore.readAsOf(spark, d, 5L).count() == 5L)
    assert(api.UpsertStore.readAsOf(spark, d, 4L).count() == 4L)
    intercept[IllegalArgumentException] {
      api.UpsertStore.readAsOf(spark, d, 3L)
    }
    // retention is idempotent and never breaks the current read
    api.UpsertStore.retain(spark, d, keepCommits = 2)
    assert(state(d).size == 5)
  }

  test("inline retainCommits bounds generation growth during a CDC run") {
    val d = tmpDir("ret_inline")
    (1 to 8).foreach { i =>
      api.UpsertStore.update(df((1L, i.toLong, s"v$i")), d, "k", "version",
        nBuckets = 2, batchId = Some(s"c$i"), retainCommits = 3)
    }
    // key 1 always lands in one bucket: without pruning that bucket
    // would hold 8 generations; keep-3 bounds it
    val gens = new java.io.File(d).listFiles()
      .filter(_.getName.matches("b\\d+"))
      .map(_.listFiles().count(_.getName.startsWith("g"))).max
    assert(gens <= 3, s"inline retention left $gens generations")
    assert(api.UpsertStore.baseSeq(spark, d) == 6L)
    assert(state(d) == Seq((1L, 8L, "v8")))
  }

  // ---- schema evolution --------------------------------------------------

  test("schema evolution survives delete, UPDATE, rebucket and retention") {
    val d = tmpDir("evo")
    df((1L, 1L, "a"), (2L, 1L, "b")).createOrReplaceTempView("r11_evo_v1")
    api.UpsertStore.update(spark.table("r11_evo_v1"), d, "k", "version",
      nBuckets = 4, batchId = Some("v1"))
    // batch 2 ADDS a column for one key only
    Seq((3L, 1L, "c", 42L)).toDF("k", "version", "payload", "score")
      .createOrReplaceTempView("r11_evo_v2")
    api.UpsertStore.update(spark.table("r11_evo_v2"), d, "k", "version",
      nBuckets = 4, batchId = Some("v2"))
    def rows() = api.UpsertStore.read(spark, d)
      .select("k", "version", "payload", "score")
      .as[(Long, Long, String, Option[Long])].collect().sortBy(_._1).toSeq
    assert(rows() == Seq((1L, 1L, "a", None), (2L, 1L, "b", None),
      (3L, 1L, "c", Some(42L))))
    // a predicate over the evolved column sees NULL on old generations
    // (not an AnalysisException) — delete removes only the real match
    assert(api.UpsertStore.delete(spark, d, expr("score = 42")) == 1L)
    assert(rows() == Seq((1L, 1L, "a", None), (2L, 1L, "b", None)))
    // UPDATE backfills the evolved column on a pre-evolution row
    assert(api.UpsertStore.updateRows(spark, d,
      Seq("score" -> lit(7L)), expr("k = 1")) == 1L)
    assert(rows() == Seq((1L, 1L, "a", Some(7L)), (2L, 1L, "b", None)))
    // rebucket preserves the merged schema
    api.UpsertStore.rebucket(spark, d, "k", 8)
    assert(rows() == Seq((1L, 1L, "a", Some(7L)), (2L, 1L, "b", None)))
    assert(api.UpsertStore.buckets(spark, d) == 8)
  }

  // ---- point lookup + changefeed -----------------------------------------

  test("lookup reads ONLY the probed keys' buckets (physical scan paths)") {
    val d = tmpDir("lookup")
    api.UpsertStore.update(
      (1 to 64).map(i => (i.toLong, 1L, s"v$i")).toDF("k", "version", "payload"),
      d, "k", "version", nBuckets = 16, batchId = Some("seed"))
    val probe = Seq(7L).toDF("k")
    val got = api.UpsertStore.lookup(probe, d, "k")
    assert(got.select("k", "version", "payload")
      .as[(Long, Long, String)].collect().toSeq == Seq((7L, 1L, "v7")))
    // the scan's root paths must sit inside ONE bucket dir — the one
    // key 7 hashes into — not the whole store
    val scanPaths = got.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.rootPaths.map(_.toString)
    }.flatten.filter(_.contains(d))
    assert(scanPaths.nonEmpty)
    val bucketsRead = scanPaths.map(_.replaceAll(".*/(b\\d+)/.*", "$1")).distinct
    assert(bucketsRead.size == 1,
      s"one probe key must read one bucket, read: $bucketsRead")
    // a probe on an absent key returns empty, not an error
    assert(api.UpsertStore.lookup(Seq(9999L).toDF("k"), d, "k").count() == 0)
  }

  test("changesBetween: insert/update/delete/unchanged; untouched buckets unread") {
    val d = tmpDir("cdc_out")
    api.UpsertStore.update(
      (1 to 32).map(i => (i.toLong, 1L, s"v$i")).toDF("k", "version", "payload"),
      d, "k", "version", nBuckets = 8, batchId = Some("c1"))
    // commit 2: update key 1, insert key 100; commit 3: delete key 2
    api.UpsertStore.update(df((1L, 2L, "v1b"), (100L, 1L, "new")),
      d, "k", "version", nBuckets = 8, batchId = Some("c2"))
    api.UpsertStore.delete(spark, d, expr("k = 2"), batchId = Some("c3"))
    val ch = api.UpsertStore.changesBetween(spark, d, 1L, 3L, "k")
    val rows = ch.select("change", "k", "version", "payload")
      .as[(String, Long, Long, String)].collect().sortBy(_._2).toSeq
    assert(rows == Seq(("update", 1L, 2L, "v1b"), ("delete", 2L, 1L, "v2"),
      ("insert", 100L, 1L, "new")).sortBy(_._2))
    // buckets untouched by commits 2-3 must not even be scanned
    val scanned = ch.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.rootPaths.map(_.toString)
    }.flatten.filter(_.contains("/b")).map(_.replaceAll(".*/(b\\d+)/.*", "$1")).toSet
    val touched = Seq(1L, 2L, 100L)
      .map(k => api.UpsertStore.lookup(Seq(k).toDF("k"), d, "k"))
      .flatMap(_.queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.rootPaths.map(_.toString)
      }.flatten).map(_.replaceAll(".*/(b\\d+)/.*", "$1")).toSet
    assert(scanned.subsetOf(touched),
      s"changefeed scanned $scanned, but only $touched changed")
    // identical seqs diff to nothing
    assert(api.UpsertStore.changesBetween(spark, d, 3L, 3L, "k").count() == 0)
    // pre-retention history guard applies here too
    api.UpsertStore.retain(spark, d, keepCommits = 1)
    intercept[IllegalArgumentException] {
      api.UpsertStore.changesBetween(spark, d, 1L, 3L, "k")
    }
  }

  test("changesSince: at-least-once cursor; uncommitted windows redeliver") {
    val base = tmpDir("consume")
    val d = s"$base/table"
    val cursor = s"$base/cursor.json"
    api.UpsertStore.update(df((1L, 1L, "a"), (2L, 1L, "b")), d, "k", "version",
      nBuckets = 4, batchId = Some("c1"))
    def consume() = {
      val (ch, head) = api.UpsertStore.changesSince(spark, d, "k", cursor)
      (ch.select("change", "k").as[(String, Long)].collect().sortBy(_._2).toSeq,
        head)
    }
    // initial load: everything is an insert
    val (w1, h1) = consume()
    assert(w1 == Seq(("insert", 1L), ("insert", 2L)) && h1 == 1L)
    // crash before commitCursor: the SAME window redelivers
    assert(consume()._1 == w1)
    api.UpsertStore.commitCursor(spark, cursor, h1)
    // nothing new: empty window at the same head
    val (w2, h2) = consume()
    assert(w2.isEmpty && h2 == 1L)
    api.UpsertStore.update(df((2L, 5L, "b5")), d, "k", "version",
      nBuckets = 4, batchId = Some("c2"))
    assert(consume() == (Seq(("update", 2L)), 2L))
    // a consumer that fell behind the retention horizon fails loudly
    (3 to 6).foreach { i =>
      api.UpsertStore.update(df((1L, i.toLong, s"v$i")), d, "k", "version",
        nBuckets = 4, batchId = Some(s"c$i"))
    }
    api.UpsertStore.retain(spark, d, keepCommits = 2)
    intercept[IllegalArgumentException] {
      api.UpsertStore.changesSince(spark, d, "k", cursor)
    }
  }

  test("readAsOf(snapshotSeq) is torn-proof under a live concurrent writer") {
    val d = tmpDir("snap_reader")
    val keys = 1 to 40
    def batchDf(v: Int) = keys.map(k => (k.toLong, v.toLong, s"p$v"))
      .toDF("k", "version", "payload")
    api.UpsertStore.update(batchDf(1), d, "k", "version", nBuckets = 4,
      batchId = Some("v1"))
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    @volatile var writing = true
    val writer = new Thread(() => {
      try (2 to 8).foreach { v =>
        api.UpsertStore.update(batchDf(v), d, "k", "version", nBuckets = 4,
          batchId = Some(s"v$v"))
      } catch { case t: Throwable => errs.add(t) }
      finally writing = false
    })
    // every batch rewrites EVERY key, so a consistent snapshot holds
    // exactly one version across its 40 rows; a torn read (some buckets
    // at seq s, others at s+1) would mix versions. Plain read() is
    // ALLOWED to tear across buckets — readAsOf(snapshotSeq) is not.
    val reader = new Thread(() => {
      try while (writing) {
        val s = api.UpsertStore.snapshotSeq(spark, d)
        val versions = api.UpsertStore.readAsOf(spark, d, s)
          .select("version").distinct().as[Long].collect().toSeq
        assert(versions.size == 1,
          s"snapshot at seq $s mixed versions: $versions")
        assert(versions.head == s, s"snapshot seq $s read version ${versions.head}")
      } catch { case t: Throwable => errs.add(t) }
    })
    writer.start(); reader.start()
    writer.join(180000L); reader.join(30000L)
    assert(errs.isEmpty, s"failure under concurrency: ${Option(errs.peek())}")
    assert(api.UpsertStore.read(spark, d).where("version = 8").count() == 40L)
  }

  test("optimize: content and time travel unchanged, file count bounded, idempotent") {
    val d = tmpDir("optimize")
    // two commits so compaction has history to preserve
    api.UpsertStore.update(
      (1 to 40).map(i => (i.toLong, 1L, s"v$i")).toDF("k", "version", "payload"),
      d, "k", "version", nBuckets = 4, batchId = Some("c1"))
    api.UpsertStore.update(df((1L, 2L, "v1b")), d, "k", "version",
      nBuckets = 4, batchId = Some("c2"))
    val preSeq = api.UpsertStore.snapshotSeq(spark, d)
    val preState = state(d)
    val preAsOf1 = api.UpsertStore.readAsOf(spark, d, 1L).count()
    val rewrote = api.UpsertStore.optimize(spark, d, targetFileBytes = 1L << 30)
    assert(rewrote > 0, "a 4-partition staged write must leave compactable buckets")
    // content identical; compaction is its own commit
    assert(state(d) == preState)
    assert(api.UpsertStore.snapshotSeq(spark, d) == preSeq + 1)
    assert(api.UpsertStore.commits(spark, d)
      .where("kind = 'optimize'").count() == 1L)
    // pre-compaction history still reconstructs
    assert(api.UpsertStore.readAsOf(spark, d, preSeq)
      .select("k", "version", "payload")
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq == preState)
    assert(api.UpsertStore.readAsOf(spark, d, 1L).count() == preAsOf1)
    // idempotent: a second pass finds nothing to rewrite
    assert(api.UpsertStore.optimize(spark, d, targetFileBytes = 1L << 30) == 0)
    // every compacted bucket is down to one file
    val f = api.StoreIO.fs(spark, d)
    (0 until 4).foreach { b =>
      val p = new org.apache.hadoop.fs.Path(s"$d/b$b")
      if (f.exists(p)) {
        val newest = f.listStatus(p).filter(_.isDirectory)
          .map(_.getPath).maxBy(_.getName)
        assert(f.listStatus(newest)
          .count(st => !st.isDirectory && st.getPath.getName.startsWith("part-")) <= 1)
      }
    }
  }

  test("maintenance SQL: OPTIMIZE and VACUUM RETAIN route correctly; bad shapes throw") {
    val d = tmpDir("maint")
    (1 to 4).foreach { i =>
      api.UpsertStore.update(df((i.toLong, 1L, s"v$i")), d, "k", "version",
        nBuckets = 2, batchId = Some(s"c$i"), retainCommits = Int.MaxValue)
    }
    assert(api.MergeSql.runMaintenance(spark,
      s"VACUUM '$d' RETAIN 2 COMMITS") == 3L)
    assert(api.UpsertStore.baseSeq(spark, d) == 3L)
    val rewrote = api.MergeSql.runMaintenance(spark, s"OPTIMIZE '$d'")
    assert(rewrote >= 0L)
    assert(state(d).size == 4)
    // VERSION AS OF read-back goes through the same guard as readAsOf
    assert(api.MergeSql.readTarget(spark, d, versionAsOf = Some(3L)).count() == 3L)
    intercept[IllegalArgumentException] {
      api.MergeSql.readTarget(spark, d, versionAsOf = Some(1L))
    }
    intercept[IllegalArgumentException] {
      api.MergeSql.runMaintenance(spark, s"VACUUM '$d'")
    }
    intercept[IllegalArgumentException] {
      api.MergeSql.runMaintenance(spark, s"COMPACT '$d'")
    }
  }

  // ---- concurrency soak --------------------------------------------------

  test("two concurrent MERGE writers on distinct batches both land exactly once") {
    val d = tmpDir("soak")
    api.UpsertStore.update(df((0L, 1L, "seed")), d, "k", "version",
      nBuckets = 4, batchId = Some("seed"))
    // two threads, each MERGEs its own 20-key batch via SQL text with
    // its own batchId; the lease serializes them — the loser retries
    // on LeaseHeldException until it lands (mirrors the sink posture)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val applied = new java.util.concurrent.atomic.AtomicInteger(0)
    def worker(w: Int): Thread = new Thread(() => {
      try {
        val rows = (1 to 20).map(i => (w * 100L + i, 1L, s"w$w-$i"))
        rows.toDF("k", "version", "payload")
          .createOrReplaceTempView(s"r11_soak_$w")
        val sql = s"MERGE INTO '$d' USING r11_soak_$w ON t.k = s.k " +
          "LATEST BY version WHEN MATCHED THEN UPDATE SET * " +
          "WHEN NOT MATCHED THEN INSERT *"
        var done = false
        val deadline = System.currentTimeMillis() + 120000L
        while (!done) {
          try {
            if (api.MergeSql.run(spark, sql, nBuckets = 4,
                batchId = Some(s"w$w"))) applied.incrementAndGet()
            done = true
          } catch {
            case _: api.StoreIO.LeaseHeldException
                if System.currentTimeMillis() < deadline =>
              Thread.sleep(200L)
          }
        }
        // a REPLAY of the same batch right after must be a no-op even
        // with the peer racing
        var replayed = false
        while (!replayed) {
          try {
            assert(!api.MergeSql.run(spark, sql, nBuckets = 4,
              batchId = Some(s"w$w")), s"worker $w replay must be a no-op")
            replayed = true
          } catch {
            case _: api.StoreIO.LeaseHeldException
                if System.currentTimeMillis() < deadline =>
              Thread.sleep(200L)
          }
        }
      } catch { case t: Throwable => errs.add(t) }
    })
    val ws = Seq(worker(1), worker(2))
    ws.foreach(_.start()); ws.foreach(_.join(180000L))
    assert(errs.isEmpty, s"worker failure: ${Option(errs.peek())}")
    assert(applied.get() == 2, "each batch must apply exactly once")
    val got = state(d)
    assert(got.size == 41, s"expected seed + 2x20 rows, got ${got.size}")
    assert(got.count(_._3.startsWith("w1-")) == 20)
    assert(got.count(_._3.startsWith("w2-")) == 20)
    // commit log: seed + two merges, no torn seq
    assert(api.UpsertStore.snapshotSeq(spark, d) == 3L)
  }
}
