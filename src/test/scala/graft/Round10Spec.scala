package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Round10Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf
  import spark.implicits._

  // ---- DistOrder: the bucketed exact order statistics --------------------

  test("DistOrder.rankCum equals a global-window rank + cumsum exactly") {
    val rev = Tables.t(spark, sf, "orders")
      .groupBy("o_custkey")
      .agg(expr("sum(CAST(floor(o_totalprice * 100) AS BIGINT))").as("r"))
    val rk = api.DistOrder.rankCum(rev,
      -col("r"), Seq(desc("r"), col("o_custkey")), value = Some(col("r")),
      buckets = 7) // deliberately odd bucket count
    val w = Window.orderBy(desc("r"), col("o_custkey"))
    val truth = rev
      .withColumn("rn_t", row_number().over(w).cast("long"))
      .withColumn("cum_t", sum("r").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val joined = rk.df.join(truth.select("o_custkey", "rn_t", "cum_t"), "o_custkey")
    assert(joined.where("rn <> rn_t OR cum <> cum_t").count() == 0)
    assert(rk.n == rev.count())
    assert(rk.total == rev.agg(sum("r")).head().getLong(0))
    // the plan's windows are all bucket-partitioned
    val globalWins = joined.queryExecution.sparkPlan.collect {
      case win: org.apache.spark.sql.execution.window.WindowExec
          if win.partitionSpec.isEmpty => win
    }
    // truth side contributes the one intentional global window; the
    // rankCum side must contribute none — so exactly one in the join
    assert(globalWins.size <= 1)
  }

  test("DistOrder.rankCum is exact under heavy ties straddling bucket boundaries") {
    // value = id % 17 gives ~59 rows per tie-group over 1000 rows with
    // only 17 distinct bucket-key values and buckets = 5 — every
    // boundary lands ON a tie group, the worst case for order-aligned
    // bucketing (ties must co-locate or ranks interleave wrongly)
    val df = spark.range(1000).select(
      (col("id") % 17).as("v"), col("id").as("tie"))
    val rk = api.DistOrder.rankCum(df, col("v"),
      Seq(col("v").asc, col("tie").asc), value = Some(col("v")), buckets = 5)
    val w = Window.orderBy(col("v").asc, col("tie").asc)
    val truth = df
      .withColumn("rn_t", row_number().over(w).cast("long"))
      .withColumn("cum_t", sum("v").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    assert(rk.df.join(truth, Seq("v", "tie"))
      .where("rn <> rn_t OR cum <> cum_t").count() == 0)
    assert(rk.n == 1000L)
  }

  test("DistOrder.selectRanks returns exactly the requested order statistics") {
    val df = spark.range(1, 1001).select(
      ((col("id") * 37) % 1000).as("v"), col("id").as("tie"))
    val (rows, n) = api.DistOrder.selectRanks(df, col("v"),
      Seq(col("v").asc, col("tie").asc),
      m => Seq(1L, m / 2, m, m + 5 /* out of range: dropped */),
      buckets = 8)
    assert(n == 1000L)
    val got = rows.select("rn", "v", "tie").as[(Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    val w = Window.orderBy(col("v").asc, col("tie").asc)
    val truth = df.withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn").isin(1L, 500L, 1000L))
      .select("rn", "v", "tie").as[(Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(got == truth)
  }

  test("UpsertStore.rebucket: modulus change is invisible, ledger carries over") {
    val dir = s"target/tmp/rebucket_spec_${System.nanoTime()}"
    def df(rows: (Long, Long, String)*) = rows.toDF("k", "v", "p")
    api.UpsertStore.update(df((1L, 1L, "a"), (2L, 1L, "b")), dir, "k", "v",
      nBuckets = 2, batchId = Some("b0"))
    api.UpsertStore.rebucket(spark, dir, "k", 8)
    assert(api.UpsertStore.buckets(spark, dir) == 8)
    // replay of a PRE-rebucket batch is still a no-op (carried ledger)
    assert(!api.UpsertStore.update(df((1L, 9L, "ghost")), dir, "k", "v",
      nBuckets = 8, batchId = Some("b0")))
    // post-rebucket merges route on the new modulus and read back whole
    api.UpsertStore.update(df((2L, 2L, "b2"), (3L, 1L, "c")), dir, "k", "v",
      batchId = Some("b1"))
    assert(api.UpsertStore.read(spark, dir).select("k", "p")
      .as[(Long, String)].collect().sortBy(_._1).toSeq ==
      Seq((1L, "a"), (2L, "b2"), (3L, "c")))
    api.StoreIO.delete(spark, dir)
    api.StoreIO.delete(spark, s"$dir-old")
  }

  test("DistOrder.ntileOf matches ntile() for awkward n/tiles combinations") {
    for (n <- Seq(1L, 4L, 5L, 7L, 12L, 100L, 101L)) {
      val df = spark.range(n).toDF("id")
      val got = df.withColumn("rn", col("id") + 1)
        .withColumn("nt", api.DistOrder.ntileOf("rn", n, 5))
      val want = df.withColumn("nt_t", ntile(5).over(Window.orderBy("id")))
      val bad = got.join(want, "id").where("nt <> nt_t").count()
      assert(bad == 0, s"ntileOf mismatch at n=$n")
    }
  }

  // ---- MergeSql: the SQL-text MERGE surface -------------------------------

  test("MergeSql.parse extracts dir/source/key/version; rejects bad shapes") {
    val st = api.MergeSql.parse(
      "MERGE INTO '/tmp/store' AS t USING src AS s ON t.k = s.k " +
        "LATEST BY v WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    assert(st == api.MergeSql.Stmt("/tmp/store", "src", "k", "v"))
    // reversed ON qualifiers resolve; LATEST BY defaults to the key
    val st2 = api.MergeSql.parse(
      "merge into '/tmp/s2' using 'path/to.parquet' on s.id = t.id " +
        "when matched then update set * when not matched then insert *")
    assert(st2 == api.MergeSql.Stmt("/tmp/s2", "'path/to.parquet'", "id", "id"))
    intercept[IllegalArgumentException] { // alias mismatch in ON
      api.MergeSql.parse("MERGE INTO '/x' AS t USING src AS s ON a.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
    }
    intercept[IllegalArgumentException] { // unsupported clause body
      api.MergeSql.parse("MERGE INTO '/x' AS t USING src AS s ON t.k = s.k " +
        "WHEN MATCHED THEN DELETE WHEN NOT MATCHED THEN INSERT *")
    }
  }

  test("core_merge_sql (SQL path) equals core_upsert_store (API path) row-for-row") {
    val viaSql = Registry.byKey("core_merge_sql").query(spark, sf)
      .as[(Long, Long, Double)].collect().toSeq
    val viaApi = Registry.byKey("core_upsert_store").query(spark, sf)
      .as[(Long, Long, Double)].collect().toSeq
    assert(viaSql == viaApi)
  }

  test("DELETE SQL: null-predicate rows survive, replay is a no-op, bad shapes throw") {
    val dir = s"target/tmp/delete_sql_${System.nanoTime()}"
    Seq((1L, 1L, "keep"), (2L, 1L, "drop"), (3L, 1L, null.asInstanceOf[String]))
      .toDF("k", "v", "p").createOrReplaceTempView("del_sql_src")
    api.MergeSql.run(spark,
      s"MERGE INTO '$dir' USING del_sql_src ON t.k = s.k LATEST BY v " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
      nBuckets = 4)
    // p = 'drop' matches row 2; row 3's NULL comparison must KEEP the row
    val removed = api.MergeSql.runDelete(spark,
      s"DELETE FROM '$dir' WHERE p = 'drop'", batchId = Some("d1"))
    assert(removed == 1L)
    assert(api.MergeSql.readTarget(spark, dir).select("k")
      .as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    // ledger replay: same batchId removes nothing
    assert(api.MergeSql.runDelete(spark,
      s"DELETE FROM '$dir' WHERE k IS NOT NULL", batchId = Some("d1")) == 0L)
    assert(api.MergeSql.readTarget(spark, dir).count() == 2)
    intercept[IllegalArgumentException] {
      api.MergeSql.runDelete(spark, s"DELETE FROM '$dir'") // no WHERE
    }
    api.StoreIO.delete(spark, dir)
  }

  test("MERGE tombstones: delete clause removes, later version overrides, re-insert works") {
    val dir = s"target/tmp/cdc_tomb_${System.nanoTime()}"
    def stmt = s"MERGE INTO '$dir' USING cdc_tomb_src ON t.k = s.k LATEST BY v " +
      "WHEN MATCHED AND op = 'D' THEN DELETE " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
    def run(rows: (Long, Long, String, String)*): Unit = {
      rows.toDF("k", "v", "p", "op").createOrReplaceTempView("cdc_tomb_src")
      api.MergeSql.run(spark, stmt, nBuckets = 4); ()
    }
    def keys() = api.MergeSql.readTarget(spark, dir)
      .select("k").as[Long].collect().sorted.toSeq
    // within-batch: key 3's delete is SUPERSEDED by a later update
    run((1L, 1L, "a", "U"), (2L, 1L, "b", "U"), (3L, 1L, "c", "D"), (3L, 2L, "c2", "U"))
    assert(keys() == Seq(1L, 2L, 3L))
    // cross-batch tombstone removes key 1 (and an absent-key tombstone no-ops)
    run((1L, 5L, "x", "D"), (9L, 1L, "ghost", "D"))
    assert(keys() == Seq(2L, 3L))
    // re-insert after tombstone
    run((1L, 6L, "a2", "U"))
    assert(keys() == Seq(1L, 2L, 3L))
    api.StoreIO.delete(spark, dir)
  }

  test("MERGE tombstones: a bucket emptied by deletes promotes an empty generation") {
    val dir = s"target/tmp/cdc_empty_${System.nanoTime()}"
    Seq((1L, 1L, "only", "U")).toDF("k", "v", "p", "op")
      .createOrReplaceTempView("cdc_empty_src")
    def stmt = s"MERGE INTO '$dir' USING cdc_empty_src ON t.k = s.k LATEST BY v " +
      "WHEN MATCHED AND op = 'D' THEN DELETE " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
    api.MergeSql.run(spark, stmt, nBuckets = 4)
    Seq((1L, 2L, "only", "D")).toDF("k", "v", "p", "op")
      .createOrReplaceTempView("cdc_empty_src")
    api.MergeSql.run(spark, stmt, nBuckets = 4)
    // the sole key's bucket is now an EMPTY generation — readable, 0 rows
    assert(api.MergeSql.readTarget(spark, dir).count() == 0)
    api.StoreIO.delete(spark, dir)
  }

  test("deleteKeys: bucket-routed key-set erasure, replay no-op") {
    val dir = s"target/tmp/delkeys_${System.nanoTime()}"
    val rows = (1L to 40L).map(k => (k, 1L, s"p$k"))
    rows.toDF("k", "v", "p").createOrReplaceTempView("delkeys_src")
    api.MergeSql.run(spark,
      s"MERGE INTO '$dir' USING delkeys_src ON t.k = s.k LATEST BY v " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *",
      nBuckets = 8)
    val keys = Seq(3L, 7L, 999L).toDF("k") // 999 hits nothing
    assert(api.UpsertStore.deleteKeys(keys, dir, "k", batchId = Some("e1")) == 2L)
    assert(api.UpsertStore.read(spark, dir).count() == 38)
    // ledger replay removes nothing
    assert(api.UpsertStore.deleteKeys(keys, dir, "k", batchId = Some("e1")) == 0L)
    assert(api.UpsertStore.read(spark, dir).where("k IN (3, 7)").count() == 0)
    api.StoreIO.delete(spark, dir)
  }

  test("MergeSql replay with the same batchId is a no-op") {
    val dir = s"target/tmp/merge_replay_${System.nanoTime()}"
    Seq((1L, 1L, "a"), (2L, 1L, "b")).toDF("k", "v", "p")
      .createOrReplaceTempView("merge_replay_src")
    val stmt = s"MERGE INTO '$dir' USING merge_replay_src ON t.k = s.k LATEST BY v " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
    assert(api.MergeSql.run(spark, stmt, nBuckets = 4, batchId = Some("b0")))
    assert(!api.MergeSql.run(spark, stmt, nBuckets = 4, batchId = Some("b0")))
    assert(api.MergeSql.readTarget(spark, dir).count() == 2)
    api.StoreIO.delete(spark, dir)
  }

  // ---- store-concurrency hardening (round-10 ADVICE fixes) ----------------

  test("DqHistory.append is idempotent per run_seq across the ledger crash window") {
    val dir = s"target/tmp/dqh_replay_${System.nanoTime()}"
    def panel(ppm: Long) =
      Seq(("rows_nonnull", ppm, 900000L, true)).toDF("expectation", "metric_ppm", "threshold_ppm", "ok")
    assert(api.DqHistory.append(panel(990000L), dir, runSeq = 1L, batchId = Some("r1")))
    assert(api.DqHistory.append(panel(970000L), dir, runSeq = 2L, batchId = Some("r2")))
    // crash window replay: the run-2 swap landed but its ledger record was
    // lost — the redelivery arrives with a DIFFERENT ledger id and must
    // converge to ONE panel for run 2, not a duplicate that makes trend()
    // compare run 2 against itself
    assert(api.DqHistory.append(panel(970000L), dir, runSeq = 2L, batchId = Some("r2-replay")))
    val runs = api.DqHistory.read(spark, dir)
      .groupBy("run_seq").count().as[(Long, Long)].collect().toMap
    assert(runs == Map(1L -> 1L, 2L -> 1L))
    val t = api.DqHistory.trend(spark, dir).collect().head
    assert(t.getAs[Long]("prev_run_seq") == 1L && t.getAs[Long]("run_seq") == 2L)
    assert(t.getAs[Long]("delta_ppm") == -20000L)
  }

  test("vacuum: minAgeMs protects an in-flight staged write; tombstones cleaned") {
    val dir = s"target/tmp/vac_age_${System.nanoTime()}"
    val data = Seq((1L, "a")).toDF("k", "p")
    api.StoreIO.swapIn(data, spark, s"$dir/t")
    data.write.mode("overwrite").parquet(s"$dir/t-staged-0badf00d")
    // a freshly-written staged dir survives an age-guarded vacuum ...
    assert(api.StoreIO.vacuum(spark, dir, minAgeMs = 3600000L) == ((0, 0)))
    assert(api.StoreIO.exists(spark, s"$dir/t-staged-0badf00d"))
    // ... and is collected once it is old enough (age 0 = everything)
    assert(api.StoreIO.vacuum(spark, dir) == ((1, 0)))
    assert(!api.StoreIO.exists(spark, s"$dir/t-staged-0badf00d"))
    // orphaned lease-break tombstones are swept too
    val f = api.StoreIO.fs(spark, dir)
    f.create(new org.apache.hadoop.fs.Path(s"$dir/.lease-broken-deadbeef"), true).close()
    api.StoreIO.vacuum(spark, dir)
    assert(!api.StoreIO.exists(spark, s"$dir/.lease-broken-deadbeef"))
  }

  test("vacuum refuses to run while a writer holds the lease") {
    val dir = s"target/tmp/vac_lease_${System.nanoTime()}"
    api.StoreIO.swapIn(Seq((1L, "a")).toDF("k", "p"), spark, s"$dir/t")
    api.StoreIO.withLease(spark, dir) {
      intercept[api.StoreIO.LeaseHeldException] {
        api.StoreIO.vacuum(spark, dir)
      }
    }
  }

  test("withLease: stale break is atomic-rename based — loser raises, no double hold") {
    val dir = s"target/tmp/lease_break_${System.nanoTime()}"
    val f = api.StoreIO.fs(spark, dir)
    f.mkdirs(new org.apache.hadoop.fs.Path(dir))
    // a crashed writer's stale lease
    val lease = new org.apache.hadoop.fs.Path(s"$dir/.lease")
    f.create(lease, false).close()
    f.setTimes(lease, System.currentTimeMillis() - 3600000L, -1)
    // one waiter breaks it and proceeds; the lease is re-created by the
    // winner, so a second concurrent-ish waiter sees a FRESH lease and
    // raises instead of breaking the winner's
    var entered = 0
    api.StoreIO.withLease(spark, dir, staleMs = 60000L) {
      entered += 1
      intercept[api.StoreIO.LeaseHeldException] {
        api.StoreIO.withLease(spark, dir, staleMs = 60000L) { entered += 1 }
      }
    }
    assert(entered == 1)
    // released on exit; no tombstone debris left behind
    assert(!api.StoreIO.exists(spark, s"$dir/.lease"))
    assert(!f.listStatus(new org.apache.hadoop.fs.Path(dir))
      .exists(_.getPath.getName.startsWith(".lease-broken-")))
  }

  test("Wap: fatal errors propagate out of publish and leave the live table untouched") {
    val dir = s"target/tmp/wap_fatal_${System.nanoTime()}"
    val live = Seq((1L, "live")).toDF("k", "p")
    assert(api.Wap.publish(spark, live, dir, "t",
      Seq("nonempty" -> (df => df.count() > 0))).published)
    val batch = Seq((2L, "next")).toDF("k", "p")
    intercept[OutOfMemoryError] {
      api.Wap.publish(spark, batch, dir, "t",
        Seq("boom" -> (_ => throw new OutOfMemoryError("simulated"))))
    }
    // the live generation is still the first publish
    assert(api.StoreIO.read(spark, dir, "t").as[(Long, String)].collect().toSeq ==
      Seq((1L, "live")))
    // a NON-fatal check failure still audits cleanly (no publish, no throw)
    val rep = api.Wap.publish(spark, batch, dir, "t",
      Seq("fails" -> (_ => throw new RuntimeException("bad batch"))))
    assert(!rep.published && rep.checksFailed == 1)
  }

  // ---- webhook module ------------------------------------------------------

  test("WebhookModule: schema conforms, signatures verify, replays dedupe") {
    val del = api.WebhookModule.deliveries(spark, sf)
    // conform pins names + types; nullability flags are advisory in Spark
    assert(del.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      api.WebhookModule.DeliverySchema.struct.fields.map(f => (f.name, f.dataType)).toSeq)
    val parsed = api.WebhookModule.parse(del).localCheckpoint()
    // every 7th delivery is corrupted, everything else verifies
    assert(parsed.where("sig_ok <> (delivery_id % 7 <> 0)").count() == 0)
    // parse extracts the payload fields losslessly
    assert(parsed.where("customer IS NULL OR amount_cents IS NULL").count() == 0)
    val deduped = api.WebhookModule.dedupeReplays(parsed.where(col("sig_ok")))
    // one delivery per event_key, and it is the smallest delivery_id
    val w = deduped.groupBy("event_key").count().where("count > 1").count()
    assert(w == 0)
    val notMin = deduped.as("d").join(
      parsed.where(col("sig_ok")).groupBy("event_key")
        .agg(min("delivery_id").as("min_id")), "event_key")
      .where("delivery_id <> min_id")
    assert(notMin.count() == 0)
  }

  // ---- embedding near-dup: cell pruning is exact ---------------------------

  test("cell-pruned embedding neardup equals label-blocked all-pairs exactly") {
    val got = Registry.byKey("llm_embedding_neardup").query(spark, sf)
      .select("v1", "v2").as[(Long, Long)].collect().toSet
    val emb = Tables.t(spark, sf, "embeddings")
    graft.functions.CosineSimilarity.register(spark)
    val truth = emb.select(col("vec_id").as("v1"), col("embedding").as("e1"), col("label"))
      .join(emb.select(col("vec_id").as("v2"), col("embedding").as("e2"), col("label")), Seq("label"))
      .where("v1 < v2 AND cosine_sim(e1, e2) >= 0.35")
      .select("v1", "v2").as[(Long, Long)].collect().toSet
    assert(got == truth)
  }

  // ---- streaming sink lease retry ------------------------------------------

  test("mergeSink (SQL text) and upsertSink (API) converge to the same store state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = s"target/tmp/sink_parity_${System.nanoTime()}"
    val data = Seq((1L, 1L, "a1"), (2L, 1L, "b1"), (1L, 2L, "a2"), (3L, 1L, "c1"))
    val memA = MemoryStream[(Long, Long, String)]
    memA.addData(data)
    streaming.Streams.upsertSink(
      memA.toDF().toDF("k", "version", "payload"),
      key = "k", versionCol = "version",
      tableDir = s"$base/api", checkpointDir = s"$base/ckpt_api")
      .awaitTermination()
    val memB = MemoryStream[(Long, Long, String)]
    memB.addData(data)
    streaming.Streams.mergeSink(
      memB.toDF().toDF("k", "version", "payload"),
      s"MERGE INTO '$base/sql' USING parity_merge_batch ON t.k = s.k " +
        "LATEST BY version WHEN MATCHED THEN UPDATE SET * " +
        "WHEN NOT MATCHED THEN INSERT *",
      checkpointDir = s"$base/ckpt_sql")
      .awaitTermination()
    def state(dir: String) = api.UpsertStore.read(spark, dir)
      .select("k", "version", "payload")
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(state(s"$base/api") == state(s"$base/sql"))
    assert(state(s"$base/api") ==
      Seq((1L, 2L, "a2"), (2L, 1L, "b1"), (3L, 1L, "c1")))
  }

  test("upsertSink retries through a transiently-held writer lease") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = s"target/tmp/sink_retry_${System.nanoTime()}"
    val mem = MemoryStream[(Long, Long, String)]
    mem.addData(Seq((1L, 1L, "a")))
    // someone else holds the table lease right now (fresh mtime — not
    // stale, not breakable); the sink must wait it out, not die
    val f = api.StoreIO.fs(spark, s"$base/table")
    f.mkdirs(new org.apache.hadoop.fs.Path(s"$base/table"))
    val lease = new org.apache.hadoop.fs.Path(s"$base/table/.lease")
    f.create(lease, false).close()
    val releaser = new Thread(() => { Thread.sleep(3000L); f.delete(lease, false); () })
    releaser.start()
    val q = streaming.Streams.upsertSink(
      mem.toDF().toDF("k", "version", "payload"),
      key = "k", versionCol = "version",
      tableDir = s"$base/table", checkpointDir = s"$base/ckpt")
    q.awaitTermination()
    releaser.join()
    assert(api.UpsertStore.read(spark, s"$base/table").count() == 1)
  }
}
