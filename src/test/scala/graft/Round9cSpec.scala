package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-9c pins: DES forecast exactness on a constant series and the
  * sentence-duplication boilerplate profile.
  */
class Round9cSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("DES: constant daily series forecasts itself exactly (mase 0)") {
    val dir = s"target/tmp/des_${System.nanoTime()}"
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    // 20 days x 3 orders/day: dy = 0 everywhere, so tnum = 0 and
    // lnum = 3*255 — every holdout forecast must be exactly 3
    val rows = for (day <- 0 until 20; k <- 0 until 3)
      yield ((day * 3 + k).toLong, new java.sql.Timestamp(t0 + day * 86400000L))
    rows.toDF("o_orderkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Registry.byKey("rel_forecast_des").query(spark, dir).collect()
    assert(got.map(_.getLong(0)).toSeq == (1L to 7L))
    assert(got.forall(r => r.getLong(1) == 3L && r.getLong(2) == 3L &&
      r.getLong(3) == 0L && r.getLong(4) == 0L))
  }

  test("DES: too-short series yields no backtest rows (anchor needs 9 obs)") {
    val dir = s"target/tmp/des_short_${System.nanoTime()}"
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    (0 until 10).map(i => (i.toLong, new java.sql.Timestamp(t0 + i * 86400000L)))
      .toDF("o_orderkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    assert(Registry.byKey("rel_forecast_des").query(spark, dir).count() == 0)
  }

  test("sentence dedup: repeated boilerplate counts, short fragments don't") {
    val dir = s"target/tmp/sentdup_${System.nanoTime()}"
    val bp = "subscribe to our newsletter today"
    Seq(
      (1L, s"$bp. the quick brown fox jumps over dogs. ok", "en", "a"),
      (2L, s"$bp. an entirely original second sentence here", "en", "a"),
      (3L, s"$bp. completely different content for source b", "en", "b"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", $"doc_id")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Registry.byKey("llm_dedup_sentence").query(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // source a: 4 sentences >= 20 chars, 2 of them the boilerplate
    assert(got("a") == ((4L, 2L, 500000L)))
    // source b: boilerplate + its own sentence; boilerplate dup'd globally
    assert(got("b") == ((2L, 1L, 500000L)))
  }

  test("label outliers: the planted far vector ranks first in its own label") {
    val dir = s"target/tmp/outl_${System.nanoTime()}"
    // per label: 5 near-identical vectors plus one planted far vector
    // (vec_id = label*100 + 99) that must surface as rank 1
    val rows = for (lab <- 0 until 3; i <- 0 until 6) yield {
      val far = i == 5
      val v = Array.tabulate(64)(j =>
        if (far) (if (j % 2 == 0) 5.0f else -5.0f)
        else lab.toFloat + j * 0.01f + i * 0.001f)
      ((lab * 100 + (if (far) 99 else i)).toLong, v, lab)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Registry.byKey("llm_label_outliers").query(spark, dir).collect()
    assert(got.length == 9) // 3 labels x top-3
    val rank1 = got.filter(_.getInt(1) == 1).map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(rank1 == Map(0 -> 99L, 1 -> 199L, 2 -> 299L))
  }

  test("user growth and stickiness: hand-computed two-day fixture") {
    val dir = s"target/tmp/growth_${System.nanoTime()}"
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 12:00:00").getTime
    val day = 86400000L
    // day 0: users 1, 3; day 1: users 1, 2 (two events for user 1 on
    // day 0 collapse in the distinct)
    Seq((1L, 1L, 0L), (1L, 2L, 0L), (3L, 3L, 0L), (1L, 4L, 1L), (2L, 5L, 1L))
      .map { case (u, e, dd) => (u, e, new java.sql.Timestamp(t0 + dd * day), "view", 1.0) }
      .toDF("user_id", "event_id", "ts", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val growth = Registry.byKey("rel_user_growth").query(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(growth.toSeq == Seq((2L, 2L, 2L), (2L, 1L, 3L)),
      s"got ${growth.toSeq}") // (dau, new, cum) per day
    val sticky = Registry.byKey("rel_dau_mau_stickiness").query(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // day 0: mau = {1,3}; day 1: trailing window covers all of {1,2,3}
    assert(sticky.toSeq == Seq((2L, 2L, 1000000L), (2L, 3L, 666666L)),
      s"got ${sticky.toSeq}")
  }

  test("dedup graph stats: degree mass equals twice the pair count, via memo") {
    // prime the memo for THIS dir first — the global build counter also
    // counts other suites' fixture dirs, so only the delta after
    // priming is meaningful
    Registry.byKey("llm_ngram_jaccard").query(spark, TestSpark.sf).count()
    val before = ops.CorpusStats.dfComputes.getOrElse("jaccardPairs", 0L)
    val nPairs = Registry.byKey("llm_ngram_jaccard").query(spark, TestSpark.sf).count()
    val hist = Registry.byKey("llm_dedup_graph_stats").query(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val mass = hist.map { case (deg, n) => deg * n }.sum
    assert(mass == 2 * nPairs, s"degree mass $mass != 2 * $nPairs pairs")
    // the cross-source matrix partitions the same pair set
    val srcMass = Registry.byKey("llm_cross_source_dups").query(spark, TestSpark.sf)
      .collect().map(_.getLong(2)).sum
    assert(srcMass == nPairs, s"source-matrix mass $srcMass != $nPairs pairs")
    // both rollups must ride the session memo, not rebuild the pairs
    assert(ops.CorpusStats.dfComputes.getOrElse("jaccardPairs", 0L) == before)
  }

  test("k-anonymity: planted singleton and small classes land in the right buckets") {
    val dir = s"target/tmp/kanon_${System.nanoTime()}"
    // class (A,1): 5 rows; (A,2): 2 rows; (B,1): 1 row (singleton)
    val rows = Seq.fill(5)(("A", 1)) ++ Seq.fill(2)(("A", 2)) ++ Seq(("B", 1))
    rows.zipWithIndex.map { case ((seg, nat), i) => (i.toLong, seg, nat) }
      .toDF("c_custkey", "c_mktsegment", "c_nationkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val r = Registry.byKey("core_kanonymity_audit").query(spark, dir).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (8L, 3L, 1L))
    assert((r.getLong(3), r.getLong(4), r.getLong(5)) == (1L, 2L, 5L))
    assert(r.getLong(6) == 375000L) // 3 of 8 rows below k=5
  }

  test("writer lease: concurrent writer rejected, stale lease broken, always released") {
    import org.apache.hadoop.fs.Path
    val dir = s"target/tmp/lease_${System.nanoTime()}"
    def batch(v: Long) = Seq((1L, v, s"x$v")).toDF("k", "ver", "payload")
    assert(api.UpsertStore.update(batch(1), dir, "k", "ver", nBuckets = 2))
    val f = api.StoreIO.fs(spark, dir)
    // a live concurrent writer holds the lease -> distinct batch rejected
    f.create(new Path(s"$dir/.lease"), false).close()
    intercept[api.StoreIO.LeaseHeldException] {
      api.UpsertStore.update(batch(2), dir, "k", "ver", nBuckets = 2)
    }
    // a CRASHED writer's lease (older than staleMs) is broken and the
    // update proceeds
    f.setTimes(new Path(s"$dir/.lease"), System.currentTimeMillis() - 3600000L, -1)
    assert(api.UpsertStore.update(batch(3), dir, "k", "ver", nBuckets = 2))
    assert(!f.exists(new Path(s"$dir/.lease")), "lease must be released after success")
    assert(api.UpsertStore.read(spark, dir).where("ver = 3").count() == 1)
    // DqHistory.append takes the same lease
    val dq = s"target/tmp/leasedq_${System.nanoTime()}"
    val panel = Seq(("m", 1000000L, 1000000L, true))
      .toDF("expectation", "metric_ppm", "threshold_ppm", "ok")
    assert(api.DqHistory.append(panel, dq, runSeq = 1))
    api.StoreIO.fs(spark, dq).create(new Path(s"$dq/.lease"), false).close()
    intercept[api.StoreIO.LeaseHeldException] {
      api.DqHistory.append(panel, dq, runSeq = 2)
    }
  }

  test("benford: audit arithmetic matches the hand-replicated integer math") {
    val dir = s"target/tmp/benford_${System.nanoTime()}"
    // counts = the Benford constants quantized to 1/1000: the test
    // replays the op's exact integer pipeline (counts -> ppm shares ->
    // |obs - const|) and pins row-for-row equality
    val const = Seq(301030L, 176091L, 124939L, 96910L, 79181L,
      66947L, 57992L, 51153L, 45757L)
    val counts = const.map(_ / 1000)
    val total = counts.sum
    val want = counts.zipWithIndex.map { case (n, i) =>
      val obs = n * 1000000L / total
      (i + 1, n, obs, const(i), math.abs(obs - const(i)))
    }
    val rows = counts.zipWithIndex.flatMap { case (n, i) =>
      Seq.fill(n.toInt)((i + 1) * 100.0 + 1.5)
    }
    rows.zipWithIndex.map { case (p, k) => (k.toLong, p) }
      .toDF("o_orderkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Registry.byKey("rel_benford_audit").query(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == want)
  }

  test("WAP: a failing audit aborts, cleans staging, and leaves the table intact") {
    val dir = s"target/tmp/wapspec_${System.nanoTime()}"
    val good = Seq((1L, 5.0), (2L, 7.0)).toDF("k", "price")
    val checks = Seq[(String, org.apache.spark.sql.DataFrame => Boolean)](
      "non_empty" -> (df => df.limit(1).count() > 0),
      "price_positive" -> (df => df.where("price <= 0").limit(1).count() == 0))
    val r1 = api.Wap.publish(spark, good, dir, "t", checks)
    assert(r1.published && r1.checksPassed == 2)
    assert(api.StoreIO.read(spark, dir, "t").count() == 2)
    // bad batch: audit must refuse, staging must vanish, table unchanged
    val bad = Seq((3L, -1.0)).toDF("k", "price")
    val r2 = api.Wap.publish(spark, bad, dir, "t", checks)
    assert(!r2.published && r2.failures == Seq("price_positive"))
    assert(api.StoreIO.read(spark, dir, "t").count() == 2, "live table must be untouched")
    val f = api.StoreIO.fs(spark, dir)
    val debris = f.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).filter(_.contains("staged"))
    assert(debris.isEmpty, s"staging not cleaned: ${debris.toSeq}")
  }

  test("pareto: hand-computed concentration on a 10-customer fixture") {
    val dir = s"target/tmp/pareto_${System.nanoTime()}"
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    // customer i spends 100*i; total = 5500; top-1 (ceil(10/100)=1) is
    // customer 10 with 1000/5500; top-10% also rank 1; top-50% = ranks
    // 1..5 (customers 10..6) = 4000/5500
    (1 to 10).map(i => (i.toLong, i.toLong, t0, i * 100.0))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Registry.byKey("rel_pareto_concentration").query(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (1, 1L, 1000L * 1000000L / 5500L),
      (50, 5L, 4000L * 1000000L / 5500L)),
      s"got ${got.toSeq}") // pct 10 collapses onto the pct-1 cut row at n=10
  }
}
