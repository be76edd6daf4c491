package graft

import org.apache.spark.sql.GraftSqlBridge
import org.scalatest.funsuite.AnyFunSuite

/** Round-9b pins: hand-computed fixtures for the commerce analytics,
  * irregular-series, and corpus/embedding-audit operators.
  */
class Round9bSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("market basket: pair support and lift match the hand computation") {
    val dir = s"target/tmp/basket_${System.nanoTime()}"
    // orders 1:{10,20,30} 2:{10,20} 3:{10}; duplicate line for (1,10)
    // exercises the per-(order,part) distinct
    Seq((1L, 10L), (1L, 10L), (1L, 20L), (1L, 30L), (2L, 10L), (2L, 20L), (3L, 10L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Registry.byKey("rel_market_basket").query(spark, dir).collect()
    // only (10,20) reaches supp_ab >= 2; lift = 2*3/(3*2) = 1.0
    assert(got.length == 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5)) == (10L, 20L, 2L, 3L, 2L, 1000000L))
  }

  test("rfm: 5 single-order customers land in 5 distinct quintiles") {
    val dir = s"target/tmp/rfm_${System.nanoTime()}"
    val t0 = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
    (1 to 5).map(i => (i.toLong, i.toLong,
        new java.sql.Timestamp(t0 + i * 86400000L), i * 100.0))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Registry.byKey("rel_rfm_segmentation").query(spark, dir).collect()
    assert(got.length == 5 && got.forall(_.getLong(3) == 1L))
    // customer 5: most recent (r=1), freq ties broken by custkey (f=5),
    // highest monetary (m=1), 500.00 -> 50000 cents
    assert(got.exists(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(4)) ==
      (1, 5, 1, 50000L)))
  }

  test("time-weighted avg: piecewise-constant hold, pooled across users") {
    val dir = s"target/tmp/twa_${System.nanoTime()}"
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows = Seq(
      // user 1: v=10 held 10 s, terminal event carries no duration
      (1L, 1L, new java.sql.Timestamp(t0), "gauge", 10.0),
      (1L, 2L, new java.sql.Timestamp(t0 + 10000L), "gauge", 99.0),
      // user 2: v=20 for 5 s then v=40 for 5 s
      (2L, 3L, new java.sql.Timestamp(t0), "gauge", 20.0),
      (2L, 4L, new java.sql.Timestamp(t0 + 5000L), "gauge", 40.0),
      (2L, 5L, new java.sql.Timestamp(t0 + 10000L), "gauge", 77.0),
      // a single-event stream contributes nothing
      (3L, 6L, new java.sql.Timestamp(t0), "solo", 1.0))
    rows.toDF("user_id", "event_id", "ts", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Registry.byKey("rel_time_weighted_avg").query(spark, dir).collect()
    assert(got.map(_.getString(0)).toSeq == Seq("gauge"))
    val g = got.head
    // pooled: (10*10 + 20*5 + 40*5) / 20 s = 20.0 -> 20_000_000 micro
    assert((g.getLong(1), g.getLong(2), g.getLong(3)) == (2L, 3L, 20000000L))
  }

  test("seasonality: uniform hourly traffic indexes to exactly 1e6") {
    val dir = s"target/tmp/season_${System.nanoTime()}"
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    (0 until 24).map(h => (1L, h.toLong,
        new java.sql.Timestamp(t0 + h * 3600000L), "view", 3.0))
      .toDF("user_id", "event_id", "ts", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Registry.byKey("rel_seasonality_profile").query(spark, dir).collect()
    assert(got.length == 24)
    assert(got.forall(r => r.getLong(2) == 1L && r.getLong(3) == 1000000L &&
      r.getLong(4) == 3000000L))
    assert(got.map(_.getInt(1)).toSeq == (0 until 24))
  }

  test("token fertility: regex token and char counts are exact") {
    val dir = s"target/tmp/fert_${System.nanoTime()}"
    Seq((1L, "aa bb", "en", "web", 5L), (2L, "x1y", "de", "web", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Registry.byKey("llm_token_fertility").query(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    // "aa bb": 2 tokens / 5 chars -> 2*1e8/5 = 40_000_000 ppm
    val en = got("en")
    assert((en.getLong(1), en.getLong(2), en.getLong(3), en.getLong(4), en.getLong(5)) ==
      (1L, 2L, 5L, 40000000L, 2L))
    // "x1y": tokens x,1,y -> 3 tokens / 3 chars -> 1e8 ppm
    val de = got("de")
    assert((de.getLong(4), de.getLong(5)) == (100000000L, 3L))
  }

  test("mrl recall: zero upper half makes truncated ranking exact (recall 1e6)") {
    val dir = s"target/tmp/mrl_${System.nanoTime()}"
    // 20 vectors whose last 32 dims are all zero: sim_half == sim_full,
    // so the truncated top-10 must reproduce the full-dim top-10
    val rows = (0 until 20).map { i =>
      val v = Array.tabulate(64)(j =>
        if (j < 32) ((i * 31 + j * 17) % 97 + 1).toFloat else 0.0f)
      (i.toLong, v, i % 3)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Registry.byKey("llm_mrl_recall").query(spark, dir).collect()
    assert(got.length == 5)
    assert(got.forall(r => r.getLong(1) == 10L && r.getLong(2) == 1000000L))
  }

  test("plan pins: twa shares one exchange, basket scans lineitem once") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    def planOf(key: String): SparkPlan = {
      val df = Registry.byKey(key).query(spark, TestSpark.sf)
      df.collect()
      GraftSqlBridge.executedPlan(df) match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
    }
    def collectRec[A](p: SparkPlan)(f: PartialFunction[SparkPlan, A]): Seq[A] =
      p.collect {
        case q: QueryStageExec => collectRec(q.plan)(f)
        case n if f.isDefinedAt(n) => Seq(f(n))
      }.flatten

    // twa: the lead() window and the (user, type) aggregate must share
    // ONE exchange; only the |types|-sized re-agg and the final sort
    // may shuffle again — 3 total, and none between Window and its agg
    val twa = planOf("rel_time_weighted_avg")
    val shuffles = collectRec(twa) { case e: ShuffleExchangeExec => e }
    assert(shuffles.size == 3,
      s"twa expected 3 shuffles (window, type agg, sort), got ${shuffles.size}:\n$twa")

    // basket: items is checkpointed, so its FIVE consumers must not
    // re-scan parquet (0 file scans in the final plan) and the two
    // support joins must broadcast, never shuffle the pair stream
    val basket = planOf("rel_market_basket")
    val scans = collectRec(basket) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.isEmpty, s"basket re-scans parquet:\n$basket")
    val bhj = collectRec(basket) {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
    }
    assert(bhj.size >= 2, s"basket support joins must broadcast:\n$basket")
  }

  test("pair-generation memo: one jaccard/minhash build serves all consumers") {
    def builds(key: String) = ops.CorpusStats.dfComputes.getOrElse(key, 0L)
    // prime both memos (may or may not build, depending on suite order)
    Registry.byKey("llm_ngram_jaccard").query(spark, TestSpark.sf).collect()
    Registry.byKey("llm_minhash_verified").query(spark, TestSpark.sf).collect()
    val (j0, m0) = (builds("jaccardPairs"), builds("minhashVerifiedPairs"))
    // every consumer of either pair set must hit the session memo
    Registry.byKey("llm_ngram_jaccard").query(spark, TestSpark.sf).collect()
    Registry.byKey("llm_minhash_recall").query(spark, TestSpark.sf).collect()
    Registry.byKey("llm_minhash_cluster").query(spark, TestSpark.sf).collect()
    Registry.byKey("llm_dedup_verdicts").query(spark, TestSpark.sf).collect()
    assert(builds("jaccardPairs") == j0, "jaccardPairs rebuilt despite memo")
    assert(builds("minhashVerifiedPairs") == m0, "minhash pairs rebuilt despite memo")
  }

  test("vacuum: keeps the crash-window fallback, cleans nested debris") {
    import spark.implicits._
    val dir = s"target/tmp/vac_${System.nanoTime()}"
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    // store A crashed mid-swap: only the -old retiree survives — vacuum
    // must NOT delete it (it is the only complete generation)
    df.write.parquet(s"$dir/a-old")
    // store B is healthy with a stale retiree and an orphaned staged dir
    df.write.parquet(s"$dir/b")
    df.write.parquet(s"$dir/b-old")
    df.write.parquet(s"$dir/b-staged-0123abcd")
    // a bucketed store nests its debris one level down
    df.write.parquet(s"$dir/buckets/7/data")
    df.write.parquet(s"$dir/buckets/7/staged-deadbeef")
    val (nStaged, nOld) = api.StoreIO.vacuum(spark, dir)
    assert((nStaged, nOld) == (2, 1))
    // fallback read path still serves store A
    assert(api.StoreIO.read(spark, dir, "a").count() == 2)
    assert(api.StoreIO.read(spark, dir, "b").count() == 2)
    assert(spark.read.parquet(s"$dir/buckets/7/data").count() == 2)
    // second vacuum is a no-op
    assert(api.StoreIO.vacuum(spark, dir) == ((0, 0)))
  }

  test("rowgroup stats: footer counts match data on a multi-file Spark write") {
    import spark.implicits._
    val dir = s"target/tmp/rgstats_${System.nanoTime()}"
    (1 to 100).map(i => (i.toLong, if (i % 4 == 0) null else s"v$i"))
      .toDF("l_orderkey", "l_returnflag")
      .repartition(3)
      .write.parquet(s"$dir/lineitem.parquet")
    val got = Registry.byKey("src_parquet_rowgroup_stats").query(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("l_orderkey") == ((100L, 0L)))
    assert(got("l_returnflag") == ((100L, 25L)))
  }
}
