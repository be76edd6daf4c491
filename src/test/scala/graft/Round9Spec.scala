package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 pins: the DQ metrics repository (append / trend / replay
  * ledger), its agreement with the relational core_dq_trend delta
  * math, and the RunLog Hadoop-FS port.
  */
class Round9Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def panel(rows: (String, Long, Long)*) =
    rows.toDF("expectation", "metric_ppm", "threshold_ppm")
      .withColumn("ok", col("metric_ppm") >= col("threshold_ppm"))

  test("DqHistory: two-run delta math, regression flags, replay no-op") {
    val dir = s"target/tmp/dqhist_${System.nanoTime()}"
    assert(api.DqHistory.append(
      panel(("complete", 1000000L, 1000000L), ("range", 999000L, 990000L),
        ("fresh_only_r1", 500000L, 400000L)),
      dir, runSeq = 1, batchId = Some("r1")))
    assert(api.DqHistory.append(
      panel(("complete", 998000L, 1000000L), // ok -> fail: regressed
        ("range", 998500L, 990000L)), // -500 ppm, still ok: not regressed
      dir, runSeq = 2, batchId = Some("r2")))

    val t = api.DqHistory.trend(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    // single-run expectations carry no delta
    assert(t.keySet == Set("complete", "range"))
    val c = t("complete")
    assert(c.getLong(4) == 1000000L && c.getLong(5) == 998000L)
    assert(c.getLong(6) == -2000L && c.getBoolean(7), "ok->fail must flag")
    val r = t("range")
    assert(r.getLong(6) == -500L && !r.getBoolean(7),
      "a within-threshold wiggle below the alert drop must not flag")

    // at-least-once redelivery of run 2: ledger makes it a no-op
    assert(!api.DqHistory.append(
      panel(("complete", 998000L, 1000000L)), dir, runSeq = 2, batchId = Some("r2")))
    assert(api.DqHistory.read(spark, dir).count() == 5)
  }

  test("DqHistory.trend agrees with core_dq_trend's delta math on the same panels") {
    // feed the store the SAME two shipdate-half panels the relational
    // op derives, then compare the shared columns row for row
    val dir = s"target/tmp/dqtrend_${System.nanoTime()}"
    val op = Registry.byKey("core_dq_trend").query(spark, TestSpark.sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))
    assert(op.nonEmpty)
    val p1 = op.map { case (e, thr, prev, _, _, _) => (e, prev, thr) }
    val p2 = op.map { case (e, thr, _, cur, _, _) => (e, cur, thr) }
    api.DqHistory.append(panel(p1.toIndexedSeq: _*), dir, runSeq = 1)
    api.DqHistory.append(panel(p2.toIndexedSeq: _*), dir, runSeq = 2)
    val viaStore = api.DqHistory.trend(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(4), r.getLong(5),
        r.getLong(6), r.getBoolean(7))).toSet
    // regressed definitions coincide when prev_ok == (prev >= thr)
    assert(viaStore == op.toSet)
  }

  test("ewma: a constant-valued user smooths to exactly its value; weights sum to 255") {
    val dir = s"target/tmp/ewma_${System.nanoTime()}"
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    // user 1: constant 2.5 → ewma_fp must be exactly 2_500_000 (the
    // dyadic weights sum to 255, so wsum = v*255 and div 255 is exact);
    // user 2: only 7 events → filtered (needs a full 8-lag window)
    val rows =
      (1 to 10).map(i => (1L, i.toLong, new java.sql.Timestamp(t0 + i * 1000L), "view", 2.5)) ++
      (1 to 7).map(i => (2L, 100L + i, new java.sql.Timestamp(t0 + i * 1000L), "view", 9.0))
    rows.toDF("user_id", "event_id", "ts", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Registry.byKey("rel_window_ewma").query(spark, dir).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L))
    assert(got.head.getLong(2) == 2500000L)
  }

  test("markov transitions: row probabilities sum to 1e6 up to floor loss") {
    val rows = Registry.byKey("rel_markov_transitions").query(spark, TestSpark.sf)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (from, ts) =>
      val pSum = ts.map(_._3).sum
      // each floor division loses < 1 ppm; k to-types lose < k total
      assert(pSum <= 1000000L && pSum > 1000000L - ts.length, s"$from: $pSum")
    }
  }

  test("conversion lag: cumulative curve is monotone and ends at exactly 1e6 ppm") {
    val rows = Registry.byKey("rel_conversion_lag").query(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.map(_._3).toSeq == rows.map(_._3).sorted.toSeq, "cum_ppm must be monotone")
    assert(rows.last._3 == 1000000L, "the full histogram must account for every converter")
  }

  test("cusum: a constructed rate level-shift is located at the shift hour") {
    val dir = s"target/tmp/cusum_${System.nanoTime()}"
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val hour = 3600L * 1000
    // 1 event/hour for hours 0-19, then 5/hour for hours 20-39: the
    // peak |CUSUM| of a single step change sits AT the step
    val rows = (0 until 20).map(h => (h.toLong, new java.sql.Timestamp(t0 + h * hour), 1)) ++
      (20 until 40).flatMap(h => (0 until 5).map(k =>
        ((h * 10 + k).toLong, new java.sql.Timestamp(t0 + h * hour + k), 1)))
    rows.map { case (id, ts, _) => (1L, id, ts, "click", 1.0) }
      .toDF("user_id", "event_id", "ts", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Registry.byKey("rel_changepoint_cusum").query(spark, dir).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(1) == 40L && r.getLong(2) == 120L)
    // CUSUM is computed on the inclusive prefix, so the last pre-shift
    // hour (19) attains the peak
    assert(r.getLong(3) == 19L, s"changepoint hour was ${r.getLong(3)}")
  }

  test("ewma and markov each run on ONE user_id hash exchange (plan pin)") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    def hashEx(p: SparkPlan): Seq[ShuffleExchangeExec] = {
      val here = p.collect {
        case e: ShuffleExchangeExec if e.outputPartitioning.isInstanceOf[HashPartitioning] => Seq(e)
        case q: QueryStageExec => hashEx(q.plan)
      }
      here.flatten
    }
    def nEx(key: String): Int = {
      val df = Registry.byKey(key).query(spark, TestSpark.sf)
      df.count()
      val plan = org.apache.spark.sql.GraftSqlBridge.executedPlan(df) match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      hashEx(plan).size
    }
    // ewma: the lag chain, the per-user count and the last-row filter
    // all sit on the single user_id exchange
    assert(nEx("rel_window_ewma") == 1, "rel_window_ewma must shuffle once")
    // markov: the lead window is the only data-sized exchange; the
    // |types|^2 aggregate and the broadcast total add at most one tiny
    // post-window exchange
    assert(nEx("rel_markov_transitions") <= 2, "rel_markov_transitions over-shuffles")
  }

  test("char entropy: repeated-character spam flags, uniform text does not") {
    val dir = s"target/tmp/entropy_${System.nanoTime()}"
    Seq(
      (1L, "a" * 200, "en", "s", 200L), // H = 0: gibberish
      (2L, "ababababab" * 20, "en", "s", 200L), // H = 1 bit: still spam
      (3L, "the quick brown fox jumps over the lazy dog repeatedly", "en", "s", 54L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = Registry.byKey("llm_char_entropy_filter").query(spark, dir).collect()
    assert(r.length == 1)
    assert(r.head.getLong(1) == 3L, "all docs counted")
    assert(r.head.getLong(2) == 2L, "exactly the two low-entropy docs flag (< 2 bits)")
  }

  test("parquet bloom write option actually lands a bloom filter in the footer") {
    import scala.jdk.CollectionConverters._
    val dir = s"target/tmp/bloomchk_${System.nanoTime()}"
    Tables.t(spark, TestSpark.sf, "orders")
      .select("o_orderkey", "o_custkey")
      .coalesce(1)
      .write
      .option("parquet.bloom.filter.enabled#o_orderkey", "true")
      .option("parquet.bloom.filter.expected.ndv#o_orderkey", "200000")
      .mode("overwrite").parquet(dir)
    val part = new java.io.File(dir).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val conf = spark.sparkContext.hadoopConfiguration
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(part.getAbsolutePath), conf))
    try {
      val rg = reader.getRowGroups.get(0)
      val okCol = rg.getColumns.asScala
        .find(_.getPath.toDotString == "o_orderkey").get
      val other = rg.getColumns.asScala
        .find(_.getPath.toDotString == "o_custkey").get
      val bfr = reader.getBloomFilterDataReader(rg)
      // a silently-ignored option here would mean every "point lookup"
      // is a full row-group scan at 100 TB
      assert(bfr.readBloomFilter(okCol) != null, "o_orderkey must carry a bloom filter")
      assert(bfr.readBloomFilter(other) == null, "un-requested columns must not pay for one")
    } finally reader.close()
  }

  test("RunLog reads its history through Hadoop FS (file:-qualified URI)") {
    val dir = s"file:${new java.io.File(s"target/tmp/runlog_${System.nanoTime()}").getAbsolutePath}"
    assert(api.RunLog.last(spark, dir, "stage_a").isEmpty)
    api.RunLog.append(spark, dir, "stage_a", runSeq = 1, watermark = 42L, rowsConsumed = 10L)
    api.RunLog.append(spark, dir, "stage_a", runSeq = 2, watermark = 99L, rowsConsumed = 5L)
    val last = api.RunLog.last(spark, dir, "stage_a")
    // a java.io.File probe would read file:/... as missing, reset to
    // run_seq 1 and silently re-consume — the exact HDFS/S3 bug class
    assert(last.exists(e => e.runSeq == 2 && e.watermark == 99L && e.rowsConsumed == 5L))
  }
}
