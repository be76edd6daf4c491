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
