package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8b pins: FK-integrity audit, expectation panel, histogram
  * median/MAD anomaly detection, rolling OLS regression.
  */
class Round8bSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def sf = TestSpark.sf

  test("fk audit: seeded orphans counted per edge, clean edge reports zero") {
    val rows = Registry.byKey("core_fk_integrity").query(spark, sf).collect()
    assert(rows.length == 5)
    val m = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val liRows = Tables.t(spark, sf, "lineitem").count()
    val (cr, _, orr, ork) = m("lineitem.l_orderkey->orders")
    assert(cr == liRows + 3, "child_rows counts the three seeded orphan rows")
    assert(orr == 3 && ork == 2, "two seeded keys (-7 twice, -8 once)")
    assert(m("lineitem.l_partkey->part")._3 == 1)
    assert(m("lineitem.l_suppkey->supplier")._3 == 1)
    assert(m("orders.o_custkey->customer")._3 == 2 &&
      m("orders.o_custkey->customer")._4 == 1)
    assert(m("customer.c_nationkey->nation")._3 == 0 &&
      m("customer.c_nationkey->nation")._4 == 0, "unseeded edge is consistent")
  }

  test("dq expectations: one-scan panel, failing expectations carry real ratios") {
    val rows = Registry.byKey("core_dq_expectations").query(spark, sf).collect()
    assert(rows.length == 7)
    val m = rows.map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    assert(m("completeness_quantity") == (1000000L, true))
    assert(m("range_discount")._2 && m("set_returnflag")._2 &&
      m("window_shipdate")._2 && m("positive_price")._2)
    // the synthetic lineitem genuinely violates these two
    val (discPpm, discOk) = m("discount_le_5pct")
    assert(!discOk && discPpm > 0 && discPpm < 990000)
    val (uniqPpm, uniqOk) = m("unique_orderline")
    assert(!uniqOk && uniqPpm > 0 && uniqPpm < 1000000)
  }

  test("anomaly mad == brute-force lower-median / MAD / 5-sigma count per type") {
    val byType = Tables.events(spark, sf)
      .select(col("event_type"), expr("CAST(floor(value * 1000000) AS BIGINT)").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def lowerMedian(sortedVs: Seq[Long]): Long = sortedVs(((sortedVs.size + 1) / 2) - 1)
    val got = Registry.byKey("rel_anomaly_mad").query(spark, sf).collect()
    assert(got.map(_.getString(0)).toSeq == byType.keys.toSeq.sorted)
    got.foreach { r =>
      val vs = byType(r.getString(0))
      val med = lowerMedian(vs)
      val mad = lowerMedian(vs.map(v => math.abs(v - med)).sorted)
      val outliers = vs.count(v => math.abs(v - med) > 5 * mad)
      assert(r.getLong(1) == vs.size.toLong, r.getString(0))
      assert(r.getLong(2) == med, s"${r.getString(0)} median")
      assert(r.getLong(3) == mad, s"${r.getString(0)} MAD")
      assert(r.getLong(4) == outliers.toLong, s"${r.getString(0)} outliers")
      assert(r.getLong(5) == outliers.toLong * 1000000L / math.max(1L, vs.size.toLong))
    }
  }

  test("rolling regression top-20 == brute-force trailing-8 OLS over all users") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(CAST(ts AS TIMESTAMP))").as("us"),
        expr("CAST(floor(value * 1000000) AS BIGINT)").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val windows = ev.groupBy(_._1).toSeq.flatMap { case (user, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2)).zipWithIndex
        .map { case ((_, eid, _, y), i) => (eid, i + 1L, y) }
      sorted.indices.filter(_ >= 7).map { i =>
        val w = sorted.slice(i - 7, i + 1)
        val (sx, sy) = (w.map(_._2).sum, w.map(_._3).sum)
        val sxy = w.map(r => r._2 * r._3).sum
        val sxx = w.map(r => r._2 * r._2).sum
        val num = 8 * sxy - sx * sy
        val den = 8 * sxx - sx * sx
        (user, sorted(i)._1, num / den, math.abs(num.toDouble / den))
      }
    }
    val expect = windows.sortBy { case (u, e, _, o) => (-o, u, e) }.take(20)
      .map { case (u, e, s, _) => (u, e, s) }
    val got = Registry.byKey("rel_rolling_regression").query(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect)
  }

  test("uniform sample estimator == brute-force md5 sample, CI verdict consistent") {
    val rows = Tables.t(spark, sf, "lineitem")
      .selectExpr("l_returnflag", "CAST(floor(l_extendedprice) AS BIGINT) AS v",
        "concat(CAST(l_orderkey AS STRING), ':', CAST(l_linenumber AS STRING), ':', " +
          "CAST(l_partkey AS STRING), ':', CAST(l_suppkey AS STRING)) AS key")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    def h32(sx: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(sx.getBytes("UTF-8")).take(4)
      d.foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
    }
    val got = Registry.byKey("rel_sample_estimate_agg").query(spark, sf).collect()
    got.foreach { r =>
      val grp = rows.filter(_._1 == r.getString(0))
      val sample = grp.filter(t => h32(t._3) % 16 == 0)
      val exact = grp.map(_._2).sum
      val est = 16 * sample.map(_._2).sum
      val ci = math.floor(1.96 * math.sqrt(240.0 * sample.map(t => t._2 * t._2).sum)).toLong
      assert(r.getLong(1) == grp.size.toLong && r.getLong(2) == sample.size.toLong)
      assert(r.getLong(3) == exact && r.getLong(4) == est)
      assert(r.getLong(6) == ci)
      assert(r.getBoolean(7) == (math.abs(est - exact) <= ci), "within_ci verdict")
    }
  }

  test("stratified estimator: sub-target strata are a census with exactly 0 error") {
    // at sf0.001 every ship-year stratum is under the 2000-row target,
    // so the adaptive rate clamps to k=64 (all 64 hash buckets = census)
    val got = Registry.byKey("rel_stratified_estimate").query(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(2) == 64L, s"year ${r.getInt(0)}: expected census rate")
      assert(r.getLong(3) == r.getLong(1), "census samples every row")
      assert(r.getLong(5) == r.getLong(4), "census estimate is exact")
      assert(r.getLong(6) == 0L, "census error is zero")
    }
  }

  test("bitmap distinct == built-in countDistinct per group") {
    val got = Registry.byKey("rel_agg_bitmap_distinct").query(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Tables.t(spark, sf, "lineitem")
      .groupBy("l_returnflag").agg(countDistinct("l_partkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want && got.nonEmpty)
  }

  test("ingest gap report: constructed outage yields exact run-length accounting") {
    val dir = "target/tmp/gapfix"
    val t0 = java.sql.Timestamp.valueOf("2024-03-01 00:30:00").getTime
    def ev(id: Long, tpe: String, hour: Int) =
      (id, new java.sql.Timestamp(t0 + hour * 3600000L), id % 5, tpe, 1.0, "{}")
    import spark.implicits._
    // type A reports in hours {0,1,5} of the 0..6 span -> misses {2,3,4,6}:
    // one 3-hour outage and one trailing 1-hour gap. type B never misses.
    val rows = Seq(ev(1, "A", 0), ev(2, "A", 1), ev(3, "A", 5)) ++
      (0 to 6).map(h => ev(10 + h, "B", h))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Registry.byKey("core_ingest_gap_report").query(spark, dir).collect()
    assert(got.length == 2)
    val a = got(0); val b = got(1)
    assert(a.getString(0) == "A" && a.getLong(1) == 7 && a.getLong(2) == 4 &&
      a.getLong(3) == 3, s"A row: $a")
    assert(a.getAs[java.time.LocalDateTime](4).toString.startsWith("2024-03-01T02:00"))
    assert(b.getString(0) == "B" && b.getLong(1) == 7 && b.getLong(2) == 0 &&
      b.getLong(3) == 0 && b.isNullAt(4), s"B row: $b")
  }

  test("column mask preserves joinability: masked tokens group exactly like raw keys") {
    val masked = Registry.byKey("core_column_mask").query(spark, sf)
    // same name -> same token, different name -> different token (md5
    // equality-preservation is what makes masked data analyzable)
    val raw = Tables.t(spark, sf, "customer")
    assert(masked.select("masked_name").distinct().count() ==
      raw.select("c_name").distinct().count())
    // and the mask is deterministic: re-running yields identical rows
    val again = Registry.byKey("core_column_mask").query(spark, sf)
    assert(masked.collect().toSeq == again.collect().toSeq)
  }

  test("welch t-test == brute-force arms, sums, and IEEE formula") {
    def h32(sx: String): Long = {
      val dd = java.security.MessageDigest.getInstance("MD5")
        .digest(sx.getBytes("UTF-8")).take(4)
      dd.foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
    }
    val ev = Tables.events(spark, sf)
      .selectExpr("event_type", "user_id", "CAST(floor(value * 1000000) AS BIGINT) div 1000 AS v3")
      .collect().map(r => (r.getString(0), r.getLong(1), h32(r.getLong(1).toString) % 2, r.getLong(2)))
    val got = Registry.byKey("rel_ab_welch_ttest").query(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      // the unit of analysis is the USER: events roll up to one
      // observation per (type, user) before the t machinery
      val byUser = ev.filter(_._1 == r.getString(0))
        .groupBy(t => (t._2, t._3)).toSeq
        .map { case ((_, arm), rows) => (arm, rows.map(_._4).sum) }
      val a0 = byUser.filter(_._1 == 0).map(_._2)
      val a1 = byUser.filter(_._1 == 1).map(_._2)
      val (n0, n1) = (a0.length.toLong, a1.length.toLong)
      val (s0, s1) = (a0.sum, a1.sum)
      val (q0, q1) = (a0.map(v => BigInt(v) * v).sum, a1.map(v => BigInt(v) * v).sum)
      val var0 = (q0.toDouble - s0.toDouble * s0 / n0) / (n0 - 1)
      val var1 = (q1.toDouble - s1.toDouble * s1 / n1) / (n1 - 1)
      val se2 = var0 / n0 + var1 / n1
      val t = if (se2 > 0)
        math.floor((s1.toDouble / n1 - s0.toDouble / n0) / math.sqrt(se2) * 1000000).toLong
      else 0L
      assert((r.getLong(1), r.getLong(2)) == (n0, n1), r.getString(0))
      assert(r.getLong(3) == math.floor(s0.toDouble / n0 * 1000).toLong)
      assert(r.getLong(4) == math.floor(s1.toDouble / n1 * 1000).toLong)
      assert(r.getLong(5) == t, s"${r.getString(0)} t-stat")
    }
  }

  test("last-touch attribution == brute-force per-user walk") {
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "event_type",
        "unix_micros(CAST(ts AS TIMESTAMP)) AS us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val channels = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      var lastSrc: Option[(String, Long)] = None
      rows.sortBy(r => (r._4, r._2)).flatMap { case (_, _, tpe, us) =>
        val out = if (tpe == "purchase")
          Some(lastSrc.filter(us - _._2 <= 604800000000L).map(_._1).getOrElse("none"))
        else None
        if (tpe != "purchase") lastSrc = Some((tpe, us))
        out
      }
    }
    val want = channels.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Registry.byKey("rel_attribution_last_touch").query(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want && got.values.sum == channels.size.toLong)
  }

  test("cuped == brute-force per-user pre/post sums and algebraic variance") {
    def h32(sx: String): Long = {
      val dd = java.security.MessageDigest.getInstance("MD5")
        .digest(sx.getBytes("UTF-8")).take(4)
      dd.foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
    }
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "unix_micros(CAST(ts AS TIMESTAMP)) AS us",
        "CAST(floor(value * 1000000) AS BIGINT) div 1000 AS v3")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val mid = ev.map(_._2).min + (ev.map(_._2).max - ev.map(_._2).min) / 2
    val perUser = ev.groupBy(_._1).map { case (u, rows) =>
      (h32(u.toString) % 2,
        rows.filter(_._2 < mid).map(_._3).sum, rows.filter(_._2 >= mid).map(_._3).sum)
    }.toSeq
    val (a0, a1) = (perUser.filter(_._1 == 0), perUser.filter(_._1 == 1))
    val (n0, n1) = (a0.size.toLong, a1.size.toLong); val n = n0 + n1
    val (sx, sy) = (perUser.map(_._2).sum, perUser.map(_._3).sum)
    val sxy = perUser.map(r => BigInt(r._2) * r._3).sum
    val sxx = perUser.map(r => BigInt(r._2) * r._2).sum
    val syy = perUser.map(r => BigInt(r._3) * r._3).sum
    val covxy = sxy.toDouble - sx.toDouble * sy / n
    val varx = sxx.toDouble - sx.toDouble * sx / n
    val vary = syy.toDouble - sy.toDouble * sy / n
    val theta = if (varx > 0) covxy / varx else 0.0
    val r = Registry.byKey("rel_ab_cuped").query(spark, sf).collect().head
    assert((r.getLong(0), r.getLong(1)) == (n0, n1))
    assert(r.getLong(2) == math.floor(theta * 1000000).toLong, "theta")
    val diffRaw = a1.map(_._3).sum.toDouble / n1 - a0.map(_._3).sum.toDouble / n0
    val diffX = a1.map(_._2).sum.toDouble / n1 - a0.map(_._2).sum.toDouble / n0
    assert(r.getLong(3) == math.floor(diffRaw * 1000).toLong, "raw diff")
    assert(r.getLong(4) == math.floor((diffRaw - theta * diffX) * 1000).toLong, "adjusted diff")
    val adjVar = vary - 2 * theta * covxy + theta * theta * varx
    assert(r.getLong(5) == math.floor((1.0 - adjVar / vary) * 1000000).toLong, "variance reduction")
  }

  test("snaive mase: constructed periodic series scores exactly zero error") {
    val dir = "target/tmp/masefix"
    val t0 = java.sql.Timestamp.valueOf("2024-03-04 00:30:00").getTime
    def ev(id: Long, hour: Int) =
      (id, new java.sql.Timestamp(t0 + hour * 3600000L), id % 3, "P", 1.0, "{}")
    import spark.implicits._
    // hour-of-week 0 carries 1,2,3 events in train weeks 0-2 and the
    // train mean (2) in test week 3; every other hour is empty. The
    // 1-week-lag naive errs by 1+1 over 336 hours; the forecast errs 0.
    val rows = Seq(ev(1, 0)) ++ (2 to 3).map(i => ev(i.toLong, 168)) ++
      (4 to 6).map(i => ev(i.toLong, 336)) ++ (7 to 8).map(i => ev(i.toLong, 504))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Registry.byKey("rel_forecast_snaive_mase").query(spark, dir).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getString(0) == "P" && r.getLong(1) == 2000L / 336 &&
      r.getLong(2) == 0L && r.getLong(3) == 0L, s"row: $r")
  }

  test("ks drift == brute-force integer ECDF supremum") {
    val ev = Tables.events(spark, sf)
      .selectExpr("event_type", "unix_micros(CAST(ts AS TIMESTAMP)) AS us",
        "CAST(floor(value * 1000000) AS BIGINT) AS v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val mid = ev.map(_._2).min + (ev.map(_._2).max - ev.map(_._2).min) / 2
    val got = Registry.byKey("rel_ks_drift_test").query(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val grp = ev.filter(_._1 == r.getString(0))
      val a = grp.filter(_._2 < mid).map(_._3).sorted
      val b = grp.filter(_._2 >= mid).map(_._3).sorted
      val (na, nb) = (a.length.toLong, b.length.toLong)
      val vs = (a ++ b).distinct.sorted
      val best = vs.map { v =>
        val dd = math.abs(a.count(_ <= v) * nb - b.count(_ <= v) * na)
        (dd, v)
      }.maxBy(t => (t._1, -t._2)) // max dd, smallest v on ties
      assert((r.getLong(1), r.getLong(2)) == (na, nb))
      assert(r.getLong(3) == best._2, s"${r.getString(0)} argmax value")
      assert(r.getLong(4) == best._1 * 1000000L / (na * nb), s"${r.getString(0)} D")
    }
  }

  test("drift pair flags a constructed distribution shift") {
    val dir = "target/tmp/driftfix"
    val t0 = java.sql.Timestamp.valueOf("2024-05-06 00:30:00").getTime
    import spark.implicits._
    // first half: values 1..50; second half: values 51..100 — disjoint
    // supports, so KS must read exactly D=1 at the reference maximum
    // and PSI must scream (all current mass lands in the top decile)
    val rows = (1 to 100).map { h =>
      (h.toLong, new java.sql.Timestamp(t0 + h * 3600000L), h.toLong % 7, "P",
        h.toDouble, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ks = Registry.byKey("rel_ks_drift_test").query(spark, dir).collect().head
    assert(ks.getLong(4) == 1000000L, s"disjoint halves must give D=1: $ks")
    assert(ks.getLong(3) == 50000000L, "supremum at the reference maximum")
    val psi = Registry.byKey("rel_psi_drift").query(spark, dir).collect().head
    assert(psi.getLong(1) > 500000L, s"PSI must flag the shift (>0.5): $psi")
  }

  test("kaplan-meier == brute-force lifetable with quantized ln terms") {
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "event_type", "unix_micros(CAST(ts AS TIMESTAMP)) AS us")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val users = ev.groupBy(_._1).toSeq.map { case (_, rows) =>
      val first = rows.map(_._3).min
      val errs = rows.filter(_._2 == "error").map(_._3)
      if (errs.nonEmpty) ((errs.min - first) / 86400000000L, 0)
      else ((rows.map(_._3).max - first) / 86400000000L, 1)
    }.toSeq
    val nUsers = users.size.toLong
    val maxd = users.map(_._1).max
    var lnsum = 0L; var atRisk = nUsers; var dead = false
    val want = (0L to maxd).map { t =>
      val dth = users.count(u => u._1 == t && u._2 == 0).toLong
      val leave = users.count(_._1 == t).toLong
      if (atRisk > 0 && dth >= atRisk) dead = true
      else if (atRisk > 0 && dth > 0)
        lnsum += math.floor(math.log((atRisk - dth).toDouble / atRisk) * 1e12).toLong
      val surv = if (dead) 0L else math.floor(math.exp(lnsum.toDouble / 1e12) * 1e6).toLong
      val row = (t, atRisk, dth, surv)
      atRisk -= leave
      row
    }
    val got = Registry.byKey("rel_survival_km").query(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
  }

  test("gini == brute-force rank-weighted concentration per type") {
    val pu = Tables.events(spark, sf)
      .selectExpr("event_type", "user_id", "CAST(floor(value * 1000000) AS BIGINT) div 1000 AS v3")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(t => (t._1, t._2)).view.mapValues(_.map(_._3).sum).toMap
    val got = Registry.byKey("rel_value_gini").query(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val ss = pu.collect { case ((t, _), sum) if t == r.getString(0) => sum }.toSeq.sorted
      val n = ss.size.toLong; val tot = ss.sum
      val ws = ss.zipWithIndex.map { case (v, i) => (i + 1L) * v }.sum
      val gini = math.floor((2.0 * ws - (n + 1.0) * tot) / (n.toDouble * tot) * 1e6).toLong
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) == (n, tot, gini), r.getString(0))
    }
  }

  test("linear attribution conserves credit exactly and agrees with last-touch on 'none'") {
    val lin = Registry.byKey("rel_attribution_linear").query(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val purchases = Tables.events(spark, sf).where("event_type = 'purchase'").count()
    assert(lin.map(_._2).sum == purchases * 1000000L,
      "every purchase's 1e6 ppm must be fully distributed")
    val lastNone = Registry.byKey("rel_attribution_last_touch").query(spark, sf)
      .collect().find(_.getString(0) == "none").map(_.getLong(1)).getOrElse(0L)
    val linNone = lin.find(_._1 == "none").map(_._3).getOrElse(0L)
    assert(linNone == lastNone, "both models define an unattributed purchase identically")
  }

  test("rolling regression runs on ONE hash exchange (windows + top-k reuse it)") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    val df = Registry.byKey("rel_rolling_regression").query(spark, sf)
    df.count()
    def hashEx(p: SparkPlan): Seq[ShuffleExchangeExec] = {
      val here = p.collect {
        case e: ShuffleExchangeExec if e.outputPartitioning.isInstanceOf[HashPartitioning] => Seq(e)
        case q: QueryStageExec => hashEx(q.plan)
      }
      here.flatten
    }
    val plan = org.apache.spark.sql.GraftSqlBridge.executedPlan(df) match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val n = hashEx(plan).size
    assert(n == 1,
      s"row-number + five rolling sums + TakeOrdered must all sit on the single " +
        s"user_id exchange; found $n hash exchanges:\n$plan")
  }
}
