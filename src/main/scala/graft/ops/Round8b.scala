package graft.ops

import graft.{Op, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 second batch: DATA-QUALITY, GOVERNANCE, AND SELF-MEASURING
  * ANALYTICS — the "is the data I'm about to train on actually sound"
  * pass (FK integrity, expectations, ingestion gaps, masking), the
  * approximate-query estimators that ship their own error (uniform +
  * stratified sampling, bitmap distinct), and the statistics an
  * experimentation/monitoring platform runs on the event stream
  * (Welch t, CUPED, attribution, KS/PSI drift, MASE backtest,
  * Kaplan-Meier, MAD anomalies, Gini).
  *
  * FILE-WIDE DETERMINISM RULE, learned the hard way (see
  * rel_survival_km): no raw double is ever accumulated — not in an
  * aggregate, not even in an ordered window whose evaluation order
  * both engines define. Every double reduction is either a single
  * closed-form expression over already-aggregated integers (identical
  * IEEE tree on both engines) or quantized to fixed point BEFORE the
  * sum. Running ln() doubles through a window cumsum drifted 1 ulp
  * between Spark and DuckDB at sf0.01 and flipped a floor().
  *
  * 100-TB design notes, per op:
  *
  * - `core_fk_integrity`: every edge aggregates the CHILD side to
  *   distinct keys FIRST and anti-joins the compact (key, count)
  *   frame against the parent — the anti-join input is |distinct keys|
  *   rows, not |child rows|, so a 100-TB lineitem probes orders with a
  *   frame ~1000x smaller than itself and the counts ride along as
  *   map-side partials.
  * - `core_dq_expectations`: the whole expectation panel is ONE global
  *   conditional aggregate — a single scan, no shuffle wider than one
  *   row of counters (the uniqueness expectation adds the one distinct
  *   aggregate the semantics genuinely require).
  * - `rel_anomaly_mad`: exact median/MAD without sorting raw rows —
  *   the heavy aggregate is keyed (event_type, value_fp), a
  *   high-cardinality well-distributed key; only the COMPRESSED
  *   value-frequency histogram flows through the per-type ordered
  *   window, and the MAD pass re-groups that histogram, never the raw
  *   events. A naive percentile over a 5-value partition key would put
  *   the whole corpus in 5 tasks; this shape never does.
  * - `rel_rolling_regression`: one hash exchange on user_id serves the
  *   row-numbering window and all five rolling sums; the final top-20
  *   is TakeOrdered (no global sort). All sums are integer fixed-point
  *   so both engines agree bit-for-bit.
  */
object Round8b {

  // ---- core_fk_integrity ------------------------------------------------

  /** Audit one FK edge. `childKeys`/`parentKeys` each carry a single
    * BIGINT column `k`. NULL FKs are excluded (a nullable FK is not a
    * violation); the child aggregates to (k, count) before the anti
    * join, so the probe frame is distinct-key-sized.
    */
  private def fkEdge(name: String, childKeys: DataFrame,
      parentKeys: DataFrame): DataFrame = {
    val g = childKeys.where(col("k").isNotNull)
      .groupBy("k").agg(count(lit(1)).as("c"))
    val t = g.agg(coalesce(sum("c"), lit(0L)).as("child_rows"),
      count(lit(1)).as("child_keys"))
    val o = g.join(parentKeys.where(col("k").isNotNull), Seq("k"), "left_anti")
      .agg(coalesce(sum("c"), lit(0L)).as("orphan_rows"),
        count(lit(1)).as("orphan_keys"))
    t.crossJoin(broadcast(o)).select(lit(name).as("edge"),
      col("child_rows"), col("child_keys"), col("orphan_rows"), col("orphan_keys"))
  }

  /** Seeded orphan keys (the synthetic star schema is FK-consistent, so
    * without these every edge reports 0/0 and the driver compare would
    * never exercise the violation path). Three lineitem order-orphans
    * over two keys, one part orphan, one supplier orphan, two customer
    * orphans over one key; the nation edge stays clean to pin the
    * zero path. The oracle unions the identical literals.
    */
  private def seed(s: SparkSession, ks: Seq[Long]): DataFrame =
    s.sql(s"SELECT CAST(v AS BIGINT) AS k FROM VALUES ${ks.map(k => s"($k)").mkString(",")} t(v)")

  private def oSeed(ks: Seq[Long]): String =
    ks.map(k => s" UNION ALL SELECT CAST($k AS BIGINT)").mkString

  private def oEdge(i: Int, name: String, childCol: String, childTable: String,
      seeds: Seq[Long], parentCol: String, parentTable: String): String =
    s"c$i AS (SELECT $childCol AS k FROM $childTable${oSeed(seeds)}), " +
      s"g$i AS (SELECT k, count(*) AS c FROM c$i WHERE k IS NOT NULL GROUP BY 1), " +
      s"t$i AS (SELECT CAST(coalesce(SUM(c), 0) AS BIGINT) AS child_rows, " +
      s"count(*) AS child_keys FROM g$i), " +
      s"o$i AS (SELECT CAST(coalesce(SUM(c), 0) AS BIGINT) AS orphan_rows, " +
      s"count(*) AS orphan_keys FROM g$i WHERE NOT EXISTS " +
      s"(SELECT 1 FROM $parentTable p WHERE p.$parentCol = g$i.k)), " +
      s"e$i AS (SELECT '$name' AS edge, t$i.*, o$i.* FROM t$i, o$i)"

  private val fkEdges: Seq[(String, String, String, Seq[Long], String, String)] = Seq(
    ("lineitem.l_orderkey->orders", "l_orderkey", "lineitem", Seq(-7L, -7L, -8L), "o_orderkey", "orders"),
    ("lineitem.l_partkey->part", "l_partkey", "lineitem", Seq(-7L), "p_partkey", "part"),
    ("lineitem.l_suppkey->supplier", "l_suppkey", "lineitem", Seq(-7L), "s_suppkey", "supplier"),
    ("orders.o_custkey->customer", "o_custkey", "orders", Seq(-9L, -9L), "c_custkey", "customer"),
    ("customer.c_nationkey->nation", "c_nationkey", "customer", Seq(), "n_nationkey", "nation"))

  // ---- rel_anomaly_mad --------------------------------------------------

  /** Pick the k=(n+1) div 2 order statistic (lower median) out of a
    * cumulated frequency histogram: the row whose cumulative count
    * first reaches k. Integer-only, so engines cannot drift.
    */
  private val medianCond = "cum - c < (n + 1) div 2 AND (n + 1) div 2 <= cum"

  /** Per-type (med, mad, n) thresholds via the histogram method — shared
    * by the batch anomaly report and the streaming alert gate, so the
    * offline-trained thresholds and the batch analysis can never
    * disagree. Returns (event_type, med, mad, n); tiny (one row per
    * event type), safe to broadcast anywhere.
    */
  private[graft] def madThresholds(s: SparkSession, d: String): DataFrame =
    madOf(eventsFp(s, d).select("event_type", "v"))

  /** The histogram median/MAD pipeline over any (event_type, v) frame —
    * separated from the table loader so property tests can drive it
    * with arbitrary generated frames.
    */
  private[graft] def madOf(vf: DataFrame): DataFrame = {
    // the compressed value-frequency histogram feeds three separate
    // consumers (median, MAD, outlier count) — materialize it once
    val h = vf.groupBy("event_type", "v").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val wCum = Window.partitionBy("event_type").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy("event_type")
    val md = h.withColumn("cum", sum("c").over(wCum))
      .withColumn("n", sum("c").over(wTot))
      .where(medianCond)
      .select(col("event_type"), col("v").as("med"), col("n"))
    val dh = h.join(broadcast(md), "event_type")
      .select(col("event_type"), abs(col("v") - col("med")).as("dv"), col("c"))
      .groupBy("event_type", "dv").agg(sum("c").as("c"))
    val dCum = Window.partitionBy("event_type").orderBy("dv")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val mad = dh.withColumn("cum", sum("c").over(dCum))
      .withColumn("n", sum("c").over(wTot))
      .where(medianCond)
      .select(col("event_type"), col("dv").as("mad"))
    md.join(mad, "event_type")
      .select(col("event_type"), col("med"), col("mad"), col("n"))
  }

  /** Histogram frame `h` again, for consumers needing the raw counts. */
  private def valueHistogram(s: SparkSession, d: String): DataFrame =
    eventsFp(s, d).select("event_type", "v")
      .groupBy("event_type", "v").agg(count(lit(1)).as("c"))

  /** DuckDB twin of [[madThresholds]]: CTEs ending in `md(event_type,
    * med, n)` and `mad(event_type, mad)`.
    */
  private[graft] val oMadCtes: String =
    "vf AS (SELECT event_type, CAST(floor(value * 1000000) AS BIGINT) AS v FROM events), " +
      "h AS (SELECT event_type, v, count(*) AS c FROM vf GROUP BY 1, 2), " +
      "h2 AS (SELECT *, CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY v " +
      "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum, " +
      "CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS n FROM h), " +
      "md AS (SELECT event_type, v AS med, n FROM h2 " +
      "WHERE cum - c < (n + 1) // 2 AND (n + 1) // 2 <= cum), " +
      "dh AS (SELECT h.event_type, abs(h.v - md.med) AS dv, CAST(SUM(h.c) AS BIGINT) AS c " +
      "FROM h JOIN md USING(event_type) GROUP BY 1, 2), " +
      "dh2 AS (SELECT *, CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY dv " +
      "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum, " +
      "CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS n FROM dh), " +
      "mad AS (SELECT event_type, dv AS mad FROM dh2 " +
      "WHERE cum - c < (n + 1) // 2 AND (n + 1) // 2 <= cum)"

  // ---- approximate-query-processing estimators --------------------------

  /** 32-bit md5 prefix of a lineitem row key — the derandomized sampling
    * coin. Hashing row CONTENT (not a random()) keeps the sample
    * deterministic across engines, retries, and partitionings.
    */
  private val rowHash =
    "CAST(conv(substring(md5(concat(CAST(l_orderkey AS STRING), ':', " +
      "CAST(l_linenumber AS STRING), ':', CAST(l_partkey AS STRING), ':', " +
      "CAST(l_suppkey AS STRING))), 1, 8), 16, 10) AS BIGINT)"
  private val oRowHash =
    "CAST(concat('0x', substr(md5(concat(CAST(l_orderkey AS VARCHAR), ':', " +
      "CAST(l_linenumber AS VARCHAR), ':', CAST(l_partkey AS VARCHAR), ':', " +
      "CAST(l_suppkey AS VARCHAR))), 1, 8)) AS BIGINT)"

  // ---- distribution drift (KS / PSI) ------------------------------------

  /** Two-sample value histogram: events split at the time midpoint into
    * reference (a) and current (b) halves, counted per (event_type,
    * value_fp) — the same compressed-histogram discipline as the MAD
    * family: everything downstream of this one aggregate touches only
    * distinct values, never raw rows.
    */
  private def driftHistogram(s: SparkSession, d: String): DataFrame = {
    val ev = eventsFp(s, d).select("event_type", "us", "v")
    val b = ev.agg(expr("min(us) + (max(us) - min(us)) div 2").as("mid"))
    ev.crossJoin(broadcast(b))
      .groupBy("event_type", "v").agg(
        expr("count_if(us < mid)").as("ca"),
        expr("count_if(us >= mid)").as("cb"))
      .localCheckpoint()
  }

  /** DuckDB twin: CTEs ending in `h(event_type, v, ca, cb)`. */
  private val oDriftHist: String =
    "ev AS (SELECT event_type, epoch_us(ts) AS us, " +
      "CAST(floor(value * 1000000) AS BIGINT) AS v FROM events), " +
      "b AS (SELECT min(us) + (max(us) - min(us)) // 2 AS mid FROM ev), " +
      "h AS (SELECT event_type, v, " +
      "CAST(count_if(us < b.mid) AS BIGINT) AS ca, " +
      "CAST(count_if(us >= b.mid) AS BIGINT) AS cb " +
      "FROM ev, b GROUP BY 1, 2)"

  // ---- shared fixed-point event frame ----------------------------------

  private def eventsFp(s: SparkSession, d: String): DataFrame =
    T.events(s, d).select(col("event_type"), col("user_id"), col("event_id"),
      expr("unix_micros(CAST(ts AS TIMESTAMP))").as("us"),
      expr("CAST(floor(value * 1000000) AS BIGINT)").as("v"))

  val ops: Seq[Op] = Seq(

    // Referential-integrity audit over the star schema's FK edges:
    // per edge, total child rows/keys and orphan rows/keys (child FK
    // values with no parent). The child aggregates to distinct keys
    // BEFORE the anti join (see object doc); dim-sized parents
    // (nation) resolve as broadcast anti-joins, fact-sized parents as
    // shuffled ones — exactly what a 1000-executor plan wants.
    Op("core_fk_integrity",
      (s, d) => {
        fkEdges.map { case (name, cc, ct, seeds, pc, pt) =>
          val child0 = T.t(s, d, ct).select(col(cc).as("k"))
          val child = if (seeds.isEmpty) child0 else child0.unionByName(seed(s, seeds))
          fkEdge(name, child, T.t(s, d, pt).select(col(pc).as("k")))
        }.reduce(_ unionByName _).orderBy("edge")
      },
      Some("WITH " +
        fkEdges.zipWithIndex.map { case ((name, cc, ct, seeds, pc, pt), i) =>
          oEdge(i, name, cc, ct, seeds, pc, pt)
        }.mkString(", ") +
        " SELECT * FROM (" +
        fkEdges.indices.map(i => s"SELECT * FROM e$i").mkString(" UNION ALL ") +
        ") ORDER BY edge")),

    // Declarative data-quality expectation panel (the Deequ /
    // Great-Expectations shape): completeness, range, set-membership,
    // positivity, and key-uniqueness checks over lineitem, all
    // evaluated in ONE scan as conditional aggregates, reported as
    // integer ppm against a declared threshold. Two expectations
    // genuinely FAIL on the synthetic data (discount<=5% holds for
    // only ~55% of rows; (l_orderkey, l_linenumber) is not unique), so
    // the fail path is exercised with real measured ratios.
    Op("core_dq_expectations",
      (s, d) => {
        T.t(s, d, "lineitem").agg(
          count(lit(1)).as("n"),
          count(col("l_quantity")).as("qty_nn"),
          expr("count_if(l_discount >= 0 AND l_discount <= 0.1)").as("disc_rng"),
          expr("count_if(l_returnflag IN ('A','N','R'))").as("rf_set"),
          expr("count_if(CAST(l_shipdate AS DATE) >= DATE '1994-01-01' AND " +
            "CAST(l_shipdate AS DATE) < DATE '2003-01-01')").as("ship_rng"),
          expr("count_if(l_extendedprice > 0)").as("price_pos"),
          expr("count_if(l_discount <= 0.05)").as("disc_low"),
          // injective integer pair key (TPC-H pins l_linenumber in 1..7):
            // no per-row string concat/alloc on the 100-TB scan
            countDistinct(expr("l_orderkey * 10 + l_linenumber")).as("ol_keys"))
        .select(expr("stack(7, " +
          "'completeness_quantity', CAST(qty_nn * 1000000 div greatest(1, n) AS BIGINT), CAST(1000000 AS BIGINT), " +
          "'range_discount', CAST(disc_rng * 1000000 div greatest(1, n) AS BIGINT), CAST(1000000 AS BIGINT), " +
          "'set_returnflag', CAST(rf_set * 1000000 div greatest(1, n) AS BIGINT), CAST(1000000 AS BIGINT), " +
          "'window_shipdate', CAST(ship_rng * 1000000 div greatest(1, n) AS BIGINT), CAST(1000000 AS BIGINT), " +
          "'positive_price', CAST(price_pos * 1000000 div greatest(1, n) AS BIGINT), CAST(1000000 AS BIGINT), " +
          "'discount_le_5pct', CAST(disc_low * 1000000 div greatest(1, n) AS BIGINT), CAST(990000 AS BIGINT), " +
          "'unique_orderline', CAST(ol_keys * 1000000 div greatest(1, n) AS BIGINT), CAST(1000000 AS BIGINT)" +
          ") AS (expectation, metric_ppm, threshold_ppm)"))
        .withColumn("ok", col("metric_ppm") >= col("threshold_ppm"))
        .orderBy("expectation")
      },
      Some("WITH m AS (SELECT count(*) AS n, count(l_quantity) AS qty_nn, " +
        "count_if(l_discount >= 0 AND l_discount <= 0.1) AS disc_rng, " +
        "count_if(l_returnflag IN ('A','N','R')) AS rf_set, " +
        "count_if(CAST(l_shipdate AS DATE) >= DATE '1994-01-01' AND " +
        "CAST(l_shipdate AS DATE) < DATE '2003-01-01') AS ship_rng, " +
        "count_if(l_extendedprice > 0) AS price_pos, " +
        "count_if(l_discount <= 0.05) AS disc_low, " +
        "count(DISTINCT l_orderkey * 10 + l_linenumber) AS ol_keys FROM lineitem), " +
        "p AS (" + Seq(
          ("completeness_quantity", "qty_nn", 1000000),
          ("range_discount", "disc_rng", 1000000),
          ("set_returnflag", "rf_set", 1000000),
          ("window_shipdate", "ship_rng", 1000000),
          ("positive_price", "price_pos", 1000000),
          ("discount_le_5pct", "disc_low", 990000),
          ("unique_orderline", "ol_keys", 1000000)).map { case (nm, c, thr) =>
            s"SELECT '$nm' AS expectation, " +
              s"CAST($c * 1000000 // greatest(1, n) AS BIGINT) AS metric_ppm, " +
              s"CAST($thr AS BIGINT) AS threshold_ppm FROM m"
          }.mkString(" UNION ALL ") + ") " +
        "SELECT expectation, metric_ppm, threshold_ppm, " +
        "metric_ppm >= threshold_ppm AS ok FROM p ORDER BY expectation")),

    // Robust per-type anomaly detection: exact (lower-)median and MAD
    // via a value-frequency histogram — never a sort of raw rows, never
    // a 5-partition percentile (see object doc) — then the classic
    // |v - med| > 5*MAD outlier count, all in 1e-6 fixed point.
    Op("rel_anomaly_mad",
      (s, d) => {
        val t = madThresholds(s, d)
        val outl = valueHistogram(s, d).join(broadcast(t), "event_type")
          .groupBy("event_type")
          .agg(coalesce(sum(when(expr("abs(v - med) > 5 * mad"), col("c"))), lit(0L))
            .as("n_outliers"))
        t.join(outl, "event_type")
          .select(col("event_type"), col("n"), col("med").as("med_fp"),
            col("mad").as("mad_fp"), col("n_outliers"),
            expr("CAST(n_outliers * 1000000 div greatest(1, n) AS BIGINT)").as("outlier_ppm"))
          .orderBy("event_type")
      },
      Some(s"WITH $oMadCtes, " +
        "outl AS (SELECT h.event_type, CAST(coalesce(SUM(CASE WHEN abs(h.v - md.med) > 5 * mad.mad " +
        "THEN h.c END), 0) AS BIGINT) AS n_outliers " +
        "FROM h JOIN md USING(event_type) JOIN mad USING(event_type) GROUP BY 1) " +
        "SELECT md.event_type, md.n, md.med AS med_fp, mad.mad AS mad_fp, outl.n_outliers, " +
        "CAST(n_outliers * 1000000 // greatest(1, md.n) AS BIGINT) AS outlier_ppm " +
        "FROM md JOIN mad USING(event_type) JOIN outl USING(event_type) ORDER BY event_type")),

    // Train-batch / serve-stream anomaly gating, batch-equivalent form:
    // the SAME madThresholds frame the batch report computes becomes
    // the broadcast static side of an alert gate, and alerts roll up
    // per hour x type — the dashboard a production monitor tails. The
    // Structured Streaming twin (Streams.anomalyAlerts) applies one
    // shared gate helper to a live stream with these offline-trained
    // thresholds; parity is pinned in StreamingParitySpec, so the
    // monitor and the offline analysis cannot disagree on what an
    // anomaly is.
    Op("strm_anomaly_alerts",
      (s, d) => graft.streaming.Streams.anomalyAlerts(
        T.events(s, d).select("event_type", "ts", "value"),
        madThresholds(s, d).select("event_type", "med", "mad"))
        .withColumn("bucket", expr("CAST(bucket AS TIMESTAMP_NTZ)"))
        .orderBy("bucket", "event_type"),
      Some(s"WITH $oMadCtes " +
        "SELECT date_trunc('hour', e.ts) AS bucket, e.event_type, count(*) AS n_alerts " +
        "FROM events e JOIN md ON e.event_type = md.event_type " +
        "JOIN mad ON e.event_type = mad.event_type " +
        "WHERE abs(CAST(floor(e.value * 1000000) AS BIGINT) - md.med) > 5 * mad.mad " +
        "GROUP BY 1, 2 ORDER BY 1, 2")),

    // Trailing-window OLS trend per user: the slope of value vs event
    // index over the last 8 events, integer fixed-point throughout
    // (x = per-user row number — slope is shift-invariant, so the
    // absolute index is as good as a window-local one and keeps the
    // rolling sums plain). Output: the 20 steepest trends. One hash
    // exchange on user_id serves every window; the top-20 is
    // TakeOrdered, not a global sort.
    Op("rel_rolling_regression",
      (s, d) => {
        val wOrd = Window.partitionBy("user_id").orderBy("us", "event_id")
        val wi = wOrd.rowsBetween(-7, 0)
        eventsFp(s, d).select(col("user_id"), col("event_id"), col("us"), col("v").as("y"))
          .withColumn("x", row_number().over(wOrd).cast("bigint"))
          .select(col("user_id"), col("event_id"),
            count(lit(1)).over(wi).as("wn"),
            sum("x").over(wi).as("sx"), sum("y").over(wi).as("sy"),
            sum(expr("x * y")).over(wi).as("sxy"), sum(expr("x * x")).over(wi).as("sxx"))
          .where("wn = 8")
          .select(col("user_id"), col("event_id"),
            expr("wn * sxy - sx * sy").as("num"), expr("wn * sxx - sx * sx").as("den"))
          .select(col("user_id"), col("event_id"),
            expr("CAST(num div den AS BIGINT)").as("slope_fp"),
            expr("abs(CAST(num AS DOUBLE) / den)").as("o"))
          .orderBy(desc("o"), col("user_id"), col("event_id")).limit(20)
          .select("user_id", "event_id", "slope_fp")
      },
      Some("WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us, " +
        "CAST(floor(value * 1000000) AS BIGINT) AS y FROM events), " +
        "r AS (SELECT *, CAST(row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) " +
        "AS BIGINT) AS x FROM ev), " +
        "w AS (SELECT user_id, event_id, count(*) OVER wi AS wn, " +
        "CAST(SUM(x) OVER wi AS BIGINT) AS sx, CAST(SUM(y) OVER wi AS BIGINT) AS sy, " +
        "CAST(SUM(x * y) OVER wi AS BIGINT) AS sxy, CAST(SUM(x * x) OVER wi AS BIGINT) AS sxx " +
        "FROM r WINDOW wi AS (PARTITION BY user_id ORDER BY us, event_id " +
        "ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)), " +
        "sl AS (SELECT user_id, event_id, wn * sxy - sx * sy AS num, " +
        "wn * sxx - sx * sx AS den FROM w WHERE wn = 8) " +
        "SELECT user_id, event_id, CAST(num // den AS BIGINT) AS slope_fp FROM sl " +
        "ORDER BY abs(CAST(num AS DOUBLE) / den) DESC, user_id, event_id LIMIT 20")),

    // Approximate query processing, uniform flavor: a 1-in-16
    // content-hash sample estimates SUM(price) per return flag, with a
    // Poisson-sampling 95% CLT interval — and the same single scan
    // carries the exact answer, so the op SHIPS its own measured error
    // and a within-CI verdict (the BlinkDB-style accuracy contract,
    // self-audited). Everything is one conditional-aggregate pass; at
    // 100 TB the estimator path alone would scan only the sample
    // partition of a hash-bucketed layout, and the CI math is integer
    // in, correctly-rounded sqrt out — identical IEEE on both engines.
    // Var(est) for Poisson p: (1-p)/p^2 * sum_sq over the sample = 240x
    // at p=1/16; ci95 = 1.96 * sqrt of that.
    Op("rel_sample_estimate_agg",
      (s, d) => {
        T.t(s, d, "lineitem")
          .select(col("l_returnflag").as("g"),
            expr("CAST(floor(l_extendedprice) AS BIGINT)").as("v"),
            expr(rowHash).as("h"))
          .groupBy("g").agg(
            count(lit(1)).as("n_rows"),
            sum("v").as("exact_sum"),
            expr("count_if(h % 16 = 0)").as("n_sample"),
            expr("CAST(coalesce(SUM(CASE WHEN h % 16 = 0 THEN v END), 0) AS BIGINT)").as("sum_s"),
            expr("CAST(coalesce(SUM(CASE WHEN h % 16 = 0 THEN v * v END), 0) AS BIGINT)").as("sum_sq_s"))
          .select(col("g"), col("n_rows"), col("n_sample"), col("exact_sum"),
            expr("16 * sum_s").as("est_sum"),
            expr("CAST(abs(16 * sum_s - exact_sum) * 1000000 div greatest(1, exact_sum) AS BIGINT)").as("err_ppm"),
            expr("CAST(floor(1.96 * sqrt(CAST(240 * sum_sq_s AS DOUBLE))) AS BIGINT)").as("ci95"),
            expr("abs(16 * sum_s - exact_sum) <= CAST(floor(1.96 * sqrt(CAST(240 * sum_sq_s AS DOUBLE))) AS BIGINT)").as("within_ci"))
          .orderBy("g")
      },
      Some("WITH v AS (SELECT l_returnflag AS g, CAST(floor(l_extendedprice) AS BIGINT) AS v, " +
        s"$oRowHash AS h FROM lineitem), " +
        "a AS (SELECT g, count(*) AS n_rows, CAST(SUM(v) AS BIGINT) AS exact_sum, " +
        "CAST(count_if(h % 16 = 0) AS BIGINT) AS n_sample, " +
        "CAST(coalesce(SUM(CASE WHEN h % 16 = 0 THEN v END), 0) AS BIGINT) AS sum_s, " +
        "CAST(coalesce(SUM(CASE WHEN h % 16 = 0 THEN v * v END), 0) AS BIGINT) AS sum_sq_s " +
        "FROM v GROUP BY 1) " +
        "SELECT g, n_rows, n_sample, exact_sum, 16 * sum_s AS est_sum, " +
        "CAST(abs(16 * sum_s - exact_sum) * 1000000 // greatest(1, exact_sum) AS BIGINT) AS err_ppm, " +
        "CAST(floor(1.96 * sqrt(CAST(240 * sum_sq_s AS DOUBLE))) AS BIGINT) AS ci95, " +
        "abs(16 * sum_s - exact_sum) <= CAST(floor(1.96 * sqrt(CAST(240 * sum_sq_s AS DOUBLE))) AS BIGINT) AS within_ci " +
        "FROM a ORDER BY g")),

    // Approximate query processing, stratified flavor: a pilot pass
    // counts each ship-year stratum, an adaptive rate k/64 targets
    // ~2000 sampled rows per stratum (clamped to census for small
    // strata — at sf0.001 every stratum IS a census and the error is
    // exactly 0; at sf0.1 k=2), and the sample pass estimates the
    // stratum sum. This is the estimator uniform sampling can't give
    // you: rare strata keep full accuracy while huge ones pay ~2000
    // rows regardless of size. The pilot output is stratum-count-sized
    // (tiny — broadcast back), so the op is two scans total, the
    // second pre-filtered by the broadcast rate table.
    Op("rel_stratified_estimate",
      (s, d) => {
        val v = T.t(s, d, "lineitem")
          .select(expr("CAST(year(CAST(l_shipdate AS DATE)) AS INT)").as("g"),
            expr("CAST(floor(l_extendedprice) AS BIGINT)").as("v"),
            expr(rowHash).as("h"))
        val ex = v.groupBy("g").agg(count(lit(1)).as("n_rows"), sum("v").as("exact_sum"))
          .localCheckpoint()
        val rt = ex.select(col("g"),
          expr("CAST(least(64, greatest(1, (64 * 2000 + n_rows - 1) div n_rows)) AS BIGINT)").as("k"))
        val sm = v.join(broadcast(rt), "g").where("h % 64 < k")
          .groupBy("g").agg(count(lit(1)).as("n_sample"),
            coalesce(sum("v"), lit(0L)).as("sum_s"))
        ex.join(rt, "g").join(sm, Seq("g"), "left")
          .select(col("g"), col("n_rows"), col("k"),
            expr("CAST(coalesce(n_sample, 0) AS BIGINT)").as("n_sample"), col("exact_sum"),
            expr("CAST(coalesce(sum_s * 64 div k, 0) AS BIGINT)").as("est_sum"),
            expr("CAST(abs(coalesce(sum_s * 64 div k, 0) - exact_sum) * 1000000 " +
              "div greatest(1, exact_sum) AS BIGINT)").as("err_ppm"))
          .orderBy("g")
      },
      Some("WITH v AS (SELECT CAST(year(CAST(l_shipdate AS DATE)) AS INTEGER) AS g, " +
        "CAST(floor(l_extendedprice) AS BIGINT) AS v, " +
        s"$oRowHash AS h FROM lineitem), " +
        "ex AS (SELECT g, count(*) AS n_rows, CAST(SUM(v) AS BIGINT) AS exact_sum FROM v GROUP BY 1), " +
        "rt AS (SELECT g, CAST(least(64, greatest(1, (64 * 2000 + n_rows - 1) // n_rows)) AS BIGINT) AS k FROM ex), " +
        "sm AS (SELECT v.g, count(*) AS n_sample, CAST(coalesce(SUM(v), 0) AS BIGINT) AS sum_s " +
        "FROM v JOIN rt ON v.g = rt.g WHERE v.h % 64 < rt.k GROUP BY 1) " +
        "SELECT ex.g, n_rows, rt.k, CAST(coalesce(n_sample, 0) AS BIGINT) AS n_sample, exact_sum, " +
        "CAST(coalesce(sum_s * 64 // rt.k, 0) AS BIGINT) AS est_sum, " +
        "CAST(abs(coalesce(sum_s * 64 // rt.k, 0) - exact_sum) * 1000000 // greatest(1, exact_sum) AS BIGINT) AS err_ppm " +
        "FROM ex JOIN rt ON ex.g = rt.g LEFT JOIN sm ON ex.g = sm.g ORDER BY ex.g")),

    // Exact distinct counting via fixed-size bitmaps (the modern
    // high-cardinality trick): bitmap_bucket_number partitions the key
    // space into 4KB segments, bitmap_construct_agg ORs bits per
    // (group, bucket) with map-side partials, and the final count is a
    // sum of per-segment popcounts. The shuffle carries fixed 4KB
    // bitmaps instead of raw keys, and huge distinct sets parallelize
    // across buckets — count(DISTINCT) semantics at a fraction of the
    // state. Oracle = plain COUNT(DISTINCT): the equality IS the test.
    Op("rel_agg_bitmap_distinct",
      (s, d) => {
        T.views(s, d)
        s.sql("SELECT g, CAST(SUM(cnt) AS BIGINT) AS distinct_parts FROM (" +
          "SELECT l_returnflag AS g, bitmap_bucket_number(l_partkey) AS b, " +
          "bitmap_count(bitmap_construct_agg(bitmap_bit_position(l_partkey))) AS cnt " +
          "FROM lineitem GROUP BY 1, 2) GROUP BY g ORDER BY g")
      },
      Some("SELECT l_returnflag AS g, CAST(count(DISTINCT l_partkey) AS BIGINT) " +
        "AS distinct_parts FROM lineitem GROUP BY 1 ORDER BY 1")),

    // Ingestion-gap monitor: which hourly buckets received ZERO events
    // per type, how many, and the longest consecutive outage run — the
    // data-loss dashboard every feed needs. The heavy side is one
    // distinct (type, hour) aggregate of the corpus (well-distributed
    // key, map-side combinable); the hour x type grid it anti-joins is
    // calendar-sized (a decade is <90k hours), so the gap analysis
    // itself never touches raw events. Gap runs via the integer
    // islands trick (hour index minus rank), engine-identical.
    Op("core_ingest_gap_report",
      (s, d) => {
        val ev = T.events(s, d)
        val eh = ev.select(col("event_type"),
          expr("CAST(date_trunc('hour', ts) AS TIMESTAMP_NTZ)").as("h")).distinct()
          .localCheckpoint()
        val b = ev.agg(
          expr("CAST(date_trunc('hour', min(ts)) AS TIMESTAMP_NTZ)").as("mn"),
          expr("CAST(date_trunc('hour', max(ts)) AS TIMESTAMP_NTZ)").as("mx"))
        val hrs = b.select(explode(expr("sequence(mn, mx, INTERVAL 1 HOUR)")).as("h"))
        val types = eh.select("event_type").distinct()
        val miss = hrs.crossJoin(broadcast(types))
          .join(eh, Seq("event_type", "h"), "left_anti")
        val runs = miss
          .withColumn("grp", expr("unix_micros(CAST(h AS TIMESTAMP)) div 3600000000 - " +
            "row_number() OVER (PARTITION BY event_type ORDER BY h)"))
          .groupBy("event_type", "grp").agg(count(lit(1)).as("run"))
        val perType = miss.groupBy("event_type")
          .agg(count(lit(1)).as("n_hours_empty"), min("h").as("first_empty_hour"))
        val maxGap = runs.groupBy("event_type").agg(max("run").as("max_gap_hours"))
        val tot = hrs.agg(count(lit(1)).as("n_hours_total"))
        types.crossJoin(broadcast(tot))
          .join(perType, Seq("event_type"), "left")
          .join(maxGap, Seq("event_type"), "left")
          .select(col("event_type"), col("n_hours_total"),
            expr("CAST(coalesce(n_hours_empty, 0) AS BIGINT)").as("n_hours_empty"),
            expr("CAST(coalesce(max_gap_hours, 0) AS BIGINT)").as("max_gap_hours"),
            col("first_empty_hour"))
          .orderBy("event_type")
      },
      Some("WITH eh AS (SELECT DISTINCT event_type, date_trunc('hour', ts) AS h FROM events), " +
        "b AS (SELECT date_trunc('hour', min(ts)) AS mn, date_trunc('hour', max(ts)) AS mx FROM events), " +
        "hrs AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h FROM b), " +
        "t AS (SELECT DISTINCT event_type FROM eh), " +
        "miss AS (SELECT t.event_type, hrs.h FROM hrs, t WHERE NOT EXISTS " +
        "(SELECT 1 FROM eh WHERE eh.event_type = t.event_type AND eh.h = hrs.h)), " +
        "mi AS (SELECT event_type, h, epoch_us(h) // 3600000000 - " +
        "row_number() OVER (PARTITION BY event_type ORDER BY h) AS grp FROM miss), " +
        "runs AS (SELECT event_type, grp, count(*) AS run FROM mi GROUP BY 1, 2), " +
        "mg AS (SELECT event_type, max(run) AS max_gap_hours FROM runs GROUP BY 1), " +
        "pt AS (SELECT event_type, count(*) AS n_hours_empty, min(h) AS first_empty_hour " +
        "FROM miss GROUP BY 1), " +
        "tot AS (SELECT count(*) AS n_hours_total FROM hrs) " +
        "SELECT t.event_type, tot.n_hours_total, " +
        "CAST(coalesce(pt.n_hours_empty, 0) AS BIGINT) AS n_hours_empty, " +
        "CAST(coalesce(mg.max_gap_hours, 0) AS BIGINT) AS max_gap_hours, pt.first_empty_hour " +
        "FROM t CROSS JOIN tot LEFT JOIN pt ON t.event_type = pt.event_type " +
        "LEFT JOIN mg ON t.event_type = mg.event_type ORDER BY t.event_type")),

    // Data-governance masking: PII columns leave the trust boundary as
    // deterministic md5 tokens (equality- and join-preserving — the
    // masked key still groups/joins identically, pinned in spec) and
    // quasi-identifiers are generalized (balances to 100-unit buckets)
    // — the share-with-analysts projection. Everything is a codegen'd
    // per-row projection: no shuffle, no state, scales linearly.
    Op("core_column_mask",
      (s, d) => T.t(s, d, "customer")
        .select(col("c_custkey"),
          expr("concat('cust_', substring(md5(c_name), 1, 12))").as("masked_name"),
          expr("CAST(floor(c_acctbal / 100) * 100 AS DOUBLE)").as("acct_bucket"),
          col("c_mktsegment"), col("c_nationkey"))
        .orderBy("c_custkey"),
      Some("SELECT c_custkey, concat('cust_', substr(md5(c_name), 1, 12)) AS masked_name, " +
        "CAST(floor(c_acctbal / 100) * 100 AS DOUBLE) AS acct_bucket, " +
        "c_mktsegment, c_nationkey FROM customer ORDER BY c_custkey")),

    // A/B experiment readout: users md5-hash into control/treatment
    // (derandomized — assignment survives restarts and engines agree),
    // and a Welch t-statistic per event type over PER-USER totals: the
    // unit of randomization is the user, so events aggregate to one
    // observation per (event_type, user) first — treating clustered
    // per-user events as independent samples would understate the
    // variance and inflate t. Two shuffles (user rollup, then type
    // rollup), both map-side-combining. Sums of squares accumulate in
    // DECIMAL(38,0) — mergeable, overflow-proof past 1e19 fixed-point
    // units per user — and convert to DOUBLE only inside the final
    // one-row-per-type t formula, where both engines evaluate the
    // identical IEEE tree.
    Op("rel_ab_welch_ttest",
      (s, d) => {
        eventsFp(s, d)
          .withColumn("arm", expr(
            "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 2"))
          .groupBy("event_type", "user_id", "arm")
          .agg(expr("CAST(SUM(v div 1000) AS BIGINT)").as("uv")) // 1e-3 fixed point
          .groupBy("event_type").agg(
            expr("count_if(arm = 0)").as("n0"),
            expr("count_if(arm = 1)").as("n1"),
            expr("CAST(coalesce(SUM(CASE WHEN arm = 0 THEN uv END), 0) AS BIGINT)").as("s0"),
            expr("CAST(coalesce(SUM(CASE WHEN arm = 1 THEN uv END), 0) AS BIGINT)").as("s1"),
            expr("CAST(coalesce(SUM(CASE WHEN arm = 0 THEN CAST(uv AS DECIMAL(19,0)) * CAST(uv AS DECIMAL(19,0)) END), 0) AS DECIMAL(38,0))").as("q0"),
            expr("CAST(coalesce(SUM(CASE WHEN arm = 1 THEN CAST(uv AS DECIMAL(19,0)) * CAST(uv AS DECIMAL(19,0)) END), 0) AS DECIMAL(38,0))").as("q1"))
          .where("n0 > 1 AND n1 > 1")
          .withColumn("var0", expr(
            "(CAST(q0 AS DOUBLE) - CAST(s0 AS DOUBLE) * s0 / n0) / (n0 - 1)"))
          .withColumn("var1", expr(
            "(CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1) / (n1 - 1)"))
          .withColumn("se2", expr("var0 / n0 + var1 / n1"))
          .select(col("event_type"), col("n0"), col("n1"),
            expr("CAST(floor(CAST(s0 AS DOUBLE) / n0 * 1000) AS BIGINT)").as("mean0_fp"),
            expr("CAST(floor(CAST(s1 AS DOUBLE) / n1 * 1000) AS BIGINT)").as("mean1_fp"),
            expr("CASE WHEN se2 > 0 THEN CAST(floor(" +
              "(CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0) / sqrt(se2) * 1000000) " +
              "AS BIGINT) ELSE 0 END").as("t_fp"))
          .orderBy("event_type")
      },
      Some("WITH v AS (SELECT event_type, user_id, " +
        "CAST(floor(value * 1000000) AS BIGINT) // 1000 AS v3, " +
        "CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2 AS arm " +
        "FROM events), " +
        "pu AS (SELECT event_type, user_id, arm, CAST(SUM(v3) AS BIGINT) AS uv " +
        "FROM v GROUP BY 1, 2, 3), " +
        "a AS (SELECT event_type, " +
        "CAST(count_if(arm = 0) AS BIGINT) AS n0, CAST(count_if(arm = 1) AS BIGINT) AS n1, " +
        "CAST(coalesce(SUM(CASE WHEN arm = 0 THEN uv END), 0) AS BIGINT) AS s0, " +
        "CAST(coalesce(SUM(CASE WHEN arm = 1 THEN uv END), 0) AS BIGINT) AS s1, " +
        "CAST(coalesce(SUM(CASE WHEN arm = 0 THEN CAST(uv AS DECIMAL(19,0)) * CAST(uv AS DECIMAL(19,0)) END), 0) AS DECIMAL(38,0)) AS q0, " +
        "CAST(coalesce(SUM(CASE WHEN arm = 1 THEN CAST(uv AS DECIMAL(19,0)) * CAST(uv AS DECIMAL(19,0)) END), 0) AS DECIMAL(38,0)) AS q1 " +
        "FROM pu GROUP BY 1), " +
        "b AS (SELECT *, " +
        "(CAST(q0 AS DOUBLE) - CAST(s0 AS DOUBLE) * s0 / n0) / (n0 - 1) AS var0, " +
        "(CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1) / (n1 - 1) AS var1 " +
        "FROM a WHERE n0 > 1 AND n1 > 1), " +
        "c AS (SELECT *, var0 / n0 + var1 / n1 AS se2 FROM b) " +
        "SELECT event_type, n0, n1, " +
        "CAST(floor(CAST(s0 AS DOUBLE) / n0 * 1000) AS BIGINT) AS mean0_fp, " +
        "CAST(floor(CAST(s1 AS DOUBLE) / n1 * 1000) AS BIGINT) AS mean1_fp, " +
        "CASE WHEN se2 > 0 THEN CAST(floor(" +
        "(CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0) / sqrt(se2) * 1000000) " +
        "AS BIGINT) ELSE 0 END AS t_fp " +
        "FROM c ORDER BY event_type")),

    // CUPED variance reduction (the modern experimentation-platform
    // companion to the t-test): each user's pre-period sum is the
    // control covariate for their post-period sum; theta = cov/var on
    // the pooled users, and BOTH the adjusted effect and the adjusted
    // variance are derived ALGEBRAICALLY from per-arm integer /
    // DECIMAL(38) sums — var(y-θx) = var(y) - 2θcov + θ²var(x) — so no
    // second pass ever touches per-user doubles and partition order
    // cannot perturb the result. Two shuffles total: the per-user
    // aggregate and a 2-row arm rollup.
    Op("rel_ab_cuped",
      (s, d) => {
        val ev = eventsFp(s, d).select(col("user_id"), col("us"),
          expr("v div 1000").as("v3"))
        val b = ev.agg(expr("min(us) + (max(us) - min(us)) div 2").as("mid"))
        val pu = ev.crossJoin(broadcast(b)).groupBy("user_id").agg(
          expr("CAST(coalesce(SUM(CASE WHEN us < mid THEN v3 END), 0) AS BIGINT)").as("x"),
          expr("CAST(coalesce(SUM(CASE WHEN us >= mid THEN v3 END), 0) AS BIGINT)").as("y"))
          .withColumn("arm", expr(
            "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 2"))
        pu.agg(
          expr("count_if(arm = 0)").as("n0"), expr("count_if(arm = 1)").as("n1"),
          expr("CAST(coalesce(SUM(CASE WHEN arm = 0 THEN x END), 0) AS BIGINT)").as("sx0"),
          expr("CAST(coalesce(SUM(CASE WHEN arm = 1 THEN x END), 0) AS BIGINT)").as("sx1"),
          expr("CAST(coalesce(SUM(CASE WHEN arm = 0 THEN y END), 0) AS BIGINT)").as("sy0"),
          expr("CAST(coalesce(SUM(CASE WHEN arm = 1 THEN y END), 0) AS BIGINT)").as("sy1"),
          expr("CAST(coalesce(SUM(CAST(x AS DECIMAL(38,0)) * y), 0) AS DECIMAL(38,0))").as("sxy"),
          expr("CAST(coalesce(SUM(CAST(x AS DECIMAL(38,0)) * x), 0) AS DECIMAL(38,0))").as("sxx"),
          expr("CAST(coalesce(SUM(CAST(y AS DECIMAL(38,0)) * y), 0) AS DECIMAL(38,0))").as("syy"))
          .where("n0 > 1 AND n1 > 1")
          .withColumn("n", expr("n0 + n1"))
          .withColumn("sx", expr("CAST(sx0 + sx1 AS BIGINT)"))
          .withColumn("sy", expr("CAST(sy0 + sy1 AS BIGINT)"))
          .withColumn("covxy", expr("CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n"))
          .withColumn("varx", expr("CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n"))
          .withColumn("vary", expr("CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n"))
          .withColumn("theta", expr("CASE WHEN varx > 0 THEN covxy / varx ELSE 0 END"))
          .select(col("n0"), col("n1"),
            expr("CAST(floor(theta * 1000000) AS BIGINT)").as("theta_fp"),
            expr("CAST(floor((CAST(sy1 AS DOUBLE) / n1 - CAST(sy0 AS DOUBLE) / n0) * 1000) AS BIGINT)").as("diff_raw_fp"),
            expr("CAST(floor((CAST(sy1 AS DOUBLE) / n1 - CAST(sy0 AS DOUBLE) / n0 " +
              "- theta * (CAST(sx1 AS DOUBLE) / n1 - CAST(sx0 AS DOUBLE) / n0)) * 1000) AS BIGINT)").as("diff_adj_fp"),
            expr("CASE WHEN vary > 0 THEN CAST(floor((1.0 - (vary - 2 * theta * covxy " +
              "+ theta * theta * varx) / vary) * 1000000) AS BIGINT) ELSE 0 END").as("var_reduction_ppm"))
      },
      Some("WITH ev AS (SELECT user_id, epoch_us(ts) AS us, " +
        "CAST(floor(value * 1000000) AS BIGINT) // 1000 AS v3 FROM events), " +
        "b AS (SELECT min(us) + (max(us) - min(us)) // 2 AS mid FROM ev), " +
        "pu AS (SELECT user_id, " +
        "CAST(coalesce(SUM(CASE WHEN us < b.mid THEN v3 END), 0) AS BIGINT) AS x, " +
        "CAST(coalesce(SUM(CASE WHEN us >= b.mid THEN v3 END), 0) AS BIGINT) AS y " +
        "FROM ev, b GROUP BY user_id), " +
        "pa AS (SELECT x, y, CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2 AS arm FROM pu), " +
        "ag AS (SELECT CAST(count_if(arm = 0) AS BIGINT) AS n0, CAST(count_if(arm = 1) AS BIGINT) AS n1, " +
        "CAST(coalesce(SUM(CASE WHEN arm = 0 THEN x END), 0) AS BIGINT) AS sx0, " +
        "CAST(coalesce(SUM(CASE WHEN arm = 1 THEN x END), 0) AS BIGINT) AS sx1, " +
        "CAST(coalesce(SUM(CASE WHEN arm = 0 THEN y END), 0) AS BIGINT) AS sy0, " +
        "CAST(coalesce(SUM(CASE WHEN arm = 1 THEN y END), 0) AS BIGINT) AS sy1, " +
        "CAST(coalesce(SUM(CAST(x AS DECIMAL(38,0)) * y), 0) AS DECIMAL(38,0)) AS sxy, " +
        "CAST(coalesce(SUM(CAST(x AS DECIMAL(38,0)) * x), 0) AS DECIMAL(38,0)) AS sxx, " +
        "CAST(coalesce(SUM(CAST(y AS DECIMAL(38,0)) * y), 0) AS DECIMAL(38,0)) AS syy FROM pa), " +
        "st AS (SELECT *, n0 + n1 AS n, CAST(sx0 + sx1 AS BIGINT) AS sx, " +
        "CAST(sy0 + sy1 AS BIGINT) AS sy FROM ag WHERE n0 > 1 AND n1 > 1), " +
        "th AS (SELECT *, CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n AS covxy, " +
        "CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n AS varx, " +
        "CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n AS vary FROM st), " +
        "fin AS (SELECT *, CASE WHEN varx > 0 THEN covxy / varx ELSE 0 END AS theta FROM th) " +
        "SELECT n0, n1, CAST(floor(theta * 1000000) AS BIGINT) AS theta_fp, " +
        "CAST(floor((CAST(sy1 AS DOUBLE) / n1 - CAST(sy0 AS DOUBLE) / n0) * 1000) AS BIGINT) AS diff_raw_fp, " +
        "CAST(floor((CAST(sy1 AS DOUBLE) / n1 - CAST(sy0 AS DOUBLE) / n0 " +
        "- theta * (CAST(sx1 AS DOUBLE) / n1 - CAST(sx0 AS DOUBLE) / n0)) * 1000) AS BIGINT) AS diff_adj_fp, " +
        "CASE WHEN vary > 0 THEN CAST(floor((1.0 - (vary - 2 * theta * covxy " +
        "+ theta * theta * varx) / vary) * 1000000) AS BIGINT) ELSE 0 END AS var_reduction_ppm " +
        "FROM fin")),

    // Seasonal-naive forecast backtest: hourly event counts, a
    // hour-of-week mean forecast trained on weeks 0-2, tested on week
    // 3, scored as MASE against the one-week-lag naive baseline — the
    // standard "is this forecast better than doing nothing" metric.
    // Counting happens on the corpus ONCE (keyed (type, hour-index),
    // missing hours restored as zero by a calendar-sized grid join);
    // every train/test/score step after that touches only the 672-row
    // per-type grid. All integer fixed-point, engine-identical.
    Op("rel_forecast_snaive_mase",
      (s, d) => {
        val ev = eventsFp(s, d).select("event_type", "us")
        val b = ev.agg(min("us").as("anchor"))
        val cnt = ev.crossJoin(broadcast(b))
          .withColumn("hidx", expr("(us - anchor) div 3600000000"))
          .where("hidx < 672")
          .groupBy("event_type", "hidx").agg(count(lit(1)).as("y"))
          .localCheckpoint()
        val grid = cnt.select("event_type").distinct()
          .crossJoin(s.range(672).select(col("id").as("hidx")))
        val g2 = grid.join(cnt, Seq("event_type", "hidx"), "left")
          .select(col("event_type"), col("hidx"),
            expr("hidx div 168").as("wk"), expr("hidx % 168").as("how"),
            expr("CAST(coalesce(y, 0) AS BIGINT)").as("y"))
          .localCheckpoint()
        val f = g2.where("wk < 3").groupBy("event_type", "how")
          .agg(expr("CAST(SUM(y) * 1000 div 3 AS BIGINT)").as("f_fp"))
        val nv = g2.where("wk IN (1, 2)").as("a")
          .join(g2.as("p"), expr("a.event_type = p.event_type AND p.hidx = a.hidx - 168"))
          .groupBy(col("a.event_type").as("event_type"))
          .agg(expr("CAST(SUM(abs(a.y - p.y)) * 1000 div 336 AS BIGINT)").as("denom_fp"))
        val tm = g2.where("wk = 3")
          .join(f, Seq("event_type", "how"))
          .groupBy("event_type")
          .agg(expr("CAST(SUM(abs(y * 1000 - f_fp)) div 168 AS BIGINT)").as("test_mae_fp"))
        nv.join(tm, "event_type")
          .select(col("event_type"), col("denom_fp"), col("test_mae_fp"),
            expr("CASE WHEN denom_fp > 0 THEN CAST(test_mae_fp * 1000000 div denom_fp " +
              "AS BIGINT) ELSE 0 END").as("mase_ppm"))
          .orderBy("event_type")
      },
      Some("WITH ev AS (SELECT event_type, epoch_us(ts) AS us FROM events), " +
        "b AS (SELECT min(us) AS anchor FROM ev), " +
        "c AS (SELECT event_type, (us - b.anchor) // 3600000000 AS hidx FROM ev, b " +
        "WHERE (us - b.anchor) // 3600000000 < 672), " +
        "cnt AS (SELECT event_type, hidx, count(*) AS y FROM c GROUP BY 1, 2), " +
        "t AS (SELECT DISTINCT event_type FROM cnt), " +
        "grid AS (SELECT t.event_type, g.range AS hidx FROM t, range(0, 672) g), " +
        "g2 AS (SELECT grid.event_type, grid.hidx, grid.hidx // 168 AS wk, grid.hidx % 168 AS how, " +
        "CAST(coalesce(cnt.y, 0) AS BIGINT) AS y FROM grid LEFT JOIN cnt " +
        "ON grid.event_type = cnt.event_type AND grid.hidx = cnt.hidx), " +
        "f AS (SELECT event_type, how, CAST(SUM(y) * 1000 // 3 AS BIGINT) AS f_fp " +
        "FROM g2 WHERE wk < 3 GROUP BY 1, 2), " +
        "nv AS (SELECT a.event_type, CAST(SUM(abs(a.y - p.y)) * 1000 // 336 AS BIGINT) AS denom_fp " +
        "FROM g2 a JOIN g2 p ON a.event_type = p.event_type AND p.hidx = a.hidx - 168 " +
        "WHERE a.wk IN (1, 2) GROUP BY 1), " +
        "tm AS (SELECT g2.event_type, CAST(SUM(abs(g2.y * 1000 - f.f_fp)) // 168 AS BIGINT) AS test_mae_fp " +
        "FROM g2 JOIN f ON g2.event_type = f.event_type AND g2.how = f.how " +
        "WHERE g2.wk = 3 GROUP BY 1) " +
        "SELECT nv.event_type, nv.denom_fp, tm.test_mae_fp, " +
        "CASE WHEN nv.denom_fp > 0 THEN CAST(tm.test_mae_fp * 1000000 // nv.denom_fp AS BIGINT) " +
        "ELSE 0 END AS mase_ppm " +
        "FROM nv JOIN tm ON nv.event_type = tm.event_type ORDER BY nv.event_type")),

    // Kolmogorov-Smirnov two-sample drift test: is this half-period's
    // value distribution the same as the last one's, per event type?
    // D = max |ECDF_a - ECDF_b| computed entirely in integers over the
    // compressed histogram (|cumA*nB - cumB*nA| avoids every division
    // until the final ppm), with the value attaining the supremum
    // reported alongside — the drift monitor that needs no binning
    // choices at all.
    Op("rel_ks_drift_test",
      (s, d) => {
        val h = driftHistogram(s, d)
        val wCum = Window.partitionBy("event_type").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wTot = Window.partitionBy("event_type")
        val wMax = Window.partitionBy("event_type")
          .orderBy(expr(
            "abs(CAST(cuma AS DECIMAL(38,0)) * nb - CAST(cumb AS DECIMAL(38,0)) * na)").desc,
            col("v"))
        h.withColumn("cuma", sum("ca").over(wCum))
          .withColumn("cumb", sum("cb").over(wCum))
          .withColumn("na", sum("ca").over(wTot))
          .withColumn("nb", sum("cb").over(wTot))
          .where("na > 0 AND nb > 0")
          .withColumn("rn", row_number().over(wMax))
          .where("rn = 1")
          .select(col("event_type"), col("na").as("n_a"), col("nb").as("n_b"),
            col("v").as("ks_at_fp"),
            expr("CAST(abs(CAST(cuma AS DECIMAL(38,0)) * nb - CAST(cumb AS DECIMAL(38,0)) * na) " +
              "* 1000000 div (CAST(na AS DECIMAL(38,0)) * nb) AS BIGINT)").as("ks_ppm"))
          .orderBy("event_type")
      },
      Some(s"WITH $oDriftHist, " +
        "c AS (SELECT *, CAST(SUM(ca) OVER w AS BIGINT) AS cuma, " +
        "CAST(SUM(cb) OVER w AS BIGINT) AS cumb, " +
        "CAST(SUM(ca) OVER (PARTITION BY event_type) AS BIGINT) AS na, " +
        "CAST(SUM(cb) OVER (PARTITION BY event_type) AS BIGINT) AS nb FROM h " +
        "WINDOW w AS (PARTITION BY event_type ORDER BY v ROWS UNBOUNDED PRECEDING)), " +
        "d AS (SELECT event_type, v, na, nb, " +
        "abs(CAST(cuma AS HUGEINT) * nb - CAST(cumb AS HUGEINT) * na) AS dd, " +
        "row_number() OVER (PARTITION BY event_type ORDER BY " +
        "abs(CAST(cuma AS HUGEINT) * nb - CAST(cumb AS HUGEINT) * na) DESC, v) AS rn " +
        "FROM c WHERE na > 0 AND nb > 0) " +
        "SELECT event_type, na AS n_a, nb AS n_b, v AS ks_at_fp, " +
        "CAST(dd * 1000000 // (CAST(na AS HUGEINT) * nb) AS BIGINT) AS ks_ppm " +
        "FROM d WHERE rn = 1 ORDER BY event_type")),

    // Population Stability Index on reference-decile buckets: edges are
    // side A's exact deciles (order statistics off the cumulated
    // histogram), bucket membership is a broadcast <=9-edge join, and
    // the PSI terms are Laplace-smoothed ((c+1)/(n+10): no empty-bucket
    // infinities, fully deterministic) then QUANTIZED to 1e-9 BEFORE
    // the per-type sum — ten doubles summed in engine-defined order
    // would be the one nondeterminism this file bans.
    Op("rel_psi_drift",
      (s, d) => {
        val h = driftHistogram(s, d)
        val wCum = Window.partitionBy("event_type").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val nn = h.groupBy("event_type").agg(
          expr("CAST(SUM(ca) AS BIGINT)").as("na"), expr("CAST(SUM(cb) AS BIGINT)").as("nb"))
        val c = h.withColumn("cuma", sum("ca").over(wCum))
        val e = c.join(broadcast(nn), "event_type").where("na > 0")
          .crossJoin(s.range(1, 10).select(col("id").as("i")))
          .where("cuma * 10 >= i * na")
          .groupBy("event_type", "i").agg(min("v").as("edge"))
        val bk = h.as("h").join(broadcast(e).as("e"),
            expr("h.event_type = e.event_type AND e.edge <= h.v"), "left")
          .groupBy(col("h.event_type").as("event_type"), col("h.v"),
            col("h.ca"), col("h.cb"))
          .agg(count(col("e.edge")).as("bucket"))
        val g = bk.groupBy("event_type", "bucket")
          .agg(expr("CAST(SUM(ca) AS BIGINT)").as("ba"), expr("CAST(SUM(cb) AS BIGINT)").as("bb"))
        g.join(broadcast(nn), "event_type").where("na > 0 AND nb > 0")
          .withColumn("term_fp", expr(
            "CAST(floor((CAST(bb + 1 AS DOUBLE) / (nb + 10) - CAST(ba + 1 AS DOUBLE) / (na + 10)) " +
              "* ln((CAST(bb + 1 AS DOUBLE) / (nb + 10)) / (CAST(ba + 1 AS DOUBLE) / (na + 10))) " +
              "* 1000000000) AS BIGINT)"))
          .groupBy("event_type")
          .agg(expr("CAST(SUM(term_fp) div 1000 AS BIGINT)").as("psi_fp"),
            count(lit(1)).as("n_buckets"))
          .orderBy("event_type")
      },
      Some(s"WITH $oDriftHist, " +
        "nn AS (SELECT event_type, CAST(SUM(ca) AS BIGINT) AS na, " +
        "CAST(SUM(cb) AS BIGINT) AS nb FROM h GROUP BY 1), " +
        "c AS (SELECT *, CAST(SUM(ca) OVER (PARTITION BY event_type ORDER BY v " +
        "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cuma FROM h), " +
        "e AS (SELECT c.event_type, i.range AS i, min(v) AS edge " +
        "FROM c JOIN nn USING(event_type), range(1, 10) i " +
        "WHERE nn.na > 0 AND c.cuma * 10 >= i.range * nn.na GROUP BY 1, 2), " +
        "bk AS (SELECT h.event_type, h.v, h.ca, h.cb, count(e.edge) AS bucket " +
        "FROM h LEFT JOIN e ON h.event_type = e.event_type AND e.edge <= h.v " +
        "GROUP BY 1, 2, 3, 4), " +
        "g AS (SELECT event_type, bucket, CAST(SUM(ca) AS BIGINT) AS ba, " +
        "CAST(SUM(cb) AS BIGINT) AS bb FROM bk GROUP BY 1, 2), " +
        "terms AS (SELECT g.event_type, CAST(floor(" +
        "(CAST(bb + 1 AS DOUBLE) / (nb + 10) - CAST(ba + 1 AS DOUBLE) / (na + 10)) " +
        "* ln((CAST(bb + 1 AS DOUBLE) / (nb + 10)) / (CAST(ba + 1 AS DOUBLE) / (na + 10))) " +
        "* 1000000000) AS BIGINT) AS term_fp " +
        "FROM g JOIN nn ON g.event_type = nn.event_type WHERE nn.na > 0 AND nn.nb > 0) " +
        "SELECT event_type, CAST(SUM(term_fp) // 1000 AS BIGINT) AS psi_fp, " +
        "count(*) AS n_buckets FROM terms GROUP BY 1 ORDER BY 1")),

    // Linear multi-touch attribution: every touch in a purchase's
    // 7-day lookback shares the credit equally, in integer ppm with
    // the division remainder assigned to the earliest touches — so
    // credit is conserved EXACTLY (sum over channels == purchases x
    // 1e6, spec-pinned as an invariant). The touch join is keyed
    // user_id with a bounded per-user quadratic (the funnel-family
    // discipline: a user's own history, never a global pair space);
    // untouched purchases roll up under 'none'.
    Op("rel_attribution_linear",
      (s, d) => {
        val ev = eventsFp(s, d)
        // alias both self-join sides: p/t descend from one frame, and an
        // unaliased p("user_id") === t("user_id") resolves to the same
        // attribute (Spark's trivially-true-predicate warning)
        val p = ev.where("event_type = 'purchase'")
          .select(col("user_id"), col("event_id").as("pid"), col("us").as("pus"))
          .alias("p")
        val t = ev.where("event_type <> 'purchase'")
          .select(col("user_id"), col("event_id").as("tid"),
            col("event_type").as("channel"), col("us").as("tus"))
          .alias("t")
        val j = p.join(t, expr("p.user_id = t.user_id") &&
            col("tus") < col("pus") && col("pus") - col("tus") <= 604800000000L)
          .select("pid", "channel", "tus", "tid")
          .localCheckpoint()
        val wK = Window.partitionBy("pid")
        val wR = Window.partitionBy("pid").orderBy("tus", "tid")
        val ch = j.withColumn("k", count(lit(1)).over(wK))
          .withColumn("rnk", row_number().over(wR))
          .withColumn("credit", expr(
            "CAST(1000000 div k + CASE WHEN rnk <= 1000000 % k THEN 1 ELSE 0 END AS BIGINT)"))
          .groupBy("channel").agg(
            expr("CAST(SUM(credit) AS BIGINT)").as("credit_total"),
            count(lit(1)).as("n_touches"))
        val none = p.join(j.select("pid"), Seq("pid"), "left_anti")
          .agg(expr("CAST(count(*) * 1000000 AS BIGINT)").as("credit_total"),
            count(lit(1)).as("n_touches"))
          .where("n_touches > 0")
          .select(lit("none").as("channel"), col("credit_total"), col("n_touches"))
        ch.unionByName(none).orderBy("channel")
      },
      Some("WITH ev AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events), " +
        "p AS (SELECT user_id, event_id AS pid, us AS pus FROM ev WHERE event_type = 'purchase'), " +
        "t AS (SELECT user_id, event_id AS tid, event_type AS channel, us AS tus FROM ev " +
        "WHERE event_type <> 'purchase'), " +
        "j AS (SELECT p.pid, t.channel, t.tus, t.tid FROM p JOIN t ON p.user_id = t.user_id " +
        "AND t.tus < p.pus AND p.pus - t.tus <= 604800000000), " +
        "r AS (SELECT pid, channel, count(*) OVER (PARTITION BY pid) AS k, " +
        "row_number() OVER (PARTITION BY pid ORDER BY tus, tid) AS rnk FROM j), " +
        "c AS (SELECT pid, channel, CAST(1000000 // k + CASE WHEN rnk <= 1000000 % k " +
        "THEN 1 ELSE 0 END AS BIGINT) AS credit FROM r), " +
        "nt AS (SELECT 'none' AS channel, CAST(count(*) * 1000000 AS BIGINT) AS credit_total, " +
        "CAST(count(*) AS BIGINT) AS n_touches FROM p " +
        "WHERE NOT EXISTS (SELECT 1 FROM j WHERE j.pid = p.pid)), " +
        "ch AS (SELECT channel, CAST(SUM(credit) AS BIGINT) AS credit_total, " +
        "count(*) AS n_touches FROM c GROUP BY 1) " +
        "SELECT * FROM (SELECT * FROM ch UNION ALL SELECT * FROM nt WHERE n_touches > 0) " +
        "ORDER BY channel")),

    // Kaplan-Meier survival: time from a user's first event to their
    // first 'error', right-censored at last activity for users who
    // never error — the reliability curve (works unchanged for churn
    // once the corpus has any). The heavy work is ONE per-user
    // aggregate; the lifetable is day-grid-sized, and the product
    // estimator is an ln-cumsum with each term QUANTIZED to 1e-12
    // fixed point before the ordered window sum — a raw running double
    // sum drifted by 1 ulp between engines and flipped a floor at
    // sf0.01 (measured, not hypothetical). d_t >= n_t (everyone at
    // risk dies) pins survival to an exact 0 via a flag, not a -inf.
    Op("rel_survival_km",
      (s, d) => {
        val u = eventsFp(s, d).groupBy("user_id").agg(
          min("us").as("first_us"), max("us").as("last_us"),
          min(when(col("event_type") === "error", col("us"))).as("err_us"))
          .select(expr("CASE WHEN err_us IS NOT NULL THEN (err_us - first_us) div 86400000000 " +
            "ELSE (last_us - first_us) div 86400000000 END").as("dur"),
            expr("CASE WHEN err_us IS NOT NULL THEN 0 ELSE 1 END").as("cens"))
          .localCheckpoint()
        val tot = u.agg(count(lit(1)).as("n_users"), max("dur").as("maxd"))
        val days = tot.select(explode(expr("sequence(0, maxd)")).as("t"), col("n_users"))
        val dd = u.groupBy(col("dur").as("t")).agg(
          expr("CAST(count_if(cens = 0) AS BIGINT)").as("dth"),
          count(lit(1)).as("lv"))
        // global windows — but over the lifetable (<= max-duration-in-days
        // + 1 rows, calendar-bounded), never over corpus-sized data
        val wCum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, Window.currentRow)
        days.join(dd, Seq("t"), "left")
          .select(col("t"), col("n_users"),
            expr("CAST(coalesce(dth, 0) AS BIGINT)").as("dth"),
            expr("CAST(coalesce(lv, 0) AS BIGINT)").as("lv"))
          .withColumn("n_risk", expr("n_users - CAST(coalesce(" +
            "SUM(lv) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)"))
          .withColumn("lnsum_fp", sum(expr(
            "CASE WHEN n_risk > 0 AND dth < n_risk THEN " +
              "CAST(floor(ln(CAST(n_risk - dth AS DOUBLE) / n_risk) * 1000000000000) AS BIGINT) " +
              "ELSE CAST(0 AS BIGINT) END"))
            .over(wCum))
          .withColumn("dead", max(expr(
            "CASE WHEN dth >= n_risk AND n_risk > 0 THEN 1 ELSE 0 END")).over(wCum))
          .select(col("t"), col("n_risk"), col("dth").as("n_events"),
            expr("CASE WHEN dead = 1 THEN 0 " +
              "ELSE CAST(floor(exp(CAST(lnsum_fp AS DOUBLE) / 1000000000000) * 1000000) AS BIGINT) END")
              .as("survival_ppm"))
          .orderBy("t")
      },
      Some("WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events), " +
        "u AS (SELECT user_id, min(us) AS first_us, max(us) AS last_us, " +
        "min(CASE WHEN event_type = 'error' THEN us END) AS err_us FROM ev GROUP BY 1), " +
        "du AS (SELECT CASE WHEN err_us IS NOT NULL THEN (err_us - first_us) // 86400000000 " +
        "ELSE (last_us - first_us) // 86400000000 END AS dur, " +
        "CASE WHEN err_us IS NOT NULL THEN 0 ELSE 1 END AS cens FROM u), " +
        "tot AS (SELECT count(*) AS n_users, max(dur) AS maxd FROM du), " +
        "days AS (SELECT unnest(generate_series(0, maxd)) AS t, n_users FROM tot), " +
        "dd AS (SELECT dur AS t, CAST(count_if(cens = 0) AS BIGINT) AS dth, " +
        "count(*) AS lv FROM du GROUP BY 1), " +
        "g AS (SELECT days.t, days.n_users, CAST(coalesce(dd.dth, 0) AS BIGINT) AS dth, " +
        "CAST(coalesce(dd.lv, 0) AS BIGINT) AS lv FROM days LEFT JOIN dd ON days.t = dd.t), " +
        "r AS (SELECT t, dth, CAST(n_users - coalesce(SUM(lv) OVER " +
        "(ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_risk FROM g), " +
        "sv AS (SELECT t, dth, n_risk, " +
        "SUM(CASE WHEN n_risk > 0 AND dth < n_risk THEN " +
        "CAST(floor(ln(CAST(n_risk - dth AS DOUBLE) / n_risk) * 1000000000000) AS BIGINT) " +
        "ELSE CAST(0 AS BIGINT) END) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS lnsum_fp, " +
        "max(CASE WHEN dth >= n_risk AND n_risk > 0 THEN 1 ELSE 0 END) OVER " +
        "(ORDER BY t ROWS UNBOUNDED PRECEDING) AS dead FROM r) " +
        "SELECT t, n_risk, dth AS n_events, " +
        "CASE WHEN dead = 1 THEN 0 ELSE CAST(floor(exp(CAST(lnsum_fp AS DOUBLE) / 1000000000000) " +
        "* 1000000) AS BIGINT) END AS survival_ppm " +
        "FROM sv ORDER BY t")),

    // Value-concentration diagnostics: the Gini coefficient of per-user
    // value per event type (how whale-dominated is each stream). The
    // rank weighting 2*sum(i*s) needs a per-type sort of USER SUMS (one
    // row per user — never raw events); ties in s share consecutive
    // ranks, which the identity is invariant to.
    Op("rel_value_gini",
      (s, d) => {
        val pu = eventsFp(s, d)
          .groupBy("event_type", "user_id")
          .agg(expr("CAST(SUM(v div 1000) AS BIGINT)").as("s"))
        val wRank = Window.partitionBy("event_type").orderBy("s", "user_id")
        pu.withColumn("i", row_number().over(wRank).cast("bigint"))
          .groupBy("event_type").agg(
            count(lit(1)).as("n"), expr("CAST(SUM(s) AS BIGINT)").as("total_fp"),
            expr("CAST(SUM(CAST(i AS DECIMAL(38,0)) * s) AS DECIMAL(38,0))").as("ws"))
          .select(col("event_type"), col("n"), col("total_fp"),
            expr("CASE WHEN n > 0 AND total_fp > 0 THEN CAST(floor(" +
              "(2.0 * ws - (n + 1.0) * total_fp) / (CAST(n AS DOUBLE) * total_fp) * 1000000) " +
              "AS BIGINT) ELSE 0 END").as("gini_ppm"))
          .orderBy("event_type")
      },
      Some("WITH ev AS (SELECT event_type, user_id, " +
        "CAST(floor(value * 1000000) AS BIGINT) // 1000 AS v3 FROM events), " +
        "pu AS (SELECT event_type, user_id, CAST(SUM(v3) AS BIGINT) AS s FROM ev GROUP BY 1, 2), " +
        "rk AS (SELECT event_type, s, CAST(row_number() OVER " +
        "(PARTITION BY event_type ORDER BY s, user_id) AS BIGINT) AS i FROM pu), " +
        "ag AS (SELECT event_type, count(*) AS n, CAST(SUM(s) AS BIGINT) AS total_fp, " +
        "CAST(SUM(CAST(i AS HUGEINT) * s) AS HUGEINT) AS ws FROM rk GROUP BY 1) " +
        "SELECT event_type, n, total_fp, " +
        "CASE WHEN n > 0 AND total_fp > 0 THEN CAST(floor(" +
        "(2.0 * ws - (n + 1.0) * total_fp) / (CAST(n AS DOUBLE) * total_fp) * 1000000) " +
        "AS BIGINT) ELSE 0 END AS gini_ppm FROM ag ORDER BY event_type")),

    // Last-touch attribution: each purchase credits the user's most
    // recent non-purchase event within a 7-day lookback (else 'none').
    // One IGNORE NULLS window pass on the user_id exchange — the same
    // single-shuffle discipline as the rest of the event family; the
    // channel rollup is a tiny final aggregate.
    Op("rel_attribution_last_touch",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("us", "event_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        val attributed = eventsFp(s, d)
          .withColumn("src_type",
            last(when(col("event_type") =!= "purchase", col("event_type")), ignoreNulls = true).over(w))
          .withColumn("src_us",
            last(when(col("event_type") =!= "purchase", col("us")), ignoreNulls = true).over(w))
          .where("event_type = 'purchase'")
          .withColumn("channel", expr(
            "CASE WHEN src_us IS NOT NULL AND us - src_us <= 604800000000 " +
              "THEN src_type ELSE 'none' END"))
        val total = attributed.agg(count(lit(1)).as("total"))
        attributed.groupBy("channel").agg(count(lit(1)).as("n_purchases"))
          .crossJoin(broadcast(total))
          .select(col("channel"), col("n_purchases"),
            expr("CAST(n_purchases * 1000000 div greatest(1, total) AS BIGINT)").as("share_ppm"))
          .orderBy("channel")
      },
      Some("WITH ev AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events), " +
        "lt AS (SELECT *, " +
        "last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS) " +
        "OVER w AS src_type, " +
        "last_value(CASE WHEN event_type <> 'purchase' THEN us END IGNORE NULLS) " +
        "OVER w AS src_us FROM ev " +
        "WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)), " +
        "at AS (SELECT CASE WHEN src_us IS NOT NULL AND us - src_us <= 604800000000 " +
        "THEN src_type ELSE 'none' END AS channel FROM lt WHERE event_type = 'purchase'), " +
        "tot AS (SELECT count(*) AS total FROM at) " +
        "SELECT channel, count(*) AS n_purchases, " +
        "CAST(count(*) * 1000000 // greatest(1, tot.total) AS BIGINT) AS share_ppm " +
        "FROM at, tot GROUP BY channel, tot.total ORDER BY channel")),
  )
}
