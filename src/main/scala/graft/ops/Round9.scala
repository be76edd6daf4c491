package graft.ops

import graft.{Op, Tables => T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9 operators: DQ trend analytics and productionization
  * companions to the persistent-store surface.
  *
  * Determinism discipline (same as the round-8 files): integer ppm /
  * fixed-point arithmetic end-to-end, DECIMAL(38) where products of
  * BIGINTs could overflow, total ORDER BY over a unique key, and both
  * engines evaluating the identical expression tree wherever a DOUBLE
  * is unavoidable.
  */
object Round9 {

  import org.apache.spark.sql.{DataFrame, SparkSession}

  /** events with 1e-6 fixed-point value and epoch-microsecond ts (the
    * Round8b event-family projection).
    */
  private def eventsFp(s: SparkSession, d: String): DataFrame =
    T.events(s, d).select(col("event_type"), col("user_id"), col("event_id"),
      expr("unix_micros(CAST(ts AS TIMESTAMP))").as("us"),
      expr("CAST(floor(value * 1000000) AS BIGINT)").as("v"))

  /** The 6-expectation DQ panel as stack() args, shared by the two
    * runs of core_dq_trend (ppm against a declared threshold;
    * discount_le_5pct keeps its deliberately-failing 99% bar).
    */
  private val panelStack =
    "stack(6, " +
      "'completeness_quantity', CAST(qty_nn * 1000000 div greatest(1, n) AS BIGINT), CAST(1000000 AS BIGINT), " +
      "'range_discount', CAST(disc_rng * 1000000 div greatest(1, n) AS BIGINT), CAST(1000000 AS BIGINT), " +
      "'set_returnflag', CAST(rf_set * 1000000 div greatest(1, n) AS BIGINT), CAST(1000000 AS BIGINT), " +
      "'positive_price', CAST(price_pos * 1000000 div greatest(1, n) AS BIGINT), CAST(1000000 AS BIGINT), " +
      "'discount_le_5pct', CAST(disc_low * 1000000 div greatest(1, n) AS BIGINT), CAST(990000 AS BIGINT), " +
      "'unique_orderline', CAST(ol_keys * 1000000 div greatest(1, n) AS BIGINT), CAST(1000000 AS BIGINT)" +
      ") AS (expectation, metric_ppm, threshold_ppm)"

  private val oPanelRows = Seq(
    ("completeness_quantity", "qty_nn", 1000000),
    ("range_discount", "disc_rng", 1000000),
    ("set_returnflag", "rf_set", 1000000),
    ("positive_price", "price_pos", 1000000),
    ("discount_le_5pct", "disc_low", 990000),
    ("unique_orderline", "ol_keys", 1000000))

  val ops: Seq[Op] = Seq(

    // DQ metrics TREND — the Deequ-metrics-repository shape as a
    // query: the same expectation panel core_dq_expectations computes,
    // evaluated over two consecutive "runs" (the shipdate-midpoint
    // halves of lineitem — a deterministic stand-in for run N-1 vs
    // run N), then the per-expectation delta with a regression alert
    // (ok flipped to failing, or metric dropped > 1000 ppm). ONE scan
    // computes both runs' panels as conditional aggregates on a 2-row
    // groupBy; everything after the agg touches 12 rows. The
    // persistent companion (graft.api.DqHistory: append each real
    // run's panel under a StoreIO generation + replay ledger, trend
    // the two most recent) runs this exact delta math over stored
    // history — spec-pinned to agree.
    Op("core_dq_trend",
      (s, d) => {
        val b = T.t(s, d, "lineitem").agg(expr(
          "date_add(CAST(min(l_shipdate) AS DATE), " +
            "CAST(datediff(CAST(max(l_shipdate) AS DATE), CAST(min(l_shipdate) AS DATE)) div 2 AS INT))")
          .as("mid"))
        val p = T.t(s, d, "lineitem").crossJoin(broadcast(b))
          .withColumn("h", expr("CASE WHEN CAST(l_shipdate AS DATE) < mid THEN 1 ELSE 2 END"))
          .groupBy("h").agg(
            count(lit(1)).as("n"),
            count(col("l_quantity")).as("qty_nn"),
            expr("count_if(l_discount >= 0 AND l_discount <= 0.1)").as("disc_rng"),
            expr("count_if(l_returnflag IN ('A','N','R'))").as("rf_set"),
            expr("count_if(l_extendedprice > 0)").as("price_pos"),
            expr("count_if(l_discount <= 0.05)").as("disc_low"),
            // injective integer pair key (TPC-H pins l_linenumber in 1..7):
            // no per-row string concat/alloc on the 100-TB scan
            countDistinct(expr("l_orderkey * 10 + l_linenumber")).as("ol_keys"))
          .select(col("h"), expr(panelStack))
          .localCheckpoint() // 12 rows; feeds both sides of the run join
        val r1 = p.where("h = 1")
          .select(col("expectation"), col("threshold_ppm"), col("metric_ppm").as("prev_ppm"))
        val r2 = p.where("h = 2").select(col("expectation"), col("metric_ppm"))
        r1.join(r2, "expectation")
          .withColumn("delta_ppm", expr("metric_ppm - prev_ppm"))
          .withColumn("regressed", expr(
            "(prev_ppm >= threshold_ppm AND metric_ppm < threshold_ppm) OR delta_ppm < -1000"))
          .select("expectation", "threshold_ppm", "prev_ppm", "metric_ppm",
            "delta_ppm", "regressed")
          .orderBy("expectation")
      },
      Some("WITH bb AS (SELECT CAST(min(l_shipdate) AS DATE) + " +
        "CAST((CAST(max(l_shipdate) AS DATE) - CAST(min(l_shipdate) AS DATE)) // 2 AS INTEGER) AS mid " +
        "FROM lineitem), " +
        "m AS (SELECT CASE WHEN CAST(l_shipdate AS DATE) < bb.mid THEN 1 ELSE 2 END AS h, " +
        "count(*) AS n, count(l_quantity) AS qty_nn, " +
        "count_if(l_discount >= 0 AND l_discount <= 0.1) AS disc_rng, " +
        "count_if(l_returnflag IN ('A','N','R')) AS rf_set, " +
        "count_if(l_extendedprice > 0) AS price_pos, " +
        "count_if(l_discount <= 0.05) AS disc_low, " +
        "count(DISTINCT l_orderkey * 10 + l_linenumber) AS ol_keys " +
        "FROM lineitem, bb GROUP BY 1), " +
        "p AS (" + oPanelRows.map { case (nm, c, thr) =>
          s"SELECT h, '$nm' AS expectation, " +
            s"CAST($c * 1000000 // greatest(1, n) AS BIGINT) AS metric_ppm, " +
            s"CAST($thr AS BIGINT) AS threshold_ppm FROM m"
        }.mkString(" UNION ALL ") + ") " +
        "SELECT p1.expectation, p1.threshold_ppm, p1.metric_ppm AS prev_ppm, " +
        "p2.metric_ppm AS metric_ppm, p2.metric_ppm - p1.metric_ppm AS delta_ppm, " +
        "((p1.metric_ppm >= p1.threshold_ppm AND p2.metric_ppm < p1.threshold_ppm) " +
        "OR p2.metric_ppm - p1.metric_ppm < -1000) AS regressed " +
        "FROM p p1 JOIN p p2 ON p1.expectation = p2.expectation AND p1.h = 1 AND p2.h = 2 " +
        "ORDER BY p1.expectation")),

    // Per-user EWMA smoothed value state — the "current smoothed
    // metric per entity" a monitoring/personalization pipeline keeps.
    // Dyadic alpha = 1/2 truncated at 8 lags makes the smoother EXACT
    // integer arithmetic: weights 2^(7-j) summed then ONE div 255
    // (= the 1/(1 - 2^-8)-normalized truncated EWMA) — no float
    // recursion, so engines and partitionings agree bit-for-bit. Both
    // windows (lag chain, per-user count) sit on ONE user_id exchange;
    // output is one row per qualifying user, never per event.
    Op("rel_window_ewma",
      (s, d) => {
        val wAsc = Window.partitionBy("user_id").orderBy("us", "event_id")
        val wAll = Window.partitionBy("user_id")
        eventsFp(s, d)
          .withColumn("rn", row_number().over(wAsc))
          .withColumn("wsum", (0 to 7)
            .map(j => coalesce(lag(col("v"), j).over(wAsc), lit(0L)) * lit(1L << (7 - j)))
            .reduce(_ + _))
          .withColumn("n_events", count(lit(1)).over(wAll))
          .where("rn = n_events AND n_events >= 8")
          .select(col("user_id"), col("n_events"),
            expr("wsum div 255").as("ewma_fp"))
          .orderBy("user_id")
      },
      Some("WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS us, " +
        "CAST(floor(value * 1000000) AS BIGINT) AS v FROM events), " +
        "l AS (SELECT user_id, row_number() OVER w AS rn, " +
        "count(*) OVER (PARTITION BY user_id) AS n_events, " +
        (0 to 7).map(j =>
          s"coalesce(lag(v, $j) OVER w, 0) * ${1L << (7 - j)}").mkString(" + ") +
        " AS wsum FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)) " +
        "SELECT user_id, n_events, CAST(wsum // 255 AS BIGINT) AS ewma_fp FROM l " +
        "WHERE rn = n_events AND n_events >= 8 ORDER BY user_id")),

    // First-order Markov transition matrix of the event stream: per
    // (from_type, to_type), the count of consecutive-pair transitions
    // within a user's timeline and the row-normalized probability in
    // ppm — the base table for Markov attribution / next-event
    // prediction. One lead() on the user_id exchange, a tiny
    // type-pair aggregate, and a broadcast row-total join; nothing
    // after the window touches more than |types|^2 rows.
    Op("rel_markov_transitions",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("us", "event_id")
        val tr = eventsFp(s, d)
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .where("next_type IS NOT NULL")
          .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
          .agg(count(lit(1)).as("n"))
          // |types|^2 rows; pinned so the row-total rollup reuses them
          // instead of re-scanning and re-shuffling the event stream
          .localCheckpoint()
        val tot = tr.groupBy("from_type").agg(sum("n").as("n_from"))
        tr.join(broadcast(tot), "from_type")
          .select(col("from_type"), col("to_type"), col("n"),
            expr("CAST(n * 1000000 div n_from AS BIGINT)").as("p_ppm"))
          .orderBy("from_type", "to_type")
      },
      Some("WITH ev AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events), " +
        "tr AS (SELECT event_type AS from_type, " +
        "lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY us, event_id) AS to_type " +
        "FROM ev), " +
        "cnt AS (SELECT from_type, to_type, count(*) AS n FROM tr " +
        "WHERE to_type IS NOT NULL GROUP BY 1, 2), " +
        "tot AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_from FROM cnt GROUP BY 1) " +
        "SELECT cnt.from_type, cnt.to_type, cnt.n, " +
        "CAST(cnt.n * 1000000 // tot.n_from AS BIGINT) AS p_ppm " +
        "FROM cnt JOIN tot USING (from_type) ORDER BY from_type, to_type")),

    // CUSUM changepoint detection on the hourly event-rate series per
    // type: deviations from the per-type mean accumulate as
    // y*H - total (PRE-SCALED by the hour count, so the running sum is
    // exact integer — no mean division ever happens), and the hour
    // attaining max |CUSUM| is the level-shift point; the peak is
    // normalized to ppm of total*H through DECIMAL(38)/HUGEINT (the
    // only product that can exceed int64). Complements KS/PSI: those
    // ask IF the distribution moved, CUSUM asks WHEN the rate moved.
    // The hour grid (zero-count hours included — a silent outage IS a
    // level shift) is calendar-sized, never event-sized.
    Op("rel_changepoint_cusum",
      (s, d) => {
        val ev = eventsFp(s, d)
        val b = ev.agg(min("us").as("anchor"))
        val cnt = ev.crossJoin(broadcast(b))
          .select(col("event_type"), expr("(us - anchor) div 3600000000").as("hidx"))
          .groupBy("event_type", "hidx").agg(count(lit(1)).as("y"))
        val grid = cnt.groupBy("event_type").agg(max("hidx").as("maxh"))
          .select(col("event_type"), explode(expr("sequence(0, maxh)")).as("hidx"))
        val g = grid.join(cnt, Seq("event_type", "hidx"), "left")
          .select(col("event_type"), col("hidx"),
            coalesce(col("y"), lit(0L)).as("y"))
        val tot = g.groupBy("event_type").agg(
          count(lit(1)).as("nh"), expr("CAST(SUM(y) AS BIGINT)").as("total"))
        val wCum = Window.partitionBy("event_type").orderBy("hidx")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wMax = Window.partitionBy("event_type")
          .orderBy(abs(col("cusum")).desc, col("hidx"))
        g.join(broadcast(tot), "event_type")
          .withColumn("cusum", sum(expr("y * nh - total")).over(wCum))
          .withColumn("rn", row_number().over(wMax))
          .where("rn = 1")
          .select(col("event_type"), col("nh").as("n_hours"), col("total"),
            col("hidx").as("cp_hidx"),
            expr("CAST(abs(CAST(cusum AS DECIMAL(38,0))) * 1000000 " +
              "div (CAST(total AS DECIMAL(38,0)) * nh) AS BIGINT)").as("cusum_peak_ppm"))
          .orderBy("event_type")
      },
      Some("WITH ev AS (SELECT event_type, epoch_us(ts) AS us FROM events), " +
        "b AS (SELECT min(us) AS anchor FROM ev), " +
        "cnt AS (SELECT event_type, (us - b.anchor) // 3600000000 AS hidx, count(*) AS y " +
        "FROM ev, b GROUP BY 1, 2), " +
        "hm AS (SELECT event_type, max(hidx) AS maxh FROM cnt GROUP BY 1), " +
        "grid AS (SELECT event_type, unnest(generate_series(0, maxh)) AS hidx FROM hm), " +
        "g AS (SELECT grid.event_type, grid.hidx, CAST(coalesce(cnt.y, 0) AS BIGINT) AS y " +
        "FROM grid LEFT JOIN cnt ON grid.event_type = cnt.event_type AND grid.hidx = cnt.hidx), " +
        "tot AS (SELECT event_type, CAST(count(*) AS BIGINT) AS nh, " +
        "CAST(SUM(y) AS BIGINT) AS total FROM g GROUP BY 1), " +
        "c AS (SELECT g.event_type, g.hidx, tot.nh, tot.total, " +
        "SUM(g.y * tot.nh - tot.total) OVER (PARTITION BY g.event_type ORDER BY g.hidx " +
        "ROWS UNBOUNDED PRECEDING) AS cusum FROM g JOIN tot USING (event_type)), " +
        "dd AS (SELECT *, row_number() OVER (PARTITION BY event_type " +
        "ORDER BY abs(cusum) DESC, hidx) AS rn FROM c) " +
        "SELECT event_type, nh AS n_hours, total, hidx AS cp_hidx, " +
        "CAST(abs(CAST(cusum AS HUGEINT)) * 1000000 // (CAST(total AS HUGEINT) * nh) AS BIGINT) " +
        "AS cusum_peak_ppm FROM dd WHERE rn = 1 ORDER BY event_type")),

    // The persistent UpsertStore driven END-TO-END under the oracle:
    // orders split into three CDC batches (o_orderkey % 3, applied in
    // order) merge into a fresh bucketed store keyed o_custkey with
    // o_orderkey as the version; the final table must equal the
    // declarative MERGE semantics — per key, the greatest version
    // within the LAST batch that carried the key (batch rows override
    // stored rows; within a batch the greatest version wins). This
    // puts the store's bucket routing, staged swaps and ledger on the
    // same correctness gate as every relational operator, not just
    // under unit specs.
    Op("core_upsert_store",
      (s, d) => {
        val dir = s"target/tmp/upsert_op_${java.util.UUID.randomUUID().toString.take(8)}"
        val t = T.t(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
          .withColumn("b", pmod(col("o_orderkey"), lit(3)))
        (0 to 2).foreach { b =>
          graft.api.UpsertStore.update(
            t.where(col("b") === b).drop("b"), dir, "o_custkey", "o_orderkey",
            nBuckets = 8, batchId = Some(s"b$b")): Unit
        }
        val got = graft.api.UpsertStore.read(s, dir).localCheckpoint()
        graft.api.StoreIO.delete(s, dir)
        got.orderBy("o_custkey")
      },
      Some("WITH t AS (SELECT o_custkey, o_orderkey, o_totalprice, o_orderkey % 3 AS b FROM orders), " +
        "m AS (SELECT o_custkey, max(b) AS mb FROM t GROUP BY 1), " +
        "f AS (SELECT t.o_custkey, t.o_orderkey, t.o_totalprice, " +
        "row_number() OVER (PARTITION BY t.o_custkey ORDER BY t.o_orderkey DESC) AS rn " +
        "FROM t JOIN m ON t.o_custkey = m.o_custkey AND t.b = m.mb) " +
        "SELECT o_custkey, o_orderkey, o_totalprice FROM f WHERE rn = 1 ORDER BY o_custkey")),

    // Partition-layout advisor (the clustering-advisor niche every
    // warehouse ships): score each candidate partition column of
    // orders on (a) SKEW — max partition share vs the uniform share,
    // in ppm (1e6 = perfectly uniform; a hot key inflates it) and
    // (b) PARTITION-COUNT FITNESS — |log2(ndv) - log2(1024)| distance
    // from a ~1k-partition sweet spot, in 1e-3 bits (too few
    // partitions starve parallelism, too many drown the metastore in
    // small files). score = skew_ppm + 100 * band_dist_fp, ranked
    // ascending — a deterministic integer formula both engines replay.
    // One groupBy per candidate, each map-side combining; nothing
    // data-sized leaves the aggregates.
    Op("core_layout_advisor",
      (s, d) => {
        val candidates = Seq("o_orderdate", "o_custkey", "o_orderpriority", "o_orderstatus")
        val scored = candidates.map { c =>
          T.t(s, d, "orders")
            .groupBy(col(c).cast("string").as("k")).agg(count(lit(1)).as("cnt"))
            .agg(count(lit(1)).as("ndv"),
              expr("CAST(SUM(cnt) AS BIGINT)").as("n"),
              max("cnt").as("max_cnt"))
            .select(lit(c).as("candidate"), col("ndv"), col("max_cnt"),
              expr("CAST(CAST(max_cnt AS DECIMAL(38,0)) * ndv * 1000000 div n AS BIGINT)")
                .as("skew_ppm"),
              expr("CAST(floor(abs(log2(CAST(ndv AS DOUBLE)) - 10.0) * 1000) AS BIGINT)")
                .as("band_dist_fp"))
        }.reduce(_ unionByName _)
        scored
          .withColumn("score_fp", expr("skew_ppm + 100 * band_dist_fp"))
          .orderBy("score_fp", "candidate")
      },
      Some("WITH " + Seq("o_orderdate", "o_custkey", "o_orderpriority", "o_orderstatus")
        .zipWithIndex.map { case (c, i) =>
          s"g$i AS (SELECT CAST($c AS VARCHAR) AS k, count(*) AS cnt FROM orders GROUP BY 1), " +
            s"a$i AS (SELECT '$c' AS candidate, CAST(count(*) AS BIGINT) AS ndv, " +
            s"CAST(max(cnt) AS BIGINT) AS max_cnt, " +
            s"CAST(CAST(max(cnt) AS HUGEINT) * count(*) * 1000000 // SUM(cnt) AS BIGINT) AS skew_ppm, " +
            s"CAST(floor(abs(log2(CAST(count(*) AS DOUBLE)) - 10.0) * 1000) AS BIGINT) AS band_dist_fp " +
            s"FROM g$i)"
        }.mkString(", ") + " " +
        "SELECT candidate, ndv, max_cnt, skew_ppm, band_dist_fp, " +
        "skew_ppm + 100 * band_dist_fp AS score_fp FROM (" +
        (0 until 4).map(i => s"SELECT * FROM a$i").mkString(" UNION ALL ") +
        ") ORDER BY score_fp, candidate")),

    // Golden-record consolidation (the MDM survivorship pattern):
    // duplicate records per entity merge COLUMN-WISE under per-column
    // rules rather than row-wise latest-wins (core_dedupe_keep_latest
    // is the row form) — latest-wins for the categorical state,
    // greatest for the numeric, earliest for lineage, counts for
    // confidence. The latest-state window and the aggregate sit on the
    // same user_id exchange; output is one golden row per entity.
    Op("core_golden_record",
      (s, d) => {
        val ev = eventsFp(s, d)
        val w = Window.partitionBy("user_id").orderBy(desc("us"), desc("event_id"))
        val last = ev.withColumn("rn", row_number().over(w)).where("rn = 1")
          .select(col("user_id"), col("event_type").as("last_type"))
        val agg = ev.groupBy("user_id").agg(
          min("us").as("first_seen_us"),
          max("us").as("last_seen_us"),
          max("v").as("best_value_fp"),
          countDistinct("event_type").as("n_distinct_types"),
          count(lit(1)).as("n_records"))
        agg.join(last, "user_id")
          .select("user_id", "last_type", "first_seen_us", "last_seen_us",
            "best_value_fp", "n_distinct_types", "n_records")
          .orderBy("user_id")
      },
      Some("WITH ev AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us, " +
        "CAST(floor(value * 1000000) AS BIGINT) AS v FROM events), " +
        "lt AS (SELECT user_id, event_type AS last_type FROM (" +
        "SELECT user_id, event_type, row_number() OVER (PARTITION BY user_id " +
        "ORDER BY us DESC, event_id DESC) AS rn FROM ev) WHERE rn = 1), " +
        "ag AS (SELECT user_id, min(us) AS first_seen_us, max(us) AS last_seen_us, " +
        "max(v) AS best_value_fp, " +
        "CAST(count(DISTINCT event_type) AS BIGINT) AS n_distinct_types, " +
        "count(*) AS n_records FROM ev GROUP BY 1) " +
        "SELECT ag.user_id, lt.last_type, ag.first_seen_us, ag.last_seen_us, " +
        "ag.best_value_fp, ag.n_distinct_types, ag.n_records " +
        "FROM ag JOIN lt USING (user_id) ORDER BY ag.user_id")),

    // Character-entropy gibberish gate (the CCNet/RefinedWeb-style
    // doc-level filter): per document, Shannon entropy of the
    // character distribution via H = log2(n) - (1/n) * sum k_i*log2(k_i),
    // each k*log2(k) term QUANTIZED to 1e-9 before the per-doc sum
    // (the file's one-double-tree discipline), then a per-language
    // rollup with a low-entropy flag (H < 2 bits — repeated-character
    // spam, binary junk). The char explode is linear and map-side
    // aggregable (groupBy (doc, char) combines before the shuffle);
    // nothing downstream of the per-doc row is data-sized.
    Op("llm_char_entropy_filter",
      (s, d) => {
        val chars = T.spread(T.t(s, d, "documents"))
          .select(col("doc_id"), col("lang"),
            explode(expr(
              "transform(sequence(1, char_length(text)), i -> substring(text, i, 1))"))
              .as("ch"))
          .groupBy("doc_id", "lang", "ch").agg(count(lit(1)).as("k"))
        val doc = chars.groupBy("doc_id", "lang").agg(
          expr("CAST(SUM(k) AS BIGINT)").as("n"),
          expr("CAST(SUM(CAST(floor(k * log2(k) * 1000000000) AS BIGINT)) AS BIGINT)").as("slog"))
          .where("n > 0")
          .select(col("doc_id"), col("lang"),
            expr("CAST(floor((log2(CAST(n AS DOUBLE)) - " +
              "CAST(slog AS DOUBLE) / 1000000000 / n) * 1000) AS BIGINT)").as("h_fp"))
        doc.groupBy("lang").agg(
            count(lit(1)).as("n_docs"),
            expr("count_if(h_fp < 2000)").as("n_low_entropy"),
            expr("CAST(SUM(h_fp) div count(1) AS BIGINT)").as("mean_h_fp"))
          .orderBy("lang")
      },
      Some("WITH ch AS (SELECT doc_id, lang, unnest(list_transform(" +
        "range(1, length(text) + 1), i -> text[i])) AS ch FROM documents), " +
        "k AS (SELECT doc_id, lang, ch, count(*) AS k FROM ch GROUP BY 1, 2, 3), " +
        "doc AS (SELECT doc_id, lang, CAST(SUM(k) AS BIGINT) AS n, " +
        "CAST(SUM(CAST(floor(k * log2(k) * 1000000000) AS BIGINT)) AS BIGINT) AS slog " +
        "FROM k GROUP BY 1, 2), " +
        "h AS (SELECT doc_id, lang, CAST(floor((log2(CAST(n AS DOUBLE)) - " +
        "CAST(slog AS DOUBLE) / 1000000000 / n) * 1000) AS BIGINT) AS h_fp " +
        "FROM doc WHERE n > 0) " +
        "SELECT lang, count(*) AS n_docs, " +
        "CAST(count_if(h_fp < 2000) AS BIGINT) AS n_low_entropy, " +
        "CAST(CAST(SUM(h_fp) AS BIGINT) // count(*) AS BIGINT) AS mean_h_fp " +
        "FROM h GROUP BY lang ORDER BY lang")),

    // Parquet column BLOOM FILTERS on the sink: the point-lookup
    // story for a 100-TB key-addressed table — a reader probing
    // o_orderkey skips every row group whose bloom filter rejects the
    // key, without any sort/cluster requirement (complementing
    // snk_sorted_write's min/max pruning, which needs clustering, and
    // core_zorder_cluster's multi-column layout). The op writes with
    // filters enabled + sized (expected NDV), reads three
    // deterministic point keys back, and the oracle checks the rows;
    // Round9Spec checks the footer actually CARRIES the bloom filter
    // (an ignored write option would silently degrade to full scans).
    Op("snk_parquet_bloom",
      (s, d) => {
        val dir = s"target/tmp/bloom_${java.util.UUID.randomUUID().toString.take(8)}"
        val orders = T.t(s, d, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice")
        orders.write
          .option("parquet.bloom.filter.enabled#o_orderkey", "true")
          .option("parquet.bloom.filter.expected.ndv#o_orderkey", "200000")
          .mode("overwrite").parquet(dir)
        val keys = orders.where("o_orderkey % 7 = 0")
          .orderBy("o_orderkey").limit(3)
          .collect().map(_.getLong(0))
        val got = s.read.parquet(dir)
          .where(col("o_orderkey").isin(keys.toIndexedSeq: _*))
          .localCheckpoint()
        graft.api.StoreIO.delete(s, dir)
        got.orderBy("o_orderkey")
      },
      Some("SELECT o_orderkey, o_custkey, o_totalprice FROM orders " +
        "WHERE o_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderkey % 7 = 0 " +
        "ORDER BY o_orderkey LIMIT 3) ORDER BY o_orderkey")),

    // GDPR/right-to-be-forgotten erasure as a TARGETED-PARTITION
    // rewrite: events land user-bucketed (pmod(user_id, 16) — the
    // layout a deletion-heavy store chooses so an erasure request maps
    // to partitions, not a table scan), the erasure set (user_id % 50
    // = 0) resolves to its touched buckets, and ONLY those partitions
    // are rewritten via dynamic partition overwrite. The report reads
    // rows_after back from the store itself — the audit trail proves
    // the rewrite, not the plan. At 100 TB this is the difference
    // between rewriting ~3 partitions and rewriting the corpus.
    Op("core_erasure_partition_rewrite",
      (s, d) => {
        val dir = s"target/tmp/erase_${java.util.UUID.randomUUID().toString.take(8)}"
        val ev = T.events(s, d).select(col("user_id"), col("event_id"), col("value"))
          .withColumn("bucket", pmod(col("user_id"), lit(16)).cast("int"))
        ev.write.partitionBy("bucket").mode("overwrite").parquet(dir)
        val touched = ev.where("user_id % 50 = 0")
          .select("bucket").distinct().collect().map(_.getInt(0)).sorted
        ev.where(col("bucket").isin(touched.toIndexedSeq: _*))
          .where("NOT (user_id % 50 = 0)")
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("bucket").parquet(dir)
        // dynamic overwrite CANNOT erase a partition it writes no rows
        // for (no key, no overwrite) — a bucket whose every row was
        // erased would silently survive; those must be deleted
        // explicitly. The real-table analogue of Delta's deletion
        // vectors / REPLACE WHERE.
        val survivors = ev.where(col("bucket").isin(touched.toIndexedSeq: _*))
          .where("NOT (user_id % 50 = 0)")
          .select("bucket").distinct().collect().map(_.getInt(0)).toSet
        touched.filterNot(survivors).foreach(b =>
          graft.api.StoreIO.delete(s, s"$dir/bucket=$b"))
        val before = ev.where(col("bucket").isin(touched.toIndexedSeq: _*))
          .groupBy("bucket").agg(
            count(lit(1)).as("rows_before"),
            expr("count_if(user_id % 50 = 0)").as("rows_erased"))
        val after =
          if (touched.isEmpty) // empty corpus: nothing written, nothing to read back
            before.select(col("bucket")).withColumn("rows_after", lit(0L))
          else s.read.parquet(dir)
            .where(col("bucket").isin(touched.toIndexedSeq: _*))
            .groupBy(col("bucket").cast("int").as("bucket"))
            .agg(count(lit(1)).as("rows_after"))
        val got = before.join(after, Seq("bucket"), "left")
          .select(col("bucket"), col("rows_before"), col("rows_erased"),
            coalesce(col("rows_after"), lit(0L)).as("rows_after"))
          .localCheckpoint()
        graft.api.StoreIO.delete(s, dir)
        got.orderBy("bucket")
      },
      Some("WITH ev AS (SELECT user_id, CAST(user_id % 16 AS INTEGER) AS bucket FROM events), " +
        "t AS (SELECT DISTINCT bucket FROM ev WHERE user_id % 50 = 0) " +
        "SELECT ev.bucket, count(*) AS rows_before, " +
        "CAST(count_if(ev.user_id % 50 = 0) AS BIGINT) AS rows_erased, " +
        "CAST(count(*) - count_if(ev.user_id % 50 = 0) AS BIGINT) AS rows_after " +
        "FROM ev JOIN t USING (bucket) GROUP BY ev.bucket ORDER BY ev.bucket")),

    // Click-to-purchase conversion-lag distribution: per user, the
    // first click and the first purchase at-or-after it; lag buckets
    // to whole hours with user counts and a cumulative ppm curve (the
    // "X% convert within N hours" readout). One user_id aggregate
    // produces one row per converting user; the histogram and its
    // cumulative window touch only lag-bucket rows.
    Op("rel_conversion_lag",
      (s, d) => {
        val ev = eventsFp(s, d)
        val u = ev.groupBy("user_id").agg(
          min(when(col("event_type") === "click", col("us"))).as("c_us"))
        val conv = ev.where("event_type = 'purchase'")
          .join(u, "user_id")
          .where("c_us IS NOT NULL AND us >= c_us")
          .groupBy("user_id").agg(min("us").as("p_us"), min("c_us").as("c0"))
          .select(expr("(p_us - c0) div 3600000000").as("lag_hours"))
        val h = conv.groupBy("lag_hours").agg(count(lit(1)).as("n_users"))
          // lag-bucket rows; pinned so the total and the cumulative
          // window don't each re-aggregate the event stream
          .localCheckpoint()
        val tot = h.agg(expr("CAST(SUM(n_users) AS BIGINT)").as("t"))
        val wCum = Window.orderBy("lag_hours")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        h.crossJoin(broadcast(tot))
          .withColumn("cum", sum("n_users").over(wCum))
          .select(col("lag_hours"), col("n_users"),
            expr("CAST(cum * 1000000 div t AS BIGINT)").as("cum_ppm"))
          .orderBy("lag_hours")
      },
      Some("WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events), " +
        "u AS (SELECT user_id, min(CASE WHEN event_type = 'click' THEN us END) AS c_us " +
        "FROM ev GROUP BY 1), " +
        "conv AS (SELECT (min(ev.us) - min(u.c_us)) // 3600000000 AS lag_hours " +
        "FROM ev JOIN u USING (user_id) " +
        "WHERE ev.event_type = 'purchase' AND u.c_us IS NOT NULL AND ev.us >= u.c_us " +
        "GROUP BY ev.user_id), " +
        "h AS (SELECT lag_hours, CAST(count(*) AS BIGINT) AS n_users FROM conv GROUP BY 1), " +
        "tot AS (SELECT CAST(SUM(n_users) AS BIGINT) AS t FROM h) " +
        "SELECT h.lag_hours, h.n_users, " +
        "CAST(SUM(h.n_users) OVER (ORDER BY h.lag_hours ROWS UNBOUNDED PRECEDING) " +
        "* 1000000 // tot.t AS BIGINT) AS cum_ppm FROM h, tot ORDER BY h.lag_hours")),
  )
}
