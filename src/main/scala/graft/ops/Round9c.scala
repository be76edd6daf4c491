package graft.ops

import graft.{Op, Tables => T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9c operators: double-exponential-smoothing forecast backtest
  * and sentence-level duplication profiling.
  *
  * Same determinism discipline as the sibling files: exact integer /
  * fixed-point arithmetic (the DES smoother uses the dyadic
  * alpha = 1/2, 8-lag truncated EWMA of rel_window_ewma — weights sum
  * to 255, one `div 255` at the end), DECIMAL(38)/HUGEINT for
  * overflow-prone products, total ORDER BY.
  */
object Round9c {

  val ops: Seq[Op] = Seq(

    // Double-exponential-smoothing (Holt) forecast BACKTEST on the
    // daily order-count series: level and trend are both 8-lag dyadic
    // EWMAs (level over y, trend over the first difference), frozen at
    // an anchor 7 observations before the series end; the op reports
    // forecast vs actual for the 7 held-out steps with MASE against
    // the training mean absolute difference. Everything after the
    // daily aggregate runs on the |days|-sized series (~thousands of
    // rows at ANY corpus scale — a global window over a daily series
    // is not a scale risk; the fact-table scan is the only big job).
    Op("rel_forecast_des",
      (s, d) => {
        val w = Window.orderBy("day")
        val daily = T.t(s, d, "orders")
          .groupBy(expr("CAST(o_orderdate AS DATE)").as("day"))
          .agg(count(lit(1)).as("y"))
        val base = daily
          .withColumn("rn", row_number().over(w))
          .withColumn("n_days", count(lit(1)).over(
            Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
          .withColumn("dy", col("y") - lag("y", 1).over(w))
          .withColumn("lnum", (0 to 7)
            .map(j => coalesce(lag(col("y"), j).over(w), lit(0L)) * lit(1L << (7 - j)))
            .reduce(_ + _))
          .withColumn("tnum", (0 to 7)
            .map(j => coalesce(lag(col("dy"), j).over(w), lit(0L)) * lit(1L << (7 - j)))
            .reduce(_ + _))
        val anchor = base.where("rn = n_days - 7 AND rn >= 9")
          .select(col("rn").as("arn"), col("lnum"), col("tnum"))
        val tr = base.crossJoin(broadcast(anchor.select("arn")))
          .where("rn >= 2 AND rn <= arn")
          .agg(sum(abs(col("dy"))).as("scale_sum"), count(lit(1)).as("n_tr"))
        base.select("rn", "y").crossJoin(broadcast(anchor))
          .withColumn("h", expr("CAST(rn - arn AS BIGINT)"))
          .where("h >= 1 AND h <= 7")
          .withColumn("forecast", expr("(lnum + h * tnum) div 255"))
          .withColumn("abs_err", expr("abs(forecast - y)"))
          .crossJoin(broadcast(tr))
          .withColumn("mase_ppm", expr(
            "CAST(CAST(abs_err AS DECIMAL(38,0)) * n_tr * 1000000 " +
              "div greatest(1, scale_sum) AS BIGINT)"))
          .select(col("h"), col("forecast"), col("y").as("actual"),
            col("abs_err"), col("mase_ppm"))
          .orderBy("h")
      },
      Some("WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS y " +
        "FROM orders GROUP BY 1), " +
        "base AS (SELECT row_number() OVER w AS rn, count(*) OVER () AS n_days, y, " +
        "y - lag(y, 1) OVER w AS dy, " +
        (0 to 7).map(j => s"coalesce(lag(y, $j) OVER w, 0) * ${1L << (7 - j)}")
          .mkString(" + ") + " AS lnum, " +
        (0 to 7).map(j => s"coalesce(lag(y - lag_y, $j) OVER w, 0) * ${1L << (7 - j)}")
          .mkString(" + ") + " AS tnum " +
        "FROM (SELECT day, y, lag(y, 1) OVER (ORDER BY day) AS lag_y FROM daily) " +
        "WINDOW w AS (ORDER BY day)), " +
        "anchor AS (SELECT rn AS arn, lnum, tnum FROM base WHERE rn = n_days - 7 AND rn >= 9), " +
        "tr AS (SELECT sum(abs(dy)) AS scale_sum, count(*) AS n_tr " +
        "FROM base, anchor WHERE rn >= 2 AND rn <= arn) " +
        "SELECT CAST(rn - arn AS BIGINT) AS h, " +
        "(anchor.lnum + CAST(rn - arn AS BIGINT) * anchor.tnum) // 255 AS forecast, y AS actual, " +
        "abs((anchor.lnum + CAST(rn - arn AS BIGINT) * anchor.tnum) // 255 - y) AS abs_err, " +
        "CAST(CAST(abs((anchor.lnum + CAST(rn - arn AS BIGINT) * anchor.tnum) // 255 - y) AS HUGEINT) " +
        "* n_tr * 1000000 // greatest(1, scale_sum) AS BIGINT) AS mase_ppm " +
        "FROM base, anchor, tr WHERE rn - arn >= 1 AND rn - arn <= 7 ORDER BY h")),

    // Sentence-level duplication profile per source — the C4/CCNet
    // boilerplate signal (nav bars, cookie banners, legal footers
    // repeat VERBATIM across documents at the sentence level long
    // before whole documents collide). Sentences (split on '.',
    // trimmed, >= 20 chars) group by their exact text for the global
    // occurrence count; per-source rollup reports how much of each
    // source is repeated material. At 100 TB the string grouping key
    // becomes a 128-bit hash and the rollup is unchanged; one explode,
    // two shuffles (sentence df, source rollup).
    Op("llm_dedup_sentence",
      (s, d) => {
        val sent = T.spread(T.t(s, d, "documents"))
          .select(col("doc_id"), col("source"),
            explode(split(col("text"), "\\.")).as("sraw"))
          .withColumn("sent", trim(col("sraw")))
          .where("length(sent) >= 20")
        val occ = sent.groupBy("sent").agg(count(lit(1)).as("occ"))
        sent.join(occ, "sent")
          .groupBy("source").agg(
            count(lit(1)).as("n_sentences"),
            expr("CAST(count_if(occ >= 2) AS BIGINT)").as("n_dup"))
          .withColumn("dup_ppm", expr(
            "CAST(CAST(n_dup AS DECIMAL(38,0)) * 1000000 " +
              "div greatest(1, n_sentences) AS BIGINT)"))
          .orderBy("source")
      },
      Some("WITH sent AS (SELECT doc_id, source, trim(s) AS sent " +
        "FROM (SELECT doc_id, source, unnest(string_split(text, '.')) AS s FROM documents) " +
        "WHERE length(trim(s)) >= 20), " +
        "occ AS (SELECT sent, count(*) AS occ FROM sent GROUP BY 1) " +
        "SELECT source, count(*) AS n_sentences, " +
        "CAST(count_if(occ >= 2) AS BIGINT) AS n_dup, " +
        "CAST(CAST(count_if(occ >= 2) AS HUGEINT) * 1000000 " +
        "// greatest(1, count(*)) AS BIGINT) AS dup_ppm " +
        "FROM sent JOIN occ USING (sent) GROUP BY source ORDER BY source")),

    // Label-conditioned embedding outliers — mislabeled-candidate
    // detection for curated training sets: the 3 vectors farthest
    // (squared L2, 1e-4 fixed point as in llm_embedding_center) from
    // their OWN label's centroid. Per-label centroids come from ONE
    // map-side-combinable (label, pos) aggregate; the |labels|
    // centroid panel broadcasts into the vector scan; the rank window
    // sits on one label exchange. Both engines run the identical
    // sequential fold, so the fixed-point distances agree exactly.
    Op("llm_label_outliers",
      (s, d) => {
        val emb = T.spread(T.t(s, d, "embeddings"))
        val means = emb
          .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
          .groupBy("label", "pos")
          .agg(sum(expr("CAST(floor(CAST(x AS DOUBLE) * 10000) AS BIGINT)")).as("sx"),
            count(lit(1)).as("n"))
          .groupBy("label")
          .agg(expr("array_sort(collect_list(struct(pos, sx, n)))").as("ss"))
          .select(col("label"),
            expr("transform(ss, e -> CAST(e.sx AS DOUBLE) / (10000.0 * e.n))").as("mean_vec"))
        val w = Window.partitionBy("label").orderBy(desc("d2_fp"), col("vec_id"))
        emb.join(broadcast(means), "label")
          .withColumn("d2_fp", expr(
            "CAST(floor(aggregate(zip_with(embedding, mean_vec, " +
              "(x, m) -> (CAST(x AS DOUBLE) - m) * (CAST(x AS DOUBLE) - m)), " +
              "CAST(0 AS DOUBLE), (a, v) -> a + v) * 10000 + 0.000001) AS BIGINT)"))
          .withColumn("rnk", row_number().over(w))
          .where("rnk <= 3")
          .select("label", "rnk", "vec_id", "d2_fp")
          .orderBy("label", "rnk")
      },
      Some("WITH s AS (SELECT label, t.range AS pos, " +
        "CAST(SUM(CAST(floor(CAST(embedding[t.range] AS DOUBLE) * 10000) AS BIGINT)) AS BIGINT) AS sx, " +
        "count(*) AS n FROM embeddings, range(1, 65) t GROUP BY 1, 2), " +
        "m AS (SELECT label, list(CAST(sx AS DOUBLE) / (10000.0 * n) ORDER BY pos) AS mean_vec " +
        "FROM s GROUP BY 1), " +
        "dist AS (SELECT e.label, vec_id, CAST(floor(list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
        "list_transform(range(1, len(embedding) + 1), i -> " +
        "(CAST(embedding[i] AS DOUBLE) - mean_vec[i]) * (CAST(embedding[i] AS DOUBLE) - mean_vec[i]))), " +
        "(acc, v) -> acc + v) * 10000 + 0.000001) AS BIGINT) AS d2_fp " +
        "FROM embeddings e JOIN m ON e.label = m.label), " +
        "r AS (SELECT label, vec_id, d2_fp, " +
        "CAST(row_number() OVER (PARTITION BY label ORDER BY d2_fp DESC, vec_id) AS INTEGER) AS rnk " +
        "FROM dist) " +
        "SELECT label, rnk, vec_id, d2_fp FROM r WHERE rnk <= 3 ORDER BY label, rnk")),

    // User-growth curve: per active day, DAU, newly-seen users and the
    // cumulative user count — the growth dashboard base table. Day ids
    // are integer epoch-day math (no calendar/timezone dependency);
    // everything flows from ONE distinct (user, day) projection — the
    // DAU aggregate, the per-user first-day, and the new-user rollup;
    // the cumulative sum is a window over the |days|-sized result.
    Op("rel_user_growth",
      (s, d) => {
        val ud = T.events(s, d).select(col("user_id"),
            expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000").as("day_id"))
          .distinct().localCheckpoint()
        val dau = ud.groupBy("day_id").agg(count(lit(1)).as("dau"))
        val nu = ud.groupBy("user_id").agg(min("day_id").as("day_id"))
          .groupBy("day_id").agg(count(lit(1)).as("new_users"))
        dau.join(nu, Seq("day_id"), "left")
          .withColumn("new_users", coalesce(col("new_users"), lit(0L)))
          .withColumn("cum_users", sum("new_users").over(
            Window.orderBy("day_id")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .select("day_id", "dau", "new_users", "cum_users")
          .orderBy("day_id")
      },
      Some("WITH ud AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day_id FROM events), " +
        "dau AS (SELECT day_id, count(*) AS dau FROM ud GROUP BY 1), " +
        "nu AS (SELECT day_id, count(*) AS new_users FROM " +
        "(SELECT user_id, min(day_id) AS day_id FROM ud GROUP BY 1) GROUP BY 1) " +
        "SELECT day_id, dau, coalesce(new_users, 0) AS new_users, " +
        "CAST(sum(coalesce(new_users, 0)) OVER (ORDER BY day_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users " +
        "FROM dau LEFT JOIN nu USING (day_id) ORDER BY day_id")),

    // DAU/MAU stickiness: per active day, the 28-day trailing distinct
    // actives (MAU) and the DAU/MAU ratio in ppm. ADAPTIVE plan on the
    // distinct (user, day) cardinality (one count off the checkpointed
    // frame): below the threshold, EXACT rolling distinct via coverage
    // expansion (each pair marks the 28 days it keeps the user
    // "monthly active" — a bounded 28x of the PAIRS, the audit-grade
    // form the oracle validates); above it, the 100-TB production path
    // — per-day HLL sketches merged over a |days| x 28 grid
    // (rel_dau_mau_hll's shape, data-size-independent), where `mau` is
    // the sketch estimate (~1.6% typical at lgConfigK=12). A fact-scale
    // corpus therefore never pays a 28x fact-cardinality exchange; the
    // exact expansion only ever runs at audit-bounded sizes.
    // Windows before day 28 of the series are partial by definition.
    Op("rel_dau_mau_stickiness",
      (s, d) => {
        val ud = T.events(s, d).select(col("user_id"),
            expr("unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000").as("day_id"))
          .distinct().localCheckpoint()
        val dau = ud.groupBy("day_id").agg(count(lit(1)).as("dau"))
        // 20M pairs -> a 560M-row bounded expansion, the most an exact
        // audit should ever shuffle; real fact scale goes to sketches
        val maxExactPairs = 20000000L
        val mau =
          if (ud.count() <= maxExactPairs)
            ud.select(col("user_id"),
                explode(expr("sequence(day_id, day_id + 27)")).as("day_id"))
              .distinct()
              .groupBy("day_id").agg(count(lit(1)).as("mau"))
          else
            ud.groupBy("day_id").agg(expr("hll_sketch_agg(user_id)").as("sk"))
              .select(col("sk"),
                explode(expr("sequence(day_id, day_id + 27)")).as("day_id"))
              .groupBy("day_id")
              .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("mau"))
        dau.join(mau, Seq("day_id"))
          .withColumn("sticky_ppm",
            expr("CAST(CAST(dau AS DECIMAL(38,0)) * 1000000 div mau AS BIGINT)"))
          .orderBy("day_id")
      },
      Some("WITH ud AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day_id FROM events), " +
        "dau AS (SELECT day_id, count(*) AS dau FROM ud GROUP BY 1), " +
        "mau AS (SELECT day_id, count(*) AS mau FROM " +
        "(SELECT DISTINCT user_id, unnest(range(day_id, day_id + 28)) AS day_id FROM ud) " +
        "GROUP BY 1) " +
        "SELECT day_id, dau, mau, " +
        "CAST(CAST(dau AS HUGEINT) * 1000000 // mau AS BIGINT) AS sticky_ppm " +
        "FROM dau JOIN mau USING (day_id) ORDER BY day_id")),

    // Degree histogram of the near-dup pair graph: how many documents
    // have k near-dup neighbours — the shape that picks the dedup
    // strategy (a few giant boilerplate stars vs many isolated pairs)
    // and predicts connected-component sizes before running them.
    // Rides the session-memoized jaccardPairs build (zero extra pair
    // generation after llm_ngram_jaccard or the recall audit has run);
    // everything here is two tiny aggregates over the pair set.
    Op("llm_dedup_graph_stats",
      (s, d) => {
        val pairs = LlmOps.jaccardPairs(s, d)
        pairs.select(col("d1").as("doc_id"))
          .unionAll(pairs.select(col("d2").as("doc_id")))
          .groupBy("doc_id").agg(count(lit(1)).as("degree"))
          .groupBy("degree").agg(count(lit(1)).as("n_docs"))
          .orderBy("degree")
      },
      Some("WITH " + LlmOps.oJaccardPairs + ", " +
        "deg AS (SELECT doc_id, count(*) AS degree FROM " +
        "(SELECT d1 AS doc_id FROM pairs UNION ALL SELECT d2 AS doc_id FROM pairs) " +
        "GROUP BY 1) " +
        "SELECT degree, count(*) AS n_docs FROM deg GROUP BY 1 ORDER BY 1")),

    // k-anonymity audit over a quasi-identifier set — the privacy
    // companion to pii_scrub/column_mask/erasure: group rows by the
    // QI columns (here (mktsegment, nationkey) on customer), measure
    // equivalence-class sizes, and report the re-identification
    // surface: rows in classes smaller than k=5, bucketed class-size
    // mass, and the risk share in ppm. One map-side-combinable groupBy
    // on the QI key; everything after touches |classes| rows. The QI
    // histogram is the artifact you check BEFORE releasing a dataset
    // cut — generalize/suppress until k1/k2_4 mass is acceptable.
    Op("core_kanonymity_audit",
      (s, d) => T.t(s, d, "customer")
        .groupBy("c_mktsegment", "c_nationkey").agg(count(lit(1)).as("k"))
        .agg(
          sum("k").as("n_rows"),
          count(lit(1)).as("n_classes"),
          min("k").as("min_k"),
          expr("CAST(coalesce(sum(CASE WHEN k = 1 THEN k END), 0) AS BIGINT)").as("k1_rows"),
          expr("CAST(coalesce(sum(CASE WHEN k BETWEEN 2 AND 4 THEN k END), 0) AS BIGINT)").as("k2_4_rows"),
          expr("CAST(coalesce(sum(CASE WHEN k >= 5 THEN k END), 0) AS BIGINT)").as("k5p_rows"))
        .withColumn("risk_ppm", expr(
          "CAST(CAST(k1_rows + k2_4_rows AS DECIMAL(38,0)) * 1000000 " +
            "div greatest(1, n_rows) AS BIGINT)")),
      Some("WITH cls AS (SELECT c_mktsegment, c_nationkey, count(*) AS k " +
        "FROM customer GROUP BY 1, 2) " +
        "SELECT CAST(sum(k) AS BIGINT) AS n_rows, count(*) AS n_classes, " +
        "CAST(min(k) AS BIGINT) AS min_k, " +
        "CAST(coalesce(sum(CASE WHEN k = 1 THEN k END), 0) AS BIGINT) AS k1_rows, " +
        "CAST(coalesce(sum(CASE WHEN k BETWEEN 2 AND 4 THEN k END), 0) AS BIGINT) AS k2_4_rows, " +
        "CAST(coalesce(sum(CASE WHEN k >= 5 THEN k END), 0) AS BIGINT) AS k5p_rows, " +
        "CAST(CAST(coalesce(sum(CASE WHEN k = 1 THEN k END), 0) + " +
        "coalesce(sum(CASE WHEN k BETWEEN 2 AND 4 THEN k END), 0) AS HUGEINT) * 1000000 " +
        "// greatest(1, CAST(sum(k) AS BIGINT)) AS BIGINT) AS risk_ppm FROM cls")),

    // Cross-source near-dup matrix: the exact-jaccard pair set rolled
    // up by (source, source) — which corpora copy from each other
    // (mirror sites, syndication, scraped re-posts) vs which only
    // self-duplicate. The signal that drives per-source dedup ORDER:
    // dedup the copying source against the copied-from one, not both
    // against everything. Rides the session-memoized jaccardPairs;
    // after the memo this is two broadcast-able dimension joins and a
    // |sources|^2-bounded aggregate.
    Op("llm_cross_source_dups",
      (s, d) => {
        val pairs = LlmOps.jaccardPairs(s, d)
        val src = T.t(s, d, "documents").select(col("doc_id"), col("source"))
        pairs
          .join(src.select(col("doc_id").as("d1"), col("source").as("s1")), "d1")
          .join(src.select(col("doc_id").as("d2"), col("source").as("s2")), "d2")
          .select(least(col("s1"), col("s2")).as("src_a"),
            greatest(col("s1"), col("s2")).as("src_b"))
          .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_pairs"))
          .orderBy("src_a", "src_b")
      },
      Some("WITH " + LlmOps.oJaccardPairs + " " +
        "SELECT least(a.source, b.source) AS src_a, " +
        "greatest(a.source, b.source) AS src_b, count(*) AS n_pairs " +
        "FROM pairs JOIN documents a ON pairs.d1 = a.doc_id " +
        "JOIN documents b ON pairs.d2 = b.doc_id " +
        "GROUP BY 1, 2 ORDER BY 1, 2")),

    // Benford first-digit audit on order totals — the classic
    // fabricated-data / broken-generator screen: naturally-occurring
    // multi-magnitude amounts follow P(d) = log10(1 + 1/d); uniform or
    // hand-typed data does not. First digit comes from the BIGINT
    // floor's decimal rendering (identical across engines — no
    // float log10 in the comparison path); expected shares are the
    // public Benford constants in ppm. One map-side-combinable
    // 9-group aggregate; deviation_ppm is the per-digit |obs - exp|.
    // (TPC-H totalprice is range-bounded, so it deviates — the AUDIT
    // format is the operator; the verdict depends on the data.)
    Op("rel_benford_audit",
      (s, d) => {
        val exp = Seq(301030L, 176091L, 124939L, 96910L, 79181L,
          66947L, 57992L, 51153L, 45757L)
        val expCase = exp.zipWithIndex
          .map { case (p, i) => s"WHEN ${i + 1} THEN ${p}L" }
          .mkString("CASE digit ", " ", " END")
        T.t(s, d, "orders")
          .where("o_totalprice >= 1")
          .withColumn("digit", expr(
            "CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS STRING), 1, 1) AS INT)"))
          .groupBy("digit").agg(count(lit(1)).as("n"))
          .withColumn("total", sum("n").over(
            Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
          .withColumn("observed_ppm", expr(
            "CAST(CAST(n AS DECIMAL(38,0)) * 1000000 div total AS BIGINT)"))
          .withColumn("benford_ppm", expr(expCase))
          .withColumn("deviation_ppm", expr("abs(observed_ppm - benford_ppm)"))
          .select("digit", "n", "observed_ppm", "benford_ppm", "deviation_ppm")
          .orderBy("digit")
      },
      Some("WITH g AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit, " +
        "count(*) AS n FROM orders WHERE o_totalprice >= 1 GROUP BY 1), " +
        "t AS (SELECT digit, n, CAST(sum(n) OVER () AS BIGINT) AS total FROM g), " +
        "e(digit, benford_ppm) AS (VALUES (1, CAST(301030 AS BIGINT)), (2, 176091), (3, 124939), " +
        "(4, 96910), (5, 79181), (6, 66947), (7, 57992), (8, 51153), (9, 45757)) " +
        "SELECT t.digit, n, CAST(CAST(n AS HUGEINT) * 1000000 // total AS BIGINT) AS observed_ppm, " +
        "benford_ppm, abs(CAST(CAST(n AS HUGEINT) * 1000000 // total AS BIGINT) - benford_ppm) AS deviation_ppm " +
        "FROM t JOIN e ON t.digit = e.digit ORDER BY t.digit")),

    // Write-Audit-Publish driven end-to-end under the oracle — the
    // pattern that keeps bad batches OUT of a serving table: write the
    // batch to a STAGED location, audit the staged files by reading
    // them back (not the in-memory frame — the audit must cover what
    // was actually persisted), and only then atomically promote the
    // staged directory as the table's next generation. A failed audit
    // deletes the staging and leaves the table exactly as it was
    // (Round9cSpec pins the abort path). The audit here is a 3-check
    // panel (non-empty, quantity completeness, positive price) over
    // one scan of the staged parquet.
    Op("core_wap_publish",
      (s, d) => {
        import s.implicits._
        val dir = s"target/tmp/wap_${d.replaceAll("[^A-Za-z0-9]", "_")}"
        graft.api.StoreIO.delete(s, dir)
        val batch = T.t(s, d, "lineitem").where("l_orderkey % 7 = 0")
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        val checks = Seq[(String, org.apache.spark.sql.DataFrame => Boolean)](
          "non_empty" -> (df => df.limit(1).count() > 0),
          "quantity_complete" ->
            (df => df.where("l_quantity IS NULL").limit(1).count() == 0),
          "price_positive" ->
            (df => df.where("l_extendedprice <= 0").limit(1).count() == 0))
        val report = graft.api.Wap.publish(s, batch, dir, "t", checks)
        val rows =
          if (report.published) graft.api.StoreIO.read(s, dir, "t").count() else 0L
        Seq((report.published, report.checksPassed.toLong,
            report.checksFailed.toLong, rows))
          .toDF("published", "checks_passed", "checks_failed", "rows_live")
      },
      Some("SELECT true AS published, CAST(3 AS BIGINT) AS checks_passed, " +
        "CAST(0 AS BIGINT) AS checks_failed, " +
        "(SELECT count(*) FROM lineitem WHERE l_orderkey % 7 = 0) AS rows_live")),

    // Revenue concentration (Pareto / Lorenz points): the share of
    // total revenue held by the top 1% / 10% / 50% of customers —
    // the "do 20% of customers drive 80% of revenue" read, and the
    // skew number that sizes customer-keyed partitioning. Customer
    // revenue is 1e-2 fixed point; ranks carry a custkey tiebreak;
    // the cut row per percentile is rn == ceil(n * p) picked with
    // integer ceil math, so both engines choose the identical
    // customer. Rank AND running revenue come from DistOrder.rankCum
    // (quantile-bucketed parallel rank + prefix sums) — no global
    // window anywhere; n and the revenue total are the helper's exact
    // driver-side scalars, burned in as literals.
    Op("rel_pareto_concentration",
      (s, d) => {
        val rev = T.t(s, d, "orders")
          .groupBy("o_custkey")
          .agg(expr("sum(CAST(floor(o_totalprice * 100) AS BIGINT))").as("r"))
        val rk = graft.api.DistOrder.rankCum(rev,
          -col("r"), Seq(desc("r"), col("o_custkey")), value = Some(col("r")))
        val n = rk.n
        val c1 = (n + 99) / 100
        val c10 = (n + 9) / 10
        val c50 = (n + 1) / 2
        rk.df.where(col("rn") === c1 || col("rn") === c10 || col("rn") === c50)
          .withColumn("pct", expr(
            s"CASE WHEN rn = $c1 THEN 1 WHEN rn = $c10 THEN 10 ELSE 50 END"))
          .groupBy("pct").agg( // small n can collapse cut rows; keep ONE per pct
            min("rn").as("k_customers_i"),
            expr("CAST(min(cum) AS BIGINT)").as("cum_cents"))
          .select(col("pct"),
            expr("CAST(k_customers_i AS BIGINT)").as("k_customers"),
            expr("CAST(CAST(cum_cents AS DECIMAL(38,0)) * 1000000 " +
              s"div greatest(1, ${rk.total}) AS BIGINT)").as("share_ppm"))
          .orderBy("pct")
      },
      Some("WITH rev AS (SELECT o_custkey, " +
        "CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS r " +
        "FROM orders GROUP BY 1), " +
        "t AS (SELECT r, o_custkey, row_number() OVER w AS rn, count(*) OVER () AS n, " +
        "CAST(sum(r) OVER (ORDER BY r DESC, o_custkey " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum, " +
        "CAST(sum(r) OVER () AS BIGINT) AS tot FROM rev " +
        "WINDOW w AS (ORDER BY r DESC, o_custkey)) " +
        "SELECT pct, CAST(min(rn) AS BIGINT) AS k_customers, " +
        "CAST(CAST(min(cum) AS HUGEINT) * 1000000 // greatest(1, min(tot)) AS BIGINT) AS share_ppm " +
        "FROM (SELECT *, CASE WHEN rn = (n + 99) // 100 THEN 1 " +
        "WHEN rn = (n + 9) // 10 THEN 10 ELSE 50 END AS pct FROM t " +
        "WHERE rn = (n + 99) // 100 OR rn = (n + 9) // 10 OR rn = (n + 1) // 2) " +
        "GROUP BY pct ORDER BY pct")))
}
