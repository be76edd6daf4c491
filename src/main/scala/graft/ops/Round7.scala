package graft.ops

import graft.{Op, Tables => T}
import graft.functions.KmvAggregator
import org.apache.spark.sql.functions._

/** Round-7 batch (SURVEY.md §2 F2 continuation): mergeable sketches and
  * estimator audits — the structures a 100-TB profiling pass carries
  * instead of exact state. Every sketch here has a FIXED size per group
  * regardless of input rows (k longs for KMV, d×w cells for count-min),
  * is map-side combinable (the shuffle carries sketches, not keys), and
  * is audited against exact truth inside the same query so the error
  * the estimator ships with is measured, not assumed.
  */
object Round7 {

  /** 60-bit md5 prefix hash of `e` — the house portable hash: Spark
    * `conv(hex,16,10)`, DuckDB `'0x'||hex` cast, identical value.
    */
  private def h60(e: String): String =
    s"CAST(conv(substring(md5($e), 1, 15), 16, 10) AS BIGINT)"
  private def oH60(e: String): String =
    s"CAST(concat('0x', substr(md5($e), 1, 15)) AS BIGINT)"

  /** 32-bit md5 prefix (bucket hashing). */
  private def h32(e: String): String =
    s"CAST(conv(substring(md5($e), 1, 8), 16, 10) AS BIGINT)"
  private def oH32(e: String): String =
    s"CAST(concat('0x', substr(md5($e), 1, 8)) AS BIGINT)"

  /** Exact whitespace token counts (the CMS input). */
  private[graft] def tokenCounts(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs.select(explode(split(col("text"), " ")).as("tok"))
      .where("tok <> ''")
      .groupBy("tok").agg(count(lit(1)).as("exact"))

  /** The 4 (row_i, bucket) CMS cells of each token (d=4, width w —
    * default 1024; [[graft.api.SketchStore.buildSized]] derives w from
    * the KMV token-cardinality estimate instead).
    */
  private[graft] def cmsBuckets(df: org.apache.spark.sql.DataFrame,
      width: Long = 1024L): org.apache.spark.sql.DataFrame = df
    .select(col("tok"), col("exact"),
      posexplode(expr(
        "transform(sequence(0, 3), i -> CAST(" +
          h32("concat(CAST(i AS STRING), ':', tok)") +
          s" % CAST($width AS BIGINT) AS INT))")))
    .withColumnRenamed("pos", "row_i")
    .withColumnRenamed("col", "bucket")

  /** The count-min counter table of a document set: 4×w cells,
    * additive across disjoint document sets (cell-wise sum) — the
    * property [[graft.streaming.Streams.cmsSink]] relies on.
    */
  private[graft] def cmsCounters(docs: org.apache.spark.sql.DataFrame,
      width: Long = 1024L): org.apache.spark.sql.DataFrame =
    cmsBuckets(tokenCounts(docs), width)
      .groupBy("row_i", "bucket").agg(sum("exact").as("c"))

  /** Per-element KMV estimate expression over a sketch array column:
    * exact size while under-filled, (k-1)·2^60 / h_(k) once full.
    */
  private def estOf(c: String): String =
    s"CASE WHEN size($c) < 64 THEN CAST(size($c) AS BIGINT) ELSE " +
      s"CAST(floor((CAST(63 AS DOUBLE) * 1152921504606846976.0) / " +
      s"CAST(element_at($c, 64) AS DOUBLE)) AS BIGINT) END"
  private def oEstOf(c: String): String =
    s"CASE WHEN len($c) < 64 THEN CAST(len($c) AS BIGINT) ELSE " +
      s"CAST(floor((CAST(63 AS DOUBLE) * 1152921504606846976.0) / " +
      s"CAST($c[64] AS DOUBLE)) AS BIGINT) END"

  val ops: Seq[Op] = Seq(

    // K-minimum-values distinct sketch per language: the bounded
    // alternative to count(DISTINCT text) when the key set itself is
    // 100-TB-sized. The KmvAggregator keeps the k=64 smallest DISTINCT
    // 60-bit text hashes per group with map-side partial aggregation,
    // so the shuffle carries at most k longs per (group, mapper) —
    // never the keys. Estimate: exact size while the sketch is not
    // full (it then holds every distinct hash), else the KMV estimator
    // (k-1)·2^60 / h_(k). The oracle replays the sketch definition
    // exactly (k smallest distinct hashes via one window) so tri-SF
    // data exercises both the exact and the estimating branch.
    Op("rel_agg_kmv_distinct",
      (s, d) => {
        val k = 64
        val h = T.spread(
            T.t(s, d, "documents")
              .where("lang IS NOT NULL AND text IS NOT NULL"))
          .select(col("lang"), expr(h60("text")).as("h"))
        h.groupBy("lang")
          .agg(KmvAggregator.kmv(k)(col("h")).as("mins"))
          .select(col("lang"),
            when(expr(s"size(mins) = $k"), expr(s"element_at(mins, $k)"))
              .otherwise(lit(-1L)).as("kth_min"),
            when(expr(s"size(mins) < $k"), expr("CAST(size(mins) AS BIGINT)"))
              .otherwise(expr(
                s"CAST(floor((CAST(${k - 1} AS DOUBLE) * 1152921504606846976.0) " +
                  s"/ CAST(element_at(mins, $k) AS DOUBLE)) AS BIGINT)"))
              .as("n_est"))
          .orderBy("lang")
      },
      Some("WITH h AS (SELECT DISTINCT lang, " + oH60("text") + " AS h " +
        "FROM documents WHERE lang IS NOT NULL AND text IS NOT NULL), " +
        "r AS (SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS rn FROM h), " +
        "s AS (SELECT lang, count(*) AS nd, max(CASE WHEN rn = 64 THEN h END) AS kth " +
        "FROM r GROUP BY lang) " +
        "SELECT lang, COALESCE(kth, -1) AS kth_min, " +
        "CASE WHEN nd < 64 THEN nd ELSE " +
        "CAST(floor((CAST(63 AS DOUBLE) * 1152921504606846976.0) / CAST(kth AS DOUBLE)) AS BIGINT) " +
        "END AS n_est FROM s ORDER BY lang")),

    // Count-min-sketch heavy-hitter audit: build the real CMS (d=4
    // hash rows × w=1024 counters — 4096 cells total, map-side
    // combined, fixed size at any corpus scale) over whitespace
    // tokens, then audit the top-20 exact heavy hitters against their
    // sketch estimates. est >= exact always (one-sided error); the
    // overcount column is the measured collision bias a production
    // run would ship alongside the sketch. Exact counts here are the
    // audit's ground truth — the production artifact is the counter
    // table, which never grows with vocabulary.
    Op("llm_heavy_hitters_cms",
      (s, d) => {
        // pin the vocab-bounded token counts: the counter build and the
        // top-20 selection would otherwise each re-tokenize the corpus
        val tokCnt = tokenCounts(T.spread(T.t(s, d, "documents")))
          .localCheckpoint()
        val counters = cmsBuckets(tokCnt)
          .groupBy("row_i", "bucket").agg(sum("exact").as("c"))
        val top = tokCnt.orderBy(desc("exact"), col("tok")).limit(20)
        cmsBuckets(top)
          .join(broadcast(counters), Seq("row_i", "bucket"))
          .groupBy("tok", "exact").agg(min("c").as("est_cms"))
          .select(col("tok"), col("exact"), col("est_cms"),
            (col("est_cms") - col("exact")).as("overcount"))
          .orderBy(desc("exact"), col("tok"))
      },
      Some("WITH tc AS (SELECT tok, count(*) AS exact FROM (" +
        "SELECT unnest(string_split(text, ' ')) AS tok FROM documents) " +
        "WHERE tok <> '' GROUP BY tok), " +
        "tb AS (SELECT tok, exact, i AS row_i, " +
        "CAST(" + oH32("concat(CAST(i AS VARCHAR), ':', tok)") +
        " % 1024 AS INTEGER) AS bucket FROM tc, range(0, 4) t(i)), " +
        "cnt AS (SELECT row_i, bucket, CAST(SUM(exact) AS BIGINT) AS c " +
        "FROM tb GROUP BY row_i, bucket), " +
        "top AS (SELECT tok, exact FROM tc ORDER BY exact DESC, tok LIMIT 20) " +
        "SELECT t.tok, t.exact, MIN(c.c) AS est_cms, MIN(c.c) - t.exact AS overcount " +
        "FROM top t JOIN tb b ON t.tok = b.tok " +
        "JOIN cnt c ON b.row_i = c.row_i AND b.bucket = c.bucket " +
        "GROUP BY t.tok, t.exact ORDER BY t.exact DESC, t.tok")),

    // Interpolated Kneser–Ney bigram probabilities — the smoothing
    // actually used for n-gram LM scoring (llm_perplexity_proxy's
    // add-one is the classroom version; KN is the production one).
    // Every ingredient is an exact integer aggregate (bigram counts,
    // head totals, distinct-successor and distinct-predecessor type
    // counts, total bigram types), and the final probability is the
    // identical IEEE expression tree on both engines, so doubles
    // hash-match bit-for-bit. Three partial-aggregated shuffles, all
    // on token keys; nothing scales with corpus size beyond the
    // bigram-type vocabulary.
    Op("llm_kn_bigram_lm",
      (s, d) => {
        val bi = T.spread(T.t(s, d, "documents"))
          .withColumn("toks", split(lower(col("text")), " "))
          .where("size(toks) >= 2")
          .select(explode(expr(
            "transform(sequence(1, size(toks) - 1), " +
              "i -> struct(element_at(toks, i) AS w1, element_at(toks, i + 1) AS w2))"))
            .as("b"))
          .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
          .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
          // pin the bigram-type table (vocab^2-bounded, tiny next to the
          // corpus): heads/cont/types would otherwise each re-run the
          // full token-stream explode
          .localCheckpoint()
        val heads = bi.groupBy("w1").agg(
          sum("c12").as("c1"), count(lit(1)).as("n_succ"))
        val cont = bi.groupBy("w2").agg(count(lit(1)).as("n_pred"))
        val types = bi.agg(count(lit(1)).as("n_types"))
        bi.join(heads, "w1").join(cont, "w2").crossJoin(broadcast(types))
          .where("c12 >= 3")
          .select(col("w1"), col("w2"), col("c12"),
            expr("CAST(c1 AS BIGINT)").as("c1"),
            col("n_succ"), col("n_pred"), col("n_types"),
            expr("(greatest(CAST(c12 AS DOUBLE) - 0.75, CAST(0 AS DOUBLE)) / CAST(c1 AS DOUBLE)) + " +
              "((0.75 * CAST(n_succ AS DOUBLE)) / CAST(c1 AS DOUBLE)) * " +
              "(CAST(n_pred AS DOUBLE) / CAST(n_types AS DOUBLE))").as("p_kn"))
          .orderBy("w1", "w2")
      },
      Some("WITH bi AS (SELECT w1, w2, count(*) AS c12 FROM (" +
        "SELECT toks[i] AS w1, toks[i + 1] AS w2 " +
        "FROM (SELECT string_split(lower(text), ' ') AS toks FROM documents), " +
        "unnest(range(1, len(toks))) t(i) WHERE len(toks) >= 2) GROUP BY w1, w2), " +
        "heads AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1, count(*) AS n_succ FROM bi GROUP BY w1), " +
        "cont AS (SELECT w2, count(*) AS n_pred FROM bi GROUP BY w2), " +
        "types AS (SELECT count(*) AS n_types FROM bi) " +
        "SELECT bi.w1, bi.w2, c12, c1, n_succ, n_pred, n_types, " +
        "(greatest(CAST(c12 AS DOUBLE) - 0.75, CAST(0 AS DOUBLE)) / CAST(c1 AS DOUBLE)) + " +
        "((0.75 * CAST(n_succ AS DOUBLE)) / CAST(c1 AS DOUBLE)) * " +
        "(CAST(n_pred AS DOUBLE) / CAST(n_types AS DOUBLE)) AS p_kn " +
        "FROM bi JOIN heads ON bi.w1 = heads.w1 JOIN cont ON bi.w2 = cont.w2, types " +
        "WHERE c12 >= 3 ORDER BY bi.w1, bi.w2")),

    // Temperature-scaled domain mixing (τ = 1/2): the up/down-sampling
    // weights multilingual pretraining uses to keep head languages
    // from drowning tail ones (w_d ∝ n_d^τ). τ = 1/2 makes the power
    // an IEEE sqrt — exact-rounded and engine-identical — and the
    // sqrt is immediately floor-quantized to a 1e6 integer so every
    // cross-row reduction (the normalizer) is an order-independent
    // integer sum; weights and target counts are then exact integer
    // floor divisions. One 5-row aggregate + a broadcast total: the
    // plan is scale-free.
    Op("llm_temperature_mix",
      (s, d) => {
        val n = T.t(s, d, "documents")
          .groupBy("lang").agg(count(lit(1)).as("n_docs"))
          .withColumn("sq_fp",
            expr("CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000000.0) AS BIGINT)"))
        val tot = n.agg(
          sum("sq_fp").as("tot_sq"), sum("n_docs").as("n_total"))
        // the products sq_fp*1e9 and n_total*sq_fp overflow BIGINT once a
        // language passes ~8.5e7 docs — exactly the scale this op is
        // for — so the intermediates go through DECIMAL(38,0) (HUGEINT
        // on the oracle side); the floor-divisions land back in BIGINT
        // with identical values at every SF
        n.crossJoin(broadcast(tot))
          .select(col("lang"), col("n_docs"),
            expr("CAST(CAST(sq_fp AS DECIMAL(38,0)) * 1000000000 div tot_sq AS BIGINT)").as("weight_fp"),
            expr("CAST(CAST(n_total AS DECIMAL(38,0)) * sq_fp div tot_sq AS BIGINT)").as("target_n"))
          .orderBy("lang")
      },
      Some("WITH n AS (SELECT lang, count(*) AS n_docs, " +
        "CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * 1000000.0) AS BIGINT) AS sq_fp " +
        "FROM documents GROUP BY lang), " +
        "tot AS (SELECT CAST(SUM(sq_fp) AS BIGINT) AS tot_sq, " +
        "CAST(SUM(n_docs) AS BIGINT) AS n_total FROM n) " +
        "SELECT lang, n_docs, " +
        "CAST(CAST(sq_fp AS HUGEINT) * 1000000000 // tot_sq AS BIGINT) AS weight_fp, " +
        "CAST(CAST(n_total AS HUGEINT) * sq_fp // tot_sq AS BIGINT) AS target_n " +
        "FROM n, tot ORDER BY lang")),

    // KMV sketch ALGEBRA: pairwise source-overlap estimated purely
    // from the per-source sketches — union(A,B) is the k smallest of
    // the merged sketch arrays (KMV closure under union, the reason
    // this sketch and not HLL backs overlap planning), intersection
    // by inclusion–exclusion. At 100 TB this answers "which sources
    // duplicate each other" from 20 sketch rows of k longs each —
    // no text ever crosses the wire — while the exact_inter column
    // (a linear hash equi-join, audit-only) measures the estimator
    // error the sketch ships with. 20 sources → 190 pair rows.
    Op("llm_source_overlap_kmv",
      (s, d) => {
        val k = 64
        val base = T.spread(
            T.t(s, d, "documents")
              .where("source IS NOT NULL AND text IS NOT NULL"))
          .select(col("source"), expr(h60("text")).as("h"))
        val sk = base.groupBy("source")
          .agg(KmvAggregator.kmv(k)(col("h")).as("mins"))
        val a = sk.select(col("source").as("src_a"), col("mins").as("ma"))
        val b = sk.select(col("source").as("src_b"), col("mins").as("mb"))
        val pairs = a.join(broadcast(b), col("src_a") < col("src_b"))
          .withColumn("mu", expr(s"slice(array_sort(array_distinct(concat(ma, mb))), 1, $k)"))
          .select(col("src_a"), col("src_b"),
            expr(estOf("ma")).as("est_a"),
            expr(estOf("mb")).as("est_b"),
            expr(estOf("mu")).as("est_union"))
          .withColumn("est_inter",
            expr("greatest(est_a + est_b - est_union, CAST(0 AS BIGINT))"))
        val dist = base.distinct()
        val exact = dist.as("x").join(dist.as("y"),
            expr("x.h = y.h AND x.source < y.source"))
          .groupBy(col("x.source").as("src_a"), col("y.source").as("src_b"))
          .agg(count(lit(1)).as("exact_inter"))
        pairs.join(exact, Seq("src_a", "src_b"), "left")
          .withColumn("exact_inter",
            coalesce(col("exact_inter"), lit(0L)))
          .orderBy("src_a", "src_b")
      },
      Some("WITH h AS (SELECT DISTINCT source, " + oH60("text") + " AS h " +
        "FROM documents WHERE source IS NOT NULL AND text IS NOT NULL), " +
        "r AS (SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn FROM h), " +
        "sk AS (SELECT source, list(h ORDER BY h) FILTER (WHERE rn <= 64) AS mins FROM r GROUP BY source), " +
        "p AS (SELECT a.source AS src_a, b.source AS src_b, " +
        "list_sort(list_distinct(a.mins || b.mins))[1:64] AS mu, " +
        oEstOf("a.mins") + " AS est_a, " + oEstOf("b.mins") + " AS est_b " +
        "FROM sk a JOIN sk b ON a.source < b.source), " +
        "e AS (SELECT src_a, src_b, est_a, est_b, " + oEstOf("mu") + " AS est_union FROM p), " +
        "x AS (SELECT a.source AS src_a, b.source AS src_b, count(*) AS exact_inter " +
        "FROM h a JOIN h b ON a.h = b.h AND a.source < b.source GROUP BY 1, 2) " +
        "SELECT e.src_a, e.src_b, est_a, est_b, est_union, " +
        "greatest(est_a + est_b - est_union, 0) AS est_inter, " +
        "COALESCE(x.exact_inter, 0) AS exact_inter " +
        "FROM e LEFT JOIN x ON e.src_a = x.src_a AND e.src_b = x.src_b " +
        "ORDER BY e.src_a, e.src_b")),

    // Sketch join-cardinality estimation (AMS/count-min): each side is
    // profiled independently into a 4×1024 counter table (one scan,
    // partial-agg combined); |A ⋈ B| = Σ_k f_A(k)·f_B(k) appears per
    // hash row as the 1024-cell inner product ip_i = J + collision
    // noise whose EXPECTATION is (n_A·n_B − J)/w. The raw min-of-rows
    // (est_upper) is the classic one-sided bound, but with w ≪ keys
    // the noise dominates (measured: 15.6× at sf0.01) — so the
    // operator also reports the unbiased estimator
    // Ĵ_i = (w·ip_i − n_A·n_B)/(w−1) averaged over the 4 rows, which
    // is what an optimizer would actually consult before committing a
    // 100-TB shuffle without catalog stats. The exact join is
    // audit-only; err_abs_ppm ships the measured estimator error.
    Op("rel_join_size_estimate",
      (s, d) => {
        def cms(df: org.apache.spark.sql.DataFrame, key: String, cName: String) = df
          .groupBy(col(key).as("k")).agg(count(lit(1)).as("f"))
          .select(col("f"), posexplode(expr(
            "transform(sequence(0, 3), i -> CAST(" +
              h32("concat(CAST(i AS STRING), ':', CAST(k AS STRING))") +
              " % 1024 AS INT))")))
          .withColumnRenamed("pos", "row_i")
          .withColumnRenamed("col", "bucket")
          .groupBy("row_i", "bucket").agg(sum("f").as(cName))
        val ca = cms(T.t(s, d, "orders"), "o_orderkey", "ca")
        val cb = cms(T.t(s, d, "lineitem"), "l_orderkey", "cb")
        val na = T.t(s, d, "orders").agg(count(lit(1)).as("na"))
        val nb = T.t(s, d, "lineitem").agg(count(lit(1)).as("nb"))
        val est = ca.join(cb, Seq("row_i", "bucket"))
          .groupBy("row_i").agg(sum(expr("ca * cb")).as("ip"))
          .crossJoin(broadcast(na)).crossJoin(broadcast(nb))
          // clamp before the integer division so truncating (Spark div)
          // and flooring (DuckDB //) semantics coincide
          .withColumn("corr",
            expr("greatest(1024 * ip - na * nb, CAST(0 AS BIGINT)) div 1023"))
          .agg(min("ip").as("est_upper"),
            expr("sum(corr) div 4").as("est_rows"),
            first("na").as("na"), first("nb").as("nb"))
        val exact = T.t(s, d, "orders").join(
            T.t(s, d, "lineitem"),
            expr("o_orderkey = l_orderkey"))
          .agg(count(lit(1)).as("exact_rows"))
        est.crossJoin(exact)
          .select(col("na"), col("nb"), col("est_upper"),
            col("est_rows"), col("exact_rows"),
            expr("abs(est_rows - exact_rows) * 1000000 div exact_rows")
              .as("err_abs_ppm"))
      },
      Some("WITH fa AS (SELECT o_orderkey AS k, count(*) AS f FROM orders GROUP BY 1), " +
        "fb AS (SELECT l_orderkey AS k, count(*) AS f FROM lineitem GROUP BY 1), " +
        "ba AS (SELECT f, i AS row_i, CAST(" +
        oH32("concat(CAST(i AS VARCHAR), ':', CAST(k AS VARCHAR))") +
        " % 1024 AS INTEGER) AS bucket FROM fa, range(0, 4) t(i)), " +
        "bb AS (SELECT f, i AS row_i, CAST(" +
        oH32("concat(CAST(i AS VARCHAR), ':', CAST(k AS VARCHAR))") +
        " % 1024 AS INTEGER) AS bucket FROM fb, range(0, 4) t(i)), " +
        "ca AS (SELECT row_i, bucket, CAST(SUM(f) AS BIGINT) AS ca FROM ba GROUP BY 1, 2), " +
        "cb AS (SELECT row_i, bucket, CAST(SUM(f) AS BIGINT) AS cb FROM bb GROUP BY 1, 2), " +
        "nn AS (SELECT (SELECT count(*) FROM orders) AS na, " +
        "(SELECT count(*) FROM lineitem) AS nb), " +
        "ip AS (SELECT ca.row_i, CAST(SUM(ca * cb) AS BIGINT) AS ip " +
        "FROM ca JOIN cb ON ca.row_i = cb.row_i AND ca.bucket = cb.bucket GROUP BY 1), " +
        "co AS (SELECT row_i, ip, greatest(1024 * ip - na * nb, 0) // 1023 AS corr FROM ip, nn), " +
        "e AS (SELECT MIN(ip) AS est_upper, CAST(SUM(corr) AS BIGINT) // 4 AS est_rows FROM co), " +
        "x AS (SELECT count(*) AS exact_rows FROM orders o JOIN lineitem l " +
        "ON o.o_orderkey = l.l_orderkey) " +
        "SELECT na, nb, est_upper, est_rows, exact_rows, " +
        "abs(est_rows - exact_rows) * 1000000 // exact_rows AS err_abs_ppm " +
        "FROM e, x, nn")),

    // Bloom-filter false-positive-rate audit: build a deterministic
    // Bloom filter (m=131072 bits, j=6 double-hashed probes) over the
    // customer keys, probe it with 10k keys disjoint by construction,
    // and report the MEASURED false-positive rate next to the
    // (1-e^{-jn/m})^j theory value — the check run before trusting a
    // Bloom prefilter (rel_join_bloom_prefilter) to gate a 100-TB
    // shuffle. The filter is a distinct-bit-position table (≤ m rows,
    // broadcast); build and probe are one explode + one join each.
    Op("rel_bloom_fpr_audit",
      (s, d) => {
        val m = 131072
        def bitsOf(k: String) =
          s"transform(sequence(0, 5), i -> (" +
            h32(s"concat('b1:', CAST($k AS STRING))") + " + i * " +
            h32(s"concat('b2:', CAST($k AS STRING))") + s") % $m)"
        val keys = T.t(s, d, "customer").select(col("c_custkey").as("k"))
        val bits = keys.select(explode(expr(bitsOf("k"))).as("bit")).distinct()
        val probes = s.range(1000000000L, 1000010000L).select(col("id").as("k"))
        val hit = probes
          .select(col("k"), explode(expr(bitsOf("k"))).as("bit"))
          .join(broadcast(bits.withColumn("b1", lit(1L))), Seq("bit"), "left")
          .groupBy("k").agg(sum(coalesce(col("b1"), lit(0L))).as("nset"))
          .agg(count(lit(1)).as("n_probes"),
            sum(when(col("nset") === 6L, 1L).otherwise(0L)).as("false_pos"))
        keys.agg(count(lit(1)).as("n_keys"))
          .crossJoin(broadcast(bits.agg(count(lit(1)).as("bits_set"))))
          .crossJoin(broadcast(hit))
          .withColumn("p", expr(
            s"1.0 - exp((0.0 - CAST(6 * n_keys AS DOUBLE)) / $m.0)"))
          .select(col("n_keys"), col("bits_set"), col("n_probes"), col("false_pos"),
            expr("false_pos * 1000000 div n_probes").as("fpr_ppm"),
            expr("CAST(floor((((((p * p) * p) * p) * p) * p) * 1000000.0) AS BIGINT)")
              .as("theory_ppm"))
      },
      Some("WITH keys AS (SELECT c_custkey AS k FROM customer), " +
        "kh AS (SELECT k, " +
        oH32("concat('b1:', CAST(k AS VARCHAR))") + " AS h1, " +
        oH32("concat('b2:', CAST(k AS VARCHAR))") + " AS h2 FROM keys), " +
        "bits AS (SELECT DISTINCT (h1 + i * h2) % 131072 AS bit FROM kh, range(0, 6) t(i)), " +
        "ph AS (SELECT k, " +
        oH32("concat('b1:', CAST(k AS VARCHAR))") + " AS h1, " +
        oH32("concat('b2:', CAST(k AS VARCHAR))") + " AS h2 " +
        "FROM range(1000000000, 1000010000) t(k)), " +
        "pb AS (SELECT k, (h1 + i * h2) % 131072 AS bit FROM ph, range(0, 6) t(i)), " +
        "hit AS (SELECT CAST(count(*) AS BIGINT) AS n_probes, " +
        "CAST(SUM(CASE WHEN nset = 6 THEN 1 ELSE 0 END) AS BIGINT) AS false_pos FROM (" +
        "SELECT pb.k, SUM(CASE WHEN b.bit IS NOT NULL THEN 1 ELSE 0 END) AS nset " +
        "FROM pb LEFT JOIN bits b ON pb.bit = b.bit GROUP BY pb.k)), " +
        "agg AS (SELECT (SELECT count(*) FROM keys) AS n_keys, " +
        "(SELECT count(*) FROM bits) AS bits_set, n_probes, false_pos FROM hit), " +
        "pp AS (SELECT *, 1.0 - exp((0.0 - CAST(6 * n_keys AS DOUBLE)) / 131072.0) AS p FROM agg) " +
        "SELECT n_keys, bits_set, n_probes, false_pos, " +
        "false_pos * 1000000 // n_probes AS fpr_ppm, " +
        "CAST(floor((((((p * p) * p) * p) * p) * p) * 1000000.0) AS BIGINT) AS theory_ppm " +
        "FROM pp")),

    // Equi-width 20-bin histogram of o_totalprice — the classic
    // optimizer column statistic (selectivity input) beyond
    // core_column_stats' min/max/NDV. One scan for the bounds
    // (broadcast 1-row), one partial-aggregated scan for the bin
    // counts; the cumulative column is a 20-row broadcast self-join,
    // never a global window. Bin boundaries are the identical IEEE
    // expression tree on both engines.
    Op("core_column_histogram",
      (s, d) => {
        val o = T.t(s, d, "orders")
        // zero-width guard: a constant column (or one row) degenerates
        // to a single bin instead of NaN arithmetic (ANSI casts throw)
        val mm = o.agg(min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))
          .withColumn("w", expr("CASE WHEN hi = lo THEN 1.0 ELSE (hi - lo) / 20.0 END"))
        val binned = o.crossJoin(broadcast(mm))
          .withColumn("bin", expr(
            "CAST(least(floor((o_totalprice - lo) / w), 19.0) AS INT)"))
          .groupBy("bin").agg(count(lit(1)).as("n_rows"))
        val cum = binned.as("a")
          .join(broadcast(binned.as("b")), expr("b.bin <= a.bin"))
          .groupBy(col("a.bin").as("bin"), col("a.n_rows").as("n_rows"))
          .agg(sum("b.n_rows").as("cum_rows"))
        cum.crossJoin(broadcast(mm))
          .select(col("bin"),
            expr("lo + CAST(bin AS DOUBLE) * w").as("bin_lo"),
            expr("lo + (CAST(bin AS DOUBLE) + 1.0) * w").as("bin_hi"),
            col("n_rows"), col("cum_rows"))
          .orderBy("bin")
      },
      Some("WITH mm AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi, " +
        "CASE WHEN max(o_totalprice) = min(o_totalprice) THEN 1.0 " +
        "ELSE (max(o_totalprice) - min(o_totalprice)) / 20.0 END AS w FROM orders), " +
        "bi AS (SELECT CAST(least(floor((o_totalprice - lo) / w), 19.0) AS INTEGER) AS bin, " +
        "count(*) AS n_rows FROM orders, mm GROUP BY 1), " +
        "cu AS (SELECT a.bin, a.n_rows, CAST(SUM(b.n_rows) AS BIGINT) AS cum_rows " +
        "FROM bi a JOIN bi b ON b.bin <= a.bin GROUP BY a.bin, a.n_rows) " +
        "SELECT bin, lo + CAST(bin AS DOUBLE) * w AS bin_lo, " +
        "lo + (CAST(bin AS DOUBLE) + 1.0) * w AS bin_hi, " +
        "n_rows, cum_rows FROM cu, mm ORDER BY bin")),

    // Histogram-driven selectivity estimation with measured error: the
    // range-predicate cardinality an optimizer reads off the histogram
    // (full bins above the threshold + linear interpolation inside the
    // straddling bin) vs the exact count. Threshold = lo + 0.75·range,
    // so the estimate always exercises the interpolation path. The
    // whole estimate touches 20 histogram rows; the exact count is
    // audit-only — at 100 TB the histogram IS the answer.
    Op("rel_selectivity_estimate",
      (s, d) => {
        val o = T.t(s, d, "orders")
        val mm = o.agg(min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))
          // zero-width guard as in core_column_histogram (ANSI NaN casts)
          .withColumn("w", expr("CASE WHEN hi = lo THEN 1.0 ELSE (hi - lo) / 20.0 END"))
          .withColumn("t", expr("lo + (hi - lo) * 0.75"))
        val binned = o.crossJoin(broadcast(mm))
          .withColumn("bin", expr(
            "CAST(least(floor((o_totalprice - lo) / w), 19.0) AS INT)"))
          .groupBy("bin").agg(count(lit(1)).as("n_rows"))
        val est = binned.crossJoin(broadcast(mm))
          .withColumn("tb", expr("CAST(least(floor((t - lo) / w), 19.0) AS INT)"))
          .agg(
            first("t").as("t"),
            sum(when(col("bin") > col("tb"), col("n_rows")).otherwise(0L)).as("above"),
            sum(when(col("bin") === col("tb"), col("n_rows")).otherwise(0L)).as("straddle"),
            first(expr("(lo + (CAST(tb AS DOUBLE) + 1.0) * w - t) / w")).as("frac"))
          .select(col("t"),
            expr("above + CAST(floor(CAST(straddle AS DOUBLE) * frac) AS BIGINT)")
              .as("est_rows"))
        val exact = o.crossJoin(broadcast(mm))
          .where("o_totalprice >= t")
          .agg(count(lit(1)).as("exact_rows"))
        est.crossJoin(exact)
          .select(
            expr("CAST(floor(t * 100.0) AS BIGINT)").as("threshold_fp"),
            col("est_rows"), col("exact_rows"),
            expr("abs(est_rows - exact_rows) * 1000000 div exact_rows")
              .as("err_abs_ppm"))
      },
      Some("WITH mm AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi, " +
        "CASE WHEN max(o_totalprice) = min(o_totalprice) THEN 1.0 " +
        "ELSE (max(o_totalprice) - min(o_totalprice)) / 20.0 END AS w, " +
        "min(o_totalprice) + (max(o_totalprice) - min(o_totalprice)) * 0.75 AS t FROM orders), " +
        "bi AS (SELECT CAST(least(floor((o_totalprice - lo) / w), 19.0) AS INTEGER) AS bin, " +
        "count(*) AS n_rows FROM orders, mm GROUP BY 1), " +
        "tb AS (SELECT CAST(least(floor((t - lo) / w), 19.0) AS INTEGER) AS tb FROM mm), " +
        "e AS (SELECT CAST(SUM(CASE WHEN bin > tb THEN n_rows ELSE 0 END) AS BIGINT) AS above, " +
        "CAST(SUM(CASE WHEN bin = tb THEN n_rows ELSE 0 END) AS BIGINT) AS straddle FROM bi, tb), " +
        "f AS (SELECT (lo + (CAST(tb AS DOUBLE) + 1.0) * w - t) / w AS frac FROM mm, tb), " +
        "x AS (SELECT count(*) AS exact_rows FROM orders, mm WHERE o_totalprice >= t), " +
        "g AS (SELECT above + CAST(floor(CAST(straddle AS DOUBLE) * frac) AS BIGINT) AS est_rows FROM e, f) " +
        "SELECT CAST(floor(t * 100.0) AS BIGINT) AS threshold_fp, est_rows, exact_rows, " +
        "abs(est_rows - exact_rows) * 1000000 // exact_rows AS err_abs_ppm FROM g, x, mm")),

    // Asymmetric near-dup direction: trigram-shingle CONTAINMENT
    // C = |A∩B| / min(|A|,|B|) between DISTINCT texts — jaccard says
    // "these two overlap", containment says "one lies inside the
    // other" (boilerplate-wrapped copies, excerpt pages), the signal
    // that picks WHICH document to drop. Same inverted-index discipline
    // as llm_ngram_jaccard: the scale-invariant rare cap
    // (df <= max(256, 1% of docs)) bounds posting lists,
    // denominators count every shingle; pair generation runs on one
    // representative per identical-(lowered-)text group, so the
    // quadratic term is |distinct texts| — bounded on duplicate-heavy
    // corpora by construction (the exact-dedup family owns expansion).
    Op("llm_shingle_containment",
      (s, d) => {
        val reps = T.spread(T.t(s, d, "documents"))
          .groupBy(lower(col("text")).as("ltext"))
          .agg(min("doc_id").as("doc_id"))
        val sid = reps
          .withColumn("toks", split(col("ltext"), " "))
          .where("size(toks) >= 3")
          .select(col("doc_id"), explode(expr(LlmOps.shingleHashExpr)).as("sid"))
          .localCheckpoint()
        val counts = sid.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
        val rare = sid.groupBy("sid").agg(count(lit(1)).as("df"))
          .where(s"df <= ${CorpusStats.rareDfCap(s, d)}").select("sid")
        val shRare = sid.join(rare, "sid")
        shRare.as("x").join(shRare.as("y"),
            col("x.sid") === col("y.sid") && col("x.doc_id") < col("y.doc_id"))
          .groupBy(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
          .agg(count(lit(1)).as("shared"))
          .join(counts.select(col("doc_id").as("d1"), col("n_sh").as("n1")), "d1")
          .join(counts.select(col("doc_id").as("d2"), col("n_sh").as("n2")), "d2")
          .withColumn("containment",
            expr("CAST(shared AS DOUBLE) / least(n1, n2)"))
          .where("containment >= 0.8")
          .select("d1", "d2", "containment")
          .orderBy("d1", "d2")
      },
      Some("WITH reps AS (SELECT min(doc_id) AS doc_id, ltext FROM (" +
        "SELECT doc_id, lower(text) AS ltext FROM documents) GROUP BY ltext), " +
        "sh AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks) - 1), " +
        "i -> concat(toks[i], ' ', toks[i + 1], ' ', toks[i + 2])))) AS shingle " +
        "FROM (SELECT doc_id, string_split(ltext, ' ') AS toks FROM reps) WHERE len(toks) >= 3), " +
        "counts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id), " +
        s"rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= ${CorpusStats.oRareDfCap}), " +
        "shrare AS (SELECT doc_id, shingle FROM sh JOIN rare USING (shingle)), " +
        "shared AS (SELECT x.doc_id AS d1, y.doc_id AS d2, count(*) AS shared " +
        "FROM shrare x JOIN shrare y ON x.shingle = y.shingle AND x.doc_id < y.doc_id " +
        "GROUP BY x.doc_id, y.doc_id) " +
        "SELECT d1, d2, containment FROM (" +
        "SELECT d1, d2, CAST(shared AS DOUBLE) / least(n1, n2) AS containment " +
        "FROM shared JOIN (SELECT doc_id AS d1, n_sh AS n1 FROM counts) c1 USING (d1) " +
        "JOIN (SELECT doc_id AS d2, n_sh AS n2 FROM counts) c2 USING (d2)) " +
        "WHERE containment >= 0.8 ORDER BY d1, d2")),

    // Quantile-sketch audit — completes the mergeable profile triple
    // (distinct = KMV, frequency = CMS, quantiles = histogram): p50/
    // p90/p99 of l_extendedprice read off a 256-bin equi-width
    // histogram by linear interpolation inside the target bin, audited
    // against the exact percentiles. The histogram is the mergeable
    // artifact (bin counts add across shards once bounds are fixed);
    // the quantile read-off touches ≤256 rows however large the table.
    Op("rel_quantile_sketch_audit",
      (s, d) => {
        import s.implicits._
        val li = T.t(s, d, "lineitem").select(col("l_extendedprice").as("x"))
        val mm = li.agg(min("x").as("lo"), max("x").as("hi"), count(lit(1)).as("n"))
          .withColumn("w", expr("CASE WHEN hi = lo THEN 1.0 ELSE (hi - lo) / 256.0 END"))
        val bins = li.crossJoin(broadcast(mm))
          .withColumn("bin", expr("CAST(least(floor((x - lo) / w), 255.0) AS INT)"))
          .groupBy("bin").agg(count(lit(1)).as("bn"))
        val cum = bins.as("a")
          .join(broadcast(bins.as("b")), expr("b.bin <= a.bin"))
          .groupBy(col("a.bin").as("bin"), col("a.bn").as("bn"))
          .agg(sum("b.bn").as("cum"))
        val first = Seq(0.5, 0.9, 0.99).toDF("q")
          .crossJoin(broadcast(cum)).crossJoin(broadcast(mm))
          .where("CAST(cum AS DOUBLE) >= q * CAST(n AS DOUBLE)")
          .groupBy("q").agg(min("bin").as("qbin"))
        val est = first.join(broadcast(cum), expr("qbin = bin"))
          .crossJoin(broadcast(mm))
          .withColumn("est_q", expr(
            "round(lo + CAST(qbin AS DOUBLE) * w + " +
              "((q * CAST(n AS DOUBLE) - CAST(cum - bn AS DOUBLE)) / CAST(bn AS DOUBLE)) * w, 4)"))
        val ex = li.agg(
          expr("round(percentile(x, 0.5), 4)").as("e50"),
          expr("round(percentile(x, 0.9), 4)").as("e90"),
          expr("round(percentile(x, 0.99), 4)").as("e99"))
        est.crossJoin(broadcast(ex))
          .withColumn("exact_q", expr(
            "CASE WHEN q = 0.5 THEN e50 WHEN q = 0.9 THEN e90 ELSE e99 END"))
          .select(
            expr("CAST(floor(q * 100.0 + 0.5) AS INT)").as("q_pct"),
            col("est_q"), col("exact_q"),
            expr("CAST(floor(abs(est_q - exact_q) / exact_q * 1000000.0) AS BIGINT)")
              .as("err_ppm"))
          .orderBy("q_pct")
      },
      Some("WITH li AS (SELECT l_extendedprice AS x FROM lineitem), " +
        "mm AS (SELECT min(x) AS lo, max(x) AS hi, count(*) AS n, " +
        "CASE WHEN max(x) = min(x) THEN 1.0 ELSE (max(x) - min(x)) / 256.0 END AS w FROM li), " +
        "bins AS (SELECT CAST(least(floor((x - lo) / w), 255.0) AS INTEGER) AS bin, " +
        "count(*) AS bn FROM li, mm GROUP BY 1), " +
        "cum AS (SELECT a.bin, a.bn, CAST(SUM(b.bn) AS BIGINT) AS cum " +
        "FROM bins a JOIN bins b ON b.bin <= a.bin GROUP BY a.bin, a.bn), " +
        "fb AS (SELECT q, min(bin) AS qbin FROM (SELECT unnest([0.5, 0.9, 0.99]) AS q), cum, mm " +
        "WHERE CAST(cum AS DOUBLE) >= q * CAST(n AS DOUBLE) GROUP BY q), " +
        "est AS (SELECT q, round(lo + CAST(qbin AS DOUBLE) * w + " +
        "((q * CAST(n AS DOUBLE) - CAST(cum - bn AS DOUBLE)) / CAST(bn AS DOUBLE)) * w, 4) AS est_q " +
        "FROM fb JOIN cum ON qbin = cum.bin, mm), " +
        "ex AS (SELECT round(quantile_cont(x, 0.5), 4) AS e50, " +
        "round(quantile_cont(x, 0.9), 4) AS e90, round(quantile_cont(x, 0.99), 4) AS e99 FROM li) " +
        "SELECT CAST(floor(q * 100.0 + 0.5) AS INTEGER) AS q_pct, est_q, " +
        "CASE WHEN q = 0.5 THEN e50 WHEN q = 0.9 THEN e90 ELSE e99 END AS exact_q, " +
        "CAST(floor(abs(est_q - (CASE WHEN q = 0.5 THEN e50 WHEN q = 0.9 THEN e90 ELSE e99 END)) / " +
        "(CASE WHEN q = 0.5 THEN e50 WHEN q = 0.9 THEN e90 ELSE e99 END) * 1000000.0) AS BIGINT) AS err_ppm " +
        "FROM est, ex ORDER BY q_pct")),

    // Duplicate rate per language from the KMV profile sketch alone —
    // the curation dashboard number llm_dataset_card computes with a
    // corpus-wide count(DISTINCT) shuffle, here read off k=64 longs
    // per lang (clamped: the estimator can exceed n_docs). The exact
    // column is the audit; at 100 TB the sketch from SketchStore IS
    // the dashboard, refreshed incrementally by kmvSink.
    Op("llm_dup_rate_kmv",
      (s, d) => {
        val base = T.spread(
            T.t(s, d, "documents")
              .where("lang IS NOT NULL AND text IS NOT NULL"))
        val n = base.groupBy("lang").agg(
          count(lit(1)).as("n_docs"),
          countDistinct("text").as("nd_exact"))
        val sk = base
          .select(col("lang"), expr(h60("text")).as("h"))
          .groupBy("lang")
          .agg(KmvAggregator.kmv(64)(col("h")).as("mins"))
          .withColumn("nd_est", expr(estOf("mins")))
        n.join(sk.select("lang", "nd_est"), "lang")
          .select(col("lang"), col("n_docs"),
            expr("least(nd_est, n_docs)").as("nd_est"),
            expr("(n_docs - least(nd_est, n_docs)) * 1000000 div n_docs")
              .as("dup_est_ppm"),
            expr("(n_docs - nd_exact) * 1000000 div n_docs")
              .as("dup_exact_ppm"))
          .orderBy("lang")
      },
      Some("WITH b AS (SELECT lang, text FROM documents " +
        "WHERE lang IS NOT NULL AND text IS NOT NULL), " +
        "n AS (SELECT lang, count(*) AS n_docs, count(DISTINCT text) AS nd_exact " +
        "FROM b GROUP BY lang), " +
        "h AS (SELECT DISTINCT lang, " + oH60("text") + " AS h FROM b), " +
        "r AS (SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS rn FROM h), " +
        "s AS (SELECT lang, count(*) AS nd, max(CASE WHEN rn = 64 THEN h END) AS kth " +
        "FROM r GROUP BY lang), " +
        "e AS (SELECT lang, CASE WHEN nd < 64 THEN nd ELSE " +
        "CAST(floor((CAST(63 AS DOUBLE) * 1152921504606846976.0) / CAST(kth AS DOUBLE)) AS BIGINT) " +
        "END AS nd_est FROM s) " +
        "SELECT n.lang, n_docs, least(nd_est, n_docs) AS nd_est, " +
        "(n_docs - least(nd_est, n_docs)) * 1000000 // n_docs AS dup_est_ppm, " +
        "(n_docs - nd_exact) * 1000000 // n_docs AS dup_exact_ppm " +
        "FROM n JOIN e ON n.lang = e.lang ORDER BY n.lang")),

    // Per-document lexical diversity: type/token ratio and hapax
    // (once-only) ratio — the repetitiveness quality signal next to
    // llm_repetition_filter's n-gram view. One explode + two hash
    // aggregations, all ratios exact integer fixed-point.
    Op("llm_lexical_diversity",
      (s, d) => T.spread(T.t(s, d, "documents"))
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .where("tok <> ''")
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(
          sum("c").as("n_tokens"),
          count(lit(1)).as("n_types"),
          sum(when(col("c") === 1L, 1L).otherwise(0L)).as("n_hapax"))
        .select(col("doc_id"), col("n_tokens"), col("n_types"), col("n_hapax"),
          expr("n_types * 1000000 div n_tokens").as("ttr_fp"),
          expr("n_hapax * 1000000 div n_types").as("hapax_fp"))
        .orderBy("doc_id"),
      Some("SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens, " +
        "count(*) AS n_types, " +
        "CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax, " +
        "count(*) * 1000000 // CAST(SUM(c) AS BIGINT) AS ttr_fp, " +
        "CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000000 // count(*) AS hapax_fp " +
        "FROM (SELECT doc_id, tok, count(*) AS c FROM (" +
        "SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) " +
        "WHERE tok <> '' GROUP BY doc_id, tok) GROUP BY doc_id ORDER BY doc_id"))
  )
}
