package graft.ops

import graft.{Op, Tables => T}
import org.apache.spark.sql.functions._

/** Round-5 second batch (SURVEY.md §2 F2 continuation): pipeline-ops a
  * 100-TB corpus migration/curation actually runs — content checksums
  * for cross-engine validation, z-order clustering for multi-dimension
  * data skipping, LSH design-point tuning, Heaps'-law vocabulary
  * growth, and class-balance weights.
  */
object Round5b {

  /** Per-lang commutative content digest (shared by core_row_checksum
    * and Streams.checksumSink so the streaming twin can never drift
    * from the batch op): bit_xor + modular sum over a 60-bit md5 row
    * hash. Both digests are associative and commutative, so digests of
    * disjoint batches FOLD into the corpus digest — the property the
    * incremental/streaming path relies on.
    */
  private[graft] def rowDigest(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs.withColumn("h", expr(
        "CAST(conv(substring(md5(concat_ws('|', CAST(doc_id AS STRING), text)), 1, 15), 16, 10) AS BIGINT)"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(h)").as("digest_xor"),
        sum(expr("h % 100000007")).as("digest_sum"))

  /** Fold per-batch digest rows (the exact [[rowDigest]] schema) into
    * the corpus digest: xor of xors, sum of counts/sums.
    */
  private[graft] def foldDigests(d: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    d.groupBy("lang")
      .agg(sum("n_rows").as("n_rows"),
        expr("bit_xor(digest_xor)").as("digest_xor"),
        sum("digest_sum").as("digest_sum"))

  /** DuckDB margin + quantized-sigmoid CTEs for logreg iteration `k`
    * reading weights from `wRef`: emits `m$k` and `s$k`. The arithmetic
    * mirrors [[graft.api.Models.logregTrain]] expression by expression
    * (same fold order, same clamp, same 1e-6 quantization with the
    * same eps guard).
    */
  private def oLogregMS(k: Int, wRef: String): String =
    s"m$k AS (SELECT y, xq, list_reduce(list_prepend(0.0, list_transform(range(1, 65), " +
      s"j -> w[j] * CAST(xq[j] AS DOUBLE))), (a, b) -> a + b) AS m FROM e, $wRef), " +
      s"s$k AS (SELECT y, xq, CAST(floor(1.0 / (1.0 + exp(-greatest(-30.0, least(30.0, m)))) " +
      s"* 1000000.0 + 0.000000001) AS BIGINT) AS s_fp FROM m$k)"

  /** Gradient + weight-update CTEs for logreg iteration `k`: integer
    * gradient sums (order-independent), then the identical IEEE update
    * tree `w[j] - 5.0 * (g[j] / (1e10 * n))`.
    */
  private def oLogregGW(k: Int, wRef: String): String =
    s"g$k AS (SELECT list(gs ORDER BY j) AS g FROM (SELECT j, " +
      s"SUM((s_fp - y * 1000000) * xq[j]) AS gs FROM s$k, range(1, 65) t(j) GROUP BY j)), " +
      s"w$k AS (SELECT list_transform(range(1, 65), " +
      s"j -> w[j] - 5.0 * (CAST(g[j] AS DOUBLE) / (10000000000.0 * n))) AS w FROM $wRef, g$k, nn)"

  /** Shared DuckDB training chain for the logreg family: quantized
    * features, three GD iterations ending in `w3` (plus `e`, `nn`).
    */
  private val oLogregChain: String =
    "WITH e AS (SELECT CASE WHEN label >= 5 THEN 1 ELSE 0 END AS y, " +
      "list_transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * 10000) AS BIGINT)) AS xq " +
      "FROM embeddings), " +
      "nn AS (SELECT count(*) AS n FROM e), " +
      "w0 AS (SELECT list_transform(range(1, 65), j -> 0.0) AS w), " +
      oLogregMS(1, "w0") + ", " + oLogregGW(1, "w0") + ", " +
      oLogregMS(2, "w1") + ", " + oLogregGW(2, "w1") + ", " +
      oLogregMS(3, "w2") + ", " + oLogregGW(3, "w2")

  /** DuckDB CTEs for one power iteration `k` reading `v${k-1}`: the
    * floor-quantized projection, the integer component sums, then the
    * IEEE sqrt/divide normalization — mirroring
    * [[graft.api.Models.pcaPower]] expression by expression.
    */
  private def oPcaIter(k: Int): String =
    s"p$k AS (SELECT xq, CAST(floor(list_reduce(list_prepend(0.0, list_transform(range(1, 65), " +
      s"j -> v[j] * CAST(xq[j] AS DOUBLE))), (a, b) -> a + b) + 0.000001) AS BIGINT) AS s_fp " +
      s"FROM e, v${k - 1}), " +
      s"u$k AS (SELECT list(us ORDER BY j) AS u FROM (SELECT j, SUM(s_fp * xq[j]) AS us " +
      s"FROM p$k, range(1, 65) t(j) GROUP BY j)), " +
      s"n$k AS (SELECT u, sqrt(list_reduce(list_prepend(0.0, list_transform(u, " +
      s"x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a, b) -> a + b)) AS nrm FROM u$k), " +
      s"v$k AS (SELECT list_transform(range(1, 65), j -> CAST(u[j] AS DOUBLE) / nrm) AS v, nrm FROM n$k)"

  val ops: Seq[Op] = Seq(

    // Spectral health of the embedding space — dominant principal
    // direction by power iteration (graft.api.Models.pcaPower): the
    // check run before trusting a cosine-similarity index or IVF
    // clustering built on these vectors (a collapsed dominant
    // direction means mean-centering/whitening is overdue). Same
    // determinism scheme as llm_logreg_train: integer-quantized
    // projections make every cross-row sum order-independent, and the
    // oracle replays all three iterations bit-for-bit.
    Op("llm_embedding_pca",
      (s, d) => {
        val (v, nrm) = graft.api.Models.pcaPower(T.t(s, d, "embeddings"))
        import s.implicits._
        def fp(x: Double): Long =
          math.floor(x * 100000000.0 + 0.000000001).toLong
        Seq((math.floor(nrm + 0.000001).toLong,
            fp(v(0)), fp(v(1)), fp(v(2)), fp(v(3)),
            fp(v(4)), fp(v(5)), fp(v(6)), fp(v(7))))
          .toDF("norm_fp",
            "v1_fp", "v2_fp", "v3_fp", "v4_fp",
            "v5_fp", "v6_fp", "v7_fp", "v8_fp")
      },
      Some("WITH e AS (SELECT list_transform(embedding, " +
        "v -> CAST(floor(CAST(v AS DOUBLE) * 10000) AS BIGINT)) AS xq FROM embeddings), " +
        "v0 AS (SELECT list_transform(range(1, 65), j -> 0.125) AS v), " +
        oPcaIter(1) + ", " + oPcaIter(2) + ", " + oPcaIter(3) + " " +
        "SELECT CAST(floor(nrm + 0.000001) AS BIGINT) AS norm_fp, " +
        (1 to 8).map(i =>
          s"CAST(floor(v[$i] * 100000000.0 + 0.000000001) AS BIGINT) AS v${i}_fp")
          .mkString(", ") +
        " FROM v3")),

    // Distributed quality-classifier training — full-batch GD logistic
    // regression on the embeddings (y = label >= 5), the fastText-style
    // "train a filter, then gate the corpus" loop. All cross-row math
    // is integer sums over quantized values (deterministic under any
    // partitioning; the oracle replays training bit-for-bit), weights
    // live on the driver between iterations (treeAggregate shape: one
    // 64-column map-side-combined agg per iteration, no wide shuffle).
    Op("llm_logreg_train",
      (s, d) => {
        val (w, n, nCorrect) = graft.api.Models.logregTrainFor(s, d)
        import s.implicits._
        def fp(x: Double): Long =
          math.floor(x * 100000000.0 + 0.000000001).toLong
        Seq((n, nCorrect, nCorrect.toDouble / n,
            fp(w(0)), fp(w(1)), fp(w(2)), fp(w(3)),
            fp(w(4)), fp(w(5)), fp(w(6)), fp(w(7))))
          .toDF("n", "n_correct", "acc",
            "w1_fp", "w2_fp", "w3_fp", "w4_fp",
            "w5_fp", "w6_fp", "w7_fp", "w8_fp")
      },
      Some(oLogregChain + ", " +
        oLogregMS(4, "w3") + ", " +
        "acc_t AS (SELECT CAST(SUM(CASE WHEN (s_fp >= 500000) = (y = 1) THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_correct FROM s4) " +
        "SELECT n, n_correct, CAST(n_correct AS DOUBLE) / n AS acc, " +
        (1 to 8).map(i =>
          s"CAST(floor(w[$i] * 100000000.0 + 0.000000001) AS BIGINT) AS w${i}_fp")
          .mkString(", ") +
        " FROM nn, acc_t, w3")),

    // The full train-then-gate loop: the classifier llm_logreg_train
    // fits is applied back to EVERY vector (same shared scoring
    // expression — apply cannot drift from train), and the gate report
    // shows per-label pass rates: which strata survive the quality
    // filter before it runs over 100 TB. Scoring is one broadcast-free
    // map stage (weights travel as 64 literals inside the codegen'd
    // expression); the report is one tiny agg.
    Op("llm_quality_classifier_gate",
      (s, d) => {
        val emb = T.t(s, d, "embeddings")
        val (w, _, _) = graft.api.Models.logregTrainFor(s, d)
        emb.select(col("label"), graft.api.Models.xq.as("xq"))
          .withColumn("s_fp", graft.api.Models.sigmoidFp(w))
          .groupBy("label")
          .agg(count(lit(1)).as("n"),
            sum(when(col("s_fp") >= 500000L, 1L).otherwise(0L)).as("n_pass"))
          .withColumn("pass_rate", expr("CAST(n_pass AS DOUBLE) / n"))
          .orderBy("label")
      },
      Some(oLogregChain + ", " +
        "e2 AS (SELECT label, list_transform(embedding, " +
        "v -> CAST(floor(CAST(v AS DOUBLE) * 10000) AS BIGINT)) AS xq FROM embeddings), " +
        "sc AS (SELECT label, CAST(floor(1.0 / (1.0 + exp(-greatest(-30.0, least(30.0, m)))) " +
        "* 1000000.0 + 0.000000001) AS BIGINT) AS s_fp FROM " +
        "(SELECT label, list_reduce(list_prepend(0.0, list_transform(range(1, 65), " +
        "j -> w[j] * CAST(xq[j] AS DOUBLE))), (a, b) -> a + b) AS m FROM e2, w3)) " +
        "SELECT label, count(*) AS n, " +
        "CAST(SUM(CASE WHEN s_fp >= 500000 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass, " +
        "CAST(SUM(CASE WHEN s_fp >= 500000 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS pass_rate " +
        "FROM sc GROUP BY label ORDER BY label")),



    // Per-dimension moment profile of the embedding space — the
    // mean/variance table whitening consumes and the fastest detector
    // of a dead or exploding dimension before an index build. Exact
    // integer sums of quantized values (order-independent), then the
    // identical IEEE mean/var/std expression trees on both engines.
    // One aggregation over 64 posexplode keys; partial aggs keep the
    // shuffle at 64 rows x partitions regardless of corpus size.
    Op("llm_embedding_dim_stats",
      (s, d) => T.t(s, d, "embeddings")
        .select(posexplode(expr(
          "transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * 10000) AS BIGINT))"))
          .as(Seq("pos0", "xq")))
        .groupBy(expr("CAST(pos0 + 1 AS BIGINT)").as("pos"))
        .agg(count(lit(1)).as("n"), sum("xq").as("sx"),
          sum(expr("xq * xq")).as("sxx"))
        .withColumn("mean_fp", expr(
          "CAST(floor(CAST(sx AS DOUBLE) / n / 10000.0 * 1000000 + 0.000001) AS BIGINT)"))
        .withColumn("var_fp", expr(
          "CAST(floor((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) " +
            "/ (100000000.0 * n) * 1000000 + 0.000001) AS BIGINT)"))
        .select("pos", "n", "mean_fp", "var_fp")
        .orderBy("pos"),
      Some("WITH e AS (SELECT list_transform(embedding, " +
        "v -> CAST(floor(CAST(v AS DOUBLE) * 10000) AS BIGINT)) AS xq FROM embeddings), " +
        "m AS (SELECT j AS pos, count(*) AS n, CAST(SUM(xq[j]) AS BIGINT) AS sx, " +
        "CAST(SUM(xq[j] * xq[j]) AS BIGINT) AS sxx FROM e, range(1, 65) t(j) GROUP BY j) " +
        "SELECT pos, n, " +
        "CAST(floor(CAST(sx AS DOUBLE) / n / 10000.0 * 1000000 + 0.000001) AS BIGINT) AS mean_fp, " +
        "CAST(floor((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) " +
        "/ (100000000.0 * n) * 1000000 + 0.000001) AS BIGINT) AS var_fp " +
        "FROM m ORDER BY pos")),

    // MEASURED MinHash recall per jaccard decile — the empirical
    // S-curve to hold against llm_minhash_band_tuning's predicted one
    // (and the counterpart of llm_lsh_precision_audit): of the exact
    // inverted-index jaccard pairs (truth), which fraction did the
    // banded MinHash candidate path recover? Composes the two existing
    // registry generators directly, so the audit measures exactly the
    // production pipelines; one left join + one agg on top.
    Op("llm_minhash_recall",
      (s, d) => {
        val truth = LlmOps.jaccardPairs(s, d)
        val cand = graft.Registry.byKey("llm_minhash_verified").query(s, d)
          .select(col("d1"), col("d2"), lit(1L).as("hit"))
        truth.join(cand, Seq("d1", "d2"), "left")
          .select(expr("least(9, CAST(floor(jaccard * 10) AS BIGINT))").as("bucket"),
            coalesce(col("hit"), lit(0L)).as("hit"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_true"), sum("hit").as("n_hit"))
          .withColumn("recall_fp", expr("n_hit * 1000000 div n_true"))
          .orderBy("bucket")
      },
      Some("WITH " + LlmOps.oJaccardPairs + ", " + Round4.oMinhashVerifiedCtes + ", " +
        "jj AS (SELECT p.jaccard, CASE WHEN m.d1 IS NOT NULL THEN 1 ELSE 0 END AS hit " +
        "FROM pairs p LEFT JOIN mvpairs m ON m.d1 = p.d1 AND m.d2 = p.d2) " +
        "SELECT least(9, CAST(floor(jaccard * 10) AS BIGINT)) AS bucket, count(*) AS n_true, " +
        "CAST(SUM(hit) AS BIGINT) AS n_hit, " +
        "(CAST(SUM(hit) AS BIGINT) * 1000000) // count(*) AS recall_fp " +
        "FROM jj GROUP BY 1 ORDER BY bucket")),

    // PageRank centrality over the MinHash-verified near-dup graph:
    // the canonical-document selector — inside a dup cluster the
    // highest-centrality doc is the best representative to KEEP (most
    // connected to its variants), a step beyond min-id. Pure
    // fixed-point integer PageRank (GraphOps.pagerankFp: 1e6-unit
    // ranks, damping as exact floor division) — no floating point, so
    // bit-identical under any partitioning. Reuses the registry's
    // verified-pair generator directly; top-20 by centrality.
    Op("llm_pagerank_centrality",
      (s, d) => {
        val pairs = graft.Registry.byKey("llm_minhash_verified").query(s, d)
          .select("d1", "d2").persist()
        val pr = GraphOps.pagerankFp(pairs, iters = 3)
        pairs.unpersist()
        pr.select(col("id").as("doc_id"), col("pr_fp"), col("deg"))
          .orderBy(desc("pr_fp"), col("doc_id")).limit(20)
      },
      Some("WITH " + Round4.oMinhashVerifiedCtes + ", " +
        "edges AS (SELECT d1, d2 FROM mvpairs UNION ALL SELECT d2, d1 FROM mvpairs), " +
        "dg AS (SELECT d1 AS id, count(*) AS deg FROM edges GROUP BY d1), " +
        "r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS r FROM dg), " +
        (1 to 3).map(k =>
          s"r$k AS (SELECT e.d2 AS id, 150000 + CAST(SUM((r.r * 85) // (100 * g.deg)) AS BIGINT) AS r " +
          s"FROM r${k - 1} r JOIN edges e ON e.d1 = r.id JOIN dg g ON g.id = r.id GROUP BY e.d2)")
          .mkString(", ") + " " +
        "SELECT r3.id AS doc_id, r3.r AS pr_fp, g.deg AS deg FROM r3 " +
        "JOIN dg g ON g.id = r3.id ORDER BY pr_fp DESC, doc_id LIMIT 20")),

    // Whitening self-check: standardize every vector with the
    // per-dimension moments (the llm_embedding_dim_stats table as
    // codegen literals — no join), re-profile the WHITENED space and
    // report post-whitening moments, which must sit at mean ~0 /
    // var ~1e6 fixed-point. The composition a pipeline runs to prove
    // its preprocessing actually standardized before an index build.
    // Whitened values re-quantize to integers so the second-pass
    // moment sums stay order-independent; zero-variance (dead) dims
    // guard to sd=1 on both engines. Two scans (stats + re-profile).
    Op("llm_embedding_whiten_check",
      (s, d) => {
        import s.implicits._
        val base = T.t(s, d, "embeddings")
          .select(expr("transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * 10000) AS BIGINT))").as("xq"))
        val stats = base
          .select(posexplode(col("xq")).as(Seq("pos0", "x")))
          .groupBy(expr("CAST(pos0 + 1 AS BIGINT)").as("pos"))
          .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum(expr("x * x")).as("sxx"))
          .orderBy("pos").collect()
        if (stats.isEmpty) {
          Seq.empty[(Long, Long, Long)].toDF("pos", "post_mean_fp", "post_var_fp")
        } else {
          val n = stats.head.getLong(1)
          val m = stats.map(r => r.getLong(2).toDouble / n)
          val sd = stats.map { r =>
            val v = (r.getLong(3).toDouble - r.getLong(2).toDouble * r.getLong(2).toDouble / n) / n
            val s0 = math.sqrt(v)
            if (s0 > 0) s0 else 1.0
          }
          // literals straight into the Column tree (exact doubles, no
          // string round-trip, ONE projection instead of 128 chained
          // withColumn analysis passes)
          def wq(j: Int) =
            floor((element_at(col("xq"), j).cast("double") - lit(m(j - 1)))
              / lit(sd(j - 1)) * lit(10000) + lit(0.000001)).cast("long")
          val g = base
            .agg(sum(wq(1)).as("s1"), ((2 to 64).map(j => sum(wq(j)).as(s"s$j")) ++
              (1 to 64).map(j => sum(wq(j) * wq(j)).as(s"q$j"))): _*)
            .head()
          val rows = (1 to 64).map { j =>
            val swq = g.getLong(j - 1)
            val swq2 = g.getLong(64 + j - 1)
            val meanFp = math.floor(swq.toDouble / n / 10000.0 * 1000000 + 0.000001).toLong
            val varFp = math.floor((swq2.toDouble - swq.toDouble * swq.toDouble / n)
              / (100000000.0 * n) * 1000000 + 0.000001).toLong
            (j.toLong, meanFp, varFp)
          }
          rows.toDF("pos", "post_mean_fp", "post_var_fp").orderBy("pos")
        }
      },
      Some("WITH e AS (SELECT list_transform(embedding, " +
        "v -> CAST(floor(CAST(v AS DOUBLE) * 10000) AS BIGINT)) AS xq FROM embeddings), " +
        "st0 AS (SELECT j AS pos, count(*) AS n, CAST(SUM(xq[j]) AS BIGINT) AS sx, " +
        "CAST(SUM(xq[j] * xq[j]) AS BIGINT) AS sxx FROM e, range(1, 65) t(j) GROUP BY j), " +
        "st AS (SELECT pos, n, CAST(sx AS DOUBLE) / n AS m, " +
        "CASE WHEN sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / n) > 0 " +
        "THEN sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / n) " +
        "ELSE 1.0 END AS sd FROM st0), " +
        "w AS (SELECT st.pos AS pos, st.n AS n, " +
        "CAST(floor((CAST(xq[j] AS DOUBLE) - m) / sd * 10000 + 0.000001) AS BIGINT) AS wq " +
        "FROM e, range(1, 65) r(j) JOIN st ON st.pos = j), " +
        "p AS (SELECT pos, max(n) AS n, CAST(SUM(wq) AS BIGINT) AS swq, " +
        "CAST(SUM(wq * wq) AS BIGINT) AS swq2 FROM w GROUP BY pos) " +
        "SELECT pos, " +
        "CAST(floor(CAST(swq AS DOUBLE) / n / 10000.0 * 1000000 + 0.000001) AS BIGINT) AS post_mean_fp, " +
        "CAST(floor((CAST(swq2 AS DOUBLE) - CAST(swq AS DOUBLE) * CAST(swq AS DOUBLE) / n) " +
        "/ (100000000.0 * n) * 1000000 + 0.000001) AS BIGINT) AS post_var_fp " +
        "FROM p ORDER BY pos")),

    // Calibration audit of the trained classifier: scores bucketed
    // into deciles, each with count, mean predicted probability (exact
    // integer mean of the quantized score) and the empirical positive
    // rate — the reliability table read before using the scores as
    // sampling weights (a miscalibrated filter silently reweights the
    // corpus). Reuses the shared scoring expression; one agg.
    Op("llm_classifier_calibration",
      (s, d) => {
        val emb = T.t(s, d, "embeddings")
        val (w, _, _) = graft.api.Models.logregTrainFor(s, d)
        emb.select(expr("CASE WHEN label >= 5 THEN 1L ELSE 0L END").as("y"),
            graft.api.Models.xq.as("xq"))
          .withColumn("s_fp", graft.api.Models.sigmoidFp(w))
          .withColumn("bin", expr("least(CAST(9 AS BIGINT), s_fp div 100000)"))
          .groupBy("bin")
          .agg(count(lit(1)).as("n"),
            expr("sum(s_fp) div count(1)").as("mean_score_fp"),
            sum("y").as("n_pos"))
          .withColumn("pos_rate", expr("CAST(n_pos AS DOUBLE) / n"))
          .orderBy("bin")
      },
      Some(oLogregChain + ", " +
        "sc AS (SELECT y, CAST(floor(1.0 / (1.0 + exp(-greatest(-30.0, least(30.0, m)))) " +
        "* 1000000.0 + 0.000000001) AS BIGINT) AS s_fp FROM " +
        "(SELECT y, list_reduce(list_prepend(0.0, list_transform(range(1, 65), " +
        "j -> w[j] * CAST(xq[j] AS DOUBLE))), (a, b) -> a + b) AS m FROM e, w3)) " +
        "SELECT least(CAST(9 AS BIGINT), s_fp // 100000) AS bin, count(*) AS n, " +
        "CAST(SUM(s_fp) AS BIGINT) // count(*) AS mean_score_fp, " +
        "CAST(SUM(y) AS BIGINT) AS n_pos, " +
        "CAST(SUM(y) AS DOUBLE) / count(*) AS pos_rate " +
        "FROM sc GROUP BY 1 ORDER BY bin")),

    // Operating-point sweep for the same classifier: TP/FP/TN/FN and
    // exact precision/recall at five candidate thresholds — the table
    // that picks the gate threshold for a target yield BEFORE the
    // filter runs over the corpus. One scan, one agg per nothing: the
    // thresholds are a 5-row broadcast cross join.
    Op("llm_classifier_roc",
      (s, d) => {
        val emb = T.t(s, d, "embeddings")
        val (w, _, _) = graft.api.Models.logregTrainFor(s, d)
        import s.implicits._
        val th = Seq(300000L, 400000L, 500000L, 600000L, 700000L).toDF("th_fp")
        emb.select(expr("CASE WHEN label >= 5 THEN 1L ELSE 0L END").as("y"),
            graft.api.Models.xq.as("xq"))
          .withColumn("s_fp", graft.api.Models.sigmoidFp(w))
          .crossJoin(broadcast(th))
          .groupBy("th_fp")
          .agg(sum(when(col("s_fp") >= col("th_fp") && col("y") === 1L, 1L).otherwise(0L)).as("tp"),
            sum(when(col("s_fp") >= col("th_fp") && col("y") === 0L, 1L).otherwise(0L)).as("fp"),
            sum(when(col("s_fp") < col("th_fp") && col("y") === 0L, 1L).otherwise(0L)).as("tn"),
            sum(when(col("s_fp") < col("th_fp") && col("y") === 1L, 1L).otherwise(0L)).as("fn"))
          .withColumn("precision_fp", expr("CASE WHEN tp + fp = 0 THEN -1 ELSE tp * 1000000 div (tp + fp) END"))
          .withColumn("recall_fp", expr("CASE WHEN tp + fn = 0 THEN -1 ELSE tp * 1000000 div (tp + fn) END"))
          .orderBy("th_fp")
      },
      Some(oLogregChain + ", " +
        "sc AS (SELECT y, CAST(floor(1.0 / (1.0 + exp(-greatest(-30.0, least(30.0, m)))) " +
        "* 1000000.0 + 0.000000001) AS BIGINT) AS s_fp FROM " +
        "(SELECT y, list_reduce(list_prepend(0.0, list_transform(range(1, 65), " +
        "j -> w[j] * CAST(xq[j] AS DOUBLE))), (a, b) -> a + b) AS m FROM e, w3)), " +
        "th AS (SELECT CAST(th_fp AS BIGINT) AS th_fp FROM (VALUES (300000), (400000), " +
        "(500000), (600000), (700000)) v(th_fp)), " +
        "c AS (SELECT th_fp, " +
        "CAST(SUM(CASE WHEN s_fp >= th_fp AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp, " +
        "CAST(SUM(CASE WHEN s_fp >= th_fp AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp, " +
        "CAST(SUM(CASE WHEN s_fp < th_fp AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn, " +
        "CAST(SUM(CASE WHEN s_fp < th_fp AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn " +
        "FROM sc, th GROUP BY th_fp) " +
        "SELECT th_fp, tp, fp, tn, fn, " +
        "CASE WHEN tp + fp = 0 THEN -1 ELSE (tp * 1000000) // (tp + fp) END AS precision_fp, " +
        "CASE WHEN tp + fn = 0 THEN -1 ELSE (tp * 1000000) // (tp + fn) END AS recall_fp " +
        "FROM c ORDER BY th_fp")),

    // Clustering-quality audit over the TRAINED k-means (same
    // AnnIndex.train the IVF index uses, so this audits the production
    // centroids): per-cluster size, total and mean squared distance to
    // the assigned centroid (the inertia a pipeline tracks to decide
    // k / whether to re-train before building the next IVF index).
    // Distances quantize per row (floor(d2 * 1e4)) so the cross-row
    // sums are exact integers; one broadcast join + one agg.
    Op("llm_kmeans_inertia",
      (s, d) => {
        val emb = T.t(s, d, "embeddings")
        val cent = graft.api.AnnIndex.trainFor(s, d, k = 10, iters = 3)
        graft.api.AnnIndex.assign(emb, cent)
          .join(broadcast(cent.select("c_id", "c_vec")), "c_id")
          .withColumn("d2", expr(graft.api.AnnIndex.d2("embedding")))
          .withColumn("d2_fp", expr("CAST(floor(d2 * 10000 + 0.000001) AS BIGINT)"))
          .groupBy("c_id")
          .agg(count(lit(1)).as("n"), sum("d2_fp").as("inertia_fp"))
          .withColumn("avg_d2_fp", expr("inertia_fp div n"))
          .orderBy("c_id")
      },
      Some(LlmOps.oKmeansTrainedPrefix + ", " +
        "a4 AS (SELECT e.vec_id, c.c_id, " +
        "list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(range(1, 65), k -> " +
        "(CAST(e.embedding[k] AS DOUBLE) - c.c_vec[k]) * " +
        "(CAST(e.embedding[k] AS DOUBLE) - c.c_vec[k]))), (x, y) -> x + y) AS d2 " +
        "FROM embeddings e, c3 c), " +
        "b4 AS (SELECT c_id, d2, row_number() OVER (PARTITION BY vec_id ORDER BY d2, c_id) AS rn FROM a4), " +
        "w AS (SELECT c_id, CAST(floor(d2 * 10000 + 0.000001) AS BIGINT) AS d2_fp FROM b4 WHERE rn = 1) " +
        "SELECT c_id, count(*) AS n, CAST(SUM(d2_fp) AS BIGINT) AS inertia_fp, " +
        "CAST(SUM(d2_fp) AS BIGINT) // count(*) AS avg_d2_fp " +
        "FROM w GROUP BY c_id ORDER BY c_id")),

    // Order-independent content digest per language slice — the check a
    // migration (engine A -> engine B, or one 100-TB copy vs another)
    // runs to prove the corpora are IDENTICAL without sorting or
    // co-locating either side. Two commutative digests over a 60-bit
    // md5-derived row hash: bit_xor (overflow-free at any row count)
    // and a modular sum (mod 1e8+7 keeps SUM under 2^63 past 10^10
    // rows). One hash-agg, no shuffle wider than the lang key; any
    // row-order / partitioning / file-layout difference cancels out.
    Op("core_row_checksum",
      (s, d) => rowDigest(T.t(s, d, "documents")).orderBy("lang"),
      Some("WITH h AS (SELECT lang, " +
        "CAST(concat('0x', substr(md5(concat_ws('|', CAST(doc_id AS VARCHAR), text)), 1, 15)) AS BIGINT) AS h " +
        "FROM documents) " +
        "SELECT lang, count(*) AS n_rows, bit_xor(h) AS digest_xor, " +
        "CAST(SUM(h % 100000007) AS BIGINT) AS digest_sum " +
        "FROM h GROUP BY lang ORDER BY lang")),

    // Z-order clustering: interleave the bits of two binned dimensions
    // (customer, total price) into one Morton key, so ONE range
    // partitioning / sorted write clusters the data in BOTH dimensions
    // at once — parquet min/max row-group stats then skip files for
    // predicates on either column (the Delta/Iceberg OPTIMIZE ZORDER
    // idea, done with plain integer arithmetic Catalyst folds into
    // codegen). The report aggregates per z-range bucket and shows the
    // locality: within a bucket both dimension spans stay bounded
    // (high z-bits pin the high bits of BOTH inputs), which is exactly
    // why min/max pruning works on either predicate after clustering.
    Op("core_zorder_cluster",
      (s, d) => {
        val pbE = "CAST(least(15, floor(o_totalprice / 31250)) AS BIGINT)"
        val cbE = "CAST(least(15, floor(o_custkey / 10)) AS BIGINT)"
        val z = (0 to 3).map(i =>
          s"(CAST(floor(cb / ${1 << i}) AS BIGINT) % 2) * ${1L << (2 * i)} + " +
          s"(CAST(floor(pb / ${1 << i}) AS BIGINT) % 2) * ${1L << (2 * i + 1)}")
          .mkString(" + ")
        T.t(s, d, "orders")
          .select(expr(pbE).as("pb"), expr(cbE).as("cb"))
          .withColumn("z", expr(z))
          .groupBy(expr("CAST(floor(z / 32) AS BIGINT)").as("z_bucket"))
          .agg(count(lit(1)).as("n"),
            min("pb").as("min_pb"), max("pb").as("max_pb"),
            min("cb").as("min_cb"), max("cb").as("max_cb"))
          .withColumn("pb_span", col("max_pb") - col("min_pb"))
          .withColumn("cb_span", col("max_cb") - col("min_cb"))
          .orderBy("z_bucket")
      },
      Some {
        val z = (0 to 3).map(i =>
          s"(CAST(floor(cb / ${1 << i}) AS BIGINT) % 2) * ${1L << (2 * i)} + " +
          s"(CAST(floor(pb / ${1 << i}) AS BIGINT) % 2) * ${1L << (2 * i + 1)}")
          .mkString(" + ")
        "WITH b AS (SELECT CAST(least(15, floor(o_totalprice / 31250)) AS BIGINT) AS pb, " +
          "CAST(least(15, floor(o_custkey / 10)) AS BIGINT) AS cb FROM orders), " +
          s"zt AS (SELECT pb, cb, $z AS z FROM b), " +
          "g AS (SELECT CAST(floor(z / 32) AS BIGINT) AS z_bucket, count(*) AS n, " +
          "min(pb) AS min_pb, max(pb) AS max_pb, min(cb) AS min_cb, max(cb) AS max_cb " +
          "FROM zt GROUP BY 1) " +
          "SELECT z_bucket, n, min_pb, max_pb, min_cb, max_cb, " +
          "max_pb - min_pb AS pb_span, max_cb - min_cb AS cb_span " +
          "FROM g ORDER BY z_bucket"
      }),

    // MinHash LSH design-point table: for every (bands, rows) split of
    // the 128-perm signature, the S-curve threshold (1/b)^(1/r) and the
    // candidate probability 1-(1-s^r)^b at similarity 0.5/0.7/0.8/0.9 —
    // the table read BEFORE committing a 100-TB dedup run to a banding
    // scheme (llm_dedup_minhash uses b=32, r=4: threshold ~0.42, which
    // this table shows catches s=0.7 pairs with p~0.999 while passing
    // only ~7% of s=0.3 noise). Fixed-point floor(x*1000 + eps) keeps
    // the doubles binary-comparable across engines.
    Op("llm_minhash_band_tuning",
      (s, d) => {
        import s.implicits._
        def p(sim: Double) =
          s"CAST(floor((1.0 - pow(1.0 - pow($sim, CAST(r AS DOUBLE)), CAST(b AS DOUBLE))) * 1000 + 0.000001) AS BIGINT)"
        Seq(4L, 8L, 16L, 32L, 64L).toDF("b")
          .withColumn("r", expr("CAST(128 / b AS BIGINT)"))
          .select(col("b"), col("r"),
            expr("CAST(floor(pow(1.0 / CAST(b AS DOUBLE), 1.0 / CAST(r AS DOUBLE)) * 1000 + 0.000001) AS BIGINT)")
              .as("threshold_fp"),
            expr(p(0.5)).as("p50_fp"), expr(p(0.7)).as("p70_fp"),
            expr(p(0.8)).as("p80_fp"), expr(p(0.9)).as("p90_fp"))
          .orderBy("b")
      },
      Some {
        def p(sim: Double) =
          s"CAST(floor((1.0 - pow(1.0 - pow($sim, CAST(r AS DOUBLE)), CAST(b AS DOUBLE))) * 1000 + 0.000001) AS BIGINT)"
        "WITH t AS (SELECT CAST(b AS BIGINT) AS b, CAST(128 / b AS BIGINT) AS r " +
          "FROM (VALUES (4), (8), (16), (32), (64)) AS v(b)) " +
          "SELECT b, r, " +
          "CAST(floor(pow(1.0 / CAST(b AS DOUBLE), 1.0 / CAST(r AS DOUBLE)) * 1000 + 0.000001) AS BIGINT) AS threshold_fp, " +
          s"${p(0.5)} AS p50_fp, ${p(0.7)} AS p70_fp, " +
          s"${p(0.8)} AS p80_fp, ${p(0.9)} AS p90_fp " +
          "FROM t ORDER BY b"
      }),

    // Heaps'-law vocabulary growth: distinct-token count as the corpus
    // grows decile by decile (in doc_id order) — the curve that says
    // whether more data still buys new vocabulary or the tokenizer's
    // OOV budget has saturated. Computed scalably as min(first_doc) per
    // token (one hash-agg over the token stream, no cumulative window):
    // the decile of a token's FIRST occurrence is where it increments
    // the running vocabulary, and the 10-row cumulative sum is a
    // broadcast theta self-join, so nothing global ever sits in one
    // partition.
    Op("llm_vocab_growth",
      (s, d) => {
        val docs = T.spread(T.t(s, d, "documents"))
        val maxId = docs.agg(max("doc_id").as("max_id"))
        val firstSeen = docs
          .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("token"))
          .groupBy("token").agg(min("doc_id").as("first_doc"))
        val perDecile = firstSeen.crossJoin(broadcast(maxId))
          .groupBy(expr("first_doc * 10 div (max_id + 1)").as("decile"))
          .agg(count(lit(1)).as("new_tokens"))
          // pin the <=10-row table: both sides of the cumulative
          // self-join would otherwise re-run the full token scan
          .localCheckpoint()
        perDecile.as("a")
          .join(broadcast(perDecile.as("b")), expr("b.decile <= a.decile"))
          .groupBy(col("a.decile").as("decile"), col("a.new_tokens").as("new_tokens"))
          .agg(sum("b.new_tokens").as("cum_vocab"))
          .orderBy("decile")
      },
      Some("WITH f AS (SELECT token, min(doc_id) AS first_doc FROM " +
        "(SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token FROM documents) GROUP BY token), " +
        "m AS (SELECT max(doc_id) AS max_id FROM documents), " +
        "pd AS (SELECT (first_doc * 10) // (max_id + 1) AS decile, count(*) AS new_tokens FROM f, m GROUP BY 1) " +
        "SELECT a.decile AS decile, a.new_tokens AS new_tokens, " +
        "CAST(SUM(b.new_tokens) AS BIGINT) AS cum_vocab " +
        "FROM pd a JOIN pd b ON b.decile <= a.decile " +
        "GROUP BY a.decile, a.new_tokens ORDER BY decile")),

    // Inverse-frequency class weights over the embedding labels — the
    // reweighting table a trainer loads to counter label imbalance
    // (weight_fp = total * 1e6 / (n_classes * n_label), exact integer
    // division on both engines). One tiny agg + broadcast; the heavy
    // table is touched once.
    Op("llm_class_weights",
      (s, d) => {
        val perLabel = T.t(s, d, "embeddings")
          .groupBy("label").agg(count(lit(1)).as("n"))
        val totals = perLabel.agg(
          sum("n").as("n_total"), count(lit(1)).as("n_classes"))
        perLabel.crossJoin(broadcast(totals))
          .select(col("label"), col("n"), col("n_total"), col("n_classes"),
            expr("n_total * 1000000 div (n_classes * n)").as("weight_fp"))
          .orderBy("label")
      },
      Some("WITH pl AS (SELECT label, count(*) AS n FROM embeddings GROUP BY label), " +
        "t AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total, count(*) AS n_classes FROM pl) " +
        "SELECT label, n, n_total, n_classes, " +
        "(n_total * 1000000) // (n_classes * n) AS weight_fp " +
        "FROM pl, t ORDER BY label")),
  )
}
