package graft.ops

import graft.{Op, Tables => T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 operator additions (SURVEY.md §2 F2 continuation).
  *
  * llm_dedup_incremental: dedup a NEW BATCH against the accumulated
  * corpus — the shape a daily ingestion pipeline actually runs. The
  * corpus is never self-joined; the increment is semi-joined against
  * corpus-side hash tables (exact normalized-text hash + word-set
  * signature), so the cost is |increment| lookups at any corpus size.
  *
  * llm_tokenize_apply: apply the top-1024 tokenizer vocabulary to every
  * document, producing the dense id sequence a training loader reads
  * (OOV -> 0). Vocabulary selection reuses the bounded top-N pattern
  * (TakeOrderedAndProject + broadcast rank self-join — no global
  * window); application is one broadcast join per token occurrence.
  */
object Round4 {

  /** The seeded 13-token contamination window (tokens no generated text
    * contains) — shared between llm_contamination_ngram's Spark side
    * and its oracle so both engines union the identical fixture rows.
    */
  private[graft] val contamWindow: String =
    (1 to 13).map(i => f"zzq$i%02d").mkString(" ")

  /** Shared MinHash-LSH candidate generation: the shingle+signature base
    * (persisted — caller unpersists) and the distinct band-bucket
    * candidate pairs. One definition for llm_minhash_verified and
    * llm_lsh_precision_audit, so the audit always measures exactly the
    * candidate generation the pipeline runs.
    */
  private def minhashCandidates(s: org.apache.spark.sql.SparkSession, d: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    graft.functions.ShingleHashes.register(s)
    val base = T.spread(T.t(s, d, "documents"))
      .where("size(split(lower(text), ' ')) >= 3")
      .select(col("doc_id"), expr("shingle_hashes(text)").as("ths"))
      .withColumn("sig", expr("minhash_sig(ths)"))
      .persist()
    val banded = base
      .select(col("doc_id"), explode(expr("sequence(0, 3)")).as("band"), col("sig"))
      .withColumn("band_sig",
        expr("array_join(transform(slice(sig, band * 4 + 1, 4), x -> CAST(x AS STRING)), ',')"))
      .select("doc_id", "band", "band_sig")
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.band_sig") === col("y.band_sig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2")).distinct()
    (base, cand)
  }

  /** DuckDB CTE list replaying the full MinHash-LSH + exact-jaccard
    * verify pipeline; terminal CTE is `mvpairs(d1, d2, jaccard)`.
    * Shared by llm_minhash_verified and the round-5 composed
    * llm_dedup_verdicts oracle.
    */
  private[ops] val oMinhashVerifiedCtes: String =
    "ths AS (SELECT doc_id, list_transform(" +
      "list_distinct(list_transform(range(1, len(toks) - 1), i -> concat(toks[i], ' ', toks[i + 1], ' ', toks[i + 2]))), " +
      "tok -> CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT)) AS ths " +
      "FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents) WHERE len(toks) >= 3), " +
      "sigs AS (SELECT doc_id, ths, list_reduce(list_prepend(" +
      "list_transform(range(0, 16), x -> CAST(2038074743 AS BIGINT)), " +
      "list_transform(ths, h -> list_transform(range(0, 16), i -> " +
      "([3,5,7,11,13,17,19,23,29,31,37,41,43,47,53,59][i + 1] * h + " +
      "[101,103,107,109,113,127,131,137,139,149,151,157,163,167,173,179][i + 1]) % 2038074743))), " +
      "(acc, v) -> list_transform(range(1, 17), i -> least(acc[i], v[i]))) AS sig FROM ths), " +
      "banded AS (SELECT doc_id, b.band AS band, " +
      "array_to_string(list_transform(list_slice(sig, band * 4 + 1, band * 4 + 4), x -> CAST(x AS VARCHAR)), ',') AS band_sig " +
      "FROM sigs, (SELECT unnest(range(0, 4)) AS band) b), " +
      "cand AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2 FROM banded x JOIN banded y " +
      "ON x.band = y.band AND x.band_sig = y.band_sig AND x.doc_id < y.doc_id), " +
      "mvpairs AS (SELECT d1, d2, jaccard FROM (" +
      "SELECT d1, d2, CAST(len(list_intersect(a.ths, b.ths)) AS DOUBLE) / " +
      "(len(a.ths) + len(b.ths) - len(list_intersect(a.ths, b.ths))) AS jaccard " +
      "FROM cand JOIN ths a ON cand.d1 = a.doc_id JOIN ths b ON cand.d2 = b.doc_id) " +
      "WHERE jaccard >= 0.5)"

  /** Winnowing building blocks (k=3 token shingles, window w=8) —
    * shared by the operator and the guarantee property test, which
    * asserts the scheme's defining invariant (shared runs of >= k+w-1
    * tokens must share a selected fingerprint).
    */
  private[graft] val winnowHashExpr: String =
    "transform(sequence(1, size(toks) - 2), i -> " +
      "CAST(conv(substring(md5(concat(element_at(toks, i), ' ', " +
      "element_at(toks, i + 1), ' ', element_at(toks, i + 2))), 1, 8), 16, 10) AS BIGINT))"
  private[graft] val winnowFpsExpr: String =
    "array_distinct(transform(sequence(1, size(hs) - 7), j -> array_min(slice(hs, j, 8))))"

  val ops: Seq[Op] = Seq(

    // The corpus appears only as keyed lookup tables (one row per
    // distinct hash/signature) — at 100 TB these are the DedupIndex you
    // persist between runs; the increment joins against them and the
    // corpus never self-joins. The keying and verdict logic live in
    // graft.api.DedupIndex so the one-shot operator and the persistent
    // index can never drift (Round4Spec pins them equal).
    Op("llm_dedup_incremental",
      (s, d) => {
        val docs = T.t(s, d, "documents")
        graft.api.DedupIndex.verdicts(
            docs.where("doc_id % 5 = 0"),                            // today's batch
            graft.api.DedupIndex.keyed(docs.where("doc_id % 5 <> 0"))) // accumulated
          .orderBy("doc_id")
      },
      // oracle groups on the normalized text itself (same partition as
      // the collision-free sha2, which DuckDB 1.0 lacks)
      Some("WITH c AS (SELECT doc_id, lower(trim(text)) AS eh, " +
        "array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' ') AS sig " +
        "FROM documents WHERE doc_id % 5 <> 0), " +
        "i AS (SELECT doc_id, lower(trim(text)) AS eh, " +
        "array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' ') AS sig " +
        "FROM documents WHERE doc_id % 5 = 0), " +
        "e AS (SELECT eh, min(doc_id) AS exact_match FROM c GROUP BY eh), " +
        "n AS (SELECT sig, min(doc_id) AS near_match FROM c GROUP BY sig) " +
        "SELECT i.doc_id, CASE WHEN e.exact_match IS NOT NULL THEN 'exact' " +
        "WHEN n.near_match IS NOT NULL THEN 'near' ELSE 'keep' END AS verdict, " +
        "coalesce(e.exact_match, n.near_match) AS match_id " +
        "FROM i LEFT JOIN e USING (eh) LEFT JOIN n USING (sig) ORDER BY i.doc_id")),

    Op("llm_tokenize_apply",
      (s, d) => {
        val docs = T.t(s, d, "documents")
        val freq = docs
          .select(explode(split(lower(col("text")), " ")).as("token"))
          .groupBy("token").agg(count(lit(1)).as("freq"))
        // bounded top-1024 vocabulary with dense ids — TakeOrderedAndProject
        // + rank-by-count broadcast self-join, as in llm_tokenizer_vocab
        val top = freq.orderBy(desc("freq"), col("token")).limit(1024)
        val vocab = top.as("a")
          .join(broadcast(top.as("b")), expr(
            "b.freq > a.freq OR (b.freq = a.freq AND b.token <= a.token)"))
          .groupBy(col("a.token").as("token"))
          .agg(count(lit(1)).cast("int").as("id"))
        docs
          .select(col("doc_id"),
            posexplode(split(lower(col("text")), " ")).as(Seq("pos", "token")))
          .join(broadcast(vocab), Seq("token"), "left")
          .withColumn("id", coalesce(col("id"), lit(0)))
          .groupBy("doc_id")
          .agg(count(lit(1)).cast("int").as("n_tokens"),
            sum(when(col("id") === 0, 1L).otherwise(0L)).as("n_oov"),
            expr("array_join(transform(array_sort(collect_list(struct(pos, id))), " +
              "x -> CAST(x.id AS STRING)), ',')").as("ids"))
          .orderBy("doc_id")
      },
      Some("WITH freq AS (SELECT token, count(*) AS freq FROM " +
        "(SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents) GROUP BY token), " +
        "vocab AS (SELECT token, CAST(row_number() OVER (ORDER BY freq DESC, token) AS INTEGER) AS id " +
        "FROM freq ORDER BY freq DESC, token LIMIT 1024), " +
        "tk AS (SELECT doc_id, unnest(list_transform(range(len(ts)), i -> {'pos': i, 'tok': ts[i + 1]})) AS u " +
        "FROM (SELECT doc_id, string_split(lower(text), ' ') AS ts FROM documents)), " +
        "toks AS (SELECT doc_id, CAST(u.pos AS INTEGER) AS pos, u.tok AS token FROM tk) " +
        "SELECT doc_id, CAST(count(*) AS INTEGER) AS n_tokens, " +
        "CAST(SUM(CASE WHEN v.id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov, " +
        "array_to_string(array_agg(coalesce(v.id, 0) ORDER BY pos), ',') AS ids " +
        "FROM toks LEFT JOIN vocab v USING (token) " +
        "GROUP BY doc_id ORDER BY doc_id")),

    // Spark 4 VariantType path through semi-structured data: parse_json
    // into a Variant and extract typed fields with variant_get — the
    // binary-encoded, shreddable successor to string-walking
    // get_json_object (fn_json keeps the classic path for contrast).
    // Null props flow through as null variants.
    Op("fn_variant",
      (s, d) => T.events(s, d).select(
          col("event_id"),
          expr("variant_get(parse_json(props), '$.k', 'int')").as("k_int"),
          expr("variant_get(parse_json(props), '$.k', 'int') * 2").as("k_doubled"),
          expr("variant_get(parse_json(props), '$.k', 'int') IS NOT NULL").as("has_k"))
        .orderBy("event_id"),
      Some("SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int, " +
        "CAST(json_extract_string(props, '$.k') AS INTEGER) * 2 AS k_doubled, " +
        "CAST(json_extract_string(props, '$.k') AS INTEGER) IS NOT NULL AS has_k " +
        "FROM events ORDER BY event_id")),

    // Gopher quality rules (Rae et al. 2021, published thresholds): word
    // count in [50, 100k], mean word length in [3, 10], symbol-to-word
    // ratio <= 0.1, >= 80% words containing an alphabetic char, >= 2
    // distinct canonical stopwords. Pure integer/exact-ratio arithmetic
    // end to end — one codegen pass, no shuffle before the final sort.
    Op("llm_gopher_quality",
      (s, d) => T.t(s, d, "documents")
        .withColumn("toks", split(col("text"), " "))
        .withColumn("n_words", expr("CAST(size(toks) AS BIGINT)"))
        .withColumn("mean_wl",
          expr("CAST(length(replace(text, ' ', '')) AS DOUBLE) / n_words"))
        .withColumn("n_sym", expr(
          "CAST(length(text) - length(replace(text, '#', '')) + " +
            "length(text) - length(replace(text, '…', '')) AS BIGINT)"))
        .withColumn("n_alpha", expr(
          "CAST(size(filter(toks, t -> t rlike '[a-zA-Z]')) AS BIGINT)"))
        .withColumn("n_stop", expr(
          "CAST(size(array_intersect(array_distinct(toks), " +
            "array('the', 'be', 'to', 'of', 'and', 'that', 'have', 'with'))) AS BIGINT)"))
        .select(col("doc_id"), col("n_words"), col("mean_wl"), col("n_stop"),
          expr("n_words BETWEEN 50 AND 100000").as("r_count"),
          expr("mean_wl BETWEEN 3 AND 10").as("r_wordlen"),
          expr("CAST(n_sym AS DOUBLE) / n_words <= 0.1").as("r_symbol"),
          expr("CAST(n_alpha AS DOUBLE) / n_words >= 0.8").as("r_alpha"),
          expr("n_stop >= 2").as("r_stop"),
          expr("n_words BETWEEN 50 AND 100000 AND mean_wl BETWEEN 3 AND 10 " +
            "AND CAST(n_sym AS DOUBLE) / n_words <= 0.1 " +
            "AND CAST(n_alpha AS DOUBLE) / n_words >= 0.8 AND n_stop >= 2").as("pass"))
        .orderBy("doc_id"),
      Some("WITH g AS (SELECT doc_id, string_split(text, ' ') AS toks, " +
        "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words, " +
        "CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' ')) AS mean_wl, " +
        "CAST(length(text) - length(replace(text, '#', '')) + " +
        "length(text) - length(replace(text, '…', '')) AS BIGINT) AS n_sym, " +
        "CAST(len(list_filter(string_split(text, ' '), t -> regexp_matches(t, '[a-zA-Z]'))) AS BIGINT) AS n_alpha, " +
        "CAST(len(list_intersect(list_distinct(string_split(text, ' ')), " +
        "['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with'])) AS BIGINT) AS n_stop FROM documents) " +
        "SELECT doc_id, n_words, mean_wl, n_stop, " +
        "n_words BETWEEN 50 AND 100000 AS r_count, " +
        "mean_wl BETWEEN 3 AND 10 AS r_wordlen, " +
        "CAST(n_sym AS DOUBLE) / n_words <= 0.1 AS r_symbol, " +
        "CAST(n_alpha AS DOUBLE) / n_words >= 0.8 AS r_alpha, " +
        "n_stop >= 2 AS r_stop, " +
        "n_words BETWEEN 50 AND 100000 AND mean_wl BETWEEN 3 AND 10 " +
        "AND CAST(n_sym AS DOUBLE) / n_words <= 0.1 " +
        "AND CAST(n_alpha AS DOUBLE) / n_words >= 0.8 AND n_stop >= 2 AS pass " +
        "FROM g ORDER BY doc_id")),

    // Mergeable quantile sketch (approx_percentile / Greenwald-Khanna):
    // the distributed path for percentiles when an exact sort-based
    // quantile is too expensive — partial sketches merge associatively,
    // so the exchange carries one sketch per mapper, not the rows.
    // Sketch estimates are engine-specific, so (as with the HLL op) the
    // oracle asserts a genuinely computed error-bound boolean: the
    // estimate must land within the value-range tolerance implied by the
    // sketch accuracy, against DuckDB's exact interpolated quantile.
    Op("rel_agg_approx_percentile",
      (s, d) => T.t(s, d, "lineitem").groupBy("l_returnflag")
        .agg(
          expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 5000)").as("ap"),
          expr("percentile(l_extendedprice, 0.5)").as("p50_exact"),
          expr("percentile(l_extendedprice, 0.95)").as("p95_exact"),
          min("l_extendedprice").as("lo"), max("l_extendedprice").as("hi"))
        .select(col("l_returnflag"),
          expr("floor(p50_exact * 100 + 0.000001) / 100").as("p50_exact"),
          expr("floor(p95_exact * 100 + 0.000001) / 100").as("p95_exact"),
          expr("abs(element_at(ap, 1) - p50_exact) <= (hi - lo) * 0.02").as("p50_within_bounds"),
          expr("abs(element_at(ap, 2) - p95_exact) <= (hi - lo) * 0.02").as("p95_within_bounds"))
        .orderBy("l_returnflag"),
      Some("SELECT l_returnflag, " +
        "floor(quantile_cont(l_extendedprice, 0.5) * 100 + 0.000001) / 100 AS p50_exact, " +
        "floor(quantile_cont(l_extendedprice, 0.95) * 100 + 0.000001) / 100 AS p95_exact, " +
        "true AS p50_within_bounds, true AS p95_within_bounds " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag")),

    // The full two-stage near-dup pipeline: LSH band buckets generate
    // candidates (cheap, recall-oriented), then EXACT jaccard over the
    // candidates' complete shingle sets decides (precision) — the
    // verify step llm_dedup_minhash's estimate skips. Output is fully
    // deterministic set arithmetic, so unlike the raw estimate it needs
    // no sketch-tolerance oracle. The quadratic term stays confined to
    // band buckets; the verify join touches only candidate pairs.
    Op("llm_minhash_verified",
      (s, d) => {
        // the checkpointed verified-pair set feeds FIVE consumers per
        // session (this op, llm_dedup_verdicts, the recall audit, and
        // the round-5 composed dedup ops) — build once per session
        val pairs = CorpusStats.memoDf(s, d, "minhashVerifiedPairs") {
          val (base, cand) = minhashCandidates(s, d)
          val out = cand
            .join(base.select(col("doc_id").as("d1"), col("ths").as("t1")), "d1")
            .join(base.select(col("doc_id").as("d2"), col("ths").as("t2")), "d2")
            .withColumn("n_inter", expr("size(array_intersect(t1, t2))"))
            .withColumn("jaccard",
              expr("CAST(n_inter AS DOUBLE) / (size(t1) + size(t2) - n_inter)"))
            .where("jaccard >= 0.5")
            .select("d1", "d2", "jaccard")
            .localCheckpoint()
          base.unpersist()
          out
        }
        pairs.orderBy("d1", "d2")
      },
      Some("WITH " + Round4.oMinhashVerifiedCtes +
        " SELECT d1, d2, jaccard FROM mvpairs ORDER BY d1, d2")),

    // Duplicate-group-size histogram: how many identical-text groups of
    // each multiplicity the corpus holds, plus the doc and share view —
    // the profile you read before choosing a dedup strategy, and exactly
    // the statistic the adaptive quotient pair-generators switch on.
    // Two bounded aggregations; nothing leaves the executors until the
    // per-multiplicity rollup.
    Op("llm_dup_histogram",
      (s, d) => {
        val docs = T.t(s, d, "documents")
        // (hash, length) group key: a collision now needs an equal-length
        // 64-bit match, negligible even at billions of docs per length
        // class (the oracle groups on the text itself)
        val groups = docs
          .groupBy(xxhash64(lower(trim(col("text")))).as("gid"),
            length(lower(trim(col("text")))).as("glen"))
          .agg(count(lit(1)).as("n_dup"))
        val total = docs.agg(count(lit(1)).as("total"))
        groups.groupBy("n_dup").agg(count(lit(1)).as("n_groups"))
          .crossJoin(broadcast(total))
          .select(col("n_dup"), col("n_groups"),
            (col("n_dup") * col("n_groups")).as("n_docs"),
            expr("floor(CAST(n_dup * n_groups AS DOUBLE) / total * 1000000) / 1000000")
              .as("share"))
          .orderBy("n_dup")
      },
      Some("WITH g AS (SELECT lower(trim(text)) AS k, count(*) AS n_dup " +
        "FROM documents GROUP BY k), " +
        "t AS (SELECT count(*) AS total FROM documents) " +
        "SELECT n_dup, count(*) AS n_groups, " +
        "CAST(n_dup * count(*) AS BIGINT) AS n_docs, " +
        "floor(CAST(n_dup * count(*) AS DOUBLE) / total * 1000000) / 1000000 AS share " +
        "FROM g, t GROUP BY n_dup, total ORDER BY n_dup")),

    // Skip-gram co-occurrence counts (word2vec / GloVe preprocessing):
    // top-25 (center, context) pairs within a +-2 token window. The
    // window join is an EQUI join on (doc_id, pos + offset) — offsets
    // explode to 4 rows per token, then hash-join back to positions —
    // so it scales as an ordinary shuffle join; no positional theta
    // join, no per-doc collect.
    Op("llm_skipgram_pairs",
      (s, d) => {
        val toks = T.spread(T.t(s, d, "documents"))
          .select(col("doc_id"),
            posexplode(split(lower(col("text")), " ")).as(Seq("pos", "w")))
        val ctx = toks
          .withColumn("off", explode(expr("array(-2, -1, 1, 2)")))
          .withColumn("cpos", col("pos") + col("off"))
          .select("doc_id", "cpos", "w")
        ctx.join(
            toks.select(col("doc_id"), col("pos").as("cpos"), col("w").as("context")),
            Seq("doc_id", "cpos"))
          .groupBy(col("w").as("center"), col("context"))
          .agg(count(lit(1)).as("n"))
          .orderBy(desc("n"), col("center"), col("context")).limit(25)
      },
      Some("WITH tk AS (SELECT doc_id, unnest(list_transform(range(len(ts)), " +
        "i -> {'pos': i, 'w': ts[i + 1]})) AS u " +
        "FROM (SELECT doc_id, string_split(lower(text), ' ') AS ts FROM documents)), " +
        "toks AS (SELECT doc_id, CAST(u.pos AS INTEGER) AS pos, u.w AS w FROM tk), " +
        "ctx AS (SELECT doc_id, pos + off AS cpos, w FROM toks, " +
        "(SELECT unnest([-2, -1, 1, 2]) AS off)) " +
        "SELECT c.w AS center, t.w AS context, count(*) AS n " +
        "FROM ctx c JOIN toks t ON c.doc_id = t.doc_id AND c.cpos = t.pos " +
        "GROUP BY center, context ORDER BY n DESC, center, context LIMIT 25")),

    // Ordered string aggregation via Spark 4's native listagg WITHIN
    // GROUP — the SQL-standard form (rel_agg_collect keeps the
    // collect_list + sort-before-render equivalent for contrast).
    Op("rel_agg_listagg",
      (s, d) => {
        T.t(s, d, "nation").createOrReplaceTempView("nation")
        s.sql("SELECT n_regionkey, " +
          "listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name) AS names, " +
          "count(*) AS n FROM nation GROUP BY n_regionkey ORDER BY n_regionkey")
      },
      Some("SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS names, " +
        "count(*) AS n FROM nation GROUP BY n_regionkey ORDER BY n_regionkey")),

    // LSH estimator-quality audit: on the band-generated candidate set,
    // how often does the 16-hash MinHash estimate (>= 0.5) agree with
    // the exact shingle-set jaccard (>= 0.5)? One row: candidate count,
    // hits under each judge, agreement, and the estimator's precision —
    // the audit that decides whether the cheap estimate can gate
    // pair-emission on its own or the exact verify stage stays. Both
    // judges are computed in the same candidate-confined pass.
    Op("llm_lsh_precision_audit",
      (s, d) => {
        val (base, cand) = minhashCandidates(s, d)
        val judged = cand
          .join(base.select(col("doc_id").as("d1"), col("ths").as("t1"), col("sig").as("s1")), "d1")
          .join(base.select(col("doc_id").as("d2"), col("ths").as("t2"), col("sig").as("s2")), "d2")
          .withColumn("est_hit", expr(
            "size(filter(sequence(1, 16), i -> element_at(s1, i) = element_at(s2, i))) >= 8"))
          .withColumn("n_inter", expr("size(array_intersect(t1, t2))"))
          .withColumn("exact_hit",
            expr("CAST(n_inter AS DOUBLE) / (size(t1) + size(t2) - n_inter) >= 0.5"))
        val out = judged.agg(
            count(lit(1)).as("n_candidates"),
            sum(when(col("est_hit"), 1L).otherwise(0L)).as("n_est_hits"),
            sum(when(col("exact_hit"), 1L).otherwise(0L)).as("n_exact_hits"),
            sum(when(col("est_hit") && col("exact_hit"), 1L).otherwise(0L)).as("n_agree"))
          .select(col("n_candidates"), col("n_est_hits"), col("n_exact_hits"), col("n_agree"),
            expr("CASE WHEN n_est_hits = 0 THEN CAST(NULL AS DOUBLE) " +
              "ELSE CAST(n_agree AS DOUBLE) / n_est_hits END").as("est_precision"))
          .localCheckpoint()
        base.unpersist()
        out
      },
      Some("WITH ths AS (SELECT doc_id, list_transform(" +
        "list_distinct(list_transform(range(1, len(toks) - 1), i -> concat(toks[i], ' ', toks[i + 1], ' ', toks[i + 2]))), " +
        "tok -> CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT)) AS ths " +
        "FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents) WHERE len(toks) >= 3), " +
        "sigs AS (SELECT doc_id, ths, list_reduce(list_prepend(" +
        "list_transform(range(0, 16), x -> CAST(2038074743 AS BIGINT)), " +
        "list_transform(ths, h -> list_transform(range(0, 16), i -> " +
        "([3,5,7,11,13,17,19,23,29,31,37,41,43,47,53,59][i + 1] * h + " +
        "[101,103,107,109,113,127,131,137,139,149,151,157,163,167,173,179][i + 1]) % 2038074743))), " +
        "(acc, v) -> list_transform(range(1, 17), i -> least(acc[i], v[i]))) AS sig FROM ths), " +
        "banded AS (SELECT doc_id, b.band AS band, " +
        "array_to_string(list_transform(list_slice(sig, band * 4 + 1, band * 4 + 4), x -> CAST(x AS VARCHAR)), ',') AS band_sig " +
        "FROM sigs, (SELECT unnest(range(0, 4)) AS band) b), " +
        "cand AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2 FROM banded x JOIN banded y " +
        "ON x.band = y.band AND x.band_sig = y.band_sig AND x.doc_id < y.doc_id), " +
        "j AS (SELECT " +
        "len(list_filter(range(1, 17), i -> a.sig[i] = b.sig[i])) >= 8 AS est_hit, " +
        "CAST(len(list_intersect(a.ths, b.ths)) AS DOUBLE) / " +
        "(len(a.ths) + len(b.ths) - len(list_intersect(a.ths, b.ths))) >= 0.5 AS exact_hit " +
        "FROM cand JOIN sigs a ON cand.d1 = a.doc_id JOIN sigs b ON cand.d2 = b.doc_id) " +
        "SELECT count(*) AS n_candidates, " +
        "CAST(SUM(CASE WHEN est_hit THEN 1 ELSE 0 END) AS BIGINT) AS n_est_hits, " +
        "CAST(SUM(CASE WHEN exact_hit THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_hits, " +
        "CAST(SUM(CASE WHEN est_hit AND exact_hit THEN 1 ELSE 0 END) AS BIGINT) AS n_agree, " +
        "CASE WHEN SUM(CASE WHEN est_hit THEN 1 ELSE 0 END) = 0 THEN CAST(NULL AS DOUBLE) " +
        "ELSE CAST(SUM(CASE WHEN est_hit AND exact_hit THEN 1 ELSE 0 END) AS DOUBLE) / " +
        "SUM(CASE WHEN est_hit THEN 1 ELSE 0 END) END AS est_precision FROM j")),

    // IVF recall audit over the same 32-probe panel as the LSH one: the
    // IVF index prunes the search to the probe's own cell (= label
    // partition, as llm_ann_ivf does), so its recall@5 against the exact
    // global top-5 measures how much the cell boundary costs. With the
    // LSH audit this completes the evaluation pair: every ANN index in
    // the engine has a recall distribution, not a single anecdote.
    Op("llm_ann_ivf_recall_audit",
      (s, d) => {
        graft.functions.CosineSimilarity.register(s)
        val emb = T.spread(T.t(s, d, "embeddings"))
        val probes = emb
          .withColumn("hkey", expr("substring(md5(CAST(vec_id AS STRING)), 1, 8)"))
          .orderBy("hkey", "vec_id").limit(32)
          .select(col("vec_id").as("p_id"), col("embedding").as("p_emb"),
            col("label").as("p_label"))
        val wTop = Window.partitionBy("p_id").orderBy(desc("sim"), col("vec_id"))
        val exact5 = emb.crossJoin(broadcast(probes))
          .where("vec_id <> p_id")
          .withColumn("sim", expr("cosine_sim(embedding, p_emb)"))
          .withColumn("rn", row_number().over(wTop)).where("rn <= 5")
          .select("p_id", "vec_id")
        val approx5 = emb.join(broadcast(probes),
            col("label") === col("p_label") && col("vec_id") =!= col("p_id"))
          .withColumn("sim", expr("cosine_sim(embedding, p_emb)"))
          .withColumn("rn", row_number().over(wTop)).where("rn <= 5")
          .select(col("p_id"), col("vec_id"), lit(1).as("hit"))
        exact5.join(approx5, Seq("p_id", "vec_id"), "left")
          .groupBy("p_id").agg(sum(coalesce(col("hit"), lit(0))).as("hits"))
          .agg(count(lit(1)).as("n_probes"), sum("hits").as("total_hits"),
            min("hits").as("min_hits"))
          .select(col("n_probes"), lit(5).as("k"),
            expr("CAST(total_hits AS DOUBLE) / (5 * n_probes)").as("mean_recall"),
            expr("CAST(min_hits AS DOUBLE) / 5").as("min_recall"))
      },
      Some("WITH p AS (SELECT vec_id AS p_id, embedding AS p_emb, label AS p_label " +
        "FROM embeddings ORDER BY substr(md5(CAST(vec_id AS VARCHAR)), 1, 8), vec_id LIMIT 32), " +
        "e AS (SELECT p_id, vec_id FROM (SELECT p.p_id, s.vec_id, " +
        s"row_number() OVER (PARTITION BY p.p_id ORDER BY ${Round3.oSimSql("s.embedding", "p_emb")} DESC, s.vec_id) AS rn " +
        "FROM embeddings s, p WHERE s.vec_id <> p.p_id) WHERE rn <= 5), " +
        "a AS (SELECT p_id, vec_id FROM (SELECT p.p_id, s.vec_id, " +
        s"row_number() OVER (PARTITION BY p.p_id ORDER BY ${Round3.oSimSql("s.embedding", "p_emb")} DESC, s.vec_id) AS rn " +
        "FROM embeddings s JOIN p ON s.label = p.p_label AND s.vec_id <> p.p_id) WHERE rn <= 5), " +
        "h AS (SELECT e.p_id, CAST(SUM(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits " +
        "FROM e LEFT JOIN a ON e.p_id = a.p_id AND e.vec_id = a.vec_id GROUP BY e.p_id) " +
        "SELECT count(*) AS n_probes, 5 AS k, " +
        "CAST(SUM(hits) AS DOUBLE) / (5 * count(*)) AS mean_recall, " +
        "CAST(MIN(hits) AS DOUBLE) / 5 AS min_recall FROM h")),

    // ANALYZE-style column statistics — the numbers a cost-based
    // optimizer consumes (non-null count, NDV, min/max) — in ONE
    // scan: all columns aggregate together, then the wide row unpivots
    // to one row per column. Three separate ANALYZE passes become one
    // table read at any scale. NDV is HLL++-sketched by default (k
    // exact count(DISTINCT)s would Expand-replicate the input k times
    // — see Stats.columnStats), so the parity check is the sketch
    // family's error-bound boolean: the estimate must land within 15%
    // of the exact NDV the op recomputes (exactNdv = true) and the
    // oracle recomputes independently. The same job is LOAD-BEARING,
    // not just a report: graft.api.Stats.analyze runs it and installs
    // the result into the session catalog for the cost-based optimizer
    // (CboSpec pins a join build side flipping on these stats).
    Op("core_column_stats",
      (s, d) => {
        val t = T.t(s, d, "orders")
        val cols = Seq("o_custkey", "o_orderstatus", "o_orderpriority")
        val approx = graft.api.Stats.columnStats(t, cols)
          .select("column", "n_nonnull", "ndv", "min_v", "max_v")
        val exact = graft.api.Stats.columnStats(t, cols, exactNdv = true)
          .select(col("column"), col("ndv").as("ndv_exact"))
        approx.join(exact, Seq("column"))
          .select(col("column"), col("n_nonnull"),
            (abs(col("ndv") - col("ndv_exact")) <=
              col("ndv_exact") * lit(0.15)).as("ndv_within_bounds"),
            col("min_v"), col("max_v"))
          .orderBy("column")
      },
      Some("SELECT 'o_custkey' AS column, count(o_custkey) AS n_nonnull, " +
        "true AS ndv_within_bounds, CAST(min(o_custkey) AS VARCHAR) AS min_v, " +
        "CAST(max(o_custkey) AS VARCHAR) AS max_v FROM orders " +
        "UNION ALL SELECT 'o_orderpriority', count(o_orderpriority), " +
        "true, min(o_orderpriority), max(o_orderpriority) FROM orders " +
        "UNION ALL SELECT 'o_orderstatus', count(o_orderstatus), " +
        "true, min(o_orderstatus), max(o_orderstatus) FROM orders " +
        "ORDER BY \"column\"")),

    // Winnowing fingerprints (Schleimer et al. 2003 — the MOSS method):
    // ordered 3-gram hashes, sliding window of 8, keep each window's
    // minimum, fingerprint = the distinct selected hashes. Guarantees
    // any shared run of >= 10 tokens shares a fingerprint while storing
    // ~2/(w+1) of the hashes. Everything stays inside one codegen'd
    // array pipeline per row; the md5-derived hash VALUES are replayed
    // identically by the oracle (min-selection depends on the values,
    // so the usual opaque-hash shortcut doesn't apply).
    Op("llm_winnow_fingerprint",
      (s, d) => T.spread(T.t(s, d, "documents"))
        .withColumn("toks", split(lower(col("text")), " "))
        .where("size(toks) >= 10")
        .withColumn("hs", expr(Round4.winnowHashExpr))
        .withColumn("fps", expr(Round4.winnowFpsExpr))
        .select(col("doc_id"),
          expr("CAST(size(fps) AS INT)").as("n_fp"),
          expr("array_min(fps)").as("fp_min"),
          expr("aggregate(fps, CAST(0 AS BIGINT), (a, x) -> a ^ x)").as("fp_xor"))
        .orderBy("doc_id"),
      Some("WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents), " +
        "h AS (SELECT doc_id, list_transform(range(1, len(toks) - 1), i -> " +
        "CAST(concat('0x', substr(md5(concat(toks[i], ' ', toks[i + 1], ' ', toks[i + 2])), 1, 8)) AS BIGINT)) AS hs " +
        "FROM t WHERE len(toks) >= 10), " +
        "f AS (SELECT doc_id, list_distinct(list_transform(range(1, len(hs) - 6), " +
        "j -> list_min(list_slice(hs, j, j + 7)))) AS fps FROM h) " +
        "SELECT doc_id, CAST(len(fps) AS INTEGER) AS n_fp, list_min(fps) AS fp_min, " +
        "list_reduce(list_prepend(CAST(0 AS BIGINT), fps), (a, x) -> xor(a, x)) AS fp_xor " +
        "FROM f ORDER BY doc_id")),

    // Per-doc n-gram novelty in doc_id order: the fraction of a doc's
    // distinct 3-gram shingles whose FIRST corpus occurrence is this doc
    // — the memorization/novelty curve read before adding a source to a
    // training mix. First-occurrence is one min-aggregation over the
    // exploded shingles; no self-join.
    Op("llm_ngram_novelty",
      (s, d) => {
        val sh = T.spread(T.t(s, d, "documents"))
          .withColumn("toks", split(lower(col("text")), " "))
          .where("size(toks) >= 3")
          .select(col("doc_id"), explode(expr(
            "array_distinct(transform(sequence(1, size(toks) - 2), " +
              "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1), ' ', element_at(toks, i + 2))))")).as("sh"))
        val first = sh.groupBy("sh").agg(min("doc_id").as("first_doc"))
        sh.join(first, "sh")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_shingles"),
            sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
          .withColumn("novelty", expr("CAST(n_novel AS DOUBLE) / n_shingles"))
          .orderBy("doc_id")
      },
      Some("WITH sh AS (SELECT doc_id, unnest(list_distinct(list_transform(" +
        "range(1, len(toks) - 1), i -> concat(toks[i], ' ', toks[i + 1], ' ', toks[i + 2])))) AS sh " +
        "FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents) WHERE len(toks) >= 3), " +
        "f AS (SELECT sh, min(doc_id) AS first_doc FROM sh GROUP BY sh) " +
        "SELECT doc_id, count(*) AS n_shingles, " +
        "CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel, " +
        "CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS novelty " +
        "FROM sh JOIN f USING (sh) GROUP BY doc_id ORDER BY doc_id")),

    // Error-safe TRY functions (the ANSI-mode companions): try_cast on
    // strings that may not parse, try_divide by zero, try_to_number with
    // a format. Under ANSI semantics the plain forms would throw; the
    // TRY forms degrade to NULL identically in both engines.
    Op("fn_try",
      (s, d) => T.t(s, d, "part").select(
          col("p_partkey"),
          expr("try_cast(substring(p_name, 1, 2) AS INT)").as("head_int"),
          expr("try_cast(p_brand AS DOUBLE)").as("brand_num"),
          expr("try_divide(p_retailprice, p_size - p_size)").as("div0"),
          expr("try_divide(p_retailprice, CAST(p_size AS DOUBLE))").as("per_size"),
          expr("CAST(try_cast(CASE WHEN p_partkey % 2 = 0 THEN '2024-01-15' " +
            "ELSE 'not-a-date' END AS DATE) AS STRING)").as("maybe_date"))
        .orderBy("p_partkey"),
      Some("SELECT p_partkey, " +
        "TRY_CAST(substring(p_name, 1, 2) AS INTEGER) AS head_int, " +
        "TRY_CAST(p_brand AS DOUBLE) AS brand_num, " +
        "CASE WHEN p_size - p_size = 0 THEN NULL ELSE p_retailprice / (p_size - p_size) END AS div0, " +
        "p_retailprice / CAST(p_size AS DOUBLE) AS per_size, " +
        "CAST(TRY_CAST(CASE WHEN p_partkey % 2 = 0 THEN '2024-01-15' ELSE 'not-a-date' END AS DATE) AS VARCHAR) AS maybe_date " +
        "FROM part ORDER BY p_partkey")),

    // Parameterized SQL + IDENTIFIER (Spark 4): the injection-safe
    // templated-query surface — table name bound through IDENTIFIER(),
    // values through named parameters. Same plan as the literal query.
    Op("rel_parameterized_sql",
      (s, d) => {
        T.t(s, d, "orders").createOrReplaceTempView("orders_pv")
        s.sql(
          "SELECT o_orderstatus, count(*) AS n, max(o_totalprice) AS max_price " +
            "FROM IDENTIFIER(:tbl) WHERE o_totalprice > :floor " +
            "GROUP BY o_orderstatus ORDER BY o_orderstatus",
          Map("tbl" -> "orders_pv", "floor" -> 100000))
      },
      Some("SELECT o_orderstatus, count(*) AS n, max(o_totalprice) AS max_price " +
        "FROM orders WHERE o_totalprice > 100000 " +
        "GROUP BY o_orderstatus ORDER BY o_orderstatus")),

    // Dynamic-gap session windows (Spark 4 session_window with a
    // per-event gap expression): views close after 5 idle minutes,
    // everything else after 15 — the realistic sessionization where the
    // gap depends on the event. The oracle emulates Spark's merge rule
    // (an event joins the session iff its ts <= the running max of
    // previous window ends, computed per user) with a running-max
    // window; equal-boundary events merge, matching Spark's inclusive
    // comparison — the fixed-gap op's oracle pins the same convention.
    Op("strm_session_dynamic_gap",
      (s, d) => T.events(s, d)
        .groupBy(col("user_id"), expr(
          "session_window(ts, CASE WHEN event_type = 'view' " +
            "THEN '5 minutes' ELSE '15 minutes' END)").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          expr("CAST(w.start AS TIMESTAMP_NTZ)").as("session_start"),
          expr("CAST(w.end AS TIMESTAMP_NTZ)").as("session_end"),
          col("n_events"))
        .orderBy("user_id", "session_start"),
      Some("WITH e AS (SELECT user_id, event_id, ts, " +
        "ts + CASE WHEN event_type = 'view' THEN INTERVAL 5 MINUTE ELSE INTERVAL 15 MINUTE END AS wend " +
        "FROM events), " +
        "m AS (SELECT user_id, event_id, ts, wend, " +
        "max(wend) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end FROM e), " +
        "f AS (SELECT *, CASE WHEN prev_end IS NULL OR ts > prev_end THEN 1 ELSE 0 END AS new_s FROM m), " +
        "g AS (SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid FROM f) " +
        "SELECT user_id, min(ts) AS session_start, max(wend) AS session_end, count(*) AS n_events " +
        "FROM g GROUP BY user_id, sid ORDER BY user_id, session_start")),

    // 13-gram benchmark contamination (the GPT-3-report method): a
    // corpus doc is contaminated if it shares ANY 13-token window with a
    // held-out benchmark doc. Window hashes equi-join between the two
    // sides — benchmark-side hashes are the small build side, the corpus
    // is never self-joined — so the check costs one corpus scan at any
    // scale. (llm_contamination_check keeps the phrase-probe variant;
    // this is the n-gram-overlap one evaluation reports actually use.)
    Op("llm_contamination_ngram",
      (s, d) => {
        def wins(df: org.apache.spark.sql.DataFrame) = df
          .withColumn("toks", split(lower(col("text")), " "))
          .where("size(toks) >= 13")
          .select(col("doc_id"), explode(expr(
            "array_distinct(transform(sequence(1, size(toks) - 12), " +
              "i -> xxhash64(concat_ws(' ', slice(toks, i, 13)))))")).as("w"))
        // seeded contamination pair: the synthetic corpus has no real
        // 13-gram overlap at small SFs, which would make the driver's
        // oracle compare vacuous (0 == 0 rows). One constructed bench
        // doc (id % 97 = 0) and one corpus doc embedding its 13-token
        // window — with tokens no generated text contains — exercise
        // the hit path end-to-end; the oracle unions the identical rows.
        val docs = T.spread(T.t(s, d, "documents")).select("doc_id", "text")
          .unionByName(s.createDataFrame(
            java.util.Arrays.asList(
              org.apache.spark.sql.Row(97000291L, Round4.contamWindow),
              org.apache.spark.sql.Row(97000292L,
                s"zzqpre ${Round4.contamWindow} zzqpost")),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("doc_id",
                org.apache.spark.sql.types.LongType),
              org.apache.spark.sql.types.StructField("text",
                org.apache.spark.sql.types.StringType)))))
        val bench = wins(docs.where("doc_id % 97 = 0"))
          .select(col("w"), col("doc_id").as("bench_id"))
        wins(docs.where("doc_id % 97 <> 0"))
          .join(bench, "w")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_shared_windows"),
            min("bench_id").as("first_bench_id"))
          .orderBy("doc_id")
      },
      Some("WITH du AS (SELECT doc_id, text FROM documents " +
        s"UNION ALL SELECT 97000291, '${contamWindow}' " +
        s"UNION ALL SELECT 97000292, 'zzqpre ${contamWindow} zzqpost'), " +
        "w AS (SELECT doc_id, unnest(list_distinct(list_transform(" +
        "range(1, len(toks) - 11), i -> array_to_string(list_slice(toks, i, i + 12), ' ')))) AS w " +
        "FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM du) " +
        "WHERE len(toks) >= 13), " +
        "bench AS (SELECT w, doc_id AS bench_id FROM w WHERE doc_id % 97 = 0), " +
        "corp AS (SELECT doc_id, w FROM w WHERE doc_id % 97 <> 0) " +
        "SELECT doc_id, count(*) AS n_shared_windows, min(bench_id) AS first_bench_id " +
        "FROM corp JOIN bench USING (w) GROUP BY doc_id ORDER BY doc_id")),

    // Predicate/combining higher-order functions over array columns —
    // exists / forall / filter-count / zip_with+aggregate fold — the
    // part of the HOF suite fn_array doesn't exercise. All stay inside
    // whole-stage codegen; the fold lands in an epsilon-guarded fixed
    // point so the sequential double accumulation compares exactly.
    Op("fn_hof_predicates",
      (s, d) => T.spread(T.t(s, d, "embeddings")).select(
          col("vec_id"),
          expr("exists(embedding, x -> x > 0.9D)").as("any_hot"),
          expr("forall(embedding, x -> x >= -1.0D)").as("all_bounded"),
          expr("CAST(size(filter(embedding, x -> x < 0D)) AS INT)").as("n_neg"),
          expr("CAST(floor(aggregate(zip_with(embedding, reverse(embedding), " +
            "(a, b) -> CAST(a AS DOUBLE) * CAST(b AS DOUBLE)), CAST(0 AS DOUBLE), " +
            "(acc, v) -> acc + v) * 10000 + 0.000001) AS BIGINT)").as("dotrev_fp"))
        .orderBy("vec_id"),
      Some("SELECT vec_id, " +
        "len(list_filter(embedding, x -> CAST(x AS DOUBLE) > 0.9)) > 0 AS any_hot, " +
        "len(list_filter(embedding, x -> NOT (CAST(x AS DOUBLE) >= -1.0))) = 0 AS all_bounded, " +
        "CAST(len(list_filter(embedding, x -> CAST(x AS DOUBLE) < 0)) AS INTEGER) AS n_neg, " +
        "CAST(floor(list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
        "list_transform(range(len(embedding)), i -> " +
        "CAST(embedding[i + 1] AS DOUBLE) * CAST(embedding[len(embedding) - i] AS DOUBLE))), " +
        "(a, v) -> a + v) * 10000 + 0.000001) AS BIGINT) AS dotrev_fp " +
        "FROM embeddings ORDER BY vec_id")),
  )
}
