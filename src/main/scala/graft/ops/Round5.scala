package graft.ops

import graft.{Op, Tables => T}
import org.apache.spark.sql.functions._

/** Round-5 operator additions (SURVEY.md §2 F2 continuation).
  *
  * The trained-IVF family closes round-4 verdict #3: the IVF cell key is
  * now the k-means-learned centroid assignment (graft.api.AnnIndex), not
  * the `label` stand-in, and the 32-probe recall audit measures exactly
  * that index.
  */
object Round5 {

  /** DuckDB CTEs shared by the trained-IVF ops: the kmeans prefix (ends
    * `c3`) plus the full-corpus assignment to the trained centroids.
    * Reuses the oKmeansIter(4, c3) building block so the assignment
    * arithmetic is textually the training arithmetic; ends with
    * `asg(vec_id, embedding, c_id)`.
    */
  private val oTrainedAssign: String =
    LlmOps.oKmeansTrainedPrefix + ", " + LlmOps.oKmeansIter(4, "c3") +
      ", asg AS (SELECT vec_id, embedding, c_id FROM b4 WHERE rn = 1)"

  /** Probe-to-centroid squared-L2 in DuckDB (64-dim, sequential fold). */
  private def oProbeD2(pEmb: String): String =
    "list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
      "list_transform(range(1, 65), k -> " +
      s"(CAST($pEmb[k] AS DOUBLE) - c.c_vec[k]) * " +
      s"(CAST($pEmb[k] AS DOUBLE) - c.c_vec[k]))), (x, y) -> x + y)"

  val ops: Seq[Op] = Seq(

    // IVF search over the TRAINED index: nearest-2-cells candidate scan
    // + exact cosine re-rank, all through graft.api.AnnIndex — the same
    // functions the persistent build/update/searchIndex path runs, so
    // this oracle-checked query covers the production index. At 100 TB
    // the candidate scan is a partition-pruned read of nProbe cells
    // (assignments are written partitionBy(c_id)); nothing here touches
    // more than centroids (broadcast) + the probe's cells.
    Op("llm_ann_ivf_trained",
      (s, d) => {
        val emb = T.spread(T.t(s, d, "embeddings"))
        val cent = graft.api.AnnIndex.train(T.t(s, d, "embeddings"), k = 10, iters = 3)
        val assigned = graft.api.AnnIndex.assign(emb, cent)
        val probes = emb.where("vec_id = 0")
          .select(col("vec_id").as("p_id"), col("embedding").as("p_emb"))
        graft.api.AnnIndex.search(assigned, cent, probes, k = 5, nProbe = 2)
          .select("vec_id", "c_id", "sim")
          .orderBy(desc("sim"), col("vec_id"))
      },
      Some(oTrainedAssign +
        ", p AS (SELECT embedding AS p_emb FROM embeddings WHERE vec_id = 0), " +
        s"pd AS (SELECT c.c_id, ${oProbeD2("p.p_emb")} AS d2 FROM c3 c, p), " +
        "pc AS (SELECT c_id FROM (SELECT c_id, row_number() OVER (ORDER BY d2, c_id) AS rn FROM pd) WHERE rn <= 2) " +
        "SELECT vec_id, c_id, sim FROM (SELECT s.vec_id, s.c_id, " +
        s"${Round3.oSimSql("s.embedding", "p_emb")} AS sim " +
        "FROM asg s JOIN pc USING (c_id), p WHERE s.vec_id <> 0) " +
        "ORDER BY sim DESC, vec_id LIMIT 5")),

    // Recall audit of the trained index over the standard 32-probe
    // panel (same panel as the LSH and label-IVF audits): recall@5 of
    // the nProbe=2 trained-cell search against the exact global top-5.
    // Completes verdict #3 — every ANN index in the engine, including
    // the production one, has a measured recall distribution.
    Op("llm_ann_ivf_trained_recall",
      (s, d) => {
        graft.functions.CosineSimilarity.register(s)
        val emb = T.spread(T.t(s, d, "embeddings"))
        val cent = graft.api.AnnIndex.train(T.t(s, d, "embeddings"), k = 10, iters = 3)
        val assigned = graft.api.AnnIndex.assign(emb, cent)
        val probes = emb
          .withColumn("hkey", expr("substring(md5(CAST(vec_id AS STRING)), 1, 8)"))
          .orderBy("hkey", "vec_id").limit(32)
          .select(col("vec_id").as("p_id"), col("embedding").as("p_emb"))
        val wTop = org.apache.spark.sql.expressions.Window
          .partitionBy("p_id").orderBy(desc("sim"), col("vec_id"))
        val exact5 = emb.crossJoin(broadcast(probes))
          .where("vec_id <> p_id")
          .withColumn("sim", expr("cosine_sim(embedding, p_emb)"))
          .withColumn("rn", row_number().over(wTop)).where("rn <= 5")
          .select("p_id", "vec_id")
        val approx5 = graft.api.AnnIndex.search(assigned, cent, probes, k = 5, nProbe = 2)
          .select(col("p_id"), col("vec_id"), lit(1).as("hit"))
        exact5.join(approx5, Seq("p_id", "vec_id"), "left")
          .groupBy("p_id").agg(sum(coalesce(col("hit"), lit(0))).as("hits"))
          .agg(count(lit(1)).as("n_probes"), sum("hits").as("total_hits"),
            min("hits").as("min_hits"))
          .select(col("n_probes"), lit(5).as("k"),
            expr("CAST(total_hits AS DOUBLE) / (5 * n_probes)").as("mean_recall"),
            expr("CAST(min_hits AS DOUBLE) / 5").as("min_recall"))
      },
      Some(oTrainedAssign +
        ", pp AS (SELECT vec_id AS p_id, embedding AS p_emb FROM embeddings " +
        "ORDER BY substr(md5(CAST(vec_id AS VARCHAR)), 1, 8), vec_id LIMIT 32), " +
        s"pd AS (SELECT pp.p_id, pp.p_emb, c.c_id, ${oProbeD2("pp.p_emb")} AS d2 FROM c3 c, pp), " +
        "pc AS (SELECT p_id, p_emb, c_id FROM (SELECT p_id, p_emb, c_id, " +
        "row_number() OVER (PARTITION BY p_id ORDER BY d2, c_id) AS rn FROM pd) WHERE rn <= 2), " +
        "e AS (SELECT p_id, vec_id FROM (SELECT pp.p_id, s.vec_id, " +
        s"row_number() OVER (PARTITION BY pp.p_id ORDER BY ${Round3.oSimSql("s.embedding", "pp.p_emb")} DESC, s.vec_id) AS rn " +
        "FROM embeddings s, pp WHERE s.vec_id <> pp.p_id) WHERE rn <= 5), " +
        "a AS (SELECT p_id, vec_id FROM (SELECT pc.p_id, s.vec_id, " +
        s"row_number() OVER (PARTITION BY pc.p_id ORDER BY ${Round3.oSimSql("s.embedding", "pc.p_emb")} DESC, s.vec_id) AS rn " +
        "FROM asg s JOIN pc ON s.c_id = pc.c_id AND s.vec_id <> pc.p_id) WHERE rn <= 5), " +
        "h AS (SELECT e.p_id, CAST(SUM(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits " +
        "FROM e LEFT JOIN a ON e.p_id = a.p_id AND e.vec_id = a.vec_id GROUP BY e.p_id) " +
        "SELECT count(*) AS n_probes, 5 AS k, " +
        "CAST(SUM(hits) AS DOUBLE) / (5 * count(*)) AS mean_recall, " +
        "CAST(MIN(hits) AS DOUBLE) / 5 AS min_recall FROM h")),
  )
}
