package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent corpus profile sketches — the fixed-size state a 100-TB
  * pipeline keeps so "how many distinct texts / what are the heavy
  * tokens" never needs a corpus rescan. Follows the DedupIndex /
  * AnnIndex pattern: build once, update per ingested batch, read any
  * time; all state is parquet, all operations are distributed.
  *
  * Two tables under `dir`:
  *  - `kmv`: one row per group (lang) — the k=64 smallest DISTINCT
  *    60-bit text-hash values, ascending. Update = sketch UNION
  *    (merge the arrays, keep the k smallest distinct), which is
  *    associative/commutative/idempotent — re-ingesting a batch, or
  *    splitting the corpus into any batch sequence, lands on the
  *    sketch of the union. The SAME aggregator as
  *    `rel_agg_kmv_distinct`, so store and operator cannot drift.
  *  - `cms`: the 4×1024 count-min token counter table. Update =
  *    cell-wise ADD (counters are additive over disjoint batches) —
  *    NOT idempotent, so the ingestion layer must dedupe batches
  *    (Streams.cmsSink's run_key/batch_id partitioning does exactly
  *    that for the streaming path).
  *
  * Writes use the staged-directory + atomic-rename swap from
  * DedupIndex.update so a crash in any window leaves a complete
  * previous generation readable.
  */
object SketchStore {

  private val K = 64

  /** Per-lang KMV sketch rows of a batch. */
  def kmvOf(docs: DataFrame): DataFrame =
    docs.where("lang IS NOT NULL AND text IS NOT NULL")
      .select(col("lang"), expr(
        "CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)").as("h"))
      .groupBy("lang")
      .agg(graft.functions.KmvAggregator.kmv(K)(col("h")).as("mins"))

  /** CMS counter rows of a batch (shared builder with the operator). */
  def cmsOf(docs: DataFrame): DataFrame =
    graft.ops.Round7.cmsCounters(docs)

  def build(docs: DataFrame, dir: String): Unit = {
    kmvOf(docs).write.mode("overwrite").parquet(s"$dir/kmv")
    cmsOf(docs).write.mode("overwrite").parquet(s"$dir/cms")
  }

  /** Merge a new batch into the persisted sketches: KMV by sketch
    * union (k smallest distinct of the concatenation), CMS by
    * cell-wise add. Both merges read the retiring generation, write a
    * staged directory, and swap via atomic rename — the DedupIndex
    * crash-window contract.
    */
  def update(docs: DataFrame, dir: String): Unit = {
    updateKmv(docs, dir)
    updateCms(docs, dir)
  }

  /** KMV-only merge. Sketch union is IDEMPOTENT (duplicates collapse),
    * so re-ingesting a batch cannot perturb the sketch — the property
    * [[graft.streaming.Streams.kmvSink]] relies on under
    * at-least-once foreachBatch replay.
    */
  def updateKmv(docs: DataFrame, dir: String): Unit = {
    val spark = docs.sparkSession
    val kmvNew = kmvOf(docs)
    val kmvMerged = read(spark, dir, "kmv") match {
      case Some(old) =>
        old.unionByName(kmvNew)
          .select(col("lang"), explode(col("mins")).as("h"))
          .groupBy("lang")
          .agg(graft.functions.KmvAggregator.kmv(K)(col("h")).as("mins"))
      case None => kmvNew
    }
    swapIn(kmvMerged, s"$dir/kmv")
  }

  /** CMS-only merge. Cell-wise ADD is NOT idempotent — callers must
    * dedupe batches (the streaming path should use
    * [[graft.streaming.Streams.cmsSink]]'s partition-overwrite
    * scheme instead of replaying through here).
    */
  def updateCms(docs: DataFrame, dir: String): Unit = {
    val spark = docs.sparkSession
    val cmsNew = cmsOf(docs)
    val cmsMerged = read(spark, dir, "cms") match {
      case Some(old) =>
        old.unionByName(cmsNew)
          .groupBy("row_i", "bucket").agg(sum("c").as("c"))
      case None => cmsNew
    }
    swapIn(cmsMerged, s"$dir/cms")
  }

  /** Distinct-text estimate per lang from the stored KMV sketch —
    * exact below k, (k-1)·2^60/h_(k) above; no data touched.
    */
  def distinctEstimate(spark: SparkSession, dir: String): DataFrame =
    read(spark, dir, "kmv").getOrElse(sys.error(s"no kmv sketch at $dir"))
      .select(col("lang"),
        expr(s"CASE WHEN size(mins) < $K THEN CAST(size(mins) AS BIGINT) ELSE " +
          s"CAST(floor((CAST(${K - 1} AS DOUBLE) * 1152921504606846976.0) / " +
          s"CAST(element_at(mins, $K) AS DOUBLE)) AS BIGINT) END").as("n_est"))

  /** Point frequency estimate of tokens from the stored CMS (min over
    * the 4 row counters) — the heavy-hitter lookup, no data touched.
    */
  def freqEstimate(spark: SparkSession, dir: String, toks: Seq[String]): DataFrame = {
    import spark.implicits._
    val cms = read(spark, dir, "cms").getOrElse(sys.error(s"no cms sketch at $dir"))
    toks.toDF("tok")
      .select(col("tok"), posexplode(expr(
        "transform(sequence(0, 3), i -> CAST(" +
          "CAST(conv(substring(md5(concat(CAST(i AS STRING), ':', tok)), 1, 8), 16, 10) AS BIGINT)" +
          " % 1024 AS INT))")))
      .withColumnRenamed("pos", "row_i")
      .withColumnRenamed("col", "bucket")
      .join(broadcast(cms), Seq("row_i", "bucket"), "left")
      .groupBy("tok")
      .agg(coalesce(min("c"), lit(0L)).as("est"))
  }

  /** Read the current generation, falling back to the retired one if a
    * crash landed between the two swap renames (cur retired, staged not
    * yet promoted) — the same fallback contract as DedupIndex.read.
    */
  private def read(spark: SparkSession, dir: String, which: String): Option[DataFrame] = {
    val cur = new java.io.File(s"$dir/$which")
    val retired = new java.io.File(s"$dir/$which.retired")
    if (cur.exists()) Some(spark.read.parquet(cur.getPath))
    else if (retired.exists()) Some(spark.read.parquet(retired.getPath))
    else None
  }

  /** Staged write + atomic rename swap (DedupIndex contract): the new
    * generation becomes visible in one rename; the retiring one is
    * kept as `<which>.retired` until the next swap for crash fallback.
    */
  private def swapIn(df: DataFrame, path: String): Unit = {
    val staged = new java.io.File(path + ".staged")
    val cur = new java.io.File(path)
    val retired = new java.io.File(path + ".retired")
    // materialize BEFORE touching the current generation: the merge
    // plan reads it
    df.localCheckpoint().write.mode("overwrite").parquet(staged.getPath)
    if (retired.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(retired)
    }
    if (cur.exists()) require(cur.renameTo(retired), s"swap: retire $path")
    require(staged.renameTo(cur), s"swap: promote $path")
  }
}
