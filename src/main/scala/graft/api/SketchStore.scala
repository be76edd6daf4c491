package graft.api

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

/** Persistent corpus profile sketches — the fixed-size state a 100-TB
  * pipeline keeps so "how many distinct texts / what are the heavy
  * tokens" never needs a corpus rescan. Follows the DedupIndex /
  * AnnIndex pattern: build once, update per ingested batch, read any
  * time; all state is parquet, all operations are distributed, and all
  * filesystem moves go through the Hadoop FileSystem API so the store
  * behaves identically on local disk, HDFS and object stores.
  *
  * Layout under `dir`:
  *  - `kmv`: one row per group (lang) — the k=64 smallest DISTINCT
  *    60-bit text-hash values, ascending. Update = sketch UNION
  *    (merge the arrays, keep the k smallest distinct), which is
  *    associative/commutative/idempotent — re-ingesting a batch, or
  *    splitting the corpus into any batch sequence, lands on the
  *    sketch of the union. The SAME aggregator as
  *    `rel_agg_kmv_distinct`, so store and operator cannot drift.
  *  - `cms`: a GENERATION DIRECTORY holding three tables that always
  *    move together in one atomic rename:
  *      `cms/counters` — the d×w count-min token counter cells;
  *      `cms/meta`     — one row (d, w) so readers hash with the
  *                       exact geometry the sketch was built with;
  *      `cms/applied`  — the batch-id ledger. Cell-wise ADD is not
  *                       idempotent, so replay safety comes from the
  *                       ledger: an update that carries a `batchId`
  *                       already present in `applied` is a no-op.
  *    Because ledger and counters swap in the SAME rename, a crash
  *    can never record a batch without its counts or vice versa.
  *
  * Writes use the staged-directory + atomic-rename swap from
  * DedupIndex.update so a crash in any window leaves a complete
  * previous generation readable.
  */
object SketchStore {

  private val K = 64

  /** Default count-min geometry (δ = e^-4 ≈ 1.8% per point query). */
  val DefaultDepth = 4
  val DefaultWidth = 1024L

  // ---------------------------------------------------------------- sizing

  /** Count-min width from a distinct-key cardinality budget (the number
    * the KMV sketch already provides): `w = max(1024, ceil(n̂ / load))`.
    * With load = 0.5 the expected distinct keys per cell is ≤ ½, so a
    * point query's expected overcount is bounded by half the mean key
    * frequency per row — and the min over d rows drives the realized
    * bias far below that. The classic ε·N guarantee reads ε = e/w; this
    * cardinality form is the one a profiling pass can act on BEFORE it
    * knows N, which is exactly when the sketch must be sized.
    */
  def cmsWidthFor(nDistinct: Long, loadFactor: Double = 0.5): Long = {
    require(loadFactor > 0, "loadFactor must be positive")
    math.max(DefaultWidth, math.ceil(nDistinct.toDouble / loadFactor).toLong)
  }

  /** Bloom-filter geometry from cardinality n̂ and target false-positive
    * rate p: `m = ceil(-n̂·ln p / ln²2)` bits and `j = round(m/n̂ · ln 2)`
    * hash probes — the textbook optimum (j minimizing (1-e^{-jn/m})^j).
    */
  def bloomSizeFor(n: Long, fpr: Double): (Long, Int) = {
    require(n > 0, "bloom sizing needs a positive cardinality estimate")
    require(fpr > 0 && fpr < 1, "fpr must be in (0, 1)")
    val ln2 = math.log(2.0)
    val m = math.ceil(-n.toDouble * math.log(fpr) / (ln2 * ln2)).toLong
    val j = math.max(1, math.round(m.toDouble / n.toDouble * ln2).toInt)
    (m, j)
  }

  // ---------------------------------------------------------------- build

  /** Per-lang KMV sketch rows of a batch. */
  def kmvOf(docs: DataFrame): DataFrame =
    docs.where("lang IS NOT NULL AND text IS NOT NULL")
      .select(col("lang"), expr(
        "CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)").as("h"))
      .groupBy("lang")
      .agg(graft.functions.KmvAggregator.kmv(K)(col("h")).as("mins"))

  /** CMS counter rows of a batch (shared builder with the operator). */
  def cmsOf(docs: DataFrame, width: Long = DefaultWidth): DataFrame =
    graft.ops.Round7.cmsCounters(docs, width)

  /** KMV estimate of the corpus' distinct whitespace-token count — the
    * cardinality input to [[cmsWidthFor]]. One bounded sketch row comes
    * back to the driver; the token stream never does.
    */
  def tokenCardinality(docs: DataFrame): Long = {
    val mins = docs.where("text IS NOT NULL")
      .select(explode(split(col("text"), " ")).as("tok"))
      .where("tok <> ''")
      .select(expr(
        "CAST(conv(substring(md5(tok), 1, 15), 16, 10) AS BIGINT)").as("h"))
      .agg(graft.functions.KmvAggregator.kmv(K)(col("h")).as("mins"))
      .head().getSeq[Long](0)
    if (mins.length < K) mins.length.toLong
    else math.floor((K - 1).toDouble * 1152921504606846976.0e0 / mins.last.toDouble).toLong
  }

  def build(docs: DataFrame, dir: String): Unit =
    buildWith(docs, dir, DefaultWidth)

  /** Build with the CMS width DERIVED from the measured token
    * cardinality ([[tokenCardinality]] → [[cmsWidthFor]]) — the closed
    * sizing loop: the KMV pass decides the geometry the CMS pass uses.
    * Returns the chosen width (persisted in `cms/meta`, so every later
    * read and update hashes consistently).
    */
  def buildSized(docs: DataFrame, dir: String, loadFactor: Double = 0.5): Long = {
    val w = cmsWidthFor(tokenCardinality(docs), loadFactor)
    buildWith(docs, dir, w)
    w
  }

  private def buildWith(docs: DataFrame, dir: String, width: Long): Unit = {
    swapIn(kmvOf(docs), docs.sparkSession, s"$dir/kmv")
    swapInCms(docs.sparkSession, s"$dir/cms",
      cmsOf(docs, width), metaDf(docs.sparkSession, width), emptyLedger(docs.sparkSession))
  }

  // ---------------------------------------------------------------- update

  /** Merge a new batch into the persisted sketches: KMV by sketch
    * union (k smallest distinct of the concatenation), CMS by
    * cell-wise add. Both merges read the retiring generation, write a
    * staged directory, and swap via atomic rename — the DedupIndex
    * crash-window contract. Pass `batchId` to make the CMS half
    * replay-safe (see [[updateCms]]).
    */
  def update(docs: DataFrame, dir: String, batchId: Option[String] = None): Unit = {
    updateKmv(docs, dir)
    updateCms(docs, dir, batchId): Unit
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
    swapIn(kmvMerged, spark, s"$dir/kmv")
  }

  /** CMS-only merge (cell-wise ADD). ADD is not idempotent, so replay
    * safety comes from the batch ledger: when `batchId` is given and
    * already present in `cms/applied`, the call is a NO-OP (returns
    * false) — a retried batch cannot double-count. The ledger row and
    * the merged counters land in the same generation rename, so no
    * crash ordering can record one without the other. Calls without a
    * `batchId` are raw read-modify-write and remain the caller's
    * responsibility to not replay (the streaming path should use
    * [[graft.streaming.Streams.cmsSink]]'s partition-overwrite scheme).
    *
    * @return true if the batch was applied, false if the ledger
    *         recognized it as already merged.
    */
  def updateCms(docs: DataFrame, dir: String, batchId: Option[String] = None): Boolean = {
    val spark = docs.sparkSession
    val (merged, meta, ledger) = readCmsGen(spark, s"$dir/cms") match {
      case Some((oldCounters, oldMeta, oldLedger)) =>
        val w = oldMeta.head().getAs[Long]("w")
        if (batchId.exists(id =>
            oldLedger.where(col("batch_id") === id).limit(1).count() > 0)) {
          return false
        }
        val counters = oldCounters.unionByName(cmsOf(docs, w))
          .groupBy("row_i", "bucket").agg(sum("c").as("c"))
        val ledger = batchId match {
          case Some(id) => oldLedger.unionByName(ledgerDf(spark, id))
          case None => oldLedger
        }
        (counters, metaDf(spark, w), ledger)
      case None =>
        (cmsOf(docs, DefaultWidth), metaDf(spark, DefaultWidth),
          batchId.map(ledgerDf(spark, _)).getOrElse(emptyLedger(spark)))
    }
    swapInCms(spark, s"$dir/cms", merged, meta, ledger)
    true
  }

  // ---------------------------------------------------------------- read

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
    * the d row counters, hashed with the stored geometry) — the
    * heavy-hitter lookup, no data touched. An absent cell IS a zero
    * count (nothing ever hashed there), so empty cells participate in
    * the min as 0 — a token the corpus never saw estimates 0, not the
    * min of whatever collides in its non-empty cells.
    */
  def freqEstimate(spark: SparkSession, dir: String, toks: Seq[String]): DataFrame = {
    import spark.implicits._
    val (cms, meta, _) = readCmsGen(spark, s"$dir/cms")
      .getOrElse(sys.error(s"no cms sketch at $dir"))
    val m = meta.head()
    val (d, w) = (m.getAs[Int]("d"), m.getAs[Long]("w"))
    toks.toDF("tok")
      .select(col("tok"), posexplode(expr(
        s"transform(sequence(0, ${d - 1}), i -> CAST(" +
          "CAST(conv(substring(md5(concat(CAST(i AS STRING), ':', tok)), 1, 8), 16, 10) AS BIGINT)" +
          s" % CAST($w AS BIGINT) AS INT))")))
      .withColumnRenamed("pos", "row_i")
      .withColumnRenamed("col", "bucket")
      .join(broadcast(cms), Seq("row_i", "bucket"), "left")
      .groupBy("tok")
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }

  /** The stored CMS geometry `(d, w)` — what [[buildSized]] chose. */
  def cmsGeometry(spark: SparkSession, dir: String): (Int, Long) = {
    val m = readCmsGen(spark, s"$dir/cms")
      .getOrElse(sys.error(s"no cms sketch at $dir"))._2.head()
    (m.getAs[Int]("d"), m.getAs[Long]("w"))
  }

  // ------------------------------------------------------------ internals

  private def metaDf(spark: SparkSession, width: Long): DataFrame =
    spark.createDataFrame(
      java.util.Collections.singletonList(Row(DefaultDepth, width)),
      StructType(Seq(StructField("d", IntegerType), StructField("w", LongType))))

  private val ledgerSchema = StructType(Seq(StructField("batch_id", StringType)))

  private def ledgerDf(spark: SparkSession, id: String): DataFrame =
    spark.createDataFrame(
      java.util.Collections.singletonList(Row(id)), ledgerSchema)

  private def emptyLedger(spark: SparkSession): DataFrame =
    spark.createDataFrame(java.util.Collections.emptyList[Row](), ledgerSchema)

  private def fileSystem(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Read the current generation, falling back to the retired one if a
    * crash landed between the two swap renames (cur retired, staged not
    * yet promoted) — the same fallback contract as DedupIndex.read.
    * Hadoop FileSystem API throughout, so HDFS/S3 paths resolve.
    */
  private def read(spark: SparkSession, dir: String, which: String): Option[DataFrame] =
    genPath(spark, s"$dir/$which").map(spark.read.parquet(_))

  /** The cms generation tables (counters, meta, applied) of whichever
    * generation root is currently readable.
    */
  private def readCmsGen(spark: SparkSession, path: String): Option[(DataFrame, DataFrame, DataFrame)] =
    genPath(spark, path).map { root =>
      (spark.read.parquet(s"$root/counters"),
        spark.read.parquet(s"$root/meta"),
        spark.read.schema(ledgerSchema).parquet(s"$root/applied"))
    }

  private def genPath(spark: SparkSession, path: String): Option[String] = {
    val fs = fileSystem(spark, path)
    if (fs.exists(new Path(path))) Some(path)
    else if (fs.exists(new Path(path + ".retired"))) Some(path + ".retired")
    else None
  }

  /** Staged write + atomic rename swap (DedupIndex contract): the new
    * generation becomes visible in one rename; the retiring one is
    * kept as `<path>.retired` until the next swap for crash fallback.
    * In the post-crash state (no current generation, only `.retired`),
    * the staged generation is promoted BEFORE the retired one is
    * deleted, so at every instant some complete generation is readable.
    */
  private def swapIn(df: DataFrame, spark: SparkSession, path: String): Unit = {
    df.write.mode("overwrite").parquet(path + ".staged")
    promote(spark, path)
  }

  /** CMS variant: counters, meta and ledger are all written under one
    * staged root and become visible in the SAME rename.
    */
  private def swapInCms(spark: SparkSession, path: String,
      counters: DataFrame, meta: DataFrame, ledger: DataFrame): Unit = {
    val fs = fileSystem(spark, path)
    fs.delete(new Path(path + ".staged"), true)
    counters.write.mode("overwrite").parquet(s"$path.staged/counters")
    meta.write.mode("overwrite").parquet(s"$path.staged/meta")
    ledger.write.mode("overwrite").parquet(s"$path.staged/applied")
    promote(spark, path)
  }

  private def promote(spark: SparkSession, path: String): Unit = {
    val fs = fileSystem(spark, path)
    val cur = new Path(path)
    val retired = new Path(path + ".retired")
    val staged = new Path(path + ".staged")
    if (fs.exists(cur)) {
      fs.delete(retired, true)
      require(fs.rename(cur, retired), s"swap: retire $path")
      require(fs.rename(staged, cur), s"swap: promote $path")
    } else {
      // recovery path: the staged generation already contains the merge
      // of the retired one, so promote it first — deleting retired
      // before the promote would leave a window with nothing readable
      require(fs.rename(staged, cur), s"swap: promote $path")
      fs.delete(retired, true): Unit
    }
  }
}
