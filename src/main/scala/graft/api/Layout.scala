package graft.api

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout optimization: z-order (Morton) clustered writes and the
  * file-skipping audit that proves the layout pays.
  *
  * At 100 TB the dominant cost of a selective query is the files it
  * CANNOT skip. A single-column sorted layout gives perfect min/max
  * pruning on that column and none on any other; interleaving the bits
  * of several columns into one Morton key and range-partitioning on it
  * bounds every clustered column's span within every file, so parquet
  * footer min/max stats prune files for predicates on ANY of them (the
  * Delta/Iceberg OPTIMIZE ZORDER idea). Everything here is plain
  * integer arithmetic Catalyst folds into codegen — no UDF, no shuffle
  * beyond the one range exchange the clustered write needs anyway.
  */
object Layout {

  /** Morton key over `dims`, each first normalized to an integer bucket
    * in [0, 2^bits) via its (lo, hi) range: bit j of dim i lands at
    * interleaved position `j * n + i`. Pure div/mod arithmetic (same
    * result on any engine; no shift operators needed).
    *
    * The total width is capped at 52 bits, not 62: the bucket scaling
    * and bit extraction run through Column `/`, which is DOUBLE
    * division in Spark SQL. Division by a power of two is exact in
    * binary floating point as long as the operand itself is exactly
    * representable, i.e. below 2^53 — past that, keys silently corrupt
    * (adjacent values collapse or swap). 52 interleaved bits is 2^52
    * distinct cells, far beyond any useful clustering resolution, and
    * inside the exact range the div/mod form stays bit-identical on
    * any engine that computes in IEEE doubles.
    */
  def mortonKey(dims: Seq[(Column, Double, Double)], bits: Int): Column = {
    require(dims.nonEmpty && bits >= 1 && bits * dims.size <= 52,
      "morton key must stay in the double-exact range (bits * dims <= 52)")
    val n = dims.size
    val buckets = dims.map { case (c, lo, hi) =>
      // Long shifts throughout: an Int `1 << bits` silently wraps for
      // bits >= 31 and would collapse every key to bucket 0
      least(lit((1L << bits) - 1), greatest(lit(0L),
        floor((c.cast("double") - lit(lo)) / lit((hi - lo) / (1L << bits).toDouble))
          .cast("long")))
    }
    buckets.zipWithIndex.map { case (b, i) =>
      (0 until bits).map { j =>
        (floor(b / lit(1L << j)).cast("long") % 2) * lit(1L << (j * n + i))
      }.reduce(_ + _)
    }.reduce(_ + _)
  }

  /** Write `df` z-order-clustered on `dims` into `outDir` as `nFiles`
    * parquet files: range-partition on the Morton key (one exchange),
    * sort within each partition, drop the key. Each output file covers
    * a contiguous z-range, so every clustered column's min/max span per
    * file is bounded — the property [[skippingReport]] audits.
    */
  def zorderWrite(
      df: DataFrame,
      dims: Seq[(Column, Double, Double)],
      outDir: String,
      nFiles: Int,
      bits: Int = 8): Unit =
    df.withColumn("__z", mortonKey(dims, bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)

  /** Per-file min/max audit for `column` under predicate [lo, hi]:
    * which files COULD a stats-pruning reader skip? One distributed
    * aggregation over `input_file_name` — the same information parquet
    * footers hold, measured from the data so the test doesn't depend
    * on footer internals. Returns (n_files, n_skippable).
    */
  def skippingReport(
      spark: SparkSession,
      dir: String,
      column: String,
      lo: Double,
      hi: Double): (Long, Long) = {
    val perFile = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min(col(column).cast("double")).as("mn"),
        max(col(column).cast("double")).as("mx"))
    val r = perFile.agg(
      count(lit(1)).as("n_files"),
      sum(when(col("mx") < lo || col("mn") > hi, 1L).otherwise(0L)).as("n_skip"))
      .head()
    (r.getLong(0), r.getLong(1))
  }
}
