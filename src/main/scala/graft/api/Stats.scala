package graft.api

import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.catalog.{CatalogColumnStat, CatalogStatistics}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.aggregate.ApproxCountDistinctForIntervals
import org.apache.spark.sql.catalyst.plans.logical.{Histogram, HistogramBin}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-scan ANALYZE: compute the full cost-based-optimizer input surface
  * — row count plus per-column non-null count, NDV (HLL++ sketch by
  * default, exact opt-in), min/max and
  * byte lengths — in a SINGLE aggregation over the table, and install it
  * into the session catalog where Spark's CBO (`spark.sql.cbo.enabled`,
  * on by default in [[Sessions.production]]) consumes it for join-side,
  * join-reorder and filter-selectivity decisions.
  *
  * Spark's own `ANALYZE TABLE … COMPUTE STATISTICS FOR COLUMNS` runs a
  * size job plus a column-stats job per invocation; at 100 TB one table
  * read for the whole surface is the point — this is the same
  * all-columns-in-one-pass shape as the `core_column_stats` operator,
  * which delegates here so the reported numbers and the numbers the
  * optimizer plans with can never drift.
  */
object Stats {

  /** Types the one-scan stats job covers (matches ANALYZE's support). */
  private def supported(dt: DataType): Boolean = dt match {
    case _: NumericType | StringType | BinaryType | BooleanType |
         DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** min/max are installed only for types whose catalog string form is
    * the plain literal rendering (numerics and booleans); date/time
    * formats are catalog-versioned, so we leave them to NDV/null-count
    * rather than risk writing a form another reader mis-parses.
    */
  private def minMaxSafe(dt: DataType): Boolean = dt match {
    case _: NumericType | BooleanType => true
    case _ => false
  }

  /** The one-scan per-column stats frame: one row per requested column —
    * `(column, n_nonnull, ndv, min_v, max_v, avg_len, max_len, n_rows)`,
    * every aggregate computed in the same pass and unpivoted.
    *
    * NDV is SKETCH-BASED by default (HLL++ via `approx_count_distinct`,
    * rsd 0.05 — the same estimator Spark's own ANALYZE uses): k exact
    * `count(DISTINCT)`s in one aggregate plan through Catalyst's
    * `Expand`, replicating the input once per distinct column — "one
    * scan" over a k-column 100-TB table would shuffle ~k× the table.
    * HLL sketches are ordinary (map-side-combined, fixed-state)
    * aggregates, so ALL columns genuinely share one pass with no row
    * replication (PlansSpec pins the no-Expand plan). `exactNdv = true`
    * opts into exact counts — planned as ONE SINGLE-COLUMN AGGREGATE
    * BRANCH PER COLUMN unioned together (a lone `count(DISTINCT)` never
    * Expands): each branch's scan is column-pruned to its own column,
    * so k branches read the table's columns once between them and the
    * distinct shuffle carries one column's values — strictly less I/O
    * and shuffle than the old k-way Expand replication, and no plan
    * node replicates rows at any scale (CboSpec pins both paths
    * Expand-free).
    *
    * Derived-input caveat: each exact branch re-executes the ENTIRE
    * upstream plan of `df`, so the "columns read once between them"
    * claim holds for plain column-pruned table scans; a caller whose
    * input is itself a computed frame (e.g. a store read behind joins)
    * should localCheckpoint/cache it before `columnStats(exactNdv =
    * true)` or accept k reconstructions.
    */
  def columnStats(df: DataFrame, cols: Seq[String],
      exactNdv: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "columnStats needs at least one column")
    if (exactNdv) {
      return cols.map { c =>
        df.agg(
          count(col(c)).as("n_nonnull"),
          countDistinct(col(c)).as("ndv"),
          min(col(c)).cast("string").as("min_v"),
          max(col(c)).cast("string").as("max_v"),
          lenAggs(df, c)._1.as("avg_len"), lenAggs(df, c)._2.as("max_len"),
          count(lit(1)).as("n_rows"))
          .select(lit(c).as("column"), col("n_nonnull"), col("ndv"),
            col("min_v"), col("max_v"), col("avg_len"), col("max_len"),
            col("n_rows"))
      }.reduce(_.unionByName(_))
    }
    val aggs = count(lit(1)).as("n_rows") +: cols.zipWithIndex.flatMap { case (c, i) =>
      val (avgLen, maxLen) = lenAggs(df, c)
      Seq(count(col(c)).as(s"nn$i"),
        approx_count_distinct(col(c), 0.05).as(s"nd$i"),
        min(col(c)).cast("string").as(s"mn$i"),
        max(col(c)).cast("string").as(s"mx$i"),
        avgLen.as(s"al$i"), maxLen.as(s"ml$i"))
    }
    val structs = cols.zipWithIndex.map { case (c, i) =>
      s"named_struct('column', '$c', 'n_nonnull', nn$i, 'ndv', nd$i, " +
        s"'min_v', mn$i, 'max_v', mx$i, 'avg_len', al$i, 'max_len', ml$i)"
    }.mkString("array(", ", ", ")")
    df.agg(aggs.head, aggs.tail: _*)
      .select(col("n_rows"), explode(expr(structs)).as("s"))
      .select(col("s.*"), col("n_rows"))
  }

  private def lenAggs(
      df: DataFrame, c: String): (org.apache.spark.sql.Column,
      org.apache.spark.sql.Column) =
    df.schema(c).dataType match {
      case StringType | BinaryType =>
        (ceil(coalesce(avg(length(col(c))), lit(0))).cast("long"),
          coalesce(max(length(col(c))), lit(0)).cast("long"))
      case dt => (lit(dt.defaultSize.toLong), lit(dt.defaultSize.toLong))
    }

  /** Equi-height histograms for numeric columns — the catalog statistic
    * Spark's filter estimation consults for RANGE predicates (min/max +
    * NDV alone force the uniform assumption, which a skewed column
    * breaks by orders of magnitude). Two bounded jobs for ALL requested
    * columns together, the same shapes ANALYZE's histogram path runs:
    *  1. `percentile_approx` → the numBins+1 equi-height bin endpoints
    *     (a mergeable quantile sketch per column — one scan);
    *  2. `ApproxCountDistinctForIntervals` → per-bin NDV (one HLL per
    *     bin, map-side combined — fixed-size state, one scan).
    * Nothing key-sized ever crosses the shuffle, so the pass holds at
    * any table size.
    */
  def histograms(df: DataFrame, cols: Seq[String], numBins: Int = 254): Map[String, Histogram] = {
    require(numBins >= 2, "a histogram needs at least 2 bins")
    val numeric = cols.filter(c => df.schema(c).dataType.isInstanceOf[NumericType])
    if (numeric.isEmpty) return Map.empty
    val pcts = (0 to numBins).map(i => i.toDouble / numBins)
    val epAggs = numeric.zipWithIndex.map { case (c, i) =>
      expr(s"percentile_approx(CAST(`$c` AS DOUBLE), array(${pcts.mkString(",")}), 10000)")
        .as(s"ep$i")
    }
    val epRow = df.agg(epAggs.head, epAggs.tail: _*).head()
    val withEp = numeric.zipWithIndex
      .filter { case (_, i) => !epRow.isNullAt(i) }
      .map { case (c, i) => (c, epRow.getSeq[Double](i).toArray) }
    if (withEp.isEmpty) return Map.empty
    val ndvAggs = withEp.zipWithIndex.flatMap { case ((c, ep), j) =>
      Seq(
        GraftSqlBridge.column(
          new ApproxCountDistinctForIntervals(
            GraftSqlBridge.expression(col(c).cast("double")),
            Literal.create(ep, ArrayType(DoubleType, containsNull = false)),
            0.05).toAggregateExpression()).as(s"ndv$j"),
        count(col(c)).as(s"nn$j"))
    }
    val ndvRow = df.agg(ndvAggs.head, ndvAggs.tail: _*).head()
    withEp.zipWithIndex.map { case ((c, ep), j) =>
      val ndvs = ndvRow.getSeq[Long](2 * j)
      val nonNull = ndvRow.getLong(2 * j + 1)
      // raw per-interval NDVs, zero allowed for duplicate-endpoint bins
      // — the exact shape Spark's own ANALYZE histogram path writes
      val bins = (0 until numBins).map(b =>
        HistogramBin(ep(b), ep(b + 1), ndvs(b))).toArray
      c -> Histogram(nonNull.toDouble / numBins, bins)
    }.toMap
  }

  /** Register `path` (a parquet dir) as a catalog table so statistics can
    * attach to it — temp views carry no catalog entry, hence no stats.
    */
  def registerParquetTable(spark: SparkSession, name: String, path: String): Unit =
    spark.sql(s"CREATE TABLE IF NOT EXISTS $name USING parquet LOCATION '$path'")

  /** Compute (one scan) and install catalog statistics for `table`;
    * returns what was installed. `cols` defaults to every supported
    * column. The collect is one row per column — schema-bounded, never
    * data-bounded.
    *
    * Histograms: columns in `histogramCols` additionally get an
    * equi-height histogram ([[histograms]] — two more bounded scans for
    * all of them together). When `histogramCols` is empty but the
    * session sets `spark.sql.statistics.histogram.enabled=true` (the
    * switch ANALYZE itself honors), every numeric target column gets
    * one — so the conf means the same thing on both ANALYZE paths.
    */
  def analyze(spark: SparkSession, table: String, cols: Seq[String] = Nil,
      histogramCols: Seq[String] = Nil, numBins: Int = 254): CatalogStatistics = {
    val df = spark.table(table)
    val targets =
      (if (cols.nonEmpty) cols else df.schema.map(_.name).toSeq)
        .filter(n => supported(df.schema(n).dataType))
    require(targets.nonEmpty, s"no stat-supported columns on $table")
    val histTargets =
      if (histogramCols.nonEmpty) histogramCols
      else if (spark.conf.getOption("spark.sql.statistics.histogram.enabled")
          .contains("true"))
        targets.filter(n => df.schema(n).dataType.isInstanceOf[NumericType])
      else Nil
    val hists =
      if (histTargets.isEmpty) Map.empty[String, Histogram]
      else histograms(df, histTargets, numBins)
    val rows = columnStats(df, targets).collect()
    val nRows = rows.headOption.map(_.getAs[Long]("n_rows")).getOrElse(0L)
    val colStats = rows.map { r =>
      val name = r.getAs[String]("column")
      val mm = minMaxSafe(df.schema(name).dataType)
      name -> CatalogColumnStat(
        distinctCount = Some(BigInt(r.getAs[Long]("ndv"))),
        min = if (mm) Option(r.getAs[String]("min_v")) else None,
        max = if (mm) Option(r.getAs[String]("max_v")) else None,
        nullCount = Some(BigInt(nRows - r.getAs[Long]("n_nonnull"))),
        avgLen = Some(r.getAs[Long]("avg_len")),
        maxLen = Some(r.getAs[Long]("max_len")),
        histogram = hists.get(name))
    }.toMap
    val stats = CatalogStatistics(
      sizeInBytes = GraftSqlBridge.planStats(df).sizeInBytes,
      rowCount = Some(BigInt(nRows)),
      colStats = colStats)
    GraftSqlBridge.alterTableStats(spark, table, stats)
    stats
  }
}
