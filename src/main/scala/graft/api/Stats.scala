package graft.api

import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.catalog.{CatalogColumnStat, CatalogStatistics}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-scan ANALYZE: compute the full cost-based-optimizer input surface
  * — row count plus per-column non-null count, exact NDV, min/max and
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
    */
  def columnStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnStats needs at least one column")
    val aggs = count(lit(1)).as("n_rows") +: cols.zipWithIndex.flatMap { case (c, i) =>
      val dt = df.schema(c).dataType
      val (avgLen, maxLen) = dt match {
        case StringType | BinaryType =>
          (ceil(coalesce(avg(length(col(c))), lit(0))).cast("long"),
            coalesce(max(length(col(c))), lit(0)).cast("long"))
        case _ => (lit(dt.defaultSize.toLong), lit(dt.defaultSize.toLong))
      }
      Seq(count(col(c)).as(s"nn$i"),
        countDistinct(col(c)).as(s"nd$i"),
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

  /** Register `path` (a parquet dir) as a catalog table so statistics can
    * attach to it — temp views carry no catalog entry, hence no stats.
    */
  def registerParquetTable(spark: SparkSession, name: String, path: String): Unit =
    spark.sql(s"CREATE TABLE IF NOT EXISTS $name USING parquet LOCATION '$path'")

  /** Compute (one scan) and install catalog statistics for `table`;
    * returns what was installed. `cols` defaults to every supported
    * column. The collect is one row per column — schema-bounded, never
    * data-bounded.
    */
  def analyze(spark: SparkSession, table: String, cols: Seq[String] = Nil): CatalogStatistics = {
    val df = spark.table(table)
    val targets =
      (if (cols.nonEmpty) cols else df.schema.map(_.name).toSeq)
        .filter(n => supported(df.schema(n).dataType))
    require(targets.nonEmpty, s"no stat-supported columns on $table")
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
        maxLen = Some(r.getAs[Long]("max_len")))
    }.toMap
    val stats = CatalogStatistics(
      sizeInBytes = GraftSqlBridge.planStats(df).sizeInBytes,
      rowCount = Some(BigInt(nRows)),
      colStats = colStats)
    GraftSqlBridge.alterTableStats(spark, table, stats)
    stats
  }
}
