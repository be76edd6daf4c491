package graft.api

import graft.{Pipeline, Stage}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The snapflow user surface on Spark: an Environment owns storages
  * (named datasets), a graph of named function nodes, and produce()/run()
  * entry points. A snapflow user's
  *
  * {{{
  * env = Environment(...); env.add_node("clean", clean_fn, input="raw")
  * env.produce("clean")
  * }}}
  *
  * becomes
  *
  * {{{
  * val env = new Environment(spark)
  * env.addSource("raw", spark.read.parquet(...))
  * env.addNode("clean", Seq("raw"))(dfs => cleanFn(dfs.head))
  * env.produce("clean")
  * }}}
  *
  * Nodes are lazy DataFrames — Catalyst fuses the whole produced graph
  * into one plan; materialize() is the StoredDataBlock step.
  */
final class Environment(val spark: SparkSession) {

  private val sources = collection.mutable.Map[String, DataFrame]()
  private val nodes = collection.mutable.LinkedHashMap[String, Stage]()

  def addSource(name: String, df: DataFrame): this.type = {
    sources(name) = df; this
  }

  /** Register a parquet-backed source (the common storage). */
  def addParquetSource(name: String, path: String): this.type =
    addSource(name, spark.read.parquet(path))

  def addNode(name: String, deps: Seq[String])(fn: Seq[DataFrame] => DataFrame): this.type = {
    require(!nodes.contains(name), s"node already declared: $name")
    nodes(name) = Stage(deps, fn); this
  }

  /** One-input convenience arity (most snapflow functions). */
  def addNode1(name: String, dep: String)(fn: DataFrame => DataFrame): this.type =
    addNode(name, Seq(dep))(dfs => fn(dfs.head))

  /** Resolve and return the node's (lazy) output block. */
  def produce(name: String): DataFrame =
    new Pipeline(nodes.toMap).run(name, sources.toMap)

  /** Dependency-first execution order of a node (the resolved graph). */
  def executionOrder(name: String): Seq[String] =
    new Pipeline(nodes.toMap).order(name)

  /** Materialize a node to parquet and return the re-read block —
    * snapflow's immutable StoredDataBlock.
    */
  def materialize(name: String, path: String): DataFrame = {
    produce(name).write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }

  /** Batch-incremental run (snapflow's DataBlockLog consumption
    * accounting): produce `name`, keep only rows with `tsCol` past the
    * watermark stored from the previous run, append them to `outDir`,
    * and advance the stored watermark. Each call processes exactly the
    * unconsumed rows; re-running with no new input appends nothing.
    * The watermark is a single driver-side value (one tiny file) — the
    * data path stays fully distributed.
    */
  def runIncremental(name: String, tsCol: String, stateDir: String, outDir: String): Long = {
    import org.apache.spark.sql.functions.{col, max}
    val wmFile = new java.io.File(stateDir, s"$name.watermark")
    val prev = if (wmFile.exists())
      new String(java.nio.file.Files.readAllBytes(wmFile.toPath)).trim.toLong
    else Long.MinValue
    val fresh = produce(name)
      .where(col(tsCol).cast("long") > prev)
    val stats = fresh.agg(
      max(col(tsCol).cast("long")).as("wm"),
      org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"))
      .head()
    val n = stats.getLong(1)
    if (n > 0) {
      fresh.write.mode("append").parquet(outDir)
      wmFile.getParentFile.mkdirs()
      java.nio.file.Files.write(wmFile.toPath, stats.getLong(0).toString.getBytes)
    }
    n
  }
}
