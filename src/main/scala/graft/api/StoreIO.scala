package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared plumbing for the persistent index stores (DedupIndex,
  * MinHashIndex, SketchStore, SessionStore): Hadoop-FS paths (so the
  * stores work on HDFS/S3, not just file://), generation reads with the
  * crash-window fallback, the staged-write + atomic-rename swap, and the
  * applied-batch ledger that makes replayed updates a no-op.
  */
object StoreIO {

  def fs(spark: SparkSession, dir: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(spark: SparkSession, path: String): Boolean =
    fs(spark, path).exists(new org.apache.hadoop.fs.Path(path))

  def delete(spark: SparkSession, path: String): Unit =
    fs(spark, path).delete(new org.apache.hadoop.fs.Path(path), true): Unit

  /** A stored generation, with the crash-window fallback: if a swap died
    * between its two renames, the retired generation is still complete
    * at `<name>-old`.
    */
  def read(spark: SparkSession, dir: String, name: String): DataFrame = {
    val f = fs(spark, dir)
    val cur = new org.apache.hadoop.fs.Path(s"$dir/$name")
    val old = new org.apache.hadoop.fs.Path(s"$dir/$name-old")
    spark.read.parquet(
      if (!f.exists(cur) && f.exists(old)) s"$dir/$name-old" else s"$dir/$name")
  }

  /** Stage-write `df`, retire the current generation to `<target>-old`,
    * promote the staged write, then drop the retired copy — every window
    * leaves a complete generation readable via [[read]].
    */
  def swapIn(df: DataFrame, spark: SparkSession, target: String): Unit = {
    val staged = s"$target-staged-${java.util.UUID.randomUUID().toString.take(8)}"
    df.write.mode("overwrite").parquet(staged)
    swapInDir(spark, staged, target)
  }

  /** Promote an ALREADY-WRITTEN staged directory as the next generation
    * of `target` — the multi-table variant of [[swapIn]]: a store whose
    * update must commit several tables atomically (e.g. data + ledger)
    * writes them all under one staged dir and swaps once, so no crash
    * window can separate them.
    */
  def swapInDir(spark: SparkSession, staged: String, target: String): Unit = {
    val f = fs(spark, target)
    val cur = new org.apache.hadoop.fs.Path(target)
    val old = new org.apache.hadoop.fs.Path(s"$target-old")
    f.delete(old, true)
    if (f.exists(cur)) require(f.rename(cur, old), s"swap: cannot retire $target")
    require(f.rename(new org.apache.hadoop.fs.Path(staged), cur),
      s"swap: cannot promote $staged")
    f.delete(old, true): Unit
  }

  /** The current generation directory of `target`, with the crash-window
    * fallback (`<target>-old` if a swap died between its renames).
    */
  def genPath(spark: SparkSession, target: String): String = {
    val f = fs(spark, target)
    if (!f.exists(new org.apache.hadoop.fs.Path(target)) &&
        f.exists(new org.apache.hadoop.fs.Path(s"$target-old"))) s"$target-old"
    else target
  }

  def ledgerDf(spark: SparkSession, ids: Seq[String]): DataFrame = {
    import spark.implicits._
    ids.toDF("batch_id")
  }

  /** True if `batchId` is recorded in `dir/applied`. */
  def applied(spark: SparkSession, dir: String, batchId: String): Boolean =
    read(spark, dir, "applied")
      .where(col("batch_id") === batchId).limit(1).count() > 0

  /** Record `batchId` in the ledger generation. */
  def recordApplied(spark: SparkSession, dir: String, batchId: String): Unit =
    swapIn(read(spark, dir, "applied").unionByName(ledgerDf(spark, Seq(batchId))),
      spark, s"$dir/applied")
}
