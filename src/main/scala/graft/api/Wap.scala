package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Write-Audit-Publish: the gate that keeps bad batches out of a
  * serving table. The batch is written to a STAGED directory, audited
  * by reading the staged files back (what was actually persisted, not
  * the in-memory frame — a lost column or a codec bug shows up here),
  * and only on a clean audit is the staging atomically promoted as the
  * table's next StoreIO generation. A failed audit deletes the staging
  * and leaves the live table untouched. The whole sequence runs under
  * the store writer lease.
  */
object Wap {

  final case class Report(
      published: Boolean,
      checksPassed: Int,
      checksFailed: Int,
      failures: Seq[String])

  /** Stage `batch`, run `checks` against the staged read-back, promote
    * on all-pass / clean up on any-fail. Checks are (name, predicate)
    * pairs over the staged DataFrame; a throwing predicate counts as a
    * failure (an unreadable staging must never publish).
    */
  def publish(
      spark: SparkSession,
      batch: DataFrame,
      dir: String,
      table: String,
      checks: Seq[(String, DataFrame => Boolean)]): Report =
    StoreIO.withLease(spark, dir) {
      val staged = s"$dir/$table-staged-${java.util.UUID.randomUUID().toString.take(8)}"
      batch.write.mode("overwrite").parquet(staged)
      val back = spark.read.parquet(staged)
      // NonFatal only: an OutOfMemoryError or thread interrupt must
      // propagate (and leave the staging for a retry to audit), not be
      // silently converted into "audit failed" + staging deleted — a
      // healthy batch must never be dropped by an infrastructure hiccup
      val results = checks.map { case (name, check) =>
        name -> (try check(back)
          catch { case scala.util.control.NonFatal(_) => false })
      }
      val failures = results.collect { case (name, false) => name }
      if (failures.isEmpty) {
        StoreIO.swapInDir(spark, staged, s"$dir/$table")
        Report(published = true, results.size, 0, Nil)
      } else {
        StoreIO.delete(spark, staged)
        Report(published = false, results.size - failures.size,
          failures.size, failures)
      }
    }
}
