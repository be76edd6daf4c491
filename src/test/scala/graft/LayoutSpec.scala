package graft

import graft.api.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order clustered writes: the Morton layout must make min/max file
  * skipping work on EVERY clustered dimension, where a single-column
  * sort only serves its own column.
  */
class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("z-order layout prunes files on BOTH dimensions; linear sort on one") {
    val orders = spark.read.parquet(s"${TestSpark.sf}/orders.parquet")
    val base = java.nio.file.Files.createTempDirectory("graft_layout_").toString

    Layout.zorderWrite(orders,
      Seq((col("o_custkey"), 0.0, 150.0), (col("o_totalprice"), 0.0, 512000.0)),
      s"$base/z", nFiles = 16)
    orders.repartitionByRange(16, col("o_custkey"))
      .sortWithinPartitions("o_custkey")
      .write.parquet(s"$base/lin")

    // narrow predicate on each dimension (~1/8 of the value range)
    val (zn, zPrice) = Layout.skippingReport(spark, s"$base/z", "o_totalprice", 0, 64000)
    val (_, zCust) = Layout.skippingReport(spark, s"$base/z", "o_custkey", 0, 18)
    val (ln, linPrice) = Layout.skippingReport(spark, s"$base/lin", "o_totalprice", 0, 64000)
    val (_, linCust) = Layout.skippingReport(spark, s"$base/lin", "o_custkey", 0, 18)

    assert(zn == 16 && ln == 16, "both layouts wrote 16 files")
    assert(zPrice >= 4, s"z layout skips a real fraction on price (got $zPrice/16)")
    assert(zCust >= 4, s"z layout skips a real fraction on custkey (got $zCust/16)")
    assert(linCust >= 12, s"linear layout serves its own sort column (got $linCust/16)")
    assert(zPrice > linPrice,
      s"z layout must beat the custkey-sorted layout on the OTHER dimension " +
        s"($zPrice vs $linPrice files skipped)")

    // layout changes bytes on disk, never content
    val a = spark.read.parquet(s"$base/z")
    assert(a.count() == orders.count() &&
      a.exceptAll(orders).isEmpty && orders.exceptAll(a).isEmpty)
  }

  test("mortonKey survives wide bit widths (Int-shift wrap regression)") {
    // bits >= 31 used to wrap the Int shift and collapse every key to 0
    import spark.implicits._
    val df = Seq(0.1, 0.4, 0.7, 0.9).toDF("a")
      .withColumn("z", Layout.mortonKey(Seq((col("a"), 0.0, 1.0)), bits = 32))
    val keys = df.collect().map(_.getLong(1))
    assert(keys.distinct.length == 4, s"keys must spread, got ${keys.toSeq}")
    assert(keys.forall(k => k >= 0 && k < (1L << 32)))
    assert(keys.sorted.sameElements(keys), "single-dim morton preserves order")

    // the full admitted boundary: 52 bits is the last width where the
    // double-division bucket/bit arithmetic is exact (2^52 < 2^53);
    // order preservation at the boundary proves no silent corruption,
    // and 53 bits must be rejected up front rather than corrupt
    val wide = Seq(0.1, 0.4, 0.7, 0.9).toDF("a")
      .withColumn("z", Layout.mortonKey(Seq((col("a"), 0.0, 1.0)), bits = 52))
      .collect().map(_.getLong(1))
    assert(wide.distinct.length == 4 && wide.sorted.sameElements(wide))
    assert(wide.forall(k => k >= 0 && k < (1L << 52)))
    intercept[IllegalArgumentException] {
      Layout.mortonKey(Seq((col("a"), 0.0, 1.0)), bits = 53)
    }
  }

  test("mortonKey stays within bounds and is monotone in locality") {
    import spark.implicits._
    val df = (for { a <- 0 until 64; b <- 0 until 64 } yield (a.toDouble, b.toDouble))
      .toDF("a", "b")
      .withColumn("z", Layout.mortonKey(
        Seq((col("a"), 0.0, 64.0), (col("b"), 0.0, 64.0)), bits = 6))
    val rows = df.collect()
    assert(rows.map(_.getLong(2)).distinct.length == 64 * 64, "bijective on the grid")
    assert(rows.forall(r => r.getLong(2) >= 0 && r.getLong(2) < (1L << 12)))
  }
}
