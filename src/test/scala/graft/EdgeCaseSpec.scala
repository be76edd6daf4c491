package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every operator must behave (not throw) on empty inputs — the shape a
  * partition-pruned or freshly-bootstrapped pipeline sees constantly.
  */
class EdgeCaseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val emptyDir: String = {
    val dir = "target/tmp/sfempty"
    if (!new java.io.File(s"$dir/region.parquet").exists()) {
      Tables.plainNames.foreach { n =>
        Tables.t(spark, TestSpark.sf, n).limit(0)
          .write.mode("overwrite").parquet(s"$dir/$n.parquet")
      }
      // events needs its raw (nanos-as-long) shape preserved
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"${TestSpark.sf}/events.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
    }
    dir
  }

  test("every operator runs on empty tables without throwing") {
    val failures = Registry.all.flatMap { op =>
      try {
        op.query(spark, emptyDir).count()
        None
      } catch {
        case e: Throwable => Some(s"${op.key}: ${e.getMessage.take(120)}")
      }
    }
    assert(failures.isEmpty, s"ops failing on empty input:\n${failures.mkString("\n")}")
  }

  private lazy val oneRowDir: String = {
    val dir = "target/tmp/sfone"
    if (!new java.io.File(s"$dir/region.parquet").exists()) {
      Tables.plainNames.foreach { n =>
        Tables.t(spark, TestSpark.sf, n).limit(1)
          .write.mode("overwrite").parquet(s"$dir/$n.parquet")
      }
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"${TestSpark.sf}/events.parquet").limit(1)
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
    }
    dir
  }

  test("every operator runs on single-row tables without throwing") {
    // one row exercises the other degenerate shape: self-joins with no
    // partner, windows of size 1, denominators built from a lone group
    val failures = Registry.all.flatMap { op =>
      try {
        op.query(spark, oneRowDir).count()
        None
      } catch {
        case e: Throwable => Some(s"${op.key}: ${e.getMessage.take(120)}")
      }
    }
    assert(failures.isEmpty, s"ops failing on single-row input:\n${failures.mkString("\n")}")
  }
}
