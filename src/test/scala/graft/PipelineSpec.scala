package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pipeline evaluates a diamond DAG with memoized shared upstream") {
    var sourceBuilds = 0
    val p = Pipeline(
      "src" -> Pipeline.source {
        sourceBuilds += 1
        Seq((1, "a"), (2, "b"), (3, "a")).toDF("id", "k")
      },
      "left" -> Pipeline.map1("src")(_.groupBy("k").agg(count(lit(1)).as("n"))),
      "right" -> Pipeline.map1("src")(_.select(col("k")).distinct()),
      "out" -> Pipeline.map2("left", "right")((l, r) => l.join(r, "k")))

    val out = p.run("out").orderBy("k").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("a", 2L), ("b", 1L)))
    assert(sourceBuilds == 1, "shared upstream must be built once")
    assert(p.order("out") == Seq("src", "left", "right", "out"))
  }

  test("pipeline rejects cycles and undeclared stages") {
    val p = Pipeline(
      "a" -> Pipeline.map1("b")(identity),
      "b" -> Pipeline.map1("a")(identity))
    assertThrows[IllegalArgumentException](p.run("a"))
    assertThrows[NoSuchElementException](Pipeline("x" -> Pipeline.map1("missing")(identity)).run("x"))
  }

  test("external sources can be injected") {
    val p = Pipeline("n" -> Pipeline.map1("ext")(_.withColumn("y", col("x") * 2)))
    val got = p.run("n", Map("ext" -> Seq(1, 2).toDF("x"))).agg(sum("y")).head.getLong(0)
    assert(got == 6L)
  }

  test("incremental run-log: a re-run over grown input consumes only the delta") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_runlog_").toString
    // runIncremental's returned count IS an Observation row count taken
    // on the append pass — asserting on it asserts what the write job
    // actually processed, not a separate recount
    def runEpoch(upTo: Long): Long = {
      val env = new api.Environment(spark)
      env.addSource("raw",
        spark.range(0, upTo).select(col("id").as("k"), (col("id") * 10).as("v")))
      env.addNode1("clean", "raw")(identity)
      env.runIncremental("clean", "k", s"$tmp/state", s"$tmp/out")
    }

    assert(runEpoch(100) == 100, "epoch 1 consumes the full initial snapshot")
    assert(runEpoch(250) == 150, "epoch 2 consumes exactly the 150 new rows")
    assert(runEpoch(250) == 0, "unchanged input consumes nothing")

    // the appended output holds each row exactly once
    assert(spark.read.parquet(s"$tmp/out").count() == 250)
    assert(spark.read.parquet(s"$tmp/out").select("k").distinct().count() == 250)

    // the run-log is the queryable consumption history
    val log = api.RunLog.read(spark, s"$tmp/state").orderBy("run_seq")
      .collect().map(r => (r.getAs[Long]("run_seq"), r.getAs[Long]("rows_consumed"),
        r.getAs[Long]("watermark")))
    assert(log.toSeq == Seq((1L, 100L, 99L), (2L, 150L, 249L), (3L, 0L, 249L)))
  }
}
