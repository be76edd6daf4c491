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
}
