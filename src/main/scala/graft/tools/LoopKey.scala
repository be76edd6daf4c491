package graft.tools

import org.apache.spark.sql.SparkSession

/** Run one registry key in a tight loop (driver-stack sampling target
  * for optimization triage). Usage:
  *
  *   sbt "runMain graft.tools.LoopKey /root/testdata/sf0.1 30 core_merge_sql"
  */
object LoopKey {
  def main(args: Array[String]): Unit = {
    val Array(dir, reps, key) = args: @unchecked
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // local-mode IO plumbing: no .crc shadow files, no /bin/chmod fork
      // per created file (see graft.api.NioLocalFileSystem)
      .config("spark.hadoop.fs.file.impl", classOf[graft.api.NioLocalFileSystem].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => }
    println(s"LOOPKEY_PID=${ProcessHandle.current().pid()}")
    for (_ <- 1 to reps.toInt)
      try { graft.Registry.byKey(key).query(spark, dir).count(); () }
      catch { case e: Throwable => println(s"FAILED: ${e.getMessage.take(120)}") }
    spark.stop()
  }
}
