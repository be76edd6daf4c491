package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `explain("formatted")` for selected registry queries to stdout
  * (source material for PLANS.md). Usage:
  *
  *   sbt "runMain graft.tools.PlanDump key1 key2 ..."
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
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
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    args.foreach { k =>
      println(s"===== $k =====")
      graft.Registry.byKey(k).query(spark, sf).explain("formatted")
    }
    spark.stop()
  }
}
