package graft.api

import org.apache.spark.sql.SparkSession

/** Opinionated session builders: the configuration surface that decides
  * whether the operator library survives 100 TB, collected in one place
  * with the reasoning attached. Local test sessions (TestSpark, Verify,
  * Bench) deliberately stay minimal; this is what a cluster deployment
  * starts from.
  */
object Sessions {

  /** Production defaults for a large cluster run.
    *
    * - AQE on with partition coalescing and skew-join splitting: runtime
    *   statistics re-plan what no static estimate gets right at 100 TB —
    *   post-shuffle partition sizing and the one key that holds half the
    *   corpus.
    * - `shufflePartitions` is the static pre-AQE parallelism; size it at
    *   ~2-3x total executor cores. AQE coalesces down from there, so
    *   erring high costs little; erring low starves the cluster.
    * - 256 MiB scan partitions: big enough to amortize task overhead on
    *   columnar scans, small enough that a task retry is cheap.
    * - 64 MiB broadcast threshold: dimensions (region/nation/customer
    *   slices, centroid tables, vocab tables) should broadcast; fact
    *   tables never fit anyway. AQE upgrades shuffle joins to broadcast
    *   when runtime sizes allow.
    * - zstd parquet output: ~10-20% more write CPU for materially
    *   smaller cold storage than snappy; scans stay vectorized.
    * - UTC session timezone: the engine's determinism contract assumes
    *   it (every oracle comparison runs under UTC).
    * - CBO + join reorder ON: AQE only sees sizes after a stage runs;
    *   catalog column stats (installed by [[Stats.analyze]]'s one-scan
    *   job) let the optimizer pick join sides and multi-join order
    *   BEFORE the first shuffle, where the 100-TB mistakes happen.
    *   Without installed stats these flags change nothing, so they are
    *   safe-on by default.
    */
  def production(
      appName: String,
      shufflePartitions: Int = 2048): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.files.maxPartitionBytes", (256L * 1024 * 1024).toString)
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.parquet.compression.codec", "zstd")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.cbo.joinReorder.enabled", "true")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")

  /** The same knobs scaled for a laptop/CI smoke run, plus local-only
    * I/O plumbing: `file://` without `.crc` shadow files and without
    * Hadoop's fork-a-`/bin/chmod`-per-file permission fallback (see
    * [[NioLocalFileSystem]]) — a cluster run never takes this path, its
    * data FS is HDFS/S3.
    */
  def local(appName: String, cores: Int = 4): SparkSession.Builder =
    production(appName, shufflePartitions = cores)
      .master(s"local[$cores]")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl",
        classOf[NioLocalFileSystem].getName)
}
