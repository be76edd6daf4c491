package graft.api

import java.net.URI
import java.nio.file.attribute.PosixFilePermission
import java.nio.file.attribute.PosixFilePermission._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{LocalFileSystem, Path => HPath, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Raw local FS with `setPermission` implemented via java.nio instead
  * of Hadoop's no-native-lib fallback, which FORKS `/bin/chmod` once
  * per created file and directory (Shell.execCommand). Driver-stack
  * sampling of the store-op bench loop showed ~89% of samples inside
  * that fork — on a multi-GB JVM a process fork per part-file dominates
  * every small parquet write (staged bucket generations, checkpoints,
  * commit metadata).
  */
class NioRawLocalFileSystem extends RawLocalFileSystem {

  private val bitPerms: Seq[(Int, PosixFilePermission)] = Seq(
    0x100 -> OWNER_READ, 0x80 -> OWNER_WRITE, 0x40 -> OWNER_EXECUTE,
    0x20 -> GROUP_READ, 0x10 -> GROUP_WRITE, 0x8 -> GROUP_EXECUTE,
    0x4 -> OTHERS_READ, 0x2 -> OTHERS_WRITE, 0x1 -> OTHERS_EXECUTE)

  override def setPermission(p: HPath, perm: FsPermission): Unit = {
    val bits = perm.toShort.toInt
    if ((bits & 0xE00) != 0) {
      // sticky/setuid/setgid cannot be expressed as PosixFilePermission;
      // fall back to Hadoop's chmod path for the rare caller that sets
      // them rather than silently dropping the special bits
      super.setPermission(p, perm)
    } else {
      val set = java.util.EnumSet.noneOf(classOf[PosixFilePermission])
      bitPerms.foreach { case (bit, pp) => if ((bits & bit) != 0) set.add(pp) }
      java.nio.file.Files.setPosixFilePermissions(pathToFile(p).toPath, set): Unit
    }
  }
}

/** `file://` filesystem for LOCAL-MODE runs: a [[LocalFileSystem]]
  * (so `FileSystem.getLocal`'s cast — used by e.g. RocksDB state-store
  * checkpoint uploads — still holds) over [[NioRawLocalFileSystem]],
  * with client-side checksums OFF: no `.crc` shadow file per written
  * file (half the file creations of the default), no fork per
  * permission set (see the raw delegate).
  *
  * LOCAL I/O PLUMBING ONLY, deliberately NOT a query/plan change: on a
  * real deployment the data path is HDFS/S3 whose FileSystem clients
  * never take this code path — installing it merely stops the local
  * bench from measuring `chmod` forks instead of the engine. Wired via
  * `spark.hadoop.fs.file.impl` in the repo-owned session builders.
  */
class NioLocalFileSystem extends LocalFileSystem(new NioRawLocalFileSystem) {
  override def initialize(uri: URI, conf: Configuration): Unit = {
    super.initialize(uri, conf)
    setWriteChecksum(false)
    setVerifyChecksum(false)
  }
}
