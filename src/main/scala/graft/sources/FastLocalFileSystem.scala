package graft.sources

import java.nio.file.attribute.PosixFilePermission
import java.nio.file.attribute.PosixFilePermission._

import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Local `file://` FileSystem whose permission calls are JVM syscalls
  * instead of forked shell commands.
  *
  * Without libhadoop's NativeIO (not shipped in this jars-only install),
  * Hadoop's RawLocalFileSystem falls back to `Shell.execCommand("chmod",
  * ...)` on EVERY file create and mkdir, and `readlink` forks on every
  * FileContext rename — a full process fork+exec (page-table copy of a
  * multi-GB JVM) per scratch file. Profiled on `events_holt_stream`:
  * fork stacks were the single largest driver-side cost (ParquetFileWriter
  * create → chmod, HDFSMetadataLog write → rename → readlink), and every
  * parquet-writing query in the suite pays the same tax per part file.
  *
  * This subclass does exactly what NativeIO would: translate the
  * FsPermission bits to a `Files.setPosixFilePermissions` call. Semantics
  * are identical (same mode bits on the same file); only the fork is
  * gone. Wire it with `spark.hadoop.fs.file.impl` = this class, plus
  * `spark.sql.streaming.checkpointFileManagerClass` =
  * FileSystemBasedCheckpointFileManager so streaming checkpoints go
  * through the FileSystem API (FileContext's AbstractFileSystem resolves
  * its own local FS and would keep forking readlink per rename). */
class FastLocalFileSystem extends LocalFileSystem(new FastRawLocalFileSystem)

class FastRawLocalFileSystem extends RawLocalFileSystem {
  private val bits = Array(OWNER_READ, OWNER_WRITE, OWNER_EXECUTE,
    GROUP_READ, GROUP_WRITE, GROUP_EXECUTE,
    OTHERS_READ, OTHERS_WRITE, OTHERS_EXECUTE)

  override def setPermission(p: Path, perm: FsPermission): Unit = {
    val s = perm.toShort
    // setuid/setgid/sticky (bits 9-11) have no PosixFilePermission
    // representation — silently dropping them would deviate for any
    // non-scratch caller, since this FS is installed session-wide
    // (ADVICE r11 #3). Those calls take Hadoop's chmod path instead;
    // no scratch/parquet/checkpoint write ever sets a special bit, so
    // the fork-free fast path still covers the hot paths.
    if ((s & 0xE00) != 0) { super.setPermission(p, perm); return }
    try {
      val set = new java.util.HashSet[PosixFilePermission]()
      var i = 0
      while (i < 9) {
        if ((s & (1 << (8 - i))) != 0) set.add(bits(i))
        i += 1
      }
      java.nio.file.Files.setPosixFilePermissions(pathToFile(p).toPath, set)
      ()
    } catch {
      case _: java.nio.file.NoSuchFileException =>
        throw new java.io.FileNotFoundException(p.toString)
      case _: UnsupportedOperationException => // non-POSIX FS: Hadoop's path
        super.setPermission(p, perm)
    }
  }
}
