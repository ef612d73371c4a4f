package graft.format

import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{ChecksumFs, DelegateToFileSystem, FileStatus, LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Local filesystem without the fork/exec tax (guide §7.3 driver dumps →
  * guide §1.2 "fix the per-task work" applied to the DRIVER).
  *
  * Hadoop's `RawLocalFileSystem` without libhadoop natives shells out a
  * whole child PROCESS for metadata operations the JVM has had syscalls
  * for since JDK 7:
  *   - `setPermission` → `fork/exec chmod` — hit by EVERY
  *     `create(path, perm)` and every `mkdirs` (once per created level),
  *     i.e. every parquet task/committer file, every commit-log write,
  *     every streaming offset/commit-log entry;
  *   - `getFileLinkStatus` → `fork/exec readlink` — hit by every
  *     FileContext rename (atomicReplace, checkpoint managers).
  *
  * A stack sample of q121 (CDC replicate) showed these forks as the
  * single largest non-idle driver/stream-thread bucket. Each fork costs
  * ~5–15 ms wall on a busy 32-core JVM; a streaming lifecycle pays
  * hundreds of them.
  *
  * These subclasses keep the EXACT Hadoop semantics (checksum files,
  * permission bits, symlink behavior — exotic bits and real symlinks
  * fall back to the stock shell path) and replace the forks with NIO
  * calls. Registered via `fs.file.impl` / `fs.AbstractFileSystem.file.impl`
  * ([[graft.Tables.requiredConfs]]). Cluster deployments (HDFS, object
  * stores) never shell out on this path — this recovers the same
  * syscall-shaped behavior for local runs.
  */
class NioRawLocalFileSystem extends RawLocalFileSystem {

  override def setPermission(p: Path, permission: FsPermission): Unit = {
    val bits: Int = permission.toShort.toInt
    // sticky/setuid/setgid bits have no PosixFilePermission mapping —
    // keep the stock (shell) path for those rare calls
    if ((bits & ~0x1ff) != 0) super.setPermission(p, permission)
    else {
      import java.nio.file.attribute.PosixFilePermission._
      val order = Array(OWNER_READ, OWNER_WRITE, OWNER_EXECUTE,
        GROUP_READ, GROUP_WRITE, GROUP_EXECUTE,
        OTHERS_READ, OTHERS_WRITE, OTHERS_EXECUTE)
      val perms = java.util.EnumSet
        .noneOf(classOf[java.nio.file.attribute.PosixFilePermission])
      var i = 0
      while (i < 9) {
        if ((bits & (0x100 >> i)) != 0) perms.add(order(i))
        i += 1
      }
      try java.nio.file.Files.setPosixFilePermissions(
        pathToFile(p).toPath, perms)
      catch {
        case e: java.nio.file.NoSuchFileException =>
          throw new java.io.FileNotFoundException(e.getMessage)
      }
      ()
    }
  }

  override def getFileLinkStatus(f: Path): FileStatus = {
    val nio = pathToFile(f).toPath
    // real symlinks keep the stock semantics (readlink for the target);
    // everything else — the overwhelming case — is a plain stat
    if (java.nio.file.Files.isSymbolicLink(nio)) super.getFileLinkStatus(f)
    else getFileStatus(f)
  }
}

/** `fs.file.impl` registration: stock [[LocalFileSystem]] (checksummed)
  * over the NIO raw filesystem.
  */
class NioLocalFileSystem extends LocalFileSystem(new NioRawLocalFileSystem)

/** FileContext twin of [[NioRawLocalFileSystem]] (the `RawLocalFs`
  * shape).
  */
class NioRawLocalFs(uri: URI, conf: Configuration)
    extends DelegateToFileSystem(uri, new NioRawLocalFileSystem, conf,
      "file", false)

/** `fs.AbstractFileSystem.file.impl` registration: stock checksummed
  * FileContext filesystem (the `LocalFs` shape) over the NIO raw.
  */
class NioLocalFs(uri: URI, conf: Configuration)
    extends ChecksumFs(new NioRawLocalFs(uri, conf))
