package graft.operators

import java.net.URI
import org.apache.hadoop.fs.{FSDataOutputStream, FileStatus, Path,
  RawLocalFileSystem}

/** Object-store simulator over the local FS — the deployment surface
  * the artifact lease/pin machinery must survive (r15 verdict #1/#2):
  *
  *   - `setTimes` is a SILENT no-op (the Hadoop base-class default;
  *     S3A/GCS behave the same), so nothing mtime-touch-based works;
  *   - every reported mtime is FROZEN at a constant, so staleness
  *     decisions keyed on mtime advancement never see one — only
  *     content (length, body) changes are observable;
  *   - with [[ObjSimFileSystem.nonAtomicCreate]] set, exclusive create
  *     of `.manifest.lock` silently succeeds over an existing file —
  *     the HEAD-then-PUT race of stores without conditional create.
  *
  * Registered under the `objsim:` scheme via
  * `fs.objsim.impl` in the Hadoop conf; backed by the real local FS so
  * everything else (rename, delete, open) behaves normally. */
class ObjSimFileSystem extends RawLocalFileSystem {
  override def getUri: URI = URI.create("objsim:///")

  private def freeze(st: FileStatus): FileStatus =
    new FileStatus(st.getLen, st.isDirectory, st.getReplication,
      st.getBlockSize, ObjSimFileSystem.FrozenMtime, st.getPath)

  override def getFileStatus(f: Path): FileStatus =
    freeze(super.getFileStatus(f))

  override def listStatus(f: Path): Array[FileStatus] =
    super.listStatus(f).map(freeze)

  override def setTimes(p: Path, mtime: Long, atime: Long): Unit = ()

  override def create(f: Path, overwrite: Boolean): FSDataOutputStream =
    super.create(f, overwrite || (ObjSimFileSystem.nonAtomicCreate &&
      f.getName == ".manifest.lock"))
}

object ObjSimFileSystem {
  val FrozenMtime: Long = 1600000000000L
  /** When set, exclusive create of the lock file never refuses —
    * simulating two mutators whose HEAD-then-PUT create both "won". */
  @volatile var nonAtomicCreate: Boolean = false
}
