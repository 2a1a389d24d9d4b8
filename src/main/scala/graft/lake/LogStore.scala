package graft.lake

import java.nio.file.{Files, Path, StandardOpenOption}

/** The one primitive every GraftLake commit's atomicity rests on:
  * EXCLUSIVE CREATE of a small immutable file. On POSIX/HDFS that is
  * `O_EXCL` / `create(overwrite = false)`; on object stores it is a
  * conditional put (`If-None-Match: *` on S3, `ifGenerationMatch=0`
  * on GCS). Everything above this seam — optimistic commits, version
  * reservation markers, the multi-table transaction decision file —
  * is store-agnostic, so moving the engine off a POSIX filesystem
  * means implementing exactly these three methods, not re-auditing
  * the commit protocol (the same seam Delta ships as `LogStore`).
  *
  * Paths passed here are always SMALL CONTROL FILES (commit JSONs,
  * decision markers) — bulk data/parquet IO never routes through the
  * seam, so a remote implementation adds no data-path overhead.
  */
trait LogStore {

  /** Atomically create `path` with `content` if and only if it does
    * not exist. Returns true when THIS caller created it; false when
    * the path already existed (a concurrent creator won). Must never
    * leave a partially-written visible file: losers and readers must
    * see either nothing or the full content.
    */
  def createExclusive(path: Path, content: Array[Byte]): Boolean

  def read(path: Path): Array[Byte]

  def exists(path: Path): Boolean
}

/** Local-filesystem implementation: `CREATE_NEW` is atomic on POSIX
  * (and on HDFS-compatible mounts). The write is small enough to be
  * a single syscall, so a reader that sees the file sees the content.
  */
object PosixLogStore extends LogStore {

  override def createExclusive(path: Path, content: Array[Byte]): Boolean = {
    Option(path.getParent).foreach(Files.createDirectories(_))
    try {
      Files.write(path, content,
        StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    }
  }

  override def read(path: Path): Array[Byte] = Files.readAllBytes(path)

  override def exists(path: Path): Boolean = Files.exists(path)
}
