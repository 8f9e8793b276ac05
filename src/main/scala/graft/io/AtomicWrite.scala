package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}

/** Create-exclusive claims for optimistic-concurrency commit logs.
  *
  * Hadoop's `FileSystem.create(path, overwrite = false)` on the LOCAL
  * filesystem is check-then-create — NOT atomic. Two writers racing for
  * the same commit file (`N.json`, `vN.metadata.json`) can both pass the
  * existence check, both "win" the version claim, and the loser's commit
  * silently vanishes under the winner's (last write wins). On HDFS the
  * exclusive create is arbitrated server-side and is safe; local mode —
  * the mode every test and `local[32]` deployment runs — needs the
  * OS-level `O_EXCL` from nio instead.
  */
object AtomicWrite {

  /** Write `body` to `target` iff no other writer holds the path.
    * Returns true on a won claim, false on a lost one (caller retries
    * with the next version). The claim-then-body torn window on
    * non-local filesystems is unchanged — readers already parse-validate
    * and wait out young unparseable claims. */
  def claim(fs: FileSystem, target: Path, body: Array[Byte]): Boolean =
    if (fs.getUri.getScheme == "file") {
      val local = java.nio.file.Paths.get(target.toUri.getPath)
      if (local.getParent != null)
        java.nio.file.Files.createDirectories(local.getParent)
      try {
        val out = java.nio.file.Files.newOutputStream(local,
          java.nio.file.StandardOpenOption.CREATE_NEW,
          java.nio.file.StandardOpenOption.WRITE)
        try out.write(body) finally out.close()
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }
    } else {
      try {
        val out = fs.create(target, false)
        try out.write(body) finally out.close()
        true
      } catch {
        case _: java.io.IOException => false
      }
    }
}
