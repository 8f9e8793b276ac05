package graft.session

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Per-run scratch directories with guaranteed cleanup.
  *
  * Oracled entries and bench workloads exercise REAL persisted paths
  * (dedup indexes, table-format roundtrips, ANN indexes) and so write
  * parquet/log trees under `java.io.tmpdir`. Those trees must outlive
  * the DataFrame that lazily reads them (so eager deletion is wrong),
  * but must not accumulate across repeated verify/bench runs on a
  * long-lived machine. One JVM shutdown hook walks every directory
  * handed out here and deletes it recursively — a single hook holding
  * a synchronized list, not one thread per directory.
  */
object Scratch {
  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[Path]

  private lazy val hook: Unit = Runtime.getRuntime.addShutdownHook(
    new Thread(() => {
      dirs.forEach { p =>
        // per-directory isolation: one undeletable dir (a file still
        // held open by a lingering executor thread at shutdown) must
        // not abort cleanup of the rest
        try {
          if (Files.exists(p)) {
            val walk = Files.walk(p)
            try walk.sorted(Comparator.reverseOrder[Path]())
              .forEach(f => Files.deleteIfExists(f))
            finally walk.close()
          }
        } catch { case _: Exception => () }
      }
    }, "graft-scratch-cleanup"))

  /** A fresh temp directory deleted recursively at JVM exit. */
  def dir(prefix: String): String = {
    hook
    val p = Files.createTempDirectory(prefix)
    dirs.add(p)
    p.toString
  }
}
