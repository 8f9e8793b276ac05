package graft.table

import java.util.UUID
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A minimal snapshot transaction log — the table-format layer the
  * reference gets from Delta/Iceberg (`s3/_read_deltalake.py:38-136`
  * versioned reads, `s3/_write_deltalake.py:51-226` atomic commits,
  * `s3/_s3_tables_iceberg.py:29-250` snapshot / `VERSION AS OF`), built
  * on the one primitive every format bottoms out on: data files first,
  * then an atomically-created manifest that makes them visible.
  *
  * Layout:
  * {{{
  *   <table>/files/<commit-uuid>/part-*.parquet   immutable data dirs
  *   <table>/_graft_log/v00000001.manifest        snapshot manifests
  * }}}
  *
  * A manifest names the data directories visible in that snapshot.
  * Commit = exclusive-create of `v{N+1}`: two concurrent writers race on
  * the version number and exactly one wins; the loser re-resolves the
  * table state and retries (optimistic concurrency — the Delta protocol).
  * Readers resolve the highest PARSEABLE manifest, so a torn write (crash
  * mid-manifest) is invisible. Old snapshots stay readable (`VERSION AS
  * OF`) until [[vacuum]] drops their unreferenced data dirs.
  *
  * Scale: a commit's cost is the data write plus one small manifest; the
  * log directory holds one file per commit (compaction of manifests would
  * follow the same exclusive-create path). Reads open only the
  * directories the chosen snapshot names.
  */
object TxnLog {

  final case class Snapshot(
      version: Int,
      op: String,
      timestampMs: Long,
      dataDirs: Seq[String])

  final class CommitConflict(message: String) extends RuntimeException(message)

  private val LogDir = "_graft_log"
  private val MaxRetries = 10

  // ---- commits ------------------------------------------------------------

  /** Create a new table (version 1). Fails if a log already exists. */
  def create(df: DataFrame, path: String): Snapshot = {
    val (fs, root) = fsFor(df.sparkSession, path)
    require(!fs.exists(new Path(root, LogDir)),
      s"table already exists at $path")
    commitData(df, path, "create", replace = true)
  }

  /** Append rows as a new snapshot. */
  def append(df: DataFrame, path: String): Snapshot =
    commitData(df, path, "append", replace = false)

  /** Replace the table contents as a new snapshot. */
  def overwrite(df: DataFrame, path: String): Snapshot =
    commitData(df, path, "overwrite", replace = true)

  /** MERGE (upsert by key) as a single snapshot: rows of the current
    * snapshot not matched by `source` keys, plus `source` — the
    * `to_deltalake`/`to_iceberg` merge path with snapshot isolation (the
    * read and the commit see one consistent version; a concurrent commit
    * in between raises [[CommitConflict]] handled by retry). */
  def merge(
      spark: SparkSession,
      path: String,
      source: DataFrame,
      keys: Seq[String]): Snapshot = {
    var attempt = 0
    while (true) {
      val snap = currentSnapshot(spark, path).getOrElse(
        throw new IllegalArgumentException(s"no table at $path"))
      val target = readSnapshot(spark, path, snap)
      val kept = target.join(
        source.select(keys.map(col): _*).distinct(), keys, "left_anti")
      val merged = kept.unionByName(source.select(target.columns.map(col): _*))
      try
        return commitData(merged, path, "merge", replace = true,
          expectedParent = Some(snap.version))
      catch {
        case _: CommitConflict if attempt < MaxRetries => attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Write data under files/<uuid> then publish a manifest. `replace`
    * decides whether prior snapshot dirs carry over (append) or not
    * (create/overwrite/merge). */
  private def commitData(
      df: DataFrame,
      path: String,
      op: String,
      replace: Boolean,
      expectedParent: Option[Int] = None): Snapshot = {
    val spark = df.sparkSession
    val (_, root) = fsFor(spark, path)
    // data files first, invisible until the manifest lands
    val dirName = s"files/${UUID.randomUUID()}"
    df.write.mode("overwrite").parquet(new Path(root, dirName).toString)
    publish(spark, path, op, Seq(dirName), replace, expectedParent)
  }

  /** Publish already-written data dirs (paths relative to the table
    * root) as ONE snapshot — the single-transaction streaming commit
    * path: micro-batches stage dirs, this makes them all visible
    * atomically. */
  def commitStagedDirs(
      spark: SparkSession,
      path: String,
      dirs: Seq[String],
      op: String = "append"): Snapshot =
    publish(spark, path, op, dirs, replace = false, expectedParent = None)

  /** Optimistic manifest publication loop. */
  private def publish(
      spark: SparkSession,
      path: String,
      op: String,
      newDirs: Seq[String],
      replace: Boolean,
      expectedParent: Option[Int]): Snapshot = {
    val (fs, root) = fsFor(spark, path)
    var attempt = 0
    while (attempt <= MaxRetries) {
      // ONE listing yields both the latest parseable snapshot and the
      // highest claimed version number. Two separate listings race: a
      // commit completing between them would be skipped over and its
      // data dirs dropped from the successor (a lost update). From a
      // single listing, every claimed manifest is either complete
      // (local link(2) publication is atomic) or a dead torn leftover
      // that is safe to skip.
      val (current, claimed) = logState(fs, root)
      expectedParent.foreach { p =>
        if (current.map(_.version).getOrElse(0) != p)
          throw new CommitConflict(
            s"table advanced past v$p; merge must re-resolve")
      }
      val version = math.max(current.map(_.version).getOrElse(0),
        claimed) + 1
      val dirs =
        if (replace) newDirs
        else current.map(_.dataDirs).getOrElse(Nil) ++ newDirs
      val snap = Snapshot(version, op, System.currentTimeMillis(), dirs)
      if (tryPublish(fs, root, snap)) return snap
      attempt += 1
      if (expectedParent.isDefined)
        throw new CommitConflict(s"lost the race for v$version")
    }
    throw new CommitConflict(s"could not commit after $MaxRetries retries")
  }

  /** One listing → (latest parseable snapshot, highest claimed version
    * number — parseable or torn). */
  private def logState(fs: FileSystem, root: Path): (Option[Snapshot], Int) = {
    val logDir = new Path(root, LogDir)
    if (!fs.exists(logDir)) return (None, 0)
    val manifests = fs.listStatus(logDir)
      .filter { st =>
        val n = st.getPath.getName
        n.startsWith("v") && n.endsWith(".manifest")
      }
      .sortBy(_.getPath.getName)
    val claimed = manifests.map(_.getPath.getName)
      .map(_.stripPrefix("v").stripSuffix(".manifest").toInt)
      .foldLeft(0)(math.max)
    val latest = manifests.reverseIterator
      .map(st => parseManifest(fs, st.getPath))
      .collectFirst { case Some(s) => s }
    (latest, claimed)
  }

  /** Exclusive-create of the manifest: exactly one writer can own a
    * version number. On local filesystems Hadoop's `create(overwrite =
    * false)` is check-then-create (a TOCTOU window two racing writers
    * can both pass), so file:// paths claim through POSIX O_EXCL
    * (`Files.createFile`) instead; object stores / HDFS get their own
    * atomic exclusive create. A reader that lands between claim and
    * content sees a torn manifest, which parsing already skips. */
  private def tryPublish(fs: FileSystem, root: Path, s: Snapshot): Boolean = {
    val logDir = new Path(root, LogDir)
    if (!fs.exists(logDir)) fs.mkdirs(logDir)
    val manifest = new Path(logDir, f"v${s.version}%08d.manifest")
    val body = (Seq(s"version=${s.version}", s"op=${s.op}",
      s"ts=${s.timestampMs}", "END_HEADER") ++ s.dataDirs :+ "END_MANIFEST")
      .mkString("\n").getBytes("UTF-8")
    val scheme = manifest.toUri.getScheme
    if (scheme == null || scheme == "file") {
      // write the full body to a temp file, then hard-link it into place:
      // link(2) is atomic AND exclusive, so claim and content are one
      // operation — a racer can never observe a claimed-but-empty
      // manifest and publish a successor missing this commit's data
      val dst = java.nio.file.Paths.get(manifest.toUri.getPath)
      val tmp = dst.resolveSibling(s".tmp-${UUID.randomUUID()}")
      java.nio.file.Files.write(tmp, body)
      try {
        java.nio.file.Files.createLink(dst, tmp)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      } finally java.nio.file.Files.deleteIfExists(tmp)
    } else {
      val out =
        try fs.create(manifest, false)
        catch { case _: java.io.IOException => return false }
      try { out.write(body); true } finally out.close()
    }
  }

  // ---- reads --------------------------------------------------------------

  /** Read the table — latest snapshot, or `VERSION AS OF asOfVersion`. */
  def read(spark: SparkSession, path: String,
      asOfVersion: Option[Int] = None): DataFrame = {
    val snap = asOfVersion match {
      case Some(v) => snapshotAt(spark, path, v).getOrElse(
        throw new IllegalArgumentException(s"no snapshot v$v at $path"))
      case None => currentSnapshot(spark, path).getOrElse(
        throw new IllegalArgumentException(s"no table at $path"))
    }
    readSnapshot(spark, path, snap)
  }

  private def readSnapshot(spark: SparkSession, path: String,
      snap: Snapshot): DataFrame = {
    val (_, root) = fsFor(spark, path)
    val dirs = snap.dataDirs.map(d => new Path(root, d).toString)
    spark.read.parquet(dirs: _*)
  }

  /** All valid snapshots, oldest first (`describe_history`). */
  def history(spark: SparkSession, path: String): Seq[Snapshot] = {
    val (fs, root) = fsFor(spark, path)
    val logDir = new Path(root, LogDir)
    if (!fs.exists(logDir)) return Nil
    fs.listStatus(logDir).toSeq
      .filter(_.getPath.getName.endsWith(".manifest"))
      .sortBy(_.getPath.getName)
      .flatMap(st => parseManifest(fs, st.getPath))
  }

  def currentSnapshot(spark: SparkSession, path: String): Option[Snapshot] =
    history(spark, path).lastOption

  private def snapshotAt(spark: SparkSession, path: String,
      v: Int): Option[Snapshot] =
    history(spark, path).find(_.version == v)

  /** A torn manifest (crash mid-write) parses to None and is skipped. */
  private def parseManifest(fs: FileSystem, p: Path): Option[Snapshot] =
    try {
      val in = fs.open(p)
      val bytes =
        try {
          val buf = new java.io.ByteArrayOutputStream()
          val chunk = new Array[Byte](8192)
          var n = in.read(chunk)
          while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
          buf.toString("UTF-8")
        } finally in.close()
      val lines = bytes.split("\n").toSeq
      if (lines.lastOption.contains("END_MANIFEST")) {
        val header = lines.takeWhile(_ != "END_HEADER")
          .map(_.split("=", 2)).map(a => a(0) -> a(1)).toMap
        val dirs = lines.dropWhile(_ != "END_HEADER").drop(1).dropRight(1)
        Some(Snapshot(header("version").toInt, header("op"),
          header("ts").toLong, dirs))
      } else None
    } catch { case _: Exception => None }

  // ---- maintenance --------------------------------------------------------

  /** Drop data directories referenced by no retained snapshot, and the
    * manifests of expired snapshots. Keeps the newest `keepVersions`. */
  def vacuum(spark: SparkSession, path: String, keepVersions: Int = 1): Int = {
    val (fs, root) = fsFor(spark, path)
    val snaps = history(spark, path)
    if (snaps.isEmpty) return 0
    val keep = snaps.takeRight(math.max(1, keepVersions))
    val referenced = keep.flatMap(_.dataDirs).toSet
    val filesDir = new Path(root, "files")
    var removed = 0
    if (fs.exists(filesDir))
      fs.listStatus(filesDir).foreach { st =>
        val rel = s"files/${st.getPath.getName}"
        if (!referenced.contains(rel)) { fs.delete(st.getPath, true); removed += 1 }
      }
    val logDir = new Path(root, LogDir)
    val keepNames = keep.map(s => f"v${s.version}%08d.manifest").toSet
    fs.listStatus(logDir).foreach { st =>
      if (st.getPath.getName.endsWith(".manifest") &&
        !keepNames.contains(st.getPath.getName)) fs.delete(st.getPath, false)
    }
    removed
  }

  private def fsFor(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    (fs, fs.makeQualified(p))
  }
}
