package graft.table

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Whole-tree snapshots for persisted INDEX structures (round 14) —
  * the thin layer [[TxnLog]] needs to version an arbitrary directory
  * tree instead of a columnar table.
  *
  * An index build produces SEVERAL artifacts that are only correct as
  * a unit: PQ codes under their codebook, IVF assignments under their
  * centroids, BM25 postings under their bucket-count + corpus-stats
  * sidecars. Versioning each artifact separately (the dedup-index
  * model) cannot express that: two sub-tables can each be internally
  * consistent and still be from different generations. Here a rebuild
  * stages one SELF-CONTAINED tree under `files/idx-<uuid>/` and
  * publishes it with ONE manifest ([[TxnLog.commitStagedDirs]] replace
  * mode), so readers that resolve [[root]] once observe one
  * generation, atomically, no matter when a rebuild lands. Superseded
  * trees stay readable for pinned readers until [[vacuum]]. */
object SnapshotTree {

  /** Stage a fresh tree, let `build` populate it, publish atomically. */
  def publish(spark: SparkSession, indexPath: String)(
      build: String => Unit): Unit = {
    val root = new Path(indexPath)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val dir = s"files/idx-${java.util.UUID.randomUUID()}"
    build(fs.makeQualified(new Path(root, dir)).toString)
    TxnLog.commitStagedDirs(spark, indexPath, Seq(dir),
      op = "rebuild", replace = true)
  }

  /** The CURRENT snapshot's tree root — resolution happens here, once
    * per query, so everything read under the returned path is one
    * consistent generation. Paths without a TxnLog (pre-round-14
    * indexes) resolve to themselves. */
  def root(spark: SparkSession, indexPath: String): String =
    TxnLog.currentSnapshot(spark, indexPath) match {
      case Some(s) =>
        val r = new Path(indexPath)
        val fs = r.getFileSystem(spark.sessionState.newHadoopConf())
        fs.makeQualified(new Path(r, s.dataDirs.head)).toString
      case None => indexPath
    }

  /** ALL tree roots of the current snapshot, in commit order — the
    * LAYERED index shape (round 15): incremental maintenance appends
    * per-batch layer trees ([[TxnLog.commitStagedDirs]] append mode)
    * between folds, and a query unions the layers. Single-tree
    * indexes get a one-element list; paths without a TxnLog resolve
    * to themselves. Like [[root]], ONE resolution per query pins one
    * consistent generation across every layer. */
  def roots(spark: SparkSession, indexPath: String): Seq[String] =
    TxnLog.currentSnapshot(spark, indexPath) match {
      case Some(s) =>
        val r = new Path(indexPath)
        val fs = r.getFileSystem(spark.sessionState.newHadoopConf())
        s.dataDirs.map(d => fs.makeQualified(new Path(r, d)).toString)
      case None => Seq(indexPath)
    }

  /** Reclaim superseded trees; retention is the concurrency contract
    * (keep ≥ 2 when queries can overlap a rebuild). */
  def vacuum(spark: SparkSession, indexPath: String,
      keepVersions: Int = 2): Int =
    TxnLog.vacuum(spark, indexPath, keepVersions)
}
