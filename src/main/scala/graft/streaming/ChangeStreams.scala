package graft.streaming

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.io.{DeltaLogReader, IcebergReader}

/** Incremental CONSUMPTION of the table-format change surfaces — the
  * Spark-side counterpart of a Kinesis/Kafka-style CDC pipeline over
  * Delta's Change Data Feed ([[DeltaLogReader.changes]]) and Iceberg's
  * incremental append scan ([[IcebergReader.incrementalAppendScan]]).
  *
  * Each `process*` call is one micro-batch poll (the
  * `Trigger.AvailableNow` shape): read everything new since the durable
  * offset, hand ONE DataFrame to the handler, then advance the offset.
  * The offset persists AFTER the handler returns, so a crash mid-batch
  * re-delivers it — at-least-once, the contract every CDC consumer
  * already handles (and exactly the semantics of `foreachBatch` with a
  * non-transactional sink). The offset file is written create-then-
  * rename, so a torn write never corrupts progress.
  *
  * Scale: each poll's read is bounded by the DELTA (the changed
  * versions' cdc files / the new snapshots' added files), never a table
  * scan — a consumer of a 100 TB table pays for what changed since it
  * last looked. */
object ChangeStreams {

  private val mapper = new ObjectMapper()

  /** Poll the Delta change feed: process versions
    * `[lastProcessed+1, latest]` and advance. Returns the processed
    * version range, or None when the consumer is caught up. On the
    * first poll, `startVersion` picks where the feed begins (default
    * 0 — the full history). */
  def processDeltaChanges(spark: SparkSession, tablePath: String,
      checkpoint: String, startVersion: Long = 0L)(
      handler: DataFrame => Unit): Option[(Long, Long)] = {
    val latest = DeltaLogReader.latestVersion(spark, tablePath)
    require(latest >= 0, s"no Delta table at $tablePath")
    val from = readOffset(spark, checkpoint)
      .map(_ + 1).getOrElse(startVersion)
    if (from > latest) return None
    handler(DeltaLogReader.changes(spark, tablePath, from, Some(latest)))
    writeOffset(spark, checkpoint, latest)
    Some((from, latest))
  }

  /** Poll the Iceberg append feed: process snapshots after the durable
    * offset (exclusive) through the current one and advance. Returns
    * the processed (from, to] snapshot-id range, or None when caught
    * up. The first poll processes the whole history. */
  def processIcebergAppends(spark: SparkSession, tablePath: String,
      checkpoint: String)(
      handler: DataFrame => Unit): Option[(Option[Long], Long)] = {
    val current = IcebergReader.snapshot(spark, tablePath).snapshotId
    val last = readOffset(spark, checkpoint)
    if (last.contains(current)) return None
    handler(IcebergReader.incrementalAppendScan(spark, tablePath, last,
      Some(current)))
    writeOffset(spark, checkpoint, current)
    Some((last, current))
  }

  private def readOffset(spark: SparkSession,
      checkpoint: String): Option[Long] = {
    val p = new Path(checkpoint, "graft-change-offset.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    Some(mapper.readTree(text).get("offset").asLong)
  }

  /** Create-then-rename: the previous offset stays authoritative until
    * the new one is fully on disk. */
  private def writeOffset(spark: SparkSession, checkpoint: String,
      offset: Long): Unit = {
    val dir = new Path(checkpoint)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(dir)
    val tmp = new Path(dir, s".graft-change-offset-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(s"""{"offset":$offset}""".getBytes("UTF-8"))
    finally out.close()
    val dst = new Path(dir, "graft-change-offset.json")
    fs.delete(dst, false)
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"offset rename failed: $dst")
  }
}
