package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed batch-at-a-time with
  * `mapPartitions` (the Scala analogue of the reference's threaded
  * byte-range readers, and of Arrow-batched UDFs in PySpark).
  *
  * The DECODE STEP IS A STUB: this container ships no image/audio codecs,
  * so `decodeFeatures` runs a deterministic fake decoder (documented
  * below). Everything around it — schema, partition-preserving execution,
  * batch shape, null/corrupt handling — is the real production plumbing:
  * swap `fakeDecode` for a JNI/codec call and the pipeline is unchanged.
  */
object Multimodal {

  final case class MediaRow(
      media_id: Long,
      modality: String, // image | audio | video
      payload: Array[Byte],
      width: Int,
      height: Int,
      format: String)

  final case class MediaFeatures(
      media_id: Long,
      modality: String,
      n_bytes: Int,
      ok: Boolean,
      features: Array[Float])

  /** Deterministic synthetic corpus: payload bytes derived from the id
    * (stands in for fetched object bytes). */
  def synthesize(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val id = i
      val modality = Seq("image", "audio", "video")((id % 3).toInt)
      val len = 64 + (id % 192).toInt
      val payload = Array.tabulate[Byte](len)(j => ((id * 31 + j) % 251).toByte)
      MediaRow(id, modality, payload, 32 + (id % 64).toInt,
        32 + (id % 48).toInt, if (modality == "image") "png" else "pcm")
    }
  }

  /** STUB decoder: a rolling-hash projection of the payload bytes into
    * `dim` floats in [-1, 1]. Replace with a real codec; the signature —
    * bytes in, fixed-width float vector out, `ok=false` on corrupt input
    * instead of task failure — is the production contract.
    */
  private[multimodal] def fakeDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) {
      h = 31 * h + (payload(i) & 0xff)
      out(i % dim) += ((h % 1000L).toFloat / 1000.0f)
      i += 1
    }
    out.map(v => math.tanh(v.toDouble).toFloat)
  }

  /** Batch feature extraction: one decoder instance per partition (the
    * expensive-init pattern — codec contexts, model sessions), rows
    * streamed through it, corrupt payloads degrade to `ok=false` rows.
    * No shuffle: partitioning of the input is preserved.
    */
  def decodeFeatures(media: Dataset[MediaRow], dim: Int = 16)
      : Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init happens here (codec/session allocation)
      rows.map { r =>
        try {
          val f = fakeDecode(r.payload, dim)
          MediaFeatures(r.media_id, r.modality, r.payload.length, ok = true, f)
        } catch {
          case _: Exception =>
            MediaFeatures(r.media_id, r.modality,
              Option(r.payload).map(_.length).getOrElse(0), ok = false,
              Array.empty[Float])
        }
      }
    }
  }

  /** Oracle for the decode-stage aggregate: the synthetic corpus is
    * deterministic arithmetic over the id (`modality = id % 3`,
    * `len = 64 + id % 192`, every payload decodes), so counts and byte
    * totals are SQL-computable without any codec — the plumbing
    * (mapPartitions batch shape, schema, ok-degradation) is what the
    * green row then certifies. */
  def decodeFeaturesOracle(n: Int): String =
    s"""SELECT CASE i % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
       |            ELSE 'video' END AS modality,
       |  cast(count(*) as bigint) AS n,
       |  cast(sum(64 + i % 192) as bigint) AS total_bytes,
       |  cast(count(*) as bigint) AS n_ok
       |FROM range($n) t(i)
       |GROUP BY 1""".stripMargin

  /** Resize metadata transform (pure column math — the non-decode part of
    * an image resize: target geometry, scale factors; the pixel work
    * happens in the decode stage at the new geometry). */
  def planResize(df: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(
      lit(maxSide.toDouble) / col("width"),
      lit(maxSide.toDouble) / col("height"), lit(1.0))
    df.withColumn("scale", scale)
      .withColumn("out_width", ceil(col("width") * scale).cast("int"))
      .withColumn("out_height", ceil(col("height") * scale).cast("int"))
  }

  /** Frame-sampling plan for video rows: deterministic frame indices
    * (every `stride`-th frame capped at `maxFrames`) exploded to one row
    * per frame — the fan-out stage ahead of per-frame decode. */
  def planFrameSample(df: DataFrame, fps: Int = 30, seconds: Int = 10,
      stride: Int = 15, maxFrames: Int = 8): DataFrame =
    df.filter(col("modality") === "video")
      .withColumn("frame_idx",
        explode(slice(sequence(lit(0), lit(fps * seconds - 1), lit(stride)),
          1, maxFrames)))
}
