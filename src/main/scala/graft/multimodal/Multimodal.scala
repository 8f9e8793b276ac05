package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed batch-at-a-time with
  * `mapPartitions` (the Scala analogue of the reference's threaded
  * byte-range readers, and of Arrow-batched UDFs in PySpark).
  *
  * Round 7: image and audio decode are REAL — `decodeReal` runs the
  * JDK's built-in codecs (`javax.imageio` PNG/JPEG/BMP/GIF,
  * `javax.sound.sampled` RIFF/WAV — see [[Codecs]]), no external
  * dependency. Only VIDEO remains a declared stub (the JDK ships no
  * video codec and neither does the container). `decodeFeatures` keeps
  * the round-6 deterministic fake decoder as the codec-free baseline;
  * the surrounding plumbing — schema, partition-preserving execution,
  * batch shape, null/corrupt handling — is shared production code.
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

  // ------------------------------------------------------- real codec path

  final case class MediaDecoded(
      media_id: Long,
      modality: String,
      ok: Boolean, // decoded by a real codec (video has none — declared stub)
      width: Int, // image geometry as reported by the DECODER, not metadata
      height: Int,
      n_samples: Long, // audio frame count as reported by the decoder
      sample_rate: Int,
      n_bytes: Int,
      features: Array[Float])

  /** Deterministic corpus with REAL payloads: image rows carry genuine
    * PNG bytes (id-derived geometry and gradient), audio rows genuine
    * RIFF/WAV bytes (id-derived 16-bit PCM sine), video rows opaque
    * bytes (no JDK video codec — the one remaining declared stub).
    * Geometry/sample arithmetic is pure id math so the decode stage is
    * oracle-checkable end-to-end: the DECODER's reported width/height/
    * frame-count must reproduce the arithmetic after a real
    * encode→bytes→decode round trip. */
  def synthesizeReal(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).map { id =>
      (id % 3).toInt match {
        case 0 =>
          val w = 16 + (id % 17).toInt
          val h = 16 + (id % 13).toInt
          val base = ((id * 37) % 256).toInt
          val png = Codecs.encodePng(w, h) { (x, y) =>
            (base << 16) | ((x * 255 / math.max(w - 1, 1)) << 8) |
              (y * 255 / math.max(h - 1, 1))
          }
          MediaRow(id, "image", png, w, h, "png")
        case 1 =>
          val nSamp = 100 + (id % 400).toInt
          val freq = 100.0 + (id % 50) * 10.0
          val samples = Array.tabulate[Short](nSamp)(j =>
            (math.sin(2 * math.Pi * freq * j / 8000.0) * 12000).toShort)
          MediaRow(id, "audio", Codecs.encodeWav(samples, 8000), 0, 0, "wav")
        case _ =>
          val len = 64 + (id % 192).toInt
          MediaRow(id, "video",
            Array.tabulate[Byte](len)(j => ((id * 31 + j) % 251).toByte),
            0, 0, "bin")
      }
    }
  }

  /** Real decode stage: ImageIO for images, javax.sound for WAV —
    * per-partition streaming, no shuffle, corrupt payloads degrade to
    * `ok=false` rows instead of failing the task. Video passes through
    * with byte-hash features and `ok=false` (no codec available —
    * honest, and visible in the oracle's n_ok column). */
  def decodeReal(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaDecoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val nb = Option(r.payload).map(_.length).getOrElse(0)
        r.modality match {
          case "image" =>
            Codecs.decodeImage(r.payload) match {
              case Some(info) =>
                MediaDecoded(r.media_id, r.modality, ok = true, info.width,
                  info.height, 0L, 0, nb,
                  Array(info.meanR, info.meanG, info.meanB) ++ info.luma)
              case None =>
                MediaDecoded(r.media_id, r.modality, ok = false, 0, 0, 0L, 0,
                  nb, Array.empty[Float])
            }
          case "audio" =>
            Codecs.decodeWav(r.payload) match {
              case Some(info) =>
                MediaDecoded(r.media_id, r.modality, ok = true, 0, 0,
                  info.nFrames, info.sampleRate, nb, Array(info.rms, info.peak))
              case None =>
                MediaDecoded(r.media_id, r.modality, ok = false, 0, 0, 0L, 0,
                  nb, Array.empty[Float])
            }
          case _ =>
            MediaDecoded(r.media_id, r.modality, ok = false, 0, 0, 0L, 0, nb,
              if (nb == 0) Array.empty[Float] else fakeDecode(r.payload, dim))
        }
      }
    }
  }

  /** Oracle for the REAL decode stage: per-modality counts plus the
    * decoder-reported pixel and sample totals, which DuckDB reproduces
    * from the synthesis arithmetic — green means genuine PNG/WAV bytes
    * survived an encode→decode round trip with the right geometry.
    * n_ok is 0 for video: the stub is declared in the oracle itself. */
  def decodeRealOracle(n: Int): String =
    s"""SELECT CASE i % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
       |            ELSE 'video' END AS modality,
       |  cast(count(*) as bigint) AS n,
       |  cast(sum(CASE WHEN i % 3 = 2 THEN 0 ELSE 1 END) as bigint) AS n_ok,
       |  cast(sum(CASE WHEN i % 3 = 0
       |       THEN (16 + i % 17) * (16 + i % 13) ELSE 0 END) as bigint)
       |    AS px_total,
       |  cast(sum(CASE WHEN i % 3 = 1 THEN 100 + i % 400 ELSE 0 END) as bigint)
       |    AS samp_total
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
