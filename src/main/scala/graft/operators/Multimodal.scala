package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.kernel.{JpegKernel, Magic}

/** Multimodal-column operators: image/audio/video ride as opaque binary
  * payloads with typed metadata. The Spark-side plumbing (schema, batch
  * iteration in mapPartitions, partitioning) is real; the heavy decode is
  * STUBBED deterministically where a codec would sit (this container ships
  * no image/audio libraries — the stub boundary is marked below).
  */
object Multimodal {

  final case class ImageFeature(
      media_ref: String,
      content_type: String,
      width: Int,
      height: Int,
      exif_software: String,
      // STUB: a real pipeline would produce a model embedding here; this
      // is a deterministic content-derived placeholder with the real
      // schema (array<float>) and batch shape.
      feature: Seq[Float],
      decode_ok: Boolean)

  /** Decode + feature-extract over a media table (media_ref, bytes_b64).
    * JPEG header/EXIF decode is REAL (JpegKernel); pixel decode is the
    * stubbed step.
    */
  def imageFeatures(spark: SparkSession, media: DataFrame, dim: Int = 8): Dataset[ImageFeature] = {
    import spark.implicits._
    media.select(col("media_ref"), col("bytes_b64"))
      .as[(String, String)]
      .mapPartitions { it =>
        it.map { case (ref, b64) =>
          val bytes =
            if (b64 == null || b64.isEmpty) Array.emptyByteArray
            else java.util.Base64.getDecoder.decode(b64)
          val kind = Magic.sniff(bytes)
          val meta: Map[String, String] = kind match {
            case Magic.Kind.Jpeg => JpegKernel.extract(bytes)
            case Magic.Kind.Png  => graft.kernel.PngKernel.extract(bytes)
            case Magic.Kind.Gif  => graft.kernel.GifKernel.extract(bytes)
            case Magic.Kind.Bmp  => graft.kernel.BmpKernel.extract(bytes)
            case Magic.Kind.Webp => graft.kernel.WebpKernel.extract(bytes)
            case Magic.Kind.Mp4  => graft.kernel.Mp4Kernel.extract(bytes)
            case _               => Map.empty
          }
          if (meta.nonEmpty) {
            def px(k: String): Int =
              meta.get(k).map(_.takeWhile(_.isDigit)).filter(_.nonEmpty)
                .map(_.toInt).getOrElse(-1)
            ImageFeature(ref, Magic.contentTypeOf(kind, None),
              px("Image Width"), px("Image Height"),
              meta.getOrElse("Software", ""),
              stubFeature(bytes, dim), decode_ok = true)
          } else {
            ImageFeature(ref, Magic.contentTypeOf(kind, None), -1, -1, "",
              Seq.fill(dim)(0.0f), decode_ok = false)
          }
        }
      }
  }

  /** STUB decode: deterministic feature from payload bytes (stands in for
    * a pixel-decode + model forward pass; keeps tests/benches meaningful
    * because it is content-sensitive and cheap).
    */
  private def stubFeature(bytes: Array[Byte], dim: Int): Seq[Float] = {
    val acc = new Array[Long](dim)
    var i = 0
    while (i < bytes.length) {
      acc(i % dim) += (bytes(i) & 0xff)
      i += 1
    }
    acc.map(v => (v % 1000).toFloat / 1000.0f).toSeq
  }

  /** Frame-sample stub for video-like payloads: emits every `stride`-th
    * 1KB block's checksum as a "frame" row — the real shape of a frame
    * sampler (one input row -> many frame rows) with a stubbed decoder.
    * For REAL MP4 containers the mvhd duration is parsed, so each frame
    * row carries a genuine timestamp (ts_ms = frame position scaled into
    * the container's duration); non-video payloads get ts_ms = -1.
    */
  def frameSample(spark: SparkSession, media: DataFrame, stride: Int = 4): DataFrame = {
    import spark.implicits._
    media.select(col("media_ref"), col("bytes_b64")).as[(String, String)]
      .flatMap { case (ref, b64) =>
        val bytes =
          if (b64 == null || b64.isEmpty) Array.emptyByteArray
          else java.util.Base64.getDecoder.decode(b64)
        val durMs =
          if (Magic.sniff(bytes) == Magic.Kind.Mp4)
            graft.kernel.Mp4Kernel.durationMs(bytes)
          else -1L
        val nBlocks = bytes.length / 1024
        val picked = (0 until nBlocks by stride)
        picked.zipWithIndex.map { case (f, k) =>
          var s = 0L
          var i = f * 1024
          while (i < (f + 1) * 1024 && i < bytes.length) { s += (bytes(i) & 0xff); i += 1 }
          val ts = if (durMs >= 0 && picked.size > 0) durMs * k / picked.size else -1L
          (ref, f, s, ts)
        }
      }
      .toDF("media_ref", "frame_idx", "frame_checksum", "ts_ms")
  }
}
