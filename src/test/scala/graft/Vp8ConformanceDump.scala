package graft

import java.nio.file.{Files, Paths}
import graft.corpus.Vp8WriterEx
import graft.kernel.Vp8Decoder

/** Dev harness (test scope): dumps the VP8 round-trip matrix as .webp
  * files plus this decoder's YUV planes, for cross-validation against
  * the system libwebp via tools/vp8_conformance.py. Not part of the
  * library; the committed conformance artifacts live in
  * src/test/resources/vp8 and are pinned by Vp8ConformanceSpec.
  */
object Vp8ConformanceDump {
  val matrix: Seq[(String, Vp8WriterEx.Spec)] = Seq(
    "single_mb" -> Vp8WriterEx.Spec(16, 16, 51),
    "odd_crop" -> Vp8WriterEx.Spec(37, 26, 52),
    "multi_mb" -> Vp8WriterEx.Spec(64, 48, 53),
    "noise" -> Vp8WriterEx.Spec(33, 31, 54, smooth = false),
    "coarse_q" -> Vp8WriterEx.Spec(48, 32, 55, yacQi = 100),
    "fine_q" -> Vp8WriterEx.Spec(48, 32, 56, yacQi = 1),
    "parts2" -> Vp8WriterEx.Spec(40, 40, 57, nParts = 2),
    "parts8" -> Vp8WriterEx.Spec(52, 70, 58, nParts = 8),
    "skip" -> Vp8WriterEx.Spec(48, 48, 59, skipFlags = true, yacQi = 120),
    "tiny" -> Vp8WriterEx.Spec(1, 1, 60),
    "filter10" -> Vp8WriterEx.Spec(48, 36, 62, filterLevel = 10),
    "filter50" -> Vp8WriterEx.Spec(41, 29, 63, filterLevel = 50, yacQi = 90),
    "filter_sharp" -> Vp8WriterEx.Spec(52, 40, 64, filterLevel = 25, filterSharpness = 3),
    "filter_skip" -> Vp8WriterEx.Spec(64, 48, 65, filterLevel = 30, skipFlags = true, yacQi = 115),
    "simple_filter" -> Vp8WriterEx.Spec(44, 32, 66, filterLevel = 20, simpleFilter = true),
    "seg2" -> Vp8WriterEx.Spec(48, 36, 67, segments = 2),
    "seg4" -> Vp8WriterEx.Spec(64, 52, 68, segments = 4),
    "seg3_abs" -> Vp8WriterEx.Spec(52, 44, 69, segments = 3, segAbs = true),
    "seg_filter_parts" -> Vp8WriterEx.Spec(56, 40, 70, segments = 4, filterLevel = 15, nParts = 2),
    "seg_lf" -> Vp8WriterEx.Spec(64, 48, 71, segments = 3, segLf = true, filterLevel = 20),
    "seg_lf_abs" -> Vp8WriterEx.Spec(48, 36, 72, segments = 4, segAbs = true,
      segLf = true, filterLevel = 30),
    "lf_deltas" -> Vp8WriterEx.Spec(64, 48, 73, filterLevel = 25,
      lfRefDelta = 10, lfModeDelta = -6),
    "lf_deltas_simple" -> Vp8WriterEx.Spec(48, 32, 74, filterLevel = 12,
      lfRefDelta = -4, lfModeDelta = 20, simpleFilter = true))

  def main(args: Array[String]): Unit = {
    val out = Paths.get(if (args.nonEmpty) args(0) else "/tmp/vp8conf")
    Files.createDirectories(out)
    for ((name, spec) <- matrix) {
      val bytes = Vp8WriterEx.write(spec)
      Files.write(out.resolve(s"$name.webp"), bytes)
      val yuv = Vp8Decoder.decodeYuv(bytes).getOrElse(sys.error(s"decode failed: $name"))
      val planes = new java.io.ByteArrayOutputStream()
      planes.write(Array(yuv.w & 0xff, yuv.w >> 8, yuv.h & 0xff, yuv.h >> 8).map(_.toByte))
      yuv.y.foreach(v => planes.write(v))
      yuv.u.foreach(v => planes.write(v))
      yuv.v.foreach(v => planes.write(v))
      Files.write(out.resolve(s"$name.yuv"), planes.toByteArray)
    }
    println(s"dumped ${matrix.size} streams to $out")
  }
}
