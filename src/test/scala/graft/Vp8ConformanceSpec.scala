package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernel.Vp8Decoder

/** REAL third-party VP8 streams: the fixtures under test/resources/vp8
  * were produced by the system libwebp encoder (WebPEncodeRGB at
  * qualities 10..95, tools/vp8_conformance.py gen), and each .yuv file
  * holds libwebp's OWN decode of that stream (WebPDecodeYUV). This
  * decoder must reproduce those planes byte-exactly — bitstream
  * conformance against an independent implementation, not a
  * round-trip. (The forward direction — libwebp decoding THIS repo's
  * encoder output byte-exactly across the whole spec matrix — is the
  * `check` mode of the same tool; both directions were green when the
  * fixtures were generated.)
  */
class Vp8ConformanceSpec extends AnyFunSuite {

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/vp8/$name")
    assert(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  private val fixtures = Seq(
    "lw_q10_64x48", "lw_q50_64x48", "lw_q85_80x56",
    "lw_q95_33x25", "lw_q75_128x96", "lw_q60_17x13")

  for (name <- fixtures) test(s"libwebp-encoded stream decodes plane-exactly: $name") {
    val webp = resource(s"$name.webp")
    val expected = resource(s"$name.yuv")
    val w = (expected(0) & 0xff) | ((expected(1) & 0xff) << 8)
    val h = (expected(2) & 0xff) | ((expected(3) & 0xff) << 8)
    val yuv = Vp8Decoder.decodeYuv(webp).getOrElse(fail(s"$name: decode returned None"))
    assert(yuv.w == w && yuv.h == h, s"$name dims")
    val cw = (w + 1) / 2; val ch = (h + 1) / 2
    var off = 4
    def checkPlane(label: String, plane: Array[Int], n: Int): Unit = {
      var i = 0
      var firstBad = -1
      while (i < n && firstBad < 0) {
        if (plane(i) != (expected(off + i) & 0xff)) firstBad = i
        i += 1
      }
      if (firstBad >= 0)
        fail(s"$name $label differs first at $firstBad: ours=${plane(firstBad)} libwebp=${expected(off + firstBad) & 0xff}")
      off += n
    }
    checkPlane("Y", yuv.y, w * h)
    checkPlane("U", yuv.u, cw * ch)
    checkPlane("V", yuv.v, cw * ch)
  }

  test("fixture streams are genuine lossy VP8 (not VP8L), various partitions") {
    for (name <- fixtures) {
      val b = resource(s"$name.webp")
      assert(new String(b, 12, 4, java.nio.charset.StandardCharsets.US_ASCII) == "VP8 ", name)
    }
  }
}
