package graft

import org.scalatest.funsuite.AnyFunSuite

/** VP8L (lossless WebP) bitstream conformance against third-party
  * streams: the committed fixtures under src/test/resources/vp8l were
  * encoded by the SYSTEM libwebp (WebPEncodeLosslessRGB, see
  * tools/vp8l_conformance.py), and each .rgba is libwebp's own RGBA
  * decode of its stream. Our decoder must reproduce those planes
  * byte-exactly — proving it handles real-world streams (simple codes,
  * zero-run code lengths 17/18, libwebp's transform choices), not just
  * this repo's writer. The reverse direction (every WebpWriterEx
  * stream decodes byte-exactly in libwebp, incl. the palette+spatial
  * combinations) is validated by the same tool at dev time; in-tree,
  * writer streams are pinned by the PixelDecodeSpec round-trips and
  * stay conformant because every emitted prefix code is complete.
  */
class Vp8lConformanceSpec extends AnyFunSuite {

  private val names = Seq("flat_17x13", "grad_128x96", "noise_33x25",
    "pal_40x30", "smooth_64x48")

  private def res(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/vp8l/$name")
    require(in != null, s"missing fixture $name")
    try in.readAllBytes() finally in.close()
  }

  for (name <- names) {
    test(s"libwebp-encoded VP8L stream decodes plane-exactly: $name") {
      val img = graft.kernel.Vp8lDecoder.decode(res(s"$name.webp"))
        .getOrElse(fail(s"$name rejected"))
      val exp = res(s"$name.rgba")
      assert(img.channels == 4 && img.data.length == exp.length, name)
      assert(java.util.Arrays.equals(img.data, exp), name)
    }
  }
}
