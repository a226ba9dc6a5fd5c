package graft

import org.scalacheck.{Gen => SGen, Properties}
import org.scalacheck.Prop.forAll
import graft.corpus._
import graft.kernel._

/** Property-based oracles for the codec tier: the decode-grade writers
  * are analytic inverses of the decoders, so lossless round-trips must be
  * EXACT for arbitrary (seeded) dims/content, and the lossy JPEG bound
  * must hold for arbitrary sizes — not just the handpicked spec cases.
  */
object CodecPropertySpec extends Properties("graft.codecs") {

  private val dims = for {
    w <- SGen.choose(1, 80)
    h <- SGen.choose(1, 60)
    seed <- SGen.choose(Long.MinValue, Long.MaxValue)
  } yield (w, h, seed)

  property("PNG round-trip exact: any dims/seed/colorType/filters/interlace") =
    forAll(dims, SGen.oneOf(0, 2, 3, 4, 6), SGen.oneOf(false, true),
        SGen.oneOf(false, true)) { case ((w, h, seed), ct, cyc, inter) =>
      val spec = PngWriterEx.Spec(w, h, seed, ct, cyc, inter)
      val img = PngDecoder.decode(PngWriterEx.write(spec))
      img.nonEmpty && img.get.width == w && img.get.height == h && {
        if (ct == 3) {
          val idx = PngWriterEx.plane(spec)
          val pal = PngWriterEx.palette(spec)
          (0 until w * h).forall { i =>
            (0 until 3).forall(c => img.get.data(i * 3 + c) == pal((idx(i) & 0xff) * 3 + c))
          }
        } else java.util.Arrays.equals(img.get.data, PngWriterEx.plane(spec))
      }
    }

  property("GIF round-trip exact: any dims/seed/interlace") =
    forAll(dims, SGen.oneOf(false, true)) { case ((w, h, seed), inter) =>
      val spec = GifWriter.Spec(w, h, seed, inter)
      val img = GifDecoder.decode(GifWriter.write(spec))
      val idx = GifWriter.plane(spec)
      val pal = GifWriter.palette(spec)
      img.nonEmpty && (0 until w * h).forall { i =>
        (0 until 3).forall(c => img.get.data(i * 3 + c) == pal((idx(i) & 0xff) * 3 + c))
      }
    }

  property("GIF animation: composites + delays exact for any frame count") =
    forAll(dims, SGen.choose(1, 6), SGen.oneOf(false, true)) {
      case ((w, h, seed), nf, tr) =>
        val spec = GifWriter.AnimSpec(w, h, seed, nf, tr)
        GifDecoder.decodeFrames(GifWriter.writeAnim(spec)) match {
          case None => false
          case Some(anim) =>
            anim.frames.length == nf &&
              anim.frames.map(_.delayMs) == GifWriter.animDelaysMs(spec) &&
              anim.frames.zip(GifWriter.animComposites(spec)).forall {
                case (f, expect) => java.util.Arrays.equals(f.image.data, expect)
              }
        }
    }

  property("TIFF round-trip exact: endian x rgb x strips x compression") =
    forAll(dims, SGen.oneOf(false, true), SGen.oneOf(false, true),
        SGen.choose(0, 12), SGen.oneOf(1, 5, 32773)) {
      case ((w, h, seed), be, rgb, rps, comp) =>
        val spec = TiffWriterEx.Spec(w, h, seed, bigEndian = be, rgb = rgb,
          rowsPerStrip = rps, compression = comp)
        TiffDecoder.decode(TiffWriterEx.write(spec)) match {
          case None => false
          case Some(img) => java.util.Arrays.equals(img.data, TiffWriterEx.plane(spec))
        }
    }

  property("VP8L round-trip exact: lz77 x cache") =
    forAll(dims, SGen.oneOf(false, true), SGen.oneOf(0, 4, 6)) {
      case ((w, h, seed), lz, cb) =>
        val spec = WebpWriterEx.Spec(w, h, seed, useLz77 = lz, cacheBits = cb)
        Vp8lDecoder.decode(WebpWriterEx.write(spec)) match {
          case None => false
          case Some(img) => java.util.Arrays.equals(img.data, WebpWriterEx.plane(spec))
        }
    }

  property("VP8L transforms round-trip exact: SG x predictor x color x block size") =
    forAll(dims, SGen.oneOf(false, true), SGen.oneOf(false, true), SGen.oneOf(2, 3, 4)) {
      case ((w, h, seed), sg, cx, psb) =>
        val spec = WebpWriterEx.Spec(w, h, seed, subtractGreen = sg,
          predictor = true, predSizeBits = psb,
          colorXform = cx, colorSizeBits = psb)
        Vp8lDecoder.decode(WebpWriterEx.write(spec)) match {
          case None => false
          case Some(img) => java.util.Arrays.equals(img.data, WebpWriterEx.plane(spec))
        }
    }

  property("VP8L meta prefix groups round-trip exact: group count x block size") =
    forAll(dims, SGen.oneOf(2, 3, 4, 7), SGen.oneOf(2, 3, 4)) {
      case ((w, h, seed), groups, gbits) =>
        val spec = WebpWriterEx.Spec(w, h, seed, metaGroups = groups,
          metaGroupBits = gbits, cacheBits = if (seed % 2 == 0) 4 else 0)
        Vp8lDecoder.decode(WebpWriterEx.write(spec)) match {
          case None => false
          case Some(img) => java.util.Arrays.equals(img.data, WebpWriterEx.plane(spec))
        }
    }

  property("VP8L 2-D distance codes round-trip exact: transforms x cache") =
    forAll(dims, SGen.oneOf(false, true), SGen.oneOf(0, 4)) {
      case ((w, h, seed), sg, cb) =>
        val spec = WebpWriterEx.Spec(w, h, seed, use2dDist = true,
          subtractGreen = sg, cacheBits = cb)
        Vp8lDecoder.decode(WebpWriterEx.write(spec)) match {
          case None => false
          case Some(img) => java.util.Arrays.equals(img.data, WebpWriterEx.plane(spec))
        }
    }

  property("VP8 lossy round-trip reconstruction-exact: quantizer x partitions x skip x filter") =
    forAll(dims, SGen.choose(0, 127), SGen.oneOf(1, 2, 4, 8), SGen.oneOf(false, true),
        SGen.choose(0, 63), SGen.choose(0, 7)) {
      case ((w, h, seed), qi, parts, skips, flvl, fsharp) =>
        val spec = graft.corpus.Vp8WriterEx.Spec(w, h, seed, yacQi = qi,
          nParts = parts, skipFlags = skips, smooth = seed % 2 == 0,
          filterLevel = flvl, filterSharpness = fsharp,
          simpleFilter = (seed & 4) == 0,
          segments = (seed % 5) match { case 1 => 2; case 2 => 3; case 3 => 4; case _ => 0 },
          segAbs = (seed & 8) == 0)
        graft.kernel.Vp8Decoder.decode(graft.corpus.Vp8WriterEx.write(spec)) match {
          case None => false
          case Some(img) =>
            java.util.Arrays.equals(img.data, graft.corpus.Vp8WriterEx.plane(spec))
        }
    }

  property("VP8L palette round-trip exact: every bundling width") =
    forAll(dims, SGen.oneOf(2, 3, 4, 5, 11, 16, 17, 64, 256)) {
      case ((w, h, seed), size) =>
        val spec = WebpWriterEx.Spec(w, h, seed, useLz77 = size > 16,
          paletteSize = size)
        Vp8lDecoder.decode(WebpWriterEx.write(spec)) match {
          case None => false
          case Some(img) => java.util.Arrays.equals(img.data, WebpWriterEx.plane(spec))
        }
    }

  property("JPEG gray unit-quant: maxDiff <= 2 for any dims/seed") =
    forAll(dims) { case (w, h, seed) =>
      val spec = JpegWriterEx.Spec(w, h, seed, gray = true, unitQuant = true)
      val plane = JpegWriterEx.rgbPlane(spec)
      JpegDecoder.decode(JpegWriterEx.encode(spec, plane)) match {
        case None => false
        case Some(img) =>
          img.data.zip(plane).forall { case (a, b) =>
            math.abs((a & 0xff) - (b & 0xff)) <= 2
          }
      }
    }

  property("WAV round-trip exact: any rate/channels/frames") =
    forAll(SGen.oneOf(8000, 16000, 44100), SGen.choose(1, 2),
        SGen.choose(1, 2000), SGen.choose(Long.MinValue, Long.MaxValue)) {
      (sr, ch, nf, seed) =>
        val spec = WavWriterEx.Spec(sr, ch, nf, seed)
        WavDecoder.decode(WavWriterEx.write(spec)) match {
          case None => false
          case Some(pcm) =>
            val raw = WavWriterEx.rawSamples(spec)
            pcm.samples.length == nf &&
              pcm.samples.indices.forall(i => pcm.samples(i) == raw(i) / 32768.0f)
        }
    }

  property("aHash is encoding-invariant: PNG filters never change the hash") =
    forAll(dims, SGen.oneOf(0, 2, 6)) { case ((w, h, seed), ct) =>
      val a = PngWriterEx.write(PngWriterEx.Spec(w, h, seed, ct, cycleFilters = false))
      val b = PngWriterEx.write(PngWriterEx.Spec(w, h, seed, ct, cycleFilters = true))
      val ia = PngDecoder.decode(a).get
      val ib = PngDecoder.decode(b).get
      graft.operators.ImageOps.aHash64(ia) == graft.operators.ImageOps.aHash64(ib)
    }
}
