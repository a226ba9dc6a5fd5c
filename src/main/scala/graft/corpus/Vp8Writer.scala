package graft.corpus

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import graft.kernel.{Vp8Decoder, Vp8Tables}

/** Decode-grade lossy-WebP (VP8) KEY-FRAME encoder — the oracle for
  * kernel.Vp8Decoder. Real bitstream machinery throughout: the RFC 6386
  * boolean arithmetic ENCODER (carry-exact, pinned against the decoder
  * by a ScalaCheck stream property), key-frame headers, per-MB mode
  * coding (DC/V/H/TM 16x16, all-ten-sub-mode B_PRED, chroma modes),
  * forward DCT/WHT + quantization, token-tree coefficient writing with
  * the (plane, band, ctx) conditioning and category extra bits, 1..8
  * token partitions, and optional per-MB skip flags.
  *
  * Oracle contract (same pattern as JpegWriterEx): quantization is
  * lossy, so `plane(spec)` is not the source — it is the RECONSTRUCTION
  * the decoder must produce, computed here by running the decoder's own
  * inverse transforms and prediction (shared private[graft] functions)
  * during encoding. Plane equality is therefore exact by construction
  * and pins every shared table and every arithmetic path.
  */
object Vp8WriterEx {

  final case class Spec(width: Int, height: Int, seed: Long,
      yacQi: Int = 12,       // base quantizer index (0..127)
      nParts: Int = 1,       // token partitions: 1, 2, 4 or 8
      skipFlags: Boolean = false, // mb_no_skip_coeff + per-MB skip bits
      smooth: Boolean = true,
      // in-loop deblocking: level 0 = off; 1..63 filters via the shared
      // Vp8Decoder.loopFilterFrame (simpleFilter = luma-only variant)
      filterLevel: Int = 0,
      filterSharpness: Int = 0,
      simpleFilter: Boolean = false,
      // segmentation: 0 = off, 2..4 segments with per-segment quantizer
      // deltas (segAbs = absolute-mode indices); segment map coded per
      // MB through the segment tree
      segments: Int = 0,
      segAbs: Boolean = false,
      // per-segment LOOP-FILTER feature (abs mode follows segAbs) and
      // mode/ref lf deltas (key frame: ref 0 = intra, mode 0 = B_PRED)
      segLf: Boolean = false,
      lfRefDelta: Int = 0,
      lfModeDelta: Int = 0,
      // false = the conformant RFC 6386 value tables (Vp8Tables.Rfc);
      // true = the round-5 deterministic stand-in set, kept so the
      // original round-trip pins run under both table sets
      standInTables: Boolean = false)

  // ------------------------------------------------------ bool encoder

  /** RFC 6386 §7.3 boolean encoder (libvpx emission discipline: 24-bit
    * low window, byte-at-a-time output with carry propagation).
    */
  private[graft] final class BoolEnc {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var low = 0L
    private var range = 255
    private var bitsLeft = -24

    def bool(bit: Int, prob: Int): Unit = {
      val split = 1 + (((range - 1) * prob) >> 8)
      if (bit != 0) { low += split; range -= split } else range = split
      var shift = Integer.numberOfLeadingZeros(range) - 24
      range <<= shift
      bitsLeft += shift
      if (bitsLeft >= 0) {
        val offset = shift - bitsLeft // >= 1 here (bitsLeft < 0 between bytes)
        if (((low << (offset - 1)) & 0x80000000L) != 0) {
          // carry into the already-emitted bytes
          var x = buf.length - 1
          while (x >= 0 && buf(x) == 0xff.toByte) { buf(x) = 0; x -= 1 }
          if (x >= 0) buf(x) = (buf(x) + 1).toByte
        }
        buf += ((low >> (24 - offset)) & 0xff).toByte
        low = (low << offset) & 0xffffffL
        shift = bitsLeft
        bitsLeft -= 8
      }
      low = (low << shift) & 0xffffffffL
    }

    def literal(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bool((v >> i) & 1, 128); i -= 1 }
    }

    def signed(v: Int, n: Int): Unit = {
      literal(math.abs(v), n)
      bool(if (v < 0) 1 else 0, 128)
    }

    /** Write the tree path for `leaf` from `startNode` (2 skips EOB). */
    def tree(t: Array[Int], probs: Array[Int], leaf: Int, startNode: Int = 0): Unit = {
      // find the path by walking from startNode
      val path = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      def walk(i: Int): Boolean = {
        var b = 0
        while (b < 2) {
          val next = t(i + b)
          if (next <= 0) {
            if (-next == leaf) { path += ((i, b)); return true }
          } else {
            path += ((i, b))
            if (walk(next)) return true
            path.remove(path.length - 1)
          }
          b += 1
        }
        false
      }
      require(walk(startNode), s"leaf $leaf unreachable")
      path.foreach { case (node, bit) => bool(bit, probs(node >> 1)) }
    }

    def finish(): Array[Byte] = {
      var i = 0
      while (i < 32) { bool(0, 128); i += 1 }
      buf.toArray
    }
  }

  // -------------------------------------------------- forward transforms

  /** Forward 4x4 DCT (libvpx-style integer arithmetic; only needs to be
    * a reasonable inverse-partner of the decoder's exact iDCT — the
    * oracle replicates the reconstruction, so approximation is safe).
    */
  private def fdct4x4(in: Array[Int], out: Array[Int]): Unit = {
    val tmp = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val base = i * 4
      val a1 = (in(base) + in(base + 3)) * 8
      val b1 = (in(base + 1) + in(base + 2)) * 8
      val c1 = (in(base + 1) - in(base + 2)) * 8
      val d1 = (in(base) - in(base + 3)) * 8
      tmp(base) = a1 + b1
      tmp(base + 2) = a1 - b1
      tmp(base + 1) = (c1 * 2217 + d1 * 5352 + 14500) >> 12
      tmp(base + 3) = (d1 * 2217 - c1 * 5352 + 7500) >> 12
      i += 1
    }
    i = 0
    while (i < 4) {
      val a1 = tmp(i) + tmp(12 + i)
      val b1 = tmp(4 + i) + tmp(8 + i)
      val c1 = tmp(4 + i) - tmp(8 + i)
      val d1 = tmp(i) - tmp(12 + i)
      out(i) = (a1 + b1 + 7) >> 4
      out(8 + i) = (a1 - b1 + 7) >> 4
      out(4 + i) = ((c1 * 2217 + d1 * 5352 + 12000) >> 16) + (if (d1 != 0) 1 else 0)
      out(12 + i) = (d1 * 2217 - c1 * 5352 + 51000) >> 16
      i += 1
    }
  }

  /** Forward WHT for the Y2 block. */
  private def fwht4x4(in: Array[Int], out: Array[Int]): Unit = {
    val tmp = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val base = i * 4
      val a1 = in(base) + in(base + 3)
      val b1 = in(base + 1) + in(base + 2)
      val c1 = in(base + 1) - in(base + 2)
      val d1 = in(base) - in(base + 3)
      tmp(base) = a1 + b1
      tmp(base + 1) = c1 + d1
      tmp(base + 2) = a1 - b1
      tmp(base + 3) = d1 - c1
      i += 1
    }
    i = 0
    while (i < 4) {
      val a1 = tmp(i) + tmp(12 + i)
      val b1 = tmp(4 + i) + tmp(8 + i)
      val c1 = tmp(4 + i) - tmp(8 + i)
      val d1 = tmp(i) - tmp(12 + i)
      out(i) = (a1 + b1 + 1) >> 1
      out(4 + i) = (c1 + d1 + 1) >> 1
      out(8 + i) = (a1 - b1 + 1) >> 1
      out(12 + i) = (d1 - c1 + 1) >> 1
      i += 1
    }
  }

  private def quantize(v: Int, q: Int): Int = {
    val a = math.abs(v)
    val s = math.min(2047, (a + q / 2) / q)
    if (v < 0) -s else s
  }

  // ------------------------------------------------------------ source

  /** Deterministic RGB source (pre-quantization). */
  def srcRgb(spec: Spec): Array[Byte] = {
    val n = spec.width * spec.height
    if (spec.smooth) {
      val g = PixelGen.smooth(spec.seed, spec.width, spec.height)
      val g2 = PixelGen.smooth(spec.seed ^ 0xCAFEL, spec.width, spec.height)
      val g3 = PixelGen.smooth(spec.seed ^ 0xF00DL, spec.width, spec.height)
      val out = new Array[Byte](n * 3)
      var i = 0
      while (i < n) {
        out(i * 3) = g(i); out(i * 3 + 1) = g2(i); out(i * 3 + 2) = g3(i)
        i += 1
      }
      out
    } else PixelGen.bytes(spec.seed, n * 3)
  }

  /** RGB -> YUV 4:2:0 (integer BT.601 full-swing; chroma = mean of the
    * covered pixels).
    */
  private def toYuv(spec: Spec): (Array[Int], Array[Int], Array[Int]) = {
    val w = spec.width; val h = spec.height
    val rgb = srcRgb(spec)
    val y = new Array[Int](w * h)
    var i = 0
    while (i < w * h) {
      val r = rgb(i * 3) & 0xff; val g = rgb(i * 3 + 1) & 0xff; val b = rgb(i * 3 + 2) & 0xff
      y(i) = (19595 * r + 38470 * g + 7471 * b + 32768) >> 16
      i += 1
    }
    val cw = (w + 1) / 2; val ch = (h + 1) / 2
    val u = new Array[Int](cw * ch)
    val v = new Array[Int](cw * ch)
    var cy = 0
    while (cy < ch) {
      var cx = 0
      while (cx < cw) {
        var su = 0; var sv = 0; var cnt = 0
        var dy = 0
        while (dy < 2) {
          var dx = 0
          while (dx < 2) {
            val px = cx * 2 + dx; val py = cy * 2 + dy
            if (px < w && py < h) {
              val r = rgb((py * w + px) * 3) & 0xff
              val g = rgb((py * w + px) * 3 + 1) & 0xff
              val b = rgb((py * w + px) * 3 + 2) & 0xff
              su += ((-11059 * r - 21709 * g + 32768 * b + 32768) >> 16) + 128
              sv += ((32768 * r - 27439 * g - 5329 * b + 32768) >> 16) + 128
              cnt += 1
            }
            dx += 1
          }
          dy += 1
        }
        u(cy * cw + cx) = math.max(0, math.min(255, (su + cnt / 2) / cnt))
        v(cy * cw + cx) = math.max(0, math.min(255, (sv + cnt / 2) / cnt))
        cx += 1
      }
      cy += 1
    }
    (y, u, v)
  }

  // --------------------------------------------------------- encoding

  private final case class Encoded(bytes: Array[Byte], rgb: Array[Byte])

  private val cache = new java.util.concurrent.ConcurrentHashMap[Spec, Encoded]()

  /** The RGB plane Vp8Decoder must produce (reconstruction, exact). */
  def plane(spec: Spec): Array[Byte] = encoded(spec).rgb

  /** The RIFF/WEBP/VP8 file. */
  def write(spec: Spec): Array[Byte] = encoded(spec).bytes

  private def encoded(spec: Spec): Encoded = {
    val hit = cache.get(spec)
    if (hit != null) return hit
    val e = encode(spec)
    if (cache.size > 64) cache.clear() // bound corpus-generation memory
    cache.put(spec, e)
    e
  }

  private def encode(spec: Spec): Encoded = {
    require(spec.width > 0 && spec.height > 0)
    require(Seq(1, 2, 4, 8).contains(spec.nParts))
    val w = spec.width; val h = spec.height
    val (srcY, srcU, srcV) = toYuv(spec)
    val mbW = (w + 15) / 16
    val mbH = (h + 15) / 16
    val yStride = mbW * 16
    val cStride = mbW * 8
    // reconstruction planes (the decoder's state, evolved in lockstep)
    val yPlane = new Array[Int](yStride * mbH * 16)
    val uPlane = new Array[Int](cStride * mbH * 8)
    val vPlane = new Array[Int](cStride * mbH * 8)
    // MB-padded source (edge-replicated so residuals stay small)
    val sy = padPlane(srcY, w, h, yStride, mbH * 16)
    val cw = (w + 1) / 2; val chh = (h + 1) / 2
    val su = padPlane(srcU, cw, chh, cStride, mbH * 8)
    val sv = padPlane(srcV, cw, chh, cStride, mbH * 8)

    val tbl = if (spec.standInTables) Vp8Tables.StandIn else Vp8Tables.Rfc
    val yacQi = math.max(0, math.min(127, spec.yacQi))
    require(spec.segments == 0 || (spec.segments >= 2 && spec.segments <= 4))
    // per-segment quantizer feature: deterministic deltas (or absolute
    // indices) that visibly separate the segments
    val segDeltas: Array[Int] = {
      val base =
        if (spec.segAbs) Array(yacQi, math.min(127, yacQi + 30),
          math.max(0, yacQi - 6), math.min(127, yacQi + 60))
        else Array(0, 24, -6, 48)
      Array.tabulate(4)(i => if (i < math.max(1, spec.segments)) base(i) else 0)
    }
    def segQi(s: Int): Int = {
      val b =
        if (spec.segments == 0) yacQi
        else if (spec.segAbs) segDeltas(s)
        else yacQi + segDeltas(s)
      math.max(0, math.min(127, b))
    }
    val qYdcA = Array.tabulate(4)(s => tbl.dcQ(segQi(s)))
    val qYacA = Array.tabulate(4)(s => tbl.acQ(segQi(s)))
    val qY2dcA = Array.tabulate(4)(s => tbl.y2DcQ(segQi(s)))
    val qY2acA = Array.tabulate(4)(s => tbl.y2AcQ(segQi(s)))
    val qUVdcA = Array.tabulate(4)(s => tbl.uvDcQ(segQi(s)))
    val qUVacA = Array.tabulate(4)(s => tbl.uvAcQ(segQi(s)))
    val segTreeProbs = Array(128, 128, 128)
    def segOf(mbX: Int, mbY: Int): Int =
      if (spec.segments == 0) 0 else (mbX + mbY) % spec.segments
    // per-segment filter-feature values (absolute levels or deltas,
    // following the shared segAbs flag), deterministic spread
    val lvl0 = math.max(0, math.min(63, spec.filterLevel))
    val segLfVals: Array[Int] =
      if (!spec.segLf) new Array[Int](4)
      else if (spec.segAbs) Array(lvl0, math.min(63, lvl0 + 18),
        math.max(0, lvl0 - 8), math.min(63, lvl0 + 40))
      else Array(0, 12, -6, 25)

    val head = new BoolEnc
    head.literal(0, 1) // color space
    head.literal(0, 1) // clamping
    if (spec.segments == 0) head.bool(0, 128) // segmentation disabled
    else {
      head.bool(1, 128) // enabled
      head.bool(1, 128) // update map
      head.bool(1, 128) // update feature data
      head.bool(if (spec.segAbs) 1 else 0, 128) // feature mode
      var i = 0
      while (i < 4) { // quantizer features
        if (segDeltas(i) != 0 || (spec.segAbs && i < spec.segments)) {
          head.bool(1, 128); head.signed(segDeltas(i), 7)
        } else head.bool(0, 128)
        i += 1
      }
      i = 0
      while (i < 4) { // loop-filter features
        if (spec.segLf && (segLfVals(i) != 0 || (spec.segAbs && i < spec.segments))) {
          head.bool(1, 128); head.signed(segLfVals(i), 6)
        } else head.bool(0, 128)
        i += 1
      }
      i = 0
      while (i < 3) { // tree prob updates
        head.bool(1, 128); head.literal(segTreeProbs(i), 8)
        i += 1
      }
    }
    head.literal(if (spec.simpleFilter) 1 else 0, 1) // filter type
    head.literal(lvl0, 6)
    head.literal(math.max(0, math.min(7, spec.filterSharpness)), 3)
    val useLfDeltas = spec.lfRefDelta != 0 || spec.lfModeDelta != 0
    if (useLfDeltas) {
      head.bool(1, 128) // lf deltas enabled
      head.bool(1, 128) // update
      head.bool(1, 128); head.signed(spec.lfRefDelta, 6) // ref 0 (intra)
      var di = 0
      while (di < 3) { head.bool(0, 128); di += 1 } // inter refs untouched
      head.bool(1, 128); head.signed(spec.lfModeDelta, 6) // mode 0 (B_PRED)
      di = 0
      while (di < 3) { head.bool(0, 128); di += 1 }
    } else head.bool(0, 128) // lf deltas disabled
    head.literal(Integer.numberOfTrailingZeros(spec.nParts), 2)
    head.literal(yacQi, 7)
    var d = 0
    while (d < 5) { head.bool(0, 128); d += 1 } // no quant deltas
    head.literal(0, 1) // refresh entropy
    // token prob updates: none (flags 0 under the shared update table)
    var p0 = 0
    while (p0 < 4) {
      var b0 = 0
      while (b0 < 8) {
        var c0 = 0
        while (c0 < 3) {
          var n0 = 0
          while (n0 < 11) {
            head.bool(0, tbl.tokenUpdateProbs(p0)(b0)(c0)(n0))
            n0 += 1
          }
          c0 += 1
        }
        b0 += 1
      }
      p0 += 1
    }
    val skipProb = 200
    if (spec.skipFlags) { head.bool(1, 128); head.literal(skipProb, 8) }
    else head.bool(0, 128)

    val tokEnc = Array.fill(spec.nParts)(new BoolEnc)
    val probs = tbl.tokenProbs

    // context state mirroring the decoder exactly
    val aboveSub = Array.fill(mbW * 4)(0)
    val aboveNz = new Array[Int](mbW * 4)
    val aboveNzU = new Array[Int](mbW * 2)
    val aboveNzV = new Array[Int](mbW * 2)
    val aboveNzY2 = new Array[Int](mbW)

    val res = new Array[Int](16)
    val coefs = new Array[Int](16)
    val block = new Array[Int](16)
    val zz = Vp8Decoder.Zigzag

    val rng = new java.util.SplittableRandom(spec.seed ^ 0x8BADF00DL)
    val innerFlags = new Array[Boolean](mbW * mbH)
    val mbLevels = new Array[Int](mbW * mbH)

    var mbY = 0
    while (mbY < mbH) {
      val leftSub = Array.fill(4)(0)
      val leftNz = new Array[Int](4)
      val leftNzU = new Array[Int](2)
      val leftNzV = new Array[Int](2)
      var leftNzY2 = 0
      val te = tokEnc(mbY % spec.nParts)
      var mbX = 0
      while (mbX < mbW) {
        // deterministic mode mix: every 16x16 mode + B_PRED in play
        val yMode = rng.nextInt(5)
        val uvMode = rng.nextInt(4)
        val segId = segOf(mbX, mbY)
        val qYdc = qYdcA(segId); val qYac = qYacA(segId)
        val qY2dc = qY2dcA(segId); val qY2ac = qY2acA(segId)
        val qUVdc = qUVdcA(segId); val qUVac = qUVacA(segId)
        val hasY2 = yMode != 4
        val subModes = new Array[Int](16)

        // ---- plan the whole MB: compute quantized coefficients first
        // (skip decision needs them), predicting against the recon plane
        val lumaQ = Array.ofDim[Int](16, 16) // per subblock, zigzag order
        val y2Q = new Array[Int](16)
        val uQ = Array.ofDim[Int](4, 16)
        val vQ = Array.ofDim[Int](4, 16)
        val y2raw = new Array[Int](16)

        if (hasY2) {
          Vp8Decoder.predictMb(yPlane, yStride, mbX * 16, mbY * 16, 16, yMode)
          // per-subblock fdct of (src - pred); DC goes to Y2
          var sb = 0
          while (sb < 16) {
            val sx = sb & 3; val sy2 = sb >> 2
            gatherResidual(sy, yPlane, yStride, mbX * 16 + sx * 4,
              mbY * 16 + sy2 * 4, res)
            fdct4x4(res, res)
            y2raw(sb) = res(0)
            var i = 1
            while (i < 16) {
              lumaQ(sb)(i) = quantize(res(zz(i)), qYac)
              i += 1
            }
            sb += 1
          }
          fwht4x4(y2raw, y2raw)
          var i = 0
          while (i < 16) {
            y2Q(i) = quantize(y2raw(zz(i)), if (i == 0) qY2dc else qY2ac)
            i += 1
          }
        } else {
          // B_PRED plans per sub-block during the write pass (prediction
          // depends on previously-reconstructed sub-blocks); only the
          // mode CHOICES are drawn here
          var sb = 0
          while (sb < 16) {
            subModes(sb) = rng.nextInt(10)
            sb += 1
          }
        }
        // chroma planning
        Vp8Decoder.predictMb(uPlane, cStride, mbX * 8, mbY * 8, 8, uvMode)
        Vp8Decoder.predictMb(vPlane, cStride, mbX * 8, mbY * 8, 8, uvMode)
        var csb = 0
        while (csb < 4) {
          val sx = csb & 1; val sy2 = csb >> 1
          gatherResidual(su, uPlane, cStride, mbX * 8 + sx * 4, mbY * 8 + sy2 * 4, res)
          fdct4x4(res, res)
          var i = 0
          while (i < 16) { uQ(csb)(i) = quantize(res(zz(i)), if (i == 0) qUVdc else qUVac); i += 1 }
          gatherResidual(sv, vPlane, cStride, mbX * 8 + sx * 4, mbY * 8 + sy2 * 4, res)
          fdct4x4(res, res)
          var j = 0
          while (j < 16) { vQ(csb)(j) = quantize(res(zz(j)), if (j == 0) qUVdc else qUVac); j += 1 }
          csb += 1
        }

        // skip = every coded block is all-zero (B_PRED MBs plan later,
        // so they never skip — matching what we then actually write)
        val allZero = hasY2 &&
          y2Q.forall(_ == 0) && lumaQ.forall(b => (1 until 16).forall(b(_) == 0)) &&
          uQ.forall(_.forall(_ == 0)) && vQ.forall(_.forall(_ == 0))
        val skip = if (spec.skipFlags && allZero) 1 else 0

        // ---- header-partition MB record (order: segment, skip, modes)
        if (spec.segments > 0)
          head.tree(Vp8Decoder.SegTree, segTreeProbs, segId)
        if (spec.skipFlags) head.bool(skip, skipProb)
        if (hasY2) {
          head.tree(Vp8Decoder.KfYModeTree, Vp8Decoder.KfYModeProbs, yMode)
          java.util.Arrays.fill(subModes, Vp8Decoder.SubModeOf16x16(yMode))
        } else {
          head.tree(Vp8Decoder.KfYModeTree, Vp8Decoder.KfYModeProbs, 4)
          var sb = 0
          while (sb < 16) {
            val sx = sb & 3; val sy2 = sb >> 2
            val above = if (sy2 == 0) aboveSub(mbX * 4 + sx) else subModes(sb - 4)
            val left = if (sx == 0) leftSub(sy2) else subModes(sb - 1)
            head.tree(Vp8Decoder.BModeTree,
              tbl.kfBModeProbs(above)(left), subModes(sb))
            sb += 1
          }
        }
        head.tree(Vp8Decoder.UvModeTree, Vp8Decoder.KfUvModeProbs, uvMode)

        // ---- token partition writes + lockstep reconstruction
        var mbTotNz = 0
        if (hasY2) {
          val ctx = leftNzY2 + aboveNzY2(mbX)
          var y2Nz = 0
          if (skip == 0) {
            y2Nz = writeCoefs(te, probs, 1, ctx, 0, y2Q)
          }
          mbTotNz += y2Nz
          leftNzY2 = if (y2Nz > 0) 1 else 0
          aboveNzY2(mbX) = leftNzY2
          // dequantized Y2 -> inverse WHT (decoder's path)
          java.util.Arrays.fill(block, 0)
          if (skip == 0) {
            var i = 0
            while (i < 16) { block(zz(i)) = y2Q(i) * (if (i == 0) qY2dc else qY2ac); i += 1 }
          }
          Vp8Decoder.iwht4x4(block, block)
          System.arraycopy(block, 0, y2raw, 0, 16)
        }
        val planeIdx = if (hasY2) 0 else 3
        val firstCoef = if (hasY2) 1 else 0
        val subNz = new Array[Int](16)
        var sb = 0
        while (sb < 16) {
          val sx = sb & 3; val sy2 = sb >> 2
          val x4 = mbX * 16 + sx * 4; val y4 = mbY * 16 + sy2 * 4
          if (!hasY2) {
            // B_PRED: predict now (needs the evolving recon), fdct, quant
            val pred = Vp8Decoder.subPredict(yPlane, yStride, x4, y4, subModes(sb))
            var i = 0
            while (i < 16) {
              val r0 = i >> 2; val c0 = i & 3
              res(i) = sy((y4 + r0) * yStride + x4 + c0) - pred(i)
              i += 1
            }
            fdct4x4(res, res)
            i = 0
            while (i < 16) { lumaQ(sb)(i) = quantize(res(zz(i)), if (i == 0) qYdc else qYac); i += 1 }
            val l = if (sx == 0) leftNz(sy2) else subNz(sb - 1)
            val a = if (sy2 == 0) aboveNz(mbX * 4 + sx) else subNz(sb - 4)
            val nz = writeCoefs(te, probs, planeIdx, l + a, firstCoef, lumaQ(sb))
            subNz(sb) = if (nz > 0) 1 else 0
            // reconstruct exactly as the decoder
            java.util.Arrays.fill(block, 0)
            i = firstCoef
            while (i < 16) { block(zz(i)) = lumaQ(sb)(i) * (if (i == 0) qYdc else qYac); i += 1 }
            Vp8Decoder.idct4x4(block, block)
            Vp8Decoder.applyPred(yPlane, yStride, x4, y4, pred, block)
          } else {
            var nz = 0
            if (skip == 0) {
              val l = if (sx == 0) leftNz(sy2) else subNz(sb - 1)
              val a = if (sy2 == 0) aboveNz(mbX * 4 + sx) else subNz(sb - 4)
              nz = writeCoefs(te, probs, planeIdx, l + a, firstCoef, lumaQ(sb))
            }
            subNz(sb) = if (nz > 0) 1 else 0
            java.util.Arrays.fill(block, 0)
            if (skip == 0) {
              var i = firstCoef
              while (i < 16) { block(zz(i)) = lumaQ(sb)(i) * (if (i == 0) qYdc else qYac); i += 1 }
            }
            block(0) = y2raw(sb)
            Vp8Decoder.idct4x4(block, block)
            Vp8Decoder.addResidual(yPlane, yStride, x4, y4, block)
          }
          sb += 1
        }
        var i2 = 0
        while (i2 < 4) {
          mbTotNz += subNz(i2 * 4) + subNz(i2 * 4 + 1) + subNz(i2 * 4 + 2) + subNz(i2 * 4 + 3)
          leftNz(i2) = subNz(i2 * 4 + 3)
          aboveNz(mbX * 4 + i2) = subNz(12 + i2)
          i2 += 1
        }
        mbTotNz += writeChroma(te, probs, skip, uQ, uPlane, cStride, mbX, mbY,
          leftNzU, aboveNzU, qUVdc, qUVac, block, zz)
        mbTotNz += writeChroma(te, probs, skip, vQ, vPlane, cStride, mbX, mbY,
          leftNzV, aboveNzV, qUVdc, qUVac, block, zz)
        innerFlags(mbY * mbW + mbX) = mbTotNz > 0 || !hasY2
        mbLevels(mbY * mbW + mbX) = Vp8Decoder.mbFilterLevel(lvl0,
          spec.segments > 0, spec.segAbs, segLfVals, segId, useLfDeltas,
          spec.lfRefDelta, spec.lfModeDelta, !hasY2)

        i2 = 0
        while (i2 < 4) { aboveSub(mbX * 4 + i2) = subModes(12 + i2); i2 += 1 }
        i2 = 0
        while (i2 < 4) { leftSub(i2) = subModes(i2 * 4 + 3); i2 += 1 }
        mbX += 1
      }
      mbY += 1
    }

    val part0 = head.finish()
    val parts = tokEnc.map(_.finish())

    // in-loop deblocking over the finished reconstruction — the shared
    // decoder implementation (per-MB levels), so the filtered
    // round-trip stays exact
    if (mbLevels.exists(_ > 0))
      Vp8Decoder.loopFilterFrame(yPlane, uPlane, vPlane, yStride, cStride,
        mbW, mbH, if (spec.simpleFilter) 1 else 0, mbLevels,
        math.max(0, math.min(7, spec.filterSharpness)), innerFlags)

    // ---- expected RGB (the decoder's crop + YUV->RGB conversion)
    val rgb = new Array[Byte](w * h * 3)
    var yy = 0
    while (yy < h) {
      var x = 0
      while (x < w) {
        val yv = yPlane(yy * yStride + x)
        val uv = uPlane((yy >> 1) * cStride + (x >> 1))
        val vv = vPlane((yy >> 1) * cStride + (x >> 1))
        val o = (yy * w + x) * 3
        rgb(o) = clamp(Vp8Decoder.yuvR(yv, uv, vv)).toByte
        rgb(o + 1) = clamp(Vp8Decoder.yuvG(yv, uv, vv)).toByte
        rgb(o + 2) = clamp(Vp8Decoder.yuvB(yv, uv, vv)).toByte
        x += 1
      }
      yy += 1
    }

    // ---- container
    val payload = new ByteArrayOutputStream()
    // frame tag: key frame (0), version 0, show_frame 1, part0 size
    val tag = (part0.length << 5) | (1 << 4) | 0
    payload.write(tag & 0xff); payload.write((tag >> 8) & 0xff); payload.write((tag >> 16) & 0xff)
    payload.write(0x9d); payload.write(0x01); payload.write(0x2a)
    payload.write(w & 0xff); payload.write((w >> 8) & 0x3f)
    payload.write(h & 0xff); payload.write((h >> 8) & 0x3f)
    payload.write(part0)
    var pi = 0
    while (pi < parts.length - 1) {
      val sz = parts(pi).length
      payload.write(sz & 0xff); payload.write((sz >> 8) & 0xff); payload.write((sz >> 16) & 0xff)
      pi += 1
    }
    parts.foreach(payload.write)
    val body = payload.toByteArray
    val out = new ByteArrayOutputStream()
    def u32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    out.write("RIFF".getBytes(StandardCharsets.US_ASCII))
    u32(4 + 8 + body.length + (body.length & 1))
    out.write("WEBP".getBytes(StandardCharsets.US_ASCII))
    out.write("VP8 ".getBytes(StandardCharsets.US_ASCII))
    u32(body.length)
    out.write(body)
    if ((body.length & 1) == 1) out.write(0)
    Encoded(out.toByteArray, rgb)
  }

  private def clamp(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** Edge-replicated MB-padded copy of a source plane. */
  private def padPlane(src: Array[Int], w: Int, h: Int, stride: Int,
      rows: Int): Array[Int] = {
    val out = new Array[Int](stride * rows)
    var r = 0
    while (r < rows) {
      val sr = math.min(r, h - 1)
      var c = 0
      while (c < stride) {
        out(r * stride + c) = src(sr * w + math.min(c, w - 1))
        c += 1
      }
      r += 1
    }
    out
  }

  private def gatherResidual(src: Array[Int], recon: Array[Int], stride: Int,
      x: Int, y: Int, res: Array[Int]): Unit = {
    var r = 0
    while (r < 4) {
      var c = 0
      while (c < 4) {
        res(r * 4 + c) = src((y + r) * stride + x + c) - recon((y + r) * stride + x + c)
        c += 1
      }
      r += 1
    }
  }

  private def writeChroma(te: BoolEnc, probs: Array[Array[Array[Array[Int]]]],
      skip: Int, q: Array[Array[Int]], plane: Array[Int], stride: Int,
      mbX: Int, mbY: Int, leftNz: Array[Int], aboveNz: Array[Int],
      qdc: Int, qac: Int, block: Array[Int], zz: Array[Int]): Int = {
    var totalNz = 0
    val buf = new Array[Int](4)
    var sb = 0
    while (sb < 4) {
      val sx = sb & 1; val sy2 = sb >> 1
      var nz = 0
      if (skip == 0) {
        val l = if (sx == 0) leftNz(sy2) else buf(sy2 * 2)
        val a = if (sy2 == 0) aboveNz(mbX * 2 + sx) else buf(sx)
        nz = writeCoefs(te, probs, 2, l + a, 0, q(sb))
      }
      java.util.Arrays.fill(block, 0)
      if (skip == 0) {
        var i = 0
        while (i < 16) { block(zz(i)) = q(sb)(i) * (if (i == 0) qdc else qac); i += 1 }
      }
      Vp8Decoder.idct4x4(block, block)
      Vp8Decoder.addResidual(plane, stride, mbX * 8 + sx * 4, mbY * 8 + sy2 * 4, block)
      buf(sy2 * 2 + sx) = if (nz > 0) 1 else 0
      totalNz += buf(sy2 * 2 + sx)
      if (sx == 1) leftNz(sy2) = buf(sy2 * 2 + sx)
      if (sy2 == 1) aboveNz(mbX * 2 + sx) = buf(sy2 * 2 + sx)
      sb += 1
    }
    totalNz
  }

  /** Token-write one block's quantized coefficients (zigzag order) —
    * the exact mirror of the decoder's readCoefs: same tree, same
    * (plane, band, ctx) conditioning, same EOB-after-zero suppression.
    * Returns the nonzero count.
    */
  private def writeCoefs(te: BoolEnc, probs: Array[Array[Array[Array[Int]]]],
      plane: Int, ctx0: Int, first: Int, q: Array[Int]): Int = {
    var lastNz = -1
    var i = first
    while (i < 16) { if (q(i) != 0) lastNz = i; i += 1 }
    var ctx = ctx0
    var nonzero = 0
    var afterZero = false
    i = first
    while (i <= lastNz) {
      val band = Vp8Decoder.CoeffBands(i)
      val p = probs(plane)(band)(ctx)
      val v = q(i)
      val a = math.abs(v)
      val tok =
        if (a == 0) 0
        else if (a <= 4) a
        else if (a < 11) { if (a < 7) 5 else 6 }
        else if (a < 19) 7
        else if (a < 35) 8
        else if (a < 67) 9
        else 10
      te.tree(Vp8Decoder.TokenTree, p, tok, if (afterZero) 2 else 0)
      if (a == 0) { ctx = 0; afterZero = true }
      else {
        afterZero = false
        if (a > 4) {
          val cat = tok - 5
          val extra = a - Vp8Decoder.CatBase(cat)
          val cp = Vp8Decoder.CatProbs(cat)
          var k = 0
          while (k < cp.length) {
            te.bool((extra >> (cp.length - 1 - k)) & 1, cp(k))
            k += 1
          }
        }
        te.bool(if (v < 0) 1 else 0, 128)
        ctx = if (a == 1) 1 else 2
        nonzero += 1
      }
      i += 1
    }
    if (lastNz < 15) {
      val band = Vp8Decoder.CoeffBands(math.max(first, lastNz + 1))
      // EOB always follows a nonzero token (or opens the block)
      te.tree(Vp8Decoder.TokenTree, probs(plane)(band)(ctx), 11, 0)
    }
    nonzero
  }
}
