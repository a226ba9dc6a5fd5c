package graft.kernel

/** Lossy WebP (VP8) KEY-FRAME decoder, from scratch per RFC 6386: the
  * boolean arithmetic decoder (§7), key-frame header layout (§9),
  * macroblock intra prediction — all four 16x16 modes, all four chroma
  * modes, and the ten 4x4 B_PRED sub-modes with the spec's edge rules —
  * token-tree coefficient decoding with (plane, band, context)
  * conditioning, category extra bits, dequantization, the exact inverse
  * WHT (Y2) and inverse DCT (§14), 1..8 token partitions, and the
  * IN-LOOP DEBLOCKING FILTER (§15: normal MB/subblock edge filters with
  * hev thresholds, and the simple luma-only variant), applied over the
  * whole reconstructed frame (intra prediction sees unfiltered samples).
  *
  * SEGMENTATION (§9.3) is modeled for the quantizer feature: per-MB
  * segment ids through the segment tree, absolute or delta per-segment
  * quantizer indices.
  *
  * Scope (declared): key frames only (all a WebP ever contains);
  * non-zero filter levels combined with lf-deltas or per-segment
  * filter features return None rather than emit approximately-filtered
  * pixels (same silently-wrong-is-worse rule as the VP8L subset).
  *
  * Probability tables: the tree SHAPES, kf mode probabilities
  * ({145,156,163,128} / {142,114,183}), token category extra-bit
  * probabilities, zigzag and coefficient bands are transcribed from the
  * RFC. The three large VALUE tables (default token probabilities
  * 4x8x3x11, their update-flag probabilities, the kf 4x4-mode context
  * table 10x10x9) and the dc/ac quantizer lookups are injected via
  * [[Vp8Tables]]: the default `decode` runs on the conformant RFC 6386
  * data (`Vp8Tables.Rfc`); the round-5 deterministic stand-in set
  * (`Vp8Tables.StandIn`) is kept as a second injected set so the
  * original round-trip pins run under both. Conformance against real
  * third-party streams (libwebp-encoded fixtures) is pinned in
  * Vp8ConformanceSpec.
  *
  * Like every decoder here: malformed input -> None, never a throw.
  */
object Vp8Decoder {

  // ------------------------------------------------------------ constants

  /** kf luma mode tree (RFC 6386 §8.2): B_PRED first, then DC/V/H/TM. */
  private[graft] val KfYModeTree = Array(-4, 2, 4, 6, -0, -1, -2, -3)
  // leaves: 0=DC,1=V,2=H,3=TM,4=B_PRED (encoded as -leaf)
  private[graft] val KfYModeProbs = Array(145, 156, 163, 128)

  private[graft] val UvModeTree = Array(-0, 2, -1, 4, -2, -3) // DC,V,H,TM
  private[graft] val KfUvModeProbs = Array(142, 114, 183)

  /** Segment-id tree (4 segments, 2 levels). */
  private[graft] val SegTree = Array(2, 4, -0, -1, -2, -3)

  /** 4x4 sub-mode tree; modes are numbered in TREE-TRAVERSAL order
    * (the same numbering libwebp's enum uses): 0=DC, 1=TM, 2=VE, 3=HE,
    * 4=RD, 5=VR, 6=LD, 7=VL, 8=HD, 9=HU. This is the axis order of the
    * RFC's kf_bmode_prob context table, so conformant streams decode
    * with no index remapping.
    */
  private[graft] val BModeTree = Array(
    -0, 2,      // B_DC_PRED
    -1, 4,      // B_TM_PRED
    -2, 6,      // B_VE_PRED
    8, 12,
    -3, 10,     // B_HE_PRED
    -4, -5,     // B_RD_PRED, B_VR_PRED
    -6, 14,     // B_LD_PRED
    -7, 16,     // B_VL_PRED
    -8, -9)     // B_HD_PRED, B_HU_PRED

  /** Token tree (RFC 6386 §13.2): EOB, 0, 1, 2, 3, 4, cat1..cat6. */
  private[graft] val TokenTree = Array(
    -11, 2,         // EOB (leaf 11)
    -0, 4,          // DCT_0
    -1, 6,          // DCT_1
    8, 12,
    -2, 10,         // DCT_2
    -3, -4,         // DCT_3, DCT_4
    14, 16,
    -5, -6,         // cat1, cat2
    18, 20,
    -7, -8,         // cat3, cat4
    -9, -10)        // cat5, cat6

  /** Category extra-bit probabilities (RFC 6386 §13.2). */
  private[graft] val CatProbs: Array[Array[Int]] = Array(
    Array(159),
    Array(165, 145),
    Array(173, 148, 140),
    Array(176, 155, 140, 135),
    Array(180, 157, 141, 134, 130),
    Array(254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129))
  private[graft] val CatBase = Array(5, 7, 11, 19, 35, 67)

  /** Zigzag scan order (RFC 6386 §13.5). */
  private[graft] val Zigzag = Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

  /** Coefficient bands (RFC 6386 §13.3). */
  private[graft] val CoeffBands = Array(0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)

  /** Neighbor sub-mode context registered by a 16x16-coded MB (RFC:
    * DC->B_DC(0), V->B_VE(2), H->B_HE(3), TM->B_TM(1)).
    */
  private[graft] val SubModeOf16x16 = Array(0, 2, 3, 1)

  // ------------------------------------------------------- bool decoder

  private[graft] final class BoolDec(data: Array[Byte], start: Int, end: Int) {
    private var pos = start
    private var range = 255
    private var value = 0L
    private var bits = -8 // forces an initial 2-byte load
    var bad = false
    // load the first two bytes
    value = (nextByte() << 8) | nextByte()

    private def nextByte(): Int =
      if (pos < end) { val b = data(pos) & 0xff; pos += 1; b }
      else { bad = true; 0 }

    def bool(prob: Int): Int = {
      val split = 1 + (((range - 1) * prob) >> 8)
      val bigSplit = split.toLong << 8
      var bit = 0
      if (value >= bigSplit) { bit = 1; range -= split; value -= bigSplit }
      else range = split
      while (range < 128) {
        value <<= 1
        range <<= 1
        bits += 1
        if (bits == 0) { bits = -8; value |= nextByte() }
      }
      bit
    }

    def literal(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bool(128); i += 1 }
      v
    }

    def signed(n: Int): Int = {
      val v = literal(n)
      if (bool(128) == 1) -v else v
    }

    /** Walk a tree (pairs of children; negative = leaf ~ -value). */
    def tree(t: Array[Int], probs: Array[Int]): Int = {
      var i = 0
      var guard = 0
      while (guard < 32) {
        val b = bool(probs(i >> 1))
        val next = t(i + b)
        if (next <= 0) return -next
        i = next
        guard += 1
      }
      bad = true
      0
    }
  }

  // -------------------------------------------------------- transforms

  /** Exact inverse DCT (RFC 6386 §14.4 arithmetic). */
  private[graft] def idct4x4(in: Array[Int], out: Array[Int]): Unit = {
    val tmp = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val a1 = in(i) + in(8 + i)
      val b1 = in(i) - in(8 + i)
      val t1 = (in(4 + i) * 35468) >> 16
      val t2 = in(12 + i) + ((in(12 + i) * 20091) >> 16)
      val c1 = t1 - t2
      val t3 = in(4 + i) + ((in(4 + i) * 20091) >> 16)
      val t4 = (in(12 + i) * 35468) >> 16
      val d1 = t3 + t4
      tmp(i) = a1 + d1
      tmp(12 + i) = a1 - d1
      tmp(4 + i) = b1 + c1
      tmp(8 + i) = b1 - c1
      i += 1
    }
    i = 0
    while (i < 4) {
      val base = i * 4
      val a1 = tmp(base) + tmp(base + 2)
      val b1 = tmp(base) - tmp(base + 2)
      val t1 = (tmp(base + 1) * 35468) >> 16
      val t2 = tmp(base + 3) + ((tmp(base + 3) * 20091) >> 16)
      val c1 = t1 - t2
      val t3 = tmp(base + 1) + ((tmp(base + 1) * 20091) >> 16)
      val t4 = (tmp(base + 3) * 35468) >> 16
      val d1 = t3 + t4
      out(base) = (a1 + d1 + 4) >> 3
      out(base + 3) = (a1 - d1 + 4) >> 3
      out(base + 1) = (b1 + c1 + 4) >> 3
      out(base + 2) = (b1 - c1 + 4) >> 3
      i += 1
    }
  }

  /** Exact inverse WHT for the Y2 block (RFC 6386 §14.3). */
  private[graft] def iwht4x4(in: Array[Int], out: Array[Int]): Unit = {
    val tmp = new Array[Int](16)
    var i = 0
    while (i < 4) {
      val a1 = in(i) + in(12 + i)
      val b1 = in(4 + i) + in(8 + i)
      val c1 = in(4 + i) - in(8 + i)
      val d1 = in(i) - in(12 + i)
      tmp(i) = a1 + b1
      tmp(4 + i) = c1 + d1
      tmp(8 + i) = a1 - b1
      tmp(12 + i) = d1 - c1
      i += 1
    }
    i = 0
    while (i < 4) {
      val base = i * 4
      val a1 = tmp(base) + tmp(base + 3)
      val b1 = tmp(base + 1) + tmp(base + 2)
      val c1 = tmp(base + 1) - tmp(base + 2)
      val d1 = tmp(base) - tmp(base + 3)
      out(base) = (a1 + b1 + 3) >> 3
      out(base + 1) = (c1 + d1 + 3) >> 3
      out(base + 2) = (a1 - b1 + 3) >> 3
      out(base + 3) = (d1 - c1 + 3) >> 3
      i += 1
    }
  }

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  // ----------------------------------------------------------- planes

  /** Decoded frame in YUV 4:2:0 (planes include no border). */
  private[graft] final case class Yuv(w: Int, h: Int,
      y: Array[Int], u: Array[Int], v: Array[Int]) {
    val cw: Int = (w + 1) / 2
    val ch: Int = (h + 1) / 2
  }

  // --------------------------------------------------------- top level

  def decode(bytes: Array[Byte]): Option[RawImage] = decode(bytes, Vp8Tables.Rfc)

  /** Table-set-parameterized entry (tests pin both sets; production
    * always decodes with the conformant RFC values).
    */
  private[graft] def decode(bytes: Array[Byte], tables: Vp8Tables): Option[RawImage] = {
    try decodeImpl(bytes, tables)
    catch { case scala.util.control.NonFatal(_) => None }
  }

  /** RGB output through the shared exact YUV->RGB integer conversion. */
  private def decodeImpl(bytes: Array[Byte], tables: Vp8Tables): Option[RawImage] =
    decodeYuv(bytes, tables).map { f =>
      val out = new Array[Byte](f.w * f.h * 3)
      var yy = 0
      while (yy < f.h) {
        var x = 0
        while (x < f.w) {
          val yv = f.y(yy * f.w + x)
          val uv = f.u((yy >> 1) * f.cw + (x >> 1))
          val vv = f.v((yy >> 1) * f.cw + (x >> 1))
          val o = (yy * f.w + x) * 3
          out(o) = clamp255(yuvR(yv, uv, vv)).toByte
          out(o + 1) = clamp255(yuvG(yv, uv, vv)).toByte
          out(o + 2) = clamp255(yuvB(yv, uv, vv)).toByte
          x += 1
        }
        yy += 1
      }
      RawImage(f.w, f.h, 3, out)
    }

  /** Integer BT.601 full-swing pairs, shared with the encoder so the
    * round-trip stays exact.
    */
  private[graft] def yuvR(y: Int, u: Int, v: Int): Int = y + ((91881 * (v - 128)) >> 16)
  private[graft] def yuvG(y: Int, u: Int, v: Int): Int =
    y - ((22554 * (u - 128) + 46802 * (v - 128)) >> 16)
  private[graft] def yuvB(y: Int, u: Int, v: Int): Int = y + ((116130 * (u - 128)) >> 16)

  /** Find the VP8 chunk inside a RIFF WebP container. */
  private def vp8Chunk(bytes: Array[Byte]): Option[(Int, Int)] = {
    if (bytes.length < 20 || bytes(0) != 'R' || bytes(1) != 'I' ||
      bytes(2) != 'F' || bytes(3) != 'F' || bytes(8) != 'W' ||
      bytes(9) != 'E' || bytes(10) != 'B' || bytes(11) != 'P') return None
    var p = 12
    while (p + 8 <= bytes.length) {
      val tag = new String(bytes, p, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = (bytes(p + 4) & 0xff) | ((bytes(p + 5) & 0xff) << 8) |
        ((bytes(p + 6) & 0xff) << 16) | ((bytes(p + 7) & 0xff) << 24)
      if (size < 0 || p + 8 + size > bytes.length) return None
      if (tag == "VP8 ") return Some((p + 8, p + 8 + size))
      p += 8 + size + (size & 1)
    }
    None
  }

  private[graft] def decodeYuv(bytes: Array[Byte],
      tables: Vp8Tables = Vp8Tables.Rfc): Option[Yuv] = {
    val (s, e) = vp8Chunk(bytes).getOrElse(return None)
    if (e - s < 10) return None
    // frame tag (3 bytes LE)
    val tag = (bytes(s) & 0xff) | ((bytes(s + 1) & 0xff) << 8) | ((bytes(s + 2) & 0xff) << 16)
    val keyFrame = (tag & 1) == 0
    val firstPartSize = tag >> 5
    if (!keyFrame) return None // declared: key frames only
    if ((bytes(s + 3) & 0xff) != 0x9d || (bytes(s + 4) & 0xff) != 0x01 ||
      (bytes(s + 5) & 0xff) != 0x2a) return None
    val wRaw = (bytes(s + 6) & 0xff) | ((bytes(s + 7) & 0xff) << 8)
    val hRaw = (bytes(s + 8) & 0xff) | ((bytes(s + 9) & 0xff) << 8)
    val w = wRaw & 0x3fff
    val h = hRaw & 0x3fff
    if (w == 0 || h == 0 || w.toLong * h > 64L * 1024 * 1024) return None
    val part0 = s + 10
    if (part0 + firstPartSize > e) return None
    val bd = new BoolDec(bytes, part0, part0 + firstPartSize)

    bd.literal(1) // color space (0 expected)
    bd.literal(1) // clamping type
    // segmentation (RFC §9.3): per-segment QUANTIZER and per-segment
    // LOOP-FILTER features are both modeled (libwebp's encoder emits
    // the filter feature by default, so real streams require it)
    var segEnabled = false
    var segUpdateMap = false
    var segAbs = false
    val segQiDelta = new Array[Int](4)
    val segLfVal = new Array[Int](4)
    val segTreeProbs = Array(255, 255, 255)
    if (bd.bool(128) == 1) {
      segEnabled = true
      segUpdateMap = bd.bool(128) == 1
      val updateData = bd.bool(128) == 1
      if (updateData) {
        segAbs = bd.bool(128) == 1
        var i = 0
        while (i < 4) {
          if (bd.bool(128) == 1) segQiDelta(i) = bd.signed(7)
          i += 1
        }
        i = 0
        while (i < 4) {
          if (bd.bool(128) == 1) segLfVal(i) = bd.signed(6)
          i += 1
        }
      }
      if (segUpdateMap) {
        var i = 0
        while (i < 3) {
          if (bd.bool(128) == 1) segTreeProbs(i) = bd.literal(8)
          i += 1
        }
      }
    }
    val filterType = bd.literal(1) // 0 = normal, 1 = simple
    val filterLevel = bd.literal(6)
    val sharpness = bd.literal(3)
    // mode/ref loop-filter deltas (RFC §9.4): on a key frame every MB
    // is intra (ref delta 0) and B_PRED MBs add mode delta 0; the other
    // six deltas are inter-only and just parsed for bit sync
    var lfDeltas = false
    val refLfDelta = new Array[Int](4)
    val modeLfDelta = new Array[Int](4)
    if (bd.bool(128) == 1) { // lf delta enabled
      lfDeltas = true
      if (bd.bool(128) == 1) { // update deltas
        var i = 0
        while (i < 4) { if (bd.bool(128) == 1) refLfDelta(i) = bd.signed(6); i += 1 }
        i = 0
        while (i < 4) { if (bd.bool(128) == 1) modeLfDelta(i) = bd.signed(6); i += 1 }
      }
    }
    val nParts = 1 << bd.literal(2)
    // token partition sizes: (nParts-1) 3-byte LE fields after part 0
    val sizesAt = part0 + firstPartSize
    if (sizesAt + (nParts - 1) * 3 > e) return None
    val partStarts = new Array[Int](nParts)
    val partEnds = new Array[Int](nParts)
    var pp = sizesAt + (nParts - 1) * 3
    var pi = 0
    while (pi < nParts) {
      val sz =
        if (pi == nParts - 1) e - pp
        else (bytes(sizesAt + pi * 3) & 0xff) | ((bytes(sizesAt + pi * 3 + 1) & 0xff) << 8) |
          ((bytes(sizesAt + pi * 3 + 2) & 0xff) << 16)
      if (sz < 0 || pp + sz > e) return None
      partStarts(pi) = pp
      partEnds(pi) = pp + sz
      pp += sz
      pi += 1
    }
    // quant header
    val yacQi = bd.literal(7)
    def delta(): Int = if (bd.bool(128) == 1) bd.signed(4) else 0
    val ydcD = delta(); val y2dcD = delta(); val y2acD = delta()
    val uvdcD = delta(); val uvacD = delta()
    bd.literal(1) // refresh entropy probs (kf: ignored)
    // token probability updates (update-table conditioned flags)
    val probs = Array.tabulate(4, 8, 3, 11) { (p, b, c, n) => tables.tokenProbs(p)(b)(c)(n) }
    var p0 = 0
    while (p0 < 4) {
      var b0 = 0
      while (b0 < 8) {
        var c0 = 0
        while (c0 < 3) {
          var n0 = 0
          while (n0 < 11) {
            if (bd.bool(tables.tokenUpdateProbs(p0)(b0)(c0)(n0)) == 1)
              probs(p0)(b0)(c0)(n0) = bd.literal(8)
            n0 += 1
          }
          c0 += 1
        }
        b0 += 1
      }
      p0 += 1
    }
    val noSkip = bd.bool(128)
    val skipProb = if (noSkip == 1) bd.literal(8) else 0
    if (bd.bad) return None

    val mbW = (w + 15) / 16
    val mbH = (h + 15) / 16
    // plane buffers sized to whole macroblocks; cropped at the end
    val yStride = mbW * 16
    val cStride = mbW * 8
    val yPlane = new Array[Int](yStride * mbH * 16)
    val uPlane = new Array[Int](cStride * mbH * 8)
    val vPlane = new Array[Int](cStride * mbH * 8)

    // quantizers, per segment (index 0 when segmentation is off); the
    // segment feature adjusts the BASE index (absolute or delta mode),
    // the frame-level dc/ac deltas stack on top
    def segQi(s: Int): Int = {
      val base =
        if (!segEnabled) yacQi
        else if (segAbs) segQiDelta(s)
        else yacQi + segQiDelta(s)
      math.max(0, math.min(127, base))
    }
    val qYdcA = Array.tabulate(4)(s => tables.dcQ(segQi(s) + ydcD))
    val qYacA = Array.tabulate(4)(s => tables.acQ(segQi(s)))
    val qY2dcA = Array.tabulate(4)(s => tables.y2DcQ(segQi(s) + y2dcD))
    val qY2acA = Array.tabulate(4)(s => tables.y2AcQ(segQi(s) + y2acD))
    val qUVdcA = Array.tabulate(4)(s => tables.uvDcQ(segQi(s) + uvdcD))
    val qUVacA = Array.tabulate(4)(s => tables.uvAcQ(segQi(s) + uvacD))

    // per-MB mode state for B_PRED context (above/left sub-modes)
    val aboveSub = Array.fill(mbW * 4)(0) // B_DC
    var tokBd: Array[BoolDec] = Array.tabulate(nParts)(i =>
      new BoolDec(bytes, partStarts(i), partEnds(i)))

    // nonzero context: above (per 4x4 column) and left (per 4x4 row in MB)
    val aboveNz = new Array[Int](mbW * 4) // luma
    val aboveNzU = new Array[Int](mbW * 2)
    val aboveNzV = new Array[Int](mbW * 2)
    val aboveNzY2 = new Array[Int](mbW)

    val coefs = new Array[Int](16)
    val block = new Array[Int](16)
    val y2 = new Array[Int](16)
    // loop-filter internal-edge eligibility: an MB with no coefficients
    // that is not B_PRED keeps its internal edges unfiltered (RFC §15.2)
    val innerFilter = new Array[Boolean](mbW * mbH)
    // per-MB filter level: segment feature (abs or frame+delta) plus
    // the intra ref delta and, for B_PRED MBs, mode delta 0
    val mbLevels = new Array[Int](mbW * mbH)

    var mbY = 0
    while (mbY < mbH) {
      val leftSub = Array.fill(4)(0)
      val leftNz = new Array[Int](4)
      val leftNzU = new Array[Int](2)
      val leftNzV = new Array[Int](2)
      var leftNzY2 = 0
      val td = tokBd(mbY % nParts)
      var mbX = 0
      while (mbX < mbW) {
        // MB header order (RFC §10): segment id, skip flag, modes
        val segId =
          if (segEnabled && segUpdateMap) bd.tree(SegTree, segTreeProbs)
          else 0
        val qYdc = qYdcA(segId); val qYac = qYacA(segId)
        val qY2dc = qY2dcA(segId); val qY2acF = qY2acA(segId)
        val qUVdc = qUVdcA(segId); val qUVac = qUVacA(segId)
        val skip = if (noSkip == 1) bd.bool(skipProb) else 0
        val yMode = bd.tree(KfYModeTree, KfYModeProbs)
        val subModes = new Array[Int](16)
        if (yMode == 4) { // B_PRED: 16 context-coded sub-modes
          var sb = 0
          while (sb < 16) {
            val sx = sb & 3; val sy = sb >> 2
            val above = if (sy == 0) aboveSub(mbX * 4 + sx) else subModes(sb - 4)
            val left = if (sx == 0) leftSub(sy) else subModes(sb - 1)
            subModes(sb) = bd.tree(BModeTree, tables.kfBModeProbs(above)(left))
            sb += 1
          }
        } else {
          // 16x16 modes register for neighbor sub-mode context as their
          // matching sub-mode: DC->B_DC, V->B_VE, H->B_HE, TM->B_TM
          java.util.Arrays.fill(subModes, SubModeOf16x16(yMode))
        }
        val uvMode = bd.tree(UvModeTree, KfUvModeProbs)
        if (bd.bad) return None

        // ---- coefficients
        val hasY2 = yMode != 4
        var mbNz = 0
        java.util.Arrays.fill(y2, 0)
        if (hasY2) {
          val ctx = leftNzY2 + aboveNzY2(mbX)
          var y2Nz = 0
          if (skip == 0) {
            y2Nz = readCoefs(td, probs, 1, ctx, 0, coefs)
            var i = 0
            while (i < 16) {
              y2(Zigzag(i)) = coefs(i) * (if (i == 0) qY2dc else qY2acF)
              i += 1
            }
          }
          mbNz += y2Nz
          leftNzY2 = if (y2Nz > 0) 1 else 0
          aboveNzY2(mbX) = leftNzY2
          iwht4x4(y2, y2)
        }
        // luma: 16x16 modes predict the whole MB from its borders FIRST,
        // then residuals add per sub-block; B_PRED predicts sub-block by
        // sub-block against the evolving reconstruction (spec order)
        if (yMode != 4) predictMb(yPlane, yStride, mbX * 16, mbY * 16, 16, yMode)
        val planeIdx = if (hasY2) 0 else 3
        val firstCoef = if (hasY2) 1 else 0
        val subNz = new Array[Int](16)
        var sb = 0
        while (sb < 16) {
          val sx = sb & 3; val sy = sb >> 2
          var nz = 0
          java.util.Arrays.fill(block, 0)
          if (skip == 0) {
            val l = if (sx == 0) leftNz(sy) else subNz(sb - 1)
            val a = if (sy == 0) aboveNz(mbX * 4 + sx) else subNz(sb - 4)
            nz = readCoefs(td, probs, planeIdx, l + a, firstCoef, coefs)
            var i = firstCoef
            while (i < 16) {
              block(Zigzag(i)) = coefs(i) * (if (i == 0) qYdc else qYac)
              i += 1
            }
          }
          if (hasY2) block(0) = y2(sb)
          idct4x4(block, block)
          if (yMode == 4)
            applySub(yPlane, yStride, mbX * 16 + sx * 4, mbY * 16 + sy * 4,
              subModes(sb), block)
          else
            addResidual(yPlane, yStride, mbX * 16 + sx * 4, mbY * 16 + sy * 4, block)
          subNz(sb) = if (nz > 0) 1 else 0
          sb += 1
        }
        var i = 0
        while (i < 4) {
          mbNz += subNz(i * 4) + subNz(i * 4 + 1) + subNz(i * 4 + 2) + subNz(i * 4 + 3)
          leftNz(i) = subNz(i * 4 + 3)
          aboveNz(mbX * 4 + i) = subNz(12 + i)
          i += 1
        }
        // chroma: whole-8x8 border prediction, then per-4x4 residuals
        mbNz += decodeChroma(td, probs, skip, uvMode, uPlane, cStride, mbX, mbY,
          leftNzU, aboveNzU, qUVdc, qUVac, coefs, block)
        mbNz += decodeChroma(td, probs, skip, uvMode, vPlane, cStride, mbX, mbY,
          leftNzV, aboveNzV, qUVdc, qUVac, coefs, block)
        if (td.bad) return None
        innerFilter(mbY * mbW + mbX) = mbNz > 0 || yMode == 4
        mbLevels(mbY * mbW + mbX) = mbFilterLevel(filterLevel, segEnabled,
          segAbs, segLfVal, segId, lfDeltas, refLfDelta(0), modeLfDelta(0),
          yMode == 4)

        i = 0
        while (i < 4) { aboveSub(mbX * 4 + i) = subModes(12 + i); i += 1 }
        i = 0
        while (i < 4) { leftSub(i) = subModes(i * 4 + 3); i += 1 }
        mbX += 1
      }
      mbY += 1
    }

    // in-loop deblocking over the whole reconstructed frame (intra
    // prediction above used the unfiltered samples, per the spec)
    var anyLevel = false
    var li = 0
    while (li < mbLevels.length) { if (mbLevels(li) > 0) anyLevel = true; li += 1 }
    if (anyLevel)
      loopFilterFrame(yPlane, uPlane, vPlane, yStride, cStride, mbW, mbH,
        filterType, mbLevels, sharpness, innerFilter)

    // crop to the true dimensions
    val y = new Array[Int](w * h)
    var r = 0
    while (r < h) {
      System.arraycopy(yPlane, r * yStride, y, r * w, w)
      r += 1
    }
    val cw = (w + 1) / 2
    val ch = (h + 1) / 2
    val u = new Array[Int](cw * ch)
    val v = new Array[Int](cw * ch)
    r = 0
    while (r < ch) {
      System.arraycopy(uPlane, r * cStride, u, r * cw, cw)
      System.arraycopy(vPlane, r * cStride, v, r * cw, cw)
      r += 1
    }
    Some(Yuv(w, h, y, u, v))
  }

  /** Returns the number of nonzero chroma blocks (loop-filter flag). */
  private def decodeChroma(td: BoolDec, probs: Array[Array[Array[Array[Int]]]],
      skip: Int, uvMode: Int, plane: Array[Int], stride: Int, mbX: Int, mbY: Int,
      leftNz: Array[Int], aboveNz: Array[Int], qdc: Int, qac: Int,
      coefs: Array[Int], block: Array[Int]): Int = {
    predictMb(plane, stride, mbX * 8, mbY * 8, 8, uvMode)
    var totalNz = 0
    val buf = new Array[Int](4)
    var sb = 0
    while (sb < 4) {
      val sx = sb & 1; val sy = sb >> 1
      var nz = 0
      java.util.Arrays.fill(block, 0)
      if (skip == 0) {
        val l = if (sx == 0) leftNz(sy) else buf(sy * 2)
        val a = if (sy == 0) aboveNz(mbX * 2 + sx) else buf(sx)
        nz = readCoefs(td, probs, 2, l + a, 0, coefs)
        var i = 0
        while (i < 16) {
          block(Zigzag(i)) = coefs(i) * (if (i == 0) qdc else qac)
          i += 1
        }
      }
      idct4x4(block, block)
      addResidual(plane, stride, mbX * 8 + sx * 4, mbY * 8 + sy * 4, block)
      buf(sy * 2 + sx) = if (nz > 0) 1 else 0
      totalNz += buf(sy * 2 + sx)
      if (sx == 1) leftNz(sy) = buf(sy * 2 + sx)
      if (sy == 1) aboveNz(mbX * 2 + sx) = buf(sy * 2 + sx)
      sb += 1
    }
    totalNz
  }

  /** Whole-macroblock intra prediction (16x16 luma or 8x8 chroma) from
    * the MB borders: DC / V / H / TM with the spec's edge handling
    * (missing above = 127, missing left = 129; DC of neither = 128;
    * DC shifts: both edges (sum+size)>>(log2+1), one edge (sum+size/2)
    * >>log2).
    */
  private[graft] def predictMb(plane: Array[Int], stride: Int, x0: Int,
      y0: Int, size: Int, mode: Int): Unit = {
    val log2 = if (size == 16) 4 else 3
    mode match {
      case 0 => // DC
        var sum = 0
        var edges = 0
        if (y0 > 0) {
          var i = 0
          while (i < size) { sum += plane((y0 - 1) * stride + x0 + i); i += 1 }
          edges += 1
        }
        if (x0 > 0) {
          var i = 0
          while (i < size) { sum += plane((y0 + i) * stride + x0 - 1); i += 1 }
          edges += 1
        }
        val dc =
          if (edges == 2) (sum + size) >> (log2 + 1)
          else if (edges == 1) (sum + size / 2) >> log2
          else 128
        var r = 0
        while (r < size) {
          var c = 0
          while (c < size) { plane((y0 + r) * stride + x0 + c) = dc; c += 1 }
          r += 1
        }
      case 1 => // V
        var r = 0
        while (r < size) {
          var c = 0
          while (c < size) {
            plane((y0 + r) * stride + x0 + c) =
              if (y0 > 0) plane((y0 - 1) * stride + x0 + c) else 127
            c += 1
          }
          r += 1
        }
      case 2 => // H
        var r = 0
        while (r < size) {
          val v = if (x0 > 0) plane((y0 + r) * stride + x0 - 1) else 129
          var c = 0
          while (c < size) { plane((y0 + r) * stride + x0 + c) = v; c += 1 }
          r += 1
        }
      case _ => // TM
        val tl =
          if (x0 > 0 && y0 > 0) plane((y0 - 1) * stride + x0 - 1)
          else if (y0 > 0) 129
          else 127
        var r = 0
        while (r < size) {
          val l = if (x0 > 0) plane((y0 + r) * stride + x0 - 1) else 129
          var c = 0
          while (c < size) {
            val a = if (y0 > 0) plane((y0 - 1) * stride + x0 + c) else 127
            plane((y0 + r) * stride + x0 + c) = clamp255(l + a - tl)
            c += 1
          }
          r += 1
        }
    }
  }

  // ------------------------------------------------------- loop filter

  /** Per-MB loop-filter level (RFC §9.3/§9.4, key-frame shape): the
    * segment filter feature (absolute, or frame level + delta) plus —
    * when lf-deltas are enabled — the intra ref delta and, for B_PRED
    * MBs, mode delta 0; clamped to [0, 63]. Shared with the encoder.
    */
  private[graft] def mbFilterLevel(frameLevel: Int, segEnabled: Boolean,
      segAbs: Boolean, segLfVal: Array[Int], segId: Int, lfDeltas: Boolean,
      refDelta0: Int, modeDelta0: Int, isBPred: Boolean): Int = {
    var lvl =
      if (segEnabled) { if (segAbs) segLfVal(segId) else frameLevel + segLfVal(segId) }
      else frameLevel
    if (lfDeltas) { lvl += refDelta0; if (isBPred) lvl += modeDelta0 }
    if (lvl < 0) 0 else if (lvl > 63) 63 else lvl
  }

  /** In-loop deblocking (RFC 6386 §15) with PER-MB filter levels: per
    * MB in raster order — left MB edge, internal vertical edges, top MB
    * edge, internal horizontal edges; MB edges use the stronger 6-tap
    * filter, internal edges the subblock filter; the simple filter type
    * touches luma only. Internal edges are skipped for coefficient-free
    * non-B_PRED MBs; a level-0 MB is not filtered at all. Shared
    * verbatim with the corpus encoder, so filtered round-trips stay
    * exact.
    */
  private[graft] def loopFilterFrame(yPlane: Array[Int], uPlane: Array[Int],
      vPlane: Array[Int], yStride: Int, cStride: Int, mbW: Int, mbH: Int,
      filterType: Int, mbLevels: Array[Int], sharpness: Int,
      innerFilter: Array[Boolean]): Unit = {
    // thresholds derived per MB from its level (set by filterMbAt)
    var interior = 1
    var hevThr = 0
    var mbLimit = 0
    var subLimit = 0
    def setLevel(level: Int): Unit = {
      interior = level
      if (sharpness > 0) {
        interior >>= (if (sharpness > 4) 2 else 1)
        if (interior > 9 - sharpness) interior = 9 - sharpness
      }
      if (interior < 1) interior = 1
      hevThr = if (level >= 40) 2 else if (level >= 15) 1 else 0
      mbLimit = (level + 2) * 2 + interior
      subLimit = level * 2 + interior
    }

    def cs(v: Int): Int = if (v < -128) -128 else if (v > 127) 127 else v
    def u2s(v: Int): Int = v - 128
    def s2u(v: Int): Int = { val c = cs(v); c + 128 }

    // pixels addressed through (plane, base + k*step): step = 1 for a
    // vertical edge (row-wise filtering), stride for horizontal
    def commonAdjust(p: Array[Int], i1: Int, i0: Int, j0: Int, j1: Int,
        useOuter: Boolean): Int = {
      val p1 = u2s(p(i1)); val p0 = u2s(p(i0))
      val q0 = u2s(p(j0)); val q1 = u2s(p(j1))
      val a = cs((if (useOuter) cs(p1 - q1) else 0) + 3 * (q0 - p0))
      val f1 = cs(a + 4) >> 3
      val f2 = cs(a + 3) >> 3
      p(j0) = s2u(q0 - f1)
      p(i0) = s2u(p0 + f2)
      f1
    }
    def hev(p: Array[Int], i1: Int, i0: Int, j0: Int, j1: Int): Boolean =
      math.abs(p(i1) - p(i0)) > hevThr || math.abs(p(j1) - p(j0)) > hevThr
    def mask(p: Array[Int], base: Int, s: Int, edge: Int): Boolean = {
      val p3 = p(base - 4 * s); val p2 = p(base - 3 * s); val p1 = p(base - 2 * s)
      val p0 = p(base - s); val q0 = p(base); val q1 = p(base + s)
      val q2 = p(base + 2 * s); val q3 = p(base + 3 * s)
      math.abs(p0 - q0) * 2 + math.abs(p1 - q1) / 2 <= edge &&
        math.abs(p3 - p2) <= interior && math.abs(p2 - p1) <= interior &&
        math.abs(p1 - p0) <= interior && math.abs(q1 - q0) <= interior &&
        math.abs(q2 - q1) <= interior && math.abs(q3 - q2) <= interior
    }
    /** MB-edge filter at p(base) boundary (p(base-s) | p(base)). */
    def mbEdge(p: Array[Int], base: Int, s: Int): Unit = {
      if (!mask(p, base, s, mbLimit)) return
      val i1 = base - 2 * s; val i0 = base - s; val j0 = base; val j1 = base + s
      if (hev(p, i1, i0, j0, j1)) { commonAdjust(p, i1, i0, j0, j1, useOuter = true); return }
      val p2 = u2s(p(base - 3 * s)); val p1 = u2s(p(i1)); val p0 = u2s(p(i0))
      val q0 = u2s(p(j0)); val q1 = u2s(p(j1)); val q2 = u2s(p(base + 2 * s))
      val wv = cs(cs(p1 - q1) + 3 * (q0 - p0))
      var a = cs((27 * wv + 63) >> 7)
      p(j0) = s2u(q0 - a); p(i0) = s2u(p0 + a)
      a = cs((18 * wv + 63) >> 7)
      p(j1) = s2u(q1 - a); p(i1) = s2u(p1 + a)
      a = cs((9 * wv + 63) >> 7)
      p(base + 2 * s) = s2u(q2 - a); p(base - 3 * s) = s2u(p2 + a)
    }
    def subEdge(p: Array[Int], base: Int, s: Int): Unit = {
      if (!mask(p, base, s, subLimit)) return
      val i1 = base - 2 * s; val i0 = base - s; val j0 = base; val j1 = base + s
      val hv = hev(p, i1, i0, j0, j1)
      val a = (commonAdjust(p, i1, i0, j0, j1, useOuter = hv) + 1) >> 1
      if (!hv) {
        p(j1) = s2u(u2s(p(j1)) - a)
        p(i1) = s2u(u2s(p(i1)) + a)
      }
    }
    def simpleEdge(p: Array[Int], base: Int, s: Int, edge: Int): Unit = {
      val i1 = base - 2 * s; val i0 = base - s; val j0 = base; val j1 = base + s
      if (math.abs(p(i0) - p(j0)) * 2 + math.abs(p(i1) - p(j1)) / 2 <= edge)
        commonAdjust(p, i1, i0, j0, j1, useOuter = true)
    }

    def filterMb(p: Array[Int], stride: Int, x0: Int, y0: Int, size: Int,
        hasLeft: Boolean, hasTop: Boolean, inner: Boolean): Unit = {
      val simple = filterType == 1
      // left MB edge (vertical): filter each row at column x0
      if (hasLeft) {
        var r = 0
        while (r < size) {
          val base = (y0 + r) * stride + x0
          if (simple) simpleEdge(p, base, 1, mbLimit) else mbEdge(p, base, 1)
          r += 1
        }
      }
      // internal vertical edges at x0+4, +8, +12 (luma) / x0+4 (chroma)
      if (inner) {
        var e = 4
        while (e < size) {
          var r = 0
          while (r < size) {
            val base = (y0 + r) * stride + x0 + e
            if (simple) simpleEdge(p, base, 1, subLimit) else subEdge(p, base, 1)
            r += 1
          }
          e += 4
        }
      }
      // top MB edge (horizontal): filter each column at row y0
      if (hasTop) {
        var c = 0
        while (c < size) {
          val base = y0 * stride + x0 + c
          if (simple) simpleEdge(p, base, stride, mbLimit) else mbEdge(p, base, stride)
          c += 1
        }
      }
      // internal horizontal edges
      if (inner) {
        var e = 4
        while (e < size) {
          var c = 0
          while (c < size) {
            val base = (y0 + e) * stride + x0 + c
            if (simple) simpleEdge(p, base, stride, subLimit) else subEdge(p, base, stride)
            c += 1
          }
          e += 4
        }
      }
    }

    var mbY = 0
    while (mbY < mbH) {
      var mbX = 0
      while (mbX < mbW) {
        val level = mbLevels(mbY * mbW + mbX)
        if (level > 0) {
          setLevel(level)
          val inner = innerFilter(mbY * mbW + mbX)
          filterMb(yPlane, yStride, mbX * 16, mbY * 16, 16, mbX > 0, mbY > 0, inner)
          if (filterType == 0) { // the normal filter touches chroma too
            filterMb(uPlane, cStride, mbX * 8, mbY * 8, 8, mbX > 0, mbY > 0, inner)
            filterMb(vPlane, cStride, mbX * 8, mbY * 8, 8, mbX > 0, mbY > 0, inner)
          }
        }
        mbX += 1
      }
      mbY += 1
    }
  }

  /** Add a 4x4 idct residual onto an already-predicted region. */
  private[graft] def addResidual(plane: Array[Int], stride: Int, x: Int,
      y: Int, residual: Array[Int]): Unit = {
    var r = 0
    while (r < 4) {
      var c = 0
      while (c < 4) {
        val idx = (y + r) * stride + x + c
        plane(idx) = clamp255(plane(idx) + residual(r * 4 + c))
        c += 1
      }
      r += 1
    }
  }

  /** Token decode of one 4x4 block into `coefs` (zigzag order, length
    * 16, entries before `first` zeroed). Returns count of nonzero.
    */
  private def readCoefs(bd: BoolDec, probs: Array[Array[Array[Array[Int]]]],
      plane: Int, ctx0: Int, first: Int, coefs: Array[Int]): Int = {
    java.util.Arrays.fill(coefs, 0)
    var ctx = ctx0
    var i = first
    var nonzero = 0
    var skipEobCheck = false
    while (i < 16) {
      val band = CoeffBands(i)
      val p = probs(plane)(band)(ctx)
      // EOB is not coded after a zero token (RFC: zero runs share probs)
      val tok =
        if (skipEobCheck) treeNoEob(bd, p)
        else bd.tree(TokenTree, p)
      if (bd.bad) return nonzero
      if (tok == 11) return nonzero // EOB
      var v = 0
      if (tok == 0) { ctx = 0; skipEobCheck = true }
      else {
        skipEobCheck = false
        if (tok <= 4) v = tok
        else {
          val cat = tok - 5
          var extra = 0
          val cp = CatProbs(cat)
          var k = 0
          while (k < cp.length) { extra = (extra << 1) | bd.bool(cp(k)); k += 1 }
          v = CatBase(cat) + extra
        }
        ctx = if (v == 1) 1 else 2
        if (bd.bool(128) == 1) v = -v
        nonzero += 1
      }
      coefs(i) = v
      i += 1
    }
    nonzero
  }

  /** Token tree entered past the EOB branch (after a DCT_0 token). */
  private def treeNoEob(bd: BoolDec, probs: Array[Int]): Int = {
    // start at node index 2 (the subtree after the EOB decision)
    var i = 2
    var guard = 0
    while (guard < 32) {
      val b = bd.bool(probs(i >> 1))
      val next = TokenTree(i + b)
      if (next <= 0) return -next
      i = next
      guard += 1
    }
    bd.bad = true
    0
  }

  // ------------------------------------------------- intra prediction

  /** The 10 B_PRED sub-modes over a 4x4 block with spec edge handling
    * (missing above/left default to 127/129 per RFC 6386 §12.2);
    * prediction reads the evolving reconstruction. Above-right rule
    * (§12.3, matching libwebp's reconstruction): sub-blocks in the MB's
    * RIGHT column all read the four pixels of the row ABOVE the
    * macroblock at columns 16..19 (the above-right MB's bottom edge) —
    * the lower three share block 3's values, never the undecoded
    * right-neighbor rows; at the frame's right edge the above row's
    * last pixel replicates; a missing above row is 127. Shared with the
    * encoder, so the pair cannot drift on this edge rule.
    */
  private[graft] def applySub(plane: Array[Int], stride: Int, x: Int, y: Int,
      mode: Int, residual: Array[Int]): Unit =
    applyPred(plane, stride, x, y, subPredict(plane, stride, x, y, mode), residual)

  /** Reconstruct: prediction + residual, clamped, written to the plane.
    * Shared with the encoder so reconstruction cannot drift.
    */
  private[graft] def applyPred(plane: Array[Int], stride: Int, x: Int, y: Int,
      pred: Array[Int], residual: Array[Int]): Unit = {
    var r = 0
    while (r < 4) {
      var c = 0
      while (c < 4) {
        plane((y + r) * stride + x + c) = clamp255(pred(r * 4 + c) + residual(r * 4 + c))
        c += 1
      }
      r += 1
    }
  }

  /** The 4x4 predicted values for one sub-mode (no residual applied). */
  private[graft] def subPredict(plane: Array[Int], stride: Int, x: Int, y: Int,
      mode: Int): Array[Int] = {
    // gather borders: above (a(0..3)) from the evolving reconstruction,
    // above-right (a(4..7)) per the spec rule (see applySub doc)
    val a = new Array[Int](8)
    val l = new Array[Int](4)
    val rightCol = (x & 15) == 12 // right column of the 16-aligned MB
    val mbTopRow = (y & ~15) - 1  // plane row above the macroblock
    var i = 0
    while (i < 4) {
      a(i) = if (y == 0) 127 else plane((y - 1) * stride + x + i)
      i += 1
    }
    while (i < 8) {
      a(i) =
        if (!rightCol) {
          // interior blocks: the already-reconstructed above-right block
          if (y == 0) 127 else plane((y - 1) * stride + x + i)
        } else if (mbTopRow < 0) 127
        else {
          val px = (x & ~15) + 16 + (i - 4)
          if (px < stride) plane(mbTopRow * stride + px)
          else plane(mbTopRow * stride + (stride - 1))
        }
      i += 1
    }
    i = 0
    while (i < 4) {
      l(i) = if (x == 0) 129 else plane((y + i) * stride + x - 1)
      i += 1
    }
    val tl =
      if (x == 0 || y == 0) { if (y == 0) 127 else 129 }
      else plane((y - 1) * stride + x - 1)

    val pred = new Array[Int](16)
    mode match {
      case 0 => // B_DC_PRED: ALWAYS 4 above + 4 left, with the 127/129
        // border substitutes — unlike the adaptive 16x16/chroma DC
        var sum = 4
        var k = 0
        while (k < 4) { sum += a(k) + l(k); k += 1 }
        java.util.Arrays.fill(pred, sum >> 3)
      case 1 => // B_TM_PRED
        var r = 0
        while (r < 4) {
          var c = 0
          while (c < 4) { pred(r * 4 + c) = clamp255(l(r) + a(c) - tl); c += 1 }
          r += 1
        }
      case 2 => // B_VE_PRED: filtered above
        var c = 0
        while (c < 4) {
          val left = if (c == 0) tl else a(c - 1)
          val right = a(c + 1)
          val v = (left + 2 * a(c) + right + 2) >> 2
          var r2 = 0
          while (r2 < 4) { pred(r2 * 4 + c) = v; r2 += 1 }
          c += 1
        }
      case 3 => // B_HE_PRED: filtered left
        var r = 0
        while (r < 4) {
          val up = if (r == 0) tl else l(r - 1)
          val down = if (r == 3) l(3) else l(r + 1)
          val v = (up + 2 * l(r) + down + 2) >> 2
          var c2 = 0
          while (c2 < 4) { pred(r * 4 + c2) = v; c2 += 1 }
          r += 1
        }
      case 4 => // B_RD_PRED (down-right diagonal)
        val e = new Array[Int](9) // l3..l0, tl, a0..a3
        e(0) = l(3); e(1) = l(2); e(2) = l(1); e(3) = l(0); e(4) = tl
        e(5) = a(0); e(6) = a(1); e(7) = a(2); e(8) = a(3)
        var r = 0
        while (r < 4) {
          var c = 0
          while (c < 4) {
            val k = 4 + c - r
            pred(r * 4 + c) = (e(k - 1) + 2 * e(k) + e(math.min(8, k + 1)) + 2) >> 2
            c += 1
          }
          r += 1
        }
      case 5 => // B_VR_PRED (explicit spec cell map, RFC 6386 §12.3)
        val iL = l(0); val j = l(1); val k = l(2)
        val aA = a(0); val bB = a(1); val cC = a(2); val dD = a(3)
        def avg2(p: Int, q: Int) = (p + q + 1) >> 1
        def avg3(p: Int, q: Int, s: Int) = (p + 2 * q + s + 2) >> 2
        pred(0) = avg2(tl, aA); pred(1) = avg2(aA, bB)
        pred(2) = avg2(bB, cC); pred(3) = avg2(cC, dD)
        pred(4) = avg3(iL, tl, aA); pred(5) = avg3(tl, aA, bB)
        pred(6) = avg3(aA, bB, cC); pred(7) = avg3(bB, cC, dD)
        pred(8) = avg3(j, iL, tl); pred(9) = pred(0)
        pred(10) = pred(1); pred(11) = pred(2)
        pred(12) = avg3(k, j, iL); pred(13) = pred(4)
        pred(14) = pred(5); pred(15) = pred(6)
      case 6 => // B_LD_PRED (down-left diagonal)
        var r = 0
        while (r < 4) {
          var c = 0
          while (c < 4) {
            val k = r + c
            pred(r * 4 + c) =
              if (k < 6) (a(k) + 2 * a(k + 1) + a(math.min(7, k + 2)) + 2) >> 2
              else (a(6) + 3 * a(7) + 2) >> 2
            c += 1
          }
          r += 1
        }
      case 7 => // B_VL_PRED (explicit spec cell map, RFC 6386 §12.3)
        def avg2(p: Int, q: Int) = (p + q + 1) >> 1
        def avg3(p: Int, q: Int, s: Int) = (p + 2 * q + s + 2) >> 2
        pred(0) = avg2(a(0), a(1)); pred(1) = avg2(a(1), a(2))
        pred(2) = avg2(a(2), a(3)); pred(3) = avg2(a(3), a(4))
        pred(4) = avg3(a(0), a(1), a(2)); pred(5) = avg3(a(1), a(2), a(3))
        pred(6) = avg3(a(2), a(3), a(4)); pred(7) = avg3(a(3), a(4), a(5))
        pred(8) = pred(1); pred(9) = pred(2)
        pred(10) = pred(3); pred(11) = avg3(a(4), a(5), a(6))
        pred(12) = pred(5); pred(13) = pred(6)
        pred(14) = pred(7); pred(15) = avg3(a(5), a(6), a(7))
      case 8 => // B_HD_PRED (explicit spec cell map, RFC 6386 §12.3)
        val iL = l(0); val j = l(1); val k = l(2); val lL = l(3)
        val aA = a(0); val bB = a(1); val cC = a(2)
        def avg2(p: Int, q: Int) = (p + q + 1) >> 1
        def avg3(p: Int, q: Int, s: Int) = (p + 2 * q + s + 2) >> 2
        pred(0) = avg2(iL, tl); pred(1) = avg3(iL, tl, aA)
        pred(2) = avg3(tl, aA, bB); pred(3) = avg3(aA, bB, cC)
        pred(4) = avg2(j, iL); pred(5) = avg3(j, iL, tl)
        pred(6) = pred(0); pred(7) = pred(1)
        pred(8) = avg2(k, j); pred(9) = avg3(k, j, iL)
        pred(10) = pred(4); pred(11) = pred(5)
        pred(12) = avg2(lL, k); pred(13) = avg3(lL, k, j)
        pred(14) = pred(8); pred(15) = pred(9)
      case _ => // B_HU_PRED
        var r = 0
        while (r < 4) {
          var c = 0
          while (c < 4) {
            val k = 2 * r + c
            pred(r * 4 + c) =
              if (k >= 6) l(3)
              else if (k % 2 == 0) (l(k / 2) + l(math.min(3, k / 2 + 1)) + 1) >> 1
              else (l(k / 2) + 2 * l(math.min(3, k / 2 + 1)) + l(math.min(3, k / 2 + 2)) + 2) >> 2
            c += 1
          }
          r += 1
        }
    }
    pred
  }
}
