package graft.kernel

/** WebP-VP8L (lossless) decoder — the real entropy layer plus ALL FOUR
  * pixel transforms: canonical prefix codes (simple 1-2-symbol and full
  * code-length-coded variants), LZ77 length/distance back-references
  * with linear distance codes, the color cache, the PREDICTOR transform
  * (all 14 spatial modes over a mode sub-image), the CROSS-COLOR
  * transform (signed-multiplier green->red / green->blue / red->blue
  * per block), SUBTRACT-GREEN, and COLOR-INDEXING (delta-coded palette
  * with LSB-first sub-byte pixel bundling for <= 16 colors), inverted
  * in reverse bitstream order per the spec, plus META PREFIX GROUPS
  * (per-block prefix-code group selection through a coded entropy
  * sub-image), and 2-D PLANE DISTANCE CODES (the spec's 120-entry
  * near-neighborhood mapping, generated from its closed form below).
  * Transforms combine freely — palette together with the spatial
  * transforms tracks the bundled sub-image width through the inverse
  * chain (libwebp's running-xsize rule), so any legal transform set
  * decodes.
  *
  * Like every decoder here: malformed input -> None, never a throw.
  */
object Vp8lDecoder {

  /** LSB-first bit reader over the VP8L payload. */
  private final class Br(bytes: Array[Byte], start: Int, end: Int) {
    var pos = start
    var bitPos = 0
    var overflow = false
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        if (pos >= end) { overflow = true; return v }
        if (((bytes(pos) >> bitPos) & 1) != 0) v |= 1 << i
        bitPos += 1
        if (bitPos == 8) { bitPos = 0; pos += 1 }
        i += 1
      }
      v
    }
  }

  /** Canonical prefix code: decode one symbol bit by bit (codes are
    * LSB-first in the stream but assigned MSB-canonically per the spec's
    * deflate-style construction).
    */
  private final class Prefix(lengths: Array[Int]) {
    // canonical assignment: count per length, then first-code per length
    private val MaxLen = 15
    private val counts = new Array[Int](MaxLen + 1)
    lengths.foreach(l => if (l > 0 && l <= MaxLen) counts(l) += 1)
    private val firstCode = new Array[Int](MaxLen + 1)
    private val symsByLen: Array[Array[Int]] = {
      val by = Array.fill(MaxLen + 1)(Vector.newBuilder[Int])
      for (s <- lengths.indices if lengths(s) > 0 && lengths(s) <= MaxLen)
        by(lengths(s)) += s
      by.map(_.result().toArray)
    }
    locally {
      var code = 0
      var l = 1
      while (l <= MaxLen) {
        firstCode(l) = code
        code = (code + counts(l)) << 1
        l += 1
      }
    }
    val singleSymbol: Int =
      if (lengths.count(_ > 0) == 1) lengths.indexWhere(_ > 0) else -1

    def decode(br: Br): Int = {
      if (singleSymbol >= 0) return singleSymbol // zero-bit code
      var code = 0
      var l = 1
      while (l <= MaxLen) {
        code = (code << 1) | br.bits(1)
        if (br.overflow) return -1
        val idx = code - firstCode(l)
        if (idx >= 0 && idx < counts(l)) return symsByLen(l)(idx)
        l += 1
      }
      -1
    }
  }

  private val CodeLengthOrder = Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8,
    9, 10, 11, 12, 13, 14, 15)

  /** Read one prefix code (spec 5.2): simple (1-2 symbols) or full. */
  private def readPrefix(br: Br, alphabetSize: Int): Prefix = {
    val simple = br.bits(1)
    if (simple == 1) {
      val numSyms = br.bits(1) + 1
      val firstLen = br.bits(1) // 0: 1-bit symbol, 1: 8-bit symbol
      val s0 = if (firstLen == 1) br.bits(8) else br.bits(1)
      val lengths = new Array[Int](alphabetSize)
      if (s0 >= alphabetSize) return null
      if (numSyms == 2) {
        val s1 = br.bits(8)
        if (s1 >= alphabetSize) return null
        lengths(s0) = 1; lengths(s1) = 1
      } else lengths(s0) = 1
      new Prefix(lengths)
    } else {
      val numCodes = br.bits(4) + 4
      if (numCodes > 19) return null
      val clLengths = new Array[Int](19)
      var i = 0
      while (i < numCodes) { clLengths(CodeLengthOrder(i)) = br.bits(3); i += 1 }
      if (br.overflow) return null
      val clCode = new Prefix(clLengths)
      // optional max-symbol limit
      var maxSymbol = alphabetSize
      if (br.bits(1) == 1) {
        val lenNBits = 2 + 2 * br.bits(3)
        maxSymbol = 2 + br.bits(lenNBits)
      }
      val lengths = new Array[Int](alphabetSize)
      var sym = 0
      var prevLen = 8
      while (sym < alphabetSize) {
        if (maxSymbol <= 0) { sym = alphabetSize }
        else {
          maxSymbol -= 1
          val cl = clCode.decode(br)
          if (cl < 0 || br.overflow) return null
          cl match {
            case c if c < 16 =>
              lengths(sym) = c; sym += 1
              if (c != 0) prevLen = c
            case 16 =>
              val rep = 3 + br.bits(2)
              var r = 0
              while (r < rep && sym < alphabetSize) { lengths(sym) = prevLen; sym += 1; r += 1 }
            case 17 =>
              sym += 3 + br.bits(3)
            case 18 =>
              sym += 11 + br.bits(7)
            case _ => return null
          }
        }
      }
      new Prefix(lengths)
    }
  }

  /** Distance mapping (spec 4.2.1.3 / 5.2.4): codes 1..120 address the
    * 2-D near neighborhood of the current pixel. The published table is
    * exactly the set {(x,0): 1<=x<=8} ∪ {(x,y): 1<=y<=7, -7<=x<=8}
    * ordered by increasing x²+y², ties broken by larger y first, then
    * positive x before negative — so it is generated from that closed
    * form rather than transcribed. Packed as (dy << 8) | (dx & 0xff).
    */
  private[graft] val DistTable: Array[Int] = {
    val pairs = (1 to 8).map(x => (x, 0)) ++
      (for { y <- 1 to 7; x <- -7 to 8 } yield (x, y))
    pairs.sortBy { case (x, y) => (x * x + y * y, -y, -x) }
      .map { case (x, y) => (y << 8) | (x & 0xff) }
      .toArray
  }

  /** Code (1..120) -> scan-line distance at image width `w`; floor 1. */
  private[graft] def planeDist(code: Int, w: Int): Int = {
    val packed = DistTable(code - 1)
    val dx = packed.toByte.toInt
    val dy = packed >> 8
    math.max(1, dy * w + dx)
  }

  /** Inverse mapping for the corpus writer: every distance reachable via
    * a 2-D code at width `w` -> one code that decodes to it. Largest code
    * wins, so at narrow widths the writer emits floor-clamped codes
    * (dy*w+dx < 1 -> distance 1) and pins that decoder rule too.
    */
  private[graft] def planeCodesFor(w: Int): Map[Int, Int] =
    (1 to 120).map(c => planeDist(c, w) -> c).toMap

  private def lengthFromSymbol(br: Br, sym: Int): Int = {
    // prefix-coded lengths/distances: symbol -> value with extra bits
    if (sym < 4) sym + 1
    else {
      val extraBits = (sym - 2) >> 1
      val offset = (2 + (sym & 1)) << extraBits
      offset + 1 + br.bits(extraBits)
    }
  }

  def decode(bytes: Array[Byte]): Option[RawImage] = {
    try decodeImpl(bytes)
    catch { case scala.util.control.NonFatal(_) => None }
  }

  private def decodeImpl(bytes: Array[Byte]): Option[RawImage] = {
    // RIFF....WEBPVP8L <size> 0x2F
    if (bytes.length < 30 || bytes(0) != 'R' || bytes(1) != 'I' || bytes(2) != 'F' ||
        bytes(3) != 'F' || bytes(8) != 'W' || bytes(9) != 'E' || bytes(10) != 'B' ||
        bytes(11) != 'P') return None
    // find the VP8L chunk (usually at 12)
    var p = 12
    var vp8lStart = -1
    var vp8lEnd = -1
    while (p + 8 <= bytes.length && vp8lStart < 0) {
      val tag = new String(bytes, p, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = (bytes(p + 4) & 0xff) | ((bytes(p + 5) & 0xff) << 8) |
        ((bytes(p + 6) & 0xff) << 16) | ((bytes(p + 7) & 0xff) << 24)
      if (size < 0 || p + 8 + size > bytes.length) return None
      if (tag == "VP8L") { vp8lStart = p + 8; vp8lEnd = p + 8 + size }
      else p += 8 + size + (size & 1)
    }
    if (vp8lStart < 0) return None
    if ((bytes(vp8lStart) & 0xff) != 0x2f) return None
    val br = new Br(bytes, vp8lStart + 1, vp8lEnd)
    val w = br.bits(14) + 1
    val h = br.bits(14) + 1
    br.bits(1) // alpha-is-used hint
    if (br.bits(3) != 0) return None // version must be 0
    if (w.toLong * h > 64L * 1024 * 1024) return None
    // transforms (applied inversely in REVERSE bitstream order)
    var predSizeBits = 0
    var predModes: Array[Int] = null
    var predModesW = 0
    var colorSizeBits = 0
    var colorElems: Array[Int] = null
    var colorElemsW = 0
    var palette: Array[Int] = null
    var paletteWidthBits = 0
    // (type, width at read time): head = last read = first inverted.
    // Color indexing with sub-8-bit bundling REDUCES the running width,
    // so transforms read after it (their sub-images AND their inverses)
    // operate on the bundled sub-image — mirroring libwebp, which
    // subsamples the running xsize in ReadTransform. Tracking the width
    // per transform makes palette freely combinable with the spatial
    // transforms in either bitstream order.
    var xformOrder = List.empty[(Int, Int)]
    var curW = w
    var seen = 0
    var moreXf = br.bits(1) == 1
    while (moreXf) {
      val t = br.bits(2)
      if (br.overflow || (seen & (1 << t)) != 0) return None // dup transform
      seen |= 1 << t
      t match {
        case 2 => // subtract green: no payload
          xformOrder ::= ((2, curW))
        case 0 => // predictor: mode sub-image at block resolution
          predSizeBits = br.bits(3) + 2
          predModesW = (curW + (1 << predSizeBits) - 1) >> predSizeBits
          val modesH = (h + (1 << predSizeBits) - 1) >> predSizeBits
          predModes = decodeCoded(br, predModesW, modesH, isMain = false)
            .getOrElse(return None)
          xformOrder ::= ((0, curW))
        case 1 => // cross-color: transform-element sub-image per block
          colorSizeBits = br.bits(3) + 2
          colorElemsW = (curW + (1 << colorSizeBits) - 1) >> colorSizeBits
          val elemsH = (h + (1 << colorSizeBits) - 1) >> colorSizeBits
          colorElems = decodeCoded(br, colorElemsW, elemsH, isMain = false)
            .getOrElse(return None)
          xformOrder ::= ((1, curW))
        case _ => // 3 = color indexing (palette), delta-coded entries
          val size = br.bits(8) + 1
          val raw = decodeCoded(br, size, 1, isMain = false).getOrElse(return None)
          palette = new Array[Int](size)
          var acc = 0
          var k = 0
          while (k < size) { // per-channel cumulative sum mod 256
            acc = addPixels(acc, raw(k))
            palette(k) = acc
            k += 1
          }
          paletteWidthBits =
            if (size <= 2) 3 else if (size <= 4) 2 else if (size <= 16) 1 else 0
          xformOrder ::= ((3, curW))
          curW = (curW + (1 << paletteWidthBits) - 1) >> paletteWidthBits
      }
      moreXf = br.bits(1) == 1
    }
    val mainW = curW
    var argb = decodeCoded(br, mainW, h, isMain = true).getOrElse(return None)
    // each inverse runs at the width the image has AT THAT STAGE of the
    // chain (tw); the palette inverse expands the bundled width back out
    xformOrder.foreach { case (t, tw) =>
      t match {
        case 0 => if (!inversePredictor(argb, tw, h, predModes, predSizeBits, predModesW)) return None
        case 1 => inverseColorTransform(argb, tw, h, colorElems, colorSizeBits, colorElemsW)
        case 2 => addGreen(argb)
        case 3 =>
          val packedW = (tw + (1 << paletteWidthBits) - 1) >> paletteWidthBits
          argb = inversePalette(argb, packedW, tw, h, palette, paletteWidthBits)
      }
    }
    // ARGB -> RGBA plane
    val n = w * h
    val out = new Array[Byte](n * 4)
    var i = 0
    while (i < n) {
      val px = argb(i)
      out(i * 4) = ((px >> 16) & 0xff).toByte
      out(i * 4 + 1) = ((px >> 8) & 0xff).toByte
      out(i * 4 + 2) = (px & 0xff).toByte
      out(i * 4 + 3) = ((px >> 24) & 0xff).toByte
      i += 1
    }
    Some(RawImage(w, h, 4, out))
  }

  /** One prefix-code group: the five codes a pixel's symbols draw from. */
  private final class Group(val green: Prefix, val red: Prefix,
    val blue: Prefix, val alpha: Prefix, val dist: Prefix)

  /** One spatially-coded image: color-cache header, (main-image only)
    * META PREFIX GROUPS — a coded entropy sub-image whose (red<<8)|green
    * selects the per-block prefix-code group, each group carrying its
    * own five codes — then the pixel loop (literals, LZ77 with linear
    * distances, cache refs). Transform sub-images carry no meta bit.
    */
  private def decodeCoded(br: Br, w: Int, h: Int,
      isMain: Boolean): Option[Array[Int]] = {
    var cacheBits = 0
    if (br.bits(1) == 1) {
      cacheBits = br.bits(4)
      if (cacheBits < 1 || cacheBits > 11) return None
    }
    var groupImg: Array[Int] = null
    var groupBits = 0
    var groupW = 0
    var numGroups = 1
    if (isMain && br.bits(1) == 1) {
      groupBits = br.bits(3) + 2
      groupW = (w + (1 << groupBits) - 1) >> groupBits
      val gh = (h + (1 << groupBits) - 1) >> groupBits
      groupImg = decodeCoded(br, groupW, gh, isMain = false).getOrElse(return None)
      var maxIdx = 0
      var k = 0
      while (k < groupImg.length) {
        val idx = (groupImg(k) >> 8) & 0xffff
        if (idx > maxIdx) maxIdx = idx
        k += 1
      }
      numGroups = maxIdx + 1
      if (numGroups > 256) return None // sanity bound
    }
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val groups = new Array[Group](numGroups)
    var gi = 0
    while (gi < numGroups) {
      val green = readPrefix(br, 256 + 24 + cacheSize)
      val red = readPrefix(br, 256)
      val blue = readPrefix(br, 256)
      val alpha = readPrefix(br, 256)
      val dist = readPrefix(br, 40)
      if (green == null || red == null || blue == null || alpha == null || dist == null)
        return None
      groups(gi) = new Group(green, red, blue, alpha, dist)
      gi += 1
    }
    val n = w * h
    val argb = new Array[Int](n)
    val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null
    def cacheInsert(px: Int): Unit =
      if (cache != null) cache(((px * 0x1e35a7bd) >>> (32 - cacheBits)) % cacheSize) = px
    var i = 0
    var x = 0
    var y = 0
    def advance(k: Int): Unit = {
      i += k
      x += k
      while (x >= w) { x -= w; y += 1 }
    }
    while (i < n) {
      // group selection is per SYMBOL at the current pixel position
      val grp =
        if (groupImg == null) groups(0)
        else {
          val idx = (groupImg((y >> groupBits) * groupW + (x >> groupBits)) >> 8) & 0xffff
          if (idx >= numGroups) return None
          groups(idx)
        }
      val g = grp.green.decode(br)
      if (g < 0 || br.overflow) return None
      if (g < 256) {
        val r = grp.red.decode(br); val b = grp.blue.decode(br); val a = grp.alpha.decode(br)
        if (r < 0 || b < 0 || a < 0) return None
        val px = (a << 24) | (r << 16) | (g << 8) | b
        argb(i) = px
        cacheInsert(px)
        advance(1)
      } else if (g < 256 + 24) {
        val len = lengthFromSymbol(br, g - 256)
        val dSym = grp.dist.decode(br)
        if (dSym < 0) return None
        val dCode = lengthFromSymbol(br, dSym)
        // codes 1..120 are 2-D neighborhood references; above that the
        // code is the scan-line distance + 120
        val d = if (dCode > 120) dCode - 120 else planeDist(dCode, w)
        if (d <= 0 || d > i || i + len > n) return None
        var k = 0
        while (k < len) {
          argb(i + k) = argb(i + k - d)
          cacheInsert(argb(i + k))
          k += 1
        }
        advance(len)
      } else {
        if (cache == null) return None
        val idx = g - 256 - 24
        if (idx >= cacheSize) return None
        argb(i) = cache(idx)
        advance(1)
      }
    }
    Some(argb)
  }

  // -------------------------------------------- inverse pixel transforms

  /** per-channel modular add of two ARGB pixels. */
  private[graft] def addPixels(a: Int, b: Int): Int = {
    val al = ((a >>> 24) + (b >>> 24)) & 0xff
    val r = (((a >> 16) & 0xff) + ((b >> 16) & 0xff)) & 0xff
    val g = (((a >> 8) & 0xff) + ((b >> 8) & 0xff)) & 0xff
    val bl = ((a & 0xff) + (b & 0xff)) & 0xff
    (al << 24) | (r << 16) | (g << 8) | bl
  }

  private def avg2(a: Int, b: Int): Int = {
    val al = (((a >>> 24) & 0xff) + ((b >>> 24) & 0xff)) / 2
    val r = (((a >> 16) & 0xff) + ((b >> 16) & 0xff)) / 2
    val g = (((a >> 8) & 0xff) + ((b >> 8) & 0xff)) / 2
    val bl = ((a & 0xff) + (b & 0xff)) / 2
    (al << 24) | (r << 16) | (g << 8) | bl
  }

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  private def clampAddSubtractFull(l: Int, t: Int, tl: Int): Int = {
    def ch(sh: Int): Int =
      clamp255(((l >>> sh) & 0xff) + ((t >>> sh) & 0xff) - ((tl >>> sh) & 0xff))
    (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
  }

  private def clampAddSubtractHalf(l: Int, t: Int, tl: Int): Int = {
    def ch(sh: Int): Int = {
      val a = (((l >>> sh) & 0xff) + ((t >>> sh) & 0xff)) / 2 // Average2(L,T)
      val b = (tl >>> sh) & 0xff
      clamp255(a + (a - b) / 2) // C-style truncation toward zero
    }
    (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
  }

  private def select(l: Int, t: Int, tl: Int): Int = {
    def ch(p: Int, sh: Int): Int = (p >>> sh) & 0xff
    var pL = 0
    var pT = 0
    var sh = 0
    while (sh < 32) {
      val est = ch(l, sh) + ch(t, sh) - ch(tl, sh)
      pL += math.abs(est - ch(l, sh))
      pT += math.abs(est - ch(t, sh))
      sh += 8
    }
    if (pL < pT) l else t
  }

  /** the 14 spatial predictor modes (spec 4.2.2). -1 marks invalid.
    * private[graft]: the corpus writer forward-transforms with the same
    * mode definitions, so encoder/decoder cannot drift on predictor math
    * (the ground-truth plane equality in the specs still validates the
    * residual arithmetic, edge rules, ordering and mode-image coding).
    */
  private[graft] def predictPixel(mode: Int, l: Int, t: Int, tl: Int, tr: Int): Int =
    mode match {
      case 0  => 0xff000000
      case 1  => l
      case 2  => t
      case 3  => tr
      case 4  => tl
      case 5  => avg2(avg2(l, tr), t)
      case 6  => avg2(l, tl)
      case 7  => avg2(l, t)
      case 8  => avg2(tl, t)
      case 9  => avg2(t, tr)
      case 10 => avg2(avg2(l, tl), avg2(t, tr))
      case 11 => select(l, t, tl)
      case 12 => clampAddSubtractFull(l, t, tl)
      case 13 => clampAddSubtractHalf(l, t, tl)
      case _  => -1
    }

  /** Inverse predictor transform: argb holds residuals on entry, actual
    * pixels on exit. Edge rules: (0,0) predicts opaque black, the top
    * row predicts L, the left column predicts T; the top-right of the
    * rightmost column is linear-next = the current row's first pixel.
    */
  private def inversePredictor(argb: Array[Int], w: Int, h: Int,
      modes: Array[Int], sizeBits: Int, modesW: Int): Boolean = {
    if (modes == null) return false
    var y = 0
    var i = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val pred =
          if (x == 0 && y == 0) 0xff000000
          else if (y == 0) argb(i - 1) // top row: L
          else if (x == 0) argb(i - w) // left column: T
          else {
            val m = (modes((y >> sizeBits) * modesW + (x >> sizeBits)) >> 8) & 0xff
            if (m > 13) return false
            predictPixel(m, argb(i - 1), argb(i - w), argb(i - w - 1), argb(i - w + 1))
          }
        argb(i) = addPixels(argb(i), pred)
        x += 1
        i += 1
      }
      y += 1
    }
    true
  }

  /** ColorTransformDelta (spec 4.2.3): signed-byte product >> 5. */
  private[graft] def ctDelta(t: Int, c: Int): Int = (t.toByte * c.toByte) >> 5

  /** Inverse cross-color transform: per-block elements carry
    * green_to_red (blue channel), green_to_blue (green channel),
    * red_to_blue (red channel); red recovers first, then blue uses the
    * recovered red (libwebp VP8LTransformColorInverse).
    */
  private def inverseColorTransform(argb: Array[Int], w: Int, h: Int,
      elems: Array[Int], sizeBits: Int, elemsW: Int): Unit = {
    var y = 0
    var i = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val e = elems((y >> sizeBits) * elemsW + (x >> sizeBits))
        val g2r = e & 0xff
        val g2b = (e >> 8) & 0xff
        val r2b = (e >> 16) & 0xff
        val px = argb(i)
        val green = (px >> 8) & 0xff
        val red = (((px >> 16) & 0xff) + ctDelta(g2r, green)) & 0xff
        val blue = ((px & 0xff) + ctDelta(g2b, green) + ctDelta(r2b, red)) & 0xff
        argb(i) = (px & 0xff00ff00) | (red << 16) | blue
        x += 1
        i += 1
      }
      y += 1
    }
  }

  /** Inverse color-indexing: expand the packed index image (green
    * channel, LSB-first sub-pixel packing for palettes <= 16) through
    * the delta-decoded palette; out-of-range indices map to transparent
    * black per the spec.
    */
  private def inversePalette(packed: Array[Int], packedW: Int, w: Int,
      h: Int, palette: Array[Int], widthBits: Int): Array[Int] = {
    val out = new Array[Int](w * h)
    val bitsPerPixel = 8 >> widthBits
    val countMask = (1 << widthBits) - 1
    val bitMask = (1 << bitsPerPixel) - 1
    var y = 0
    while (y < h) {
      var packedPixels = 0
      var x = 0
      while (x < w) {
        if (widthBits == 0) {
          val idx = (packed(y * packedW + x) >> 8) & 0xff
          out(y * w + x) = if (idx < palette.length) palette(idx) else 0
        } else {
          if ((x & countMask) == 0)
            packedPixels = (packed(y * packedW + (x >> widthBits)) >> 8) & 0xff
          val idx = packedPixels & bitMask
          out(y * w + x) = if (idx < palette.length) palette(idx) else 0
          packedPixels >>>= bitsPerPixel
        }
        x += 1
      }
      y += 1
    }
    out
  }

  /** Inverse subtract-green: add green back into red and blue. */
  private def addGreen(argb: Array[Int]): Unit = {
    var i = 0
    while (i < argb.length) {
      val px = argb(i)
      val g = (px >> 8) & 0xff
      val r = (((px >> 16) & 0xff) + g) & 0xff
      val b = ((px & 0xff) + g) & 0xff
      argb(i) = (px & 0xff00ff00) | (r << 16) | b
      i += 1
    }
  }
}
