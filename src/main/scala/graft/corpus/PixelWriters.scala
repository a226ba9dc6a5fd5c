package graft.corpus

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.CRC32

/** Decode-grade image/audio writers: full pixel planes with analytically
  * known contents, used to round-trip the real decoders in
  * kernel/PixelDecode.scala. PngWriterEx exercises all five PNG scanline
  * filters and the 0/2/3/4/6 color types; GifWriter carries a real
  * variable-width LZW encoder (the decoder's exact inverse); BmpWriterEx
  * and WavWriterEx emit complete planes/sample streams (the legacy
  * MediaWriters byte-capped variants remain for the metadata tier).
  */

object PixelGen {
  /** Deterministic pixel stream shared by writers and round-trip tests. */
  def bytes(seed: Long, n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var x = seed
    var i = 0
    while (i < n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      out(i) = ((x >>> 33) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Deterministic SMOOTH gray plane (sum of 3 low-frequency sinusoids
    * with seed-derived frequencies/phases): the natural-image-like
    * content a lossy codec preserves, so perceptual hashes survive a
    * PNG -> JPEG re-encode (noise planes would not — their low-frequency
    * DCT content is unstable under quantization).
    */
  def smooth(seed: Long, w: Int, h: Int): Array[Byte] = {
    var x = seed
    def nxt(): Int = {
      x = x * 6364136223846793005L + 1442695040888963407L
      ((x >>> 33) & 0x7fffffff).toInt
    }
    // 8 components spread over frequencies 0..4 cycles/image in each
    // axis: populates the full low-frequency DCT block a perceptual hash
    // thresholds over (sparse spectra leave near-zero coefficients whose
    // sign bits are pure codec noise)
    val nComp = 8
    val fx = Array.fill(nComp)(nxt() % 5)
    val fy = Array.fill(nComp)(1 + nxt() % 4)
    val ph = Array.fill(nComp)(nxt() % 628 / 100.0)
    val ph2 = Array.fill(nComp)(nxt() % 628 / 100.0)
    val amp = Array.tabulate(nComp)(k => 42.0 / (1 + k * 0.7))
    val out = new Array[Byte](w * h)
    var yy = 0
    while (yy < h) {
      var xx = 0
      while (xx < w) {
        var v = 128.0
        var k = 0
        while (k < nComp) {
          v += amp(k) * math.sin(2 * math.Pi * fx(k) * xx / w + ph(k)) *
            math.cos(2 * math.Pi * fy(k) * yy / h + ph2(k))
          k += 1
        }
        val b = math.round(v).toInt
        out(yy * w + xx) = (if (b < 0) 0 else if (b > 255) 255 else b).toByte
        xx += 1
      }
      yy += 1
    }
    out
  }
}

object PngWriterEx {

  /** colorType: 0 gray, 2 RGB, 3 palette, 4 gray+alpha, 6 RGBA.
    * cycleFilters=true applies filter (y % 5) to row y — the encoder-side
    * inverse of the decoder's unfilter — so every filter path is hit.
    * interlaced=true emits Adam7 seven-pass layout (per-pass scanlines).
    */
  final case class Spec(width: Int, height: Int, seed: Long, colorType: Int = 0,
      cycleFilters: Boolean = false, interlaced: Boolean = false,
      // ancillary metadata chunks (PngKernel surfaces these)
      texts: Seq[(String, String)] = Nil, // tEXt keyword/value pairs
      dpi: Int = 0,                       // pHYs (dots per inch), 0 = absent
      modified: String = "")              // tIME "yyyy-MM-dd HH:mm:ss"

  /** Adam7 pass grid — must mirror PngDecoder's. */
  private val Adam7 = Seq(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  def channels(colorType: Int): Int = colorType match {
    case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
    case other => throw new IllegalArgumentException(s"colorType $other")
  }

  /** The raw (unfiltered) pixel plane this spec encodes — tests compare
    * the decoder's output against exactly this.
    */
  def plane(spec: Spec): Array[Byte] =
    PixelGen.bytes(spec.seed, spec.width * spec.height * channels(spec.colorType))

  def palette(spec: Spec): Array[Byte] = PixelGen.bytes(spec.seed ^ 0x9e3779b9L, 256 * 3)

  /** Filter one contiguous sub-plane (w x h x ch) into scanline format. */
  private def filterPlane(plane0: Array[Byte], w: Int, h: Int, ch: Int,
      cycleFilters: Boolean): Array[Byte] = {
    val stride = w * ch
    val raw = new Array[Byte]((stride + 1) * h)
    var y = 0
    while (y < h) {
      val f = if (cycleFilters) y % 5 else 0
      raw(y * (stride + 1)) = f.toByte
      val o = y * stride
      var x = 0
      while (x < stride) {
        val cur = plane0(o + x) & 0xff
        val a = if (x >= ch) plane0(o + x - ch) & 0xff else 0
        val b = if (y > 0) plane0(o - stride + x) & 0xff else 0
        val c = if (y > 0 && x >= ch) plane0(o - stride + x - ch) & 0xff else 0
        val enc = f match {
          case 0 => cur
          case 1 => (cur - a) & 0xff
          case 2 => (cur - b) & 0xff
          case 3 => (cur - ((a + b) >> 1)) & 0xff
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
            (cur - pred) & 0xff
        }
        raw(y * (stride + 1) + 1 + x) = enc.toByte
        x += 1
      }
      y += 1
    }
    raw
  }

  def write(spec: Spec): Array[Byte] = writeWithPlane(spec, plane(spec))

  /** Encode an explicit pixel plane (corpus cross-codec pool pieces). */
  def writeWithPlane(spec: Spec, plane0: Array[Byte]): Array[Byte] = {
    val ch = channels(spec.colorType)
    require(plane0.length == spec.width * spec.height * ch)
    val raw: Array[Byte] =
      if (!spec.interlaced) filterPlane(plane0, spec.width, spec.height, ch, spec.cycleFilters)
      else {
        // Adam7: extract each pass sub-plane, filter it independently
        val bos = new ByteArrayOutputStream()
        for ((x0, y0, dx, dy) <- Adam7) {
          val pw = if (spec.width > x0) (spec.width - x0 + dx - 1) / dx else 0
          val ph = if (spec.height > y0) (spec.height - y0 + dy - 1) / dy else 0
          if (pw > 0 && ph > 0) {
            val sub = new Array[Byte](pw * ph * ch)
            for (py <- 0 until ph; px <- 0 until pw; c <- 0 until ch)
              sub((py * pw + px) * ch + c) =
                plane0(((y0 + py * dy) * spec.width + (x0 + px * dx)) * ch + c)
            bos.write(filterPlane(sub, pw, ph, ch, spec.cycleFilters))
          }
        }
        bos.toByteArray
      }
    val out = new ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      def be32(v: Long): Array[Byte] = Array(
        ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
      out.write(be32(data.length))
      val tb = typ.getBytes(StandardCharsets.US_ASCII)
      out.write(tb); out.write(data)
      val crc = new CRC32(); crc.update(tb); crc.update(data)
      out.write(be32(crc.getValue))
    }
    val ihdr = new ByteArrayOutputStream()
    def be32b(v: Int): Unit = { ihdr.write(v >> 24); ihdr.write((v >> 16) & 0xff)
      ihdr.write((v >> 8) & 0xff); ihdr.write(v & 0xff) }
    be32b(spec.width); be32b(spec.height)
    ihdr.write(8); ihdr.write(spec.colorType)
    ihdr.write(0); ihdr.write(0); ihdr.write(if (spec.interlaced) 1 else 0)
    chunk("IHDR", ihdr.toByteArray)
    spec.texts.foreach { case (k, v) =>
      chunk("tEXt", (k + 0.toChar + v).getBytes(StandardCharsets.ISO_8859_1))
    }
    if (spec.dpi > 0) {
      val ppm = math.round(spec.dpi * 39.3701).toInt // dots/inch -> dots/m
      val b = new ByteArrayOutputStream()
      def w32(v: Int): Unit = { b.write(v >> 24); b.write((v >> 16) & 0xff)
        b.write((v >> 8) & 0xff); b.write(v & 0xff) }
      w32(ppm); w32(ppm); b.write(1)
      chunk("pHYs", b.toByteArray)
    }
    if (spec.modified.nonEmpty) {
      // "yyyy-MM-dd HH:mm:ss"
      val t = spec.modified
      val b = new ByteArrayOutputStream()
      val yr = t.substring(0, 4).toInt
      b.write(yr >> 8); b.write(yr & 0xff)
      Seq(5, 8, 11, 14, 17).foreach(o => b.write(t.substring(o, o + 2).toInt))
      chunk("tIME", b.toByteArray)
    }
    if (spec.colorType == 3) chunk("PLTE", palette(spec))
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val packed = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) packed.write(buf, 0, d.deflate(buf))
    d.end()
    // split IDAT in two chunks when possible: exercises multi-IDAT concat
    val pb = packed.toByteArray
    if (pb.length > 2) {
      chunk("IDAT", java.util.Arrays.copyOfRange(pb, 0, pb.length / 2))
      chunk("IDAT", java.util.Arrays.copyOfRange(pb, pb.length / 2, pb.length))
    } else chunk("IDAT", pb)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }
}

object GifWriter {

  final case class Spec(width: Int, height: Int, seed: Long,
      interlaced: Boolean = false)

  /** Index plane (256-entry palette) this spec encodes, in natural row
    * order (the writer reorders rows itself when interlaced).
    */
  def plane(spec: Spec): Array[Byte] = PixelGen.bytes(spec.seed, spec.width * spec.height)

  def palette(spec: Spec): Array[Byte] = PixelGen.bytes(spec.seed ^ 0x517cc1b7L, 256 * 3)

  def write(spec: Spec): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write("GIF89a".getBytes(StandardCharsets.US_ASCII))
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    u16(spec.width); u16(spec.height)
    out.write(0x80 | (7 << 4) | 7) // GCT present, 8-bit color res, 256 entries
    out.write(0); out.write(0)     // background, aspect
    out.write(palette(spec))
    out.write(0x2c)                // image descriptor
    u16(0); u16(0); u16(spec.width); u16(spec.height)
    out.write(if (spec.interlaced) 0x40 else 0x00)
    val idx0 = plane(spec)
    val idx =
      if (spec.interlaced) interlaceRows(idx0, spec.width, spec.height) else idx0
    val minCode = 8
    out.write(minCode)
    val packed = lzwEncode(idx, minCode)
    var off = 0
    while (off < packed.length) {
      val n = math.min(255, packed.length - off)
      out.write(n)
      out.write(packed, off, n)
      off += n
    }
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Animated GIF: frame 0 covers the full screen, frames 1..n-1 are
    * partial rects at deterministic positions; every frame carries a GCE
    * with a distinct delay, and (when `transparency` is set) even frames
    * mark index 0 transparent so compositing is exercised. Disposal is 0
    * (leave) so each composite builds on the previous one.
    */
  final case class AnimSpec(width: Int, height: Int, seed: Long, nFrames: Int,
      transparency: Boolean = false)

  def animDelaysMs(spec: AnimSpec): Vector[Int] =
    Vector.tabulate(spec.nFrames)(k => (4 + k) * 10) // GCE units are 10 ms

  /** The rect of frame k (frame 0 is the full screen). */
  def animRect(spec: AnimSpec, k: Int): (Int, Int, Int, Int) =
    if (k == 0) (0, 0, spec.width, spec.height)
    else {
      var x = spec.seed ^ (k * 0x9e3779b97f4a7c15L)
      def nxt(bound: Int): Int = {
        x = x * 6364136223846793005L + 1442695040888963407L
        (((x >>> 33) % bound).toInt + bound) % bound
      }
      val w = 1 + nxt(spec.width)
      val h = 1 + nxt(spec.height)
      val left = nxt(spec.width - w + 1)
      val top = nxt(spec.height - h + 1)
      (left, top, w, h)
    }

  def animFrameIndices(spec: AnimSpec, k: Int): Array[Byte] = {
    val (_, _, w, h) = animRect(spec, k)
    PixelGen.bytes(spec.seed * 31 + k, w * h)
  }

  /** Expected composited RGB canvases, frame by frame — the decoder's
    * GifFrame images must equal these exactly.
    */
  def animComposites(spec: AnimSpec): Vector[Array[Byte]] = {
    val pal = palette(Spec(spec.width, spec.height, spec.seed))
    val canvas = new Array[Byte](spec.width * spec.height * 3)
    // decoder initializes the canvas to the background color (index 0)
    for (i <- 0 until spec.width * spec.height; c <- 0 until 3)
      canvas(i * 3 + c) = pal(c)
    Vector.tabulate(spec.nFrames) { k =>
      val (left, top, w, h) = animRect(spec, k)
      val idx = animFrameIndices(spec, k)
      val transparent = if (spec.transparency && k % 2 == 0 && k > 0) 0 else -1
      for (y <- 0 until h; x <- 0 until w) {
        val ci = idx(y * w + x) & 0xff
        if (ci != transparent) {
          val o = ((top + y) * spec.width + left + x) * 3
          canvas(o) = pal(ci * 3); canvas(o + 1) = pal(ci * 3 + 1)
          canvas(o + 2) = pal(ci * 3 + 2)
        }
      }
      canvas.clone()
    }
  }

  def writeAnim(spec: AnimSpec): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write("GIF89a".getBytes(StandardCharsets.US_ASCII))
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    u16(spec.width); u16(spec.height)
    out.write(0x80 | (7 << 4) | 7) // GCT, 256 entries
    out.write(0)                   // background = index 0
    out.write(0)                   // aspect
    out.write(palette(Spec(spec.width, spec.height, spec.seed)))
    // NETSCAPE looping extension (real-world animated GIFs carry it)
    out.write(0x21); out.write(0xff); out.write(11)
    out.write("NETSCAPE2.0".getBytes(StandardCharsets.US_ASCII))
    out.write(3); out.write(1); u16(0); out.write(0)
    val delays = animDelaysMs(spec)
    for (k <- 0 until spec.nFrames) {
      val transparent = spec.transparency && k % 2 == 0 && k > 0
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write((0 << 2) | (if (transparent) 1 else 0)) // disposal 0 + tflag
      u16(delays(k) / 10)
      out.write(0) // transparent index = 0
      out.write(0) // terminator
      val (left, top, w, h) = animRect(spec, k)
      out.write(0x2c)
      u16(left); u16(top); u16(w); u16(h)
      out.write(0x00) // no local table, not interlaced
      out.write(8)    // min code size
      val packed = lzwEncode(animFrameIndices(spec, k), 8)
      var off = 0
      while (off < packed.length) {
        val n = math.min(255, packed.length - off)
        out.write(n); out.write(packed, off, n)
        off += n
      }
      out.write(0)
    }
    out.write(0x3b)
    out.toByteArray
  }

  /** Rows in GIF interlace transmission order (passes 0,4,2,1 / steps
    * 8,8,4,2) — the inverse of GifDecoder.deinterlace.
    */
  private def interlaceRows(idx: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](idx.length)
    val passes = Array((0, 8), (4, 8), (2, 4), (1, 2))
    var dst = 0
    for ((start, step) <- passes) {
      var y = start
      while (y < h) {
        System.arraycopy(idx, y * w, out, dst * w, w)
        dst += 1
        y += step
      }
    }
    out
  }

  /** Variable-width LZW, LSB-first bit packing; mirrors GifDecoder.lzw's
    * width-growth rule (widen when the table reaches 2^width; stop adding
    * at 4096 without a reset — both sides freeze symmetrically).
    */
  private def lzwEncode(data: Array[Byte], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val maxTable = 4096
    var tableSize = eoi + 1
    var codeWidth = minCode + 1
    val dict = new java.util.HashMap[Long, Integer](1 << 14)
    val out = new ByteArrayOutputStream()
    var bitBuf = 0L
    var bitCnt = 0
    def put(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt
      bitCnt += codeWidth
      while (bitCnt >= 8) {
        out.write((bitBuf & 0xff).toInt)
        bitBuf >>>= 8
        bitCnt -= 8
      }
    }
    put(clear)
    if (data.isEmpty) { put(eoi); if (bitCnt > 0) out.write((bitBuf & 0xff).toInt); return out.toByteArray }
    var prev: Int = data(0) & 0xff
    var i = 1
    while (i < data.length) {
      val c = data(i) & 0xff
      val key = (prev.toLong << 8) | c
      val hit = dict.get(key)
      if (hit != null) prev = hit.intValue()
      else {
        put(prev)
        // Widen on the PRE-add table size (the canonical compress-lineage
        // rule): the decoder makes its k-th add only after reading code
        // k+1, so its width grows exactly here, one code later than a
        // post-add check would.
        if (tableSize == (1 << codeWidth) && codeWidth < 12) codeWidth += 1
        if (tableSize < maxTable) {
          dict.put(key, Integer.valueOf(tableSize))
          tableSize += 1
        }
        prev = c
      }
      i += 1
    }
    put(prev)
    // the decoder adds one last entry after the final data code and may
    // widen before reading EOI — mirror that
    if (tableSize == (1 << codeWidth) && codeWidth < 12) codeWidth += 1
    put(eoi)
    if (bitCnt > 0) out.write((bitBuf & 0xff).toInt)
    out.toByteArray
  }
}

object WebpWriterEx {

  /** Decode-grade lossless WebP (VP8L): real entropy coding — full
    * (non-simple) prefix codes serialized through the code-length code,
    * optional LZ77 run back-references (linear distance codes), an
    * optional color cache, and the two dominant pixel transforms
    * (subtract-green; the predictor transform with a seeded mix of all
    * 14 modes over a coded mode sub-image) — exactly the subset
    * kernel.Vp8lDecoder decodes. Every emitted prefix code is COMPLETE
    * (Kraft sum 1: two-length canonical codes over non-power-of-two
    * alphabets), so the streams are accepted by strict third-party
    * decoders — cross-validated byte-exactly against system libwebp.
    */
  final case class Spec(width: Int, height: Int, seed: Long,
      useLz77: Boolean = true, cacheBits: Int = 0, smooth: Boolean = false,
      subtractGreen: Boolean = false, predictor: Boolean = false,
      predSizeBits: Int = 4,
      colorXform: Boolean = false, colorSizeBits: Int = 3,
      // 2..256: color-indexing transform; combines with the spatial
      // transforms (they then operate on the bundled index sub-image)
      paletteSize: Int = 0,
      // >= 2: meta prefix groups — a coded entropy sub-image selects a
      // per-block prefix-code group; group green-code tables DIFFER (the
      // long-length rotation varies per group) so the decoder's
      // per-symbol group selection is pinned by the oracle
      metaGroups: Int = 0, metaGroupBits: Int = 4,
      // back-references emit 2-D plane distance codes (1..120) whenever
      // the distance maps into the spec's neighborhood table; vertical
      // (distance = width) runs are planted so codes with dy > 0 occur
      use2dDist: Boolean = false)

  /** Deterministic palette (alpha 255) for paletteSize > 0. */
  def paletteOf(spec: Spec): Array[Int] = {
    val b = PixelGen.bytes(spec.seed ^ 0x9A1E77EL, spec.paletteSize * 3)
    Array.tabulate(spec.paletteSize) { i =>
      0xff000000 | ((b(i * 3) & 0xff) << 16) | ((b(i * 3 + 1) & 0xff) << 8) |
        (b(i * 3 + 2) & 0xff)
    }
  }

  /** Per-pixel palette indices (row-major) for paletteSize > 0. */
  def indicesOf(spec: Spec): Array[Int] = {
    val raw = PixelGen.bytes(spec.seed ^ 0x1DCE5L, spec.width * spec.height)
    raw.map(b => (b & 0xff) % spec.paletteSize)
  }

  /** RGBA plane the decoder must reproduce (alpha 255). */
  def plane(spec: Spec): Array[Byte] = {
    if (spec.paletteSize > 0) {
      val pal = paletteOf(spec)
      val idx = indicesOf(spec)
      val out = new Array[Byte](idx.length * 4)
      var i = 0
      while (i < idx.length) {
        val px = pal(idx(i))
        out(i * 4) = ((px >> 16) & 0xff).toByte
        out(i * 4 + 1) = ((px >> 8) & 0xff).toByte
        out(i * 4 + 2) = (px & 0xff).toByte
        out(i * 4 + 3) = ((px >>> 24) & 0xff).toByte
        i += 1
      }
      return out
    }
    val n = spec.width * spec.height
    val rgb =
      if (spec.smooth) {
        val g = PixelGen.smooth(spec.seed, spec.width, spec.height)
        Array.tabulate[Byte](n * 3)(i => g(i / 3))
      } else PixelGen.bytes(spec.seed, n * 3)
    val out = new Array[Byte](n * 4)
    var i = 0
    while (i < n) {
      out(i * 4) = rgb(i * 3); out(i * 4 + 1) = rgb(i * 3 + 1)
      out(i * 4 + 2) = rgb(i * 3 + 2); out(i * 4 + 3) = 0xff.toByte
      i += 1
    }
    // plant literal runs so the LZ77 path is exercised deterministically
    if (spec.useLz77 && n > 40) {
      var r = 8
      while (r + 12 < n) {
        var k = 0
        while (k < 8) {
          System.arraycopy(out, r * 4, out, (r + 1 + k) * 4, 4)
          k += 1
        }
        r += math.max(16, n / 10)
      }
    }
    // plant vertical (copy-from-row-above) segments so 2-D distance
    // codes with dy > 0 are emitted; offset by row parity so horizontal
    // and vertical runs interleave
    if (spec.use2dDist && spec.height > 3 && spec.width > 10) {
      var y = 2
      while (y < spec.height) {
        val x0 = 1 + (y % 3)
        val x1 = math.min(spec.width - 1, x0 + 6)
        System.arraycopy(out, ((y - 1) * spec.width + x0) * 4,
          out, (y * spec.width + x0) * 4, (x1 - x0) * 4)
        y += 2
      }
    }
    out
  }

  private final class Bw(out: ByteArrayOutputStream) {
    private var buf = 0
    private var cnt = 0
    /** n plain bits, LSB-first (header fields, extra bits). */
    def bits(v: Int, n: Int): Unit = {
      var i = 0
      while (i < n) {
        buf |= ((v >> i) & 1) << cnt
        cnt += 1
        if (cnt == 8) { out.write(buf); buf = 0; cnt = 0 }
        i += 1
      }
    }
    /** an L-bit prefix code, MSB of the code first (decoder builds the
      * code by appending each read bit on the right).
      */
    def code(c: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { bits((c >> i) & 1, 1); i -= 1 }
    }
    def flush(): Unit = if (cnt > 0) { out.write(buf); buf = 0; cnt = 0 }
  }

  /** Canonical code assignment for a length vector — the deflate-style
    * construction the decoder's Prefix (and libwebp) use: count per
    * length, first-code per length, codes in symbol order within a
    * length.
    */
  private final class CodeSet(val lens: Array[Int]) {
    val codes: Array[Int] = {
      val maxLen = lens.max
      val counts = new Array[Int](maxLen + 1)
      lens.foreach(l => if (l > 0) counts(l) += 1)
      val next = new Array[Int](maxLen + 1)
      var code = 0
      var l = 1
      while (l <= maxLen) { next(l) = code; code = (code + counts(l)) << 1; l += 1 }
      lens.map { l => if (l == 0) 0 else { val c = next(l); next(l) += 1; c } }
    }
  }

  /** Serialize a COMPLETE canonical prefix code over alphabet [0,
    * count): with count = 2^k + r, the code gives count - 2r symbols
    * length k and 2r symbols length k+1, making the Kraft sum exactly 1.
    * Strict decoders (libwebp) REJECT incomplete codes, so a uniform
    * k-bit code over a non-power-of-two alphabet is not conformant.
    * `rot` rotates WHICH symbols carry the long codes, so per-group
    * code tables differ and a wrong meta-group selection in the decoder
    * cannot round-trip. Returns the per-symbol (code, len) table to
    * emit pixels with.
    */
  private def writeCompleteCode(bw: Bw, count: Int, rot: Int = 0): CodeSet = {
    var k = 0
    while ((1 << (k + 1)) <= count) k += 1 // k = floor(log2 count)
    val r = count - (1 << k)
    val lens = Array.fill(count)(k)
    if (r > 0) {
      val start = (rot * 37) % count
      var j = 0
      while (j < 2 * r) { lens((start + j) % count) = k + 1; j += 1 }
    }
    bw.bits(0, 1)        // not simple
    bw.bits(15, 4)       // 19 code-length codes follow
    val order = Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)
    val clLen = new Array[Int](19)
    if (r == 0) { clLen(k) = 1; clLen(16) = 1 }
    else { clLen(k) = 1; clLen(k + 1) = 2; clLen(16) = 2 }
    for (s <- order) bw.bits(clLen(s), 3)
    bw.bits(0, 1)        // no max-symbol limit
    val cl = new CodeSet(clLen)
    def clEmit(sym: Int): Unit = bw.code(cl.codes(sym), clLen(sym))
    var i = 0
    while (i < count) {
      val v = lens(i)
      var run = 1
      while (i + run < count && lens(i + run) == v) run += 1
      clEmit(v) // first of the run
      var rem = run - 1
      while (rem >= 3) { // repeat-16: copy previous length 3-6 times
        var c = math.min(6, rem)
        if (rem - c != 0 && rem - c < 3) c = rem - 3
        clEmit(16)
        bw.bits(c - 3, 2)
        rem -= c
      }
      while (rem > 0) { clEmit(v); rem -= 1 }
      i += run
    }
    new CodeSet(lens)
  }

  /** value (>=1) -> (symbol, extraBits, extraVal): inverse of the
    * decoder's lengthFromSymbol.
    */
  private def lzSym(value: Int): (Int, Int, Int) = {
    if (value <= 4) (value - 1, 0, 0)
    else {
      // find slot: offset = (2 + (sym&1)) << extraBits, value in (offset, offset + 2^extraBits]
      var sym = 4
      var found = (-1, -1, -1)
      while (sym < 24 && found._1 < 0) {
        val eb = (sym - 2) >> 1
        val off = (2 + (sym & 1)) << eb
        if (value >= off + 1 && value <= off + (1 << eb)) found = (sym, eb, value - off - 1)
        sym += 1
      }
      require(found._1 >= 0, s"lz value $value out of range")
      found
    }
  }

  /** Spatially code one ARGB pixel array: cache-bit header, (main only)
    * meta-prefix bit, uniform prefix codes, literal/LZ77/cache loop.
    */
  private def codePixels(bw: Bw, argb: Array[Int], cacheBits: Int,
      useLz77: Boolean, isMain: Boolean,
      w: Int = 0, metaGroups: Int = 0, metaGroupBits: Int = 4,
      use2dDist: Boolean = false): Unit = {
    val n = argb.length
    if (cacheBits > 0) { bw.bits(1, 1); bw.bits(cacheBits, 4) }
    else bw.bits(0, 1)
    // meta prefix groups (main image only): entropy sub-image whose
    // (red<<8)|green picks the per-block group. The number of code sets
    // in the stream is EXACTLY max-referenced-index + 1 (the decoder
    // derives it from the sub-image), so tiny images that only ever
    // reference group 0 emit one set regardless of metaGroups.
    val useGroups = isMain && metaGroups >= 2
    var nGroups = 1
    def groupOf(i: Int): Int =
      if (!useGroups) 0
      else {
        val gx = (i % w) >> metaGroupBits
        val gy = (i / w) >> metaGroupBits
        (gx + 2 * gy) % metaGroups
      }
    if (isMain) {
      if (useGroups) {
        bw.bits(1, 1)
        bw.bits(metaGroupBits - 2, 3)
        val gw = (w + (1 << metaGroupBits) - 1) >> metaGroupBits
        val gh = (n / w + (1 << metaGroupBits) - 1) >> metaGroupBits
        val gIdx = Array.tabulate(gw * gh)(bi => (bi % gw + 2 * (bi / gw)) % metaGroups)
        nGroups = gIdx.max + 1
        val gImg = gIdx.map(idx =>
          0xff000000 | (((idx >> 8) & 0xff) << 16) | ((idx & 0xff) << 8))
        codePixels(bw, gImg, cacheBits = 0, useLz77 = false, isMain = false)
      } else bw.bits(0, 1)
    }
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val greenAlpha = 256 + 24 + cacheSize
    // per-group green codes ROTATE which symbols carry the long lengths
    // (greenAlpha is never a power of two, so rotation always changes
    // the table) — a wrong group selection in the decoder cannot
    // round-trip. red/blue/alpha are 256-symbol uniform-8 complete
    // codes; distance is a 40-symbol two-length complete code.
    val greenSets = new Array[CodeSet](nGroups)
    var redSet: CodeSet = null
    var blueSet: CodeSet = null
    var alphaSet: CodeSet = null
    var distSet: CodeSet = null
    var gi = 0
    while (gi < nGroups) {
      greenSets(gi) = writeCompleteCode(bw, greenAlpha, rot = gi)
      redSet = writeCompleteCode(bw, 256)
      blueSet = writeCompleteCode(bw, 256)
      alphaSet = writeCompleteCode(bw, 256)
      distSet = writeCompleteCode(bw, 40)
      gi += 1
    }
    val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null
    def cacheIdx(v: Int): Int = ((v * 0x1e35a7bd) >>> (32 - cacheBits)) % cacheSize
    // 2-D plane codes: distance -> code (1..120) for this coded width;
    // distances outside the neighborhood fall back to linear (+120)
    val planeCode: Map[Int, Int] =
      if (use2dDist && w > 0) graft.kernel.Vp8lDecoder.planeCodesFor(w)
      else Map.empty
    var i = 0
    while (i < n) {
      val gs = greenSets(groupOf(i)) // group chosen per symbol
      val cur = argb(i)
      // LZ77: longest run of pixels equal to their d=1 predecessor, or
      // (2-D mode) to the pixel one row above (distance = width)
      var runLen = 0
      if (useLz77 && i > 0) {
        while (i + runLen < n && runLen < 100 && argb(i + runLen) == argb(i + runLen - 1))
          runLen += 1
      }
      var vertLen = 0
      if (use2dDist && w > 0 && i >= w) {
        while (i + vertLen < n && vertLen < 100 && argb(i + vertLen) == argb(i + vertLen - w))
          vertLen += 1
      }
      // prefer the vertical reference when it is at least as long — it is
      // the one that exercises dy > 0 plane codes
      val useVert = vertLen >= 3 && vertLen >= runLen
      val len = if (useVert) vertLen else runLen
      if (len >= 3) {
        val dist = if (useVert) w else 1
        val (ls, leb, lev) = lzSym(len)
        bw.code(gs.codes(256 + ls), gs.lens(256 + ls))
        if (leb > 0) bw.bits(lev, leb)
        val dCode = planeCode.getOrElse(dist, dist + 120)
        val (ds, deb, dev) = lzSym(dCode)
        bw.code(distSet.codes(ds), distSet.lens(ds))
        if (deb > 0) bw.bits(dev, deb)
        var k = 0
        while (k < len) {
          if (cache != null) cache(cacheIdx(argb(i + k))) = argb(i + k)
          k += 1
        }
        i += len
      } else if (cache != null && cache(cacheIdx(cur)) == cur) {
        val s = 256 + 24 + cacheIdx(cur)
        bw.code(gs.codes(s), gs.lens(s))
        i += 1
      } else {
        val g = (cur >> 8) & 0xff
        val rr = (cur >> 16) & 0xff
        val bb = cur & 0xff
        val aa = (cur >>> 24) & 0xff
        bw.code(gs.codes(g), gs.lens(g))
        bw.code(redSet.codes(rr), redSet.lens(rr))
        bw.code(blueSet.codes(bb), blueSet.lens(bb))
        bw.code(alphaSet.codes(aa), alphaSet.lens(aa))
        if (cache != null) cache(cacheIdx(cur)) = cur
        i += 1
      }
    }
  }

  /** Forward predictor transform: seeded mix of all 14 modes per block;
    * residual = pixel - prediction (mod 256 per channel), predictions
    * from ACTUAL neighbor values with the spec's edge rules. Uses the
    * decoder's predictPixel so mode math cannot drift; the plane-equality
    * oracle still pins the residual arithmetic, edges and mode coding.
    */
  private def forwardPredictor(argb: Array[Int], w: Int, h: Int,
      sizeBits: Int, seed: Long): (Array[Int], Array[Int]) = {
    import graft.kernel.Vp8lDecoder.predictPixel
    val mw = (w + (1 << sizeBits) - 1) >> sizeBits
    val mh = (h + (1 << sizeBits) - 1) >> sizeBits
    val modes = Array.tabulate(mw * mh) { bi =>
      val bx = bi % mw; val by = bi / mw
      (bx + 3 * by + (seed & 7).toInt) % 14
    }
    def sub(a: Int, b: Int): Int = {
      val al = ((a >>> 24) - (b >>> 24)) & 0xff
      val r = (((a >> 16) & 0xff) - ((b >> 16) & 0xff)) & 0xff
      val g = (((a >> 8) & 0xff) - ((b >> 8) & 0xff)) & 0xff
      val bl = ((a & 0xff) - (b & 0xff)) & 0xff
      (al << 24) | (r << 16) | (g << 8) | bl
    }
    val res = new Array[Int](argb.length)
    var y = 0
    var i = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val pred =
          if (x == 0 && y == 0) 0xff000000
          else if (y == 0) argb(i - 1)
          else if (x == 0) argb(i - w)
          else predictPixel(modes((y >> sizeBits) * mw + (x >> sizeBits)),
            argb(i - 1), argb(i - w), argb(i - w - 1), argb(i - w + 1))
        res(i) = sub(argb(i), pred)
        x += 1
        i += 1
      }
      y += 1
    }
    (res, modes.map(m => 0xff000000 | (m << 8)))
  }

  /** Forward cross-color transform: seeded per-block multipliers; red
    * first (from green), then blue (from green + ORIGINAL red) — the
    * exact inverse of the decoder's recovery order.
    */
  private def forwardColor(argb: Array[Int], w: Int, h: Int,
      sizeBits: Int, seed: Long): (Array[Int], Array[Int]) = {
    import graft.kernel.Vp8lDecoder.ctDelta
    val cw = (w + (1 << sizeBits) - 1) >> sizeBits
    val ch = (h + (1 << sizeBits) - 1) >> sizeBits
    val mb = PixelGen.bytes(seed ^ 0xC0104L, cw * ch * 3)
    val elems = Array.tabulate(cw * ch) { bi =>
      0xff000000 | ((mb(bi * 3) & 0xff) << 16) | ((mb(bi * 3 + 1) & 0xff) << 8) |
        (mb(bi * 3 + 2) & 0xff) // r2b | g2b | g2r
    }
    val res = new Array[Int](argb.length)
    var y = 0
    var i = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val e = elems((y >> sizeBits) * cw + (x >> sizeBits))
        val g2r = e & 0xff
        val g2b = (e >> 8) & 0xff
        val r2b = (e >> 16) & 0xff
        val px = argb(i)
        val green = (px >> 8) & 0xff
        val red0 = (px >> 16) & 0xff
        val red = (red0 - ctDelta(g2r, green)) & 0xff
        val blue = ((px & 0xff) - ctDelta(g2b, green) - ctDelta(r2b, red0)) & 0xff
        res(i) = (px & 0xff00ff00) | (red << 16) | blue
        x += 1
        i += 1
      }
      y += 1
    }
    (res, elems)
  }

  def write(spec: Spec): Array[Byte] = {
    val px = plane(spec)
    val n = spec.width * spec.height
    var argb = Array.tabulate(n) { i =>
      ((px(i * 4 + 3) & 0xff) << 24) | ((px(i * 4) & 0xff) << 16) |
        ((px(i * 4 + 1) & 0xff) << 8) | (px(i * 4 + 2) & 0xff)
    }
    // forward transforms in bitstream order = forward application order
    // (the decoder inverts in reverse read order). The palette packs
    // FIRST, so subtract-green / predictor / cross-color operate on the
    // bundled index sub-image at the reduced width — the decoder tracks
    // the running width exactly as libwebp does.
    var modesArgb: Array[Int] = null
    var colorArgb: Array[Int] = null
    var paletteDeltas: Array[Int] = null
    var mainW = spec.width
    if (spec.paletteSize > 0) {
      val pal = paletteOf(spec)
      paletteDeltas = Array.tabulate(pal.length) { i =>
        val prev = if (i == 0) 0 else pal(i - 1)
        // per-channel difference mod 256 (decoder re-accumulates)
        val d = Array(24, 16, 8, 0).map { sh =>
          (((pal(i) >>> sh) - (prev >>> sh)) & 0xff) << sh
        }
        d(0) | d(1) | d(2) | d(3)
      }
      val idx = indicesOf(spec)
      val widthBits =
        if (pal.length <= 2) 3 else if (pal.length <= 4) 2
        else if (pal.length <= 16) 1 else 0
      val bpp = 8 >> widthBits
      mainW = (spec.width + (1 << widthBits) - 1) >> widthBits
      val packed = new Array[Int](mainW * spec.height)
      var y = 0
      while (y < spec.height) {
        var x = 0
        while (x < spec.width) {
          val slot = y * mainW + (x >> widthBits)
          val shift = (x & ((1 << widthBits) - 1)) * bpp
          packed(slot) |= idx(y * spec.width + x) << shift
          x += 1
        }
        y += 1
      }
      argb = packed.map(b => 0xff000000 | (b << 8)) // index byte in green
    }
    // spatial transforms operate at mainW: the bundled width when a
    // palette is present, the full width otherwise
    if (spec.subtractGreen) {
      argb = argb.map { p =>
        val g = (p >> 8) & 0xff
        val r = (((p >> 16) & 0xff) - g) & 0xff
        val b = ((p & 0xff) - g) & 0xff
        (p & 0xff00ff00) | (r << 16) | b
      }
    }
    if (spec.predictor) {
      val (res, m) = forwardPredictor(argb, mainW, spec.height,
        spec.predSizeBits, spec.seed)
      argb = res
      modesArgb = m
    }
    if (spec.colorXform) {
      val (res, e) = forwardColor(argb, mainW, spec.height,
        spec.colorSizeBits, spec.seed)
      argb = res
      colorArgb = e
    }
    val payload = new ByteArrayOutputStream()
    payload.write(0x2f)
    val bw = new Bw(payload)
    bw.bits(spec.width - 1, 14)
    bw.bits(spec.height - 1, 14)
    bw.bits(1, 1)  // alpha hint
    bw.bits(0, 3)  // version
    if (spec.paletteSize > 0) {
      bw.bits(1, 1); bw.bits(3, 2)
      bw.bits(spec.paletteSize - 1, 8)
      codePixels(bw, paletteDeltas, cacheBits = 0, useLz77 = false, isMain = false)
    }
    if (spec.subtractGreen) { bw.bits(1, 1); bw.bits(2, 2) }
    if (spec.predictor) {
      bw.bits(1, 1); bw.bits(0, 2)
      bw.bits(spec.predSizeBits - 2, 3)
      codePixels(bw, modesArgb, cacheBits = 0, useLz77 = false, isMain = false)
    }
    if (spec.colorXform) {
      bw.bits(1, 1); bw.bits(1, 2)
      bw.bits(spec.colorSizeBits - 2, 3)
      codePixels(bw, colorArgb, cacheBits = 0, useLz77 = false, isMain = false)
    }
    bw.bits(0, 1)  // no more transforms
    codePixels(bw, argb, spec.cacheBits, spec.useLz77, isMain = true,
      w = mainW, metaGroups = spec.metaGroups,
      metaGroupBits = spec.metaGroupBits, use2dDist = spec.use2dDist)
    bw.flush()
    val body = payload.toByteArray
    val out = new ByteArrayOutputStream()
    def u32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    out.write("RIFF".getBytes(StandardCharsets.US_ASCII))
    u32(4 + 8 + body.length + (body.length & 1))
    out.write("WEBP".getBytes(StandardCharsets.US_ASCII))
    out.write("VP8L".getBytes(StandardCharsets.US_ASCII))
    u32(body.length)
    out.write(body)
    if ((body.length & 1) == 1) out.write(0)
    out.toByteArray
  }
}

object TiffWriterEx {

  /** TIFF decoder-coverage variants the corpus writer doesn't emit:
    * big-endian (MM), RGB (photometric 2, 3 samples), WhiteIsZero
    * inversion, multi-strip layouts with RowsPerStrip + per-strip
    * StripByteCounts, and PackBits (32773) / LZW (5) strip compression.
    */
  final case class Spec(width: Int, height: Int, seed: Long,
      bigEndian: Boolean = false, rgb: Boolean = false,
      whiteIsZero: Boolean = false, rowsPerStrip: Int = 0,
      compression: Int = 1)

  def channels(spec: Spec): Int = if (spec.rgb) 3 else 1

  /** The plane the decoder must return (post-inversion for WhiteIsZero). */
  def plane(spec: Spec): Array[Byte] =
    PixelGen.bytes(spec.seed, spec.width * spec.height * channels(spec))

  def write(spec: Spec): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val be = spec.bigEndian
    def u16(v: Int): Unit =
      if (be) { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
      else { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def u32(v: Int): Unit =
      if (be) { u16((v >>> 16) & 0xffff); u16(v & 0xffff) }
      else { u16(v & 0xffff); u16((v >>> 16) & 0xffff) }
    val ch = channels(spec)
    val rps = if (spec.rowsPerStrip <= 0) spec.height else spec.rowsPerStrip
    val nStrips = (spec.height + rps - 1) / rps
    val bytesPerRow = spec.width * ch
    val p0 = plane(spec)
    val p = if (spec.whiteIsZero) p0.map(b => (~b).toByte) else p0
    // strips compressed up-front (byte counts vary under compression)
    val strips: Array[Array[Byte]] = Array.tabulate(nStrips) { s =>
      val from = s * rps * bytesPerRow
      val until = math.min((s + 1) * rps, spec.height) * bytesPerRow
      val raw = java.util.Arrays.copyOfRange(p, from, until)
      spec.compression match {
        case 1     => raw
        case 32773 => packBitsEncode(raw)
        case 5     => tiffLzwEncode(raw)
        case other => throw new IllegalArgumentException(s"compression $other")
      }
    }
    // tags: w, h, bits, compression, photometric, stripOffsets, samples,
    // rowsPerStrip, stripByteCounts  (9)
    val nTags = 9
    val ifdOff = 8
    // strip offset/count arrays (LONG) go right after the IFD when >1
    val arraysOff = ifdOff + 2 + nTags * 12 + 4
    val arrayBytes = if (nStrips > 1) nStrips * 4 * 2 else 0
    val dataOff = arraysOff + arrayBytes
    val stripLens = strips.map(_.length)
    val stripOffs = stripLens.scanLeft(dataOff)(_ + _).init
    out.write(if (be) 'M' else 'I'); out.write(if (be) 'M' else 'I')
    u16(42); u32(ifdOff)
    u16(nTags)
    def tag(id: Int, typ: Int, cnt: Int, v: Int): Unit = {
      u16(id); u16(typ); u32(cnt)
      // single SHORT values are left-justified in file byte order
      if (typ == 3 && cnt == 1) { u16(v); u16(0) } else u32(v)
    }
    tag(0x0100, 3, 1, spec.width)
    tag(0x0101, 3, 1, spec.height)
    tag(0x0102, 3, 1, 8)
    tag(0x0103, 3, 1, spec.compression)
    tag(0x0106, 3, 1, if (spec.whiteIsZero) 0 else if (spec.rgb) 2 else 1)
    if (nStrips > 1) tag(0x0111, 4, nStrips, arraysOff)
    else tag(0x0111, 4, 1, dataOff)
    tag(0x0115, 3, 1, ch)
    tag(0x0116, 4, 1, rps)
    if (nStrips > 1) tag(0x0117, 4, nStrips, arraysOff + nStrips * 4)
    else tag(0x0117, 4, 1, stripLens(0))
    u32(0)
    if (nStrips > 1) {
      stripOffs.foreach(u32)
      stripLens.foreach(u32)
    }
    strips.foreach(out.write)
    out.toByteArray
  }

  /** PackBits: maximal runs as (-(n-1), byte), literals batched <= 128. */
  def packBitsEncode(raw: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var i = 0
    while (i < raw.length) {
      // measure run length at i
      var run = 1
      while (i + run < raw.length && raw(i + run) == raw(i) && run < 128) run += 1
      if (run >= 2) {
        out.write(-(run - 1) & 0xff)
        out.write(raw(i) & 0xff)
        i += run
      } else {
        // literal stretch until the next >=3 run (2-runs inside literals
        // are cheaper left literal) or 128 cap
        var j = i + 1
        var n = 1
        var stop = false
        while (j < raw.length && n < 128 && !stop) {
          var r = 1
          while (j + r < raw.length && raw(j + r) == raw(j) && r < 3) r += 1
          if (r >= 3) stop = true
          else { j += 1; n += 1 }
        }
        out.write(n - 1)
        out.write(raw, i, n)
        i += n
      }
    }
    out.toByteArray
  }

  /** TIFF LZW: MSB-first, Clear=256/EOI=257, early-change width bump
    * mirroring kernel.TiffDecoder's lag-by-one rule; table reset before
    * overflow.
    */
  def tiffLzwEncode(raw: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var bitBuf = 0L
    var bitCnt = 0
    var width = 9
    def put(code: Int): Unit = {
      bitBuf = (bitBuf << width) | code
      bitCnt += width
      while (bitCnt >= 8) {
        out.write(((bitBuf >> (bitCnt - 8)) & 0xff).toInt)
        bitCnt -= 8
      }
    }
    val dict = new java.util.HashMap[Long, Integer](1 << 14)
    var next = 258
    put(256) // Clear
    if (raw.isEmpty) {
      put(257)
      if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xff).toInt)
      return out.toByteArray
    }
    var prev: Int = raw(0) & 0xff
    var i = 1
    while (i < raw.length) {
      val c = raw(i) & 0xff
      val key = (prev.toLong << 8) | c
      val hit = dict.get(key)
      if (hit != null) prev = hit.intValue()
      else {
        put(prev)
        dict.put(key, Integer.valueOf(next))
        next += 1
        // decoder adds its entry one code later: bump when next == 2^width
        // (its table hits 2^width - 1 after the lagged add)
        if (next == (1 << width) && width < 12) width += 1
        if (next >= 4093) { // reset before the 12-bit table overflows
          put(256)
          dict.clear()
          next = 258
          width = 9
        }
        prev = c
      }
      i += 1
    }
    put(prev)
    // the decoder adds one final entry after the last data code and may
    // bump width before reading EOI — mirror that
    next += 1
    if (next == (1 << width) && width < 12) width += 1
    put(257) // EOI
    if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xff).toInt)
    out.toByteArray
  }
}

object BmpWriterEx {

  /** Complete BI_RGB plane: 24bpp, padded rows, bottom-up (or top-down
    * via negative height). plane() returns the RGB row-major pixels the
    * decoder must reproduce.
    */
  final case class Spec(width: Int, height: Int, seed: Long, topDown: Boolean = false)

  def plane(spec: Spec): Array[Byte] = PixelGen.bytes(spec.seed, spec.width * spec.height * 3)

  def write(spec: Spec): Array[Byte] = {
    val rowSize = ((spec.width * 3 + 3) / 4) * 4
    val dataLen = rowSize * spec.height
    val out = new ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def u32(v: Int): Unit = { u16(v & 0xffff); u16((v >>> 16) & 0xffff) }
    out.write('B'); out.write('M')
    u32(54 + dataLen); u32(0); u32(54)
    u32(40); u32(spec.width); u32(if (spec.topDown) -spec.height else spec.height)
    u16(1); u16(24); u32(0); u32(dataLen); u32(2835); u32(2835); u32(0); u32(0)
    val px = plane(spec)
    val rows = 0 until spec.height
    for (y <- if (spec.topDown) rows else rows.reverse) {
      var x = 0
      while (x < spec.width) {
        val o = (y * spec.width + x) * 3
        out.write(px(o + 2) & 0xff); out.write(px(o + 1) & 0xff); out.write(px(o) & 0xff)
        x += 1
      }
      var pad = rowSize - spec.width * 3
      while (pad > 0) { out.write(0); pad -= 1 }
    }
    out.toByteArray
  }
}

object WavWriterEx {

  /** Complete PCM-16 stream; samples() returns the per-frame mono floats
    * the decoder must reproduce (for channels=2 both channels carry the
    * same sample, so the decoder's channel-average is exact).
    */
  final case class Spec(sampleRate: Int, channels: Int, nFrames: Int, seed: Long)

  def rawSamples(spec: Spec): Array[Short] = {
    val out = new Array[Short](spec.nFrames)
    var x = spec.seed
    var i = 0
    while (i < spec.nFrames) {
      x = x * 6364136223846793005L + 1442695040888963407L
      out(i) = ((x >>> 33) & 0xffff).toShort
      i += 1
    }
    out
  }

  def write(spec: Spec): Array[Byte] = {
    val bits = 16
    val byteRate = spec.sampleRate * spec.channels * bits / 8
    val dataLen = spec.nFrames * spec.channels * 2
    val out = new ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def u32(v: Long): Unit = { u16((v & 0xffff).toInt); u16(((v >> 16) & 0xffff).toInt) }
    out.write("RIFF".getBytes(StandardCharsets.US_ASCII)); u32(36L + dataLen)
    out.write("WAVE".getBytes(StandardCharsets.US_ASCII))
    out.write("fmt ".getBytes(StandardCharsets.US_ASCII)); u32(16L)
    u16(1); u16(spec.channels); u32(spec.sampleRate.toLong); u32(byteRate.toLong)
    u16(spec.channels * bits / 8); u16(bits)
    out.write("data".getBytes(StandardCharsets.US_ASCII)); u32(dataLen.toLong)
    val s = rawSamples(spec)
    var i = 0
    while (i < spec.nFrames) {
      var c = 0
      while (c < spec.channels) { u16(s(i) & 0xffff); c += 1 }
      i += 1
    }
    out.toByteArray
  }
}
