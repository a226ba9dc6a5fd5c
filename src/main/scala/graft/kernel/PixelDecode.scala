package graft.kernel

import java.util.zip.Inflater

/** Real pixel/sample decoders for the formats whose codecs are fully
  * JVM-expressible: PNG (zlib via java.util.zip + the five scanline
  * filters), BMP (BI_RGB 8/24/32bpp), GIF (hand-written LZW) and WAV
  * (PCM 8/16-bit). This closes the multimodal "decode stub" boundary for
  * every format in the corpus except the perceptual codecs that would
  * need a quantized-transform implementation (WebP-VP8, H.264 in MP4) —
  * those remain the declared stub (reference: the Tika delegate likewise
  * parses container metadata and delegates pixels to javax.imageio,
  * reference README.md:3-8).
  *
  * Decoders never throw on malformed input: every failure path returns
  * None (the taxonomy contract — failures become rows, not task errors).
  */
final case class RawImage(width: Int, height: Int, channels: Int, data: Array[Byte]) {

  /** Per-pixel luma in [0,255]: ITU-R BT.601 integer approximation for
    * color images; pass-through for gray; alpha ignored.
    */
  def luma: Array[Int] = {
    val n = width * height
    val out = new Array[Int](n)
    var i = 0
    channels match {
      case 1 =>
        while (i < n) { out(i) = data(i) & 0xff; i += 1 }
      case 2 => // gray + alpha
        while (i < n) { out(i) = data(i * 2) & 0xff; i += 1 }
      case c => // 3 = RGB, 4 = RGBA
        while (i < n) {
          val p = i * c
          val r = data(p) & 0xff; val g = data(p + 1) & 0xff; val b = data(p + 2) & 0xff
          out(i) = (77 * r + 150 * g + 29 * b) >> 8
          i += 1
        }
    }
    out
  }
}

object PngDecoder {

  /** Full PNG decode for the mainstream profile: 8-bit samples, color
    * types 0/2/3/4/6, both non-interlaced and Adam7-interlaced images
    * (per-pass scanline filtering + de-interlace merge; the corpus writer
    * emits interlaced PNGs 1-in-6). Multi-chunk IDAT is concatenated
    * before inflation.
    */
  def decode(bytes: Array[Byte]): Option[RawImage] = {
    if (bytes.length < 45) return None
    if ((bytes(0) & 0xff) != 0x89 || bytes(1) != 'P' || bytes(2) != 'N' || bytes(3) != 'G')
      return None
    def u32(p: Int): Int =
      ((bytes(p) & 0xff) << 24) | ((bytes(p + 1) & 0xff) << 16) |
        ((bytes(p + 2) & 0xff) << 8) | (bytes(p + 3) & 0xff)
    var w = 0; var h = 0; var bitDepth = 0; var colorType = 0; var interlace = 0
    var palette: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    var p = 8
    var sawIhdr = false
    var done = false
    while (!done && p + 8 <= bytes.length) {
      val len = u32(p)
      if (len < 0 || p + 12 + len > bytes.length) { done = true }
      else {
        val typ = new String(bytes, p + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
        typ match {
          case "IHDR" =>
            if (len < 13) return None
            w = u32(p + 8); h = u32(p + 12)
            bitDepth = bytes(p + 16) & 0xff; colorType = bytes(p + 17) & 0xff
            interlace = bytes(p + 20) & 0xff
            sawIhdr = true
          case "PLTE" =>
            palette = java.util.Arrays.copyOfRange(bytes, p + 8, p + 8 + len)
          case "IDAT" =>
            idat.write(bytes, p + 8, len)
          case "IEND" => done = true
          case _      => ()
        }
        p += 12 + len
      }
    }
    if (!sawIhdr || w <= 0 || h <= 0 || bitDepth != 8 || interlace > 1) return None
    if (w.toLong * h > 64L * 1024 * 1024) return None // 64 MP sanity bound
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      case _ => return None
    }
    val stride = w * channels
    val out =
      if (interlace == 0) {
        val rawLen = (stride + 1).toLong * h
        if (rawLen > Int.MaxValue) return None
        val raw = inflate(idat.toByteArray, rawLen.toInt).getOrElse(return None)
        if (raw.length < rawLen) return None
        unfilter(raw, 0, w, h, channels).getOrElse(return None)
      } else {
        // Adam7: seven per-pass sub-images, each with its own scanline
        // filters, scattered into the full plane
        var rawLen = 0L
        for ((x0, y0, dx, dy) <- Adam7) {
          val pw = if (w > x0) (w - x0 + dx - 1) / dx else 0
          val ph = if (h > y0) (h - y0 + dy - 1) / dy else 0
          if (pw > 0 && ph > 0) rawLen += (pw.toLong * channels + 1) * ph
        }
        if (rawLen > Int.MaxValue) return None
        val raw = inflate(idat.toByteArray, rawLen.toInt).getOrElse(return None)
        if (raw.length < rawLen) return None
        val plane = new Array[Byte](stride * h)
        var off = 0
        for ((x0, y0, dx, dy) <- Adam7) {
          val pw = if (w > x0) (w - x0 + dx - 1) / dx else 0
          val ph = if (h > y0) (h - y0 + dy - 1) / dy else 0
          if (pw > 0 && ph > 0) {
            val sub = unfilter(raw, off, pw, ph, channels).getOrElse(return None)
            off += (pw * channels + 1) * ph
            var py = 0
            while (py < ph) {
              var pxi = 0
              while (pxi < pw) {
                val tx = x0 + pxi * dx
                val ty = y0 + py * dy
                var c = 0
                while (c < channels) {
                  plane((ty * w + tx) * channels + c) = sub((py * pw + pxi) * channels + c)
                  c += 1
                }
                pxi += 1
              }
              py += 1
            }
          }
        }
        plane
      }
    if (colorType == 3) {
      if (palette == null) return None
      val rgb = new Array[Byte](w * h * 3)
      var i = 0
      while (i < w * h) {
        val idx = (out(i) & 0xff) * 3
        if (idx + 2 >= palette.length) return None
        rgb(i * 3) = palette(idx); rgb(i * 3 + 1) = palette(idx + 1)
        rgb(i * 3 + 2) = palette(idx + 2)
        i += 1
      }
      Some(RawImage(w, h, 3, rgb))
    } else Some(RawImage(w, h, channels, out))
  }

  /** Adam7 pass grid: (xStart, yStart, xStep, yStep). */
  private val Adam7 = Seq(
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))

  /** Reverse the five scanline filters over a contiguous (1 + w*ch) * h
    * filtered region starting at `rawOff`; returns the w*ch*h plane.
    */
  private def unfilter(raw: Array[Byte], rawOff: Int, w: Int, h: Int,
      channels: Int): Option[Array[Byte]] = {
    val stride = w * channels
    val out = new Array[Byte](stride * h)
    val bpp = channels // 8-bit samples: filter unit = channels bytes
    var y = 0
    while (y < h) {
      val rowIn = rawOff + y * (stride + 1)
      val filter = raw(rowIn) & 0xff
      val o = y * stride
      var x = 0
      filter match {
        case 0 =>
          System.arraycopy(raw, rowIn + 1, out, o, stride)
        case 1 => // Sub
          while (x < stride) {
            val a = if (x >= bpp) out(o + x - bpp) & 0xff else 0
            out(o + x) = (((raw(rowIn + 1 + x) & 0xff) + a) & 0xff).toByte
            x += 1
          }
        case 2 => // Up
          while (x < stride) {
            val b = if (y > 0) out(o - stride + x) & 0xff else 0
            out(o + x) = (((raw(rowIn + 1 + x) & 0xff) + b) & 0xff).toByte
            x += 1
          }
        case 3 => // Average
          while (x < stride) {
            val a = if (x >= bpp) out(o + x - bpp) & 0xff else 0
            val b = if (y > 0) out(o - stride + x) & 0xff else 0
            out(o + x) = (((raw(rowIn + 1 + x) & 0xff) + ((a + b) >> 1)) & 0xff).toByte
            x += 1
          }
        case 4 => // Paeth
          while (x < stride) {
            val a = if (x >= bpp) out(o + x - bpp) & 0xff else 0
            val b = if (y > 0) out(o - stride + x) & 0xff else 0
            val c = if (y > 0 && x >= bpp) out(o - stride + x - bpp) & 0xff else 0
            val pp = a + b - c
            val pa = math.abs(pp - a); val pb = math.abs(pp - b); val pc = math.abs(pp - c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
            out(o + x) = (((raw(rowIn + 1 + x) & 0xff) + pred) & 0xff).toByte
            x += 1
          }
        case _ => return None
      }
      y += 1
    }
    Some(out)
  }

  // one Inflater per executor thread, reset between images — a fresh
  // native zlib context per PNG was measurable in decode-heavy queries
  private val inflaters = new ThreadLocal[Inflater] {
    override def initialValue() = new Inflater()
  }

  private def inflate(in: Array[Byte], expect: Int): Option[Array[Byte]] = {
    val inf = inflaters.get()
    inf.reset()
    try {
      inf.setInput(in)
      val out = new Array[Byte](expect)
      var off = 0
      while (off < expect && !inf.finished()) {
        val n = inf.inflate(out, off, expect - off)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return None
        off += n
      }
      if (off == expect) Some(out) else None
    } catch {
      case _: java.util.zip.DataFormatException => None
    } // no end(): thread-local instance is reused
  }
}

object BmpDecoder {

  /** BI_RGB 8bpp (palette), 24bpp and 32bpp BITMAPINFOHEADER decode;
    * bottom-up and top-down row orders; 4-byte row padding. Returns RGB.
    */
  def decode(bytes: Array[Byte]): Option[RawImage] = {
    if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
    def i32(p: Int): Int =
      (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8) |
        ((bytes(p + 2) & 0xff) << 16) | ((bytes(p + 3) & 0xff) << 24)
    def u16(p: Int): Int = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
    val dataOff = i32(10)
    val dib = i32(14)
    if (dib < 40) return None
    val w = i32(18)
    val hRaw = i32(22)
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    val bpp = u16(28)
    val compression = i32(30)
    if (w <= 0 || h <= 0 || compression != 0) return None
    if (w.toLong * h > 64L * 1024 * 1024) return None
    val palette: Array[Byte] =
      if (bpp == 8) {
        val nColors = { val c = i32(46); if (c == 0) 256 else c }
        val pOff = 14 + dib
        if (pOff + nColors * 4 > bytes.length) return None
        val pal = new Array[Byte](nColors * 4)
        System.arraycopy(bytes, pOff, pal, 0, nColors * 4)
        pal
      } else null
    val srcBytesPerPx = bpp / 8
    if (bpp != 8 && bpp != 24 && bpp != 32) return None
    val rowSize = ((w * srcBytesPerPx + 3) / 4) * 4
    if (dataOff < 0 || dataOff.toLong + rowSize.toLong * h > bytes.length) return None
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val srcRow = dataOff + (if (topDown) y else h - 1 - y) * rowSize
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        if (bpp == 8) {
          val idx = (bytes(srcRow + x) & 0xff) * 4
          if (idx + 2 >= palette.length) return None
          // BMP palette entries are BGRA
          out(o) = palette(idx + 2); out(o + 1) = palette(idx + 1); out(o + 2) = palette(idx)
        } else {
          val s = srcRow + x * srcBytesPerPx
          // pixel order is BGR(A)
          out(o) = bytes(s + 2); out(o + 1) = bytes(s + 1); out(o + 2) = bytes(s)
        }
        x += 1
      }
      y += 1
    }
    Some(RawImage(w, h, 3, out))
  }
}

object GifDecoder {

  /** One composited animation frame: the full logical-screen RGB canvas
    * as of this frame, plus the Graphic Control Extension delay.
    */
  final case class GifFrame(delayMs: Int, image: RawImage)
  final case class AnimatedGif(width: Int, height: Int, frames: Vector[GifFrame])

  /** Full animated-GIF decode: every image descriptor is LZW-decoded into
    * its rect and composited onto the logical-screen canvas honoring the
    * GCE transparency index and disposal methods 0/1 (leave), 2 (restore
    * rect to background) and 3 (restore to previous canvas). Frame
    * timestamps come from the GCE delay (units of 10 ms). Decoding stops
    * after `maxFrames` composites (bounded work on adversarial inputs).
    */
  def decodeFrames(bytes: Array[Byte], maxFrames: Int = 256): Option[AnimatedGif] = {
    if (bytes.length < 13 || bytes(0) != 'G' || bytes(1) != 'I' || bytes(2) != 'F')
      return None
    def u16(p: Int): Int = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
    val sw = u16(6); val sh = u16(8)
    if (sw <= 0 || sh <= 0 || sw.toLong * sh > 64L * 1024 * 1024) return None
    var p = 10
    val flags = bytes(p) & 0xff
    val bgIndex = bytes(p + 1) & 0xff
    p += 3
    var gct: Array[Byte] = null
    if ((flags & 0x80) != 0) {
      val n = 2 << (flags & 7)
      if (p + n * 3 > bytes.length) return None
      gct = java.util.Arrays.copyOfRange(bytes, p, p + n * 3)
      p += n * 3
    }
    val canvas = new Array[Byte](sw * sh * 3)
    if (gct != null && bgIndex * 3 + 2 < gct.length) {
      var i = 0
      while (i < sw * sh) {
        canvas(i * 3) = gct(bgIndex * 3); canvas(i * 3 + 1) = gct(bgIndex * 3 + 1)
        canvas(i * 3 + 2) = gct(bgIndex * 3 + 2)
        i += 1
      }
    }
    val frames = Vector.newBuilder[GifFrame]
    var nFrames = 0
    // pending GCE state (applies to the next image descriptor only)
    var delayMs = 0; var disposal = 0; var transparent = -1
    var prevCanvas: Array[Byte] = null
    while (p < bytes.length && nFrames < maxFrames) {
      (bytes(p) & 0xff) match {
        case 0x21 =>
          if (p + 1 >= bytes.length) return doneOrNone(frames, sw, sh, nFrames)
          val label = bytes(p + 1) & 0xff
          if (label == 0xf9 && p + 7 < bytes.length && (bytes(p + 2) & 0xff) >= 4) {
            val packed = bytes(p + 3) & 0xff
            disposal = (packed >> 2) & 7
            delayMs = u16(p + 4) * 10
            transparent = if ((packed & 1) != 0) bytes(p + 6) & 0xff else -1
          }
          p += 2
          while (p < bytes.length && (bytes(p) & 0xff) != 0) p += 1 + (bytes(p) & 0xff)
          p += 1
        case 0x2c =>
          if (p + 10 > bytes.length) return doneOrNone(frames, sw, sh, nFrames)
          val left = u16(p + 1); val top = u16(p + 3)
          val w = u16(p + 5); val h = u16(p + 7)
          val iflags = bytes(p + 9) & 0xff
          p += 10
          var ct = gct
          if ((iflags & 0x80) != 0) {
            val n = 2 << (iflags & 7)
            if (p + n * 3 > bytes.length) return doneOrNone(frames, sw, sh, nFrames)
            ct = java.util.Arrays.copyOfRange(bytes, p, p + n * 3)
            p += n * 3
          }
          if (ct == null || w <= 0 || h <= 0 || left + w > sw || top + h > sh)
            return doneOrNone(frames, sw, sh, nFrames)
          if (p >= bytes.length) return doneOrNone(frames, sw, sh, nFrames)
          val minCode = bytes(p) & 0xff; p += 1
          if (minCode < 2 || minCode > 11) return doneOrNone(frames, sw, sh, nFrames)
          val data = new java.io.ByteArrayOutputStream()
          while (p < bytes.length && (bytes(p) & 0xff) != 0) {
            val n = bytes(p) & 0xff
            if (p + 1 + n > bytes.length) return doneOrNone(frames, sw, sh, nFrames)
            data.write(bytes, p + 1, n)
            p += 1 + n
          }
          p += 1 // block terminator
          val idxRaw = lzw(data.toByteArray, minCode, w * h)
            .getOrElse(return doneOrNone(frames, sw, sh, nFrames))
          val idx = if ((iflags & 0x40) != 0) deinterlace(idxRaw, w, h) else idxRaw
          if (disposal == 3) prevCanvas = canvas.clone()
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val ci = idx(y * w + x) & 0xff
              if (ci != transparent) {
                val c = ci * 3
                if (c + 2 < ct.length) {
                  val o = ((top + y) * sw + left + x) * 3
                  canvas(o) = ct(c); canvas(o + 1) = ct(c + 1); canvas(o + 2) = ct(c + 2)
                }
              }
              x += 1
            }
            y += 1
          }
          frames += GifFrame(delayMs, RawImage(sw, sh, 3, canvas.clone()))
          nFrames += 1
          disposal match {
            case 2 => // restore rect to background color
              val (br, bg2, bb) =
                if (gct != null && bgIndex * 3 + 2 < gct.length)
                  (gct(bgIndex * 3), gct(bgIndex * 3 + 1), gct(bgIndex * 3 + 2))
                else (0.toByte, 0.toByte, 0.toByte)
              var yy = 0
              while (yy < h) {
                var xx = 0
                while (xx < w) {
                  val o = ((top + yy) * sw + left + xx) * 3
                  canvas(o) = br; canvas(o + 1) = bg2; canvas(o + 2) = bb
                  xx += 1
                }
                yy += 1
              }
            case 3 if prevCanvas != null =>
              System.arraycopy(prevCanvas, 0, canvas, 0, canvas.length)
            case _ => ()
          }
          delayMs = 0; disposal = 0; transparent = -1
        case 0x3b =>
          return doneOrNone(frames, sw, sh, nFrames)
        case _ =>
          return doneOrNone(frames, sw, sh, nFrames)
      }
    }
    doneOrNone(frames, sw, sh, nFrames)
  }

  private def doneOrNone(frames: scala.collection.mutable.Builder[GifFrame, Vector[GifFrame]],
      w: Int, h: Int, n: Int): Option[AnimatedGif] = {
    val f = frames.result()
    if (f.isEmpty) None else Some(AnimatedGif(w, h, f))
  }

  /** First-frame GIF decode: global/local color table, hand-written LZW
    * with variable code width + clear/EOI handling, Adam-style 4-pass
    * deinterlace when the descriptor flags it. Returns RGB.
    */
  def decode(bytes: Array[Byte]): Option[RawImage] = {
    if (bytes.length < 13 || bytes(0) != 'G' || bytes(1) != 'I' || bytes(2) != 'F')
      return None
    def u16(p: Int): Int = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
    var p = 6
    p += 4 // logical screen w/h
    val flags = bytes(p) & 0xff; p += 3
    var gct: Array[Byte] = null
    if ((flags & 0x80) != 0) {
      val n = 2 << (flags & 7)
      if (p + n * 3 > bytes.length) return None
      gct = java.util.Arrays.copyOfRange(bytes, p, p + n * 3)
      p += n * 3
    }
    // Walk blocks to the first image descriptor.
    while (p < bytes.length) {
      (bytes(p) & 0xff) match {
        case 0x21 => // extension: label + sub-blocks
          p += 2
          while (p < bytes.length && (bytes(p) & 0xff) != 0) p += 1 + (bytes(p) & 0xff)
          p += 1
        case 0x2c =>
          if (p + 10 > bytes.length) return None
          val w = u16(p + 5); val h = u16(p + 7)
          val iflags = bytes(p + 9) & 0xff
          p += 10
          var ct = gct
          if ((iflags & 0x80) != 0) {
            val n = 2 << (iflags & 7)
            if (p + n * 3 > bytes.length) return None
            ct = java.util.Arrays.copyOfRange(bytes, p, p + n * 3)
            p += n * 3
          }
          if (ct == null || w <= 0 || h <= 0) return None
          if (w.toLong * h > 64L * 1024 * 1024) return None
          if (p >= bytes.length) return None
          val minCode = bytes(p) & 0xff; p += 1
          if (minCode < 2 || minCode > 11) return None
          // concatenate data sub-blocks
          val data = new java.io.ByteArrayOutputStream()
          while (p < bytes.length && (bytes(p) & 0xff) != 0) {
            val n = bytes(p) & 0xff
            if (p + 1 + n > bytes.length) return None
            data.write(bytes, p + 1, n)
            p += 1 + n
          }
          val idx = lzw(data.toByteArray, minCode, w * h).getOrElse(return None)
          val ordered =
            if ((iflags & 0x40) != 0) deinterlace(idx, w, h) else idx
          val out = new Array[Byte](w * h * 3)
          var i = 0
          while (i < w * h) {
            val c = (ordered(i) & 0xff) * 3
            if (c + 2 >= ct.length) return None
            out(i * 3) = ct(c); out(i * 3 + 1) = ct(c + 1); out(i * 3 + 2) = ct(c + 2)
            i += 1
          }
          return Some(RawImage(w, h, 3, out))
        case 0x3b => return None // trailer before any image
        case _    => return None
      }
    }
    None
  }

  /** GIF/TIFF-variant LZW with variable code width (minCode+1 .. 12 bits),
    * clear and end-of-information codes, LSB-first bit packing.
    */
  private def lzw(data: Array[Byte], minCode: Int, nPixels: Int): Option[Array[Byte]] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val maxTable = 4096
    // dictionary as (prefix, suffix) pairs
    val prefix = new Array[Int](maxTable)
    val suffix = new Array[Byte](maxTable)
    val out = new Array[Byte](nPixels)
    var outLen = 0
    var tableSize = eoi + 1
    var codeWidth = minCode + 1
    var prev = -1
    var bitPos = 0
    val totalBits = data.length * 8
    val stack = new Array[Byte](maxTable)
    var firstByte: Byte = 0

    def emit(code: Int): Boolean = { // expand code onto output; returns first byte ok
      var sp = 0
      var c = code
      while (c >= clear) { // composite codes
        if (sp >= maxTable || c >= tableSize) return false
        stack(sp) = suffix(c); sp += 1
        c = prefix(c)
      }
      val first = c
      if (outLen < out.length) { out(outLen) = first.toByte; outLen += 1 }
      while (sp > 0) {
        sp -= 1
        if (outLen < out.length) { out(outLen) = stack(sp); outLen += 1 }
      }
      firstByte = first.toByte
      true
    }

    while (bitPos + codeWidth <= totalBits && outLen < nPixels) {
      // read codeWidth bits, LSB-first
      var code = 0
      var k = 0
      while (k < codeWidth) {
        val b = bitPos + k
        if ((data(b >> 3) & (1 << (b & 7))) != 0) code |= 1 << k
        k += 1
      }
      bitPos += codeWidth
      if (code == clear) {
        tableSize = eoi + 1; codeWidth = minCode + 1; prev = -1
      } else if (code == eoi) {
        return if (outLen == nPixels) Some(out) else None
      } else if (prev == -1) {
        if (code >= clear) return None
        if (!emit(code)) return None
        prev = code
      } else {
        if (code > tableSize) return None
        if (code == tableSize) {
          // KwKwK case: emit prev + firstByte(prev)
          val savedFirst = firstByte
          if (!emit(prev)) return None
          if (outLen < out.length) { out(outLen) = savedFirst; outLen += 1 }
          firstByte = savedFirst
        } else {
          if (!emit(code)) return None
        }
        if (tableSize < maxTable) {
          prefix(tableSize) = prev
          suffix(tableSize) = firstByte
          tableSize += 1
          if (tableSize == (1 << codeWidth) && codeWidth < 12) codeWidth += 1
        }
        prev = code
      }
    }
    if (outLen == nPixels) Some(out) else None
  }

  private def deinterlace(idx: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](idx.length)
    val passes = Array((0, 8), (4, 8), (2, 4), (1, 2))
    var src = 0
    for ((start, step) <- passes) {
      var y = start
      while (y < h) {
        System.arraycopy(idx, src * w, out, y * w, w)
        src += 1
        y += step
      }
    }
    out
  }
}

object TiffDecoder {

  /** Baseline uncompressed TIFF decode: II/MM byte orders, 8-bit gray
    * (photometric 0/1, WhiteIsZero inverted) and RGB (photometric 2),
    * single- or multi-strip with RowsPerStrip/StripByteCounts; a missing
    * StripByteCounts falls back to the contiguous plane size (legacy
    * minimal writers omit it). LZW/PackBits-compressed TIFFs return None
    * (the metadata tier still covers them via the IFD reader).
    */
  def decode(bytes: Array[Byte]): Option[RawImage] = {
    if (bytes.length < 8) return None
    val le =
      if (bytes(0) == 'I' && bytes(1) == 'I') true
      else if (bytes(0) == 'M' && bytes(1) == 'M') false
      else return None
    def u16(p: Int): Int =
      if (p < 0 || p + 2 > bytes.length) -1
      else if (le) (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
      else ((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff)
    def u32(p: Int): Long =
      if (p < 0 || p + 4 > bytes.length) -1L
      else if (le) (bytes(p) & 0xffL) | ((bytes(p + 1) & 0xffL) << 8) |
        ((bytes(p + 2) & 0xffL) << 16) | ((bytes(p + 3) & 0xffL) << 24)
      else ((bytes(p) & 0xffL) << 24) | ((bytes(p + 1) & 0xffL) << 16) |
        ((bytes(p + 2) & 0xffL) << 8) | (bytes(p + 3) & 0xffL)
    if (u16(2) != 42) return None
    val ifd = u32(4)
    if (ifd < 0 || ifd > Int.MaxValue - 2) return None
    val n = u16(ifd.toInt)
    if (n <= 0 || n > 512) return None
    var w = 0; var h = 0; var bits = 8; var compression = 1
    var photometric = 1; var samples = 1; var rowsPerStrip = Int.MaxValue
    var stripOffsets: Array[Long] = null
    var stripCounts: Array[Long] = null
    var t4Options = 0L
    var i = 0
    while (i < n) {
      val p = ifd.toInt + 2 + i * 12
      if (p + 12 > bytes.length) return None
      val tag = u16(p); val typ = u16(p + 2); val cnt = u32(p + 4)
      // inline SHORT/LONG single values sit left-justified in file order
      def v1: Long = if (typ == 3) u16(p + 8).toLong else u32(p + 8)
      def arr: Array[Long] = { // null = malformed
        if (cnt <= 0 || cnt > (1L << 20)) null
        else {
          val size = if (typ == 3) 2 else 4
          if (cnt * size <= 4)
            Array.tabulate(cnt.toInt)(k =>
              if (typ == 3) u16(p + 8 + k * 2).toLong else u32(p + 8))
          else {
            val off = u32(p + 8)
            if (off < 0 || off + cnt * size > bytes.length) null
            else Array.tabulate(cnt.toInt)(k =>
              if (typ == 3) u16(off.toInt + k * 2).toLong else u32(off.toInt + k * 4))
          }
        }
      }
      tag match {
        case 0x0100 => w = v1.toInt
        case 0x0101 => h = v1.toInt
        case 0x0102 =>
          val a = if (cnt == 1) Array(v1) else arr
          if (a == null || a.isEmpty) return None
          bits = a(0).toInt
        case 0x0103 => compression = v1.toInt
        case 0x0106 => photometric = v1.toInt
        case 0x0111 => stripOffsets = arr; if (stripOffsets == null) return None
        case 0x0115 => samples = v1.toInt
        case 0x0116 => rowsPerStrip = math.min(v1, Int.MaxValue.toLong).toInt
        case 0x0117 => stripCounts = arr; if (stripCounts == null) return None
        case 0x0124 => t4Options = v1
        case _      => ()
      }
      i += 1
    }
    // bilevel CCITT fax (compressions 3 = G3 per T4Options, 4 = G4):
    // decode per strip through the shared fax engine, expand to 8-bit
    // luma (fax bits are white/black semantic; photometric 0 is the
    // spec shape, 1 tolerated as pre-inverted)
    if (bits == 1 && (compression == 3 || compression == 4) && samples == 1 &&
      (photometric == 0 || photometric == 1)) {
      if (w <= 0 || h <= 0 || w.toLong * h > 64L * 1024 * 1024) return None
      if (stripOffsets == null || stripOffsets.isEmpty || stripCounts == null ||
        stripCounts.length < stripOffsets.length) return None
      val k = if (compression == 4) -1 else if ((t4Options & 1) != 0) 4 else 0
      if (rowsPerStrip <= 0 || rowsPerStrip == Int.MaxValue) rowsPerStrip = h
      val out = new Array[Byte](w * h)
      var row = 0
      var s = 0
      while (s < stripOffsets.length && row < h) {
        val off = stripOffsets(s); val cnt = stripCounts(s)
        if (off < 0 || cnt <= 0 || off + cnt > bytes.length) return None
        val stripRows = math.min(rowsPerStrip, h - row)
        val data = java.util.Arrays.copyOfRange(bytes, off.toInt, (off + cnt).toInt)
        CcittFax.decode(data, k, w, stripRows, blackIs1 = true, byteAlign = false) match {
          case Some((px, nr)) if nr == stripRows =>
            val stride = (w + 7) / 8
            var y = 0
            while (y < stripRows) {
              var x0 = 0
              while (x0 < w) {
                val black = ((px(y * stride + (x0 >> 3)) >> (7 - (x0 & 7))) & 1) == 1
                out((row + y) * w + x0) = if (black) 0 else 0xff.toByte
                x0 += 1
              }
              y += 1
            }
          case _ => return None
        }
        row += stripRows
        s += 1
      }
      if (row < h) return None
      if (photometric == 1) { // pre-inverted producers
        var j = 0
        while (j < out.length) { out(j) = (~out(j)).toByte; j += 1 }
      }
      return Some(RawImage(w, h, 1, out))
    }
    if (w <= 0 || h <= 0 || bits != 8) return None
    if (compression != 1 && compression != 5 && compression != 32773) return None
    if (samples != 1 && samples != 3) return None
    if (photometric != 0 && photometric != 1 && photometric != 2) return None
    if (photometric == 2 && samples != 3) return None
    if (w.toLong * h > 64L * 1024 * 1024) return None
    if (stripOffsets == null || stripOffsets.isEmpty) return None
    val total = w * h * samples
    val out = new Array[Byte](total)
    if (rowsPerStrip <= 0) rowsPerStrip = h
    val bytesPerRow = w * samples
    var written = 0
    var s = 0
    while (s < stripOffsets.length && written < total) {
      val off = stripOffsets(s)
      val stripPixels = math.min(rowsPerStrip.toLong * bytesPerRow, (total - written).toLong).toInt
      if (compression == 1) {
        val want = math.min(
          if (stripCounts != null && s < stripCounts.length) stripCounts(s)
          else stripPixels.toLong,
          stripPixels.toLong)
        if (off < 0 || want < 0 || off + want > bytes.length) return None
        System.arraycopy(bytes, off.toInt, out, written, want.toInt)
        written += want.toInt
      } else {
        if (stripCounts == null || s >= stripCounts.length) return None
        val cnt = stripCounts(s)
        if (off < 0 || cnt < 0 || off + cnt > bytes.length) return None
        val n =
          if (compression == 32773)
            packBitsDecode(bytes, off.toInt, cnt.toInt, out, written, stripPixels)
          else
            tiffLzwDecode(bytes, off.toInt, cnt.toInt, out, written, stripPixels)
        if (n < 0) return None
        written += n
      }
      s += 1
    }
    if (written < total) return None
    if (photometric == 0) { // WhiteIsZero: invert to standard luma
      var j = 0
      while (j < total) { out(j) = (~out(j)).toByte; j += 1 }
    }
    Some(RawImage(w, h, samples, out))
  }

  /** PackBits (compression 32773): n in 0..127 = n+1 literals; n in
    * -127..-1 = 1-n repeats of next byte; -128 = noop. Returns bytes
    * produced, -1 on malformed/overflow.
    */
  private def packBitsDecode(src: Array[Byte], off: Int, len: Int,
      dst: Array[Byte], dstOff: Int, dstMax: Int): Int = {
    var p = off
    val end = off + len
    var o = dstOff
    val oEnd = dstOff + dstMax
    while (p < end && o < oEnd) {
      val n = src(p); p += 1
      if (n >= 0) {
        val cnt = n + 1
        if (p + cnt > end || o + cnt > oEnd) return -1
        System.arraycopy(src, p, dst, o, cnt)
        p += cnt; o += cnt
      } else if (n != -128) {
        val cnt = 1 - n
        if (p >= end || o + cnt > oEnd) return -1
        java.util.Arrays.fill(dst, o, o + cnt, src(p))
        p += 1; o += cnt
      }
    }
    o - dstOff
  }

  /** TIFF-variant LZW (compression 5): MSB-first bit packing, 9->12 bit
    * codes, Clear=256/EOI=257, libtiff "early change" width bump at
    * table size 2^width - 1. Returns bytes produced, -1 on malformed.
    */
  private def tiffLzwDecode(src: Array[Byte], off: Int, len: Int,
      dst: Array[Byte], dstOff: Int, dstMax: Int): Int = {
    val Clear = 256; val Eoi = 257; val MaxTable = 4096
    val prefix = new Array[Int](MaxTable)
    val suffix = new Array[Byte](MaxTable)
    val stack = new Array[Byte](MaxTable)
    var next = 258
    var width = 9
    var prev = -1
    var bitPos = 0
    val totalBits = len * 8
    var o = dstOff
    val oEnd = dstOff + dstMax
    var firstByte: Byte = 0
    def emit(code: Int): Boolean = {
      var sp = 0
      var c = code
      while (c >= 258) {
        if (sp >= MaxTable || c >= next) return false
        stack(sp) = suffix(c); sp += 1
        c = prefix(c)
      }
      if (c >= 256) return false
      firstByte = c.toByte
      if (o < oEnd) { dst(o) = c.toByte; o += 1 }
      while (sp > 0) {
        sp -= 1
        if (o < oEnd) { dst(o) = stack(sp); o += 1 }
      }
      true
    }
    while (bitPos + width <= totalBits && o < oEnd) {
      var code = 0
      var k = 0
      while (k < width) {
        val b = bitPos + k
        code = (code << 1) | ((src(off + (b >> 3)) >> (7 - (b & 7))) & 1)
        k += 1
      }
      bitPos += width
      if (code == Clear) { next = 258; width = 9; prev = -1 }
      else if (code == Eoi) return o - dstOff
      else if (prev == -1) {
        if (code >= 256) return -1
        if (!emit(code)) return -1
        prev = code
      } else {
        if (code > next) return -1
        if (code == next) {
          val saved = firstByte
          if (!emit(prev)) return -1
          if (o < oEnd) { dst(o) = saved; o += 1 }
          firstByte = saved
        } else if (!emit(code)) return -1
        if (next < MaxTable) {
          prefix(next) = prev
          suffix(next) = firstByte
          next += 1
          if (next == (1 << width) - 1 && width < 12) width += 1
        }
        prev = code
      }
    }
    o - dstOff
  }
}

object WavDecoder {

  final case class Pcm(sampleRate: Int, channels: Int, bits: Int, samples: Array[Float])

  /** PCM 8/16-bit decode to mono float samples in [-1, 1] (channels
    * averaged). Truncated `data` chunks decode the prefix that is present
    * — a byte-capped ingest still yields usable audio features.
    */
  def decode(bytes: Array[Byte]): Option[Pcm] = {
    if (bytes.length < 44 || bytes(0) != 'R' || bytes(1) != 'I' || bytes(2) != 'F' || bytes(3) != 'F')
      return None
    def u16(p: Int): Int = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
    def u32(p: Int): Long =
      (bytes(p) & 0xffL) | ((bytes(p + 1) & 0xffL) << 8) |
        ((bytes(p + 2) & 0xffL) << 16) | ((bytes(p + 3) & 0xffL) << 24)
    var sampleRate = 0; var channels = 0; var bits = 0; var fmt = 0
    var p = 12
    while (p + 8 <= bytes.length) {
      val id = new String(bytes, p, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = u32(p + 4)
      if (id == "fmt " && p + 24 <= bytes.length) {
        fmt = u16(p + 8)
        channels = u16(p + 10)
        sampleRate = u32(p + 12).toInt
        bits = u16(p + 22)
      } else if (id == "data") {
        if (fmt != 1 || channels < 1 || sampleRate <= 0 || (bits != 8 && bits != 16))
          return None
        val avail = math.min(size, (bytes.length - p - 8).toLong).toInt
        val bytesPerFrame = channels * bits / 8
        val nFrames = avail / bytesPerFrame
        val samples = new Array[Float](nFrames)
        var f = 0
        while (f < nFrames) {
          var acc = 0.0f
          var c = 0
          while (c < channels) {
            val s = p + 8 + f * bytesPerFrame + c * bits / 8
            val v =
              if (bits == 16) ((bytes(s) & 0xff) | (bytes(s + 1) << 8)).toShort / 32768.0f
              else ((bytes(s) & 0xff) - 128) / 128.0f
            acc += v
            c += 1
          }
          samples(f) = acc / channels
          f += 1
        }
        return Some(Pcm(sampleRate, channels, bits, samples))
      }
      val advance = size + (size & 1)
      if (advance <= 0 || advance > bytes.length.toLong) return None
      p += 8 + advance.toInt
      if (p < 0) return None
    }
    None
  }
}
