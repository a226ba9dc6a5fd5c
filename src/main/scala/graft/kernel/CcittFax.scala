package graft.kernel

/** CCITT Group 3 / Group 4 fax codec (ITU-T T.4 / T.6) — the
  * compression scanned PDFs use for page images (PDF CCITTFaxDecode,
  * ISO 32000 §7.4.6; the reference reaches it through its delegate
  * parser stack, /root/reference/README.md:3-8).
  *
  * Decode supports the three PDF K regimes:
  *   K < 0  — pure 2-D (Group 4 / MMR): vertical, horizontal and pass
  *            modes against the reference line, no EOLs;
  *   K = 0  — pure 1-D (Group 3 MH): modified-Huffman white/black run
  *            codes per row, optional EOLs tolerated;
  *   K > 0  — mixed 2-D (Group 3 2-D): each row prefixed by EOL + a
  *            1-bit mode flag selecting 1-D or 2-D coding.
  * EncodedByteAlign starts each coded row on a byte boundary; BlackIs1
  * selects the output polarity (PDF default false = black pixels are
  * 0 bits). Rows pack MSB-first at 1 bit/pixel, stride ceil(cols/8).
  *
  * The encoder is the corpus writer's side of the pair and emits all
  * three regimes; encoder and decoder share the code tables, and the
  * streams are additionally cross-validated against system libtiff
  * (tools/ccitt_conformance.py), so the pair is conformant, not merely
  * self-consistent. Malformed input -> None, never a throw.
  */
object CcittFax {

  // ------------------------------------------------- T.4 MH code tables
  // (run, code-bits-as-string-of-01, ...) flattened to (run, code, len).
  // Terminating codes 0..63, then makeup 64..1728 per color, then the
  // extended makeup 1792..2560 shared by both colors.
  private val WhiteCodes: Array[(Int, Int, Int)] = Array(
    (0, Integer.parseInt("00110101", 2), 8), (1, Integer.parseInt("000111", 2), 6),
    (2, Integer.parseInt("0111", 2), 4), (3, Integer.parseInt("1000", 2), 4),
    (4, Integer.parseInt("1011", 2), 4), (5, Integer.parseInt("1100", 2), 4),
    (6, Integer.parseInt("1110", 2), 4), (7, Integer.parseInt("1111", 2), 4),
    (8, Integer.parseInt("10011", 2), 5), (9, Integer.parseInt("10100", 2), 5),
    (10, Integer.parseInt("00111", 2), 5), (11, Integer.parseInt("01000", 2), 5),
    (12, Integer.parseInt("001000", 2), 6), (13, Integer.parseInt("000011", 2), 6),
    (14, Integer.parseInt("110100", 2), 6), (15, Integer.parseInt("110101", 2), 6),
    (16, Integer.parseInt("101010", 2), 6), (17, Integer.parseInt("101011", 2), 6),
    (18, Integer.parseInt("0100111", 2), 7), (19, Integer.parseInt("0001100", 2), 7),
    (20, Integer.parseInt("0001000", 2), 7), (21, Integer.parseInt("0010111", 2), 7),
    (22, Integer.parseInt("0000011", 2), 7), (23, Integer.parseInt("0000100", 2), 7),
    (24, Integer.parseInt("0101000", 2), 7), (25, Integer.parseInt("0101011", 2), 7),
    (26, Integer.parseInt("0010011", 2), 7), (27, Integer.parseInt("0100100", 2), 7),
    (28, Integer.parseInt("0011000", 2), 7), (29, Integer.parseInt("00000010", 2), 8),
    (30, Integer.parseInt("00000011", 2), 8), (31, Integer.parseInt("00011010", 2), 8),
    (32, Integer.parseInt("00011011", 2), 8), (33, Integer.parseInt("00010010", 2), 8),
    (34, Integer.parseInt("00010011", 2), 8), (35, Integer.parseInt("00010100", 2), 8),
    (36, Integer.parseInt("00010101", 2), 8), (37, Integer.parseInt("00010110", 2), 8),
    (38, Integer.parseInt("00010111", 2), 8), (39, Integer.parseInt("00101000", 2), 8),
    (40, Integer.parseInt("00101001", 2), 8), (41, Integer.parseInt("00101010", 2), 8),
    (42, Integer.parseInt("00101011", 2), 8), (43, Integer.parseInt("00101100", 2), 8),
    (44, Integer.parseInt("00101101", 2), 8), (45, Integer.parseInt("00000100", 2), 8),
    (46, Integer.parseInt("00000101", 2), 8), (47, Integer.parseInt("00001010", 2), 8),
    (48, Integer.parseInt("00001011", 2), 8), (49, Integer.parseInt("01010010", 2), 8),
    (50, Integer.parseInt("01010011", 2), 8), (51, Integer.parseInt("01010100", 2), 8),
    (52, Integer.parseInt("01010101", 2), 8), (53, Integer.parseInt("00100100", 2), 8),
    (54, Integer.parseInt("00100101", 2), 8), (55, Integer.parseInt("01011000", 2), 8),
    (56, Integer.parseInt("01011001", 2), 8), (57, Integer.parseInt("01011010", 2), 8),
    (58, Integer.parseInt("01011011", 2), 8), (59, Integer.parseInt("01001010", 2), 8),
    (60, Integer.parseInt("01001011", 2), 8), (61, Integer.parseInt("00110010", 2), 8),
    (62, Integer.parseInt("00110011", 2), 8), (63, Integer.parseInt("00110100", 2), 8),
    (64, Integer.parseInt("11011", 2), 5), (128, Integer.parseInt("10010", 2), 5),
    (192, Integer.parseInt("010111", 2), 6), (256, Integer.parseInt("0110111", 2), 7),
    (320, Integer.parseInt("00110110", 2), 8), (384, Integer.parseInt("00110111", 2), 8),
    (448, Integer.parseInt("01100100", 2), 8), (512, Integer.parseInt("01100101", 2), 8),
    (576, Integer.parseInt("01101000", 2), 8), (640, Integer.parseInt("01100111", 2), 8),
    (704, Integer.parseInt("011001100", 2), 9), (768, Integer.parseInt("011001101", 2), 9),
    (832, Integer.parseInt("011010010", 2), 9), (896, Integer.parseInt("011010011", 2), 9),
    (960, Integer.parseInt("011010100", 2), 9), (1024, Integer.parseInt("011010101", 2), 9),
    (1088, Integer.parseInt("011010110", 2), 9), (1152, Integer.parseInt("011010111", 2), 9),
    (1216, Integer.parseInt("011011000", 2), 9), (1280, Integer.parseInt("011011001", 2), 9),
    (1344, Integer.parseInt("011011010", 2), 9), (1408, Integer.parseInt("011011011", 2), 9),
    (1472, Integer.parseInt("010011000", 2), 9), (1536, Integer.parseInt("010011001", 2), 9),
    (1600, Integer.parseInt("010011010", 2), 9), (1664, Integer.parseInt("011000", 2), 6),
    (1728, Integer.parseInt("010011011", 2), 9))

  private val BlackCodes: Array[(Int, Int, Int)] = Array(
    (0, Integer.parseInt("0000110111", 2), 10), (1, Integer.parseInt("010", 2), 3),
    (2, Integer.parseInt("11", 2), 2), (3, Integer.parseInt("10", 2), 2),
    (4, Integer.parseInt("011", 2), 3), (5, Integer.parseInt("0011", 2), 4),
    (6, Integer.parseInt("0010", 2), 4), (7, Integer.parseInt("00011", 2), 5),
    (8, Integer.parseInt("000101", 2), 6), (9, Integer.parseInt("000100", 2), 6),
    (10, Integer.parseInt("0000100", 2), 7), (11, Integer.parseInt("0000101", 2), 7),
    (12, Integer.parseInt("0000111", 2), 7), (13, Integer.parseInt("00000100", 2), 8),
    (14, Integer.parseInt("00000111", 2), 8), (15, Integer.parseInt("000011000", 2), 9),
    (16, Integer.parseInt("0000010111", 2), 10), (17, Integer.parseInt("0000011000", 2), 10),
    (18, Integer.parseInt("0000001000", 2), 10), (19, Integer.parseInt("00001100111", 2), 11),
    (20, Integer.parseInt("00001101000", 2), 11), (21, Integer.parseInt("00001101100", 2), 11),
    (22, Integer.parseInt("00000110111", 2), 11), (23, Integer.parseInt("00000101000", 2), 11),
    (24, Integer.parseInt("00000010111", 2), 11), (25, Integer.parseInt("00000011000", 2), 11),
    (26, Integer.parseInt("000011001010", 2), 12), (27, Integer.parseInt("000011001011", 2), 12),
    (28, Integer.parseInt("000011001100", 2), 12), (29, Integer.parseInt("000011001101", 2), 12),
    (30, Integer.parseInt("000001101000", 2), 12), (31, Integer.parseInt("000001101001", 2), 12),
    (32, Integer.parseInt("000001101010", 2), 12), (33, Integer.parseInt("000001101011", 2), 12),
    (34, Integer.parseInt("000011010010", 2), 12), (35, Integer.parseInt("000011010011", 2), 12),
    (36, Integer.parseInt("000011010100", 2), 12), (37, Integer.parseInt("000011010101", 2), 12),
    (38, Integer.parseInt("000011010110", 2), 12), (39, Integer.parseInt("000011010111", 2), 12),
    (40, Integer.parseInt("000001101100", 2), 12), (41, Integer.parseInt("000001101101", 2), 12),
    (42, Integer.parseInt("000011011010", 2), 12), (43, Integer.parseInt("000011011011", 2), 12),
    (44, Integer.parseInt("000001010100", 2), 12), (45, Integer.parseInt("000001010101", 2), 12),
    (46, Integer.parseInt("000001010110", 2), 12), (47, Integer.parseInt("000001010111", 2), 12),
    (48, Integer.parseInt("000001100100", 2), 12), (49, Integer.parseInt("000001100101", 2), 12),
    (50, Integer.parseInt("000001010010", 2), 12), (51, Integer.parseInt("000001010011", 2), 12),
    (52, Integer.parseInt("000000100100", 2), 12), (53, Integer.parseInt("000000110111", 2), 12),
    (54, Integer.parseInt("000000111000", 2), 12), (55, Integer.parseInt("000000100111", 2), 12),
    (56, Integer.parseInt("000000101000", 2), 12), (57, Integer.parseInt("000001011000", 2), 12),
    (58, Integer.parseInt("000001011001", 2), 12), (59, Integer.parseInt("000000101011", 2), 12),
    (60, Integer.parseInt("000000101100", 2), 12), (61, Integer.parseInt("000001011010", 2), 12),
    (62, Integer.parseInt("000001100110", 2), 12), (63, Integer.parseInt("000001100111", 2), 12),
    (64, Integer.parseInt("0000001111", 2), 10), (128, Integer.parseInt("000011001000", 2), 12),
    (192, Integer.parseInt("000011001001", 2), 12), (256, Integer.parseInt("000001011011", 2), 12),
    (320, Integer.parseInt("000000110011", 2), 12), (384, Integer.parseInt("000000110100", 2), 12),
    (448, Integer.parseInt("000000110101", 2), 12), (512, Integer.parseInt("0000001101100", 2), 13),
    (576, Integer.parseInt("0000001101101", 2), 13), (640, Integer.parseInt("0000001001010", 2), 13),
    (704, Integer.parseInt("0000001001011", 2), 13), (768, Integer.parseInt("0000001001100", 2), 13),
    (832, Integer.parseInt("0000001001101", 2), 13), (896, Integer.parseInt("0000001110010", 2), 13),
    (960, Integer.parseInt("0000001110011", 2), 13), (1024, Integer.parseInt("0000001110100", 2), 13),
    (1088, Integer.parseInt("0000001110101", 2), 13), (1152, Integer.parseInt("0000001110110", 2), 13),
    (1216, Integer.parseInt("0000001110111", 2), 13), (1280, Integer.parseInt("0000001010010", 2), 13),
    (1344, Integer.parseInt("0000001010011", 2), 13), (1408, Integer.parseInt("0000001010100", 2), 13),
    (1472, Integer.parseInt("0000001010101", 2), 13), (1536, Integer.parseInt("0000001011010", 2), 13),
    (1600, Integer.parseInt("0000001011011", 2), 13), (1664, Integer.parseInt("0000001100100", 2), 13),
    (1728, Integer.parseInt("0000001100101", 2), 13))

  /** Extended makeup codes 1792..2560, shared by both colors (T.4 §2). */
  private val ExtCodes: Array[(Int, Int, Int)] = Array(
    (1792, Integer.parseInt("00000001000", 2), 11), (1856, Integer.parseInt("00000001100", 2), 11),
    (1920, Integer.parseInt("00000001101", 2), 11), (1984, Integer.parseInt("000000010010", 2), 12),
    (2048, Integer.parseInt("000000010011", 2), 12), (2112, Integer.parseInt("000000010100", 2), 12),
    (2176, Integer.parseInt("000000010101", 2), 12), (2240, Integer.parseInt("000000010110", 2), 12),
    (2304, Integer.parseInt("000000010111", 2), 12), (2368, Integer.parseInt("000000011100", 2), 12),
    (2432, Integer.parseInt("000000011101", 2), 12), (2496, Integer.parseInt("000000011110", 2), 12),
    (2560, Integer.parseInt("000000011111", 2), 12))

  private val WhiteDecode: Map[(Int, Int), Int] =
    (WhiteCodes ++ ExtCodes).map { case (r, c, l) => (c, l) -> r }.toMap
  private val BlackDecode: Map[(Int, Int), Int] =
    (BlackCodes ++ ExtCodes).map { case (r, c, l) => (c, l) -> r }.toMap
  private val WhiteEncode: Map[Int, (Int, Int)] =
    (WhiteCodes ++ ExtCodes).map { case (r, c, l) => r -> (c, l) }.toMap
  private val BlackEncode: Map[Int, (Int, Int)] =
    (BlackCodes ++ ExtCodes).map { case (r, c, l) => r -> (c, l) }.toMap

  // --------------------------------------------------------- bit reader
  private final class BitRd(data: Array[Byte]) {
    var pos = 0
    var overflow = false
    private val nBits = data.length * 8
    def bit(): Int =
      if (pos >= nBits) { overflow = true; 0 }
      else { val b = (data(pos >> 3) >> (7 - (pos & 7))) & 1; pos += 1; b }
    def alignByte(): Unit = pos = (pos + 7) & ~7
    def exhausted: Boolean = pos >= nBits
    /** True iff the only bits left are zero-padding (< 8 of them). */
    def atPaddedEnd: Boolean = {
      if (pos >= nBits) return true
      if (nBits - pos >= 8) return false
      var p = pos
      while (p < nBits && ((data(p >> 3) >> (7 - (p & 7))) & 1) == 0) p += 1
      p >= nBits
    }
  }

  private final class BitWr {
    private val out = new java.io.ByteArrayOutputStream()
    private var buf = 0
    private var cnt = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        buf = (buf << 1) | ((code >> i) & 1)
        cnt += 1
        if (cnt == 8) { out.write(buf); buf = 0; cnt = 0 }
        i -= 1
      }
    }
    def alignByte(): Unit = if (cnt > 0) { buf <<= (8 - cnt); out.write(buf); buf = 0; cnt = 0 }
    def bytes(): Array[Byte] = { alignByte(); out.toByteArray }
  }

  /** One MH run of the given color: makeup codes (>= 64, repeatable per
    * T.4's extended table) accumulate until a terminating code (< 64).
    */
  private def readRun(br: BitRd, white: Boolean): Int = {
    val table = if (white) WhiteDecode else BlackDecode
    var total = 0
    var guard = 0
    while (guard < 64) {
      var code = 0
      var len = 0
      var run = -1
      while (run < 0 && len < 14) {
        code = (code << 1) | br.bit()
        len += 1
        if (br.overflow) return -1
        run = table.getOrElse((code, len), -1)
      }
      if (run < 0) return -1
      total += run
      if (run < 64) return total // terminating code ends the run
      guard += 1
    }
    -1
  }

  private def writeRun(bw: BitWr, run0: Int, white: Boolean): Unit = {
    val table = if (white) WhiteEncode else BlackEncode
    var run = run0
    while (run >= 2624) { val (c, l) = table(2560); bw.put(c, l); run -= 2560 }
    if (run >= 64) {
      val makeup = (run / 64) * 64
      val (c, l) = table(makeup)
      bw.put(c, l)
      run -= makeup
    }
    val (c, l) = table(run)
    bw.put(c, l)
  }

  private val Eol = (1, 12) // 000000000001

  /** Skip an EOL (with optional fill zeros) if one is next; returns true
    * if an EOL was consumed.
    */
  private def tryEol(br: BitRd): Boolean = {
    val save = br.pos
    var zeros = 0
    while (zeros < 64 && !br.overflow) {
      val b = br.bit()
      if (b == 1) {
        if (zeros >= 11) return true // EOL = >= 11 zeros then a one
        br.pos = save; return false
      }
      zeros += 1
    }
    br.pos = save
    false
  }

  // ----------------------------------------------------------- decoding

  /** Decode to 1-bit/pixel packed rows (MSB-first, stride ceil(cols/8)).
    * rows <= 0 decodes until the data runs out. Returns (pixels, rows).
    */
  def decode(data: Array[Byte], k: Int, columns: Int, rows: Int,
      blackIs1: Boolean, byteAlign: Boolean): Option[(Array[Byte], Int)] = {
    if (columns <= 0 || columns > (1 << 16) || data.isEmpty) return None
    val maxRows = if (rows > 0) rows else (1 << 20) / math.max(1, (columns + 7) / 8)
    val br = new BitRd(data)
    val stride = (columns + 7) / 8
    val out = new java.io.ByteArrayOutputStream()
    // reference line as changing-element positions (all-white initially)
    var ref: Array[Int] = Array.empty
    var nRows = 0
    var done = false
    while (!done && nRows < maxRows) {
      if (byteAlign) br.alignByte()
      val twoD = k match {
        case kk if kk < 0 => true // G4: no EOLs, always 2-D
        case 0 => // G3 1-D: EOLs optional
          tryEol(br); false
        case _ => // G3 2-D: EOL + 1-bit mode flag (1 = 1-D row)
          if (!tryEol(br)) { done = true; false }
          else br.bit() == 0
      }
      if (!done && k == 0 && br.atPaddedEnd && rows <= 0) done = true
      if (!done) {
        val cur = if (twoD) decodeRow2d(br, ref, columns) else decodeRow1d(br, columns)
        cur match {
          case None =>
            // rows known: a failed row is an error; unknown: treat as end
            if (rows > 0 && nRows < rows) return None
            done = true
          case Some(transitions) =>
            out.write(packRow(transitions, columns, stride))
            ref = transitions
            nRows += 1
            if (rows <= 0 && br.atPaddedEnd) done = true
        }
      }
    }
    if (rows > 0 && nRows < rows) return None
    val pixels = out.toByteArray
    if (!blackIs1) { // PDF default: black pixels are 0 bits
      var i = 0
      while (i < pixels.length) { pixels(i) = (~pixels(i)).toByte; i += 1 }
    }
    Some((pixels, nRows))
  }

  /** 1-D MH row -> changing-element positions (alternating, first = a
    * white->black transition).
    */
  private def decodeRow1d(br: BitRd, columns: Int): Option[Array[Int]] = {
    val tr = Vector.newBuilder[Int]
    var pos = 0
    var white = true
    var n = 0
    while (pos < columns) {
      val run = readRun(br, white)
      if (run < 0) return None
      pos += run
      if (pos > columns) return None
      if (pos < columns || !white) tr += math.min(pos, columns)
      if (pos == columns && white) () // trailing white run ends the row
      white = !white
      n += 1
      if (n > 2 * columns + 2) return None
    }
    Some(dedupTransitions(tr.result(), columns))
  }

  /** 2-D (MMR) row against the reference line's changing elements. */
  private def decodeRow2d(br: BitRd, ref: Array[Int], columns: Int): Option[Array[Int]] = {
    val tr = Vector.newBuilder[Int]
    var a0 = -1
    var white = true
    var guard = 0
    while (a0 < columns && guard <= 2 * columns + 16) {
      guard += 1
      // b1: first ref transition > a0 whose parity matches the current
      // color (even index = white->black); b2: the one after it
      var bi = 0
      while (bi < ref.length && (ref(bi) <= a0 || ((bi & 1) == 0) != white)) bi += 1
      val b1 = if (bi < ref.length) ref(bi) else columns
      val b2 = if (bi + 1 < ref.length) ref(bi + 1) else columns
      // mode code
      if (br.bit() == 1) { // V0
        tr += b1; a0 = b1; white = !white
      } else if (br.bit() == 1) { // 01x: VR1 / VL1
        if (br.bit() == 1) { tr += b1 + 1; a0 = b1 + 1 } // 011 VR1
        else { tr += b1 - 1; a0 = b1 - 1 }               // 010 VL1
        white = !white
      } else if (br.bit() == 1) { // 001: horizontal — two MH runs
        val start = math.max(a0, 0)
        val r1 = readRun(br, white)
        if (r1 < 0) return None
        val r2 = readRun(br, !white)
        if (r2 < 0) return None
        tr += start + r1
        tr += start + r1 + r2
        a0 = start + r1 + r2
      } else if (br.bit() == 1) { // 0001: pass
        a0 = b2
      } else { // 00001xx / 000001xx: VR2/VL2 / VR3/VL3 (or EOFB garbage)
        if (br.bit() == 1) {
          if (br.bit() == 1) { tr += b1 + 2; a0 = b1 + 2 } // 000011 VR2
          else { tr += b1 - 2; a0 = b1 - 2 }               // 000010 VL2
          white = !white
        } else if (br.bit() == 1) {
          if (br.bit() == 1) { tr += b1 + 3; a0 = b1 + 3 } // 0000011 VR3
          else { tr += b1 - 3; a0 = b1 - 3 }               // 0000010 VL3
          white = !white
        } else return None // EOFB or invalid
      }
      if (br.overflow) return None
      if (a0 > columns) return None
    }
    if (a0 < columns) return None
    Some(dedupTransitions(tr.result().map(p => math.min(math.max(p, 0), columns)), columns))
  }

  /** Transitions must be non-decreasing and capped; drop the trailing
    * sentinel at `columns` (row end is implicit).
    */
  private def dedupTransitions(tr: Vector[Int], columns: Int): Array[Int] =
    tr.takeWhile(_ < columns).toArray

  private def packRow(transitions: Array[Int], columns: Int, stride: Int): Array[Byte] = {
    val row = new Array[Byte](stride)
    // transitions alternate: even index starts BLACK, odd returns to white
    var i = 0
    while (i + 1 <= transitions.length) {
      val start = transitions(i)
      val end = if (i + 1 < transitions.length) transitions(i + 1) else columns
      var x = start
      while (x < end) { row(x >> 3) = (row(x >> 3) | (0x80 >> (x & 7))).toByte; x += 1 }
      i += 2
    }
    row
  }

  // ----------------------------------------------------------- encoding

  /** Changing-element positions of a packed (1 = black) row. */
  private def transitionsOf(packed: Array[Byte], off: Int, columns: Int): Array[Int] = {
    val tr = Vector.newBuilder[Int]
    var prev = 0 // white
    var x = 0
    while (x < columns) {
      val bit = (packed(off + (x >> 3)) >> (7 - (x & 7))) & 1
      if (bit != prev) { tr += x; prev = bit }
      x += 1
    }
    tr.result().toArray
  }

  /** Encode packed 1-bpp rows (1 = black) in one of the PDF K regimes.
    * byteAlign pads each coded row to a byte boundary.
    */
  def encode(packed: Array[Byte], columns: Int, rows: Int, k: Int,
      byteAlign: Boolean): Array[Byte] = {
    val stride = (columns + 7) / 8
    require(packed.length >= stride * rows, "short pixel buffer")
    val bw = new BitWr()
    var ref: Array[Int] = Array.empty
    var y = 0
    while (y < rows) {
      if (byteAlign) bw.alignByte()
      val cur = transitionsOf(packed, y * stride, columns)
      if (k < 0) encodeRow2d(bw, cur, ref, columns)
      else if (k == 0) { bw.put(Eol._1, Eol._2); encodeRow1d(bw, cur, columns) }
      else {
        bw.put(Eol._1, Eol._2)
        // alternate 1-D and 2-D rows (2-D only after a 1-D reference)
        if (y % 2 == 0) { bw.put(1, 1); encodeRow1d(bw, cur, columns) }
        else { bw.put(0, 1); encodeRow2d(bw, cur, ref, columns) }
      }
      ref = cur
      y += 1
    }
    bw.bytes()
  }

  private def encodeRow1d(bw: BitWr, tr: Array[Int], columns: Int): Unit = {
    var pos = 0
    var white = true
    var i = 0
    while (pos < columns) {
      val next = if (i < tr.length) tr(i) else columns
      writeRun(bw, next - pos, white)
      pos = next
      white = !white
      i += 1
    }
    if (tr.nonEmpty && tr.length % 2 == 1 && tr.last == columns) () // black to edge
    // a row ending black needs the final zero-length white run? No: T.4
    // rows end when the pixel count is reached; nothing more is emitted.
  }

  private def encodeRow2d(bw: BitWr, cur: Array[Int], ref: Array[Int], columns: Int): Unit = {
    var a0 = -1
    var white = true
    var ci = 0 // index of the next coding transition > a0 (parity = color)
    var break = false
    while (!break) {
      while (ci < cur.length && cur(ci) <= a0) ci += 1
      val a1 = if (ci < cur.length) cur(ci) else columns
      var bi = 0
      while (bi < ref.length && (ref(bi) <= a0 || ((bi & 1) == 0) != white)) bi += 1
      val b1 = if (bi < ref.length) ref(bi) else columns
      val b2 = if (bi + 1 < ref.length) ref(bi + 1) else columns
      if (b2 < a1) {
        bw.put(1, 4) // pass: 0001
        a0 = b2
      } else if (math.abs(a1 - b1) <= 3) {
        (a1 - b1) match {
          case 0  => bw.put(1, 1)                 // V0: 1
          case 1  => bw.put(Integer.parseInt("011", 2), 3)
          case 2  => bw.put(Integer.parseInt("000011", 2), 6)
          case 3  => bw.put(Integer.parseInt("0000011", 2), 7)
          case -1 => bw.put(Integer.parseInt("010", 2), 3)
          case -2 => bw.put(Integer.parseInt("000010", 2), 6)
          case _  => bw.put(Integer.parseInt("0000010", 2), 7) // -3
        }
        a0 = a1
        white = !white
        if (a0 >= columns) break = true
      } else {
        // horizontal: 001 + run(color a0..a1) + run(opposite a1..a2)
        val a2 = if (ci + 1 < cur.length) cur(ci + 1) else columns
        bw.put(1, 3)
        val start = math.max(a0, 0)
        writeRun(bw, a1 - start, white)
        writeRun(bw, a2 - a1, !white)
        a0 = a2
        if (a0 >= columns) break = true
      }
      if (a0 >= columns) break = true
    }
  }
}
