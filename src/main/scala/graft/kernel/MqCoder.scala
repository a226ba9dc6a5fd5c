package graft.kernel

/** The MQ arithmetic coder (ITU-T T.88 Annex E, shared with JPEG 2000):
  * a renormalizing binary coder over adaptive contexts, each context a
  * (state index, MPS sense) pair stepping through the published 47-row
  * probability table. Both directions live here so the corpus writer's
  * encoder and the extractor's decoder stay in lockstep — the same
  * discipline as the VP8 bool-coder pair (Vp8Decode/Vp8Writer).
  *
  * Context state packs into one byte: bit 0 = MPS, bits 1..6 = index.
  */
object MqCoder {

  // Qe / NMPS / NLPS / SWITCH — T.88 Table E.1 (identical in JPEG 2000)
  private[kernel] val Qe = Array(
    0x5601, 0x3401, 0x1801, 0x0AC1, 0x0521, 0x0221, 0x5601, 0x5401,
    0x4801, 0x3801, 0x3001, 0x2401, 0x1C01, 0x1601, 0x5601, 0x5401,
    0x5101, 0x4801, 0x3801, 0x3401, 0x3001, 0x2801, 0x2401, 0x2201,
    0x1C01, 0x1801, 0x1601, 0x1401, 0x1201, 0x1101, 0x0AC1, 0x09C1,
    0x08A1, 0x0521, 0x0441, 0x02A1, 0x0221, 0x0141, 0x0111, 0x0085,
    0x0049, 0x0025, 0x0015, 0x0009, 0x0005, 0x0001, 0x5601)
  private[kernel] val Nmps = Array(
    1, 2, 3, 4, 5, 38, 7, 8, 9, 10, 11, 12, 13, 29, 15, 16,
    17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32,
    33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 45, 46)
  private[kernel] val Nlps = Array(
    1, 6, 9, 12, 29, 33, 6, 14, 14, 14, 17, 18, 20, 21, 14, 14,
    15, 16, 17, 18, 19, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29,
    30, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 46)
  private[kernel] val Switch = Array(
    1, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 1, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)

  /** Decoder (E.3, software conventions). Bytes past the end read as
    * 0xFF, which the marker rule (B1 > 0x8F) turns into an endless
    * 1-bit feed — the spec's end-of-data behavior.
    */
  final class Dec(data: Array[Byte]) {
    private var bp = 0
    private var c = 0L
    private var a = 0
    private var ct = 0

    @inline private def byteAt(i: Int): Int =
      if (i < data.length) data(i) & 0xff else 0xff

    private def bytein(): Unit = {
      if (byteAt(bp) == 0xff) {
        if (byteAt(bp + 1) > 0x8f) { c += 0xff00; ct = 8 }
        else { bp += 1; c += byteAt(bp).toLong << 9; ct = 7 }
      } else { bp += 1; c += byteAt(bp).toLong << 8; ct = 8 }
    }

    // INITDEC
    c = byteAt(0).toLong << 16
    bytein()
    c <<= 7
    ct -= 7
    a = 0x8000

    /** Decode one bit in context `i` of the state table `cx`. */
    def decode(cx: Array[Byte], i: Int): Int = {
      var idx = (cx(i) >> 1) & 0x7f
      var mps = cx(i) & 1
      val qe = Qe(idx)
      a -= qe
      var d = 0
      if (((c >>> 16) & 0xffffL) < qe) {
        if (a < qe) { d = mps; idx = Nmps(idx) }
        else {
          d = 1 - mps
          if (Switch(idx) == 1) mps ^= 1
          idx = Nlps(idx)
        }
        a = qe
        cx(i) = ((idx << 1) | mps).toByte
        renorm()
      } else {
        c -= qe.toLong << 16
        if ((a & 0x8000) == 0) {
          if (a < qe) {
            d = 1 - mps
            if (Switch(idx) == 1) mps ^= 1
            idx = Nlps(idx)
          } else { d = mps; idx = Nmps(idx) }
          cx(i) = ((idx << 1) | mps).toByte
          renorm()
        } else d = mps
      }
      d
    }

    private def renorm(): Unit = {
      var go = true
      while (go) {
        if (ct == 0) bytein()
        a = (a << 1) & 0xffff
        c = (c << 1) & 0xffffffffL
        ct -= 1
        go = (a & 0x8000) == 0
      }
    }

    /** Arithmetic integer decoding (T.88 Annex A.2): returns the value,
      * or None for the out-of-band marker. The 9-bit tree context walks
      * `cx` exactly as the encoder's int().
      */
    def int(cx: Array[Byte]): Option[Int] = {
      var prev = 1
      def bit(): Int = {
        val b = decode(cx, prev)
        prev = if (prev < 256) (prev << 1) | b
        else ((((prev << 1) | b) & 511) | 256)
        b
      }
      val s = bit()
      var nBits = 2
      var base = 0
      if (bit() == 0) { nBits = 2; base = 0 }
      else if (bit() == 0) { nBits = 4; base = 4 }
      else if (bit() == 0) { nBits = 6; base = 20 }
      else if (bit() == 0) { nBits = 8; base = 84 }
      else if (bit() == 0) { nBits = 12; base = 340 }
      else { nBits = 32; base = 4436 }
      var v = 0L
      var i = 0
      while (i < nBits) { v = (v << 1) | bit(); i += 1 }
      val mag = v + base
      if (s == 1 && mag == 0) None // OOB
      else Some(if (s == 1) -mag.toInt else mag.toInt)
    }

    /** Symbol-ID decoding (A.3): `len` MSB-first tree-context bits. */
    def id(cx: Array[Byte], len: Int): Int = {
      var prev = 1
      var i = 0
      while (i < len) { prev = (prev << 1) | decode(cx, prev); i += 1 }
      prev - (1 << len)
    }
  }

  /** Encoder (E.2). flush() finalizes per SETBITS + two BYTEOUTs and
    * returns the stream; the instance is spent afterwards.
    */
  final class Enc {
    private val buf = scala.collection.mutable.ArrayBuffer[Int]()
    private var c = 0L
    private var a = 0x8000
    private var ct = 12

    def encode(cx: Array[Byte], i: Int, bit: Int): Unit = {
      var idx = (cx(i) >> 1) & 0x7f
      var mps = cx(i) & 1
      val qe = Qe(idx)
      if (bit == mps) { // CODEMPS
        a -= qe
        if ((a & 0x8000) == 0) {
          if (a < qe) a = qe else c += qe
          idx = Nmps(idx)
          cx(i) = ((idx << 1) | mps).toByte
          renorme()
        } else c += qe
      } else { // CODELPS
        a -= qe
        if (a < qe) c += qe else a = qe
        if (Switch(idx) == 1) mps ^= 1
        idx = Nlps(idx)
        cx(i) = ((idx << 1) | mps).toByte
        renorme()
      }
    }

    private def renorme(): Unit = {
      var go = true
      while (go) {
        if (ct == 0) byteout()
        a = (a << 1) & 0xffff
        c <<= 1
        ct -= 1
        go = (a & 0x8000) == 0
      }
    }

    private def byteout(): Unit = {
      if (buf.nonEmpty && buf.last == 0xff) stuff()
      else {
        if (c >= 0x8000000L) { // carry into the previous byte
          if (buf.nonEmpty) {
            buf(buf.length - 1) += 1
            if (buf.last == 0xff) { c &= 0x7ffffffL; stuff(); return }
          }
          c &= 0x7ffffffL
        }
        buf += ((c >> 19) & 0xff).toInt
        c &= 0x7ffffL
        ct = 8
      }
    }

    private def stuff(): Unit = {
      buf += ((c >> 20) & 0xff).toInt
      c &= 0xfffffL
      ct = 7
    }

    /** Arithmetic integer encoding (T.88 Annex A.2, inverse of Dec.int):
      * sign + range-prefix + offset bits through the tree-context `cx`.
      * `oob` encodes the out-of-band marker (sign 1, value 0).
      */
    def int(cx: Array[Byte], v: Int, oob: Boolean = false): Unit = {
      var prev = 1
      def bit(b: Int): Unit = {
        encode(cx, prev, b)
        prev = if (prev < 256) (prev << 1) | b
        else ((((prev << 1) | b) & 511) | 256)
      }
      val s = if (oob) 1 else if (v < 0) 1 else 0
      val mag = if (oob) 0 else math.abs(v)
      bit(s)
      val (prefixOnes, nBits, base) =
        if (mag < 4) (0, 2, 0)
        else if (mag < 20) (1, 4, 4)
        else if (mag < 84) (2, 6, 20)
        else if (mag < 340) (3, 8, 84)
        else if (mag < 4436) (4, 12, 340)
        else (5, 32, 4436)
      var i = 0
      while (i < prefixOnes) { bit(1); i += 1 }
      if (prefixOnes < 5) bit(0)
      val off = mag - base
      i = nBits - 1
      while (i >= 0) { bit((off >> i) & 1); i -= 1 }
    }

    /** Symbol-ID encoding (A.3): `len` MSB-first bits via tree context. */
    def id(cx: Array[Byte], value: Int, len: Int): Unit = {
      var prev = 1
      var i = len - 1
      while (i >= 0) {
        val b = (value >> i) & 1
        encode(cx, prev, b)
        prev = (prev << 1) | b
        i -= 1
      }
    }

    def flush(): Array[Byte] = {
      // SETBITS: saturate the low bits inside the final interval
      val tempc = c + a - 1
      c |= 0xffffL
      if (c >= tempc) c -= 0x8000L
      c <<= ct
      byteout()
      c <<= ct
      byteout()
      buf.map(_.toByte).toArray
    }
  }
}
