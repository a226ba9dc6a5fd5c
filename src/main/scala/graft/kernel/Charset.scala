package graft.kernel

import java.nio.charset.StandardCharsets

/** D2 — charset detection, from scratch.
  *
  * Observable reference contract: detected charset rides inside
  * Content-Type, e.g. `text/plain; charset=UTF-8` vs `ISO-8859-1`
  * (spec/rika/parser_spec.rb:225-227, README.md:245-247).
  *
  * Policy (deterministic, documented):
  *   1. BOM (UTF-8 / UTF-16LE / UTF-16BE) wins.
  *   2. BOM-less UTF-16 (the Windows-export shape): mostly-Latin UTF-16
  *      text is a NUL every other byte — ≥35% NULs confined to one
  *      byte parity (<2% on the other) is decisive, and must run
  *      BEFORE UTF-8 validation because interleaved NULs are
  *      technically valid UTF-8 (U+0000) and would decode as garbage.
  *      NUL parity picks the order: odd = LE ("H\0"), even = BE.
  *   3. Strict UTF-8 validation over the whole payload — valid ⇒ UTF-8
  *      (pure ASCII counts as UTF-8).
  *   4. Fallback ISO-8859-1 (every byte maps; mirrors the reference's
  *      observed latin-1 outcomes).
  */
object Charset {

  final case class Detected(name: String, decoded: String)

  def detect(bytes: Array[Byte]): Detected = {
    if (bytes == null || bytes.isEmpty) return Detected("UTF-8", "")
    if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xef &&
        (bytes(1) & 0xff) == 0xbb && (bytes(2) & 0xff) == 0xbf)
      return Detected("UTF-8",
        new String(bytes, 3, bytes.length - 3, StandardCharsets.UTF_8))
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xfe)
      return Detected("UTF-16LE",
        new String(bytes, 2, bytes.length - 2, StandardCharsets.UTF_16LE))
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xfe && (bytes(1) & 0xff) == 0xff)
      return Detected("UTF-16BE",
        new String(bytes, 2, bytes.length - 2, StandardCharsets.UTF_16BE))
    if (bytes.length >= 8) {
      // BOM-less UTF-16: census NULs per byte parity over a bounded window
      val n = math.min(bytes.length & ~1, 4096)
      var nulEven = 0
      var nulOdd = 0
      var i = 0
      while (i < n) {
        if (bytes(i) == 0) { if ((i & 1) == 0) nulEven += 1 else nulOdd += 1 }
        i += 1
      }
      val half = n / 2
      if (nulOdd * 100 >= half * 35 && nulEven * 100 < half * 2)
        return Detected("UTF-16LE", new String(bytes, StandardCharsets.UTF_16LE))
      if (nulEven * 100 >= half * 35 && nulOdd * 100 < half * 2)
        return Detected("UTF-16BE", new String(bytes, StandardCharsets.UTF_16BE))
    }
    if (isValidUtf8(bytes, bytes.length))
      Detected("UTF-8", new String(bytes, StandardCharsets.UTF_8))
    else
      Detected("ISO-8859-1", new String(bytes, StandardCharsets.ISO_8859_1))
  }

  /** Strict UTF-8 state machine over bytes[0, n). */
  def isValidUtf8(bytes: Array[Byte], n: Int): Boolean = {
    var i = 0
    while (i < n) {
      val b0 = bytes(i) & 0xff
      if (b0 < 0x80) { i += 1 }
      else if (b0 >= 0xc2 && b0 <= 0xdf) {
        if (i + 1 >= n || !isCont(bytes(i + 1))) return false
        i += 2
      } else if (b0 == 0xe0) {
        if (i + 2 >= n || (bytes(i + 1) & 0xff) < 0xa0 ||
            (bytes(i + 1) & 0xff) > 0xbf || !isCont(bytes(i + 2))) return false
        i += 3
      } else if (b0 >= 0xe1 && b0 <= 0xec) {
        if (i + 2 >= n || !isCont(bytes(i + 1)) || !isCont(bytes(i + 2))) return false
        i += 3
      } else if (b0 == 0xed) {
        if (i + 2 >= n || (bytes(i + 1) & 0xff) < 0x80 ||
            (bytes(i + 1) & 0xff) > 0x9f || !isCont(bytes(i + 2))) return false
        i += 3
      } else if (b0 >= 0xee && b0 <= 0xef) {
        if (i + 2 >= n || !isCont(bytes(i + 1)) || !isCont(bytes(i + 2))) return false
        i += 3
      } else if (b0 == 0xf0) {
        if (i + 3 >= n || (bytes(i + 1) & 0xff) < 0x90 ||
            (bytes(i + 1) & 0xff) > 0xbf || !isCont(bytes(i + 2)) ||
            !isCont(bytes(i + 3))) return false
        i += 4
      } else if (b0 >= 0xf1 && b0 <= 0xf3) {
        if (i + 3 >= n || !isCont(bytes(i + 1)) || !isCont(bytes(i + 2)) ||
            !isCont(bytes(i + 3))) return false
        i += 4
      } else if (b0 == 0xf4) {
        if (i + 3 >= n || (bytes(i + 1) & 0xff) < 0x80 ||
            (bytes(i + 1) & 0xff) > 0x8f || !isCont(bytes(i + 2)) ||
            !isCont(bytes(i + 3))) return false
        i += 4
      } else return false
    }
    true
  }

  @inline private def isCont(b: Byte): Boolean = (b & 0xc0) == 0x80
}
