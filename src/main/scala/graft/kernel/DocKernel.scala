package graft.kernel

/** E5 - legacy Word (.doc) extractor: CFB/OLE2 sector+FAT walk, FIB text
  * range, from scratch. Minimal by design: the reference's specs pin only
  * detection (content type `application/msword` or
  * `application/x-tika-msoffice`, spec/rika/parser_spec.rb:240-243) and
  * best-effort text, with no content assertion.
  */
object DocKernel {

  final case class Result(text: String, isWord: Boolean)

  private val FreeSect = 0xffffffffL
  private val EndChain = 0xfffffffeL

  def extract(bytes: Array[Byte]): Result = {
    if (bytes.length < 512) return Result("", isWord = false)
    def u16(p: Int): Int = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
    def u32(p: Int): Long =
      (bytes(p) & 0xffL) | ((bytes(p + 1) & 0xffL) << 8) |
        ((bytes(p + 2) & 0xffL) << 16) | ((bytes(p + 3) & 0xffL) << 24)

    val sectorSize = 1 << u16(30)
    if (sectorSize < 128 || sectorSize > 4096) return Result("", isWord = false)
    val firstDirSector = u32(48)

    // FAT from the header DIFAT (109 entries — covers files < ~6.8 MB at
    // 512B sectors; larger CFBs chain extra DIFAT sectors).
    val fat = {
      val out = new java.io.ByteArrayOutputStream()
      var i = 0
      var ok = true
      while (i < 109 && ok) {
        val s = u32(76 + i * 4)
        if (s == FreeSect) ok = false
        else {
          val off = 512 + s.toInt * sectorSize
          if (off + sectorSize <= bytes.length)
            out.write(bytes, off, sectorSize)
          i += 1
        }
      }
      val b = out.toByteArray
      Array.tabulate(b.length / 4) { k =>
        (b(4 * k) & 0xffL) | ((b(4 * k + 1) & 0xffL) << 8) |
          ((b(4 * k + 2) & 0xffL) << 16) | ((b(4 * k + 3) & 0xffL) << 24)
      }
    }

    // A valid (acyclic) chain can never emit more bytes than the file
    // holds, so cap output by the input size: a crafted FAT cycle would
    // otherwise amplify a tiny CFB up to maxSectors * sectorSize (~4 GiB).
    // The visited bitmap stops the cycle itself.
    def chain(start: Long, maxSectors: Int = 1 << 20): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val visited = new java.util.BitSet(fat.length)
      var s = start
      var n = 0
      while (s != EndChain && s != FreeSect && s >= 0 && s < fat.length &&
          n < maxSectors && out.size() <= bytes.length && !visited.get(s.toInt)) {
        visited.set(s.toInt)
        val off = 512 + s.toInt * sectorSize
        if (off + sectorSize <= bytes.length) out.write(bytes, off, sectorSize)
        s = fat(s.toInt)
        n += 1
      }
      out.toByteArray
    }

    // Directory entries: 128 bytes each, UTF-16LE names.
    val dir = chain(firstDirSector)
    var wordStart = -1L
    var wordSize = -1L
    var i = 0
    while (i * 128 + 128 <= dir.length) {
      val e = i * 128
      val nameLen = (dir(e + 64) & 0xff) | ((dir(e + 65) & 0xff) << 8)
      if (nameLen >= 2 && nameLen <= 64) {
        val name = new String(dir, e, nameLen - 2, java.nio.charset.StandardCharsets.UTF_16LE)
        if (name == "WordDocument") {
          wordStart = (dir(e + 116) & 0xffL) | ((dir(e + 117) & 0xffL) << 8) |
            ((dir(e + 118) & 0xffL) << 16) | ((dir(e + 119) & 0xffL) << 24)
          wordSize = (dir(e + 120) & 0xffL) | ((dir(e + 121) & 0xffL) << 8) |
            ((dir(e + 122) & 0xffL) << 16) | ((dir(e + 123) & 0xffL) << 24)
        }
      }
      i += 1
    }
    if (wordStart < 0) return Result("", isWord = false)

    val wd0 = chain(wordStart)
    val wd = if (wordSize in0 wd0.length) java.util.Arrays.copyOf(wd0, wordSize.toInt) else wd0
    Result(fibText(wd), isWord = true)
  }

  private implicit class LongOps(val l: Long) extends AnyVal {
    def in0(n: Int): Boolean = l >= 0 && l <= n
  }

  /** FIB base: magic 0xA5EC at 0; fcMin/fcMac at 24/28 bound the text in
    * non-complex documents. 8-bit cp1252 unless the bytes look UTF-16LE.
    */
  private def fibText(wd: Array[Byte]): String = {
    if (wd.length < 32) return ""
    val magic = (wd(0) & 0xff) | ((wd(1) & 0xff) << 8)
    if (magic != 0xa5ec) return ""
    def u32(p: Int): Int =
      ((wd(p) & 0xff) | ((wd(p + 1) & 0xff) << 8) |
        ((wd(p + 2) & 0xff) << 16) | ((wd(p + 3) & 0xff) << 24))
    val fcMin = u32(24)
    val fcMac = u32(28)
    if (fcMin < 0 || fcMac <= fcMin || fcMac > wd.length) return ""
    val slice = java.util.Arrays.copyOfRange(wd, fcMin, fcMac)
    // UTF-16LE heuristic: half the even or odd bytes are NUL.
    var nulEven = 0
    var k = 0
    while (k + 1 < slice.length) { if (slice(k + 1) == 0) nulEven += 1; k += 2 }
    val text =
      if (slice.length >= 4 && nulEven * 2 > slice.length / 2)
        new String(slice, java.nio.charset.StandardCharsets.UTF_16LE)
      else new String(slice, java.nio.charset.Charset.forName("windows-1252"))
    // Word paragraph mark is CR; cell/row mark is 0x07; control chars
    // other than tab/newline are stripped.
    text.replace("\r\n", "\n").replace('\r', '\n').replace(7.toChar, '\n')
      .filter(c => c == '\n' || c == '\t' || c >= ' ')
  }
}
