package graft.corpus

import java.io.ByteArrayOutputStream

/** Deterministic JPEG + CFB(.doc) writers for the synthetic corpus —
  * real enough containers to exercise JpegKernel (markers + EXIF IFD) and
  * DocKernel (CFB FAT walk + FIB) end to end.
  */
object JpegWriter {

  final case class Spec(width: Int, height: Int, software: String, scanBytes: Int)

  def write(spec: Spec): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def w(bs: Int*): Unit = bs.foreach(b => out.write(b & 0xff))
    // SOI
    w(0xff, 0xd8)
    // APP0 JFIF
    w(0xff, 0xe0, 0x00, 0x10)
    out.write("JFIF".getBytes("ISO-8859-1")); w(0x00, 0x01, 0x01, 0x00, 0x00, 0x48, 0x00, 0x48, 0x00, 0x00)
    // APP1 EXIF: II TIFF, IFD0 with Software (ASCII) tag
    val sw = spec.software.getBytes("ISO-8859-1") :+ 0.toByte
    val tiff = new ByteArrayOutputStream()
    def t(bs: Int*): Unit = bs.foreach(b => tiff.write(b & 0xff))
    def t16(v: Int): Unit = { t(v & 0xff, (v >> 8) & 0xff) }
    def t32(v: Int): Unit = { t(v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff, (v >> 24) & 0xff) }
    t('I', 'I', 42, 0); t32(8) // header, IFD0 at offset 8
    t16(1)                     // one entry
    t16(0x0131); t16(2); t32(sw.length) // Software, ASCII
    val valOff = 8 + 2 + 12 + 4
    if (sw.length <= 4) { out.size(); sw.padTo(4, 0.toByte).foreach(b => tiff.write(b.toInt)) }
    else t32(valOff)
    t32(0)                     // next IFD
    if (sw.length > 4) tiff.write(sw)
    val tiffB = tiff.toByteArray
    val app1len = 2 + 6 + tiffB.length
    w(0xff, 0xe1, (app1len >> 8) & 0xff, app1len & 0xff)
    out.write("Exif".getBytes("ISO-8859-1")); w(0, 0)
    out.write(tiffB)
    // SOF0
    w(0xff, 0xc0, 0x00, 0x11, 0x08,
      (spec.height >> 8) & 0xff, spec.height & 0xff,
      (spec.width >> 8) & 0xff, spec.width & 0xff,
      0x03, 0x01, 0x22, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01)
    // SOS + deterministic pseudo-scan + EOI
    w(0xff, 0xda, 0x00, 0x0c, 0x03, 0x01, 0x00, 0x02, 0x11, 0x03, 0x11, 0x00, 0x3f, 0x00)
    var x = 0x12345
    var i = 0
    while (i < spec.scanBytes) {
      x = x * 1103515245 + 12345
      val b = (x >>> 16) & 0xff
      out.write(if (b == 0xff) 0x7f else b) // avoid accidental markers
      i += 1
    }
    w(0xff, 0xd9)
    out.toByteArray
  }
}

/** Minimal-but-valid CFB container holding a WordDocument stream with a
  * FIB (magic 0xA5EC). Two layouts:
  *  - `write`: non-complex, cp1252 text at fcMin..fcMac, streams >= 4096
  *    so everything lives in the regular FAT;
  *  - `writeComplex`: fComplex piece table — text split into three pieces
  *    stored OUT of file order with mixed cp1252/UTF-16LE encodings, the
  *    Clx/PlcPcd in a small `0Table` stream that lives in the MINI
  *    stream (exercising DocKernel's MiniFAT walk), and a decoy
  *    fcMin..fcMac range so any fallback is loudly wrong.
  */
object CfbWriter {

  def write(text: String, title: String = null, author: String = null): Array[Byte] = {
    val textBytes = text.replace("\n", "\r").getBytes("windows-1252")
    val fibSize = 2048
    val fcMin = fibSize
    val fcMac = fcMin + textBytes.length
    val wdLen = math.max(4096, fcMac)
    val wd = new Array[Byte](wdLen)
    // FIB base
    wd(0) = 0xec.toByte; wd(1) = 0xa5.toByte           // wIdent (LE a5ec)
    wd(2) = 0xc1.toByte; wd(3) = 0x00                  // nFib
    putU32(wd, 24, fcMin); putU32(wd, 28, fcMac)
    System.arraycopy(textBytes, 0, wd, fcMin, textBytes.length)

    // SummaryInformation property set (title/author), 4096-padded so it
    // lives in the regular FAT like the other streams of this writer
    val si: Array[Byte] =
      if (title == null && author == null) null
      else summaryInfo(Option(title), Option(author))
    val siLen = if (si == null) 0 else si.length
    val siSectors = if (si == null) 0 else 4096 / 512

    val sectorSize = 512
    val wdSectors = (wdLen + sectorSize - 1) / sectorSize
    // sector layout: [0..wdSectors) = WordDocument, [SummaryInformation,]
    // then 1 dir sector, then FAT sectors at the end.
    val siStart = wdSectors
    val dirSector = wdSectors + siSectors
    val totalDataSectors = dirSector + 1
    val fatEntries = totalDataSectors + 1 // + the FAT sector itself
    val fatSectors = (fatEntries * 4 + sectorSize - 1) / sectorSize
    val fatSector = dirSector + 1

    val nSectors = fatSector + fatSectors
    val body = new Array[Byte](nSectors * sectorSize)
    java.util.Arrays.fill(body, 0xff.toByte) // free-sector fill in FAT areas

    // WordDocument stream data
    var s = 0
    while (s < wdSectors) {
      val n = math.min(sectorSize, wdLen - s * sectorSize)
      java.util.Arrays.fill(body, s * sectorSize, s * sectorSize + sectorSize, 0.toByte)
      System.arraycopy(wd, s * sectorSize, body, s * sectorSize, n)
      s += 1
    }
    // SummaryInformation stream data
    if (si != null) {
      java.util.Arrays.fill(body, siStart * sectorSize,
        (siStart + siSectors) * sectorSize, 0.toByte)
      System.arraycopy(si, 0, body, siStart * sectorSize, si.length)
    }
    // directory sector: Root Entry + WordDocument [+ SummaryInformation]
    val dirOff = dirSector * sectorSize
    java.util.Arrays.fill(body, dirOff, dirOff + sectorSize, 0.toByte)
    writeDirEntry(body, dirOff, "Root Entry", 5, 0xfffffffeL, 0)
    writeDirEntry(body, dirOff + 128, "WordDocument", 2, 0, wdLen,
      right = if (si != null) 2L else 0xffffffffL)
    if (si != null)
      // declared size = the padded 4096: anything smaller than the
      // mini-stream cutoff would (correctly) be looked up via the
      // MiniFAT, which this simple writer does not emit
      writeDirEntry(body, dirOff + 256, "\u0005SummaryInformation", 2, siStart, 4096)
    // FAT
    val fatOff = fatSector * sectorSize
    var i = 0
    while (i < wdSectors - 1) { putU32(body, fatOff + i * 4, i + 1); i += 1 }
    putU32Signed(body, fatOff + (wdSectors - 1) * 4, 0xfffffffeL) // end of WD chain
    var j = 0
    while (j < siSectors - 1) {
      putU32(body, fatOff + (siStart + j) * 4, siStart + j + 1); j += 1
    }
    if (siSectors > 0)
      putU32Signed(body, fatOff + (siStart + siSectors - 1) * 4, 0xfffffffeL)
    putU32Signed(body, fatOff + dirSector * 4, 0xfffffffeL)       // dir chain end
    putU32Signed(body, fatOff + fatSector * 4, 0xfffffffdL)       // FAT sector marker

    // header
    val header = new Array[Byte](512)
    val sig = Array(0xd0, 0xcf, 0x11, 0xe0, 0xa1, 0xb1, 0x1a, 0xe1)
    sig.zipWithIndex.foreach { case (b, k) => header(k) = b.toByte }
    header(24) = 0x3e; header(26) = 0x03 // minor/major version
    header(28) = 0xfe.toByte; header(29) = 0xff.toByte // little-endian mark
    header(30) = 9 // sector shift: 512
    header(32) = 6 // mini sector shift
    putU32(header, 44, fatSectors)       // number of FAT sectors
    putU32(header, 48, dirSector)        // first directory sector
    putU32(header, 56, 4096)             // mini stream cutoff
    putU32Signed(header, 60, 0xfffffffeL) // first mini-FAT sector: none
    putU32Signed(header, 68, 0xfffffffeL) // first DIFAT sector: none
    // DIFAT in header
    var k = 0
    while (k < 109) { putU32Signed(header, 76 + k * 4, 0xffffffffL); k += 1 }
    putU32(header, 76, fatSector)

    val out = new ByteArrayOutputStream()
    out.write(header)
    out.write(body)
    out.toByteArray
  }

  def writeComplex(text: String): Array[Byte] = {
    val t = text.replace("\n", "\r")
    // three character pieces; physical file order is p3, p1, p2
    val l1 = t.length / 3
    val l2 = t.length / 3
    val (p1, p2, p3) = (t.substring(0, l1), t.substring(l1, l1 + l2), t.substring(l1 + l2))
    val b3 = p3.getBytes("windows-1252")
    val b1 = p1.getBytes("windows-1252")
    val b2 = p2.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)

    val fibSize = 2048
    val offA = fibSize               // p3 (compressed)
    val offB = offA + b3.length      // p1 (compressed)
    val offC0 = offB + b1.length
    val offC = offC0 + (offC0 & 1)   // p2 (UTF-16LE), even offset
    val decoy = "DECOY RANGE TEXT - piece table must win".getBytes("windows-1252")
    val decoyOff = offC + b2.length
    val wdLen = math.max(4096, decoyOff + decoy.length)
    val wd = new Array[Byte](wdLen)
    wd(0) = 0xec.toByte; wd(1) = 0xa5.toByte
    wd(2) = 0xc1.toByte; wd(3) = 0x00
    wd(10) = 0x04 // flags: fComplex (fWhichTblStm clear => 0Table)
    putU32(wd, 24, decoyOff); putU32(wd, 28, decoyOff + decoy.length)
    // variable FIB geometry (Word97): csw=14, cslw=22, cbRgFcLcb=93
    putU16(wd, 32, 14)
    putU16(wd, 34 + 14 * 2, 22)
    val cbAt = 34 + 14 * 2 + 2 + 22 * 4
    putU16(wd, cbAt, 93)
    val rg = cbAt + 2
    System.arraycopy(b3, 0, wd, offA, b3.length)
    System.arraycopy(b1, 0, wd, offB, b1.length)
    System.arraycopy(b2, 0, wd, offC, b2.length)
    System.arraycopy(decoy, 0, wd, decoyOff, decoy.length)

    // Clx: one Prc block (skipped by readers) + Pcdt with 3 pieces
    val n = 3
    val lcb = (n + 1) * 4 + n * 8
    val clx = new Array[Byte](3 + 2 + 5 + lcb)
    clx(0) = 0x01; putU16(clx, 1, 2) // Prc: cb=2 junk bytes
    val pcdt = 5
    clx(pcdt) = 0x02
    putU32(clx, pcdt + 1, lcb)
    val plc = pcdt + 5
    val cps = Array(0, p1.length, p1.length + p2.length, t.length)
    cps.zipWithIndex.foreach { case (cp, k) => putU32(clx, plc + k * 4, cp) }
    def putPcd(k: Int, fc: Long): Unit =
      putU32(clx, plc + (n + 1) * 4 + k * 8 + 2, fc)
    putPcd(0, (offB.toLong * 2) | 0x40000000L) // p1 compressed
    putPcd(1, offC.toLong)                     // p2 UTF-16LE
    putPcd(2, (offA.toLong * 2) | 0x40000000L) // p3 compressed
    // fcClx=0 in the table stream, lcbClx = clx length
    putU32(wd, rg + 33 * 8, 0); putU32(wd, rg + 33 * 8 + 4, clx.length)

    // ---- container: WD (regular FAT) + 0Table (mini stream) ----
    val sectorSize = 512
    val miniSector = 64
    val wdSectors = (wdLen + sectorSize - 1) / sectorSize
    val msMini = (clx.length + miniSector - 1) / miniSector // mini sectors used
    val msLen = msMini * miniSector
    val msSectors = (msLen + sectorSize - 1) / sectorSize   // regular sectors of ministream
    val msStart = wdSectors
    val dirSector = msStart + msSectors
    val miniFatSector = dirSector + 1
    val fatSector = miniFatSector + 1
    val fatEntries = fatSector + 1
    val fatSectors = (fatEntries * 4 + sectorSize - 1) / sectorSize
    val nSectors = fatSector + fatSectors
    val body = new Array[Byte](nSectors * sectorSize)
    java.util.Arrays.fill(body, 0xff.toByte)

    var s = 0
    while (s < wdSectors) {
      val nB = math.min(sectorSize, wdLen - s * sectorSize)
      java.util.Arrays.fill(body, s * sectorSize, (s + 1) * sectorSize, 0.toByte)
      System.arraycopy(wd, s * sectorSize, body, s * sectorSize, nB)
      s += 1
    }
    // ministream data (holds the 0Table bytes in mini sectors)
    java.util.Arrays.fill(body, msStart * sectorSize,
      (msStart + msSectors) * sectorSize, 0.toByte)
    System.arraycopy(clx, 0, body, msStart * sectorSize, clx.length)
    // directory
    val dirOff = dirSector * sectorSize
    java.util.Arrays.fill(body, dirOff, dirOff + sectorSize, 0.toByte)
    writeDirEntry(body, dirOff, "Root Entry", 5, msStart, msLen)
    writeDirEntry(body, dirOff + 128, "WordDocument", 2, 0, wdLen, right = 2L)
    writeDirEntry(body, dirOff + 256, "0Table", 2, 0, clx.length) // mini sector 0
    putU32(body, dirOff + 128 + 72, 2) // WordDocument right-sibling -> 0Table
    // MiniFAT: 0Table occupies mini sectors 0..msMini-1
    val mfOff = miniFatSector * sectorSize
    java.util.Arrays.fill(body, mfOff, mfOff + sectorSize, 0xff.toByte)
    var m = 0
    while (m < msMini - 1) { putU32(body, mfOff + m * 4, m + 1); m += 1 }
    putU32Signed(body, mfOff + (msMini - 1) * 4, 0xfffffffeL)
    // FAT
    val fatOff = fatSector * sectorSize
    var i = 0
    while (i < wdSectors - 1) { putU32(body, fatOff + i * 4, i + 1); i += 1 }
    putU32Signed(body, fatOff + (wdSectors - 1) * 4, 0xfffffffeL)
    var j = 0
    while (j < msSectors - 1) {
      putU32(body, fatOff + (msStart + j) * 4, msStart + j + 1); j += 1
    }
    putU32Signed(body, fatOff + (msStart + msSectors - 1) * 4, 0xfffffffeL)
    putU32Signed(body, fatOff + dirSector * 4, 0xfffffffeL)
    putU32Signed(body, fatOff + miniFatSector * 4, 0xfffffffeL)
    putU32Signed(body, fatOff + fatSector * 4, 0xfffffffdL)

    val header = new Array[Byte](512)
    val sig = Array(0xd0, 0xcf, 0x11, 0xe0, 0xa1, 0xb1, 0x1a, 0xe1)
    sig.zipWithIndex.foreach { case (b, k) => header(k) = b.toByte }
    header(24) = 0x3e; header(26) = 0x03
    header(28) = 0xfe.toByte; header(29) = 0xff.toByte
    header(30) = 9
    header(32) = 6
    putU32(header, 44, fatSectors)
    putU32(header, 48, dirSector)
    putU32(header, 56, 4096)
    putU32(header, 60, miniFatSector)
    putU32(header, 64, 1)
    putU32Signed(header, 68, 0xfffffffeL)
    var k = 0
    while (k < 109) { putU32Signed(header, 76 + k * 4, 0xffffffffL); k += 1 }
    putU32(header, 76, fatSector)

    val out = new ByteArrayOutputStream()
    out.write(header)
    out.write(body)
    out.toByteArray
  }

  /** Minimal OLE SummaryInformation property set: VT_LPSTR title (pid 2)
    * and author (pid 4).
    */
  /** Generic CFB container of named top-level streams, all in the regular
    * FAT (header miniCutoff = 0, so readers never consult a MiniFAT).
    * Used by MsgWriter; the .doc writers keep their specialized layouts.
    */
  def buildStreams(streams: Seq[(String, Array[Byte])]): Array[Byte] = {
    val sectorSize = 512
    val spans = streams.map { case (_, d) => math.max(1, (d.length + sectorSize - 1) / sectorSize) }
    val starts = spans.scanLeft(0)(_ + _)
    val dataSectors = starts.last
    val nEntries = streams.size + 1
    val dirSectors = math.max(1, (nEntries * 128 + sectorSize - 1) / sectorSize)
    val dirStart = dataSectors
    val fatStart = dirStart + dirSectors
    var fatSectors = 1
    while ((fatStart + fatSectors) * 4 > fatSectors * sectorSize) fatSectors += 1
    val nSectors = fatStart + fatSectors
    val body = new Array[Byte](nSectors * sectorSize)
    val fatOff = fatStart * sectorSize
    java.util.Arrays.fill(body, fatOff, nSectors * sectorSize, 0xff.toByte)
    streams.zipWithIndex.foreach { case ((_, data), i) =>
      val s0 = starts(i)
      System.arraycopy(data, 0, body, s0 * sectorSize, data.length)
      var s = s0
      while (s < s0 + spans(i) - 1) { putU32(body, fatOff + s * 4, s + 1); s += 1 }
      putU32Signed(body, fatOff + (s0 + spans(i) - 1) * 4, 0xfffffffeL)
    }
    var d = dirStart
    while (d < fatStart - 1) { putU32(body, fatOff + d * 4, d + 1); d += 1 }
    putU32Signed(body, fatOff + (fatStart - 1) * 4, 0xfffffffeL)
    for (k <- 0 until fatSectors)
      putU32Signed(body, fatOff + (fatStart + k) * 4, 0xfffffffdL)
    val dirOff = dirStart * sectorSize
    writeDirEntry(body, dirOff, "Root Entry", 5, 0xfffffffeL, 0)
    streams.zipWithIndex.foreach { case ((name, data), i) =>
      writeDirEntry(body, dirOff + (i + 1) * 128, name, 2, starts(i), data.length,
        right = if (i + 1 < streams.size) (i + 2).toLong else 0xffffffffL)
    }
    val header = new Array[Byte](512)
    val sig = Array(0xd0, 0xcf, 0x11, 0xe0, 0xa1, 0xb1, 0x1a, 0xe1)
    sig.zipWithIndex.foreach { case (b, k) => header(k) = b.toByte }
    header(24) = 0x3e; header(26) = 0x03
    header(28) = 0xfe.toByte; header(29) = 0xff.toByte
    header(30) = 9; header(32) = 6
    putU32(header, 44, fatSectors)
    putU32(header, 48, dirStart)
    putU32(header, 56, 0) // mini cutoff 0: everything via the regular FAT
    putU32Signed(header, 60, 0xfffffffeL)
    putU32Signed(header, 68, 0xfffffffeL)
    var k = 0
    while (k < 109) { putU32Signed(header, 76 + k * 4, 0xffffffffL); k += 1 }
    for (f <- 0 until math.min(fatSectors, 109))
      putU32(header, 76 + f * 4, fatStart + f)
    val out = new ByteArrayOutputStream()
    out.write(header)
    out.write(body)
    out.toByteArray
  }

  /** CFB with top-level streams PLUS sub-storages (the Outlook .msg
    * attachment shape: `__attach_version1.0_#N` storages whose children
    * carry the filename/data property streams). Top-level chain = root
    * streams then storages (right-linked); each storage's child points
    * at its own right-linked member chain — a degenerate but valid
    * red-black sibling tree, same as buildStreams emits.
    */
  def buildWithStorages(rootStreams: Seq[(String, Array[Byte])],
      storages: Seq[(String, Seq[(String, Array[Byte])])]): Array[Byte] = {
    val sectorSize = 512
    val allData: Seq[Array[Byte]] = rootStreams.map(_._2) ++
      storages.flatMap(_._2.map(_._2))
    val spans = allData.map(d => math.max(1, (d.length + sectorSize - 1) / sectorSize))
    val starts = spans.scanLeft(0)(_ + _)
    val dataSectors = starts.last
    val nMembers = storages.map(_._2.size).sum
    val nEntries = 1 + rootStreams.size + storages.size + nMembers
    val dirSectors = math.max(1, (nEntries * 128 + sectorSize - 1) / sectorSize)
    val dirStart = dataSectors
    val fatStart = dirStart + dirSectors
    var fatSectors = 1
    while ((fatStart + fatSectors) * 4 > fatSectors * sectorSize) fatSectors += 1
    val nSectors = fatStart + fatSectors
    val body = new Array[Byte](nSectors * sectorSize)
    val fatOff = fatStart * sectorSize
    java.util.Arrays.fill(body, fatOff, nSectors * sectorSize, 0xff.toByte)
    allData.zipWithIndex.foreach { case (data, i) =>
      val s0 = starts(i)
      System.arraycopy(data, 0, body, s0 * sectorSize, data.length)
      var s = s0
      while (s < s0 + spans(i) - 1) { putU32(body, fatOff + s * 4, s + 1); s += 1 }
      putU32Signed(body, fatOff + (s0 + spans(i) - 1) * 4, 0xfffffffeL)
    }
    var d = dirStart
    while (d < fatStart - 1) { putU32(body, fatOff + d * 4, d + 1); d += 1 }
    putU32Signed(body, fatOff + (fatStart - 1) * 4, 0xfffffffeL)
    for (k <- 0 until fatSectors)
      putU32Signed(body, fatOff + (fatStart + k) * 4, 0xfffffffdL)
    val dirOff = dirStart * sectorSize
    // entry layout: 0 root | 1..R root streams | R+1..R+S storages |
    // then each storage's members contiguously
    val firstStorage = 1 + rootStreams.size
    val memberBase = firstStorage + storages.size
    val memberStart = storages.scanLeft(memberBase)((acc, st) => acc + st._2.size)
    writeDirEntry(body, dirOff, "Root Entry", 5, 0xfffffffeL, 0)
    rootStreams.zipWithIndex.foreach { case ((name, data), i) =>
      val right: Long =
        if (i + 1 < rootStreams.size) (i + 2).toLong
        else if (storages.nonEmpty) firstStorage.toLong
        else 0xffffffffL
      writeDirEntry(body, dirOff + (i + 1) * 128, name, 2, starts(i),
        data.length, right = right)
    }
    var dataIdx = rootStreams.size
    storages.zipWithIndex.foreach { case ((stName, members), si) =>
      val right: Long =
        if (si + 1 < storages.size) (firstStorage + si + 1).toLong else 0xffffffffL
      writeDirEntry(body, dirOff + (firstStorage + si) * 128, stName, 1,
        0L, 0, right = right, child = memberStart(si).toLong)
      members.zipWithIndex.foreach { case ((mName, mData), mi) =>
        val mIdx = memberStart(si) + mi
        val mRight: Long =
          if (mi + 1 < members.size) (mIdx + 1).toLong else 0xffffffffL
        writeDirEntry(body, dirOff + mIdx * 128, mName, 2, starts(dataIdx),
          mData.length, right = mRight)
        dataIdx += 1
      }
    }
    val header = new Array[Byte](512)
    val sig = Array(0xd0, 0xcf, 0x11, 0xe0, 0xa1, 0xb1, 0x1a, 0xe1)
    sig.zipWithIndex.foreach { case (b, k) => header(k) = b.toByte }
    header(24) = 0x3e; header(26) = 0x03
    header(28) = 0xfe.toByte; header(29) = 0xff.toByte
    header(30) = 9; header(32) = 6
    putU32(header, 44, fatSectors)
    putU32(header, 48, dirStart)
    putU32(header, 56, 0) // mini cutoff 0: everything via the regular FAT
    putU32Signed(header, 60, 0xfffffffeL)
    putU32Signed(header, 68, 0xfffffffeL)
    var k = 0
    while (k < 109) { putU32Signed(header, 76 + k * 4, 0xffffffffL); k += 1 }
    for (f <- 0 until math.min(fatSectors, 109))
      putU32(header, 76 + f * 4, fatStart + f)
    val out = new ByteArrayOutputStream()
    out.write(header)
    out.write(body)
    out.toByteArray
  }

  private[corpus] def summaryInfo(title: Option[String], author: Option[String]): Array[Byte] = {
    val props = Seq(2L -> title, 4L -> author).collect { case (pid, Some(v)) => pid -> v }
    val secBase = 48 // header(28) + fmtid(16) + offset(4)
    val headLen = 8 + props.size * 8
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def u32(v: Long): Unit = { u16((v & 0xffff).toInt); u16(((v >> 16) & 0xffff).toInt) }
    u16(0xfffe); u16(0)            // byte order, version
    u32(0)                         // system id
    for (_ <- 0 until 16) out.write(0) // CLSID
    u32(1)                         // one property set
    for (_ <- 0 until 16) out.write(0) // FMTID (SummaryInformation)
    u32(secBase)                   // section offset
    // section: size, count, (pid, offset)*, then values
    val values = props.map { case (pid, v) =>
      val b = (v + "\u0000").getBytes(java.nio.charset.Charset.forName("windows-1252"))
      val padded = b ++ new Array[Byte]((4 - b.length % 4) % 4)
      (pid, padded)
    }
    val secSize = headLen + values.map(8 + _._2.length).sum
    u32(secSize); u32(props.size)
    var off = headLen
    values.foreach { case (pid, b) =>
      u32(pid); u32(off)
      off += 8 + b.length
    }
    values.foreach { case (_, b) =>
      u32(30) // VT_LPSTR
      u32(b.length)
      out.write(b)
    }
    out.toByteArray
  }

  private def putU16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
  }

  /** Directory entry with an explicit right-sibling link: the kernel's
    * scoped lookup walks the root's child tree, so sibling streams must
    * chain (a right-leaning chain is a valid, if unbalanced, RB tree).
    */
  private def writeDirEntry(b: Array[Byte], off: Int, name: String,
      typ: Int, start: Long, size: Int,
      right: Long = 0xffffffffL, child: Long = -1L): Unit = {
    val n16 = name.getBytes("UTF-16LE")
    System.arraycopy(n16, 0, b, off, math.min(n16.length, 62))
    putU32(b, off + 64, 0); b(off + 64) = ((n16.length + 2) & 0xff).toByte
    b(off + 65) = (((n16.length + 2) >> 8) & 0xff).toByte
    b(off + 66) = typ.toByte
    b(off + 67) = 1 // black
    putU32Signed(b, off + 68, 0xffffffffL) // left sibling
    putU32Signed(b, off + 72, right)       // right sibling
    putU32Signed(b, off + 76,
      if (child >= 0) child else if (typ == 5) 1L else 0xffffffffL) // child
    putU32Signed(b, off + 116, start)
    putU32(b, off + 120, size)
  }

  private def putU32(b: Array[Byte], off: Int, v: Long): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte
    b(off + 3) = ((v >> 24) & 0xff).toByte
  }
  private def putU32(b: Array[Byte], off: Int, v: Int): Unit = putU32(b, off, v.toLong & 0xffffffffL)
  private def putU32Signed(b: Array[Byte], off: Int, v: Long): Unit = putU32(b, off, v)
}
