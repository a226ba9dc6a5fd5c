package graft.kernel

import java.util.zip.CRC32

/** 7-Zip container (.7z), parsed from scratch per the published
  * 7zFormat.txt property grammar (the reference reaches the format via
  * its delegate parser stack, /root/reference/README.md:3-8).
  *
  * Scope: the start header + (possibly LZMA/LZMA2-compressed) end
  * header are fully parsed — member names, counts and codec ids always
  * surface as archive metadata. Member PAYLOADS extract through the
  * normal dispatch when their folder is a single-coder Copy, LZMA or
  * LZMA2 stream (store-mode archives and the 7-Zip non-filtered
  * default), including solid folders split by SubStreamsInfo; folders
  * using filter chains (BCJ/delta), PPMd or encryption stay opaque but
  * still contribute names to the metadata. The LZMA/LZMA2 bit-codecs
  * come from the xz jar every Spark distribution ships (platform use,
  * same rule as the gzip/bz2/xz/zstd wrapper codecs).
  *
  * Malformed input degrades to an empty result (typed opaque row),
  * never a throw past Extract's NonFatal boundary.
  */
object SevenZKernel {

  private val MaxHeaderBytes = 1 << 20
  private val CoderCopy = 0x00L
  private val CoderLzma = 0x030101L
  private val CoderLzma2 = 0x21L

  /** Variable-length number / byte reader over the header bytes. */
  private final class Rd(val b: Array[Byte], var pos: Int) {
    def byte(): Int = {
      if (pos >= b.length) throw new IllegalArgumentException("7z header underrun")
      val v = b(pos) & 0xff; pos += 1; v
    }
    def bytes(n: Int): Array[Byte] = {
      if (n < 0 || pos + n > b.length) throw new IllegalArgumentException("7z header underrun")
      val out = java.util.Arrays.copyOfRange(b, pos, pos + n); pos += n; out
    }
    /** 7z NUMBER: first-byte mask selects 0..8 little-endian extra bytes. */
    def num(): Long = {
      val first = byte()
      var mask = 0x80
      var value = 0L
      var i = 0
      while (i < 8) {
        if ((first & mask) == 0) {
          val high = (first & (mask - 1)).toLong
          return value | (high << (8 * i))
        }
        value |= (byte().toLong << (8 * i))
        mask >>= 1
        i += 1
      }
      value
    }
    def skip(n: Long): Unit = {
      if (n < 0 || pos + n > b.length) throw new IllegalArgumentException("7z header underrun")
      pos += n.toInt
    }
  }

  private final case class Coder(id: Long, props: Array[Byte], numIn: Int, numOut: Int)
  private final case class Folder(coders: Vector[Coder], numBindPairs: Int,
      unpackSizes: Vector[Long]) {
    def simple: Boolean = coders.length == 1 && numBindPairs == 0
    def unpackSize: Long = unpackSizes.lastOption.getOrElse(0L)
    def codecName: String = coders.head.id match {
      case CoderCopy  => "Copy"
      case CoderLzma  => "LZMA"
      case CoderLzma2 => "LZMA2"
      case id         => f"0x$id%x"
    }
  }
  private final case class StreamsInfo(packPos: Long, packSizes: Vector[Long],
      folders: Vector[Folder], numUnpack: Vector[Int], subSizes: Vector[Vector[Long]])

  def extract(bytes: Array[Byte], opt: Extract.Options, depth: Int): ArchiveKernel.Result =
    try extract0(bytes, opt, depth)
    catch { case scala.util.control.NonFatal(_) => ArchiveKernel.Result("", Map.empty) }

  private def extract0(bytes: Array[Byte], opt: Extract.Options, depth: Int): ArchiveKernel.Result = {
    val empty = ArchiveKernel.Result("", Map.empty)
    if (bytes.length < 32) return empty
    val nhOff = u64(bytes, 12)
    val nhSize = u64(bytes, 20)
    if (nhOff < 0 || nhSize <= 0 || nhSize > MaxHeaderBytes ||
      32L + nhOff + nhSize > bytes.length) return empty
    var hdr = java.util.Arrays.copyOfRange(bytes, (32 + nhOff).toInt, (32 + nhOff + nhSize).toInt)
    val crc = new CRC32(); crc.update(hdr)
    if (crc.getValue != u32(bytes, 28)) return empty // integrity over coverage
    var encodedHeader = false
    if (hdr.nonEmpty && (hdr(0) & 0xff) == 0x17) {
      // kEncodedHeader: a StreamsInfo describing the compressed header
      val rd = new Rd(hdr, 1)
      val si = parseStreamsInfo(rd)
      if (si.folders.length != 1 || !si.folders.head.simple) return empty
      val f = si.folders.head
      val off = 32 + si.packPos
      val len = si.packSizes.headOption.getOrElse(0L)
      if (off < 0 || len <= 0 || off + len > bytes.length ||
        f.unpackSize > MaxHeaderBytes) return empty
      val packed = java.util.Arrays.copyOfRange(bytes, off.toInt, (off + len).toInt)
      hdr = decodeFolder(f, packed) match {
        case Some(h) => h
        case None    => return empty
      }
      encodedHeader = true
    }
    if (hdr.isEmpty || (hdr(0) & 0xff) != 0x01) return empty
    val rd = new Rd(hdr, 1)
    var streams: Option[StreamsInfo] = None
    var names = Vector.empty[String]
    var numFiles = 0L
    var emptyBits: Array[Boolean] = Array.empty
    var done = false
    while (!done) rd.num() match {
      case 0x00 => done = true
      case 0x02 => // ArchiveProperties: (type, size, data)* until 0
        var t = rd.num()
        while (t != 0) { rd.skip(rd.num()); t = rd.num() }
      case 0x04 => streams = Some(parseStreamsInfo(rd))
      case 0x05 => // FilesInfo
        numFiles = rd.num()
        if (numFiles < 0 || numFiles > (1 << 24)) throw new IllegalArgumentException("7z files")
        var t = rd.num()
        while (t != 0) {
          val size = rd.num()
          val end = rd.pos + size
          t match {
            case 0x0e => // kEmptyStream bit vector, MSB first
              emptyBits = readBits(rd, numFiles.toInt)
            case 0x11 => // kName: external flag + UTF-16LE NUL-terminated
              val external = rd.byte()
              if (external == 0) {
                val data = rd.bytes((end - rd.pos).toInt)
                val s = new String(data, java.nio.charset.StandardCharsets.UTF_16LE)
                names = s.split(0.toChar).toVector.filter(_.nonEmpty)
              }
            case _ => ()
          }
          if (rd.pos > end) throw new IllegalArgumentException("7z prop overrun")
          rd.pos = end.toInt
          t = rd.num()
        }
      case _ => throw new IllegalArgumentException("7z unexpected top-level id")
    }

    // members with data consume substreams in folder order
    val parts = Vector.newBuilder[String]
    var codecs = Vector.empty[String]
    streams.foreach { si =>
      codecs = si.folders.map(_.codecName).distinct
      var total = 0L
      var n = 0
      var packIdx = 0
      val packOffsets = si.packSizes.scanLeft(32L + si.packPos)(_ + _)
      var fi = 0
      while (fi < si.folders.length) {
        val f = si.folders(fi)
        val nStreams = si.numUnpack.lift(fi).getOrElse(1)
        // single-coder folders consume exactly one packed stream
        if (f.simple && nStreams > 0 && packIdx < si.packSizes.length &&
          n < ArchiveKernel.MaxMembers && total <= ArchiveKernel.MaxTotalChars) {
          val off = packOffsets(packIdx)
          val len = si.packSizes(packIdx)
          if (off >= 0 && len >= 0 && off + len <= bytes.length &&
            f.unpackSize <= OoxmlUtil.MaxPartBytes) {
            val packed = java.util.Arrays.copyOfRange(bytes, off.toInt, (off + len).toInt)
            decodeFolder(f, packed).foreach { data =>
              val sizes = si.subSizes.lift(fi).filter(_.nonEmpty)
                .getOrElse(Vector(data.length.toLong))
              var s = 0L
              for (sz <- sizes if n < ArchiveKernel.MaxMembers &&
                total <= ArchiveKernel.MaxTotalChars) {
                if (sz >= 0 && s + sz <= data.length) {
                  val member = java.util.Arrays.copyOfRange(data, s.toInt, (s + sz).toInt)
                  val out = Extract.extractBytes("member", member, opt, depth + 1)
                  if (out.content.nonEmpty) { parts += out.content; total += out.content.length }
                  n += 1
                }
                s += sz
              }
            }
          }
        }
        packIdx += (if (f.simple) 1 else math.max(1, f.coders.map(_.numIn).sum - f.numBindPairs))
        fi += 1
      }
    }
    var meta = Map(
      "archive:entry-count" -> math.max(numFiles, names.length.toLong).toString,
      "archive:entry-names" -> names.take(16).mkString(","))
    if (codecs.nonEmpty) meta += ("7z:codecs" -> codecs.mkString(","))
    if (encodedHeader) meta += ("7z:encoded-header" -> "true")
    val kept = parts.result()
    var tl = 0L
    ArchiveKernel.Result(
      kept.takeWhile { p => tl += p.length + 2; tl <= ArchiveKernel.MaxTotalChars }
        .mkString("\n\n"), meta)
  }

  /** StreamsInfo: PackInfo + UnpackInfo + optional SubStreamsInfo. */
  private def parseStreamsInfo(rd: Rd): StreamsInfo = {
    var packPos = 0L
    var packSizes = Vector.empty[Long]
    var folders = Vector.empty[Folder]
    var numUnpack = Vector.empty[Int]
    var subSizes = Vector.empty[Vector[Long]]
    // which folders carried a CRC in UnpackInfo kCRC: SubStreamsInfo's
    // digest list EXCLUDES single-stream folders whose CRC is already
    // defined there (ADVICE r6 — skipping blind misaligned the reader
    // on real 7-Zip archives with folder-level CRCs)
    var folderCrcDefined = Array.empty[Boolean]
    var done = false
    while (!done) rd.num() match {
      case 0x00 => done = true
      case 0x06 => // PackInfo
        packPos = rd.num()
        val n = rd.num()
        if (n < 0 || n > (1 << 20)) throw new IllegalArgumentException("7z packs")
        var d = false
        while (!d) rd.num() match {
          case 0x00 => d = true
          case 0x09 => packSizes = Vector.fill(n.toInt)(rd.num())
          case 0x0a => skipDigests(rd, n.toInt)
          case _    => throw new IllegalArgumentException("7z packinfo")
        }
      case 0x07 => // UnpackInfo
        if (rd.num() != 0x0b) throw new IllegalArgumentException("7z folder")
        val nf = rd.num()
        if (nf < 0 || nf > (1 << 20)) throw new IllegalArgumentException("7z folders")
        if (rd.byte() != 0) throw new IllegalArgumentException("7z external folders")
        folders = Vector.fill(nf.toInt)(parseFolder(rd))
        if (rd.num() != 0x0c) throw new IllegalArgumentException("7z unpacksizes")
        folders = folders.map { f =>
          val nOut = math.max(1, f.coders.map(_.numOut).sum)
          f.copy(unpackSizes = Vector.fill(nOut)(rd.num()))
        }
        var d = false
        while (!d) rd.num() match {
          case 0x00 => d = true
          case 0x0a => folderCrcDefined = skipDigests(rd, folders.length)
          case _    => throw new IllegalArgumentException("7z unpackinfo")
        }
      case 0x08 => // SubStreamsInfo
        numUnpack = Vector.fill(folders.length)(1)
        var d = false
        while (!d) rd.num() match {
          case 0x00 => d = true
          case 0x0d => numUnpack = Vector.fill(folders.length)(rd.num().toInt)
          case 0x09 =>
            // per folder: count-1 explicit sizes, last = remainder
            subSizes = folders.zipWithIndex.map { case (f, i) =>
              val cnt = numUnpack.lift(i).getOrElse(1)
              if (cnt <= 0) Vector.empty[Long]
              else {
                val explicit = Vector.fill(cnt - 1)(rd.num())
                explicit :+ (f.unpackSize - explicit.sum)
              }
            }
          case 0x0a =>
            // digests only for streams lacking a folder-level CRC: a
            // single-stream folder whose CRC was defined in UnpackInfo
            // kCRC is excluded from this list (7z spec; ADVICE r6)
            val nDigests = folders.indices.map { i =>
              val cnt = numUnpack.lift(i).getOrElse(1)
              if (cnt == 1 && folderCrcDefined.lift(i).getOrElse(false)) 0
              else cnt
            }.sum
            skipDigests(rd, nDigests)
          case _ => throw new IllegalArgumentException("7z substreams")
        }
        if (subSizes.isEmpty)
          subSizes = folders.zipWithIndex.map { case (f, i) =>
            if (numUnpack.lift(i).getOrElse(1) == 1) Vector(f.unpackSize)
            else Vector.empty[Long]
          }
      case _ => throw new IllegalArgumentException("7z streamsinfo")
    }
    if (numUnpack.isEmpty) numUnpack = Vector.fill(folders.length)(1)
    if (subSizes.isEmpty) subSizes = folders.map(f => Vector(f.unpackSize))
    StreamsInfo(packPos, packSizes, folders, numUnpack, subSizes)
  }

  private def parseFolder(rd: Rd): Folder = {
    val nc = rd.num()
    if (nc < 1 || nc > 32) throw new IllegalArgumentException("7z coders")
    var totalIn = 0
    var totalOut = 0
    val coders = Vector.fill(nc.toInt) {
      val flags = rd.byte()
      val idSize = flags & 0x0f
      if (idSize > 8) throw new IllegalArgumentException("7z coder id")
      var id = 0L
      var i = 0
      while (i < idSize) { id = (id << 8) | rd.byte(); i += 1 }
      val (nIn, nOut) =
        if ((flags & 0x10) != 0) (rd.num().toInt, rd.num().toInt) else (1, 1)
      if (nIn < 0 || nOut < 0 || nIn > 64 || nOut > 64)
        throw new IllegalArgumentException("7z coder streams")
      val props = if ((flags & 0x20) != 0) rd.bytes(rd.num().toInt) else Array.empty[Byte]
      totalIn += nIn; totalOut += nOut
      Coder(id, props, nIn, nOut)
    }
    val nBind = totalOut - 1
    var i = 0
    while (i < nBind) { rd.num(); rd.num(); i += 1 }
    val nPacked = totalIn - nBind
    if (nPacked > 1) { var j = 0; while (j < nPacked) { rd.num(); j += 1 } }
    Folder(coders, nBind, Vector.empty)
  }

  /** Digest block: allDefined byte, optional bit vector, 4 bytes each. */
  /** Skip a digest list; returns which of the n entries were defined. */
  private def skipDigests(rd: Rd, n: Int): Array[Boolean] = {
    val all = rd.byte()
    val defined = if (all != 0) Array.fill(n)(true) else readBits(rd, n)
    rd.skip(4L * defined.count(identity))
    defined
  }

  private def readBits(rd: Rd, n: Int): Array[Boolean] = {
    val out = new Array[Boolean](n)
    var mask = 0
    var cur = 0
    var i = 0
    while (i < n) {
      if (mask == 0) { cur = rd.byte(); mask = 0x80 }
      out(i) = (cur & mask) != 0
      mask >>= 1
      i += 1
    }
    out
  }

  /** Single-coder folder payload decode: Copy / LZMA / LZMA2, output
    * bounded by the declared unpack size.
    */
  private def decodeFolder(f: Folder, packed: Array[Byte]): Option[Array[Byte]] = {
    val size = f.unpackSize
    if (size < 0 || size > OoxmlUtil.MaxPartBytes) return None
    val c = f.coders.head
    try c.id match {
      case CoderCopy => Some(packed)
      case CoderLzma =>
        if (c.props.length < 5) return None
        val dictSize = (c.props(1) & 0xffL) | ((c.props(2) & 0xffL) << 8) |
          ((c.props(3) & 0xffL) << 16) | ((c.props(4) & 0xffL) << 24)
        val in = new org.tukaani.xz.LZMAInputStream(
          new java.io.ByteArrayInputStream(packed), size, c.props(0),
          math.min(dictSize, 64L << 20).toInt)
        Some(readAll(in, size.toInt))
      case CoderLzma2 =>
        if (c.props.length < 1) return None
        val p = c.props(0) & 0xff
        val dictSize =
          if (p > 40) return None
          else if (p == 40) 0x7fffffffL
          else (2L | (p & 1L)) << (p / 2 + 11)
        val in = new org.tukaani.xz.LZMA2InputStream(
          new java.io.ByteArrayInputStream(packed), math.min(dictSize, 64L << 20).toInt)
        Some(readAll(in, size.toInt))
      case _ => None
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private def readAll(in: java.io.InputStream, size: Int): Array[Byte] =
    try {
      val out = new Array[Byte](size)
      var off = 0
      var r = in.read(out, 0, size)
      while (r > 0 && off + r <= size) {
        off += r
        r = if (off == size) -1 else in.read(out, off, size - off)
      }
      if (off != size) throw new IllegalArgumentException("7z short stream")
      out
    } finally in.close()

  private def u32(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)

  private def u64(b: Array[Byte], p: Int): Long =
    u32(b, p) | (u32(b, p + 4) << 32)
}

/** RAR archives: RAR5 headers parse to archive metadata rows (names,
  * counts, sizes, methods — the compression itself is proprietary and
  * stays opaque); RAR4 is typed by version only.
  */
object RarKernel {

  def extract(bytes: Array[Byte]): Map[String, String] =
    try extract0(bytes)
    catch { case scala.util.control.NonFatal(_) => Map.empty }

  private def extract0(bytes: Array[Byte]): Map[String, String] = {
    if (bytes.length < 8) return Map.empty
    if ((bytes(6) & 0xff) == 0x00) return Map("rar:version" -> "4") // Rar!\x1a\x07\x00
    if ((bytes(6) & 0xff) != 0x01 || bytes(7) != 0x00) return Map.empty
    var pos = 8
    var names = Vector.empty[String]
    var totalUnpacked = 0L
    var blocks = 0
    var ended = false
    while (!ended && blocks < 4096 && pos + 7 <= bytes.length) {
      blocks += 1
      // block: crc32(4) + headerSize(vint) + header[headerSize]
      var p = pos + 4
      val (hdrSize, p1) = vint(bytes, p)
      p = p1
      val hdrEnd = p + hdrSize.toInt
      if (hdrSize <= 0 || hdrEnd > bytes.length) { ended = true }
      else {
        val (typ, p2) = vint(bytes, p); p = p2
        val (flags, p3) = vint(bytes, p); p = p3
        if ((flags & 0x1) != 0) { val (_, q) = vint(bytes, p); p = q } // extra area size
        var dataSize = 0L
        if ((flags & 0x2) != 0) { val (d, q) = vint(bytes, p); dataSize = d; p = q }
        if (typ == 2) { // file header
          val (fflags, q1) = vint(bytes, p); p = q1
          val (unp, q2) = vint(bytes, p); p = q2
          val (_, q3) = vint(bytes, p); p = q3 // attributes
          if ((fflags & 0x2) != 0) p += 4     // mtime
          if ((fflags & 0x4) != 0) p += 4     // data crc
          val (_, q4) = vint(bytes, p); p = q4 // compression info
          val (_, q5) = vint(bytes, p); p = q5 // host os
          val (nameLen, q6) = vint(bytes, p); p = q6
          if (nameLen > 0 && p + nameLen <= hdrEnd) {
            names :+= new String(bytes, p, nameLen.toInt,
              java.nio.charset.StandardCharsets.UTF_8)
            totalUnpacked += math.max(0L, unp)
          }
        }
        if (typ == 5) ended = true // end-of-archive block
        val next = hdrEnd + dataSize
        if (next <= pos || next > bytes.length) ended = true else pos = next.toInt
      }
    }
    var meta = Map("rar:version" -> "5")
    if (names.nonEmpty) meta ++= Map(
      "archive:entry-count" -> names.length.toString,
      "archive:entry-names" -> names.take(16).mkString(","),
      "rar:unpacked-size" -> totalUnpacked.toString)
    meta
  }

  /** RAR5 vint: little-endian base-128, high bit continues. */
  private def vint(b: Array[Byte], p0: Int): (Long, Int) = {
    var v = 0L
    var p = p0
    var shift = 0
    while (shift < 70) {
      if (p >= b.length) throw new IllegalArgumentException("rar vint underrun")
      val c = b(p) & 0xff
      v |= (c & 0x7fL) << shift
      p += 1
      if ((c & 0x80) == 0) return (v, p)
      shift += 7
    }
    throw new IllegalArgumentException("rar vint overlong")
  }
}
