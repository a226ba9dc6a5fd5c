package graft.kernel

/** Shared CFB/OLE2 container reader: header, FAT (from the header DIFAT),
  * sector chains with cycle + amplification bounds, directory entries,
  * and the MiniFAT/mini-stream for small objects. Extracted from the
  * round-2 DocKernel so .doc (Word) and .msg (Outlook) share one walker.
  *
  * Names are a FLAT map over all directory entries (first entry wins,
  * property-set control-char prefixes stripped) — nested storages are not
  * modeled; the top-level streams both kernels need are unambiguous in
  * practice, and a collision degrades to best-effort text, never a throw.
  */
private[kernel] object Cfb {

  private val FreeSect = 0xffffffffL
  private val EndChain = 0xfffffffeL

  def parse(bytes: Array[Byte]): Option[Reader] = {
    if (bytes.length < 512) return None
    def u16(p: Int): Int = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
    if ((bytes(0) & 0xff) != 0xd0 || (bytes(1) & 0xff) != 0xcf ||
        (bytes(2) & 0xff) != 0x11 || (bytes(3) & 0xff) != 0xe0) return None
    val sectorSize = 1 << u16(30)
    if (sectorSize < 128 || sectorSize > 4096) return None
    Some(new Reader(bytes, sectorSize, 1 << u16(32)))
  }

  final class Reader(bytes: Array[Byte], sectorSize: Int, miniSectorSize: Int) {

    private def u32(p: Int): Long =
      (bytes(p) & 0xffL) | ((bytes(p + 1) & 0xffL) << 8) |
        ((bytes(p + 2) & 0xffL) << 16) | ((bytes(p + 3) & 0xffL) << 24)

    private val firstDirSector = u32(48)
    private val miniCutoff = u32(56)
    private val firstMiniFat = u32(60)

    // FAT from the header DIFAT (109 entries — covers files < ~6.8 MB at
    // 512B sectors; larger CFBs chain extra DIFAT sectors).
    private val fat: Array[Long] = {
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
    private def chain(start: Long, maxSectors: Int = 1 << 20): Array[Byte] = {
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

    // Directory entries: 128 bytes each, UTF-16LE names, red-black-tree
    // sibling pointers. Lookups are scoped to the ROOT storage's children
    // (a .msg recipient sub-storage's __substg streams must not shadow
    // the top-level ones); when the sibling tree is malformed (our fuzz
    // corpus, legacy writers emitting zeroed pointers), fall back to a
    // flat scan of all entries — bounded best-effort, never a throw.
    private final case class DirEnt(name: String, typ: Int, start: Long,
        size: Long, left: Int, right: Int, child: Int)

    private val (entries, rootStart, attachScopes) = {
      val dir = chain(firstDirSector)
      val n = dir.length / 128
      def i32(p: Int): Int =
        (dir(p) & 0xff) | ((dir(p + 1) & 0xff) << 8) |
          ((dir(p + 2) & 0xff) << 16) | ((dir(p + 3) & 0xff) << 24)
      val ents = new Array[DirEnt](n)
      var root = -1
      var i = 0
      while (i < n) {
        val e = i * 128
        val nameLen = (dir(e + 64) & 0xff) | ((dir(e + 65) & 0xff) << 8)
        if (nameLen >= 2 && nameLen <= 64) {
          val name = new String(dir, e, nameLen - 2, java.nio.charset.StandardCharsets.UTF_16LE)
          val start = (dir(e + 116) & 0xffL) | ((dir(e + 117) & 0xffL) << 8) |
            ((dir(e + 118) & 0xffL) << 16) | ((dir(e + 119) & 0xffL) << 24)
          val size = (dir(e + 120) & 0xffL) | ((dir(e + 121) & 0xffL) << 8) |
            ((dir(e + 122) & 0xffL) << 16) | ((dir(e + 123) & 0xffL) << 24)
          val typ = dir(e + 66) & 0xff
          ents(i) = DirEnt(name, typ, start, size, i32(e + 68), i32(e + 72), i32(e + 76))
          if (typ == 5 && root < 0) root = i
        }
        i += 1
      }
      // sibling binary-tree walk (shared by the root scope and the
      // attachment sub-storages); cycle -> (partial, false)
      def walkSiblings(startIdx: Int): (Vector[DirEnt], Boolean) = {
        val out = Vector.newBuilder[DirEnt]
        var ok = true
        val visited = new java.util.BitSet(n)
        val stack = scala.collection.mutable.ArrayDeque[Int](startIdx)
        var steps = 0
        while (stack.nonEmpty && ok && steps < n * 2) {
          val k = stack.removeLast()
          steps += 1
          if (k >= 0 && k < n && ents(k) != null && !visited.get(k)) {
            visited.set(k)
            out += ents(k)
            stack += ents(k).left
            stack += ents(k).right
          } else if (k >= 0 && k < n && visited.get(k)) ok = false // cycle
        }
        (out.result(), ok)
      }
      var treeOk = root >= 0 && ents(root) != null
      val scoped =
        if (treeOk) {
          val (tl, ok) = walkSiblings(ents(root).child)
          treeOk = ok
          tl
        } else Vector.empty[DirEnt]
      val usable = if (treeOk && scoped.nonEmpty) scoped
        else ents.toVector.filter(e => e != null && e.typ != 5) // flat fallback
      var es = Map.empty[String, (Long, Long)]
      usable.foreach { e =>
        // property-set stream names carry a leading control char
        // ("\x05SummaryInformation") — strip for lookup
        val key = e.name.dropWhile(_ < ' ')
        if (e.typ == 2 && !es.contains(key)) es += (key -> (e.start, e.size))
      }
      // Outlook attachment sub-storages: each __attach* STORAGE child of
      // the root gets its own scoped name->(start, size) view, in name
      // order (the #NNNNNNNN suffix orders them)
      val attach = Vector.newBuilder[Map[String, (Long, Long)]]
      if (treeOk) {
        scoped.filter(e => e.typ == 1 && e.name.startsWith("__attach"))
          .sortBy(_.name)
          .foreach { st =>
            val (members, ok) = walkSiblings(st.child)
            if (ok) {
              var sub = Map.empty[String, (Long, Long)]
              members.foreach { m =>
                if (m.typ == 2 && !sub.contains(m.name))
                  sub += (m.name -> (m.start, m.size))
              }
              attach += sub
            }
          }
      }
      (es, if (root >= 0 && ents(root) != null) ents(root).start else -1L,
        attach.result())
    }

    // Mini stream: objects smaller than miniCutoff live in 64-byte mini
    // sectors inside the root entry's own chain, addressed by the MiniFAT.
    private lazy val miniStream: Array[Byte] =
      if (rootStart < 0) Array.emptyByteArray else chain(rootStart)
    private lazy val miniFat: Array[Long] = {
      val b = chain(firstMiniFat)
      Array.tabulate(b.length / 4) { k =>
        (b(4 * k) & 0xffL) | ((b(4 * k + 1) & 0xffL) << 8) |
          ((b(4 * k + 2) & 0xffL) << 16) | ((b(4 * k + 3) & 0xffL) << 24)
      }
    }
    private def miniChain(start: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val visited = new java.util.BitSet(miniFat.length)
      var s = start
      while (s != EndChain && s != FreeSect && s >= 0 && s < miniFat.length &&
          out.size() <= bytes.length && !visited.get(s.toInt)) {
        visited.set(s.toInt)
        val off = s.toInt * miniSectorSize
        if (off + miniSectorSize <= miniStream.length)
          out.write(miniStream, off, miniSectorSize)
        s = miniFat(s.toInt)
      }
      out.toByteArray
    }

    def streamNames: Iterable[String] = entries.keys

    private def readStream(start: Long, size: Long): Array[Byte] = {
      val raw = if (size < miniCutoff) miniChain(start) else chain(start)
      if (size >= 0 && size <= raw.length) java.util.Arrays.copyOf(raw, size.toInt)
      else raw
    }

    def stream(name: String): Option[Array[Byte]] =
      entries.get(name).map { case (start, size) => readStream(start, size) }

    /** Number of __attach* sub-storages (root children, name order). */
    def attachmentCount: Int = attachScopes.length

    /** A stream inside attachment sub-storage `i` (scoped — never
      * shadows or is shadowed by root-level streams).
      */
    def attachmentStream(i: Int, name: String): Option[Array[Byte]] =
      if (i < 0 || i >= attachScopes.length) None
      else attachScopes(i).get(name).map { case (s, z) => readStream(s, z) }
  }
}

/** Outlook .msg (MAPI-over-CFB): top-level property streams
  * `__substg1.0_TTTTEEEE` where TTTT is the property tag and EEEE the
  * type (001F = UTF-16LE string, 001E = ANSI). Subject/sender/recipient
  * map to the same dc:/Message-* keys the .eml kernel emits; the body is
  * PR_BODY (1000).
  */
object MsgKernel {

  final case class Result(text: String, metadata: Map[String, String])

  def isMsg(c: Cfb.Reader): Boolean =
    c.streamNames.exists(_.startsWith("__substg1.0_"))

  def extract(c: Cfb.Reader): Result = {
    def raw(tag: String): Option[String] =
      c.stream(s"__substg1.0_${tag}001F")
        .map(b => new String(b, java.nio.charset.StandardCharsets.UTF_16LE))
        .orElse(c.stream(s"__substg1.0_${tag}001E")
          .map(b => new String(b, java.nio.charset.Charset.forName("windows-1252"))))
        .map(_.takeWhile(_ != 0.toChar))
    // headers trim; the body keeps its own line structure
    def prop(tag: String): Option[String] = raw(tag).map(_.trim).filter(_.nonEmpty)

    var meta = Map.empty[String, String]
    prop("0037").foreach(v => meta += ("dc:title" -> v))           // PR_SUBJECT
    prop("0C1A").foreach { v =>                                    // PR_SENDER_NAME
      meta += ("dc:creator" -> v); meta += ("Message-From" -> v)
    }
    prop("0E04").foreach(v => meta += ("Message-To" -> v))         // PR_DISPLAY_TO
    prop("0E03").foreach(v => meta += ("Message-Cc" -> v))         // PR_DISPLAY_CC
    // attachment sub-storages: names from PR_ATTACH_LONG_FILENAME (3707)
    // falling back to PR_ATTACH_FILENAME (3704) — same metadata keys as
    // the .eml kernel's attachment surface
    val nAtt = c.attachmentCount
    if (nAtt > 0) {
      def attProp(i: Int, tag: String): Option[String] =
        c.attachmentStream(i, s"__substg1.0_${tag}001F")
          .map(b => new String(b, java.nio.charset.StandardCharsets.UTF_16LE))
          .orElse(c.attachmentStream(i, s"__substg1.0_${tag}001E")
            .map(b => new String(b, java.nio.charset.Charset.forName("windows-1252"))))
          .map(_.takeWhile(_ != 0.toChar).trim).filter(_.nonEmpty)
      val names = (0 until math.min(8, nAtt)).map { i =>
        attProp(i, "3707").orElse(attProp(i, "3704")).getOrElse("unnamed")
      }
      meta += ("Message-Attachment-Count" -> nAtt.toString)
      meta += ("Message-Attachment-Names" -> names.mkString(","))
    }
    val body = raw("1000").getOrElse("")                           // PR_BODY
    Result(body.replace("\r\n", "\n").replace('\r', '\n'), meta)
  }
}
