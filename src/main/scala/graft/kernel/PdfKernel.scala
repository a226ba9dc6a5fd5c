package graft.kernel

import java.nio.charset.StandardCharsets

/** E3 - PDF layout parser, from scratch (JDK-only).
  *
  * Pipeline: object index (brute scan, robust to broken xref) -> object
  * lexer -> FlateDecode -> page tree -> per-font ToUnicode CMap ->
  * content-stream interpreter (q/Q/cm, BT/ET, Td, TD, T-star, Tm, TL, Tj, TJ, quote ops)
  * with full matrix tracking -> reading-order reconstruction (y desc,
  * x asc, paragraph break on larger-than-usual leading).
  *
  * Observable reference contract (all asserted by our specs):
  * content begins with a newline, then the first text line
  * (spec/rika/parser_spec.rb:157-162); truncation at 9 chars yields
  * "\nStopping" (spec/rika/parser_spec.rb:168-170); Info dict surfaces as
  * dc:title/dc:creator/pdf:docinfo:* string metadata
  * (spec/rika/parser_spec.rb:85-92,203-205); dc:format carries the header
  * version ("application/pdf; version=1.3").
  */
object PdfKernel {

  final class PdfParseException(msg: String) extends RuntimeException(msg)

  // one Inflater per executor thread, reset between streams — a fresh
  // native zlib context per stream was ~25% of plain-PDF kernel time
  private val inflaters = new ThreadLocal[java.util.zip.Inflater] {
    override def initialValue() = new java.util.zip.Inflater()
  }

  // ---------------------------------------------------------------- model
  sealed trait PObj
  case class PNum(v: Double) extends PObj
  case class PStr(bytes: Array[Byte]) extends PObj
  case class PName(v: String) extends PObj
  case class PBool(v: Boolean) extends PObj
  case object PNull extends PObj
  case class PArr(items: Vector[PObj]) extends PObj
  case class PDict(m: Map[String, PObj]) extends PObj
  case class PRef(num: Int, gen: Int) extends PObj
  case class PStream(dict: PDict, raw: Array[Byte]) extends PObj
  case class POp(name: String) extends PObj // content-stream operator token

  final case class Result(
      text: String,
      lines: Vector[String],
      metadata: Map[String, String],
      pageCount: Int)

  // ------------------------------------------------------------ doc parse
  def extract(bytes: Array[Byte]): Result = {
    val doc = new Doc(bytes)
    val version = {
      val head = new String(bytes, 0, math.min(16, bytes.length), StandardCharsets.ISO_8859_1)
      if (head.startsWith("%PDF-")) head.drop(5).takeWhile(c => c.isDigit || c == '.') else "1.4"
    }
    // Encrypted PDFs with an EMPTY user password decrypt transparently
    // (standard security handler, RC4/AESV2 — see PdfCrypt); documents
    // needing a real password degrade to a taxonomy row, not a crash.
    if (doc.encryptedUnsupported)
      throw new PdfParseException("encrypted PDF: password required or unsupported scheme")

    val pages = doc.pages
    val pageTexts = pages.map(p => pageText(doc, p))
    val allLines = pageTexts.flatMap(_._1)
    val body = pageTexts.map(_._2).mkString("")
    val unmapped = pageTexts.map(_._3).sum
    var meta = infoMetadata(doc, version, pages.length, body, unmapped)
    // embedded image XObjects: count + dims + filters (the Tika-delegate
    // "embedded resources" surface, as string metadata per the data model)
    val images = pages.flatMap(p => pageImages(doc, p))
    if (images.nonEmpty) {
      meta += ("pdf:imageCount" -> images.length.toString)
      meta += ("pdf:imageDimensions" ->
        images.map { case (w, h, _) => s"${w}x$h" }.mkString(","))
      val filters = images.map(_._3).filter(_.nonEmpty).distinct
      if (filters.nonEmpty) meta += ("pdf:imageFilters" -> filters.mkString(","))
    }
    Result(body, allLines, meta, pages.length)
  }

  /** Image XObjects reachable from a page's resources: (w, h, filter). */
  private def pageImages(doc: Doc, page: PDict): Vector[(Int, Int, String)] =
    (for {
      res <- doc.deref(page.m.getOrElse("Resources", PNull)).collect { case d: PDict => d }
      xo  <- doc.deref(res.m.getOrElse("XObject", PNull)).collect { case d: PDict => d }
    } yield xo.m.valuesIterator.flatMap { ref =>
      doc.deref(ref).collect { case s: PStream => s.dict }
        .filter(_.m.get("Subtype").contains(PName("Image")))
        .map { d =>
          def dim(k: String): Int = d.m.get(k) match {
            case Some(PNum(v)) if v > 0 && v <= 1e7 => v.toInt
            case _ => 0
          }
          val filter = d.m.get("Filter") match {
            case Some(PName(f))   => f
            case Some(PArr(items)) =>
              items.collect { case PName(f) => f }.mkString("+")
            case _ => ""
          }
          (dim("Width"), dim("Height"), filter)
        }
    }.toVector).getOrElse(Vector.empty)

  /** One page's (lines, text-with-layout, unmapped-glyph count). Text =
    * "\n" + lines joined by "\n" (blank line inserted at paragraph-sized
    * leading gaps) + "\n".
    */
  private def pageText(doc: Doc, page: PDict): (Vector[String], String, Int) = {
    val fonts: Map[String, Font] = (for {
      res   <- doc.deref(page.m.getOrElse("Resources", PNull)).collect { case d: PDict => d }
      fdict <- doc.deref(res.m.getOrElse("Font", PNull)).collect { case d: PDict => d }
    } yield fdict.m.map { case (fname, fref) =>
      fname -> loadFont(doc, doc.deref(fref).collect { case d: PDict => d }.getOrElse(PDict(Map.empty)))
    }).getOrElse(Map.empty)

    // multi-part contents assemble in one pass with a hard size bound
    // (fuzzing found the quadratic fold + unbounded concat: 20 refs to a
    // 64 MiB stream OOM'd the old code)
    val MaxPageContent = 64 << 20
    val content: Array[Byte] = doc.deref(page.m.getOrElse("Contents", PNull)) match {
      case Some(s: PStream) =>
        val d = doc.decodeStream(s)
        if (d.length > MaxPageContent) java.util.Arrays.copyOf(d, MaxPageContent) else d
      case Some(PArr(items)) =>
        val out = new java.io.ByteArrayOutputStream()
        items.iterator
          .flatMap(it => doc.deref(it).collect { case s: PStream => s })
          .takeWhile(_ => out.size() < MaxPageContent)
          .foreach { s =>
            val d = doc.decodeStream(s)
            val room = MaxPageContent - out.size()
            out.write('\n')
            out.write(d, 0, math.min(d.length, room))
          }
        out.toByteArray
      case _ => Array.emptyByteArray
    }

    val interp = new ContentInterp(fonts)
    val items = interp.run(content)
    val (lines, text) = assemble(items)
    (lines, text, interp.unmappedGlyphs)
  }

  /** A positioned text run in device space. */
  final case class Run(x: Double, y: Double, size: Double, text: String)

  private def assemble(items: Vector[Run]): (Vector[String], String) = {
    if (items.isEmpty) return (Vector.empty, "")
    // Group runs into lines by y with tolerance proportional to font size.
    val sorted = items.sortBy(r => (-r.y, r.x))
    val lines = Vector.newBuilder[(Double, Vector[Run])]
    var curY = sorted.head.y
    var cur = Vector.newBuilder[Run]
    for (r <- sorted) {
      val tol = math.max(2.0, r.size * 0.4)
      if (math.abs(r.y - curY) <= tol) cur += r
      else {
        lines += ((curY, cur.result().sortBy(_.x)))
        curY = r.y
        cur = Vector.newBuilder[Run]
        cur += r
      }
    }
    lines += ((curY, cur.result().sortBy(_.x)))
    val ls = lines.result()
    // join runs left-to-right; insert a synthetic space when a positive
    // x-gap remains after a (deliberately generous) width estimate of the
    // previous run — covers PDFs that position words via Td/Tm instead of
    // space glyphs, while never double-spacing runs that carry their own
    // spaces (the estimate overshoots, so touching runs never gap)
    val lineTexts = ls.map { case (_, runs) =>
      val sb = new StringBuilder
      var prevEnd = Double.NegativeInfinity
      runs.foreach { r =>
        if (sb.nonEmpty && r.x - prevEnd > 0.3 * r.size &&
            !sb.last.isWhitespace && !r.text.head.isWhitespace)
          sb.append(' ')
        sb.append(r.text)
        prevEnd = r.x + r.text.length * 0.5 * r.size
      }
      sb.toString
    }
    // Paragraph breaks: leading gap noticeably larger than the median gap.
    val gaps = ls.sliding(2).collect { case Vector((y1, _), (y2, _)) => y1 - y2 }.toVector
    val medGap = if (gaps.nonEmpty) gaps.sorted.apply(gaps.length / 2) else 0.0
    val sb = new StringBuilder("\n")
    var i = 0
    while (i < lineTexts.length) {
      if (i > 0) {
        sb.append('\n')
        if (medGap > 0 && gaps(i - 1) > medGap * 1.5) sb.append('\n')
      }
      sb.append(lineTexts(i))
      i += 1
    }
    sb.append('\n')
    (lineTexts, sb.toString)
  }

  // ---------------------------------------------------------------- fonts
  final case class Font(toUnicode: Map[Int, String], twoByte: Boolean) {
    // 1-byte fast path: array-indexed glyph map (null = unmapped) —
    // avoids a boxed Map lookup per glyph in the hot decode loop
    val oneByte: Array[String] =
      if (twoByte) null
      else {
        val a = new Array[String](256)
        toUnicode.foreach { case (k, v) => if (k >= 0 && k < 256) a(k) = v }
        a
      }
    val hasMap: Boolean = toUnicode.nonEmpty
  }

  private def loadFont(doc: Doc, fd: PDict): Font = {
    val twoByte = fd.m.get("Subtype").collect { case PName(s) => s }.contains("Type0")
    val cmap = doc.deref(fd.m.getOrElse("ToUnicode", PNull)) match {
      case Some(s: PStream) => parseCMap(doc.decodeStream(s))
      case _                => Map.empty[Int, String]
    }
    Font(cmap, twoByte)
  }

  /** ToUnicode CMap: codespacerange ignored (we key on code ints),
    * bfchar + bfrange (incremental and array-destination forms).
    */
  def parseCMap(data: Array[Byte]): Map[Int, String] = {
    val toks = new Lexer(data).allTokens()
    val m = Map.newBuilder[Int, String]
    var i = 0
    def hexInt(o: PObj): Option[Int] = o match {
      case PStr(b) =>
        Some(b.foldLeft(0)((acc, x) => (acc << 8) | (x & 0xff)))
      case PNum(v) => Some(v.toInt)
      case _       => None
    }
    def hexStr(o: PObj): Option[String] = o match {
      case PStr(b) if b.length % 2 == 0 =>
        val cs = new Array[Char](b.length / 2)
        var k = 0
        while (k < cs.length) {
          cs(k) = (((b(2 * k) & 0xff) << 8) | (b(2 * k + 1) & 0xff)).toChar
          k += 1
        }
        Some(new String(cs))
      case PStr(b) => Some(new String(b, StandardCharsets.ISO_8859_1))
      case _       => None
    }
    while (i < toks.length) {
      toks(i) match {
        case POp("beginbfchar") =>
          var j = i + 1
          while (j + 1 < toks.length && toks(j) != POp("endbfchar")) {
            for (src <- hexInt(toks(j)); dst <- hexStr(toks(j + 1))) m += (src -> dst)
            j += 2
          }
          i = j
        case POp("beginbfrange") =>
          var j = i + 1
          while (j + 2 < toks.length && toks(j) != POp("endbfrange")) {
            (toks(j), toks(j + 1), toks(j + 2)) match {
              case (lo, hi, PArr(dsts)) =>
                for (l <- hexInt(lo); h <- hexInt(hi)) {
                  var c = l
                  var k = 0
                  while (c <= h && k < dsts.length) {
                    hexStr(dsts(k)).foreach(s => m += (c -> s))
                    c += 1; k += 1
                  }
                }
              case (lo, hi, dst) =>
                for (l <- hexInt(lo); h <- hexInt(hi); d0 <- hexStr(dst)) {
                  var c = l
                  while (c <= h) {
                    val add = c - l
                    val s =
                      if (d0.isEmpty) ""
                      else d0.init + (d0.last + add).toChar
                    m += (c -> s)
                    c += 1
                  }
                }
            }
            j += 3
          }
          i = j
        case _ => ()
      }
      i += 1
    }
    m.result()
  }

  // ----------------------------------------------------- content interp
  /** 2D affine matrix [a b c d e f]. */
  final case class Mat(a: Double, b: Double, c: Double, d: Double, e: Double, f: Double) {
    def *(o: Mat): Mat = Mat(
      a * o.a + b * o.c, a * o.b + b * o.d,
      c * o.a + d * o.c, c * o.b + d * o.d,
      e * o.a + f * o.c + o.e, e * o.b + f * o.d + o.f)
    def apply(x: Double, y: Double): (Double, Double) =
      (a * x + c * y + e, b * x + d * y + f)
    def scaleY: Double = math.sqrt(b * b + d * d)
  }
  object Mat { val I = Mat(1, 0, 0, 1, 0, 0) }

  private final class ContentInterp(fonts: Map[String, Font]) {
    private var ctm = Mat.I
    private val ctmStack = scala.collection.mutable.Stack[Mat]()
    private var tm = Mat.I    // text matrix
    private var tlm = Mat.I   // text line matrix
    private var font: Font = Font(Map.empty, twoByte = false)
    private var fontSize = 12.0
    private var leading = 0.0
    private var inText = false
    private val out = Vector.newBuilder[Run]

    def run(content: Array[Byte]): Vector[Run] = {
      // stream tokens (never materialize the token list: fuzzing showed
      // corrupted FlateDecode data can inflate to tens of MB of garbage
      // that would lex into tens of millions of tokens)
      val lex = new Lexer(content, contentMode = true)
      val stack = scala.collection.mutable.ArrayBuffer[PObj]()
      val maxOps = 16 << 20
      var n = 0
      var tok = lex.next()
      while (tok.isDefined && n < maxOps) {
        tok.get match {
          case POp(op) => exec(op, stack); stack.clear()
          case o =>
            stack += o
            if (stack.length > 4096) stack.clear() // garbage guard
        }
        n += 1
        tok = lex.next()
      }
      out.result()
    }

    private def num(o: PObj): Double = o match { case PNum(v) => v; case _ => 0.0 }

    private def exec(op: String, st: scala.collection.mutable.ArrayBuffer[PObj]): Unit = op match {
      case "q" => ctmStack.push(ctm)
      case "Q" => if (ctmStack.nonEmpty) ctm = ctmStack.pop()
      case "cm" if st.length >= 6 =>
        ctm = Mat(num(st(0)), num(st(1)), num(st(2)), num(st(3)), num(st(4)), num(st(5))) * ctm
      case "BT" => inText = true; tm = Mat.I; tlm = Mat.I
      case "ET" => inText = false
      case "Tf" if st.length >= 2 =>
        st(0) match {
          case PName(f) => font = fonts.getOrElse(f, Font(Map.empty, twoByte = false))
          case _        => ()
        }
        fontSize = num(st(1))
      case "Tm" if st.length >= 6 =>
        tm = Mat(num(st(0)), num(st(1)), num(st(2)), num(st(3)), num(st(4)), num(st(5)))
        tlm = tm
      case "Td" if st.length >= 2 =>
        tlm = Mat(1, 0, 0, 1, num(st(0)), num(st(1))) * tlm; tm = tlm
      case "TD" if st.length >= 2 =>
        leading = -num(st(1))
        tlm = Mat(1, 0, 0, 1, num(st(0)), num(st(1))) * tlm; tm = tlm
      case "TL" if st.length >= 1 => leading = num(st(0))
      case "T*" =>
        tlm = Mat(1, 0, 0, 1, 0, -leading) * tlm; tm = tlm
      case "Tj" if st.length >= 1 => show(st(0))
      case "'" if st.length >= 1 =>
        tlm = Mat(1, 0, 0, 1, 0, -leading) * tlm; tm = tlm; show(st(0))
      case "\"" if st.length >= 3 =>
        tlm = Mat(1, 0, 0, 1, 0, -leading) * tlm; tm = tlm; show(st(2))
      case "TJ" if st.length >= 1 =>
        st(0) match {
          case PArr(items) =>
            val sb = new StringBuilder
            items.foreach {
              case s: PStr             => sb.append(decode(s))
              case PNum(v) if v < -180 => sb.append(' ') // big negative kern = word gap
              case _                   => ()
            }
            emit(sb.toString)
          case _ => ()
        }
      case _ => () // drawing/color/etc: no text effect
    }

    private def show(o: PObj): Unit = o match {
      case s: PStr => emit(decode(s))
      case _       => ()
    }

    /** Glyph codes a declared ToUnicode CMap failed to map (the per-page
      * average feeds pdf:unmappedUnicodeCharsPerPage, reference:
      * lib/rika.rb:92-95). Fonts without any CMap decode via the simple
      * byte encoding and are not counted as unmapped.
      */
    var unmappedGlyphs: Int = 0

    private def decode(s: PStr): String = {
      val b = s.bytes
      val sb = new StringBuilder
      if (font.twoByte) {
        var i = 0
        while (i + 1 < b.length) {
          val code = ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
          font.toUnicode.get(code) match {
            case Some(u) => sb.append(u)
            case None =>
              if (font.toUnicode.nonEmpty) unmappedGlyphs += 1
              sb.append(code.toChar)
          }
          i += 2
        }
      } else {
        var i = 0
        while (i < b.length) {
          val code = b(i) & 0xff
          val u = font.oneByte(code)
          if (u != null) sb.append(u)
          else {
            if (font.hasMap) unmappedGlyphs += 1
            sb.append(code.toChar) // ISO-8859-1: byte k == char k
          }
          i += 1
        }
      }
      sb.toString
    }

    private def emit(text: String): Unit = {
      if (inText && text.nonEmpty) {
        val trm = tm * ctm
        val (x, y) = trm.apply(0, 0)
        out += Run(x, y, fontSize * trm.scaleY, text)
      }
    }
  }

  // -------------------------------------------------------------- lexer
  /** PDF object/token lexer over a byte array. In contentMode bare
    * identifiers become POp tokens (content-stream operators).
    */
  final class Lexer(data: Array[Byte], contentMode: Boolean = false) {
    var pos = 0
    private val n = data.length
    // fuzz hardening: corrupted FlateDecode garbage can lex forever or
    // nest arbitrarily deep — bounded token budget + structure depth
    private var budget: Long = 8L << 20
    private var depth = 0

    def allTokens(): Vector[PObj] = {
      val out = Vector.newBuilder[PObj]
      var t = next()
      while (t.isDefined) { out += t.get; t = next() }
      out.result()
    }

    @inline private def ws(b: Int): Boolean =
      b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == '\f' || b == 0
    @inline private def delim(b: Int): Boolean =
      b == '(' || b == ')' || b == '<' || b == '>' || b == '[' || b == ']' ||
      b == '{' || b == '}' || b == '/' || b == '%'

    def skipWs(): Unit = {
      var go = true
      while (go && pos < n) {
        val b = data(pos) & 0xff
        if (ws(b)) pos += 1
        else if (b == '%') { while (pos < n && data(pos) != '\n'.toByte) pos += 1 }
        else go = false
      }
    }

    def next(): Option[PObj] = {
      skipWs()
      if (pos >= n) return None
      budget -= 1
      if (budget <= 0) { pos = n; return None }
      val b = data(pos) & 0xff
      b match {
        case '(' => Some(string())
        case '<' =>
          if (pos + 1 < n && data(pos + 1) == '<'.toByte) {
            pos += 2
            if (depth > 64) Some(PNull) // contents re-lexed flat; harmless
            else { depth += 1; val d = dict(); depth -= 1; Some(d) }
          }
          else Some(hexString())
        case '[' if depth > 64 => pos += 1; Some(PNull)
        case '[' =>
          pos += 1
          depth += 1
          val items = Vector.newBuilder[PObj]
          var count = 0
          skipWs()
          // item cap: corrupted streams can open an array that never
          // closes — collect a bounded prefix, keep scanning to the end
          while (pos < n && data(pos) != ']'.toByte) {
            val o = next()
            if (count < 65536) { o.foreach(items += _); count += 1 }
            skipWs()
          }
          pos += 1
          depth -= 1
          Some(PArr(items.result()))
        case ']' | '>' | '}' | ')' => pos += 1; next()
        case '/' => Some(name())
        case c if c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9') =>
          Some(numberOrRef())
        case _ => Some(keyword())
      }
    }

    private def dict(): PObj = {
      val m = Map.newBuilder[String, PObj]
      var go = true
      while (go) {
        skipWs()
        if (pos + 1 < n && data(pos) == '>'.toByte && data(pos + 1) == '>'.toByte) {
          pos += 2; go = false
        } else if (pos >= n) go = false
        else {
          (next(), { skipWs(); next() }) match {
            case (Some(PName(k)), Some(v)) => m += (k -> v)
            case _                         => go = false
          }
        }
      }
      PDict(m.result())
    }

    private def string(): PObj = {
      pos += 1
      val out = new java.io.ByteArrayOutputStream()
      var depth = 1
      while (pos < n && depth > 0) {
        val c = data(pos) & 0xff
        if (c == '\\' && pos + 1 < n) {
          pos += 1
          val e = data(pos) & 0xff
          e match {
            case 'n'  => out.write('\n'); pos += 1
            case 'r'  => out.write('\r'); pos += 1
            case 't'  => out.write('\t'); pos += 1
            case 'b'  => out.write('\b'); pos += 1
            case 'f'  => out.write('\f'); pos += 1
            case '('  => out.write('('); pos += 1
            case ')'  => out.write(')'); pos += 1
            case '\\' => out.write('\\'); pos += 1
            case '\r' => pos += 1; if (pos < n && data(pos) == '\n'.toByte) pos += 1
            case '\n' => pos += 1
            case d if d >= '0' && d <= '7' =>
              var v = 0; var k = 0
              while (k < 3 && pos < n && data(pos) >= '0'.toByte && data(pos) <= '7'.toByte) {
                v = v * 8 + (data(pos) - '0'.toByte); pos += 1; k += 1
              }
              out.write(v & 0xff)
            case other => out.write(other); pos += 1
          }
        } else if (c == '(') { depth += 1; out.write(c); pos += 1 }
        else if (c == ')') { depth -= 1; if (depth > 0) out.write(c); pos += 1 }
        else { out.write(c); pos += 1 }
      }
      PStr(out.toByteArray)
    }

    private def hexString(): PObj = {
      pos += 1
      val hex = new StringBuilder
      while (pos < n && data(pos) != '>'.toByte) {
        val c = (data(pos) & 0xff).toChar
        if (!ws(c)) hex.append(c)
        pos += 1
      }
      pos += 1
      if (hex.length % 2 == 1) hex.append('0')
      val out = new Array[Byte](hex.length / 2)
      var i = 0
      while (i < out.length) {
        out(i) = Integer.parseInt(hex.substring(2 * i, 2 * i + 2), 16).toByte
        i += 1
      }
      PStr(out)
    }

    private def name(): PObj = {
      pos += 1
      val sb = new StringBuilder
      while (pos < n && !ws(data(pos) & 0xff) && !delim(data(pos) & 0xff)) {
        val c = data(pos) & 0xff
        if (c == '#' && pos + 2 < n) {
          sb.append(Integer.parseInt(
            new String(data, pos + 1, 2, StandardCharsets.ISO_8859_1), 16).toChar)
          pos += 3
        } else { sb.append(c.toChar); pos += 1 }
      }
      PName(sb.toString)
    }

    private def numberOrRef(): PObj = {
      val start = pos
      while (pos < n && !ws(data(pos) & 0xff) && !delim(data(pos) & 0xff)) pos += 1
      // allocation-free parse of the PDF number grammar [+-]?d*[.d*];
      // anything else (malformed token) falls back to 0.0 like before
      var v = 0.0
      var sawDot = false
      locally {
        var i = start
        var neg = false
        var ok = i < pos
        if (ok && (data(i) == '+' || data(i) == '-')) { neg = data(i) == '-'; i += 1 }
        var intPart = 0.0
        var frac = 0.0
        var scale = 0.1
        var digits = 0
        while (i < pos && ok) {
          val c = data(i)
          if (c >= '0' && c <= '9') {
            if (sawDot) { frac += (c - '0') * scale; scale *= 0.1 }
            else intPart = intPart * 10 + (c - '0')
            digits += 1
          } else if (c == '.' && !sawDot) sawDot = true
          else ok = false
          i += 1
        }
        if (ok && digits > 0) v = if (neg) -(intPart + frac) else intPart + frac
        else if (!ok) { sawDot = false; v = 0.0 }
      }
      // object reference lookahead: "<int> <int> R"
      if (!contentMode && v >= 0 && v == math.floor(v) && !sawDot) {
        val save = pos
        skipWs()
        val s2 = pos
        while (pos < n && (data(pos) >= '0'.toByte && data(pos) <= '9'.toByte)) pos += 1
        if (pos > s2) {
          val gen = new String(data, s2, pos - s2, StandardCharsets.ISO_8859_1).toInt
          val save2 = pos
          skipWs()
          if (pos < n && data(pos) == 'R'.toByte &&
              (pos + 1 >= n || ws(data(pos + 1) & 0xff) || delim(data(pos + 1) & 0xff))) {
            pos += 1
            return PRef(v.toInt, gen)
          }
          pos = save2
          pos = save // not a ref: rewind fully
        } else pos = save
      }
      PNum(v)
    }

    private def keyword(): PObj = {
      val start = pos
      while (pos < n && !ws(data(pos) & 0xff) && !delim(data(pos) & 0xff)) pos += 1
      val s = new String(data, start, pos - start, StandardCharsets.ISO_8859_1)
      s match {
        case "true"  => PBool(true)
        case "false" => PBool(false)
        case "null"  => PNull
        case other   => POp(other)
      }
    }
  }

  // --------------------------------------------------------------- index
  /** Document object index: brute scan for "N G obj" headers — robust to
    * damaged/absent xref tables (also covers xref-stream PDFs without
    * parsing them). Objects parsed lazily and memoized.
    */
  private final class Doc(val bytes: Array[Byte]) {
    private val raw = new String(bytes, StandardCharsets.ISO_8859_1)
    // one scan builds both maps (object header offsets + generations)
    private val (objOffsets, objGens): (Map[Int, Int], Map[Int, Int]) = {
      val mo = Map.newBuilder[Int, Int]
      val mg = Map.newBuilder[Int, Int]
      val re = java.util.regex.Pattern.compile("""(?m)^\s*(\d+)\s+(\d+)\s+obj\b""")
      val matcher = re.matcher(raw)
      while (matcher.find()) {
        val num = matcher.group(1).toInt
        mo += (num -> matcher.start())
        mg += (num -> matcher.group(2).toInt)
      }
      (mo.result(), mg.result())
    }
    private val cache = scala.collection.mutable.HashMap[Int, PObj]()

    // ---- standard security handler (empty user password) --------------
    // Initialized AFTER trailer; objects parsed during init see
    // cryptState = None (the /Encrypt dict itself is never encrypted)
    // and the cache is cleared afterwards so everything re-parses
    // decrypted. encryptedUnsupported: /Encrypt present but not openable
    // (real password, or a scheme outside V1/V2/V4-AESV2).
    private var cryptState: Option[PdfCrypt.Crypt] = None
    private var encObjNum = -1
    var encryptedUnsupported = false

    private def initCrypt(): Unit = trailer.m.get("Encrypt").foreach { encRef =>
      encryptedUnsupported = true // until proven openable
      encObjNum = encRef match { case PRef(n, _) => n; case _ => -1 }
      val enc: Map[String, PObj] = (encRef match {
        case PRef(n, _) => obj(n)
        case d: PDict   => d
        case _          => PNull
      }) match {
        case PDict(m) => m
        case _        => Map.empty
      }
      def num(k: String, dflt: Int): Int = enc.get(k) match {
        case Some(PNum(v)) => v.toInt
        case _             => dflt
      }
      def str(k: String): Array[Byte] = enc.get(k) match {
        case Some(PStr(b)) => b
        case _             => Array.emptyByteArray
      }
      if (!enc.get("Filter").contains(PName("Standard"))) return
      val v = num("V", 0)
      val r = num("R", 0)
      if (v == 5 && r == 6) { // PDF 2.0: AES-256 (AESV3)
        val cfm = for {
          cf <- enc.get("CF").collect { case PDict(m) => m }
          std <- cf.get("StdCF").collect { case PDict(m) => m }
          m <- std.get("CFM").collect { case PName(n) => n }
        } yield m
        if (!cfm.contains("AESV3")) return
        PdfCrypt.r6FileKey(str("U"), str("UE")) match {
          case Some(key) =>
            cryptState = Some(PdfCrypt.Crypt(key, aes = true, v5 = true))
            encryptedUnsupported = false
            cache.clear()
          case None => () // real password
        }
        return
      }
      if (!Set(1, 2, 4).contains(v) || r < 2 || r > 4) return
      val lengthBits = if (v == 1) 40 else num("Length", if (v == 4) 128 else 40)
      // V4: crypt filters — only the StdCF/Identity pair with CFM V2
      // (RC4) or AESV2 is supported
      var aes = false
      if (v == 4) {
        val cfm = for {
          cf <- enc.get("CF").collect { case PDict(m) => m }
          std <- cf.get("StdCF").collect { case PDict(m) => m }
          m <- std.get("CFM").collect { case PName(n) => n }
        } yield m
        cfm match {
          case Some("AESV2") => aes = true
          case Some("V2")    => aes = false
          case _             => return
        }
        val stmf = enc.get("StmF").collect { case PName(n) => n }.getOrElse("Identity")
        if (stmf != "StdCF") return
      }
      val encryptMeta = enc.get("EncryptMetadata") match {
        case Some(PBool(b)) => b
        case _              => true
      }
      val id0 = trailer.m.get("ID") match {
        case Some(PArr(PStr(b) +: _)) => b
        case _                        => Array.emptyByteArray
      }
      val o = str("O")
      val u = str("U")
      if (o.length < 32 || u.length < 16) return
      val key = PdfCrypt.fileKey(o, num("P", -1), id0, r, lengthBits, encryptMeta)
      if (!PdfCrypt.verifyEmptyUser(key, r, id0, u)) return // real password
      cryptState = Some(PdfCrypt.Crypt(key, aes))
      encryptedUnsupported = false
      cache.clear() // re-parse everything through the decryptor
    }

    /** Decrypt every string and stream payload in a freshly-parsed
      * top-level object (strings inside object streams are NOT
      * separately encrypted — the ObjStm payload already was; XRef
      * streams are never encrypted).
      */
    private def decryptObj(c: PdfCrypt.Crypt, n: Int, g: Int, o: PObj): PObj =
      o match {
        case PStr(b)     => PStr(c.decrypt(n, g, b))
        case PArr(items) => PArr(items.map(decryptObj(c, n, g, _)))
        case PDict(m)    => PDict(m.map { case (k, v) => k -> decryptObj(c, n, g, v) })
        case s @ PStream(d, rawBytes) =>
          if (d.m.get("Type").contains(PName("XRef"))) s
          else PStream(decryptObj(c, n, g, d).asInstanceOf[PDict],
            c.decrypt(n, g, rawBytes))
        case other => other
      }

    /** PDF 1.5+ object streams (/Type /ObjStm): compressed objects are
      * invisible to the top-level brute scan, so every ObjStm is expanded
      * once, lazily, into this secondary index. Header = N pairs
      * "objnum offset" before /First.
      */
    private var objStmBuilding = false
    private var objStmCache: Map[Int, PObj] = null
    private def objStmObjects: Map[Int, PObj] = {
      if (objStmCache != null) return objStmCache
      if (objStmBuilding) return Map.empty // re-entrant deref during build
      objStmBuilding = true
      val m = Map.newBuilder[Int, PObj]
      objOffsets.keys.foreach { num =>
        obj(num) match {
          case s @ PStream(PDict(d), _) if d.get("Type").contains(PName("ObjStm")) =>
            try {
              val data = decodeStream(s)
              val n = d.get("N").collect { case PNum(v) => v.toInt }.getOrElse(0)
              val first = deref(d.getOrElse("First", PNull))
                .collect { case PNum(v) => v.toInt }.getOrElse(0)
              val head = new Lexer(data)
              val pairs = (0 until n).flatMap { _ =>
                (head.next(), head.next()) match {
                  case (Some(PNum(on)), Some(PNum(off))) => Some(on.toInt -> off.toInt)
                  case _ => None
                }
              }
              pairs.foreach { case (objNum, off) =>
                val lex = new Lexer(data)
                lex.pos = first + off
                lex.next().foreach(o => m += (objNum -> o))
              }
            } catch { case scala.util.control.NonFatal(_) => () }
          case _ => ()
        }
      }
      objStmCache = m.result()
      objStmBuilding = false
      objStmCache
    }

    val trailer: PDict = {
      val m = Map.newBuilder[String, PObj]
      var idx = raw.indexOf("trailer")
      while (idx >= 0) {
        val lex = new Lexer(bytes)
        lex.pos = idx + "trailer".length
        lex.next() match {
          case Some(PDict(d)) => m ++= d
          case _              => ()
        }
        idx = raw.indexOf("trailer", idx + 1)
      }
      var d = m.result()
      if (!d.contains("Root")) {
        // xref-stream PDFs: find the catalog by scanning objects.
        objOffsets.keys.toSeq.sorted.foreach { num =>
          if (!d.contains("Root")) obj(num) match {
            case PDict(dd) if dd.get("Type").contains(PName("Catalog")) =>
              d += ("Root" -> PRef(num, 0))
            case PStream(PDict(dd), _) if dd.get("Type").contains(PName("XRef")) =>
              dd.get("Root").foreach(r => d += ("Root" -> r))
              dd.get("Info").foreach(r => if (!d.contains("Info")) d += ("Info" -> r))
            case _ => ()
          }
        }
      }
      PDict(d)
    }

    initCrypt() // after trailer: needs /Encrypt + /ID from it

    def obj(num: Int): PObj = cache.getOrElseUpdate(num, parseObjAt(num)) match {
      case PNull if !objOffsets.contains(num) =>
        objStmObjects.getOrElse(num, PNull) // compressed object streams
      case other => other
    }

    private def parseObjAt(num: Int): PObj = {
      val parsed = parseObjRaw(num)
      cryptState match {
        case Some(c) if num != encObjNum =>
          decryptObj(c, num, objGens.getOrElse(num, 0), parsed)
        case _ => parsed
      }
    }

    private def parseObjRaw(num: Int): PObj = objOffsets.get(num) match {
      case None => PNull
      case Some(off) =>
        val lex = new Lexer(bytes)
        lex.pos = off
        lex.next(); lex.next() // obj number, generation
        lex.next() match {
          case Some(POp("obj")) => ()
          case _                => () // lexer may fold differently; tolerate
        }
        lex.skipWs()
        // after "N G obj": the object value
        val headEnd = raw.indexOf("obj", off) + 3
        lex.pos = math.max(lex.pos, headEnd)
        lex.next() match {
          case Some(d: PDict) =>
            lex.skipWs()
            if (raw.startsWith("stream", lex.pos)) {
              var p = lex.pos + "stream".length
              if (p < bytes.length && bytes(p) == '\r'.toByte) p += 1
              if (p < bytes.length && bytes(p) == '\n'.toByte) p += 1
              val len = deref(d.m.getOrElse("Length", PNull)) match {
                case Some(PNum(v)) => v.toInt
                case _ =>
                  val e = raw.indexOf("endstream", p)
                  if (e < 0) 0 else e - p
              }
              val end = math.min(p + len, bytes.length)
              PStream(d, java.util.Arrays.copyOfRange(bytes, p, end))
            } else d
          case Some(o) => o
          case None    => PNull
        }
    }

    /** Dereference with a visited-set cycle guard: a crafted ref cycle
      * ("1 0 obj 2 0 R" / "2 0 obj 1 0 R", or a self-reference) must
      * resolve to null, not StackOverflowError — a stack overflow is an
      * Error that escapes the extractor's NonFatal taxonomy and would
      * kill the whole Spark task from one poison document.
      */
    def deref(o: PObj): Option[PObj] = o match {
      case PRef(num0, _) =>
        val seen = scala.collection.mutable.Set[Int](num0)
        var cur: PObj = obj(num0)
        var done = false
        while (!done) cur match {
          case PRef(n, _) =>
            if (seen.add(n)) cur = obj(n)
            else { cur = PNull; done = true } // ref cycle: treat as missing
          case _ => done = true
        }
        Some(cur)
      case PNull => None
      case other => Some(other)
    }

    def decodeStream(s: PStream): Array[Byte] = {
      val filters: Seq[String] = deref(s.dict.m.getOrElse("Filter", PNull)) match {
        case Some(PName(f))   => Seq(f)
        case Some(PArr(fs))   => fs.collect { case PName(f) => f }
        case _                => Seq.empty
      }
      filters.foldLeft(s.raw) { (data, f) =>
        f match {
          case "FlateDecode" => inflate(data)
          case "ASCIIHexDecode" =>
            val hex = new String(data, StandardCharsets.ISO_8859_1)
              .takeWhile(_ != '>').filterNot(_.isWhitespace)
            val padded = if (hex.length % 2 == 1) hex + "0" else hex
            padded.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray
          case _ => data // unsupported filter: pass through (best effort)
        }
      }
    }

    private def inflate(data: Array[Byte]): Array[Byte] = {
      val inf = PdfKernel.inflaters.get()
      inf.reset()
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(data.length * 4)
      val buf = new Array[Byte](16384)
      val maxOut = 256 << 20 // decompression-bomb guard
      try {
        while (!inf.finished() && !inf.needsInput()) {
          val k = inf.inflate(buf)
          if (k == 0 && !inf.finished()) return out.toByteArray
          out.write(buf, 0, k)
          if (out.size() > maxOut)
            throw new PdfParseException("FlateDecode output exceeds bound")
        }
        out.toByteArray
      } catch {
        case _: java.util.zip.DataFormatException =>
          throw new PdfParseException("bad FlateDecode stream")
      } // no end(): the thread-local instance is reused (reset() above)
    }

    def pages: Vector[PDict] = {
      val rootOpt = deref(trailer.m.getOrElse("Root", PNull)).collect { case d: PDict => d }
      val pagesRoot = rootOpt.flatMap(r => deref(r.m.getOrElse("Pages", PNull)))
        .collect { case d: PDict => d }
      val out = Vector.newBuilder[PDict]
      // each referenced kid object number is walked at most once: a cyclic
      // /Kids array with multiple back-references is otherwise a traversal
      // bomb (fan-out^depth) even under a depth cap
      val seenKids = scala.collection.mutable.Set[Int]()
      def walk(node: PDict, depth: Int): Unit = {
        if (depth > 64) return
        node.m.get("Type") match {
          case Some(PName("Page")) => out += node
          case _ =>
            deref(node.m.getOrElse("Kids", PNull)) match {
              case Some(PArr(kids)) =>
                kids.foreach {
                  case r @ PRef(n, _) =>
                    if (seenKids.add(n))
                      deref(r).collect { case d: PDict => walk(d, depth + 1) }
                  case k =>
                    deref(k).collect { case d: PDict => walk(d, depth + 1) }
                }
              case _ => ()
            }
        }
      }
      pagesRoot.foreach(walk(_, 0))
      val res = out.result()
      if (res.isEmpty) {
        // fallback: any object that looks like a page
        objOffsets.keys.toSeq.sorted.foreach { num =>
          obj(num) match {
            case d: PDict if d.m.get("Type").contains(PName("Page")) => out += d
            case _ => ()
          }
        }
        out.result()
      } else res
    }

    def info: Option[PDict] =
      deref(trailer.m.getOrElse("Info", PNull)).collect { case d: PDict => d }
  }

  // ------------------------------------------------------------ metadata
  private def infoMetadata(doc: Doc, version: String, nPages: Int, body: String,
      unmappedGlyphs: Int): Map[String, String] = {
    var meta = Map(
      "dc:format" -> s"application/pdf; version=$version",
      "pdf:PDFVersion" -> version,
      "xmpTPg:NPages" -> nPages.toString)
    if (nPages > 0) {
      meta += ("pdf:charsPerPage" -> (body.length / nPages).toString)
      // per-page average of glyphs a ToUnicode CMap failed to map
      // (reference: lib/rika.rb:92-95; absent in metadata-only mode like
      // charsPerPage)
      meta += ("pdf:unmappedUnicodeCharsPerPage" -> (unmappedGlyphs / nPages).toString)
    }
    doc.info.foreach { d =>
      def str(k: String): Option[String] = d.m.get(k).flatMap {
        case PStr(b) => Some(decodePdfString(b))
        case _       => None
      }
      str("Title").foreach { v => meta ++= Map("dc:title" -> v, "pdf:docinfo:title" -> v) }
      str("Author").foreach { v =>
        meta ++= Map("dc:creator" -> v, "pdf:docinfo:creator" -> v)
      }
      str("Creator").foreach { v =>
        meta ++= Map("xmp:CreatorTool" -> v, "pdf:docinfo:creator_tool" -> v)
      }
      str("Producer").foreach { v =>
        meta ++= Map("pdf:producer" -> v, "pdf:docinfo:producer" -> v)
      }
      str("CreationDate").foreach(v => meta += ("pdf:docinfo:created" -> v))
      str("ModDate").foreach(v => meta += ("pdf:docinfo:modified" -> v))
      str("Subject").foreach { v =>
        meta ++= Map("dc:subject" -> v, "pdf:docinfo:subject" -> v)
      }
      str("Keywords").foreach(v => meta += ("pdf:docinfo:keywords" -> v))
    }
    meta
  }

  /** PDF text string: UTF-16BE with BOM, else PDFDocEncoding (~latin-1). */
  private def decodePdfString(b: Array[Byte]): String =
    if (b.length >= 2 && (b(0) & 0xff) == 0xfe && (b(1) & 0xff) == 0xff)
      new String(b, 2, b.length - 2, StandardCharsets.UTF_16BE)
    else new String(b, StandardCharsets.ISO_8859_1)
}
