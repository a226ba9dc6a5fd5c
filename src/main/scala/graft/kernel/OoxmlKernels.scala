package graft.kernel

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

/** Shared OOXML plumbing (zip walk + streaming StAX, hardened factory,
  * docProps mapping) for the DOCX/XLSX/PPTX kernels. The reference covers
  * these formats by delegating to the Tika jar ("any file type Tika
  * supports", reference: README.md:3-8); here each is a from-scratch
  * JDK-only kernel.
  */
private[kernel] object OoxmlUtil {

  val factory: XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, java.lang.Boolean.FALSE)
    f
  }

  /** Decompressed-size bound (same posture as PdfKernel.inflate): a
    * zip-bomb part must fail the taxonomy, not OOM the executor.
    */
  val MaxPartBytes: Int = 256 << 20

  def readAll(zis: ZipInputStream): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = zis.read(buf)
    while (n >= 0) {
      out.write(buf, 0, n)
      if (out.size() > MaxPartBytes)
        throw new IllegalArgumentException("OOXML part exceeds inflate bound")
      n = zis.read(buf)
    }
    out.toByteArray
  }

  /** Walk all zip entries, handing each (name, lazily-read bytes) to `f`
    * (f decides whether to read; unread entries are skipped cheaply).
    */
  def walkZip(bytes: Array[Byte])(f: (String, () => Array[Byte]) => Unit): Unit = {
    val zis = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var entry = zis.getNextEntry
      while (entry != null) {
        f(entry.getName, () => readAll(zis))
        entry = zis.getNextEntry
      }
    } finally zis.close()
  }

  /** docProps/core.xml -> dc:* / cp:* metadata keys. */
  def coreProps(xml: Array[Byte]): Map[String, String] =
    flatElements(xml).flatMap {
      case ("title", v)          => Seq("dc:title" -> v)
      case ("creator", v)        => Seq("dc:creator" -> v, "meta:author" -> v)
      case ("subject", v)        => Seq("dc:subject" -> v)
      case ("description", v)    => Seq("dc:description" -> v)
      case ("language", v)       => Seq("dc:language" -> v)
      case ("lastModifiedBy", v) => Seq("meta:last-author" -> v)
      case ("revision", v)       => Seq("cp:revision" -> v)
      case ("created", v)        => Seq("dcterms:created" -> v)
      case ("modified", v)       => Seq("dcterms:modified" -> v)
      case _                     => Nil
    }.toMap

  /** docProps/app.xml -> meta:* / extended-properties:* keys. All values
    * stay strings (reference data model: every metadata value is a string,
    * spec/rika/parser_spec.rb:200).
    */
  def appProps(xml: Array[Byte]): Map[String, String] =
    flatElements(xml).flatMap {
      case ("Pages", v)                => Seq("meta:page-count" -> v, "xmpTPg:NPages" -> v)
      case ("Slides", v)               => Seq("meta:slide-count" -> v)
      case ("Words", v)                => Seq("meta:word-count" -> v)
      case ("Characters", v)           => Seq("meta:character-count" -> v)
      case ("CharactersWithSpaces", v) => Seq("meta:character-count-with-spaces" -> v)
      case ("Lines", v)                => Seq("meta:line-count" -> v)
      case ("Paragraphs", v)           => Seq("meta:paragraph-count" -> v)
      case ("Application", v)          => Seq("extended-properties:Application" -> v)
      case ("AppVersion", v)           => Seq("extended-properties:AppVersion" -> v)
      case ("Company", v)              => Seq("extended-properties:Company" -> v)
      case ("Template", v)             => Seq("extended-properties:Template" -> v)
      case _                           => Nil
    }.toMap

  /** Flatten an XML doc to (localName, textContent) for leaf elements. */
  def flatElements(xml: Array[Byte]): Vector[(String, String)] = {
    val r: XMLStreamReader = factory.createXMLStreamReader(new ByteArrayInputStream(xml))
    val out = Vector.newBuilder[(String, String)]
    var name: String = null
    val cur = new StringBuilder
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            name = r.getLocalName; cur.setLength(0)
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if (name != null) cur.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            if (name == r.getLocalName && cur.nonEmpty) out += (name -> cur.toString)
            name = null
          case _ => ()
        }
      }
    } finally r.close()
    out.result()
  }
}

/** XLSX (spreadsheetml) text extractor: shared-strings table + worksheet
  * cell walk. Text shape follows Tika's spreadsheet convention: one line
  * per row, cells tab-separated, sheets separated by a blank line.
  */
object XlsxKernel {

  final case class Result(sheets: Vector[String], metadata: Map[String, String]) {
    def text: String = sheets.filter(_.nonEmpty).mkString("\n\n")
  }

  def extract(bytes: Array[Byte]): Result = {
    // ZipInputStream is sequential and sharedStrings may follow the
    // sheets, so buffer the parts and parse once the walk completes
    var shared = Vector.empty[String]
    var sheets = Vector.empty[(String, Array[Byte])]
    var meta = Map.empty[String, String]
    OoxmlUtil.walkZip(bytes) { (name, read) =>
      if (name == "xl/sharedStrings.xml") shared = sharedStrings(read())
      else if (name.startsWith("xl/worksheets/sheet") && name.endsWith(".xml"))
        sheets :+= (name, read())
      else if (name == "docProps/core.xml") meta ++= OoxmlUtil.coreProps(read())
      else if (name == "docProps/app.xml") meta ++= OoxmlUtil.appProps(read())
    }
    val texts = sheets.sortBy(s => sheetOrd(s._1)).map(s => sheetText(s._2, shared))
    Result(texts, meta)
  }

  private def sheetOrd(name: String): (Int, String) = {
    val digits = name.dropWhile(!_.isDigit).takeWhile(_.isDigit)
    (if (digits.nonEmpty) digits.toInt else Int.MaxValue, name)
  }

  /** xl/sharedStrings.xml: each si = concatenated t runs. */
  private def sharedStrings(xml: Array[Byte]): Vector[String] = {
    val r = OoxmlUtil.factory.createXMLStreamReader(new ByteArrayInputStream(xml))
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var inSi = false
    var inT = false
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            case "si" => inSi = true; cur.setLength(0)
            case "t" if inSi => inT = true
            case _ => ()
          }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if (inT) cur.append(r.getText)
          case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
            case "si" => if (inSi) { out += cur.toString; inSi = false }
            case "t"  => inT = false
            case _    => ()
          }
          case _ => ()
        }
      }
    } finally r.close()
    out.result()
  }

  /** One worksheet: rows -> lines, cells -> tab-separated. Cell types:
    * t="s" shared-string index, t="inlineStr" inline is/t, else raw v.
    */
  private def sheetText(xml: Array[Byte], shared: Vector[String]): String = {
    val r = OoxmlUtil.factory.createXMLStreamReader(new ByteArrayInputStream(xml))
    val rows = Vector.newBuilder[String]
    val cells = Vector.newBuilder[String]
    val cur = new StringBuilder
    var inRow = false
    var cellType = ""
    var inV = false
    var inIsT = false
    var nCells = 0
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            case "row" => inRow = true; cells.clear(); nCells = 0
            case "c" if inRow =>
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
              cur.setLength(0)
            case "v" => inV = true
            case "t" if cellType == "inlineStr" => inIsT = true
            case _ => ()
          }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if (inV || inIsT) cur.append(r.getText)
          case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
            case "c" if inRow =>
              val raw = cur.toString
              val v =
                if (cellType == "s")
                  raw.toIntOption.flatMap(shared.lift).getOrElse("")
                else raw
              cells += v
              nCells += 1
            case "v" => inV = false
            case "t" => inIsT = false
            case "row" =>
              if (inRow && nCells > 0) rows += cells.result().mkString("\t")
              inRow = false
            case _ => ()
          }
          case _ => ()
        }
      }
    } finally r.close()
    rows.result().mkString("\n")
  }
}

/** PPTX (presentationml) text extractor: slides in numeric order, one
  * paragraph per a:p (concatenated a:t runs), slides separated by a blank
  * line; SPEAKER NOTES (ppt/notesSlides/notesSlideN.xml) follow their
  * slide as their own block — the same surface Tika emits.
  */
object PptxKernel {

  final case class Result(slides: Vector[String], metadata: Map[String, String]) {
    def text: String = slides.filter(_.nonEmpty).mkString("\n\n")
  }

  private val SlideName = """ppt/slides/slide(\d+)\.xml""".r
  private val NotesName = """ppt/notesSlides/notesSlide(\d+)\.xml""".r

  def extract(bytes: Array[Byte]): Result = {
    var slides = Vector.empty[(Int, Array[Byte])]
    var notes = Vector.empty[(Int, Array[Byte])]
    var meta = Map.empty[String, String]
    OoxmlUtil.walkZip(bytes) { (name, read) =>
      name match {
        case SlideName(n)        => slides :+= (n.toInt, read())
        case NotesName(n)        => notes :+= (n.toInt, read())
        case "docProps/core.xml" => meta ++= OoxmlUtil.coreProps(read())
        case "docProps/app.xml"  => meta ++= OoxmlUtil.appProps(read())
        case _                   => ()
      }
    }
    val noteByNum = notes.groupBy(_._1).view.mapValues(_.head._2).toMap
    val texts = slides.sortBy(_._1).flatMap { case (n, x) =>
      Vector(slideText(x)) ++ noteByNum.get(n).map(slideText)
    }
    Result(texts, meta)
  }

  /** a:p paragraphs in order; drawingml TABLES (a:tbl/a:tr/a:tc inside
    * a graphicFrame) emit one tab-joined line per row, cell paragraphs
    * newline-joined inside their field — the shared row convention.
    */
  private def slideText(xml: Array[Byte]): String = {
    val r = OoxmlUtil.factory.createXMLStreamReader(new ByteArrayInputStream(xml))
    val paras = Vector.newBuilder[String]
    val cur = new StringBuilder
    var inP = false
    var inT = false
    var cellDepth = 0
    var cellParas = Vector.empty[String]
    var rowCells = Vector.empty[String]
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            case "p" => inP = true; cur.setLength(0)
            case "t" if inP => inT = true
            case "br" if inP => cur.append('\n')
            case "tc" => cellDepth += 1; if (cellDepth == 1) cellParas = Vector.empty
            case "tr" if cellDepth == 0 => rowCells = Vector.empty
            case _ => ()
          }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if (inT) cur.append(r.getText)
          case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
            case "p" =>
              if (inP) {
                if (cellDepth > 0) cellParas :+= cur.toString
                else paras += cur.toString
                inP = false
              }
            case "t" => inT = false
            case "tc" =>
              if (cellDepth > 0) {
                cellDepth -= 1
                if (cellDepth == 0) {
                  rowCells :+= cellParas.filter(_.nonEmpty).mkString("\n")
                  cellParas = Vector.empty
                }
              }
            case "tr" if cellDepth == 0 =>
              // empty rows add no blank line (ADVICE r5)
              if (rowCells.exists(_.nonEmpty)) paras += rowCells.mkString("\t")
              rowCells = Vector.empty
            case _ => ()
          }
          case _ => ()
        }
      }
    } finally r.close()
    paras.result().filter(_.nonEmpty).mkString("\n")
  }
}
