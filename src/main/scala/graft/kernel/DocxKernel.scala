package graft.kernel

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

/** E4 - OOXML (docx) extractor: zip walk + streaming XML pull, from scratch
  * (JDK-only: java.util.zip + javax.xml.stream).
  *
  * Observable reference contract: first content line equals the document
  * body's first paragraph (spec/rika/parser_spec.rb:153-155); metadata
  * carries meta:page-count='1' (spec/rika/parser_spec.rb:199-201); content
  * type is the full OOXML wordprocessing MIME
  * (spec/rika/parser_spec.rb:245-249).
  */
object DocxKernel {

  final case class Result(paragraphs: Vector[String], metadata: Map[String, String])

  private val factory: XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, java.lang.Boolean.FALSE)
    f
  }

  def extract(bytes: Array[Byte]): Result = {
    var paragraphs = Vector.empty[String]
    var meta = Map.empty[String, String]
    val zis = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var entry = zis.getNextEntry
      while (entry != null) {
        entry.getName match {
          case "word/document.xml" => paragraphs = bodyParagraphs(readAll(zis))
          case "docProps/core.xml" => meta ++= coreProps(readAll(zis))
          case "docProps/app.xml"  => meta ++= appProps(readAll(zis))
          case _                   => ()
        }
        entry = zis.getNextEntry
      }
    } finally zis.close()
    Result(paragraphs, meta)
  }

  /** Decompressed-size bound (same posture as PdfKernel.inflate): a
    * zip-bomb part must fail the taxonomy, not OOM the executor.
    */
  private val MaxPartBytes = 256 << 20

  private def readAll(zis: ZipInputStream): Array[Byte] = {
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

  /** Pull `<w:p>` paragraph boundaries and `<w:t>` text runs; tabs and
    * breaks become characters inside the paragraph.
    */
  private def bodyParagraphs(xml: Array[Byte]): Vector[String] = {
    val r = factory.createXMLStreamReader(new ByteArrayInputStream(xml))
    val paras = Vector.newBuilder[String]
    val cur = new StringBuilder
    var inPara = false
    var inText = false
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "p"                => inPara = true; cur.setLength(0)
              case "t"                => inText = true
              case "tab" if inPara    => cur.append('\t')
              case "br" | "cr" if inPara => cur.append('\n')
              case _                  => ()
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if (inText) cur.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "p" => if (inPara) { paras += cur.toString; inPara = false }
              case "t" => inText = false
              case _   => ()
            }
          case _ => ()
        }
      }
    } finally r.close()
    paras.result()
  }

  /** docProps/core.xml -> dc:* / cp:* metadata keys. */
  private def coreProps(xml: Array[Byte]): Map[String, String] =
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
  private def appProps(xml: Array[Byte]): Map[String, String] =
    flatElements(xml).flatMap {
      case ("Pages", v)                => Seq("meta:page-count" -> v, "xmpTPg:NPages" -> v)
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
  private def flatElements(xml: Array[Byte]): Vector[(String, String)] = {
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
