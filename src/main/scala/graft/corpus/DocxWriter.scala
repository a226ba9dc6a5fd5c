package graft.corpus

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{CRC32, ZipEntry, ZipOutputStream}

/** Deterministic OOXML (docx) writer for the synthetic corpus: a real zip
  * (fixed timestamps for byte-determinism) with document.xml, core.xml,
  * app.xml — exactly the parts DocxKernel consumes.
  */
object DocxWriter {

  final case class Spec(
      title: String,
      creator: String,
      paragraphs: Vector[String],
      pages: Int)

  /** Expected extracted content: paragraphs joined by \n, trailing \n. */
  def expectedText(spec: Spec): String =
    if (spec.paragraphs.isEmpty) "" else spec.paragraphs.mkString("", "\n", "\n")

  def write(spec: Spec): Array[Byte] = {
    val words = spec.paragraphs.map(_.split("\\s+").count(_.nonEmpty)).sum
    val chars = spec.paragraphs.map(_.length).sum

    val docXml = {
      val sb = new StringBuilder
      sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>\n")
      sb.append("<w:document xmlns:w=\"http://schemas.openxmlformats.org/wordprocessingml/2006/main\"><w:body>")
      spec.paragraphs.foreach { p =>
        sb.append("<w:p><w:r><w:t xml:space=\"preserve\">")
        sb.append(xmlEsc(p))
        sb.append("</w:t></w:r></w:p>")
      }
      sb.append("<w:sectPr/></w:body></w:document>")
      sb.toString
    }
    val coreXml =
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>\n" +
      "<cp:coreProperties xmlns:cp=\"http://schemas.openxmlformats.org/package/2006/metadata/core-properties\" " +
      "xmlns:dc=\"http://purl.org/dc/elements/1.1/\" xmlns:dcterms=\"http://purl.org/dc/terms/\">" +
      s"<dc:title>${xmlEsc(spec.title)}</dc:title><dc:creator>${xmlEsc(spec.creator)}</dc:creator>" +
      "<dcterms:created>2020-07-23T17:46:39Z</dcterms:created></cp:coreProperties>"
    val appXml =
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>\n" +
      "<Properties xmlns=\"http://schemas.openxmlformats.org/officeDocument/2006/extended-properties\">" +
      s"<Pages>${spec.pages}</Pages><Words>$words</Words><Characters>$chars</Characters>" +
      "<Application>graft synthetic corpus</Application></Properties>"
    val contentTypes =
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>\n" +
      "<Types xmlns=\"http://schemas.openxmlformats.org/package/2006/content-types\">" +
      "<Default Extension=\"xml\" ContentType=\"application/xml\"/>" +
      "<Override PartName=\"/word/document.xml\" ContentType=\"application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml\"/>" +
      "</Types>"
    val rels =
      "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>\n" +
      "<Relationships xmlns=\"http://schemas.openxmlformats.org/package/2006/relationships\">" +
      "<Relationship Id=\"rId1\" Type=\"http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument\" Target=\"word/document.xml\"/>" +
      "</Relationships>"

    val out = new ByteArrayOutputStream()
    val zip = new ZipOutputStream(out)
    // STORED first entry (magic-sniff window must see the names early);
    // fixed time keeps bytes deterministic across runs/JVMs.
    def add(name: String, data: String, stored: Boolean = false): Unit = {
      val bytes = data.getBytes(StandardCharsets.UTF_8)
      val e = new ZipEntry(name)
      e.setTime(1595526399000L)
      if (stored) {
        e.setMethod(ZipEntry.STORED)
        e.setSize(bytes.length)
        val crc = new CRC32(); crc.update(bytes)
        e.setCrc(crc.getValue)
      }
      zip.putNextEntry(e)
      zip.write(bytes)
      zip.closeEntry()
    }
    add("[Content_Types].xml", contentTypes, stored = true)
    add("_rels/.rels", rels)
    add("word/document.xml", docXml)
    add("docProps/core.xml", coreXml)
    add("docProps/app.xml", appXml)
    zip.close()
    out.toByteArray
  }

  def xmlEsc(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case c   => c.toString
    }
}
