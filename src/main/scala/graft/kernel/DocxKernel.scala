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

  def extract(bytes: Array[Byte]): Result = {
    var paragraphs = Vector.empty[String]
    var meta = Map.empty[String, String]
    OoxmlUtil.walkZip(bytes) { (name, read) =>
      name match {
        case "word/document.xml" => paragraphs = bodyParagraphs(read())
        case "docProps/core.xml" => meta ++= OoxmlUtil.coreProps(read())
        case "docProps/app.xml"  => meta ++= OoxmlUtil.appProps(read())
        case _                   => ()
      }
    }
    Result(paragraphs, meta)
  }

  /** Pull `<w:p>` paragraph boundaries and `<w:t>` text runs; tabs and
    * breaks become characters inside the paragraph.
    */
  private def bodyParagraphs(xml: Array[Byte]): Vector[String] = {
    val r = OoxmlUtil.factory.createXMLStreamReader(new ByteArrayInputStream(xml))
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

}
