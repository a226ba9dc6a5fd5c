package graft.kernel

import java.io.ByteArrayInputStream
import javax.xml.stream.XMLStreamConstants

/** E4 - OOXML (docx) extractor: zip walk + streaming XML pull, from scratch
  * (JDK-only: java.util.zip + javax.xml.stream).
  *
  * Observable reference contract: first content line equals the document
  * body's first paragraph (spec/rika/parser_spec.rb:153-155); metadata
  * carries meta:page-count='1' (spec/rika/parser_spec.rb:199-201); content
  * type is the full OOXML wordprocessing MIME
  * (spec/rika/parser_spec.rb:245-249).
  *
  * Structural breadth (the commonest real-document shapes): TABLES
  * (w:tbl -> one line per w:tr, cells tab-separated, like the XLSX
  * kernel's rows), HEADERS/FOOTERS (word/headerN.xml before the body,
  * word/footerN.xml after, each in part-name order), and FOOTNOTES
  * (word/footnotes.xml after the body, separator/continuation stubs
  * skipped) — the same text surface Tika emits for these parts.
  */
object DocxKernel {

  final case class Result(paragraphs: Vector[String], metadata: Map[String, String])

  def extract(bytes: Array[Byte]): Result = {
    var body = Vector.empty[String]
    var meta = Map.empty[String, String]
    var headers = Vector.empty[(String, Vector[String])]
    var footers = Vector.empty[(String, Vector[String])]
    var footnotes = Vector.empty[String]
    OoxmlUtil.walkZip(bytes) { (name, read) =>
      name match {
        case "word/document.xml"  => body = parseParas(read(), skipSeparators = false)
        case "word/footnotes.xml" => footnotes = parseParas(read(), skipSeparators = true)
        case "docProps/core.xml"  => meta ++= OoxmlUtil.coreProps(read())
        case "docProps/app.xml"   => meta ++= OoxmlUtil.appProps(read())
        case n if n.startsWith("word/header") && n.endsWith(".xml") =>
          headers :+= (n -> parseParas(read(), skipSeparators = false))
        case n if n.startsWith("word/footer") && n.endsWith(".xml") =>
          footers :+= (n -> parseParas(read(), skipSeparators = false))
        case _ => ()
      }
    }
    val paragraphs =
      headers.sortBy(_._1).flatMap(_._2) ++ body ++ footnotes ++
        footers.sortBy(_._1).flatMap(_._2)
    Result(paragraphs, meta)
  }

  /** Pull `<w:p>` paragraph boundaries and `<w:t>` text runs; tabs and
    * breaks become characters inside the paragraph. Table cells (w:tc)
    * collect their own paragraphs; a table row (w:tr) emits ONE line of
    * tab-separated cell texts. With `skipSeparators` (footnotes part),
    * w:footnote elements typed separator/continuationSeparator are
    * skipped wholesale.
    */
  private def parseParas(xml: Array[Byte], skipSeparators: Boolean): Vector[String] = {
    val r = OoxmlUtil.factory.createXMLStreamReader(new ByteArrayInputStream(xml))
    val paras = Vector.newBuilder[String]
    val cur = new StringBuilder
    var inPara = false
    var inText = false
    var cellDepth = 0
    var cellParas = Vector.empty[String]
    var rowCells = Vector.empty[String]
    var skipDepth = 0
    def sepType(): Boolean = {
      var i = 0
      while (i < r.getAttributeCount) {
        if (r.getAttributeLocalName(i) == "type") {
          val v = r.getAttributeValue(i)
          return v == "separator" || v == "continuationSeparator"
        }
        i += 1
      }
      false
    }
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            if (skipDepth > 0) skipDepth += 1
            else r.getLocalName match {
              case "footnote" if skipSeparators && sepType() => skipDepth = 1
              case "p"                   => inPara = true; cur.setLength(0)
              case "t"                   => inText = true
              case "tc"                  => cellDepth += 1; cellParas = Vector.empty
              case "tr" if cellDepth == 0 => rowCells = Vector.empty
              case "tab" if inPara       => cur.append('\t')
              case "br" | "cr" if inPara => cur.append('\n')
              case _                     => ()
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if (skipDepth == 0 && inText) cur.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            if (skipDepth > 0) skipDepth -= 1
            else r.getLocalName match {
              case "p" =>
                if (inPara) {
                  if (cellDepth > 0) cellParas :+= cur.toString
                  else paras += cur.toString
                  inPara = false
                }
              case "t" => inText = false
              case "tc" =>
                cellDepth -= 1
                rowCells :+= cellParas.mkString("\n")
                cellParas = Vector.empty
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
    paras.result()
  }

}
