package graft.corpus

import java.util.SplittableRandom

/** Deterministic HTML writer: wraps generated main content in realistic
  * boilerplate (nav, header banner, link farms, footer) so HtmlKernel's
  * block classifier is exercised with a known expected kept-set.
  */
object HtmlWriter {

  final case class Spec(title: String, heading: String,
      paragraphs: Vector[String],
      // data tables in the main content: rows of cells, each row kept
      // as ONE tab-joined block (>= 2 cells triggers the data-table
      // keep rule even for short cells)
      tables: Vector[Vector[Vector[String]]] = Vector.empty,
      // bulleted lists in the main content: rendered right after the
      // paragraphs so the list-run rule (preceded-by-core) keeps the
      // items even when short
      lists: Vector[Vector[String]] = Vector.empty)

  /** Expected kept blocks: heading + paragraphs + list items + table
    * rows (cells tab-joined), whitespace-normalized — generator text is
    * already single-spaced so this is the identity.
    */
  def expectedBlocks(spec: Spec): Vector[String] =
    (spec.heading +: spec.paragraphs) ++ spec.lists.flatten ++
      spec.tables.flatMap(_.map(_.mkString("\t")))

  def write(spec: Spec, rng: SplittableRandom): String = {
    val navLinks = (0 until 4 + rng.nextInt(5))
      .map(k => s"""<a href="/p$k">item$k</a>""").mkString(" | ")
    val farm = (0 until 8 + rng.nextInt(8))
      .map(k => s"""<a href="/t$k">tag$k</a>""").mkString(" ")
    val e = DocxWriter.xmlEsc _
    val listsHtml = spec.lists.map { items =>
      items.map(it => s"<li>${e(it)}</li>").mkString("<ul>\n", "\n", "\n</ul>")
    }.mkString("\n")
    val tablesHtml = spec.tables.map { rows =>
      val trs = rows.map(cells =>
        cells.map(c => s"<td>${e(c)}</td>").mkString("<tr>", "", "</tr>"))
        .mkString("\n")
      s"<table>\n$trs\n</table>"
    }.mkString("\n")
    s"""<!DOCTYPE html>
<html><head><title>${e(spec.title)}</title>
<style>body { margin: 0 } .x { color: #333 }</style>
<script>function t(){ return ${rng.nextInt(1000)}; }</script>
</head><body>
<nav>$navLinks</nav>
<header><div>promo banner ${rng.nextInt(100)}</div></header>
<article>
<h1>${e(spec.heading)}</h1>
${spec.paragraphs.map(p => s"<p>${e(p)}</p>").mkString("\n")}
$listsHtml
$tablesHtml
</article>
<div class="farm">$farm</div>
<footer>site footer legal text ${rng.nextInt(100)}</footer>
</body></html>"""
  }
}
