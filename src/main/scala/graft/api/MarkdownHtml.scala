package graft.api

/** Markdown → HTML renderer for the scheduler inspection report — the Spark
  * twin of the reference's `export_to_html` (scheduler.py:216-294), which
  * wraps `markdown.markdown(report, extensions=['tables'])` output in a fixed
  * styled HTML shell.
  *
  * This is deliberately NOT a general Markdown engine: it covers exactly the
  * constructs `buildInspectionReport` emits (the same subset the reference
  * report uses) — paragraphs, `**strong**`, `*emphasis*`, backtick code
  * spans, `* ` bullet lists, and pipe tables with a `| --- |` separator row
  * (the python-markdown `tables` extension's shape: thead with th cells,
  * tbody with td cells). Anything fancier stays out; report rendering is a
  * driver-side convenience, not a data-plane operator.
  *
  * One reference quirk intentionally NOT mirrored: scheduler.py:286-294 only
  * writes the file in the `else` branch, so calling `export_to_html` before
  * `build_inspection_report` silently writes nothing. Here the render is a
  * pure function of the markdown string and the optional write always
  * happens.
  */
object MarkdownHtml {

  val htmlHeader: String = """<!DOCTYPE html>
<html>
    <head>
        <style>
            body {
                font-family: Helvetica, Arial, sans-serif;
                font-size: 14px;
                background-color: #F2F3F3
            }
            table {
                border-collapse: collapse;
                padding: 2px 2px 2px 2px;
                margin: 0px 0px 0px 40px;
                font-size: 12px;
                border: 1px solid #EAEDED;
                box-shadow: 0 0 7px #D4D9DA;
            }
            thead {
                background-color: #FAFAFA;
                text-align: center;
                height: 20px
            }
            th { padding: 5px 15px 5px 15px }
            td { height: 15px; text-align: right; }
            code { color: #3184C2; font-weight: bold }
            ul { list-style: disc outside none; }
        </style>
    </head>

    <body>
"""

  val htmlFooter: String = "\n    </body>\n</html>\n"

  private def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Inline spans: code first (its content is literal — no strong/em inside),
    * then strong, then em. Escaping happens before span markup is inserted.
    */
  def inline(raw: String): String = {
    val codeRe = "`([^`]+)`".r
    // Protect code spans behind placeholders so `**` inside code stays literal.
    val saved = scala.collection.mutable.ArrayBuffer.empty[String]
    val holed = codeRe.replaceAllIn(escape(raw), m => {
      saved += m.group(1)
      java.util.regex.Matcher.quoteReplacement(s"\u0001${saved.size - 1}\u0001")
    })
    val strong = "\\*\\*([^*]+)\\*\\*".r
      .replaceAllIn(holed, m => java.util.regex.Matcher.quoteReplacement(s"<strong>${m.group(1)}</strong>"))
    val em = "\\*([^*]+)\\*".r
      .replaceAllIn(strong, m => java.util.regex.Matcher.quoteReplacement(s"<em>${m.group(1)}</em>"))
    "\u0001(\\d+)\u0001".r.replaceAllIn(em,
      m => java.util.regex.Matcher.quoteReplacement(s"<code>${saved(m.group(1).toInt)}</code>"))
  }

  private def isTableSep(line: String): Boolean =
    line.trim.matches("\\|?(\\s*:?-{3,}:?\\s*\\|)+\\s*\\|?")

  private def cells(line: String): Seq[String] =
    line.trim.stripPrefix("|").stripSuffix("|").split("\\|", -1).toSeq.map(_.trim)

  /** Render the report markdown body to HTML (no shell). Blocks are
    * blank-line separated; consecutive bullet blocks merge into one list
    * (python-markdown's loose-list behavior, minus the per-item <p> wrap).
    */
  def renderBody(md: String): String = {
    val lines = md.split("\n", -1)
    val out = new StringBuilder
    var i = 0
    var openList = false
    def closeList(): Unit = if (openList) { out ++= "</ul>\n"; openList = false }
    while (i < lines.length) {
      val line = lines(i)
      if (line.trim.isEmpty) {
        // blank: list stays open until a non-list block arrives (loose list)
        i += 1
      } else if (line.startsWith("* ")) {
        if (!openList) { out ++= "<ul>\n"; openList = true }
        // a bullet's continuation lines (until blank) belong to the same item
        val item = new StringBuilder(line.drop(2))
        i += 1
        while (i < lines.length && lines(i).trim.nonEmpty && !lines(i).startsWith("* ") &&
               !lines(i).trim.startsWith("|") && !lines(i).trim.startsWith(" |")) {
          item ++= "\n" + lines(i); i += 1
        }
        out ++= s"<li>${inline(item.toString)}</li>\n"
      } else if (line.trim.startsWith("|") && i + 1 < lines.length && isTableSep(lines(i + 1))) {
        closeList()
        val header = cells(line)
        i += 2
        val rows = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
        while (i < lines.length && lines(i).trim.startsWith("|")) {
          rows += cells(lines(i)); i += 1
        }
        out ++= "<table>\n<thead>\n<tr>\n"
        header.foreach(h => out ++= s"<th>${inline(h)}</th>\n")
        out ++= "</tr>\n</thead>\n<tbody>\n"
        rows.foreach { r =>
          out ++= "<tr>\n"
          // pad/truncate body rows to the header width, as the tables ext does
          (0 until header.length).foreach { c =>
            out ++= s"<td>${inline(if (c < r.length) r(c) else "")}</td>\n"
          }
          out ++= "</tr>\n"
        }
        out ++= "</tbody>\n</table>\n"
      } else {
        closeList()
        val para = new StringBuilder(line)
        i += 1
        while (i < lines.length && lines(i).trim.nonEmpty && !lines(i).startsWith("* ")) {
          para ++= "\n" + lines(i); i += 1
        }
        out ++= s"<p>${inline(para.toString)}</p>\n"
      }
    }
    closeList()
    out.toString
  }

  /** Full-document render: the reference's header + rendered body + footer. */
  def render(md: String): String = htmlHeader + renderBody(md) + htmlFooter

  /** Render and write — `export_to_html(html_path)`'s file side. Returns the
    * HTML so callers can golden-compare without re-reading the file.
    */
  def exportToFile(md: String, path: java.nio.file.Path): String = {
    val html = render(md)
    java.nio.file.Files.write(path, html.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    html
  }
}
