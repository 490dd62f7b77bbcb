package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.api.{Equipment, MarkdownHtml}

/** export_to_html twin (scheduler.py:216-294): the inspection report's
  * markdown renders to the reference's styled-HTML shape. The full-document
  * render is pinned by a golden file so any drift in the HTML contract is a
  * visible diff; set GRAFT_REGEN_GOLDEN=1 to regenerate after an intentional
  * change.
  */
class MarkdownHtmlSpec extends AnyFunSuite {

  private def report: String = {
    import graft.sources.ComponentSource.{ColumnSpec, ComponentSpec}
    val schema = Seq(
      ComponentSpec("pump", Seq(ColumnSpec("Timestamp", "DATETIME"),
        ColumnSpec("s1", "DOUBLE"), ColumnSpec("s2", "DOUBLE"))),
      ComponentSpec("motor", Seq(ColumnSpec("Timestamp", "DATETIME"),
        ColumnSpec("s3", "DOUBLE"))))
    Equipment.buildInspectionReport(
      "sched-1", 15, 5, "s3://bucket/prefix/", schema,
      java.sql.Timestamp.valueOf("2020-03-05 10:17:42"))
  }

  test("inline spans: code protected, strong before em, HTML escaped") {
    assert(MarkdownHtml.inline("wake **every 15** minutes") ===
      "wake <strong>every 15</strong> minutes")
    assert(MarkdownHtml.inline("*report run at: t*") ===
      "<em>report run at: t</em>")
    // code content is literal: stars inside backticks survive unstyled
    assert(MarkdownHtml.inline("see `s3://b/p/*.csv` now") ===
      "see <code>s3://b/p/*.csv</code> now")
    // escape-then-markup: raw angle brackets cannot inject tags
    assert(MarkdownHtml.inline("a <b> & `x<y`") ===
      "a &lt;b&gt; &amp; <code>x&lt;y</code>")
  }

  test("bullet list groups loose items into one ul") {
    val html = MarkdownHtml.renderBody("intro\n\n* one **1**\n\n* two\n\nafter")
    assert(html ===
      "<p>intro</p>\n<ul>\n<li>one <strong>1</strong></li>\n<li>two</li>\n</ul>\n<p>after</p>\n")
  }

  test("pipe table renders thead th / tbody td, ragged rows padded") {
    val html = MarkdownHtml.renderBody(" | a | b|\n| --- | --- |\n| 1| 2 |\n| 3|")
    assert(html.contains("<table>\n<thead>\n<tr>\n<th>a</th>\n<th>b</th>\n</tr>\n</thead>"))
    assert(html.contains("<tbody>\n<tr>\n<td>1</td>\n<td>2</td>\n</tr>\n<tr>\n<td>3</td>\n<td></td>\n</tr>\n</tbody>"))
  }

  test("inspection report HTML matches the golden file") {
    val html = MarkdownHtml.render(report)
    // structural invariants independent of the golden bytes
    assert(html.startsWith("<!DOCTYPE html>"))
    assert(html.contains("<strong>SCHEDULER: sched-1</strong>"))
    assert(html.contains("<code>pump_20200305101500.csv</code>"))
    assert(html.contains("<th>Timestamp</th>"))
    assert(html.contains("<td>2020-03-05 10:15:00</td>"))
    assert(html.contains("<td>...</td>"))
    // one table per component
    assert("<table>".r.findAllIn(html).size === 2)
    assert(html.endsWith("</body>\n</html>\n"))

    val golden = java.nio.file.Paths.get("src/test/resources/inspection-report.html")
    if (sys.env.get("GRAFT_REGEN_GOLDEN").contains("1")) {
      java.nio.file.Files.write(golden,
        html.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    val expected = new String(java.nio.file.Files.readAllBytes(golden),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(html === expected)
  }

  test("buildEventReport renders plot_event_barh's content: top-N, percent format, uniform line") {
    // 5 signals → uniform line at 20.00%; top 3 requested
    val details = Seq(
      ("s_flow", 0.42), ("s_temp", 0.25), ("s_pressure", 0.18),
      ("s_rpm", 0.10), ("s_voltage", 0.05))
    val md = Equipment.buildEventReport("2024-01-01 00:10:00", details, numSignals = 3)
    assert(md.contains("**Event detected at 2024-01-01 00:10:00**"))
    assert(md.contains("20.00%")) // 1/5 uniform-contribution line
    // top-3 by importance, descending, reference {v*100:.2f}% formatting
    val rows = md.linesIterator.filter(_.matches("\\| s_.*")).toSeq
    assert(rows === Seq(
      "| s_flow | 42.00% | yes |",
      "| s_temp | 25.00% | yes |",
      "| s_pressure | 18.00% | no |"))
    // golden-pins the rendered section so content drift is a visible diff
    val html = MarkdownHtml.render(md)
    val golden = java.nio.file.Paths.get("src/test/resources/event-report.html")
    if (sys.env.get("GRAFT_REGEN_GOLDEN").contains("1")) {
      java.nio.file.Files.write(golden,
        html.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    val expected = new String(java.nio.file.Files.readAllBytes(golden),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(html === expected)
  }

  test("exportToFile writes the rendered document") {
    val tmp = java.nio.file.Files.createTempFile("report", ".html")
    val html = MarkdownHtml.exportToFile(report, tmp)
    val onDisk = new String(java.nio.file.Files.readAllBytes(tmp),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(onDisk === html)
    java.nio.file.Files.delete(tmp)
  }
}
