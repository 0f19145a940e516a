package graft

import graft.ingest.WorkloadViews
import graft.queries.AnalyzerGates
import graft.report.Report

/** The presentation artifact: every analyzer gets an inline SVG chart,
  * the bytes are identical across runs, and the colorblind palette switch
  * mirrors the reference's option (analyze.py:708-713).
  */
class ReportSpec extends SparkSpec {

  private def views = WorkloadViews(spark.read.parquet(AnalyzerGates.fixtureDir))

  test("report carries one inline SVG per analyzer and is byte-identical") {
    val html = Report.render(views)
    val analyzers = graft.analyze.Analyzers.all(views).size
    assert(countSvg(html) === analyzers)
    // deterministic presentation: a second render is the same bytes
    assert(Report.render(views) === html)
    // every chart family is represented over the fixture workload
    assert(html.contains("<path d=\"M"))  // pie slices
    assert(html.contains("<rect x=\""))   // bars / legends
    assert(html.contains("<circle cx=")) // scatter points
  }

  test("interactive shell: hover payloads on marks, one self-contained script") {
    val html = Report.render(views)
    // every mark family carries a hover payload for the JS tooltip
    assert("""<path [^>]*data-l="""".r.findAllIn(html).nonEmpty, "pie slices")
    assert("""<rect [^>]*data-l="""".r.findAllIn(html).nonEmpty, "bars")
    assert("""<circle [^>]*data-l="""".r.findAllIn(html).nonEmpty, "scatter dots")
    // exactly one embedded script, and the artifact stays self-contained:
    // no external script/style/img references anywhere
    assert("<script>".r.findAllIn(html).size === 1)
    assert(!html.contains("src=\"http"), "no CDN script")
    assert(!html.contains("href=\"http"), "no external stylesheet")
    // the zoom/pan handlers target the charts and reset on dblclick
    assert(html.contains("svg.chart") && html.contains("wheel")
      && html.contains("dblclick"))
    // tooltip payloads are attribute-escaped — a key containing a quote
    // must never break out of data-l (fixture keys are clean; this pins
    // the escape path itself)
    assert(!"""data-l="[^"]*<""".r.findAllIn(html).hasNext)
    // legend toggles (round 12): every pie wedge carries the slice index
    // its legend entry toggles, legend entries are clickable groups, and
    // the script wires the hide/show handler
    assert("""<path [^>]*data-s="""".r.findAllIn(html).nonEmpty, "wedge slice index")
    assert("""<g class="lg" data-s="""".r.findAllIn(html).nonEmpty, "legend groups")
    assert(html.contains("g.lg[data-s]") && html.contains("display"))
    // every legend group toggles an existing wedge: the data-s sets match
    // within each pie svg
    val pies = """<svg class="chart"[^>]*>.*?</svg>""".r.findAllIn(html)
      .filter(_.contains("class=\"lg\""))
    pies.foreach { svg =>
      val wedges = """(?<=<path |<circle )[^>]*data-s="(\d+)"""".r
        .findAllMatchIn(svg).map(_.group(1)).toSet
      val entries = """<g class="lg" data-s="(\d+)"""".r
        .findAllMatchIn(svg).map(_.group(1)).toSet
      assert(wedges.subsetOf(entries),
        s"wedges without a legend entry: ${wedges -- entries}")
    }
  }

  test("every section carries export links wired to the embedded script") {
    val html = Report.render(views)
    val analyzers = graft.analyze.Analyzers.all(views).size
    // one csv link per non-empty section; png only where a chart rendered
    // (over the fixture every analyzer renders a chart, so both equal the
    // analyzer count; the script's selectors spell "a.dl-…", so these
    // patterns count markup only)
    assert(""""dl-csv"""".r.findAllIn(html).size === analyzers)
    assert(""""dl-png"""".r.findAllIn(html).size === countSvg(html))
    // the serializers live in the single embedded script, so the artifact
    // stays self-contained (no data: duplication of table contents)
    assert(html.contains("text/csv") && html.contains("image/png"))
    assert(!html.contains("data:text/csv"), "CSV must not be duplicated inline")
    assert("<script>".r.findAllIn(html).size === 1)
  }

  test("--colorblind swaps the palette without changing the chart count") {
    val default = Report.render(views)
    val cb = Report.render(views, colorblind = true)
    assert(countSvg(cb) === countSvg(default))
    assert(default.contains("#1f77b4") && !default.contains("#0072b2"))
    assert(cb.contains("#0072b2") && !cb.contains("#1f77b4"))
  }

  private def countSvg(html: String): Int = "<svg".r.findAllIn(html).size
}
