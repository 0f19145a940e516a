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

  test("--colorblind swaps the palette without changing the chart count") {
    val default = Report.render(views)
    val cb = Report.render(views, colorblind = true)
    assert(countSvg(cb) === countSvg(default))
    assert(default.contains("#1f77b4") && !default.contains("#0072b2"))
    assert(cb.contains("#0072b2") && !cb.contains("#1f77b4"))
  }

  private def countSvg(html: String): Int = "<svg".r.findAllIn(html).size
}
