package graft

import graft.analyze.Analyzers
import graft.ingest.{Extract, WorkloadViews}
import graft.queries.AnalyzerGates

/** Pins the analyzer-gate fixture chain (VERDICT round-3 task #6):
  * the committed parquet must equal a fresh extraction of the JSON
  * fixtures (so the two committed artifacts cannot drift), and the gated
  * analyzers must land on the DESIGNED exact values — integer walls
  * summing to 400, hence quarter-percent-exact doubles that no
  * float-summation order can perturb.
  */
class GateFixtureSpec extends SparkSpec {

  private def committed = spark.read.parquet(AnalyzerGates.fixtureDir)

  test("committed gate parquet equals re-extraction of the JSON fixtures") {
    val extracted = Extract.extract(spark, resourcePath("workload_gate")).toDF()
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.toJSON.collect().sorted.toSeq
    assert(canon(committed) === canon(extracted))
  }

  test("operator_wall over the fixture hits the designed exact pie") {
    val rows = Analyzers.operatorWall(WorkloadViews(committed)).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(rows === Seq(
      ("TableScan", 300.0, 75.0),
      ("ScanFilterAndProject", 100.0, 25.0),
      ("All the rest", 0.0, 0.0)))
  }

  test("joins_sides over the fixture classifies all three join families") {
    val rows = Analyzers.joinsSides(WorkloadViews(committed)).collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getString(2))).toSeq
    assert(rows === Seq(
      (5 * 1048576.0, 600 * 1048576.0, "PARTITIONED"),   // g1 hash join
      (2 * 1048576.0, 64 * 1048576.0, "REPLICATED"),     // g2 semijoin
      (1048576.0, 16 * 1048576.0, "REPLICATED")))        // g3 nested loop
  }

  test("wall_by_selectivity_10 bins sum to exactly 100 with designed shares") {
    val rows = Analyzers.wallBySelectivity10(WorkloadViews(committed)).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows === Map(
      "0.00" -> 15.0, "0.10" -> 0.0, "0.20" -> 20.0, "0.30" -> 0.0,
      "0.40" -> 0.0, "0.50" -> 10.0, "0.60" -> 0.0, "0.70" -> 0.0,
      "0.80" -> 25.0, "0.90" -> 0.0, "1.00" -> 30.0))
    assert(rows.values.sum === 100.0)
  }
}
