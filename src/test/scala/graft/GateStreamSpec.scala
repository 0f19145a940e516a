package graft

import graft.streaming.GateStream

/** The streaming gates' housekeeping contract: repeated invocations (a
  * bench session runs each gate for warmup + cold + warm) must not
  * accumulate drained memory-sink views or scratch checkpoint dirs.
  */
class GateStreamSpec extends SparkSpec {

  private def trendSinks: Seq[String] =
    spark.catalog.listTables().collect()
      .filter(t => t.isTemporary && t.name.startsWith("analyzer_trend_stream_sink_"))
      .map(_.name).toSeq

  private def scratchDirs(prefix: String): Seq[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    val tmp = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    val stream = java.nio.file.Files.list(tmp)
    try stream.iterator().asScala
      .filter(_.getFileName.toString.startsWith(prefix)).toSeq
    finally stream.close()
  }

  test("repeated trend-gate runs keep at most one live sink and no scratch checkpoints") {
    val before = scratchDirs("graft-trend-gate").size
    val gate = SparkEntry.queries("analyzer_trend_stream")
    gate(spark, "/root/testdata/sf0.001").collect()
    gate(spark, "/root/testdata/sf0.001").collect()
    assert(trendSinks.size === 1,
      s"expected exactly the latest sink view, got: $trendSinks")
    assert(scratchDirs("graft-trend-gate").size <= before,
      "drained AvailableNow checkpoints must be deleted")
  }

  test("repeated sessionize-gate runs keep at most one live sink and no scratch checkpoints") {
    val before = scratchDirs("graft-sess-gate").size
    val gate = SparkEntry.queries("sessionize_stream")
    gate(spark, "/root/testdata/sf0.001").collect()
    gate(spark, "/root/testdata/sf0.001").collect()
    val sinks = spark.catalog.listTables().collect()
      .filter(t => t.isTemporary && t.name.startsWith("sessionize_stream_sink_"))
      .map(_.name).toSeq
    assert(sinks.size === 1, s"expected exactly the latest sink view, got: $sinks")
    assert(scratchDirs("graft-sess-gate").size <= before,
      "drained AvailableNow checkpoints must be deleted")
  }

  test("withStreamShuffle caps the drain at 8, follows lower, always restores") {
    val key = "spark.sql.shuffle.partitions"
    val prior = spark.conf.get(key)
    try {
      spark.conf.set(key, "32")
      GateStream.withStreamShuffle(spark) {
        assert(spark.conf.get(key) === "8") // capped down for the drain
      }
      assert(spark.conf.get(key) === "32") // restored
      spark.conf.set(key, "2")
      GateStream.withStreamShuffle(spark) {
        assert(spark.conf.get(key) === "2") // never raised above the session
      }
      assert(spark.conf.get(key) === "2")
      // a crashing drain must still restore the session value
      spark.conf.set(key, "32")
      intercept[RuntimeException](
        GateStream.withStreamShuffle(spark) { throw new RuntimeException("boom") })
      assert(spark.conf.get(key) === "32")
    } finally spark.conf.set(key, prior)
  }

  test("stream-shuffle override: valid values parse, garbage and non-positives fail loud") {
    assert(GateStream.parseStreamShuffleCap(None) === 8)
    assert(GateStream.parseStreamShuffleCap(Some("4")) === 4)
    assert(GateStream.parseStreamShuffleCap(Some(" 16 ")) === 16)
    // exported-but-blank means "no override", the BENCH_ONLY convention
    assert(GateStream.parseStreamShuffleCap(Some("")) === 8)
    assert(GateStream.parseStreamShuffleCap(Some("   ")) === 8)
    // a typo'd export must name the variable, not die as a bare
    // NumberFormatException mid-gate
    val bad = intercept[IllegalArgumentException](
      GateStream.parseStreamShuffleCap(Some("eight")))
    assert(bad.getMessage.contains("SPARK_GRAFT_STREAM_SHUFFLE"))
    // 0 / negative would set an invalid partition count and fail every
    // streaming gate mid-run instead of fast
    intercept[IllegalArgumentException](GateStream.parseStreamShuffleCap(Some("0")))
    intercept[IllegalArgumentException](GateStream.parseStreamShuffleCap(Some("-3")))
  }

  test("dropStaleSinks only touches its own prefix; deleteScratch is total") {
    import spark.implicits._
    Seq(1).toDF("x").createOrReplaceTempView("unrelated_view")
    GateStream.dropStaleSinks(spark, "analyzer_trend_stream_sink_")
    assert(spark.catalog.tableExists("unrelated_view"))
    spark.catalog.dropTempView("unrelated_view")
    // missing dir, a file instead of a dir, nested content: never throws
    GateStream.deleteScratch("/tmp/graft-does-not-exist-12345")
    val f = java.nio.file.Files.createTempFile("graft-scratch-file", ".tmp")
    GateStream.deleteScratch(f.toString)
    assert(!java.nio.file.Files.exists(f))
    val d = java.nio.file.Files.createTempDirectory("graft-scratch-dir")
    java.nio.file.Files.createDirectories(d.resolve("a/b"))
    java.nio.file.Files.writeString(d.resolve("a/b/c.txt"), "x")
    GateStream.deleteScratch(d.toString)
    assert(!java.nio.file.Files.exists(d))
  }
}
