package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every registry query against
  * `SPARK_GRAFT_SF_DIR`, one JSON line out.
  *
  * Methodology: a warmup pass first executes the cheapest query once so
  * session/codegen/parquet-footer costs don't land on the first timed
  * query; each timed query is fully materialized through the noop sink
  * (`count()` would let Catalyst drop sorts and skip result projection).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(2, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok =
        try {
          SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
          true
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      // each query is timed self-contained: drop every cached relation the
      // query built (outside its timed window) so no gate inherits another's
      // cache hits — or its heap pressure; with ~85 gates the accumulated
      // InMemoryRelations otherwise inflate later queries ~25% via GC
      spark.catalog.clearCache()
      (dt, ok)
    }

    // warmup: session init, codegen paths, and parquet footers — one cheap
    // query per input family (lineitem / workload fixture / documents /
    // embeddings / events), so the FIRST timed query of each family does
    // not absorb that family's one-off open costs (measured: the first
    // fixture gate ran ~8 s cold vs ~2 s warm purely from session-level
    // init). Warmup results are discarded and never timed.
    Seq("hash_agg_sum", "analyzer_metrics", "dedup_exact",
      "similarity_topk_bruteforce", "date_trunc_agg").foreach(run)

    // SPARK_GRAFT_BENCH_ONLY=q1,q2 restricts the run (iteration aid; the
    // driver never sets it, so judged runs always cover the full registry).
    // Blank tokens are dropped so an exported-but-empty variable means
    // "no filter", not a silently empty run; unknown names fail loudly.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    only.foreach { names =>
      val unknown = names.diff(SparkEntry.queries.keySet)
      require(unknown.isEmpty, s"unknown bench queries: ${unknown.mkString(",")}")
    }
    val results = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
      .map(n => n -> run(n))
    // a crashed query reports null, not its (short) elapsed time — a fast-
    // looking total must not hide failures
    val qs = results.map { case (k, (v, ok)) => "\"" + k + "\":" + (if (ok) v else "null") }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, (_, false)) => "\"" + k + "\"" }
    val total = results.collect { case (_, (v, true)) => v }.sum
    val failedField =
      if (failed.isEmpty) "" else s""","failed":${failed.mkString("[", ",", "]")}"""
    // The per-query map (~60 entries, >3 kB on one line) goes to stderr and a
    // sidecar file only: a capture window that tails stdout must always see
    // the one compact, parseable metric line below intact.
    val detail = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$failedField,"sf":"$sfDir"}"""
    System.err.println(detail)
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_details.json"), detail + "\n")
    catch { case e: Exception => System.err.println(s"[bench] details file: ${e.getMessage}") }
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size}$failedField,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
