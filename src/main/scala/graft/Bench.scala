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

  /** Warmup classification: one cheap query per input family
    * (lineitem+TPC-H / workload fixture / documents / embeddings /
    * events), so the FIRST timed query of each family does not absorb
    * that family's one-off open costs (measured: the first fixture gate
    * ran ~8 s cold vs ~2 s warm purely from session-level init). The
    * TPC-H/events branch is an EXPLICIT prefix allowlist, not a
    * catch-all: a gate with an unrecognized prefix fails loudly here —
    * before any warmup work — instead of silently running its family
    * cold and absorbing one-off init into its headline cold time.
    * RegistrySpec runs this over the whole registry, so a new family is
    * classified deliberately at test time, not discovered at bench time.
    */
  private val TpchEventPrefixes = Set(
    "array_", "broadcast_", "coalesce_", "concat_", "cube_", "date_",
    "dict_", "equi_", "explode_", "greatest_", "hash_", "histogram_",
    "join_", "json_", "pivot_", "quantile_", "regexp_", "rollup_",
    "scan_", "scatter_", "set_", "skew_", "stats_", "string_", "topk_",
    "topn_", "union_", "unit_", "window_")

  private[graft] def families(n: String): Set[String] =
    if (n.startsWith("analyzer_")) Set("analyzer_metrics")
    else if (n.startsWith("similarity_") || n.startsWith("embedding_") ||
      n.startsWith("ann_")) Set("similarity_topk_bruteforce")
    else if (n.startsWith("dedup_") || n.startsWith("text_") ||
      n.startsWith("multimodal_") || n.startsWith("sample_") ||
      n.startsWith("sketch_") || n.startsWith("pack_") ||
      n.startsWith("filter_") || n.startsWith("dataset_") ||
      n.startsWith("curate_"))
      Set("dedup_exact", "similarity_topk_bruteforce") // embedding-cosine dedup reads both
    else if (TpchEventPrefixes.exists(n.startsWith))
      Set("hash_agg_sum", "date_trunc_agg")
    else throw new IllegalArgumentException(
      s"gate '$n' has no warmup family — add its prefix to Bench.families " +
        "so its input family is warmed deliberately")

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

    def run(name: String): (Double, Boolean, String) = {
      val t0 = System.nanoTime()
      var df: org.apache.spark.sql.DataFrame = null
      val ok =
        try {
          df = SparkEntry.queries(name)(spark, sfDir)
          df.write.format("noop").mode("overwrite").save()
          true
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      // plan fingerprint OUTSIDE the timed window, from the df the timed
      // run constructed (planning is cheap and never re-executes the
      // query) — lets the next round separate plan drift from noise
      // mechanically; see PlanFingerprint
      val fp = if (ok) try PlanFingerprint.of(df) catch { case _: Throwable => "err" }
        else "err"
      // each query is timed self-contained: drop every cached relation the
      // query built (outside its timed window) so no gate inherits another's
      // cache hits — or its heap pressure; with ~85 gates the accumulated
      // InMemoryRelations otherwise inflate later queries ~25% via GC
      spark.catalog.clearCache()
      (dt, ok, fp)
    }

    // SPARK_GRAFT_BENCH_ONLY=q1,q2 restricts the run (iteration aid; the
    // driver never sets it, so judged runs always cover the full registry).
    // Blank tokens are dropped so an exported-but-empty variable means
    // "no filter", not a silently empty run; unknown names fail loudly —
    // and BEFORE any warmup work, so a typo costs nothing.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    only.foreach { names =>
      val unknown = names.diff(SparkEntry.queries.keySet)
      require(unknown.isEmpty, s"unknown bench queries: ${unknown.mkString(",")}")
    }
    val selected = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))

    selected.flatMap(Bench.families).distinct.sorted.foreach(run)

    // Two timed passes per gate: COLD (first run after the family warmup —
    // what the headline total reports, comparable across rounds) and WARM
    // (immediate re-run, caches still cleared in between) — the
    // steady-state cost of the plan itself. A cold/warm gap far above the
    // plan's work is measurement noise (JIT, GC pressure from earlier
    // gates), not a regression; recording both makes that call readable
    // from bench_details.json instead of burning an isolation run.
    // SPARK_GRAFT_BENCH_WARM=0 skips the warm pass (halves iteration time).
    val warmPass = sys.env.get("SPARK_GRAFT_BENCH_WARM").forall(_ != "0")
    val results = selected.map { n =>
      val cold = run(n)
      val warm = if (warmPass && cold._2) Some(run(n)) else None
      (n, cold, warm)
    }
    // a crashed query reports null, not its (short) elapsed time — a fast-
    // looking total must not hide failures
    def num(t: (Double, Boolean, String)): String = if (t._2) t._1.toString else "null"
    val qs = results.map { case (k, cold, warm) =>
      val w = warm.map(t => s""","warm":${num(t)}""").getOrElse("")
      s""""$k":{"cold":${num(cold)}$w,"plan":"${cold._3}"}"""
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, (_, false, _), _) => "\"" + k + "\"" }
    val total = results.collect { case (_, (v, true, _), _) => v }.sum
    val failedField =
      if (failed.isEmpty) "" else s""","failed":${failed.mkString("[", ",", "]")}"""
    // The per-query map (~100 entries, >3 kB on one line) goes to stderr and
    // a sidecar file only: a capture window that tails stdout must always see
    // the one compact, parseable metric line below intact. The headline
    // "value" remains the cold-pass total — same meaning as every prior
    // round; warm times live only inside the per-query objects.
    val detail = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$failedField,"sf":"$sfDir"}"""
    System.err.println(detail)
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_details.json"), detail + "\n")
    catch { case e: Exception => System.err.println(s"[bench] details file: ${e.getMessage}") }
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size}$failedField,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
