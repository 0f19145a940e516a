package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.QuerySummary

/** Stage 2 of the pipeline (reference `extract.py`): a directory of
  * QueryInfo JSON documents (plain or .gz) → `Dataset[QuerySummary]` →
  * parquet / gzipped JSONL.
  *
  * Distribution model: one row per FILE, so parsing fans out across
  * executors (the reference is a single-threaded loop). gzip per-file is
  * fine — each file is small (50-200 kB) and the unit of parallelism is
  * the file, not the split. At 100 TB of logs the same plan holds: the
  * scan lists millions of files, Spark assigns them to tasks, and the
  * output is written as partitioned parquet — analyzers then read
  * columnar, pruned input instead of re-parsing JSON (SURVEY §4:
  * "ingest→Parquet once, analyze from Parquet").
  *
  * Source choice (r21 optimization round, guide §6): the scan is the
  * `binaryFile` source with task-side gunzip+decode, replacing the
  * `wholetext` text source. Measured over the 10k-doc corpus at 32
  * cores, warm: wholetext scan-only 3.3 s vs binaryFile 0.44 s (~7×) —
  * the text path pays per-file Hadoop codec/record-reader setup that
  * dwarfs the actual ~0.2 ms/file gunzip, which a plain
  * `GZIPInputStream` over the fetched bytes does on the task thread.
  * Decompression stays extension-keyed (`.gz`), exactly the reference's
  * rule; a corrupt ARCHIVE now drops the record (the per-file
  * ValueError catch of `extract.py:204-205`) instead of failing the
  * task, which is the posture the corrupt-JSON drop class already
  * documents. The streaming twin (StreamingIngest) keeps the wholetext
  * source — its cost is watermark/batch-bound, not scan-bound.
  */
object Extract {

  /** Gunzip (by `.gz` extension — the reference's rule) and UTF-8-decode
    * one file's bytes; None = corrupt archive, record dropped.
    */
  private[graft] def decodeFile(path: String, bytes: Array[Byte]): Option[String] =
    try {
      val in: java.io.InputStream =
        if (path.endsWith(".gz"))
          new java.util.zip.GZIPInputStream(
            new java.io.ByteArrayInputStream(bytes), 65536)
        else new java.io.ByteArrayInputStream(bytes)
      try Some(new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8))
      finally in.close()
    } catch { case _: java.io.IOException => None }

  /** Parse every `*.json` / `*.json.gz` under `inputDir`. */
  def extract(spark: SparkSession, inputDir: String, limit: Option[Int] = None): Dataset[QuerySummary] = {
    import spark.implicits._
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.json*")
      .load(inputDir)
      .select(org.apache.spark.sql.functions.col("path"),
        org.apache.spark.sql.functions.col("content"))
    val limited = limit.map(files.limit).getOrElse(files)
    limited.as[(String, Array[Byte])].flatMap { case (path, bytes) =>
      decodeFile(path, bytes).flatMap(QueryInfoParser.parse)
    }
  }

  /** JSONL.gz sink (`extract.py:189-206`): one JSON object per line. */
  def writeJsonl(ds: Dataset[QuerySummary], outPath: String): Unit =
    ds.toDF().write.mode("overwrite")
      .option("compression", "gzip").json(outPath)

  /** Parquet sink — the preferred at-scale layout for the analyze stage. */
  def writeParquet(ds: Dataset[QuerySummary], outPath: String): Unit =
    ds.toDF().write.mode("overwrite").parquet(outPath)

  /** Typed read of a parquet summary table written by [[writeParquet]]. */
  def readParquetAsSummaries(spark: SparkSession, path: String): Dataset[QuerySummary] = {
    import spark.implicits._
    spark.read.parquet(path).as[QuerySummary]
  }

  /** Read back a summary table written by [[writeJsonl]] with the exact
    * summary schema (never inferred — corrupt lines must drop, not poison
    * the schema). PERMISSIVE + explicit schema keeps a malformed line as an
    * all-null row, so the reference's discard semantics
    * (`extract.py:204-205`) need the explicit not-null filter on the
    * mandatory key — `query_id` is never null in a well-formed summary.
    */
  def readJsonl(spark: SparkSession, path: String): Dataset[QuerySummary] = {
    import spark.implicits._
    spark.read
      .schema(implicitly[org.apache.spark.sql.Encoder[QuerySummary]].schema)
      .option("mode", "PERMISSIVE")
      .json(path)
      .filter(col("query_id").isNotNull)
      .as[QuerySummary]
  }
}

/** The cached derived views every analyzer consumes (SURVEY §7.1): the
  * summaries are scanned once; `operators` / `plan_nodes` / `scans` /
  * `joins` are exploded/joined once and reused by all 28 analyzers instead
  * of 28 rescans (the reference re-iterates its in-memory list per chart,
  * `analyze.py:1241-1248`).
  */
final class WorkloadViews private (val summaries: DataFrame) {

  import WorkloadViews._

  /** FAILED-filtered base (A28 — analysis side only, `analyze.py:1231-1235`),
    * with the query-id-derived event timestamp (`analyze.py:62-63`).
    */
  val base: DataFrame = summaries
    .filter(col("state") =!= "FAILED")
    .withColumn("ts", to_timestamp(substring(col("query_id"), 1, 15), "yyyyMMdd_HHmmss"))
    .cache()

  /** One row per operator occurrence (A7). `op_idx` keeps the source array
    * position — the reference's per-node `{op["type"]: op}` dict
    * (`analyze.py:1056`) is last-occurrence-wins, which needs list order.
    *
    * `lazy` (r21, like every derived view below): a WorkloadViews is
    * constructed per analyzer-gate invocation, and roughly half the
    * analyzers consume only [[base]] — eagerly building the
    * operators/planNodes/joins plans (two windows + two joins) charged
    * every base-only gate driver-side plan construction for views it
    * never ran.
    */
  lazy val operators: DataFrame = base
    .select(col("query_id"), col("ts"), posexplode(col("operators")).as(Seq("op_idx", "op")))
    .select(col("query_id"), col("ts"), col("op_idx"), col("op.*"))
    .withColumn("wall",
      coalesce(col("input_wall"), lit(0.0))
        + coalesce(col("output_wall"), lit(0.0))
        + coalesce(col("finish_wall"), lit(0.0)))
    .cache()

  /** One row per plan node (A9/A19, flattened at ingest). */
  lazy val planNodes: DataFrame = base
    .select(col("query_id"), explode(col("plan_nodes")).as("n"))
    .select(col("query_id"), col("n.*"))
    .cache()

  /** Per (query, node_id): the reference's `{id: node}` dict keeps the last
    * fragment's node on id collisions (`analyze.py:596,1028-1037`) — mirror
    * with a max-fragment_idx row_number.
    */
  lazy val nodesDeduped: DataFrame = {
    import org.apache.spark.sql.expressions.Window
    planNodes.withColumn("rn", row_number().over(
      Window.partitionBy(col("query_id"), col("node_id"))
        .orderBy(col("fragment_idx").desc, col("dfs_order").desc)))
      .filter(col("rn") === 1).drop("rn")
  }

  /** Scan-ish operators joined to their plan node's deepest table (A21-A23,
    * B18/B22-24). Broadcast hint: the deduped node side of one workload is
    * small relative to operator occurrences.
    */
  def scanOps(typeSubstring: String): DataFrame =
    operators.filter(col("operator_type").contains(typeSubstring))
      .join(nodesDeduped.select(col("query_id"), col("node_id"), col("deepest_table")),
        Seq("query_id", "node_id"), "left")
      .withColumn("table_name", coalesce(col("deepest_table"), lit("")))

  /** Classified join sites (A24, `analyze.py:1040-1080`): per join/semijoin
    * plan node, the probe/build operator pair.
    */
  lazy val joins: DataFrame = {
    val joinNodes = nodesDeduped
      .filter(col("node_type").endsWith("join"))
      .withColumn("probe_type",
        when(col("node_type") === "semijoin", lit("HashSemiJoinOperator"))
          .when(col("has_criteria") || col("join_type") =!= "INNER", lit("LookupJoinOperator"))
          .otherwise(lit("NestedLoopJoinOperator")))
      .withColumn("build_type",
        when(col("node_type") === "semijoin", lit("SetBuilderOperator"))
          .when(col("has_criteria") || col("join_type") =!= "INNER", lit("HashBuilderOperator"))
          .otherwise(lit("NestedLoopBuildOperator")))
    // `{op["type"]: op}` keeps exactly ONE operator per (node, type) — the
    // last in list order (`analyze.py:1056`). Without this dedup a node
    // carrying duplicate probe/build entries would emit a cross product.
    val opsLast = {
      import org.apache.spark.sql.expressions.Window
      operators.withColumn("rn", row_number().over(
        Window.partitionBy(col("query_id"), col("node_id"), col("operator_type"))
          .orderBy(col("op_idx").desc)))
        .filter(col("rn") === 1).drop("rn")
    }
    val probe = opsLast.select(col("query_id"), col("node_id"),
      col("operator_type").as("probe_type"),
      col("input_size").as("probe_input_size"),
      col("input_rows").as("probe_input_rows"),
      col("output_rows").as("probe_output_rows"))
    val build = opsLast.select(col("query_id"), col("node_id"),
      col("operator_type").as("build_type"),
      col("input_size").as("build_input_size"),
      col("input_rows").as("build_input_rows"))
    joinNodes
      .join(probe, Seq("query_id", "node_id", "probe_type"))
      .join(build, Seq("query_id", "node_id", "build_type"))
      .cache()
  }
}

object WorkloadViews {

  /** Declarative drift contract for the summary relation (round 14,
    * closing the round-12 ask): the expected schema IS
    * [[graft.model.QuerySummary]]'s encoder schema — the summaries are
    * always produced by this library's own extractor, so any divergence
    * means a drifted committed fixture, a hand-edited parquet, or
    * version skew between a written summary table and the reader.
    * Before this, such drift surfaced as an unresolved-column or cast
    * error N analyzers deep into the view DAG.
    */
  /** Nullability is NOT drift: the encoder schema marks primitive struct
    * fields NOT NULL while a parquet round-trip (or PERMISSIVE JSONL
    * read) loads everything nullable — same data, different containers.
    * Both sides are normalized to fully-nullable before diffing, so the
    * contract compares names/types/order only.
    */
  private def asNullable(dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    dt match {
      case s: StructType => StructType(s.fields.map(f =>
        f.copy(dataType = asNullable(f.dataType), nullable = true)))
      case a: ArrayType => ArrayType(asNullable(a.elementType), containsNull = true)
      case m: MapType =>
        MapType(asNullable(m.keyType), asNullable(m.valueType), valueContainsNull = true)
      case other => other
    }
  }

  private[graft] val ExpectedSummary: Seq[(String, String)] =
    org.apache.spark.sql.Encoders.product[QuerySummary].schema
      .fields.toSeq.map(f => f.name -> asNullable(f.dataType).sql)

  /** Once-per-diagnosis warn registry — views are constructed per gate
    * per bench pass; the diagnosis must not scroll the artifact away.
    */
  private val warned = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Same semantics as the star-schema loaders ([[graft.tables.Tables]],
    * shared diff code): a MISSING column is fatal in one line here — a
    * readable `workload summaries: schema drift vs contract —
    * missing=[state STRING]` instead of the analysis error the 30 gate
    * chains would each die with; retype/extra/reorder warns once and
    * proceeds (by-name access tolerates it), escalating to fatal under
    * `spark.graft.strictSchema` / `SPARK_GRAFT_STRICT_SCHEMA`.
    */
  /** The contract diff for a summary schema (nullability-normalized both
    * sides — see [[asNullable]]).
    */
  private[graft] def summaryDrift(
      schema: org.apache.spark.sql.types.StructType): Option[graft.tables.Tables.SchemaDrift] =
    graft.tables.Tables.driftAgainst(ExpectedSummary,
      org.apache.spark.sql.types.StructType(
        schema.fields.map(f => f.copy(dataType = asNullable(f.dataType)))))

  def apply(summaries: DataFrame): WorkloadViews = {
    summaryDrift(summaries.schema).foreach { d =>
      val msg = d.message("workload summaries")
      if (d.fatal || graft.tables.Tables.strictSchema(summaries.sparkSession))
        throw new IllegalArgumentException(msg)
      else if (warned.add(msg))
        System.err.println(s"[views] WARNING: $msg")
    }
    new WorkloadViews(summaries)
  }
}
