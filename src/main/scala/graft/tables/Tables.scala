package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver star schema (`TESTDATA.md`, `FIXTURES.md` §2).
  *
  * Each table is one parquet file; at 100 TB these would be partitioned
  * directories — the loaders take a dir so the same code serves both. All
  * downstream queries select only the columns they need, so parquet column
  * pruning keeps scans minimal regardless of table width.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")

  /** `events.ts` has shipped in two parquet encodings across testdata
    * generations: TIMESTAMP(NANOS) (which Spark 4 only reads as a raw long
    * via `spark.sql.legacy.parquet.nanosAsLong`) and TIMESTAMP(MICROS),
    * with or without isAdjustedToUTC (TimestampType vs TimestampNTZType).
    * Schema drift at the ingest edge is exactly the failure class the
    * reference hardens against (analyzer.py coalesces missing stats keys);
    * [[normalizeEventTs]] is the Spark-side equivalent: branch on the type
    * that actually loaded and emit one canonical pair —
    *   - `ts`    TimestampType, micros precision (NTZ is cast under the
    *     pinned UTC session timezone, so the instant is unchanged), and
    *   - `ts_ns` LongType epoch-nanos (exact nanos when the source had
    *     them; micros×1000 otherwise — downstream `ts_ns div 1000` is the
    *     oracle's micros grain either way).
    * Integer `div`, not `/`: epoch-nanos overflow double precision.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(load(s, d, "events"))
  }

  /** Canonicalize a `ts` column (long epoch-nanos, TIMESTAMP, or
    * TIMESTAMP_NTZ) into `ts` TimestampType + `ts_ns` long epoch-nanos.
    * Pure column surgery — works on batch and streaming frames alike.
    */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => // legacy TIMESTAMP(NANOS) read as raw nanos
        df.withColumn("ts_ns", col("ts"))
          .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampType =>
        df.withColumn("ts_ns", expr("unix_micros(ts) * 1000L"))
      case TimestampNTZType => // exact under the UTC session timezone
        df.withColumn("ts", col("ts").cast(TimestampType))
          .withColumn("ts_ns", expr("unix_micros(ts) * 1000L"))
      case other =>
        throw new IllegalArgumentException(
          s"events.ts: unsupported parquet encoding $other " +
            "(expected INT64 nanos, TIMESTAMP, or TIMESTAMP_NTZ)")
    }

  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")

  /** All driver-generated input tables, in TESTDATA.md order. */
  val AllNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** One-line-per-table schema echo as a JSON object string, for the
    * bench/verify artifacts: what Spark ACTUALLY loads per input table,
    * so a testdata schema drift (round 10: events.ts nanos →
    * TIMESTAMP_NTZ) is a one-glance artifact diff instead of file-mtime
    * archaeology. Diagnostic by design: an unreadable table echoes the
    * error (null-message-safe) rather than failing the run — the gates
    * themselves are the judgment.
    */
  def inputSchemaJson(spark: SparkSession, dir: String): String = {
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    AllNames.map { t =>
      val ddl =
        try spark.read.parquet(s"$dir/$t.parquet").schema.toDDL
        catch { case e: Exception =>
          "unreadable: " + Option(e.getMessage)
            .flatMap(_.linesIterator.nextOption())
            .getOrElse(e.getClass.getName) }
      s"${q(t)}:${q(ddl)}"
    }.mkString("{", ",", "}")
  }

  /** `embeddings.embedding` is contractually `array<float>` (AnnIndex and
    * the similarity gates read `Seq[Float]`, and oracle parity was
    * calibrated at float precision). Same drift-hardening as [[events]]:
    * a regen that re-encodes the same values as `array<double>` is cast
    * back to float — exact when the doubles originated as floats, which
    * is what an encoding-only drift means — and any other element type
    * fails loud at load instead of as a mid-query cast error.
    */
  def embeddings(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
    val df = load(s, d, "embeddings")
    df.schema("embedding").dataType match {
      case ArrayType(FloatType, _) => df
      case ArrayType(DoubleType, _) =>
        df.withColumn("embedding", col("embedding").cast(ArrayType(FloatType)))
      case other =>
        throw new IllegalArgumentException(
          s"embeddings.embedding: unsupported parquet encoding $other " +
            "(expected array<float> or array<double>)")
    }
  }
}
