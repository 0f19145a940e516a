package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.tables.Tables

/** Pins `Tables.events` against every `ts` encoding the driver-generated
  * testdata has shipped: INT64 raw nanos (the original TIMESTAMP(NANOS)
  * data, which Spark 4 reads as LongType under
  * `spark.sql.legacy.parquet.nanosAsLong`), TIMESTAMP(MICROS) adjusted to
  * UTC (TimestampType), and TIMESTAMP(MICROS) NTZ (TimestampNTZType — the
  * round-10 regen that broke 24 gates). All three must load to the same
  * canonical frame: `ts` TimestampType + `ts_ns` long epoch-nanos, equal
  * values for the same instants, so the next testdata regen cannot break
  * the events surface silently.
  */
class EventsTsEncodingSpec extends SparkSpec {
  import org.apache.spark.sql.functions.expr

  // Instants at exact-micros grain so all encodings can represent them.
  private val microsVals = Seq(1700000000123456L, 1700003600000001L, 1700007200999999L)

  // full contract schema (round 12: Tables.load diffs every table against
  // Tables.Expected, so a narrow fixture would fail the missing-column
  // check before the ts branch under test is ever reached)
  private def writeFixture(tsField: StructField, tsRows: Seq[Any]): String = {
    val dir = Files.createTempDirectory("graft-events-enc").toString
    val schema = StructType(Seq(
      StructField("event_id", LongType), tsField, StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType),
      StructField("props", StringType)))
    val rows = tsRows.zipWithIndex.map { case (ts, i) =>
      Row(1000L + i, ts, i.toLong, "click", i * 1.5, "{}")
    }
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def canonical(dir: String): Seq[(Long, Long, Long)] =
    Tables.events(spark, dir)
      .select(col("user_id"), expr("unix_micros(ts)").as("ts_us"), col("ts_ns"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq

  test("long-nanos, TIMESTAMP and TIMESTAMP_NTZ encodings load identically") {
    val nanosDir = writeFixture(
      StructField("ts", LongType), microsVals.map(_ * 1000L))
    val tzDir = writeFixture(
      StructField("ts", TimestampType),
      microsVals.map(us => java.sql.Timestamp.from(
        java.time.Instant.EPOCH.plus(us, java.time.temporal.ChronoUnit.MICROS))))
    val ntzDir = writeFixture(
      StructField("ts", TimestampNTZType),
      // NTZ stores a wall-clock local datetime; the UTC session timezone
      // pinned in SparkSpec makes instant == wall-clock
      microsVals.map(us => java.time.LocalDateTime.ofInstant(
        java.time.Instant.EPOCH.plus(us, java.time.temporal.ChronoUnit.MICROS),
        java.time.ZoneOffset.UTC)))

    val expected = microsVals.zipWithIndex.map { case (us, i) =>
      (i.toLong, us, us * 1000L)
    }
    assert(canonical(nanosDir) === expected)
    assert(canonical(tzDir) === expected)
    assert(canonical(ntzDir) === expected)
  }

  test("canonical schema is ts TimestampType + ts_ns LongType in every branch") {
    val nanosDir = writeFixture(StructField("ts", LongType), microsVals.map(_ * 1000L))
    val ntzDir = writeFixture(
      StructField("ts", TimestampNTZType),
      microsVals.map(us => java.time.LocalDateTime.ofInstant(
        java.time.Instant.EPOCH.plus(us, java.time.temporal.ChronoUnit.MICROS),
        java.time.ZoneOffset.UTC)))
    for (dir <- Seq(nanosDir, ntzDir)) {
      val df: DataFrame = Tables.events(spark, dir)
      assert(df.schema("ts").dataType === TimestampType)
      assert(df.schema("ts_ns").dataType === LongType)
      // ts stays at its original column position (downstream gates select
      // by name, but fingerprints are ordering-sensitive)
      assert(df.columns.toSeq === Seq(
        "event_id", "ts", "user_id", "event_type", "value", "props", "ts_ns"))
    }
  }

  test("sub-micro nanos survive in ts_ns; ts truncates to micros") {
    val dir = writeFixture(
      StructField("ts", LongType), Seq(1700000000123456789L, 1700000000123456001L))
    val got = canonical(dir)
    assert(got === Seq(
      (0L, 1700000000123456L, 1700000000123456789L),
      (1L, 1700000000123456L, 1700000000123456001L)))
  }

  test("a NULL INT64 ts propagates as null, never trips the plausibility guard") {
    val dir = writeFixture(
      StructField("ts", LongType), Seq(1700000000123456000L, null))
    val rows = Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("ts_ns"))
      .orderBy(col("event_id")).collect()
    assert(rows(0).getAs[Long]("ts_ns") === 1700000000123456000L)
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(2))
  }

  test("implausibly small INT64 ts (epoch-micros mis-encoding) fails loud, not 1000x off") {
    // round 12 (ADVICE): a regen that writes plain INT64 epoch-MICROS
    // with no logical type used to load silently with every instant
    // 1000x off — the exact silent-drift class this file exists to
    // catch. Values below ~1.0e17 ns (~1973) now raise at first action,
    // naming the trusted-as-nanos contract.
    val dir = writeFixture(
      StructField("ts", LongType), Seq(1700000000123456L)) // micros, not nanos
    val e = intercept[Exception](canonical(dir))
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("implausible as epoch-nanos")),
      s"wanted the nanos-plausibility diagnosis, got: ${messages(e).mkString(" | ")}")
  }

  test("embeddings: float passthrough, double cast back, other types loud") {
    import org.apache.spark.sql.functions.expr
    val dir = Files.createTempDirectory("graft-emb-enc").toString
    def write(sub: String, elem: DataType, rows: Seq[Row]): String = {
      val d = s"$dir/$sub"
      spark.createDataFrame(
          spark.sparkContext.parallelize(rows, 1),
          StructType(Seq(StructField("vec_id", LongType),
            StructField("embedding", ArrayType(elem)),
            StructField("label", IntegerType))))
        .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
      d
    }
    val vals = Seq(0.25f, -1.5f, 3.125f) // exact in both float and double
    val fDir = write("f", FloatType, Seq(Row(1L, vals, 0)))
    val dDir = write("d", DoubleType, Seq(Row(1L, vals.map(_.toDouble), 0)))
    for (d <- Seq(fDir, dDir)) {
      val df = Tables.embeddings(spark, d)
      assert(df.schema("embedding").dataType === ArrayType(FloatType))
      assert(df.select(expr("embedding")).head.getSeq[Float](0) === vals)
    }
    val sDir = write("s", StringType, Seq(Row(1L, Seq("x"), 0)))
    val e = intercept[IllegalArgumentException](Tables.embeddings(spark, sDir))
    assert(e.getMessage.contains("unsupported parquet encoding"))
  }

  test("an unsupported ts encoding fails loud, not downstream") {
    val dir = writeFixture(StructField("ts", StringType), Seq("2023-11-14", "x", "y"))
    val e = intercept[IllegalArgumentException](Tables.events(spark, dir))
    assert(e.getMessage.contains("unsupported parquet encoding"))
  }
}
