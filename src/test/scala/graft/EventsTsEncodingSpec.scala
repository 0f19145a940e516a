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

  private def writeFixture(tsField: StructField, tsRows: Seq[Any]): String = {
    val dir = Files.createTempDirectory("graft-events-enc").toString
    val schema = StructType(Seq(
      StructField("user_id", LongType), tsField, StructField("value", DoubleType)))
    val rows = tsRows.zipWithIndex.map { case (ts, i) =>
      Row(i.toLong, ts, i * 1.5)
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
      assert(df.columns.toSeq === Seq("user_id", "ts", "value", "ts_ns"))
    }
  }

  test("sub-micro nanos survive in ts_ns; ts truncates to micros") {
    val dir = writeFixture(
      StructField("ts", LongType), Seq(1700000000123456789L, 1700000000123456001L, 42L))
    val got = canonical(dir)
    assert(got === Seq(
      (0L, 1700000000123456L, 1700000000123456789L),
      (1L, 1700000000123456L, 1700000000123456001L),
      (2L, 0L, 42L)))
  }

  test("embeddings: float passthrough, double cast back, other types loud") {
    import org.apache.spark.sql.functions.expr
    val dir = Files.createTempDirectory("graft-emb-enc").toString
    def write(sub: String, elem: DataType, rows: Seq[Row]): String = {
      val d = s"$dir/$sub"
      spark.createDataFrame(
          spark.sparkContext.parallelize(rows, 1),
          StructType(Seq(StructField("vec_id", LongType),
            StructField("embedding", ArrayType(elem)))))
        .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
      d
    }
    val vals = Seq(0.25f, -1.5f, 3.125f) // exact in both float and double
    val fDir = write("f", FloatType, Seq(Row(1L, vals)))
    val dDir = write("d", DoubleType, Seq(Row(1L, vals.map(_.toDouble))))
    for (d <- Seq(fDir, dDir)) {
      val df = Tables.embeddings(spark, d)
      assert(df.schema("embedding").dataType === ArrayType(FloatType))
      assert(df.select(expr("embedding")).head.getSeq[Float](0) === vals)
    }
    val sDir = write("s", StringType, Seq(Row(1L, Seq("x"))))
    val e = intercept[IllegalArgumentException](Tables.embeddings(spark, sDir))
    assert(e.getMessage.contains("unsupported parquet encoding"))
  }

  test("an unsupported ts encoding fails loud, not downstream") {
    val dir = writeFixture(StructField("ts", StringType), Seq("2023-11-14", "x", "y"))
    val e = intercept[IllegalArgumentException](Tables.events(spark, dir))
    assert(e.getMessage.contains("unsupported parquet encoding"))
  }
}
