package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import graft.ingest.QueryInfoParser
import graft.model.QuerySummary

/** Structured Streaming variant of the ingest stage (SURVEY §2.C
  * "Streaming"): the reference's `collect.py --loop` polls a REST API and
  * drops one JSON file per finished query; pointing a file-source stream at
  * that directory turns the whole pipeline into continuous ingest with
  * exactly-once parquet output — no analyzer changes needed, because the
  * analyzers are recomputable batch aggregations over the growing summary
  * table.
  */
object StreamingIngest {

  /** Continuous QueryInfo JSON → summary parse. Same parser as batch; one
    * file per query (wholetext), so each micro-batch maps files → rows.
    */
  def summaries(spark: SparkSession, inputDir: String): Dataset[QuerySummary] = {
    import spark.implicits._
    spark.readStream
      .option("wholetext", "true")
      .option("pathGlobFilter", "*.json*")
      .option("maxFilesPerTrigger", 1000)
      .text(inputDir)
      .as[String]
      .flatMap(QueryInfoParser.parse _)
  }

  /** Parse an already-streaming Dataset of raw JSON documents (used by
    * tests via MemoryStream, and by any socket/Kafka-shaped source).
    */
  def parseStream(raw: Dataset[String]): Dataset[QuerySummary] = {
    import raw.sparkSession.implicits._
    raw.flatMap(QueryInfoParser.parse _)
  }

  /** Exactly-once parquet sink for the summary stream. */
  def writer(ds: Dataset[QuerySummary], outPath: String, checkpoint: String): DataStreamWriter[QuerySummary] =
    ds.writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("10 seconds"))
      .outputMode("append")

  /** Streaming example of the trend analyzers (B2/B6 shape): per-hour
    * query counts + scheduled time with a watermark on the event time
    * derived from query_id. At scale this runs alongside the batch
    * analyzers as the "live" dashboard feed.
    */
  def hourlyTrend(summaries: Dataset[QuerySummary]): DataFrame =
    summaries.toDF()
      .withColumn("ts", to_timestamp(substring(col("query_id"), 1, 15), "yyyyMMdd_HHmmss"))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("hour"))
      .agg(count(lit(1)).as("n_queries"),
        sum(col("scheduled_time")).as("scheduled_secs"))
}
