package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{DedupStream, StreamDoc}

/** Streaming exact dedup: first-seen-content survives, across batches,
  * with digest-keyed state — and the survivors match the batch twin
  * (`dedup_exact_canonical` semantics: min doc_id per digest when
  * arrival order follows doc_id) on the same data.
  */
class DedupStreamSpec extends SparkSpec {

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("streaming dedup drops duplicate content within and across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[StreamDoc]
    val q = DedupStream.dedup(stream.toDS(), "10 minutes")
      .writeStream.format("memory").queryName("dedup_stream_test")
      .outputMode("append").start()
    try {
      stream.addData(
        StreamDoc(1, ts(0), "aaa"), StreamDoc(2, ts(1), "bbb"),
        StreamDoc(3, ts(1), "aaa"))
      q.processAllAvailable()
      // in-batch duplicate (doc 3) dropped
      assert(spark.table("dedup_stream_test").select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))

      stream.addData(StreamDoc(4, ts(2), "bbb"), StreamDoc(5, ts(3), "ccc"))
      q.processAllAvailable()
      // cross-batch duplicate (doc 4) dropped via digest state
      val streamed = spark.table("dedup_stream_test").select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(streamed === Seq(1L, 2L, 5L))

      // batch twin over the full landed set picks the same survivors
      val all = Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa"), (4L, "bbb"), (5L, "ccc"))
        .toDF("doc_id", "text")
      val batch = all.groupBy(md5(col("text")).as("digest"))
        .agg(min(col("doc_id")).as("doc_id"))
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(batch === streamed)
    } finally q.stop()
  }
}
