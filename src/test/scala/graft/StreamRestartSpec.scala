package graft

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.{DedupStream, SessionEvent, Sessionize, StreamDoc, StreamingIngest}

/** Crash-recovery equivalence (round 20 — the r19 verdict's ask #2): the
  * continuous posture of the pipeline (`collect.py:119-122`'s loop) is
  * only credible if a query that STOPS mid-stream and RESTARTS from its
  * checkpoint converges to the same sealed result as an uninterrupted
  * run. Each test processes part of the input, stops the query, lands
  * more input, restarts from the SAME checkpoint, and pins the final
  * sink equal to a fresh uninterrupted run over the full input — for
  * the stateless ingest (exactly-once file tracking), sessionization
  * (flatMapGroupsWithState state + watermark recovery), and near-dedup
  * (transformWithState RocksDB state + chained aggregation recovery).
  *
  * File sources + mtime-spaced landings keep micro-batch boundaries
  * deterministic (maxFilesPerTrigger=1; the file source orders by
  * modification time), so both the interrupted and uninterrupted runs
  * see the same watermark evolution and seal the same set.
  */
class StreamRestartSpec extends SparkSpec {

  /** Land `df` as ONE parquet file named `name` in `dir`, with an
    * explicit modification time (file-source ordering is mtime-based;
    * quick successive writes would otherwise tie).
    */
  private def landParquet(df: org.apache.spark.sql.DataFrame, dir: java.nio.file.Path,
      name: String, mtimeMs: Long): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-land")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.resolve("p").toString)
    val part = java.nio.file.Files.list(tmp.resolve("p"))
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .findFirst().orElseThrow()
    val dst = dir.resolve(name)
    java.nio.file.Files.move(part, dst)
    dst.toFile.setLastModified(mtimeMs)
  }

  private def landText(text: String, dir: java.nio.file.Path, name: String,
      mtimeMs: Long): Unit = {
    val dst = dir.resolve(name)
    java.nio.file.Files.writeString(dst, text)
    dst.toFile.setLastModified(mtimeMs)
  }

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  // ---- 1. stateless ingest: exactly-once file tracking across restart --

  test("StreamingIngest restart: checkpointed file tracking is exactly-once, equal to uninterrupted") {
    val in = java.nio.file.Files.createTempDirectory("graft-ri-in")
    val out = java.nio.file.Files.createTempDirectory("graft-ri-out")
    def run(ckpt: String, sink: String): Unit = {
      val q = StreamingIngest.writer(
          StreamingIngest.summaries(spark, in.toString), sink, ckpt)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "ingest stream did not finish")
    }
    // phase A: two parsed docs + one internal (dropped) — corpus doc
    // classes: fate(4)=Parsed, fate(101)=InternalQuery
    import graft.ingest.QueryInfoCorpus
    landText(QueryInfoCorpus.documentBytes(4), in, "a1.json", 1000000L)
    landText(QueryInfoCorpus.documentBytes(5), in, "a2.json", 1010000L)
    landText(QueryInfoCorpus.documentBytes(101), in, "a3.json", 1020000L)
    run(s"$out/ckpt", s"$out/data")
    val afterA = spark.read.parquet(s"$out/data").count()
    assert(afterA === 2, s"phase A should land 2 summaries, got $afterA")
    // phase B: one more parsed + one missing-required-key (dropped),
    // restart from the SAME checkpoint
    landText(QueryInfoCorpus.documentBytes(6), in, "b1.json", 1030000L)
    landText(QueryInfoCorpus.documentBytes(202), in, "b2.json", 1040000L)
    run(s"$out/ckpt", s"$out/data")
    val resumed = spark.read.parquet(s"$out/data")
      .select("query_id").collect().map(_.getString(0)).sorted.toSeq
    // exactly-once: phase-A docs NOT reprocessed, phase-B picked up
    assert(resumed.length === 3, s"restart duplicated or lost rows: $resumed")
    // uninterrupted twin over the same landed directory
    run(s"$out/ckpt2", s"$out/data2")
    val fresh = spark.read.parquet(s"$out/data2")
      .select("query_id").collect().map(_.getString(0)).sorted.toSeq
    assert(resumed === fresh)
    // and both equal the batch extractor over the same directory
    val batch = graft.ingest.Extract.extract(spark, in.toString)
      .select("query_id").collect().map(_.getString(0)).sorted.toSeq
    assert(resumed === batch)
  }

  // ---- 2. sessionize: fMGWS state + watermark recovery ------------------

  test("Sessionize restart: recovered pending sessions seal identically to uninterrupted") {
    val in = java.nio.file.Files.createTempDirectory("graft-rs-in")
    val out = java.nio.file.Files.createTempDirectory("graft-rs-out")
    import spark.implicits._
    val MIN = 60000L
    val BASE = 10000L
    def ev(user: Long, minute: Long, value: Double) =
      SessionEvent(user, new Timestamp((BASE + minute) * MIN), value)
    def events(dir: String): Dataset[SessionEvent] =
      spark.readStream
        .schema(Encoders.product[SessionEvent].schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(dir)
        .as[SessionEvent]
    def run(ckpt: String, sink: String): Unit = {
      val q = Sessionize.sessionize(events(in.toString),
          gapUs = 30 * MIN * 1000L, watermark = "10 minutes")
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "session stream did not finish")
    }
    // f1: user 1 [0,10], user 2 [5]; f2: user 1 late-extend (15, inside
    // the 10 min watermark) + user 3 at 200 → watermark 190 at phase-A end
    landParquet(Seq(ev(1, 0, 1.0), ev(1, 10, 2.0), ev(2, 5, 9.0)).toDF(),
      in, "f1.parquet", 1000000L)
    landParquet(Seq(ev(1, 15, 4.0), ev(3, 200, 7.0)).toDF(),
      in, "f2.parquet", 1010000L)
    run(s"$out/ckpt", s"$out/data")
    // phase B: the wake batch — recovered users 1/2 sessions are sealed
    // under the RECOVERED watermark (190), user 3 stays pending
    landParquet(Seq(ev(99, 400, 0.0)).toDF(), in, "f3.parquet", 1020000L)
    run(s"$out/ckpt", s"$out/data")
    def sessions(path: String): Seq[(Long, Long, Long, Long, Double)] =
      spark.read.parquet(path)
        .collect()
        .map(r => (r.getAs[Long]("user_id"),
          r.getAs[Timestamp]("session_start").getTime / MIN - BASE,
          r.getAs[Timestamp]("session_end").getTime / MIN - BASE,
          r.getAs[Long]("n_events"), r.getAs[Double]("total_value")))
        .sortBy(t => (t._1, t._2)).toSeq
    val resumed = sessions(s"$out/data")
    // the sealed set is exactly the batch gaps-and-islands result for
    // users 1-3: users 1/2 seal under the RECOVERED watermark (190) when
    // the wake batch arrives, and user 3 seals in the timer-only batch
    // AvailableNow runs after the wake batch advances the watermark to
    // 390; the wake event itself (430 > 390) stays pending
    assert(resumed === Seq((1L, 0L, 15L, 3L, 7.0), (2L, 5L, 5L, 1L, 9.0),
      (3L, 200L, 200L, 1L, 7.0)))
    // uninterrupted twin: same files, fresh checkpoint → identical seals
    run(s"$out/ckpt2", s"$out/data2")
    assert(sessions(s"$out/data2") === resumed)
  }

  // ---- 3. near-dedup: transformWithState + chained agg recovery ---------

  test("DedupStream.dedupNear restart: recovered signature state flags cross-restart dups") {
    val in = java.nio.file.Files.createTempDirectory("graft-rd-in")
    val out = java.nio.file.Files.createTempDirectory("graft-rd-out")
    import spark.implicits._
    def sig(t: String) = DedupStream.simhashBlocks(t)
    def dist(a: String, b: String) = DedupStream.hamming(sig(a), sig(b))
    val base = (1 to 120).map(i => f"alpha$i%03d").mkString(" ")
    val far = (1 to 120).map(i => f"omega$i%03d").mkString(" ")
    def mutants(t: String, tag: String): Seq[String] = {
      val w = t.split(" ")
      for (v <- 0 until 8; i <- 0 until w.length - 1)
        yield (w.take(i) ++ Seq(s"$tag$v") ++ w.drop(i + 1)).mkString(" ")
    }
    val near = mutants(base, "nn").find(t => dist(base, t) > 0 && dist(base, t) <= 3).get
    def docs(dir: String): Dataset[StreamDoc] =
      spark.readStream
        .schema(Encoders.product[StreamDoc].schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(dir)
        .as[StreamDoc]
    def run(ckpt: String, sink: String): Unit = {
      val q = DedupStream.dedupNear(docs(in.toString), "10 minutes")
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(180000), "dedup stream did not finish")
    }
    // phase A: base + far land; near arrives AFTER the restart and must
    // be flagged against base's RECOVERED signature state
    landParquet(Seq(StreamDoc(1, ts(0), base), StreamDoc(3, ts(1), far)).toDF(),
      in, "f1.parquet", 1000000L)
    run(s"$out/ckpt", s"$out/data")
    landParquet(Seq(StreamDoc(4, ts(2), near), StreamDoc(5, ts(3), base),
      StreamDoc(6, ts(3), "totally unrelated words here")).toDF(),
      in, "f2.parquet", 1010000L)
    // flush batches push the watermark so survivor aggregates seal (the
    // flush docs themselves stay pending and never reach the sink)
    landParquet(Seq(StreamDoc(100, ts(40), "flush one")).toDF(),
      in, "f3.parquet", 1020000L)
    landParquet(Seq(StreamDoc(101, ts(45), "flush two")).toDF(),
      in, "f4.parquet", 1030000L)
    run(s"$out/ckpt", s"$out/data")
    def survivors(path: String): Seq[Long] =
      spark.read.parquet(path).select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
    val resumed = survivors(s"$out/data")
    // doc 4 (near-dup of recovered doc 1) and doc 5 (exact re-post)
    // dropped; 1, 3, 6 survive
    assert(resumed === Seq(1L, 3L, 6L),
      "cross-restart near-dup detection lost recovered signature state")
    // uninterrupted twin over the same files, fresh checkpoint
    run(s"$out/ckpt2", s"$out/data2")
    assert(survivors(s"$out/data2") === resumed)
  }
}
