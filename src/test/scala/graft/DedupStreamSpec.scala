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

  // --- near-dup twin ---

  private def sig(t: String) = DedupStream.simhashBlocks(t)
  private def dist(a: String, b: String) =
    DedupStream.hamming(sig(a), sig(b))

  /** Greedy sequential replay with the operator's exact rule — the batch
    * twin: a doc is dropped iff any earlier doc shares a signature block
    * AND verifies at Hamming ≤ 3; dropped docs still block later ones
    * (the connected-components reachability the batch pipeline gets).
    */
  private def greedySurvivors(docs: Seq[StreamDoc]): Seq[Long] = {
    val seen = scala.collection.mutable.ListBuffer.empty[(Long, Array[Long])]
    docs.sortBy(_.doc_id).flatMap { d =>
      val s = sig(d.text)
      val dup = seen.exists { case (_, s2) =>
        (0 until 4).exists(i => s(i) == s2(i)) && DedupStream.hamming(s, s2) <= 3 }
      seen += ((d.doc_id, s))
      if (dup) None else Some(d.doc_id)
    }.toSeq
  }

  test("wordId keeps the hashIdSql 15-hex-digit contract bit for bit") {
    val md = java.security.MessageDigest.getInstance("MD5")
    for (w <- Seq("alpha001", "the", "zzz", "ünïcode", "", "a b", "0")) {
      val hex = md.digest(w.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
      md.reset()
      val viaString = java.lang.Long.parseLong(hex.substring(0, 15), 16) % 33554393L
      assert(DedupStream.wordId(md, w) === viaString, s"word: $w")
      md.reset()
    }
  }

  test("near-dup buckets hold exactly one live cleanup timer across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // same text every batch → the same four (block, value) groups receive
    // rows in every one of the four batches, each extending the newest
    // event time — the exact pattern that used to stack one pending timer
    // per batch. The diagnostic records the live-timer count per bucket
    // AFTER bookkeeping; max must stay at 1.
    DedupStream.timerDiagEnabled = true
    DedupStream.maxLiveTimers.set(0)
    val stream = MemoryStream[StreamDoc]
    val q = DedupStream.dedupNear(stream.toDS(), "10 minutes")
      .writeStream.format("memory").queryName("neardup_timer_test")
      .outputMode("append").start()
    try {
      for (b <- 0 until 4) {
        stream.addData(StreamDoc(b + 1, ts(b), "aaa bbb ccc"))
        q.processAllAvailable()
      }
      assert(DedupStream.maxLiveTimers.get() === 1)
    } finally {
      q.stop()
      DedupStream.timerDiagEnabled = false
    }
  }

  test("streaming near-dup drops verified block collisions, matching batch replay") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = (1 to 120).map(i => f"alpha$i%03d").mkString(" ")
    val far = (1 to 120).map(i => f"omega$i%03d").mkString(" ")
    // find planted variants via the shared signature function, so the
    // fixture validates itself instead of assuming hash behavior:
    // near ≈ base; chain ≈ near but NOT ≈ base (transitive case)
    def mutants(t: String, tag: String): Seq[String] = {
      val w = t.split(" ")
      for (v <- 0 until 8; i <- 0 until w.length - 1)
        yield (w.take(i) ++ Seq(s"$tag$v") ++ w.drop(i + 1)).mkString(" ")
    }
    val near = mutants(base, "nn").find(t => dist(base, t) > 0 && dist(base, t) <= 3).get
    val chain = mutants(near, "cc").find(t =>
      dist(near, t) > 0 && dist(near, t) <= 3 && dist(base, t) > 3).get
    assert(dist(base, far) > 3)

    val docs = Seq(
      StreamDoc(1, ts(0), base),
      StreamDoc(2, ts(1), near),  // dup of 1 (verified block collision)
      StreamDoc(3, ts(1), far),   // distinct → survives
      StreamDoc(4, ts(2), chain), // dup of DROPPED 2, not of 1 → still dropped
      StreamDoc(5, ts(3), base))  // exact re-post → dup of 1
    val expected = greedySurvivors(docs)
    assert(expected === Seq(1L, 3L)) // the fixture exercises every branch

    val stream = MemoryStream[StreamDoc]
    val q = DedupStream.dedupNear(stream.toDS(), "10 minutes")
      .writeStream.format("memory").queryName("neardup_stream_test")
      .outputMode("append").start()
    try {
      stream.addData(docs.take(3): _*)
      q.processAllAvailable()
      stream.addData(docs.drop(3): _*)
      q.processAllAvailable()
      // sentinel batches push the watermark past every real event time so
      // the survivor aggregates seal and emit (the sentinel itself stays
      // pending and never reaches the sink)
      stream.addData(StreamDoc(100, ts(40), "flush one"))
      q.processAllAvailable()
      stream.addData(StreamDoc(101, ts(45), "flush two"))
      q.processAllAvailable()
      val streamed = spark.table("neardup_stream_test").select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(streamed === expected)
    } finally q.stop()
  }
}
