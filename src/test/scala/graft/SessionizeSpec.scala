package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{SessionAgg, SessionEvent, Sessionize}

/** Streaming sessionization: watermark-sealed emission, out-of-order and
  * late-event folding, per-user isolation (flatMapGroupsWithState).
  */
class SessionizeSpec extends SparkSpec {

  private val MIN = 60000L
  // offset from epoch 0: events at/below the initial watermark (0) are
  // dropped as late before reaching the state function
  private val BASE = 10000L
  private def ev(user: Long, minute: Long, value: Double) =
    SessionEvent(user, new Timestamp((BASE + minute) * MIN), value)

  private def collectSessions(table: String) =
    spark.table(table)
      .select("user_id", "session_start", "n_events", "total_value")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime / MIN - BASE, r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))

  test("merge folds any arrival order to the batch result, bridging included") {
    val gap = 30 * MIN * 1000L  // micros
    // out of order: 100 first, then 0 and 10 (one session), then 40
    // bridges nothing, then 25 bridges [0,10] and [40]
    var p = Seq.empty[SessionAgg]
    for (m <- Seq(100L, 0L, 10L, 40L, 25L))
      p = Sessionize.merge(p, m * MIN * 1000L, 1.0, gap)
    assert(p.map(s => (s.start / MIN / 1000L, s.last / MIN / 1000L, s.n)) ===
      Seq((0L, 40L, 4L), (100L, 100L, 1L)))
    assert(p.head.total === 4.0)
  }

  test("merge fold is arrival-order independent and matches gaps-and-islands") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val gap = 30 * MIN * 1000L  // micros
    val events = Gen.listOfN(12, Gen.choose(0L, 600L))
    val prop = Prop.forAll(events) { minutes =>
      val times = minutes.map(_ * MIN * 1000L)
      // fold in arbitrary arrival order
      val folded = times.foldLeft(Seq.empty[graft.streaming.SessionAgg])(
        (p, t) => Sessionize.merge(p, t, 1.0, gap))
      // batch gaps-and-islands over the sorted times
      val expected = times.sorted.foldLeft(Vector.empty[Vector[Long]]) { (acc, t) =>
        if (acc.nonEmpty && t - acc.last.last <= gap) acc.init :+ (acc.last :+ t)
        else acc :+ Vector(t)
      }
      folded.map(s => (s.start, s.last, s.n)) ==
        expected.map(g => (g.head, g.last, g.length.toLong))
    }
    assert(SCTest.check(SCTest.Parameters.default, prop).passed)
  }

  test("sessions emit only when the watermark seals them") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[SessionEvent]
    val q = Sessionize.sessionize(stream.toDS(), gapUs = 30 * MIN * 1000L, watermark = "10 minutes")
      .writeStream.format("memory").queryName("sessions_seal")
      .outputMode("append").start()
    try {
      stream.addData(ev(1, 0, 1.0), ev(1, 10, 2.0), ev(2, 5, 9.0))
      q.processAllAvailable()
      assert(spark.table("sessions_seal").isEmpty) // nothing sealed yet
      stream.addData(ev(1, 70, 4.0)) // advances watermark to 60
      q.processAllAvailable()
      stream.addData(ev(99, 200, 0.0)) // wakes the sealed sessions out
      q.processAllAvailable()
      stream.addData(ev(99, 201, 0.0))
      q.processAllAvailable()
      val rows = collectSessions("sessions_seal").filter(_._1 <= 2)
      assert(rows === Seq((1L, 0L, 2L, 3.0), (1L, 70L, 1L, 4.0), (2L, 5L, 1L, 9.0)))
    } finally q.stop()
  }

  test("a late cross-batch event joins its own earlier session, not the newest one") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[SessionEvent]
    val q = Sessionize.sessionize(stream.toDS(), gapUs = 30 * MIN * 1000L, watermark = "60 minutes")
      .writeStream.format("memory").queryName("sessions_late")
      .outputMode("append").start()
    try {
      stream.addData(ev(1, 720, 1.0), ev(1, 780, 10.0)) // two pending sessions
      q.processAllAvailable()
      // late by one batch but inside the watermark (wm = 720): belongs to
      // the 720 session — eager gap-proof emission would have mis-merged
      // it into the 780 one
      stream.addData(ev(1, 730, 2.0))
      q.processAllAvailable()
      stream.addData(ev(99, 900, 0.0))
      q.processAllAvailable()
      stream.addData(ev(99, 901, 0.0))
      q.processAllAvailable()
      val rows = collectSessions("sessions_late").filter(_._1 === 1L)
      assert(rows === Seq((1L, 720L, 2L, 3.0), (1L, 780L, 1L, 10.0)))
    } finally q.stop()
  }
}
