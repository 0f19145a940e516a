package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{SessionEvent, Sessionize}

/** Streaming sessionization: gap-split emission, cross-batch state carry,
  * and per-user isolation (the flatMapGroupsWithState surface).
  */
class SessionizeSpec extends SparkSpec {

  // offset from epoch 0: events at/below the initial watermark (0) would
  // be dropped as late before reaching the state function
  private def ev(user: Long, minute: Long, value: Double) =
    SessionEvent(user, new Timestamp((1000 + minute) * 60000L), value)

  test("a gap beyond the threshold closes the session and starts a new one") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[SessionEvent]
    val q = Sessionize.sessionize(stream.toDS(), gapMs = 30 * 60000L)
      .writeStream.format("memory").queryName("sessions_gap")
      .outputMode("append").start()
    try {
      // user 1: two events 10 min apart (one session), then one 60 min
      // later (gap → first session closes); user 2 stays in one session
      stream.addData(ev(1, 0, 1.0), ev(1, 10, 2.0), ev(2, 5, 9.0))
      q.processAllAvailable()
      stream.addData(ev(1, 70, 4.0), ev(2, 15, 1.0))
      q.processAllAvailable()
      val rows = spark.table("sessions_gap")
        .select("user_id", "n_events", "total_value").collect()
      assert(rows.length === 1) // only user 1's first session closed so far
      assert(rows.head.getLong(0) === 1L)
      assert(rows.head.getLong(1) === 2L)
      assert(rows.head.getDouble(2) === 3.0)
    } finally q.stop()
  }

  test("events within one batch sort by event time before folding") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[SessionEvent]
    val q = Sessionize.sessionize(stream.toDS(), gapMs = 30 * 60000L)
      .writeStream.format("memory").queryName("sessions_sort")
      .outputMode("append").start()
    try {
      // arrival order scrambled: the 100-minute event arrives first but
      // must still split [0,10] from [100]
      stream.addData(ev(7, 100, 5.0), ev(7, 0, 1.0), ev(7, 10, 2.0))
      q.processAllAvailable()
      val rows = spark.table("sessions_sort")
        .select("n_events", "total_value").collect()
      assert(rows.length === 1)
      assert(rows.head.getLong(0) === 2L) // [0,10] closed by the 100 event
      assert(rows.head.getDouble(1) === 3.0)
    } finally q.stop()
  }

  test("watermark timeout flushes the final open session") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[SessionEvent]
    val q = Sessionize.sessionize(stream.toDS(), gapMs = 30 * 60000L, watermark = "10 minutes")
      .writeStream.format("memory").queryName("sessions_wm")
      .outputMode("append").start()
    try {
      stream.addData(ev(1, 0, 1.0))
      q.processAllAvailable()
      // a far-future event (other user) advances the watermark past
      // user 1's timeout → the open session flushes on the next batch
      stream.addData(ev(99, 1000, 0.0))
      q.processAllAvailable()
      stream.addData(ev(99, 1001, 0.0))
      q.processAllAvailable()
      val users = spark.table("sessions_wm").select("user_id").collect().map(_.getLong(0))
      assert(users.contains(1L))
    } finally q.stop()
  }
}
