package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingSessions
import graft.streaming.StreamingSessions.{Event, Session}

/** Event-time sessionization: gap-split on arrival, watermark-driven
  * timeout close, state removal. */
class StreamingSessionsSpec extends AnyFunSuite with SparkSpec {

  private val T0 = 1704067200000L // 2024-01-01T00:00:00Z

  private def ev(user: Long, id: Long, offsetMin: Long) =
    Event(user, id, new Timestamp(T0 + offsetMin * 60000))

  test("a gap beyond 30min closes the running session immediately; idle " +
    "sessions close when the watermark passes their deadline") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = session.sqlContext

    val input = MemoryStream[Event]
    val query = StreamingSessions.sessionize(
      input.toDS().withWatermark("ts", "0 seconds").as[Event])
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()

    def emitted() =
      session.sql("SELECT * FROM sessions").as[Session].collect()
        .map(s => (s.user_id, s.session_start.getTime, s.session_end.getTime, s.n_events))
        .toSet

    try {
      // user 1: two events 10min apart → one open session, nothing emitted
      input.addData(ev(1, 1, 0), ev(1, 2, 10))
      query.processAllAvailable()
      assert(emitted().isEmpty, "open sessions are not emitted")

      // user 1 returns after 2h: the first session closes AT ARRIVAL with
      // its true bounds [0, 10min] and 2 events
      input.addData(ev(1, 3, 130))
      query.processAllAvailable()
      assert(emitted() == Set((1L, T0, T0 + 10 * 60000, 2L)))

      // user 2's far-future event pushes the event-time watermark past
      // user 1's idle deadline (130min + 30min): the second session closes
      // by TIMEOUT without any further user-1 traffic
      input.addData(ev(2, 4, 600))
      query.processAllAvailable()
      input.addData(ev(2, 5, 601))
      query.processAllAvailable()
      val after = emitted()
      assert(after.contains((1L, T0 + 130 * 60000, T0 + 130 * 60000, 1L)),
        s"idle session closed by watermark timeout: $after")
      assert(!after.exists(_._1 == 2L), "user 2's session is still open")
    } finally query.stop()
  }

  test("a watermark-late straggler is dropped before the operator; the " +
    "stream neither crashes nor reopens the closed session") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = session.sqlContext

    val input = MemoryStream[Event]
    val query = StreamingSessions.sessionize(
      input.toDS().withWatermark("ts", "0 seconds").as[Event])
      .writeStream.format("memory").queryName("sessions3")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // advance the watermark far ahead with user 9
      input.addData(ev(9, 1, 600))
      query.processAllAvailable()
      // user 8's event is hours LATE: Spark 4's watermark contract filters
      // it before the stateful operator, so no session may appear for user
      // 8 — and the query must survive (a pre-Spark-4-style passthrough
      // would register a below-watermark timeout, which the operator's
      // clamp also tolerates)
      input.addData(ev(8, 2, 20))
      query.processAllAvailable()
      input.addData(ev(9, 3, 610))
      query.processAllAvailable()
      input.addData(ev(9, 4, 620))
      query.processAllAvailable()
      assert(query.isActive, "late data never kills the stream")
      val got = session.sql("SELECT * FROM sessions3").as[Session].collect()
        .map(s => (s.user_id, s.n_events)).toSet
      assert(!got.exists(_._1 == 8L),
        s"watermark-late rows are dropped, not sessionized: $got")
    } finally query.stop()
  }

  test("within-batch events split into multiple sessions in one pass") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = session.sqlContext

    val input = MemoryStream[Event]
    val query = StreamingSessions.sessionize(
      input.toDS().withWatermark("ts", "0 seconds").as[Event])
      .writeStream.format("memory").queryName("sessions2")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // one batch holds a whole session plus the opener of the next —
      // arrival order scrambled; event-time order decides the split
      input.addData(ev(7, 3, 90), ev(7, 1, 0), ev(7, 2, 5))
      query.processAllAvailable()
      val got = session.sql("SELECT * FROM sessions2").as[Session].collect()
        .map(s => (s.session_start.getTime, s.session_end.getTime, s.n_events)).toSet
      assert(got == Set((T0, T0 + 5 * 60000, 2L)),
        s"the completed leading session is emitted, the tail stays open: $got")
    } finally query.stop()
  }
}
