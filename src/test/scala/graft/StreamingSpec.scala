package graft

import graft.streaming.EventsStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

case class Ev(ts: Timestamp, user_id: Long, event_type: String, value: Double)

class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(minute: Int) = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("tumbling window counts over a memory stream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    mem.addData(
      Ev(ts(1), 1, "click", 1.0), Ev(ts(2), 1, "click", 2.0),
      Ev(ts(16), 2, "view", 3.0), Ev(ts(17), 2, "click", 4.0))
    val q = EventsStream.tumblingCounts(mem.toDF(), "15 minutes")
      .writeStream.format("memory").queryName("tumbling").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM tumbling ORDER BY bin, event_type").collect()
      assert(rows.length == 3)
      assert(rows(0).getAs[Long]("n") == 2)  // two clicks in 10:00 window
    } finally q.stop()
  }

  test("session windows split on the inactivity gap") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    // user 1: events at 10:01 and 10:05 (one session), then 10:59 (new session)
    mem.addData(Ev(ts(1), 1, "a", 1.0), Ev(ts(5), 1, "a", 1.0), Ev(ts(59), 1, "a", 1.0))
    val q = EventsStream.sessionize(mem.toDF(), gap = "30 minutes")
      .writeStream.format("memory").queryName("sessions").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM sessions WHERE user_id = 1 ORDER BY session_start").collect()
      assert(rows.length == 2)
      assert(rows(0).getAs[Long]("n_events") == 2 && rows(1).getAs[Long]("n_events") == 1)
    } finally q.stop()
  }

  test("streaming tumbling agg matches the batch date_bin result") {
    val batchEvents = Tables.load(spark, sfDir, "events")
    val streamed = EventsStream.tumblingCounts(batchEvents, "15 minutes")
    // same transform applied as a batch plan — parity check vs q49 oracle shape
    val q49 = graft.queries.QueriesFunctions.queries("q49_date_bin")(spark, sfDir)
    val a = streamed.groupBy().agg(sum("n")).head().getLong(0)
    val b = q49.groupBy().agg(sum("n")).head().getLong(0)
    assert(a == b)
  }
}
