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

case class EvJ(ts: Timestamp, user_id: Long, event_id: Long)

class StreamJoinSpec extends SparkTestBase {
  import spark.implicits._
  private def ts(minute: Int) = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("stream-stream interval join matches views to clicks within the horizon") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[EvJ]
    val clicks = MemoryStream[EvJ]
    views.addData(EvJ(ts(0), 1, 100), EvJ(ts(5), 1, 101), EvJ(ts(0), 2, 200))
    // click at 10:30 joins views within [09:30, 10:30]; user 3 has no view
    clicks.addData(EvJ(ts(30), 1, 900), EvJ(ts(31), 3, 901))
    val q = EventsStream.intervalJoin(views.toDF(), clicks.toDF(), horizon = "1 hour")
      .writeStream.format("memory").queryName("sjoin").outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("SELECT click_id, view_id FROM sjoin ORDER BY view_id").collect()
      assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((900L, 100L), (900L, 101L)))
    } finally q.stop()
  }
}

/** Type-system fringe the engine does NOT support (SURVEY §7 hard parts):
  * each case pins the FAILURE MODE — a loud error, never silent coercion —
  * so a user porting schemas knows what happens (reference types:
  * NumericType.java unbounded precision, TimeTZType.java, BitStringType
  * .java). */
class TypeFringeSpec extends SparkTestBase {
  test("NUMERIC beyond precision 38 errors loudly") {
    val e = intercept[Exception](spark.sql("SELECT CAST(1 AS DECIMAL(40,2))").collect())
    assert(e.getMessage.toLowerCase.contains("decimal") ||
      e.getMessage.contains("38"), e.getMessage)
  }

  test("TIMETZ has no Spark type: DDL errors, does not coerce") {
    val e = intercept[Exception](
      spark.sql("CREATE TABLE graft_timetz_t (t TIMETZ) USING parquet").collect())
    assert(e.getMessage.toUpperCase.contains("TIMETZ") ||
      e.getMessage.toLowerCase.contains("datatype"), e.getMessage)
  }

  test("BIT(n) has no Spark type: DDL errors, does not coerce") {
    val e = intercept[Exception](
      spark.sql("CREATE TABLE graft_bit_t (b BIT(3)) USING parquet").collect())
    assert(e.getMessage.toUpperCase.contains("BIT") ||
      e.getMessage.toLowerCase.contains("datatype"), e.getMessage)
  }
}

/** The stateless pipeline operators run on streams verbatim: chunking is
  * scan-project-generate (no state, no watermark needed), so a streaming
  * ingest can emit training chunks incrementally. */
class StreamChunkSpec extends SparkTestBase {
  import spark.implicits._

  test("chunkByTokens over a memory stream emits chunks incrementally") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val q = graft.operators.TextAnalysis
      .chunkByTokens(docs, "doc_id", "text", maxTokens = 8, overlap = 2)
      .writeStream.format("memory").queryName("chunks").outputMode("append").start()
    try {
      mem.addData((1L, (1 to 14).map("w" + _).mkString(" ")))
      q.processAllAvailable()
      mem.addData((2L, "short doc"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM chunks ORDER BY doc_id, chunk_id").collect()
      // doc 1: 14 tokens, step 6 -> chunks at 0,6 -> 2 chunks; doc 2: 1 chunk
      assert(rows.length == 3)
      assert(rows(0).getInt(3) == 8 && rows(1).getInt(3) == 8)
      assert(rows(2).getString(2) == "short doc")
    } finally q.stop()
  }
}

/** Streaming repetition metrics (DocsStream): stateless per-document
  * transforms with values identical to the batch TextAnalysis twin, plus
  * the single-stateful-layer windowed reject rate. */
class StreamRepetitionSpec extends SparkTestBase {
  import org.apache.spark.sql.functions._

  test("docRepetitionMetrics matches batch repetitionStats value-for-value") {
    val docs = Tables.load(spark, sfDir, "documents")
    val batch = graft.operators.TextAnalysis.repetitionStats(docs, "doc_id", "text")
      .select(col("doc_id"), round(col("dup_line_frac"), 9).as("d"),
        round(col("top_bigram_share"), 9).as("b"))
    val streamShaped = graft.streaming.DocsStream.docRepetitionMetrics(docs, "text")
      .select(col("doc_id"), round(col("dup_line_frac"), 9).as("d"),
        round(col("top_bigram_share"), 9).as("b"))
    assert(batch.exceptAll(streamShaped).count() == 0)
    assert(streamShaped.exceptAll(batch).count() == 0)
  }

  test("windowedRejectRate runs as a real watermarked stream") {
    val docs = Tables.load(spark, sfDir, "documents")
      .withColumn("ts", expr("timestamp_millis(1700000000000 + doc_id * 60000)"))
    val dir = graft.ArtifactStore.scratchDir("docstream").toFile.getAbsolutePath
    docs.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(
      docs.schema).parquet(dir)
    val q = graft.streaming.DocsStream
      .windowedRejectRate(stream, "text", "ts", "1 hour")
      .writeStream.format("memory").queryName("rejrate")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT sum(n_docs), sum(n_rejected) FROM rejrate").head()
      // append mode holds back watermark-open windows; everything emitted
      // must be consistent and the batch ground truth bounds it
      val total = docs.count()
      assert(rows.getLong(0) <= total && rows.getLong(0) > 0)
      assert(rows.getLong(1) <= rows.getLong(0))
    } finally q.stop()
  }
}

case class Doc(ts: Timestamp, doc_id: Long, text: String, url: String)

/** Streaming dedup: watermark-bounded exact + URL-canonical dedup with
  * batch parity on the kept-key sets. */
class StreamDocDedupSpec extends SparkTestBase {
  import spark.implicits._
  import graft.streaming.DedupStream

  private def ts(minute: Int) = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("exact dedup keeps one row per text within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val q = DedupStream.dedupExactStream(mem.toDF(), "ts", Seq("text"))
      .writeStream.format("memory").queryName("dedup_exact").outputMode("append").start()
    try {
      // batch 1: duplicate inside the batch
      mem.addData(
        Doc(ts(1), 1, "alpha beta", "u1"), Doc(ts(2), 2, "alpha beta", "u2"),
        Doc(ts(3), 3, "gamma", "u3"))
      q.processAllAvailable()
      // batch 2: duplicate ACROSS batches, still inside the horizon
      mem.addData(Doc(ts(4), 4, "gamma", "u4"), Doc(ts(5), 5, "delta", "u5"))
      q.processAllAvailable()
      val kept = spark.sql("SELECT text FROM dedup_exact").collect().map(_.getString(0))
      assert(kept.sorted.toSeq == Seq("alpha beta", "delta", "gamma"))

      // parity: the streaming kept-key set equals the batch Dedup.exact
      // key set over the same rows
      val batch = Seq(
        (1L, "alpha beta"), (2L, "alpha beta"), (3L, "gamma"),
        (4L, "gamma"), (5L, "delta")).toDF("doc_id", "text")
      val batchKeys = graft.operators.Dedup.exact(batch, "doc_id", Seq("text"))
        .select("text").collect().map(_.getString(0)).sorted.toSeq
      assert(kept.sorted.toSeq == batchKeys)
    } finally q.stop()
  }

  test("URL dedup collapses tracking-param/case/fragment variants") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val q = DedupStream.dedupUrlStream(mem.toDF(), "url", "ts")
      .writeStream.format("memory").queryName("dedup_url").outputMode("append").start()
    try {
      mem.addData(
        Doc(ts(1), 1, "a", "HTTPS://WWW.Example.ORG:443/p?utm_source=x&a=1"),
        Doc(ts(2), 2, "b", "https://example.org/p?a=1#frag"),
        Doc(ts(3), 3, "c", "https://example.org/q?a=1"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT doc_id, canon_url FROM dedup_url ORDER BY doc_id").collect()
      // the first two URLs canonicalize identically -> one survivor
      assert(rows.length == 2)
      assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 3L))
      assert(rows(0).getString(1) == "https://example.org/p?a=1")
    } finally q.stop()
  }
}
