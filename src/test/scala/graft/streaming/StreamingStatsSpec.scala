package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingStats.{Event, Session}

/** §2.7 extension — watermarked windowed aggregation and custom-state
  * sessionization over a MemoryStream: the state-bounded streaming shapes
  * (what AvailableNow file extraction doesn't exercise).
  */
class StreamingStatsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  override def beforeAll(): Unit = { spark = graft.spark.SparkTestSession.create(4) }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def ev(id: Long, user: Long, typ: String, sec: Long, value: Double = 1.0) =
    Event(id, user, typ, new Timestamp(sec * 1000L), value)

  test("windowed agg on a static frame equals plain groupBy(window) (unit semantics)") {
    val sp = spark; import sp.implicits._
    val events = (0 until 100).map(i => ev(i, i % 5, if (i % 2 == 0) "click" else "view", i * 90L))
      .toDF()
    val got = StreamingStats.windowedEventCounts(events, "1 hour", "10 minutes")
      .orderBy("w_start", "event_type").collect().toSeq
    val expect = events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(floor(col("value") * 100).cast("long")).as("cents"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"), col("cents"))
      .orderBy("w_start", "event_type").collect().toSeq
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("streaming windowed agg: watermark finalizes windows, append-mode emits once") {
    val sp = spark; import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = StreamingStats.windowedEventCounts(ms.toDF(), "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("win_counts").outputMode("append").start()
    try {
      // window [0, 1h): 3 clicks + 1 view
      ms.addData(ev(1, 1, "click", 10), ev(2, 1, "click", 600), ev(3, 2, "view", 1800),
        ev(4, 2, "click", 3599))
      q.processAllAvailable()
      // far-future event pushes the watermark past 1h + 10min -> w0 finalized
      ms.addData(ev(5, 3, "click", 3600L * 4))
      q.processAllAvailable()
      ms.addData(ev(6, 3, "click", 3600L * 5)) // one more batch to flush emission
      q.processAllAvailable()
      val rows = spark.table("win_counts")
        .select("w_start", "event_type", "n", "cents")
        .collect().map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(rows.contains((0L, "click", 3L, 300L)), s"got $rows")
      assert(rows.contains((0L, "view", 1L, 100L)), s"got $rows")
    } finally q.stop()
  }

  test("sessionize: gap closes a session in-batch; event-time timeout closes the open one") {
    val sp = spark; import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Event]
    val gapUs = 300000000L // 5 min, µs (gap arithmetic matches the batch twin)
    val q = StreamingStats.sessionize(ms.toDS(), gapUs)
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try {
      // user 1: two events 1s apart (one session), then one 700s later (gap
      // > 5min closes the first IN-BATCH and opens a second). Timestamps sit
      // an hour past the epoch — an event AT the initial watermark (0) would
      // be dropped as late.
      ms.addData(ev(1, 1, "click", 3600), ev(2, 1, "click", 3601), ev(3, 1, "click", 4300))
      q.processAllAvailable()
      // advance the watermark (10 min delay) far past 4300s + gap -> the open
      // session times out; two driver batches so the timeout batch runs
      ms.addData(ev(10, 99, "click", 9000))
      q.processAllAvailable()
      ms.addData(ev(11, 99, "click", 10000))
      q.processAllAvailable()
      val sessions = spark.table("sessions").as[Session].collect()
        .filter(_.user_id == 1L).map(s => (s.start_us, s.end_us, s.n_events)).toSet
      assert(sessions == Set((3600000000L, 3601000000L, 2), (4300000000L, 4300000000L, 1)),
        s"got $sessions")
    } finally q.stop()
  }

  test("sessionize: out-of-order event within the watermark never moves the session end backward") {
    val sp = spark; import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Event]
    val gapUs = 300000000L // 5 min
    val q = StreamingStats.sessionize(ms.toDS(), gapUs)
      .writeStream.format("memory").queryName("sessions_ooo").outputMode("append").start()
    try {
      // batch 1: session last = 3700s (watermark from max ts 3700 - 10 min = 3100)
      ms.addData(ev(1, 1, "click", 3600), ev(2, 1, "click", 3700))
      q.processAllAvailable()
      // batch 2: an OUT-OF-ORDER event at 3650s — legal (>= watermark 3100),
      // within gap of last. The merged session must keep end = 3700s, n = 3.
      ms.addData(ev(3, 1, "click", 3650))
      q.processAllAvailable()
      // advance the watermark far past 3700s + gap, then one flush batch
      ms.addData(ev(10, 99, "click", 9000))
      q.processAllAvailable()
      ms.addData(ev(11, 99, "click", 10000))
      q.processAllAvailable()
      val sessions = spark.table("sessions_ooo").as[Session].collect()
        .filter(_.user_id == 1L).map(s => (s.start_us, s.end_us, s.n_events)).toSet
      assert(sessions == Set((3600000000L, 3700000000L, 3)), s"got $sessions")
    } finally q.stop()
  }

  test("sessionize: out-of-order event more than gap BEFORE the open session opens its own") {
    val sp = spark; import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Event]
    val gapUs = 300000000L // 5 min
    val q = StreamingStats.sessionize(ms.toDS(), gapUs)
      .writeStream.format("memory").queryName("sessions_pre").outputMode("append").start()
    try {
      // batch 1: session at 3600s (watermark from max ts 3600 - 10 min = 3000s)
      ms.addData(ev(1, 1, "click", 3600))
      q.processAllAvailable()
      // batch 2: out-of-order event at 3180s — legal (>= watermark 3000s) but
      // 7 min BEFORE the open session with a 5-min gap: a SEPARATE session,
      // not a backward extension of the open one
      ms.addData(ev(2, 1, "click", 3180))
      q.processAllAvailable()
      // flush: two batches so the timeout batch runs after the watermark jump
      ms.addData(ev(10, 99, "click", 9000))
      q.processAllAvailable()
      ms.addData(ev(11, 99, "click", 10000))
      q.processAllAvailable()
      val sessions = spark.table("sessions_pre").as[Session].collect()
        .filter(_.user_id == 1L).map(s => (s.start_us, s.end_us, s.n_events)).toSet
      assert(sessions == Set((3180000000L, 3180000000L, 1), (3600000000L, 3600000000L, 1)),
        s"got $sessions")
    } finally q.stop()
  }

  test("dedupStream: re-deliveries within the watermark are dropped, first arrival wins") {
    val sp = spark; import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Event]
    val q = StreamingStats.dedupStream(ms.toDS().toDF(), Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_stream").outputMode("append").start()
    try {
      // batch 1: id 1 twice in-batch, id 2 once
      ms.addData(ev(1, 1, "click", 3600), ev(1, 1, "click", 3601), ev(2, 1, "view", 3602))
      q.processAllAvailable()
      // batch 2: id 1 re-delivered (within watermark) + a fresh id 3
      ms.addData(ev(1, 1, "click", 3603), ev(3, 2, "click", 3604))
      q.processAllAvailable()
      val out = spark.table("dedup_stream").as[Event].collect()
      assert(out.map(_.event_id).sorted.toSeq == Seq(1L, 2L, 3L),
        s"got ${out.map(_.event_id).toSeq}")
      // first arrival won: id 1 kept its batch-1 timestamp
      assert(out.find(_.event_id == 1L).get.ts.getTime == 3600000L)
    } finally q.stop()
  }

  test("sessionizeBatch (window-function twin) agrees with streaming sessionize") {
    val sp = spark; import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // deterministic multi-user event set with gaps straddling the threshold;
    // timestamps far from 0 so nothing is watermark-late
    val base = 100000L
    val events = (0 until 120).map { i =>
      val user = i % 4
      // per-user event spacing alternates 100s / 700s -> several sessions each
      val step = (i / 4) * 100L + (i / 4 / 3) * 700L
      ev(i.toLong, user, "click", base + step)
    }
    val gapUs = 300000000L
    // the twins now share ONE µs gap value and µs arithmetic — no unit
    // conversion on either side of the comparison
    val batch = StreamingStats.sessionizeBatch(events.toDF(), gapUs)
      .select(col("user_id"), col("start_us"), col("end_us"),
        col("n_events").cast("int"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val ms = MemoryStream[Event]
    val q = StreamingStats.sessionize(ms.toDS(), gapUs)
      .writeStream.format("memory").queryName("sessions_xchk").outputMode("append").start()
    try {
      ms.addData(events: _*)
      q.processAllAvailable()
      // flush: push the watermark far past every session end + gap
      ms.addData(ev(9000, 99, "click", base + 10000000L))
      q.processAllAvailable()
      ms.addData(ev(9001, 99, "click", base + 20000000L))
      q.processAllAvailable()
      val streamed = spark.table("sessions_xchk").as[Session].collect()
        .filter(_.user_id != 99L)
        .map(s => (s.user_id, s.start_us, s.end_us, s.n_events)).toSet
      assert(streamed == batch, s"stream ${streamed.size} vs batch ${batch.size}")
      assert(batch.size > events.length / 10, "fixture must produce several sessions")
    } finally q.stop()
  }

  test("sessionize: a sub-ms fraction past the gap SPLITS, exactly like the batch twin") {
    val sp = spark; import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // event B lands gap + 1µs after A: round 3 compared ts.getTime (ms,
    // truncated) so the pair MERGED in streaming while sessionizeBatch and
    // the a07 oracle split it — the micro-precision divergence of the
    // round-3 ADVICE. Both sides must split now.
    val gapUs = 300000000L
    val tA = new Timestamp(3600000L); tA.setNanos(0)
    val tB = new Timestamp(3600000L + gapUs / 1000L); tB.setNanos(1000) // +1µs
    val a = Event(1, 1, "click", tA, 1.0)
    val b = Event(2, 1, "click", tB, 1.0)
    val batch = StreamingStats.sessionizeBatch(Seq(a, b).toDF(), gapUs)
      .select(col("user_id"), col("start_us"), col("end_us"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(batch.size == 2, s"batch must split the gap+1µs pair, got $batch")
    val ms = MemoryStream[Event]
    val q = StreamingStats.sessionize(ms.toDS(), gapUs)
      .writeStream.format("memory").queryName("sessions_us").outputMode("append").start()
    try {
      ms.addData(a, b)
      q.processAllAvailable()
      ms.addData(Event(10, 99, "click", new Timestamp(9000000L), 1.0))
      q.processAllAvailable()
      ms.addData(Event(11, 99, "click", new Timestamp(10000000L), 1.0))
      q.processAllAvailable()
      val streamed = spark.table("sessions_us").as[Session].collect()
        .filter(_.user_id == 1L)
        .map(s => (s.user_id, s.start_us, s.end_us, s.n_events.toLong)).toSet
      assert(streamed == batch, s"stream $streamed vs batch $batch")
    } finally q.stop()
  }

  test("dedupFirstBatch (window twin) agrees with dedupStream on ordered delivery") {
    val sp = spark; import sp.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // duplicate keys with distinct timestamps, delivered in event-time order
    val events = (0 until 60).map { i =>
      ev(i.toLong, i % 7, if (i % 2 == 0) "click" else "view", 100000L + i * 10L)
    }
    val batch = StreamingStats
      .dedupFirstBatch(events.toDF(), Seq("user_id", "event_type"))
      .select("event_id", "user_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val ms = MemoryStream[Event]
    val q = StreamingStats.dedupStream(ms.toDS().toDF(), Seq("user_id", "event_type"))
      .writeStream.format("memory").queryName("dedup_twin").outputMode("append").start()
    try {
      ms.addData(events: _*)
      q.processAllAvailable()
      val streamed = spark.table("dedup_twin").as[Event].collect()
        .map(e => (e.event_id, e.user_id, e.event_type)).toSet
      assert(streamed == batch, s"stream ${streamed.size} vs batch ${batch.size}")
      assert(batch.size == 14, s"7 users x 2 types, got ${batch.size}")
    } finally q.stop()
  }
}
