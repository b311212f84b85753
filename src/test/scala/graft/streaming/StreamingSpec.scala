package graft.streaming

import java.sql.Timestamp
import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.{functions => F}
import graft.sketch.{functions => G, DataDogCodec}

class StreamingSpec extends SparkTestBase {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("windowed sketch aggregation over a memory stream") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Timestamp, String, Double)]
    val stream = input.toDF().toDF("ts", "service", "latency")

    val agg = SketchStreaming.windowedSketchAgg(
      stream, "ts", "service", "latency", "10 minutes", "5 minutes")

    val query = agg.writeStream
      .format("memory")
      .queryName("sketch_stream")
      .outputMode("complete")
      .start()

    try {
      input.addData(
        (ts(1), "api", 10.0), (ts(2), "api", 20.0), (ts(3), "db", 5.0),
        (ts(11), "api", 100.0))
      query.processAllAvailable()
      input.addData(
        (ts(4), "api", 30.0), (ts(12), "api", 200.0), (ts(13), "db", 7.0))
      query.processAllAvailable()

      val out = spark.sql(
        """SELECT service, unix_timestamp(window.start) AS ws,
          |       ddsketch_count(sketch) AS cnt,
          |       ddsketch_quantile(sketch, 0.5) AS p50
          |FROM sketch_stream ORDER BY service, ws""".stripMargin).collect()

      val byKey = out.map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
      val w0 = Timestamp.valueOf("2026-01-01 10:00:00").getTime / 1000
      val w1 = Timestamp.valueOf("2026-01-01 10:10:00").getTime / 1000
      // api in [10:00,10:10): 10,20,30 → count 3, p50 ~20
      assert(byKey(("api", w0))._1 == 3L)
      assert(math.abs(byKey(("api", w0))._2 - 20.0) / 20.0 < 0.03)
      // api in [10:10,10:20): 100,200 → count 2
      assert(byKey(("api", w1))._1 == 2L)
      // db windows
      assert(byKey(("db", w0))._1 == 1L)
      assert(byKey(("db", w1))._1 == 1L)
    } finally query.stop()
  }

  test("windowed heavy-hitter sketches track per-window item frequencies") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Timestamp, String, String)]
    val stream = input.toDF().toDF("ts", "shard", "url")

    val agg = SketchStreaming.windowedFrequencyAgg(
      stream, "ts", "shard", "url", "10 minutes", "5 minutes")

    val query = agg.writeStream.format("memory")
      .queryName("freq_stream").outputMode("complete").start()
    try {
      input.addData(
        (ts(1), "a", "/home"), (ts(2), "a", "/home"), (ts(3), "a", "/login"),
        (ts(11), "a", "/home"))
      query.processAllAvailable()
      input.addData((ts(4), "a", "/home"), (ts(12), "a", "/checkout"))
      query.processAllAvailable()

      val out = spark.sql(
        """SELECT unix_timestamp(window.start) AS ws,
          |       cms_estimate(cms, '/home') AS home_freq,
          |       cms_total(cms) AS n,
          |       topk_items(topk, 1)[0].item AS top1,
          |       topk_items(topk, 1)[0].count AS top1_cnt
          |FROM freq_stream WHERE shard = 'a' ORDER BY ws""".stripMargin).collect()

      val w0 = Timestamp.valueOf("2026-01-01 10:00:00").getTime / 1000
      val w1 = Timestamp.valueOf("2026-01-01 10:10:00").getTime / 1000
      val byWin = out.map(r =>
        r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4))).toMap
      // window 0: /home x3, /login x1 — accumulated across both batches
      assert(byWin(w0) === ((3L, 4L, "/home", 3L)))
      // window 1: /home x1, /checkout x1
      assert(byWin(w1)._2 === 2L)
      assert(byWin(w1)._1 === 1L)
    } finally query.stop()
  }

  test("session_window sketch aggregation closes sessions at the gap") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Timestamp, String, Double)]
    val agg = SketchStreaming.sessionizedSketchAgg(
      input.toDF().toDF("ts", "service", "latency"),
      "ts", "service", "latency", "10 minutes", "5 minutes")

    val query = agg.writeStream.format("memory").queryName("sess_stream")
      .outputMode("append").start()
    try {
      // one session: 10:01, 10:02 (gap 1 min); then an event far enough
      // ahead to advance the watermark past the session's close
      input.addData((ts(1), "api", 10.0), (ts(2), "api", 30.0))
      query.processAllAvailable()
      input.addData((Timestamp.valueOf("2026-01-01 10:40:00"), "api", 99.0))
      query.processAllAvailable()

      val out = spark.sql(
        """SELECT service, unix_timestamp(session_window.start) AS ws,
          |       unix_timestamp(session_window.end) AS we,
          |       n_events, ddsketch_count(sketch) AS cnt
          |FROM sess_stream""".stripMargin).collect()
      assert(out.length === 1)   // only the closed session is emitted
      val r = out.head
      assert(r.getString(0) === "api")
      assert(r.getLong(3) === 2L)
      assert(r.getLong(4) === 2L)
      // session spans first event to last event + gap
      assert(r.getLong(2) - r.getLong(1) === 60 + 600)
    } finally query.stop()
  }

  test("streaming dedup drops repeated content within the watermark") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Timestamp, String)]
    val out = SketchStreaming.dedupStream(
      input.toDF().toDF("ts", "text"), "ts", "text", "10 minutes")

    val query = out.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      input.addData((ts(1), "alpha"), (ts(2), "alpha"), (ts(3), "beta"))
      query.processAllAvailable()
      input.addData((ts(4), "beta"), (ts(5), "gamma"))
      // NULL content must pass through un-deduplicated: three unknown
      // payloads are not provably equal
      input.addData((ts(6), null), (ts(7), null))
      query.processAllAvailable()
      val texts = spark.sql("SELECT text FROM dedup_stream")
        .collect().map(r => Option(r.getString(0)).getOrElse("<null>")).sorted
      assert(texts === Array("<null>", "<null>", "alpha", "beta", "gamma"))
    } finally query.stop()
  }

  test("flatMapGroupsWithState running sketch accumulates across batches") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Timestamp, String, Double)]
    val out = SketchStreaming.runningSketchPerKey(
      input.toDF().toDF("ts", "service", "latency"),
      "ts", "service", "latency", watermarkDelay = "10 minutes")

    val query = out.writeStream.format("memory").queryName("running_sketch")
      .outputMode("append").start()
    try {
      input.addData((ts(1), "api", 10.0), (ts(2), "api", 20.0), (ts(3), "db", 5.0))
      query.processAllAvailable()
      input.addData((ts(4), "api", 30.0))
      query.processAllAvailable()

      // latest emission per key carries the lifetime-to-date sketch
      val latest = spark.sql(
        """SELECT key, ddsketch_count(sketch) AS cnt, n_updates,
          |       ddsketch_quantile(sketch, 0.5) AS p50
          |FROM (SELECT *, row_number() OVER (PARTITION BY key
          |                                   ORDER BY n_updates DESC) AS rn
          |      FROM running_sketch) t
          |WHERE rn = 1""".stripMargin).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
      assert(latest("api")._1 === 3L)   // 10, 20, 30 across two batches
      assert(latest("api")._2 === 3L)
      assert(math.abs(latest("api")._3 - 20.0) / 20.0 < 0.03)
      assert(latest("db")._1 === 1L)
    } finally query.stop()
  }

  test("streamed sketches merge with batch sketches (same wire format)") {
    val session = spark
    import session.implicits._
    implicit val sqlCtx = spark.sqlContext

    val input = MemoryStream[(Timestamp, String, Double)]
    val agg = SketchStreaming.windowedSketchAgg(
      input.toDF().toDF("ts", "service", "latency"),
      "ts", "service", "latency", "10 minutes", "5 minutes")
    val query = agg.writeStream.format("memory").queryName("sk2")
      .outputMode("complete").start()
    try {
      input.addData((ts(1), "api", 50.0), (ts(2), "api", 60.0))
      query.processAllAvailable()
      // merge the streaming output sketch with a batch-built sketch
      val streamed = spark.sql("SELECT sketch FROM sk2").collect().head.getAs[Array[Byte]](0)
      val batch = { val s = graft.sketch.DDSketch(0.01); s.add(70.0); DataDogCodec.encode(s) }
      val merged = Seq((streamed, batch)).toDF("a", "b")
        .select(G.ddsketch_count(G.ddsketch_merge(F.col("a"), F.col("b"))).as("c"))
        .collect().head.getAs[Long]("c")
      assert(merged == 3L)
    } finally query.stop()
  }
}
