package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

/**
 * The salted/bucketed skew variants must be RESULT-IDENTICAL to their
 * plain forms — verified over the real sf0.001 events table, plus
 * synthetic NULL-edge cases.
 */
class SkewVariantsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val ev = sf("sf0.001", "events")
  private lazy val clicks = ev.filter(F.col("event_type") === "click")
    .select(F.col("user_id"), F.unix_millis(F.col("ts")).as("ms"))
  private lazy val purchases = ev.filter(F.col("event_type") === "purchase")
    .select(F.col("user_id"), F.unix_millis(F.col("ts")).as("ms"), F.col("value"))
    .groupBy(F.col("user_id"), F.col("ms"))
    .agg(F.max(F.col("value")).as("purchase_value"))

  test("asofJoinSalted equals asofJoin on real events") {
    val plain = AsOfJoin
      .asofJoin(clicks, purchases, Seq("user_id"), "ms", "ms", Seq("purchase_value"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).sorted(Ordering.by(
          (t: (Long, Long, Option[Double])) => (t._1, t._2)))
    assert(plain.nonEmpty)
    for (buckets <- Seq(2, 7)) {
      val salted = AsOfJoin
        .asofJoinSalted(clicks, purchases, Seq("user_id"), "ms", "ms",
          Seq("purchase_value"), buckets)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).sorted(Ordering.by(
            (t: (Long, Long, Option[Double])) => (t._1, t._2)))
      assert(salted.toSeq === plain.toSeq, s"buckets=$buckets")
    }
  }

  test("withSessionIdBucketed equals withSessionId on real events at varied spans") {
    val df = ev.select(F.col("user_id").as("u"), F.unix_millis(F.col("ts")).as("ts"))
    val gap = 1800000L   // 30 min
    val plain = Sessionize.withSessionId(df, F.col("u"), F.col("ts"), gap)
      .select("u", "ts", "session_id").as[(Long, Long, Long)]
      .collect().sorted.toSeq
    assert(plain.nonEmpty)
    // span > gap, span < gap (stitch across empty buckets), span >> data range
    for (span <- Seq(3600000L, 600000L, 365L * 86400000L)) {
      val bucketed = Sessionize
        .withSessionIdBucketed(df, F.col("u"), F.col("ts"), gap, span)
        .select("u", "ts", "session_id").as[(Long, Long, Long)]
        .collect().sorted.toSeq
      assert(bucketed === plain, s"span=$span")
    }
  }

  test("bandJoin broadcastRight equals the shuffled default on real events") {
    val p = purchases.withColumnRenamed("ms", "pms")
      .select("user_id", "pms", "purchase_value")
    def run(bc: Boolean) = RangeJoin
      .bandJoin(clicks, p, Seq("user_id"), "ms", "pms", 600000L,
        Seq("purchase_value"), broadcastRight = bc)
      .select("user_id", "ms", "__rt", "purchase_value")
      .as[(Long, Long, Long, Double)].collect().sorted.toSeq
    val shuffled = run(false)
    assert(shuffled.nonEmpty)
    assert(run(true) === shuffled)
  }

  test("withSessionIdBucketed preserves NULL-ts and NULL-key semantics") {
    val df = Seq(
      (Option(1L), Option(10L)), (Option(1L), Option(20L)), (Option(1L), Option(500L)),
      (Option(1L), None),                       // null ts: null session
      (None: Option[Long], Option(15L)), (None: Option[Long], Option(400L)),  // null key group
      (None: Option[Long], None))
      .toDF("u", "ts").repartition(3)
    val gap = 100L
    val plain = Sessionize.withSessionId(df, F.col("u"), F.col("ts"), gap)
      .select("u", "ts", "session_id")
      .as[(Option[Long], Option[Long], Option[Long])].collect().sortBy(r => (r._1, r._2))
    val bucketed = Sessionize.withSessionIdBucketed(df, F.col("u"), F.col("ts"), gap, 50L)
      .select("u", "ts", "session_id")
      .as[(Option[Long], Option[Long], Option[Long])].collect().sortBy(r => (r._1, r._2))
    assert(bucketed.toSeq === plain.toSeq)
    // sanity on the semantics themselves
    val byRow = plain.collect { case (Some(1L), Some(t), s) => t -> s }.toMap
    assert(byRow(10L) === byRow(20L))          // same session (gap 10 <= 100)
    assert(byRow(500L) !== byRow(20L))         // new session (gap 480 > 100)
  }

  test("a hot key spreads across bucketed window partitions") {
    // one key, 10k events over 10k seconds: plain windowing puts all of
    // them in ONE sort partition; bucketed spreads them ~evenly
    val df = spark.range(0, 10000).select(F.lit(1L).as("u"), (F.col("id") * 1000L).as("ts"))
    val out = Sessionize.withSessionIdBucketed(df, F.col("u"), F.col("ts"),
      maxGap = 5000L, bucketSpan = 100000L)
    // every event 1s apart, gap 5s -> single global session despite 100 buckets
    val sessions = out.select("session_id").distinct().as[Long].collect()
    assert(sessions.toSeq === Seq(1L))
    val cnt = out.count()
    assert(cnt === 10000L)
  }

  test("AutoSkew profiles keys and dispatches only on measured skew") {
    // 1 hot key with 5000 rows + 500 uniform keys with 10 each
    val hot = Seq.tabulate(5000)(i => (0L, i.toLong * 10))
    val cold = for (k <- 1 to 500; i <- 0 until 10)
      yield (k.toLong, i.toLong * 10)
    val skewed = (hot ++ cold).toDF("u", "ts").repartition(8)
    val pSkew = AutoSkew.profileKeys(skewed, Seq("u"))
    assert(pSkew.maxCount === 5000L && pSkew.nKeys === 501L)
    assert(pSkew.isSkewed(8.0, 1000L))
    assert(!pSkew.isSkewed(8.0, 1000000L))   // hot key too small in absolute terms
    assert(AutoSkew.chooseBuckets(pSkew) >= 2)

    val uniform = cold.toDF("u", "ts")
    assert(!AutoSkew.profileKeys(uniform, Seq("u")).isSkewed(8.0, 1L))

    // both dispatch branches equal the plain operator's output
    def sessions(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
      df.select(F.col("u"), F.col("ts"), F.col("session_id"))
        .as[(Long, Long, Long)].collect().sortBy(t => (t._1, t._2)).toSeq
    val plain = sessions(Sessionize.withSessionId(
      skewed, F.col("u"), F.col("ts"), 25L))
    val viaBucketed = sessions(AutoSkew.withSessionIdAuto(
      skewed, "u", F.col("ts"), 25L, minHotCount = 1000L))
    val viaPlain = sessions(AutoSkew.withSessionIdAuto(
      skewed, "u", F.col("ts"), 25L, minHotCount = 1000000L))
    assert(viaBucketed === plain)
    assert(viaPlain === plain)

    // as-of auto: salted branch equals plain on the real events
    val auto = AutoSkew.asofJoinAuto(clicks, purchases, Seq("user_id"),
        "ms", "ms", Seq("purchase_value"), skewThreshold = 0.5, minHotCount = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .sortBy(t => (t._1, t._2)).toSeq
    val asofPlain = AsOfJoin
      .asofJoin(clicks, purchases, Seq("user_id"), "ms", "ms", Seq("purchase_value"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(auto === asofPlain)
  }
}
