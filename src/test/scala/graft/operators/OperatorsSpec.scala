package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

class OperatorsSpec extends SparkTestBase {
  import spark.implicits._

  // ------------------------------------------------------------- as-of

  test("asofJoin matches the most recent prior right row per key") {
    val left = Seq(
      (1L, 10L, "a"), (1L, 25L, "b"), (1L, 5L, "c"),
      (2L, 50L, "d"), (3L, 7L, "e"))
      .toDF("k", "t", "tag").repartition(3)
    val right = Seq(
      (1L, 5L, 100.0), (1L, 20L, 200.0), (1L, 30L, 300.0),
      (2L, 60L, 400.0))
      .toDF("k", "t", "v").repartition(2)

    val out = AsOfJoin.asofJoin(left, right, Seq("k"), "t", "t", Seq("v"))
      .select("k", "t", "tag", "v").as[(Long, Long, String, Option[Double])]
      .collect().sortBy(r => (r._1, r._2))

    assert(out === Seq(
      (1L, 5L, "c", Some(100.0)),   // inclusive: right at exactly t
      (1L, 10L, "a", Some(100.0)),
      (1L, 25L, "b", Some(200.0)),  // not the later 30
      (2L, 50L, "d", None),         // right exists but only later
      (3L, 7L, "e", None)))         // key absent from right
  }

  test("asofJoin ignores null right times and keeps null-time left rows") {
    val left = Seq((1L, Some(10L), "a"), (1L, None, "b")).toDF("k", "t", "tag")
    val right = Seq((1L, Some(4L), 1.0), (1L, None, 99.0)).toDF("k", "t", "v")
    val out = AsOfJoin.asofJoin(left, right, Seq("k"), "t", "t", Seq("v"))
      .select("tag", "v").as[(String, Option[Double])].collect().toMap
    assert(out === Map("a" -> Some(1.0), "b" -> None))
  }

  test("asofJoin never matches NULL keys to NULL keys (equi-join semantics)") {
    val left = Seq((Option.empty[Long], 10L, "a"), (Some(1L), 10L, "b"))
      .toDF("k", "t", "tag")
    val right = Seq((Option.empty[Long], 5L, 9.0), (Some(1L), 5L, 1.0))
      .toDF("k", "t", "v")
    val out = AsOfJoin.asofJoin(left, right, Seq("k"), "t", "t", Seq("v"))
      .select("tag", "v").as[(String, Option[Double])].collect().toMap
    assert(out === Map("a" -> None, "b" -> Some(1.0)))
  }

  test("asofJoin rejects reserved internal column names") {
    val df = Seq((1L, 1L, 0)).toDF("k", "t", "__side")
    intercept[IllegalArgumentException] {
      AsOfJoin.asofJoin(df, df.drop("__side"), Seq("k"), "t", "t", Seq.empty)
    }
  }

  test("asofJoin rejects colliding value column names") {
    val df = Seq((1L, 1L)).toDF("k", "t")
    intercept[IllegalArgumentException] {
      AsOfJoin.asofJoin(df, df.withColumnRenamed("t", "t2"), Seq("k"), "t", "t2", Seq("k"))
    }
  }

  test("asofJoin matches a brute-force reference on seeded random data") {
    val rnd = new scala.util.Random(42)
    val leftRows = Seq.tabulate(300)(i =>
      (rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong, i.toLong))
    val rightRows = Seq.tabulate(200)(i =>
      (rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong * 10 + i, i.toDouble))
      // unique (k, t) per row by construction (t encodes i)
    val left = leftRows.toDF("k", "t", "lid").repartition(5)
    val right = rightRows.toDF("k", "t", "v").repartition(3)

    val got = AsOfJoin.asofJoin(left, right, Seq("k"), "t", "t", Seq("v"))
      .select("lid", "v").as[(Long, Option[Double])].collect().toMap

    leftRows.foreach { case (k, t, lid) =>
      val expected = rightRows.filter(r => r._1 == k && r._2 <= t)
        .sortBy(_._2).lastOption.map(_._3)
      assert(got(lid) === expected, s"left row $lid (k=$k, t=$t)")
    }
  }

  // ------------------------------------------------------ range join

  test("bandJoin finds exactly the in-tolerance pairs (vs brute force)") {
    val rnd = new scala.util.Random(7)
    // times span negative values: bucket-start math must floor, not
    // truncate toward zero, or pairs straddling 0 are dropped
    val leftRows = Seq.tabulate(200)(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(500).toLong - 250L, i.toLong))
    val rightRows = Seq.tabulate(150)(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(500).toLong - 250L, i.toDouble))
    val left = leftRows.toDF("k", "t", "lid").repartition(4)
    val right = rightRows.toDF("k", "t", "v").repartition(3)

    val got = RangeJoin.bandJoin(left, right, Seq("k"), "t", "t", 25L, Seq("v"))
      .select("lid", "v").as[(Long, Double)].collect().toSet

    val expected = (for {
      (lk, lt, lid) <- leftRows
      (rk, rt, v) <- rightRows
      if lk == rk && math.abs(lt - rt) <= 25
    } yield (lid, v)).toSet
    assert(got === expected)
    assert(expected.nonEmpty)   // the seed must actually exercise matches
  }

  test("bandJoin emits each pair once even at bucket boundaries") {
    val left = Seq((1L, 100L, "l0"), (1L, 101L, "l1")).toDF("k", "t", "tag")
    val right = Seq((1L, 100L, 9.0)).toDF("k", "t", "v")
    val out = RangeJoin.bandJoin(left, right, Seq("k"), "t", "t", 100L, Seq("v"))
    assert(out.count() === 2)   // both left rows match exactly once
  }

  test("bandJoin bucketing stays exact at epoch-nano magnitudes") {
    // ~1.7e18 > 2^52: a double round-trip in the bucket math would
    // misplace pairs near bucket boundaries
    val base = 1700000000000000000L
    val tol = 1000000000L   // 1 s in nanos
    val left = Seq((1L, base + tol - 1, 0L), (1L, base + 3 * tol, 1L))
      .toDF("k", "t", "lid")
    val right = Seq((1L, base, 1.0), (1L, base + 2 * tol, 2.0)).toDF("k", "t", "v")
    val got = RangeJoin.bandJoin(left, right, Seq("k"), "t", "t", tol, Seq("v"))
      .select("lid", "v").as[(Long, Double)].collect().toSet
    // lid 0 is within tol of base only; lid 1 within tol of base+2tol only
    assert(got === Set((0L, 1.0), (1L, 2.0)))
  }

  test("intervalJoin finds exactly the containing intervals (vs brute force)") {
    val rnd = new scala.util.Random(11)
    val pointRows = Seq.tabulate(300)(i => (rnd.nextInt(1000).toLong - 500L, i.toLong))
    val ivRows = Seq.tabulate(80) { i =>
      val s = rnd.nextInt(1000).toLong - 500L
      (s, s + rnd.nextInt(120).toLong, i.toLong)
    }
    val points = pointRows.toDF("p", "pid").repartition(4)
    val ivs = ivRows.toDF("s", "e", "iid").repartition(3)
    val got = RangeJoin.intervalJoin(points, ivs, "p", "s", "e", Seq("iid"), 50L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val expected = (for {
      (p, pid) <- pointRows
      (s, e, iid) <- ivRows
      if p >= s && p <= e
    } yield (pid, iid)).toSet
    assert(got === expected)
    assert(expected.nonEmpty)
  }

  test("intervalJoin drops empty/null intervals, null points, caps wide intervals") {
    val points = Seq((Some(10L), 1L), (Some(500000L), 2L), (None: Option[Long], 3L))
      .toDF("p", "pid")
    val ivs = Seq(
      (Some(0L), Some(20L), 1L),                 // matches p=10
      (Some(20L), Some(10L), 2L),                // empty: start > end
      (None: Option[Long], Some(20L), 3L),       // null start
      (Some(0L), Some(100000000L), 4L))          // 10^8 span: over the cap
      .toDF("s", "e", "iid")
    val got = RangeJoin.intervalJoin(points, ivs, "p", "s", "e", Seq("iid"), 100L,
        maxCells = 1000)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 1L)))                // the capped interval is dropped

    // cap disabled: the wide interval matches both non-null points
    val uncapped = RangeJoin.intervalJoin(points, ivs, "p", "s", "e", Seq("iid"), 100L,
        maxCells = 0)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(uncapped === Set((1L, 1L), (1L, 4L), (2L, 4L)))
  }

  test("intervalJoin keeps the internal bound columns out of the result schema") {
    val points = Seq((10L, 1L)).toDF("p", "pid")
    val ivs = Seq((0L, 20L, 1L)).toDF("s", "e", "iid")
    val got = RangeJoin.intervalJoin(points, ivs, "p", "s", "e", Seq("iid"), 50L)
    assert(got.columns.toSet === Set("p", "pid", "iid"))
  }

  test("intervalJoin cell math stays exact at epoch-nano magnitudes") {
    val base = 1700000000000000000L
    val w = 1000000000L
    val points = Seq((base + w - 1, 0L), (base + 3 * w, 1L)).toDF("p", "pid")
    val ivs = Seq((base, base + w, 10L), (base + 2 * w, base + 4 * w, 20L))
      .toDF("s", "e", "iid")
    val got = RangeJoin.intervalJoin(points, ivs, "p", "s", "e", Seq("iid"), w)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got === Set((0L, 10L), (1L, 20L)))
  }

  test("bandJoin rejects a left __b column instead of clobbering it") {
    val l = Seq((1L, 1L, 0L)).toDF("k", "t", "__b")
    val r = Seq((1L, 1L, 1.0)).toDF("k", "t", "v")
    intercept[IllegalArgumentException] {
      RangeJoin.bandJoin(l, r, Seq("k"), "t", "t", 10L, Seq("v"))
    }
  }

  // ------------------------------------------------------ sessionize

  test("withSessionId splits on gaps > maxGap, inclusive boundary") {
    val df = Seq(
      (1L, 0L), (1L, 1000L), (1L, 2000L),          // session 1 (gaps 1000)
      (1L, 3001L),                                 // gap 1001 > 1000 -> session 2
      (2L, 0L))
      .toDF("u", "ts").repartition(3)
    val out = Sessionize.withSessionId(df, F.col("u"), F.col("ts"), 1000L)
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(out === Seq(
      (1L, 0L, 1L), (1L, 1000L, 1L), (1L, 2000L, 1L), (1L, 3001L, 2L),
      (2L, 0L, 1L)))
  }

  test("sessionStats aggregates events and span per session") {
    val df = Seq(
      (1L, 0L), (1L, 500L), (1L, 5000L), (1L, 5200L), (1L, 5400L))
      .toDF("u", "ts")
    val out = Sessionize.sessionStats(df, F.col("u"), F.col("ts"), 1000L)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._2)
    assert(out === Seq((1L, 1L, 2L, 500L), (1L, 2L, 3L, 400L)))
  }

  test("NULL timestamps get NULL session ids and never start sessions") {
    val df = Seq(
      (1L, Option.empty[Long]), (1L, Option.empty[Long]),
      (1L, Some(100L)), (1L, Some(200L)))
      .toDF("u", "ts")
    val ids = Sessionize.withSessionId(df, F.col("u"), F.col("ts"), 1000L)
      .select("session_id").as[Option[Long]].collect()
    assert(ids.count(_.isEmpty) === 2)            // null-ts rows: no session
    assert(ids.flatten.toSet === Set(1L))         // real rows: one session
    val stats = Sessionize.sessionStats(df, F.col("u"), F.col("ts"), 1000L)
      .as[(Long, Long, Long, Long)].collect()
    assert(stats === Array((1L, 1L, 2L, 100L)))   // no fabricated sessions
  }

  test("tied timestamps never split a session") {
    val df = Seq((1L, 100L), (1L, 100L), (1L, 100L)).toDF("u", "ts")
    val out = Sessionize.withSessionId(df, F.col("u"), F.col("ts"), 10L)
      .select("session_id").as[Long].collect()
    assert(out.toSet === Set(1L))
  }
}
