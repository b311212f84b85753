package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}
import graft.sketch.{functions => G}
import graft.sketch.Graft

/**
 * Driver contract — one named query per implemented operator
 * (SURVEY.md §2), each with a DuckDB-oracle SQL twin where ANSI SQL can
 * express it.
 *
 * Oracle strategy (FIXTURES.md §C): sketch counts are exact → compared
 * directly against `count(*)`; sketch-derived floats (sum/avg/min/max/
 * quantiles) are approximations with bounded relative error → the Spark
 * side computes BOTH the sketch value and the exact value and emits a
 * within-tolerance boolean, which the oracle pins to `true`. Pure
 * relational queries get direct exact oracles.
 */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  // planted crawl corpus shared by the q_links/q_pagerank/q_link_anchors/
  // q_host_graph family: one page per document with in-plan HTML whose
  // link structure the oracles re-derive arithmetically from doc_id
  private def crawlPages(s: SparkSession, dir: String): DataFrame = {
    val id = F.col("doc_id")
    val str = (c: Column) => c.cast("string")
    val url = F.concat(F.lit("http://site"), str(id % 9), F.lit(".com/dir"),
      str(id % 4), F.lit("/page"), str(id), F.lit(".html"))
    val html = F.concat(
      F.lit("<html><body><p>intro</p><a href=\"/top/"), str(id % 7),
      F.lit("\">Top &amp; best</a>"),
      F.lit("<a href='rel"), str(id % 5), F.lit(".html'>rel <b>link</b></a>"),
      F.lit("<a href=\"http://ext"), str(id % 3), F.lit(".org/x\">ext</a>"),
      F.lit("<a href=\"mailto:a@b.c\">mail</a>"),
      F.when(id % 2 === 0,
        F.lit("<a href=\"//cdn.net/l.js\">cdn</a>")).otherwise(F.lit("")),
      F.lit("</body></html>"))
    t(s, dir, "documents").select(id.as("doc_id"), url.as("url"), html.as("html"))
  }

  // |sketch - exact| <= tol * |exact|, in multiplication form: safe under
  // ANSI mode when exact = 0 (then the sketch value must be exactly 0 too).
  private def ok(sketchVal: Column, exactVal: Column, tol: Double = 0.05): Column =
    F.abs(sketchVal - exactVal) <= F.abs(exactVal) * tol

  // DDSketch's guarantee is relative to the ORDER STATISTIC at
  // rank floor(q*(n-1)) (strict-> bin selection, SURVEY.md §1.2), not to
  // an interpolated percentile — sparse tails make interpolation drift
  // arbitrarily far from any actual data value. `sorted` is
  // sort_array(collect_list(x)); 1-based element_at.
  private def rankValue(sorted: Column, cnt: Column, q: Double): Column =
    F.element_at(sorted,
      (F.floor(F.lit(q) * (cnt - 1).cast("double")) + 1).cast("int"))

  // bin_to_value returns up to ~2.1% above the true value plus the
  // accuracy margin (gamma^i*(1+alpha) vs v in (gamma^(i-1), gamma^i])
  private val RankTol = 0.035

  /** Flagship query (SURVEY.md §7.2): per-event-type latency stats from a
    * one-pass values→sketch aggregation over events. */
  def entry(spark: SparkSession): DataFrame = {
    Graft.register(spark)
    val events = t(spark, "/root/testdata/sf0.001", "events")
    events.groupBy(F.col("event_type"))
      .agg(G.ddsketch_stats_agg_values(F.col("value")).as("stats"))
      .select(
        F.col("event_type"),
        F.col("stats.count").as("count"),
        F.col("stats.p50").as("p50"),
        F.col("stats.p95").as("p95"),
        F.col("stats.p99").as("p99"))
      .orderBy("event_type")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ----------------------------------------------------------------
    // Sketch operator queries (SURVEY.md §2.1)
    // ----------------------------------------------------------------

    // #1 ddsketch_create: empty sketch, count 0, non-empty blob
    "q_sketch_create" -> ((s: SparkSession, _: String) => {
      Graft.register(s)
      val viaDf = G.ddsketchCreateDF(s, 0.01).select(
        G.ddsketch_count(F.col("sketch")).as("cnt"),
        (F.octet_length(F.col("sketch")) > 0).as("nonempty"),
        G.ddsketch_sum(F.col("sketch")).isNull.as("sum_is_null"))
      // the same surface as a true SQL table function (the reference's
      // own shape: ddsketch_create IS a 1-row table function) — both
      // forms must agree
      val viaTvf = s.sql(
        """SELECT ddsketch_count(sketch) AS cnt,
          |       octet_length(sketch) > 0 AS nonempty,
          |       ddsketch_sum(sketch) IS NULL AS sum_is_null
          |FROM ddsketch_create(0.01)""".stripMargin)
      viaDf.union(viaTvf).distinct()
    }),

    // #2 ddsketch_add: fold one extra value into a grouped sketch
    "q_sketch_add" -> ((s: SparkSession, dir: String) => {
      Graft.register(s)
      t(s, dir, "events").groupBy(F.col("event_type"))
        .agg(G.ddsketch_agg_values(F.col("value")).as("sk"),
             F.count(F.lit(1)).as("exact_cnt"))
        .select(F.col("event_type"),
          G.ddsketch_count(G.ddsketch_add(F.col("sk"), F.lit(1000.0))).as("cnt_after_add"),
          (F.col("exact_cnt") + 1).as("expected"))
        .withColumn("add_ok", F.col("cnt_after_add") === F.col("expected"))
        .select("event_type", "cnt_after_add", "add_ok")
        .orderBy("event_type")
    }),

    // #3 ddsketch_merge: merge sketches of two disjoint halves
    "q_sketch_merge" -> ((s: SparkSession, dir: String) => {
      Graft.register(s)
      val ev = t(s, dir, "events")
      val lo = ev.filter(F.col("user_id") % 2 === 0).groupBy(F.col("event_type"))
        .agg(G.ddsketch_agg_values(F.col("value")).as("sk_lo"))
      val hi = ev.filter(F.col("user_id") % 2 === 1).groupBy(F.col("event_type"))
        .agg(G.ddsketch_agg_values(F.col("value")).as("sk_hi"))
      lo.join(hi, "event_type")
        .select(F.col("event_type"),
          G.ddsketch_count(G.ddsketch_merge(F.col("sk_lo"), F.col("sk_hi"))).as("cnt"))
        .orderBy("event_type")
    }),

    // weighted ingestion: pre-aggregated (value, count) rows build the
    // SAME sketch as raw values (bin counts are integer-exact sums, so
    // count/min/max/quantiles match the raw-values sketch exactly);
    // scalar add_weighted skips count <= 0 per the reference's
    // add_with_count (datadog_encoding.rs:723-726)
    "q_sketch_weighted" -> ((s: SparkSession, dir: String) => {
      Graft.register(s)
      val ev = t(s, dir, "events")
      // the warehouse shape: values arrive pre-grouped with counts
      val grouped = ev.groupBy(F.col("event_type"), F.col("value"))
        .agg(F.count(F.lit(1)).cast("double").as("c"))
      val weighted = grouped.groupBy(F.col("event_type"))
        .agg(G.ddsketch_agg_weighted(F.col("value"), F.col("c")).as("wsk"))
      val raw = ev.groupBy(F.col("event_type"))
        .agg(G.ddsketch_agg_values(F.col("value")).as("rsk"),
             F.count(F.lit(1)).as("exact_cnt"))
      weighted.join(raw, "event_type")
        .select(F.col("event_type"),
          G.ddsketch_count(F.col("wsk")).as("cnt"),
          (G.ddsketch_count(F.col("wsk")) === F.col("exact_cnt")).as("wcount_ok"),
          (G.ddsketch_min(F.col("wsk")) === G.ddsketch_min(F.col("rsk")) &&
           G.ddsketch_max(F.col("wsk")) === G.ddsketch_max(F.col("rsk"))).as("minmax_ok"),
          ok(G.ddsketch_quantile(F.col("wsk"), 0.5),
             G.ddsketch_quantile(F.col("rsk"), 0.5), 1e-12).as("p50_ok"),
          ok(G.ddsketch_quantile(F.col("wsk"), 0.95),
             G.ddsketch_quantile(F.col("rsk"), 0.95), 1e-12).as("p95_ok"),
          ok(G.ddsketch_sum(F.col("wsk")), G.ddsketch_sum(F.col("rsk")), 1e-9).as("sum_ok"),
          // scalar weighted insert: count 2 adds 2, count <= 0 adds nothing
          (G.ddsketch_count(G.ddsketch_add_weighted(F.col("wsk"), F.lit(7.5), F.lit(2.0)))
            === F.col("exact_cnt") + 2).as("add2_ok"),
          (G.ddsketch_count(G.ddsketch_add_weighted(F.col("wsk"), F.lit(7.5), F.lit(-1.0)))
            === F.col("exact_cnt")).as("skip_ok"))
        .orderBy("event_type")
    }),

    // #4 ddsketch_quantile: sketch quantiles within tolerance of the
    // exact order statistics at the same ranks
    "q_sketch_quantile" -> ((s: SparkSession, dir: String) => {
      Graft.register(s)
      t(s, dir, "events").groupBy(F.col("event_type"))
        .agg(
          G.ddsketch_agg_values(F.col("value")).as("sk"),
          F.count(F.lit(1)).as("cnt"),
          F.sort_array(F.collect_list(F.col("value"))).as("sorted"))
        .select(F.col("event_type"), F.col("cnt"),
          ok(G.ddsketch_quantile(F.col("sk"), 0.5),
             rankValue(F.col("sorted"), F.col("cnt"), 0.5), RankTol).as("p50_ok"),
          ok(G.ddsketch_quantile(F.col("sk"), 0.95),
             rankValue(F.col("sorted"), F.col("cnt"), 0.95), RankTol).as("p95_ok"),
          ok(G.ddsketch_quantile(F.col("sk"), 0.99),
             rankValue(F.col("sorted"), F.col("cnt"), 0.99), RankTol).as("p99_ok"))
        .orderBy("event_type")
    }),

    // #5-#9 ddsketch_count/min/max/sum/avg scalars over grouped sketches
    "q_sketch_scalars" -> ((s: SparkSession, dir: String) => {
      Graft.register(s)
      t(s, dir, "events").groupBy(F.col("event_type"))
        .agg(
          G.ddsketch_agg_values(F.col("value")).as("sk"),
          F.count(F.lit(1)).as("cnt"),
          F.sum(F.col("value")).as("ex_sum"),
          F.min(F.col("value")).as("ex_min"),
          F.max(F.col("value")).as("ex_max"),
          F.avg(F.col("value")).as("ex_avg"))
        .select(F.col("event_type"),
          G.ddsketch_count(F.col("sk")).as("cnt"),
          ok(G.ddsketch_sum(F.col("sk")), F.col("ex_sum")).as("sum_ok"),
          ok(G.ddsketch_min(F.col("sk")), F.col("ex_min")).as("min_ok"),
          ok(G.ddsketch_max(F.col("sk")), F.col("ex_max")).as("max_ok"),
          ok(G.ddsketch_avg(F.col("sk")), F.col("ex_avg")).as("avg_ok"))
        .orderBy("event_type")
    }),

    // #10 ddsketch_stats: struct scalar over a stored sketch blob
    "q_sketch_stats" -> ((s: SparkSession, dir: String) => {
      Graft.register(s)
      t(s, dir, "events").groupBy(F.col("event_type"))
        .agg(G.ddsketch_agg_values(F.col("value")).as("sk"),
             F.count(F.lit(1)).as("exact_cnt"),
             F.avg(F.col("value")).as("ex_avg"))
        .select(F.col("event_type"), G.ddsketch_stats(F.col("sk")).as("st"),
                F.col("exact_cnt"), F.col("ex_avg"))
        .select(F.col("event_type"),
          F.col("st.count").as("cnt"),
          (F.col("st.count") === F.col("exact_cnt")).as("count_ok"),
          ok(F.col("st.avg"), F.col("ex_avg")).as("avg_ok"),
          (F.col("st.min") <= F.col("st.max")).as("minmax_ok"))
        .orderBy("event_type")
    }),

    // #11 ddsketch_agg: blob-merging aggregate — hourly→total rollup
    // (mirrors reference README.md:189-199 hourly/daily pattern)
    "q_sketch_agg_rollup" -> ((s: SparkSession, dir: String) => {
      Graft.register(s)
      val hourly = t(s, dir, "events")
        .groupBy(F.col("event_type"), F.date_trunc("hour", F.col("ts")).as("hour"))
        .agg(G.ddsketch_agg_values(F.col("value")).as("sk"))
      hourly.groupBy(F.col("event_type"))
        .agg(G.ddsketch_agg(F.col("sk")).as("merged"))
        .select(F.col("event_type"),
          G.ddsketch_count(F.col("merged")).as("cnt"))
        .orderBy("event_type")
    }),

    // persisted sketch-rollup VIEW with incremental maintenance
    // (SketchView): materialize even hours, append odd hours
    // (merge-on-read — appends never rewrite history), then read the
    // merged view. Counts are exact, and because sketch merge is
    // exact per-bin addition the incremental view is BYTE-IDENTICAL
    // to a from-scratch rebuild — the oracle replays the counts and
    // pins the byte-equality boolean.
    "q_sketch_view" -> ((s: SparkSession, dir: String) => {
      Graft.register(s)
      val ev = t(s, dir, "events")
      val evenHour = F.pmod(
        F.unix_millis(F.date_trunc("hour", F.col("ts"))) / 3600000L,
        F.lit(2)) === 0
      val path = System.getProperty("java.io.tmpdir") + "/graft_q_sketch_view"
      graft.sketch.SketchView.materialize(
        ev.filter(evenHour), "ts", Seq("event_type"), "value", path)
      graft.sketch.SketchView.append(
        ev.filter(!evenHour), "ts", Seq("event_type"), "value", path)
      val view = graft.sketch.SketchView.read(s, path, Seq("event_type"))
      val rebuilt = graft.sketch.SketchView
        .rollup(ev, "ts", Seq("event_type"), "value")
        .withColumnRenamed("sketch", "sk2")
      view.join(rebuilt, Seq("bucket_ms", "event_type"))
        .select(F.col("bucket_ms"), F.col("event_type"),
          G.ddsketch_count(F.col("sketch")).as("n"),
          (F.col("sketch") === F.col("sk2")).as("bytes_eq"))
        .orderBy("bucket_ms", "event_type")
    }),

    // STREAMING maintenance of the persisted view: replay the events
    // fixture as a multi-micro-batch stream (maxFilesPerTrigger=1)
    // through SketchView.streamAppend — each micro-batch lands under
    // its own __batch partition with dynamic overwrite (replay-safe) —
    // then read the merged view. Identical output contract to
    // q_sketch_view: exact counts, byte-equality vs a direct rollup.
    "q_stream_view" -> ((s: SparkSession, dir: String) => {
      Graft.register(s)
      val ev = t(s, dir, "events")
        .select(F.col("ts"), F.col("event_type"), F.col("value"))
      val tmp = System.getProperty("java.io.tmpdir") + "/graft_q_stream_view_src"
      ev.repartition(4).write.mode("overwrite").parquet(tmp)
      val path = System.getProperty("java.io.tmpdir") + "/graft_q_stream_view"
      val fs = org.apache.hadoop.fs.FileSystem.get(
        s.sparkContext.hadoopConfiguration)
      // a stale view or checkpoint would replay into mismatched batch
      // ids — both start fresh each run
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      fs.delete(new org.apache.hadoop.fs.Path(path + "_ck"), true)
      val q = graft.sketch.SketchView.streamAppend(
          s.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1").parquet(tmp),
          "ts", Seq("event_type"), "value", path)
        .option("checkpointLocation", path + "_ck")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val view = graft.sketch.SketchView.read(s, path, Seq("event_type"))
      val rebuilt = graft.sketch.SketchView
        .rollup(ev, "ts", Seq("event_type"), "value")
        .withColumnRenamed("sketch", "sk2")
      view.join(rebuilt, Seq("bucket_ms", "event_type"))
        .select(F.col("bucket_ms"), F.col("event_type"),
          G.ddsketch_count(F.col("sketch")).as("n"),
          (F.col("sketch") === F.col("sk2")).as("bytes_eq"))
        .orderBy("bucket_ms", "event_type")
    }),

    // regrain the OTHER mergeable families: hourly KMV/CMS/TopK
    // sketches per (hour, type) merged to days with the *_merge_agg
    // aggregates. Every emitted number is EXACT at this cardinality:
    // KMV is exact below k=1024 distinct (max 67/day here), CMS totals
    // are add-counts, and TopK with capacity >= distinct users is the
    // exact per-user counts — so DuckDB replays all three raw.
    "q_sketch_regrain" -> ((s: SparkSession, dir: String) => {
      val ev = t(s, dir, "events")
      val K = graft.sketch.kmv
      val C = graft.sketch.cms
      val T = graft.sketch.topk
      val hourly = ev
        .groupBy(F.date_trunc("hour", F.col("ts")).as("hour"), F.col("event_type"))
        .agg(K.kmv_agg(F.col("user_id")).as("ksk"),
          C.cms_agg(F.col("user_id"), 0.01, 0.99).as("csk"),
          T.topk_agg(F.col("user_id").cast("string"), 128).as("tsk"))
      hourly
        .groupBy(F.date_trunc("day", F.col("hour")).as("day"), F.col("event_type"))
        .agg(K.kmv_merge_agg(F.col("ksk")).as("ksk"),
          C.cms_merge_agg(F.col("csk")).as("csk"),
          T.topk_merge_agg(F.col("tsk")).as("tsk"))
        .select(F.unix_millis(F.col("day")).as("day_ms"), F.col("event_type"),
          K.kmv_distinct(F.col("ksk")).cast("long").as("uniques"),
          C.cms_total(F.col("csk")).as("total"),
          F.element_at(T.topk_items(F.col("tsk"), 1), 1)
            .getField("count").as("top1"))
        .orderBy("day_ms", "event_type")
    }),

    // the FULL view lifecycle under the gate: materialize half,
    // append half, COMPACT (one row per group), BACKFILL a middle-day
    // partition from the source of truth, then read the whole range
    // through readRange (partition-pruned path). Every step preserves
    // the exact merge, so the final view still matches the one-shot
    // rebuild byte-for-byte — shares q_sketch_view's oracle.
    "q_sketch_view_lifecycle" -> ((s: SparkSession, dir: String) => {
      Graft.register(s)
      val SV = graft.sketch.SketchView
      val ev = t(s, dir, "events")
      val evenHour = F.pmod(
        F.unix_millis(F.date_trunc("hour", F.col("ts"))) / 3600000L,
        F.lit(2)) === 0
      val path = System.getProperty("java.io.tmpdir") + "/graft_q_skview_lc"
      SV.materialize(ev.filter(evenHour), "ts", Seq("event_type"), "value", path)
      SV.append(ev.filter(!evenHour), "ts", Seq("event_type"), "value", path)
      SV.compact(s, path, Seq("event_type"))
      // backfill the second observed day from the source of truth
      val span = SV.DefaultPartSpanMs
      val (lo, hi) = {
        val r = ev.agg(F.min(F.unix_millis(F.date_trunc("hour", F.col("ts")))),
          F.max(F.unix_millis(F.date_trunc("hour", F.col("ts"))))).collect()(0)
        (r.getLong(0), r.getLong(1))
      }
      val bfFrom = (lo - java.lang.Math.floorMod(lo, span)) + span
      SV.backfill(ev, "ts", Seq("event_type"), "value", path,
        bfFrom, bfFrom + span)
      // retention: drop day one entirely; the view now starts at the
      // backfilled day and must still match the rebuild there
      SV.expire(s, path, keepFromMs = bfFrom)
      val view = SV.readRange(s, path, Seq("event_type"), bfFrom, hi + 1L)
      val rebuilt = SV.rollup(ev, "ts", Seq("event_type"), "value")
        .filter(F.col("bucket_ms") >= bfFrom)
        .withColumnRenamed("sketch", "sk2")
      view.join(rebuilt, Seq("bucket_ms", "event_type"))
        .select(F.col("bucket_ms"), F.col("event_type"),
          G.ddsketch_count(F.col("sketch")).as("n"),
          (F.col("sketch") === F.col("sk2")).as("bytes_eq"))
        .orderBy("bucket_ms", "event_type")
    }),

    // seasonal residuals from the view: each hourly bucket vs the same
    // hour one day earlier — exact counts through the merge, ratio =
    // one IEEE division of exact longs, so full rows replay raw
    "q_view_seasonal" -> ((s: SparkSession, dir: String) => {
      Graft.register(s)
      val SV = graft.sketch.SketchView
      val ev = t(s, dir, "events")
      val path = System.getProperty("java.io.tmpdir") + "/graft_q_view_seas"
      SV.materialize(ev, "ts", Seq("event_type"), "value", path)
      graft.sketch.SketchOps.seasonalResiduals(
          s, path, Seq("event_type"), periodMs = 86400000L)
        .orderBy("bucket_ms", "event_type")
    }),

    // EXACT moments view family: (n, Σx, Σx²) struct rows, merged
    // across an incremental materialize+append split. Values are
    // LONGS (user_id), so every sum is an integer-valued double —
    // exact below 2^53 through any merge schedule — and mean/variance
    // are deterministic IEEE expressions both engines replay verbatim
    "q_moments_view" -> ((s: SparkSession, dir: String) => {
      val SV = graft.sketch.SketchView
      val fam = SV.ViewFamily.moments()
      val ev = t(s, dir, "events")
        .filter(F.col("ts").isNotNull)
        .select(F.col("ts"), F.col("event_type"), F.col("user_id"))
      val path = System.getProperty("java.io.tmpdir") + "/graft_q_moments_view"
      SV.materialize(ev.filter(F.col("user_id") % 2 === 0),
        "ts", Seq("event_type"), "user_id", path, family = fam)
      SV.append(ev.filter(!(F.col("user_id") % 2 === 0)),
        "ts", Seq("event_type"), "user_id", path, family = fam)
      val view = SV.read(s, path, Seq("event_type"), fam)
      view.select(F.col("bucket_ms"), F.col("event_type"),
          F.col("sketch.n").as("n"),
          F.col("sketch.s").cast("long").as("sum_v"),
          graft.sketch.SketchOps.momentsMean(F.col("sketch")).as("mean"),
          graft.sketch.SketchOps.momentsVariance(F.col("sketch")).as("variance"))
        .orderBy("bucket_ms", "event_type")
    }),

    // budget-exhaustion forecast from the view: the whole range is
    // 25% of a synthetic SLO period, recent = trailing 2 days. Window
    // counts replay exactly; consumed/burn are CDF-bracketed like
    // q_slo_burn; the forecast timestamp is pinned CONSISTENT with
    // the emitted components under the frozen formula
    "q_slo_forecast" -> ((s: SparkSession, dir: String) => {
      Graft.register(s)
      val SV = graft.sketch.SketchView
      val ev = t(s, dir, "events")
      val path = System.getProperty("java.io.tmpdir") + "/graft_q_slo_fc"
      SV.materialize(ev, "ts", Seq("event_type"), "value", path)
      val hourMs = F.unix_millis(F.date_trunc("hour", F.col("ts")))
      val (lo, hi) = {
        val r = ev.agg(F.min(hourMs), F.max(hourMs)).collect()(0)
        (r.getLong(0), r.getLong(1))
      }
      val until = hi + 3600000L
      val periodMs = (until - lo) * 4L
      val recentMs = 2L * 86400000L
      val (objective, budget) = (100.0, 0.25)
      val elapsedFrac = (until - lo).toDouble / periodMs.toDouble
      val fc = graft.sketch.Slo.exhaustionForecast(
        s, path, Seq("event_type"), objective, budget,
        lo, until, periodMs, recentMs)
      def exactFracs(fromMs: Long, tag: String) = ev
        .filter(hourMs >= fromMs && hourMs < until)
        .groupBy(F.col("event_type"))
        .agg(
          (F.sum(F.when(F.col("value") <= objective * 0.965, 1L).otherwise(0L))
            .cast("double") / F.count(F.lit(1))).as(s"__lo_$tag"),
          (F.sum(F.when(F.col("value") <= objective * 1.035, 1L).otherwise(0L))
            .cast("double") / F.count(F.lit(1))).as(s"__hi_$tag"))
      val expectExhaust =
        F.when(F.col("consumed_frac") >= 1.0, F.lit(until))
          .when(F.col("burn_recent") > 0.0,
            (F.lit(until.toDouble) + (F.lit(1.0) - F.col("consumed_frac")) *
              periodMs.toDouble / F.col("burn_recent")).cast("long"))
          .otherwise(F.lit(null).cast("long"))
      fc.join(exactFracs(lo, "p"), "event_type")
        .join(exactFracs(until - recentMs, "r"), "event_type")
        .select(F.col("event_type"), F.col("n_period"), F.col("n_recent"),
          (F.col("consumed_frac") >=
             (F.lit(1.0) - F.col("__hi_p") - 1e-9) / budget * elapsedFrac &&
           F.col("consumed_frac") <=
             (F.lit(1.0) - F.col("__lo_p") + 1e-9) / budget * elapsedFrac)
            .as("consumed_ok"),
          (F.col("burn_recent") >= (F.lit(1.0) - F.col("__hi_r") - 1e-9) / budget &&
           F.col("burn_recent") <= (F.lit(1.0) - F.col("__lo_r") + 1e-9) / budget)
            .as("burn_recent_ok"),
          (F.col("exhaust_at_ms") <=> expectExhaust).as("exhaust_ok"))
        .orderBy("event_type")
    }),

    // HLL view family: Spark's built-in Datasketches HLL through the
    // incremental materialize+append lifecycle — exact counts replay
    // in DuckDB; estimates are pinned within the 2% band (the
    // q_hll_distinct tolerance), never byte-compared (HLL unions are
    // not byte-canonical, unlike the exact families)
    "q_hll_view" -> ((s: SparkSession, dir: String) => {
      val SV = graft.sketch.SketchView
      val fam = SV.ViewFamily.hllDistinct()
      val ev = t(s, dir, "events")
        .filter(F.col("ts").isNotNull && F.col("user_id").isNotNull)
      val path = System.getProperty("java.io.tmpdir") + "/graft_q_hll_view"
      SV.materialize(ev.filter(F.col("event_id") % 2 === 0),
        "ts", Seq("event_type"), "user_id", path, family = fam)
      SV.append(ev.filter(F.col("event_id") % 2 =!= 0),
        "ts", Seq("event_type"), "user_id", path, family = fam)
      val view = SV.read(s, path, Seq("event_type"), fam)
      val exact = ev
        .groupBy(F.unix_millis(F.date_trunc("hour", F.col("ts"))).as("bucket_ms"),
          F.col("event_type"))
        .agg(F.count_distinct(F.col("user_id")).as("exact_users"))
      view.join(exact, Seq("bucket_ms", "event_type"))
        .select(F.col("bucket_ms"), F.col("event_type"), F.col("exact_users"),
          (F.abs(F.hll_sketch_estimate(F.col("sketch")) - F.col("exact_users")) <=
            F.greatest(F.lit(2.0), F.col("exact_users") * 0.02)).as("est_ok"))
        .orderBy("bucket_ms", "event_type")
    }),

    // returning-uniques overlap from the persisted KMV view: day-1 vs
    // day-2 per type by inclusion-exclusion over stored sketches —
    // EXACT below k distinct per window (the KMV rule), so DuckDB
    // replays the distinct-set arithmetic raw
    "q_kmv_retention" -> ((s: SparkSession, dir: String) => {
      val SV = graft.sketch.SketchView
      val ev = t(s, dir, "events")
      val fam = SV.ViewFamily.kmvDistinct()
      val path = System.getProperty("java.io.tmpdir") + "/graft_q_kmv_ov"
      SV.materialize(ev, "ts", Seq("event_type"), "user_id", path, family = fam)
      val span = SV.DefaultPartSpanMs
      val f0 = {
        val lo = ev.agg(F.min(F.unix_millis(F.date_trunc("hour", F.col("ts")))))
          .collect()(0).getLong(0)
        lo - java.lang.Math.floorMod(lo, span)
      }
      graft.sketch.SketchOps.kmvWindowOverlap(s, path, Seq("event_type"),
          f0, f0 + span, f0 + span, f0 + 2 * span)
        .orderBy("event_type")
    }),

    // trending heavy hitters from the persisted TopK view: day-2 vs
    // day-1 per-user deltas per event type, from stored sketches only.
    // Counts are EXACT at this cardinality (capacity 256 >= distinct
    // users per merged window — the q_sketch_regrain argument), so
    // DuckDB replays the full-outer count join raw
    "q_topk_trending" -> ((s: SparkSession, dir: String) => {
      val SV = graft.sketch.SketchView
      val ev = t(s, dir, "events")
        .filter(F.col("ts").isNotNull && F.col("user_id").isNotNull)
        .select(F.col("ts"), F.col("event_type"),
          F.col("user_id").cast("string").as("item"))
      val fam = SV.ViewFamily.topkItems(capacity = 256)
      val path = System.getProperty("java.io.tmpdir") + "/graft_q_topk_trend"
      SV.materialize(ev, "ts", Seq("event_type"), "item", path, family = fam)
      val span = SV.DefaultPartSpanMs
      val f0 = {
        val lo = ev.agg(F.min(F.unix_millis(F.date_trunc("hour", F.col("ts")))))
          .collect()(0).getLong(0)
        lo - java.lang.Math.floorMod(lo, span)
      }
      graft.sketch.SketchOps.trendingItems(s, path, Seq("event_type"),
          f0, f0 + span, f0 + span, f0 + 2 * span, capacity = 256)
        .orderBy("event_type", "item")
    }),

    // SLO multiwindow burn-rate alert evaluated from the persisted
    // view (no event rescan): short window = trailing 2 days, long =
    // the whole range. Exact counts replay in DuckDB; burn rates are
    // bracketed by the exact CDF at the objective's ±3.5% value blur
    // (the q_sketch_cdf argument), pinned as booleans.
    "q_slo_burn" -> ((s: SparkSession, dir: String) => {
      Graft.register(s)
      val SV = graft.sketch.SketchView
      val ev = t(s, dir, "events")
      val path = System.getProperty("java.io.tmpdir") + "/graft_q_slo"
      SV.materialize(ev, "ts", Seq("event_type"), "value", path)
      val hourMs = F.unix_millis(F.date_trunc("hour", F.col("ts")))
      val (lo, hi) = {
        val r = ev.agg(F.min(hourMs), F.max(hourMs)).collect()(0)
        (r.getLong(0), r.getLong(1))
      }
      val until = hi + 3600000L
      val shortMs = 2L * 86400000L
      val (objective, budget) = (100.0, 0.25)
      val burn = graft.sketch.Slo.multiWindowBurn(
        s, path, Seq("event_type"), objective, budget,
        until, shortMs, until - lo)
      def exactFracs(fromMs: Long, tag: String) = ev
        .filter(hourMs >= fromMs && hourMs < until)
        .groupBy(F.col("event_type"))
        .agg(
          (F.sum(F.when(F.col("value") <= objective * 0.965, 1L).otherwise(0L))
            .cast("double") / F.count(F.lit(1))).as(s"__lo_$tag"),
          (F.sum(F.when(F.col("value") <= objective * 1.035, 1L).otherwise(0L))
            .cast("double") / F.count(F.lit(1))).as(s"__hi_$tag"))
      def ok(b: Column, loF: Column, hiF: Column): Column =
        b >= (F.lit(1.0) - hiF - 1e-9) / budget &&
        b <= (F.lit(1.0) - loF + 1e-9) / budget
      burn
        .join(exactFracs(until - shortMs, "s"), "event_type")
        .join(exactFracs(lo, "l"), "event_type")
        .select(F.col("event_type"), F.col("n_short"), F.col("n_long"),
          ok(F.col("burn_short"), F.col("__lo_s"), F.col("__hi_s"))
            .as("burn_short_ok"),
          ok(F.col("burn_long"), F.col("__lo_l"), F.col("__hi_l"))
            .as("burn_long_ok"))
        .orderBy("event_type")
    }),

    // the KMV family through the SAME view lifecycle: hourly distinct-
    // user sketches materialized/appended/merged-on-read — estimates
    // are EXACT below k=1024 distinct (max 67 here), so DuckDB
    // replays the uniques as plain BIGINTs
    "q_kmv_view" -> ((s: SparkSession, dir: String) => {
      val SV = graft.sketch.SketchView
      val fam = SV.ViewFamily.kmvDistinct()
      val ev = t(s, dir, "events")
      val path = System.getProperty("java.io.tmpdir") + "/graft_q_kmv_view"
      SV.materialize(ev.filter(F.col("event_id") % 2 === 0),
        "ts", Seq("event_type"), "user_id", path, family = fam)
      SV.append(ev.filter(F.col("event_id") % 2 =!= 0),
        "ts", Seq("event_type"), "user_id", path, family = fam)
      SV.read(s, path, Seq("event_type"), fam)
        .select(F.col("bucket_ms"), F.col("event_type"),
          graft.sketch.kmv.kmv_distinct(F.col("sketch")).cast("long")
            .as("uniques"))
        .orderBy("bucket_ms", "event_type")
    }),

    // Bloom family through the view: per-hour membership filters over
    // user ids, merged on read (bitwise OR) to the per-type corpus
    // filter — NO FALSE NEGATIVES is exact, so probing every id that
    // went in pins true; counts replay raw
    "q_bloom_view" -> ((s: SparkSession, dir: String) => {
      val SV = graft.sketch.SketchView
      val fam = SV.ViewFamily.bloomMembership(expectedItems = 10000L)
      val ev = t(s, dir, "events")
      val path = System.getProperty("java.io.tmpdir") + "/graft_q_bloom_view"
      SV.materialize(ev.filter(F.col("event_id") % 2 === 0),
        "ts", Seq("event_type"), "user_id", path, family = fam)
      SV.append(ev.filter(F.col("event_id") % 2 =!= 0),
        "ts", Seq("event_type"), "user_id", path, family = fam)
      val perType = SV.read(s, path, Seq("event_type"), fam)
        .groupBy("event_type")
        .agg(graft.sketch.bloom.bloom_merge_agg(F.col("sketch")).as("bf"))
      ev.select(F.col("event_type"), F.col("user_id")).distinct()
        .join(perType, "event_type")
        .groupBy(F.col("event_type"))
        .agg(F.count(F.lit(1)).as("n_members"),
          (F.sum(F.when(graft.sketch.bloom.bloom_contains(
              F.col("bf"), F.col("user_id")), 1L).otherwise(0L)) ===
            F.count(F.lit(1))).as("no_false_negatives"))
        .orderBy("event_type")
    }),

    // CMS family through the view: per-hour frequency sketches merged
    // on read, then per type — totals are exact add-counts and the
    // Count-Min estimate NEVER undercounts (one-sided error), both
    // exact cross-engine properties
    "q_cms_view" -> ((s: SparkSession, dir: String) => {
      val SV = graft.sketch.SketchView
      val fam = SV.ViewFamily.cmsFrequency(eps = 0.01)
      val ev = t(s, dir, "events")
      val path = System.getProperty("java.io.tmpdir") + "/graft_q_cms_view"
      SV.materialize(ev.filter(F.col("event_id") % 2 === 0),
        "ts", Seq("event_type"), "user_id", path, family = fam)
      SV.append(ev.filter(F.col("event_id") % 2 =!= 0),
        "ts", Seq("event_type"), "user_id", path, family = fam)
      val perType = SV.read(s, path, Seq("event_type"), fam)
        .groupBy("event_type")
        .agg(graft.sketch.cms.cms_merge_agg(F.col("sketch")).as("cs"))
      // the view drops NULL-ts rows — the truth side must match
      val truth = ev.filter(F.col("ts").isNotNull)
        .groupBy(F.col("event_type"), F.col("user_id"))
        .agg(F.count(F.lit(1)).as("__true"))
      truth.join(perType, "event_type")
        .groupBy(F.col("event_type"))
        .agg(F.sum(F.col("__true")).as("total"),
          (F.sum(F.when(graft.sketch.cms.cms_estimate(
              F.col("cs"), F.col("user_id")) >= F.col("__true"), 1L)
            .otherwise(0L)) === F.count(F.lit(1))).as("no_undercount"))
        .join(perType.select(F.col("event_type"),
          graft.sketch.cms.cms_total(F.col("cs")).as("cms_total")), "event_type")
        .select(F.col("event_type"), F.col("total"),
          (F.col("cms_total") === F.col("total")).as("total_exact"),
          F.col("no_undercount"))
        .orderBy("event_type")
    }),

    // TopK family through the view: per-hour heavy-hitter sketches
    // merged on read, then merged per type — capacity 128 covers the
    // <=150 distinct users, so the top-1 count is the exact max
    "q_topk_view" -> ((s: SparkSession, dir: String) => {
      val SV = graft.sketch.SketchView
      val fam = SV.ViewFamily.topkItems(capacity = 256)
      val ev = t(s, dir, "events")
        .withColumn("uid", F.col("user_id").cast("string"))
      val path = System.getProperty("java.io.tmpdir") + "/graft_q_topk_view"
      SV.materialize(ev.filter(F.col("event_id") % 2 === 0),
        "ts", Seq("event_type"), "uid", path, family = fam)
      SV.append(ev.filter(F.col("event_id") % 2 =!= 0),
        "ts", Seq("event_type"), "uid", path, family = fam)
      SV.read(s, path, Seq("event_type"), fam)
        .groupBy("event_type")
        .agg(graft.sketch.topk.topk_merge_agg(F.col("sketch")).as("tk"))
        .select(F.col("event_type"),
          F.element_at(graft.sketch.topk.topk_items(F.col("tk"), 1), 1)
            .getField("count").as("top1"))
        .orderBy("event_type")
    }),

    // #12 ddsketch_stats_agg: 12-field struct from merged blobs
    "q_sketch_stats_agg" -> ((s: SparkSession, dir: String) => {
      Graft.register(s)
      val perUser = t(s, dir, "events")
        .groupBy(F.col("event_type"), (F.col("user_id") % 16).as("shard"))
        .agg(G.ddsketch_agg_values(F.col("value")).as("sk"))
      val exact = t(s, dir, "events").groupBy(F.col("event_type"))
        .agg(F.count(F.lit(1)).as("exact_cnt"),
             F.sort_array(F.collect_list(F.col("value"))).as("sorted"))
      perUser.groupBy(F.col("event_type"))
        .agg(G.ddsketch_stats_agg(F.col("sk")).as("st"))
        .join(exact, "event_type")
        .select(F.col("event_type"),
          F.col("st.count").as("cnt"),
          (F.col("st.count") === F.col("exact_cnt")).as("count_ok"),
          ok(F.col("st.p50"),
             rankValue(F.col("sorted"), F.col("exact_cnt"), 0.5), RankTol).as("p50_ok"),
          ok(F.col("st.p95"),
             rankValue(F.col("sorted"), F.col("exact_cnt"), 0.95), RankTol).as("p95_ok"),
          (F.octet_length(F.col("st.sketch")) > 0).as("sketch_ok"))
        .orderBy("event_type")
    }),

    // ddsketch_cdf (inverse quantile — SLO compliance): sketch fraction
    // at fixed thresholds bracketed by the exact fractions at +-3.5%
    "q_sketch_cdf" -> ((s: SparkSession, dir: String) => {
      Graft.register(s)
      def fracLe(x: Double): Column =
        F.sum(F.when(F.col("value") <= x, 1L).otherwise(0L)).cast("double") /
          F.count(F.lit(1)).cast("double")
      val thresholds = Seq(10.0, 50.0, 200.0)
      val aggCols = F.count(F.lit(1)).as("cnt") +:
        (G.ddsketch_agg_values(F.col("value")).as("sk") +:
          thresholds.flatMap(x => Seq(
            fracLe(x * 0.965).as(s"lo${x.toInt}"),
            fracLe(x * 1.035).as(s"hi${x.toInt}"))))
      t(s, dir, "events").groupBy(F.col("event_type"))
        .agg(aggCols.head, aggCols.tail: _*)
        .select(F.col("event_type") +: F.col("cnt") +:
          thresholds.map { x =>
            val c = G.ddsketch_cdf(F.col("sk"), x)
            (c >= F.col(s"lo${x.toInt}") - 1e-9 &&
             c <= F.col(s"hi${x.toInt}") + 1e-9).as(s"cdf${x.toInt}_ok")
          }: _*)
        .orderBy("event_type")
    }),

    // NULL discipline: every failure mode yields NULL, never an error
    // equi-width histogram decoded from per-group sketches, checked
    // against exact bucket counts with a blur-band tolerance: a stored
    // value's decoded position moves by at most ~γ(1+α) ≈ 3%, so a
    // bucket's error is bounded by the exact mass within ±4% of its
    // edges — both sides computed in Spark, the oracle pins the grid
    "q_sketch_histogram" -> ((s: SparkSession, dir: String) => {
      val ev = t(s, dir, "events")
      val sk = ev.groupBy(F.col("event_type"))
        .agg(G.ddsketch_agg_values(F.col("value")).as("sk"))
      val hist = sk.select(F.col("event_type"),
        F.posexplode(G.ddsketch_histogram(F.col("sk"), 0.0, 100.0, 10))
          .as(Seq("bucket", "approx")))
      val exact = ev.filter(F.col("value") >= 0.0 && F.col("value") < 100.0)
        .groupBy(F.col("event_type"),
          F.floor(F.col("value") / 10.0).cast("int").as("bucket"))
        .agg(F.count(F.lit(1)).cast("double").as("exact_n"))
      // each value sits in at most one ±4% edge band (bands are ~0.8
      // wide vs 10-wide buckets); it blurs the buckets on both sides
      val edge = F.round(F.col("value") / 10.0, 0).cast("int")
      val inBand = F.col("value") >= edge * 10.0 * 0.96 &&
        F.col("value") < edge * 10.0 * 1.04 && edge > 0
      val blur = ev.filter(inBand)
        .select(F.col("event_type"),
          F.explode(F.array(edge - 1, edge)).as("bucket"))
        .filter(F.col("bucket").between(0, 9))
        .groupBy(F.col("event_type"), F.col("bucket"))
        .agg(F.count(F.lit(1)).cast("double").as("blur_n"))
      hist
        .join(exact, Seq("event_type", "bucket"), "left")
        .join(blur, Seq("event_type", "bucket"), "left")
        .select(F.col("event_type"), F.col("bucket").cast("long").as("bucket"),
          (F.abs(F.col("approx") - F.coalesce(F.col("exact_n"), F.lit(0.0)))
            <= F.coalesce(F.col("blur_n"), F.lit(0.0)) + 1e-6).as("within_tol"))
        .orderBy("event_type", "bucket")
    }),

    // sketch-driven curation: trim each group to its [p05, p95] sketch
    // quantiles, then check the kept count against the exact-rank band
    // (sketch quantiles sit within RankTol of the order statistics, so
    // the kept count must lie between the tight and loose exact cuts)
    "q_trim_outliers" -> ((s: SparkSession, dir: String) => {
      Graft.register(s)
      val ev = t(s, dir, "events")
      val kept = graft.sketch.SketchOps
        .trimOutliers(ev, Seq("event_type"), "value", 0.05, 0.95)
        .groupBy(F.col("event_type"))
        .agg(F.count(F.lit(1)).as("kept"))
      val bands = ev.groupBy(F.col("event_type"))
        .agg(F.count(F.lit(1)).as("cnt"),
             F.sort_array(F.collect_list(F.col("value"))).as("sorted"))
        .select(F.col("event_type"), F.col("cnt"),
          rankValue(F.col("sorted"), F.col("cnt"), 0.05).as("lo"),
          rankValue(F.col("sorted"), F.col("cnt"), 0.95).as("hi"),
          F.col("sorted"))
        .select(F.col("event_type"), F.col("cnt"),
          F.size(F.filter(F.col("sorted"),
            v => v >= F.col("lo") * 1.04 && v <= F.col("hi") * 0.96))
            .cast("long").as("tight"),
          F.size(F.filter(F.col("sorted"),
            v => v >= F.col("lo") * 0.96 && v <= F.col("hi") * 1.04))
            .cast("long").as("loose"))
      bands.join(kept, "event_type")
        .select(F.col("event_type"), F.col("cnt"),
          (F.col("kept") >= F.col("tight") && F.col("kept") <= F.col("loose"))
            .as("kept_in_band"))
        .orderBy("event_type")
    }),

    // bloom-pruned join (runtime-filter shape): pruning lineitem by a
    // bloom of the small side's keys then joining must equal the plain
    // join exactly (no false negatives); booleans pin soundness and
    // that the filter actually pruned
    "q_bloom_prune" -> ((s: SparkSession, dir: String) => {
      val small = t(s, dir, "orders").filter(F.col("o_orderkey") % 97 === 0)
        .select(F.col("o_orderkey"))
      val big = t(s, dir, "lineitem").select(F.col("l_orderkey"))
      val pruned = graft.sketch.SketchOps
        .bloomPrune(big, "l_orderkey", small, "o_orderkey", 100000L, 0.01)
      val joined = pruned
        .join(F.broadcast(small), F.col("l_orderkey") === F.col("o_orderkey"))
        .agg(F.count(F.lit(1)).as("matches"), F.sum(F.col("l_orderkey")).as("key_sum"))
      val semiN = big.join(F.broadcast(small),
          F.col("l_orderkey") === F.col("o_orderkey"), "left_semi")
        .agg(F.count(F.lit(1)).as("__sn"))
      val counts = pruned.agg(F.count(F.lit(1)).as("__pn"))
        .crossJoin(F.broadcast(big.agg(F.count(F.lit(1)).as("__bn"))))
        .crossJoin(F.broadcast(semiN))
      joined.crossJoin(F.broadcast(counts))
        .select(F.col("matches"), F.col("key_sum"),
          (F.col("__pn") >= F.col("__sn")).as("prune_sound"),
          (F.col("__pn") * 2 < F.col("__bn")).as("prune_effective"))
    }),

    // source/sink format surface: the same rows written+read through
    // CSV and JSON must reproduce the parquet aggregates (longs exact;
    // double sums within accumulation-order noise, checked at 1e-9)
    "q_format_roundtrip" -> ((s: SparkSession, dir: String) => {
      val ev = t(s, dir, "events").select(
        F.unix_millis(F.col("ts")).as("ms"), F.col("event_type"),
        F.col("user_id"), F.col("value"))
      val base = java.nio.file.Files.createTempDirectory("graft_fmt").toString
      ev.write.mode("overwrite").option("header", "true").csv(s"$base/csv")
      ev.write.mode("overwrite").json(s"$base/json")
      ev.write.mode("overwrite").orc(s"$base/orc")
      val csv = s.read.option("header", "true").schema(ev.schema).csv(s"$base/csv")
      val json = s.read.schema(ev.schema).json(s"$base/json")
      val orc = s.read.schema(ev.schema).orc(s"$base/orc")
      def aggs(df: DataFrame, tag: String) = df.agg(
        F.count(F.lit(1)).as(s"n_$tag"),
        F.sum(F.col("ms")).as(s"ms_$tag"),
        F.sum(F.col("user_id")).as(s"uid_$tag"),
        F.sum(F.col("value")).as(s"v_$tag"))
      def tol(a: Column, b: Column): Column =
        F.abs(a - b) <= F.lit(1e-9) * F.abs(b)
      aggs(ev, "p").crossJoin(aggs(csv, "c")).crossJoin(aggs(json, "j"))
        .crossJoin(aggs(orc, "o"))
        .select(F.col("n_p").as("rows"),
          (F.col("n_c") === F.col("n_p")).as("csv_rows_ok"),
          (F.col("n_j") === F.col("n_p")).as("json_rows_ok"),
          (F.col("n_o") === F.col("n_p")).as("orc_rows_ok"),
          (F.col("ms_c") === F.col("ms_p") && F.col("uid_c") === F.col("uid_p"))
            .as("csv_longs_ok"),
          (F.col("ms_j") === F.col("ms_p") && F.col("uid_j") === F.col("uid_p"))
            .as("json_longs_ok"),
          (F.col("ms_o") === F.col("ms_p") && F.col("uid_o") === F.col("uid_p"))
            .as("orc_longs_ok"),
          (tol(F.col("v_c"), F.col("v_p")) && tol(F.col("v_j"), F.col("v_p")) &&
            tol(F.col("v_o"), F.col("v_p")))
            .as("doubles_ok"))
    }),

    // parquet compaction: fragment events into 64 small files, compact
    // to ~1 MiB targets, and prove content identical + file count
    // collapsed (aggregates exact; layout facts as booleans)
    "q_compact" -> ((s: SparkSession, dir: String) => {
      val c = graft.sources.Compaction
      val ev = t(s, dir, "events").select(
        F.unix_millis(F.col("ts")).as("ms"), F.col("event_type"),
        F.col("user_id"), F.col("value"))
      val path = java.nio.file.Files.createTempDirectory("graft_compact")
        .toString + "/events"
      c.writeFragmented(ev, path, 64)
      val before = c.partFileCount(s, path)
      val after = c.compact(s, path, 1L << 20)
      val back = s.read.parquet(path)
      back.agg(
          F.count(F.lit(1)).as("n"),
          F.sum(F.col("ms")).as("ms_sum"),
          F.sum(F.col("user_id")).as("uid_sum"))
        .select(F.col("n"), F.col("ms_sum"), F.col("uid_sum"),
          F.lit(before == 64).as("fragmented_ok"),
          F.lit(after < 64).as("compacted_ok"))
    }),

    // one-scan dataset profile: exact rows/nulls per column + KMV
    // distinct estimate within 5% of the exact count (k=8192 → ~1.1%
    // expected error)
    "q_profile" -> ((s: SparkSession, dir: String) => {
      val cols = Seq("event_type", "user_id", "value")
      val ev = t(s, dir, "events")
      val prof = graft.pipeline.Profile.profileColumns(ev, cols, kmvK = 8192)
      val exact = cols.map(c => ev.agg(
          F.countDistinct(F.col(c)).as("__d")).select(
          F.lit(c).as("column"), F.col("__d")))
        .reduce(_ union _)
      prof.join(F.broadcast(exact), "column")
        .select(F.col("column"), F.col("n_rows"), F.col("n_nulls"),
          (F.abs(F.col("distinct_est") - F.col("__d")) <=
            F.lit(0.05) * F.col("__d")).as("distinct_ok"))
        .orderBy("column")
    }),

    // shuffle-key skew profile over orders.o_custkey: exact counts +
    // sketch quantiles of the per-key count distribution as
    // rank-tolerance booleans (sketch floats never hash-match)
    "q_keyskew" -> ((s: SparkSession, dir: String) => {
      Graft.register(s)
      val orders = t(s, dir, "orders")
      val prof = graft.sketch.SketchOps.keyCountProfile(orders, Seq("o_custkey"))
      val exact = orders.groupBy(F.col("o_custkey"))
        .agg(F.count(F.lit(1)).as("__n"))
        .agg(F.sort_array(F.collect_list(F.col("__n").cast("double"))).as("__sorted"),
             F.count(F.lit(1)).as("__nk"))
      def ok(p: Column, q: Double): Column =
        F.abs(p - rankValue(F.col("__sorted"), F.col("__nk"), q)) <=
          F.lit(RankTol) * F.abs(rankValue(F.col("__sorted"), F.col("__nk"), q))
      prof.crossJoin(F.broadcast(exact))
        .select(F.col("n_keys"), F.col("n_rows"), F.col("max_count"),
          F.col("mean_count"), F.col("skew_ratio"),
          ok(F.col("p50"), 0.5).as("p50_ok"), ok(F.col("p90"), 0.9).as("p90_ok"),
          ok(F.col("p99"), 0.99).as("p99_ok"), ok(F.col("p999"), 0.999).as("p999_ok"))
    }),

    // robust location/scale per group: sketch median + MAD vs the
    // exact order statistics (MAD slack includes the median's own
    // tolerance, since deviations are measured from the sketch median)
    "q_robust_stats" -> ((s: SparkSession, dir: String) => {
      Graft.register(s)
      val ev = t(s, dir, "events")
      val stats = graft.sketch.SketchOps.robustStats(ev, Seq("event_type"), "value")
      val exactMed = ev.groupBy(F.col("event_type"))
        .agg(F.sort_array(F.collect_list(F.col("value"))).as("__sv"),
             F.count(F.lit(1)).as("__cnt"))
        .select(F.col("event_type"), F.col("__cnt"),
          rankValue(F.col("__sv"), F.col("__cnt"), 0.5).as("__me"))
      val exactMad = ev.join(F.broadcast(exactMed), "event_type")
        .select(F.col("event_type"), F.abs(F.col("value") - F.col("__me")).as("__d"))
        .groupBy(F.col("event_type"))
        .agg(F.sort_array(F.collect_list(F.col("__d"))).as("__sd"),
             F.count(F.lit(1)).as("__c2"))
        .select(F.col("event_type"),
          rankValue(F.col("__sd"), F.col("__c2"), 0.5).as("__de"))
      stats.join(exactMed, "event_type").join(exactMad, "event_type")
        .select(F.col("event_type"), F.col("__cnt").as("cnt"),
          (F.abs(F.col("median") - F.col("__me")) <=
            F.lit(RankTol) * F.abs(F.col("__me"))).as("med_ok"),
          (F.abs(F.col("mad") - F.col("__de")) <=
            F.lit(RankTol) * F.col("__de") + F.lit(RankTol) * F.abs(F.col("__me")))
            .as("mad_ok"))
        .orderBy("event_type")
    }),

    "q_sketch_nulls" -> ((s: SparkSession, _: String) => {
      Graft.register(s)
      val nullBlob = F.lit(null).cast("binary")
      val garbage = F.lit(Array[Byte](0x13, 0x37, 0x7F)).cast("binary")
      s.range(1).select(
        G.ddsketch_count(nullBlob).isNull.as("null_count_ok"),
        G.ddsketch_quantile(nullBlob, 0.5).isNull.as("null_quantile_ok"),
        G.ddsketch_add(nullBlob, F.lit(1.0)).isNull.as("null_add_ok"),
        G.ddsketch_count(garbage).isNull.as("garbage_count_ok"),
        G.ddsketch_merge(G.ddsketch_create(), nullBlob).isNull.as("null_merge_ok"),
        G.ddsketch_stats(garbage).isNull.as("garbage_stats_ok"))
    }),

    // lineitem-scale sketch: higher cardinality + key skew
    "q_sketch_lineitem" -> ((s: SparkSession, dir: String) => {
      Graft.register(s)
      t(s, dir, "lineitem").groupBy(F.col("l_returnflag"), F.col("l_linestatus"))
        .agg(
          G.ddsketch_agg_values(F.col("l_extendedprice")).as("sk"),
          F.count(F.lit(1)).as("cnt"),
          F.sort_array(F.collect_list(F.col("l_extendedprice"))).as("sorted"))
        .select(F.col("l_returnflag"), F.col("l_linestatus"), F.col("cnt"),
          ok(G.ddsketch_quantile(F.col("sk"), 0.5),
             rankValue(F.col("sorted"), F.col("cnt"), 0.5), RankTol).as("p50_ok"),
          ok(G.ddsketch_quantile(F.col("sk"), 0.99),
             rankValue(F.col("sorted"), F.col("cnt"), 0.99), RankTol).as("p99_ok"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // ----------------------------------------------------------------
    // Relational host-surface parity (SURVEY.md §2.2): exact oracles
    // ----------------------------------------------------------------

    // grouped aggregation (TPC-H Q1 shape; cents as exact BIGINT)
    "q_rel_agg" -> ((s: SparkSession, dir: String) => {
      t(s, dir, "lineitem")
        .filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy(F.col("l_returnflag"), F.col("l_linestatus"))
        .agg(
          F.sum(F.col("l_quantity")).cast("long").as("sum_qty"),
          F.round(F.sum(F.col("l_extendedprice")) * 100, 0).cast("long").as("sum_price_cents"),
          F.count(F.lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // broadcast dim join + group
    "q_rel_join" -> ((s: SparkSession, dir: String) => {
      val orders = t(s, dir, "orders")
      val customer = t(s, dir, "customer")
      orders.join(F.broadcast(customer),
          orders("o_custkey") === customer("c_custkey"))
        .groupBy(F.col("c_mktsegment"))
        .agg(F.count(F.lit(1)).as("order_cnt"),
             F.round(F.sum(F.col("o_totalprice")) * 100, 0).cast("long").as("total_cents"))
        .orderBy("c_mktsegment")
    }),

    // bucketed sink + co-located fact-to-fact join: both sides written
    // bucketed by orderkey, so the join itself plans zero exchanges
    // (pinned by PlanShapeSpec); the write-side shuffle is paid once
    "q_bucketed_join" -> ((s: SparkSession, dir: String) => {
      val B = graft.sources.Bucketed
      B.writeBucketed(t(s, dir, "orders"), "graft_q_orders_b",
        Seq("o_orderkey"), 8, Seq("o_orderkey"))
      B.writeBucketed(t(s, dir, "lineitem"), "graft_q_lineitem_b",
        Seq("l_orderkey"), 8, Seq("l_orderkey"))
      B.colocatedJoin(s, "graft_q_orders_b", "graft_q_lineitem_b",
          F.col("o_orderkey") === F.col("l_orderkey"))
        .groupBy(F.col("o_orderpriority"))
        .agg(F.count(F.lit(1)).as("items"),
             F.round(F.sum(F.col("l_extendedprice")) * 100, 0).cast("long")
               .as("price_cents"))
        .orderBy("o_orderpriority")
    }),

    // filter pushdown + projection pruning
    "q_rel_filter" -> ((s: SparkSession, dir: String) => {
      t(s, dir, "lineitem")
        .filter(F.col("l_shipdate").between(F.lit("1994-01-01"), F.lit("1994-12-31")) &&
                F.col("l_discount").between(0.05, 0.07) && F.col("l_quantity") < 24)
        .agg(F.count(F.lit(1)).as("cnt"),
             F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")) * 100, 0)
               .cast("long").as("revenue_cents"))
    }),

    // union + distinct
    "q_rel_union" -> ((s: SparkSession, dir: String) => {
      val ev = t(s, dir, "events")
      val a = ev.filter(F.col("event_type") === "click").select(F.col("user_id"))
      val b = ev.filter(F.col("event_type") === "purchase").select(F.col("user_id"))
      a.union(b).distinct().agg(F.count(F.lit(1)).as("distinct_users"))
    }),

    // window function over orders per customer
    "q_rel_window" -> ((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(F.col("o_custkey")).orderBy(F.col("o_orderdate"), F.col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") === 1)
        .groupBy(F.col("o_orderpriority"))
        .agg(F.count(F.lit(1)).as("first_order_cnt"))
        .orderBy("o_orderpriority")
    }),

    // rolling sketch quantile over a sliding window frame — proves the
    // TypedImperativeAggregate composes with WindowExec (the 4th
    // execution context after groupBy, SQL, and streaming): per-row
    // sketch p95 over the trailing 100 events vs the exact order
    // statistic over the SAME frame, rank-tolerance boolean
    "q_sketch_window" -> ((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.expressions.Window
      Graft.register(s)
      val w = Window.partitionBy(F.col("event_type"))
        .orderBy(F.col("ts"), F.col("user_id")).rowsBetween(-99, 0)
      val scored = t(s, dir, "events").select(F.col("event_type"),
        G.ddsketch_quantile(G.ddsketch_agg_values(F.col("value")).over(w), 0.95)
          .as("p95"),
        F.sort_array(F.collect_list(F.col("value")).over(w)).as("__sv"),
        F.count(F.lit(1)).over(w).as("__n"))
      scored.select(F.col("event_type"),
          (F.abs(F.col("p95") - rankValue(F.col("__sv"), F.col("__n"), 0.95)) <=
            F.lit(RankTol) * F.abs(rankValue(F.col("__sv"), F.col("__n"), 0.95)))
            .as("ok"))
        .groupBy(F.col("event_type"))
        .agg(F.count(F.lit(1)).as("cnt"),
             F.min(F.col("ok")).as("rolling_p95_ok"))
        .orderBy("event_type")
    }),

    // Structured Streaming end-to-end under the correctness gate: the
    // events table replayed through a file-source stream into the
    // watermarked windowed sketch aggregation (AvailableNow trigger,
    // complete-mode memory sink — deterministic: complete mode
    // re-emits all windows and sketch merge is bin-count addition,
    // order-free on integral counts). Hourly counts are exact
    // cross-engine; the per-window sketch p50 pins as a
    // rank-tolerance boolean vs the exact order statistic computed
    // batch-side over the same rows
    "q_stream_rollup" -> ((s: SparkSession, dir: String) => {
      Graft.register(s)
      val ev = t(s, dir, "events")
        .filter(F.col("ts").isNotNull) // streams drop null event times
        .select(F.col("ts"), F.col("event_type"), F.col("value"))
      val tmp = System.getProperty("java.io.tmpdir") + "/graft_q_stream_src"
      ev.write.mode("overwrite").parquet(tmp)
      val stream = s.readStream.schema(ev.schema).parquet(tmp)
      val agg = graft.streaming.SketchStreaming.windowedSketchAgg(
        stream, "ts", "event_type", "value", "1 hour", "10 minutes")
      s.catalog.dropTempView("graft_stream_rollup")
      val q = agg.writeStream
        .outputMode("complete")
        .format("memory")
        .queryName("graft_stream_rollup")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val res = s.table("graft_stream_rollup")
        .select(F.unix_millis(F.col("window.start")).as("hour_ms"),
          F.col("event_type"),
          G.ddsketch_count(F.col("sketch")).as("cnt"),
          G.ddsketch_quantile(F.col("sketch"), 0.5).as("__p50"))
      val exact = ev
        .groupBy(F.date_trunc("hour", F.col("ts")).as("hour"), F.col("event_type"))
        .agg(F.sort_array(F.collect_list(F.col("value"))).as("__sv"),
          F.count(F.col("value")).as("__n"))
        .select(F.unix_millis(F.col("hour")).as("hour_ms"), F.col("event_type"),
          F.col("__sv"), F.col("__n"))
      res.join(exact, Seq("hour_ms", "event_type"))
        .select(F.col("hour_ms"), F.col("event_type"), F.col("cnt"),
          F.when(F.col("__n") === 0, F.lit(true))
            .otherwise(F.abs(F.col("__p50") - rankValue(F.col("__sv"), F.col("__n"), 0.5)) <=
              F.lit(RankTol) * F.abs(rankValue(F.col("__sv"), F.col("__n"), 0.5)))
            .as("p50_ok"))
        .orderBy("hour_ms", "event_type")
    }),

    // streaming windowed STATS rollup under the gate: the 12-field
    // stats struct per (hour, type) — count/min/max ride the exact
    // side channel so they hash-match DuckDB raw; p50 pins at rank
    // tolerance vs the exact order statistic over the same rows
    "q_stream_stats" -> ((s: SparkSession, dir: String) => {
      Graft.register(s)
      val ev = t(s, dir, "events")
        .filter(F.col("ts").isNotNull && F.col("value").isNotNull)
        .select(F.col("ts"), F.col("event_type"), F.col("value"))
      val tmp = System.getProperty("java.io.tmpdir") + "/graft_q_stream_stats_src"
      ev.write.mode("overwrite").parquet(tmp)
      val stream = s.readStream.schema(ev.schema).parquet(tmp)
      val agg = graft.streaming.SketchStreaming.windowedStatsAgg(
        stream, "ts", "event_type", "value", "1 hour", "10 minutes")
      s.catalog.dropTempView("graft_stream_stats")
      val q = agg.writeStream
        .outputMode("complete").format("memory")
        .queryName("graft_stream_stats")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val res = s.table("graft_stream_stats")
        .select(F.unix_millis(F.col("window.start")).as("hour_ms"),
          F.col("event_type"),
          F.col("stats.count").as("cnt"),
          F.col("stats.min").as("vmin"),
          F.col("stats.max").as("vmax"),
          F.col("stats.p50").as("__p50"))
      val exact = ev
        .groupBy(F.date_trunc("hour", F.col("ts")).as("hour"), F.col("event_type"))
        .agg(F.sort_array(F.collect_list(F.col("value"))).as("__sv"),
          F.count(F.col("value")).as("__n"))
        .select(F.unix_millis(F.col("hour")).as("hour_ms"), F.col("event_type"),
          F.col("__sv"), F.col("__n"))
      res.join(exact, Seq("hour_ms", "event_type"))
        .select(F.col("hour_ms"), F.col("event_type"), F.col("cnt"),
          F.col("vmin"), F.col("vmax"),
          (F.abs(F.col("__p50") - rankValue(F.col("__sv"), F.col("__n"), 0.5)) <=
            F.lit(RankTol) * F.abs(rankValue(F.col("__sv"), F.col("__n"), 0.5)))
            .as("p50_ok"))
        .orderBy("hour_ms", "event_type")
    }),

    // streaming exact dedup under the gate: content-hash
    // dropDuplicatesWithinWatermark over the replayed events stream.
    // AvailableNow stages the whole fixture as one micro-batch, so
    // every duplicate dedups against in-batch state and the surviving
    // row count is exactly the distinct-content count — WHICH
    // duplicate survives is scheduler-dependent, so the query emits
    // only the deterministic count
    "q_stream_dedup" -> ((s: SparkSession, dir: String) => {
      // collision-free tuple encoding: per-field sha2 tokens are fixed
      // 64-hex width (NULL -> one non-hex char), so distinct
      // (user, type, value) tuples never collapse to one key the way a
      // concat_ws form would (it skips NULLs and '|' could appear in a
      // field) — matches the oracle's true tuple DISTINCT
      def tok(c: org.apache.spark.sql.Column) =
        F.coalesce(F.sha2(c.cast("string"), 256), F.lit("N"))
      val ev = t(s, dir, "events").filter(F.col("ts").isNotNull)
        .select(F.col("ts"),
          F.concat(tok(F.col("user_id")), tok(F.col("event_type")),
            tok(F.col("value"))).as("content"))
      val tmp = System.getProperty("java.io.tmpdir") + "/graft_q_stream_dedup_src"
      ev.write.mode("overwrite").parquet(tmp)
      val stream = s.readStream.schema(ev.schema).parquet(tmp)
      // effectively-infinite horizon: a bounded replay must never
      // expire dedup state, or batching choices (maxFilesPerTrigger)
      // could let a late duplicate survive and flake the count
      val deduped = graft.streaming.SketchStreaming.dedupStream(
        stream, "ts", "content", "3650 days")
      s.catalog.dropTempView("graft_stream_dedup")
      val q = deduped.writeStream
        .outputMode("append").format("memory")
        .queryName("graft_stream_dedup")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table("graft_stream_dedup").agg(F.count(F.lit(1)).as("n_unique"))
    }),

    // streaming session windows under the gate: the native
    // session_window aggregation in append mode — sessions only emit
    // once the watermark passes their end, so the bounded replay
    // appends ONE sentinel event past every real session's end
    // (max_ts + gap + delay + 1ms, user -1): the trailing no-data
    // micro-batch then flushes every real session deterministically.
    // session_window splits at gap >= 30min (next < window-end merges,
    // end exclusive) — the oracle replays that boundary exactly
    "q_stream_session" -> ((s: SparkSession, dir: String) => {
      val ev = t(s, dir, "events").filter(F.col("ts").isNotNull)
        .select(F.col("ts"), F.col("user_id"), F.col("value"))
      val maxTs = ev.agg(F.max(F.unix_millis(F.col("ts")))).head().getLong(0)
      val sentinel = s.range(1).select(
        F.timestamp_millis(F.lit(maxTs + 1800000L + 61000L)).as("ts"),
        F.lit(-1L).as("user_id"), F.lit(0.0).as("value"))
      val tmp = System.getProperty("java.io.tmpdir") + "/graft_q_stream_sess_src"
      ev.unionByName(sentinel).write.mode("overwrite").parquet(tmp)
      val stream = s.readStream.schema(ev.schema).parquet(tmp)
      val agg = graft.streaming.SketchStreaming.sessionizedSketchAgg(
        stream, "ts", "user_id", "value", "30 minutes", "1 minute")
      s.catalog.dropTempView("graft_stream_session")
      val q = agg.writeStream
        .outputMode("append").format("memory")
        .queryName("graft_stream_session")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table("graft_stream_session")
        .filter(F.col("user_id") =!= -1L)
        .select(F.col("user_id"),
          (F.unix_millis(F.col("session_window.end")) - F.lit(1800000L) -
            F.unix_millis(F.col("session_window.start"))).as("__span"),
          F.col("n_events"))
        .groupBy(F.col("user_id"))
        .agg(F.count(F.lit(1)).as("n_sessions"),
          F.sum(F.col("n_events")).as("n_events"),
          F.max(F.col("n_events")).as("max_session_events"),
          F.sum(F.col("__span")).as("total_span_ms"))
        .orderBy("user_id")
    }),

    // streaming heavy-hitters under the gate: per-(window, type)
    // Count-Min + TopK over the replayed stream (complete mode).
    // TopK capacity 256 >= distinct users, so the sketch is in its
    // exact regime: total == row count and the top-1 count == the max
    // per-user count, both SQL-replayable (top-1 IDENTITY can tie, so
    // only the count is emitted)
    // streaming drift gate: per-hour PSI of the value distribution
    // against the full fixture as the reference (Drift binning and
    // smoothing verbatim; cuts are shared literals so DuckDB replays
    // both sides; psi 4dp — the libm-log convention)
    "q_stream_drift" -> ((s: SparkSession, dir: String) => {
      val ev = t(s, dir, "events")
        .filter(F.col("ts").isNotNull)
        .select(F.col("ts"), F.col("value"))
      val cuts = Seq(10.0, 25.0, 50.0, 100.0, 250.0)
      val ref = graft.pipeline.Drift.referenceBinCounts(ev, "value", cuts)
      val tmp = System.getProperty("java.io.tmpdir") + "/graft_q_stream_drift_src"
      ev.write.mode("overwrite").parquet(tmp)
      val stream = s.readStream.schema(ev.schema).parquet(tmp)
      val agg = graft.streaming.SketchStreaming.driftStream(
        stream, "ts", "value", "1 hour", "10 minutes", cuts, ref)
      s.catalog.dropTempView("graft_stream_drift")
      val q = agg.writeStream
        .outputMode("complete").format("memory")
        .queryName("graft_stream_drift")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table("graft_stream_drift")
        .select(F.unix_millis(F.col("window.start")).as("hour_ms"),
          F.col("n"), F.col("psi"))
        .orderBy("hour_ms")
    }),

    // windowed EMBEDDING drift vs the frozen IVF index: window A
    // replays the corpus itself (occupancy proportions equal the
    // index's term-by-term -> psi EXACTLY 0), window B replays 200
    // copies of one vector (one hot cell -> psi far past 0.5) — both
    // pinned as booleans; counts replay in SQL
    "q_stream_embed_drift" -> ((s: SparkSession, dir: String) => {
      val emb = t(s, dir, "embeddings")
        .filter(F.col("embedding").isNotNull)
        .select(F.col("vec_id"), F.col("embedding"))
      val idx = graft.pipeline.Similarity.buildIvfIndex(
        emb, "vec_id", "embedding", nlist = 16, iterations = 2)
      val a = emb.select(
        F.lit(java.sql.Timestamp.valueOf("2026-01-01 10:00:00")).as("ts"),
        F.col("embedding"))
      val b = s.range(200).crossJoin(F.broadcast(
          emb.filter(F.col("vec_id") === 0).select(F.col("embedding"))))
        .select(F.lit(java.sql.Timestamp.valueOf("2026-01-01 12:00:00")).as("ts"),
          F.col("embedding"))
      val tmp = System.getProperty("java.io.tmpdir") + "/graft_q_stream_edrift_src"
      a.unionByName(b).write.mode("overwrite").parquet(tmp)
      val stream = s.readStream.schema(a.schema).parquet(tmp)
      val agg = graft.streaming.SketchStreaming.embeddingDriftStream(
        stream, "ts", "embedding", idx, "1 hour", "10 minutes")
      s.catalog.dropTempView("graft_stream_edrift")
      val q = agg.writeStream
        .outputMode("complete").format("memory")
        .queryName("graft_stream_edrift")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table("graft_stream_edrift")
        .select(F.col("n"),
          F.when(F.col("n") === 200L, F.col("psi") > 0.5)
            .otherwise(F.col("psi") === 0.0).as("psi_ok"))
        .orderBy("n")
    }),

    // streaming SLO gate: per-(hour, type) burn rate from the
    // windowed sketch stream, bracketed by the exact CDF at the
    // objective's ±3.5% value blur (the q_slo_burn argument)
    "q_stream_slo" -> ((s: SparkSession, dir: String) => {
      Graft.register(s)
      val ev = t(s, dir, "events")
        .filter(F.col("ts").isNotNull)
        .select(F.col("ts"), F.col("event_type"), F.col("value"))
      val tmp = System.getProperty("java.io.tmpdir") + "/graft_q_stream_slo_src"
      ev.write.mode("overwrite").parquet(tmp)
      val stream = s.readStream.schema(ev.schema).parquet(tmp)
      val agg = graft.streaming.SketchStreaming.windowedSketchAgg(
        stream, "ts", "event_type", "value", "1 hour", "10 minutes")
      s.catalog.dropTempView("graft_stream_slo")
      val q = agg.writeStream
        .outputMode("complete").format("memory")
        .queryName("graft_stream_slo")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val (objective, budget) = (100.0, 0.25)
      val res = s.table("graft_stream_slo")
        .select(F.unix_millis(F.col("window.start")).as("hour_ms"),
          F.col("event_type"),
          G.ddsketch_count(F.col("sketch")).as("n"),
          graft.sketch.Slo.burnRate(F.col("sketch"), objective, budget)
            .as("__burn"))
      val exact = ev
        .groupBy(F.unix_millis(F.date_trunc("hour", F.col("ts"))).as("hour_ms"),
          F.col("event_type"))
        .agg(
          (F.sum(F.when(F.col("value") <= objective * 0.965, 1L).otherwise(0L))
            .cast("double") / F.count(F.lit(1))).as("__lo"),
          (F.sum(F.when(F.col("value") <= objective * 1.035, 1L).otherwise(0L))
            .cast("double") / F.count(F.lit(1))).as("__hi"))
      res.join(exact, Seq("hour_ms", "event_type"))
        .select(F.col("hour_ms"), F.col("event_type"), F.col("n"),
          (F.col("__burn") >= (F.lit(1.0) - F.col("__hi") - 1e-9) / budget &&
           F.col("__burn") <= (F.lit(1.0) - F.col("__lo") + 1e-9) / budget)
            .as("burn_ok"))
        .orderBy("hour_ms", "event_type")
    }),

    // streaming MULTIWINDOW SLO alert under the gate: sliding 48h/6h
    // windows with the 6h short sub-window, exact n_short/n_long
    // replayed per window end in DuckDB (events × range(1,9) window
    // expansion — the q_stream_drift grid convention), burn rates
    // bracketed by the exact CDF at the objective's ±3.5% value blur
    "q_stream_slo_multi" -> ((s: SparkSession, dir: String) => {
      Graft.register(s)
      val ev = t(s, dir, "events")
        .filter(F.col("ts").isNotNull)
        .select(F.col("ts"), F.col("event_type"), F.col("value"))
      val tmp = System.getProperty("java.io.tmpdir") + "/graft_q_stream_slom_src"
      ev.write.mode("overwrite").parquet(tmp)
      val stream = s.readStream.schema(ev.schema).parquet(tmp)
      val (objective, budget) = (100.0, 0.25)
      val out = graft.streaming.SketchStreaming.multiWindowBurnStream(
        stream, "ts", "event_type", "value", objective, budget,
        shortDuration = "6 hours", longDuration = "48 hours",
        slideDuration = "6 hours", watermarkDelay = "10 minutes")
      s.catalog.dropTempView("graft_stream_slom")
      val q = out.writeStream
        .outputMode("complete").format("memory")
        .queryName("graft_stream_slom")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val res = s.table("graft_stream_slom")
        .select(F.unix_millis(F.col("window.end")).as("end_ms"),
          F.col("event_type"), F.col("n_short"), F.col("n_long"),
          F.col("burn_short"), F.col("burn_long"), F.col("alert"))
      val slide = 21600000L
      val exact = ev
        .select(F.col("event_type"), F.col("value").cast("double").as("__v"),
          F.unix_millis(F.col("ts")).as("__ms"))
        .select(F.col("event_type"), F.col("__v"), F.col("__ms"),
          F.explode(F.sequence(F.lit(1), F.lit(8))).as("__k"))
        .withColumn("end_ms",
          F.col("__ms") - F.pmod(F.col("__ms"), F.lit(slide)) +
            F.col("__k") * slide)
        .withColumn("__in_s", F.col("__ms") >= F.col("end_ms") - slide)
        .groupBy(F.col("end_ms"), F.col("event_type"))
        .agg(
          (F.sum(F.when(F.col("__v") <= objective * 0.965, 1L).otherwise(0L))
            .cast("double") / F.count(F.lit(1))).as("__lo_l"),
          (F.sum(F.when(F.col("__v") <= objective * 1.035, 1L).otherwise(0L))
            .cast("double") / F.count(F.lit(1))).as("__hi_l"),
          F.sum(F.when(F.col("__in_s"), 1L).otherwise(0L)).as("__ns"),
          (F.sum(F.when(F.col("__in_s") && F.col("__v") <= objective * 0.965,
            1L).otherwise(0L)).cast("double")).as("__lo_s_n"),
          (F.sum(F.when(F.col("__in_s") && F.col("__v") <= objective * 1.035,
            1L).otherwise(0L)).cast("double")).as("__hi_s_n"))
      def ok(b: Column, loF: Column, hiF: Column): Column =
        b >= (F.lit(1.0) - hiF - 1e-9) / budget &&
        b <= (F.lit(1.0) - loF + 1e-9) / budget
      res.join(exact, Seq("end_ms", "event_type"))
        .select(F.col("end_ms"), F.col("event_type"),
          F.col("n_short"), F.col("n_long"),
          F.when(F.col("__ns") === 0L, F.col("burn_short").isNull)
            .otherwise(ok(F.col("burn_short"),
              F.col("__lo_s_n") / F.col("__ns").cast("double"),
              F.col("__hi_s_n") / F.col("__ns").cast("double")))
            .as("burn_short_ok"),
          ok(F.col("burn_long"), F.col("__lo_l"), F.col("__hi_l"))
            .as("burn_long_ok"),
          (F.col("alert") === F.coalesce(
            F.col("burn_short") > 1.0 && F.col("burn_long") > 1.0,
            F.lit(false))).as("alert_ok"))
        .orderBy("end_ms", "event_type")
    }),

    // streaming burst detection: per 4h window and type, users whose
    // count rises >= 0.3x over their first-day baseline (add-one).
    // Counts are exact at this cardinality (capacity 256, the
    // q_sketch_regrain argument) and every rise is one division of
    // exact longs — full raw rows replay in DuckDB
    "q_stream_burst" -> ((s: SparkSession, dir: String) => {
      Graft.register(s)
      val ev = t(s, dir, "events")
        .filter(F.col("ts").isNotNull && F.col("user_id").isNotNull)
        .select(F.col("ts"), F.col("event_type"),
          F.col("user_id").cast("string").as("item"))
      val hourMs = F.unix_millis(F.date_trunc("hour", F.col("ts")))
      val f0 = {
        val lo = ev.agg(F.min(hourMs)).collect()(0).getLong(0)
        lo - java.lang.Math.floorMod(lo, 86400000L)
      }
      val ref = ev.filter(hourMs >= f0 && hourMs < f0 + 86400000L)
        .groupBy(F.col("item")).agg(F.count(F.lit(1)).as("ref"))
      val tmp = System.getProperty("java.io.tmpdir") + "/graft_q_stream_burst_src"
      ev.write.mode("overwrite").parquet(tmp)
      val stream = s.readStream.schema(ev.schema).parquet(tmp)
      val out = graft.streaming.SketchStreaming.burstStream(
        stream, "ts", "event_type", "item", "4 hours", "10 minutes",
        ref, minRise = 0.3, topKCapacity = 256)
      s.catalog.dropTempView("graft_stream_burst")
      val q = out.writeStream
        .outputMode("complete").format("memory")
        .queryName("graft_stream_burst")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table("graft_stream_burst")
        .select(F.unix_millis(F.col("window.start")).as("win_ms"),
          F.col("event_type"), F.col("item"), F.col("count").as("cnt"),
          F.coalesce(F.col("ref"), F.lit(0L)).as("ref"), F.col("rise"))
        .orderBy("win_ms", "event_type", "item")
    }),

    "q_stream_frequency" -> ((s: SparkSession, dir: String) => {
      Graft.register(s)
      val ev = t(s, dir, "events")
        .filter(F.col("ts").isNotNull && F.col("user_id").isNotNull)
        .select(F.col("ts"), F.col("event_type"),
          F.col("user_id").cast("string").as("item"))
      val tmp = System.getProperty("java.io.tmpdir") + "/graft_q_stream_freq_src"
      ev.write.mode("overwrite").parquet(tmp)
      val stream = s.readStream.schema(ev.schema).parquet(tmp)
      val agg = graft.streaming.SketchStreaming.windowedFrequencyAgg(
        stream, "ts", "event_type", "item", "4 hours", "10 minutes",
        topKCapacity = 256)
      s.catalog.dropTempView("graft_stream_freq")
      val q = agg.writeStream
        .outputMode("complete").format("memory")
        .queryName("graft_stream_freq")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table("graft_stream_freq")
        .select(F.unix_millis(F.col("window.start")).as("hour_ms"),
          F.col("event_type"),
          graft.sketch.cms.cms_total(F.col("cms")).as("total"),
          F.element_at(
            graft.sketch.topk.topk_items(F.col("topk"), 1), 1)
            .getField("count").as("top1_cnt"))
        .orderBy("hour_ms", "event_type")
    }),

    // custom-state streaming under the gate: the per-key lifetime
    // sketch maintained with flatMapGroupsWithState. Each micro-batch
    // emits the lifetime-to-date row per touched key, so the query
    // keeps the max-n_updates row per key (max_by) — robust to any
    // batching the file source picks; counts exact, p50 pinned at
    // rank tolerance vs the exact per-key order statistic
    "q_stream_running" -> ((s: SparkSession, dir: String) => {
      Graft.register(s)
      val ev = t(s, dir, "events")
        .filter(F.col("ts").isNotNull && F.col("value").isNotNull)
        .select(F.col("ts"), F.col("user_id"), F.col("value"))
      val tmp = System.getProperty("java.io.tmpdir") + "/graft_q_stream_run_src"
      ev.write.mode("overwrite").parquet(tmp)
      val stream = s.readStream.schema(ev.schema).parquet(tmp)
      val out = graft.streaming.SketchStreaming.runningSketchPerKey(
        stream, "ts", "user_id", "value", "3650 days")
      s.catalog.dropTempView("graft_stream_running")
      val q = out.writeStream
        .outputMode("append").format("memory")
        .queryName("graft_stream_running")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val life = s.table("graft_stream_running")
        .groupBy(F.col("key"))
        .agg(F.max_by(F.struct(F.col("n_updates"), F.col("sketch")),
          F.col("n_updates")).as("__r"))
        .select(F.col("key"), F.col("__r.n_updates").as("n"),
          G.ddsketch_quantile(F.col("__r.sketch"), 0.5).as("__p50"))
      val exact = ev.groupBy(F.col("user_id").cast("string").as("key"))
        .agg(F.sort_array(F.collect_list(F.col("value"))).as("__sv"),
          F.count(F.col("value")).as("__n"))
      life.join(exact, Seq("key"))
        .select(F.col("key"), F.col("n"),
          (F.abs(F.col("__p50") - rankValue(F.col("__sv"), F.col("__n"), 0.5)) <=
            F.lit(RankTol) * F.abs(rankValue(F.col("__sv"), F.col("__n"), 0.5)))
            .as("p50_ok"))
        .orderBy("key")
    }),

    // streaming NEAR-dup dedup under the gate: the "new batch" slice
    // (doc_id % 3 == 0) replayed as a file-source stream and probed
    // against the persisted minhash signature index of the rest of
    // the corpus — the crawl-ingest shape. Stateless except the
    // per-pair dedup, so AvailableNow replay emits exactly the batch
    // incremental pair set (shares q_dedup_incremental's oracle)
    "q_stream_neardup" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents")
      val hist = docs.filter(F.col("doc_id") % 3 =!= 0)
      val idxPath = System.getProperty("java.io.tmpdir") + "/graft_q_stream_nd_idx"
      graft.pipeline.Dedup.saveSignatureIndex(
        graft.pipeline.Dedup.buildSignatureIndex(hist, "doc_id", "text", 5, 16, 8),
        idxPath)
      val fresh = docs.filter(F.col("doc_id") % 3 === 0)
        .select(F.lit(java.sql.Timestamp.valueOf("2026-01-01 00:00:00")).as("ts"),
          F.col("doc_id"), F.col("text"))
      val tmp = System.getProperty("java.io.tmpdir") + "/graft_q_stream_nd_src"
      fresh.write.mode("overwrite").parquet(tmp)
      val stream = s.readStream.schema(fresh.schema).parquet(tmp)
      val out = graft.streaming.SketchStreaming.nearDupStream(
        stream, "ts", "doc_id", "text",
        graft.pipeline.Dedup.loadSignatureIndex(s, idxPath), hist,
        "doc_id", "text",
        // effectively-infinite horizon: bounded replays must never
        // expire pair-dedup state (see q_stream_dedup)
        watermarkDelay = "3650 days",
        shingleSize = 5, threshold = 0.8, bands = 16, rowsPerBand = 8)
      s.catalog.dropTempView("graft_stream_neardup")
      val q = out.writeStream
        .outputMode("append").format("memory")
        .queryName("graft_stream_neardup")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table("graft_stream_neardup").orderBy("id_new", "id_old")
    }),

    // streaming SUBSTRING-span scrub under the gate: the fresh slice
    // replayed as a file stream and probed against the persisted gram
    // index of history (stateless: bloom predicate + stream-static
    // semi-join, no state store), then merged to maximal spans at the
    // sink — history hits only (within-batch repeats are batch-global
    // context the stream can't see; the oracle drops that branch too)
    "q_stream_spans" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents").filter(F.col("text").isNotNull)
      val hist = docs.filter(F.col("doc_id") % 3 =!= 0)
      val idxPath = System.getProperty("java.io.tmpdir") + "/graft_q_stream_sp_idx"
      graft.pipeline.Dedup.buildGramIndex(hist, "text", k = 8)
        .write.mode("overwrite").parquet(idxPath)
      val fresh = docs.filter(F.col("doc_id") % 3 === 0)
        .select(F.col("doc_id"), F.col("text"))
      val tmp = System.getProperty("java.io.tmpdir") + "/graft_q_stream_sp_src"
      fresh.write.mode("overwrite").parquet(tmp)
      val stream = s.readStream.schema(fresh.schema).parquet(tmp)
      val out = graft.streaming.SketchStreaming.spanHitStream(
        stream, "doc_id", "text", s.read.parquet(idxPath), k = 8)
      s.catalog.dropTempView("graft_stream_spans")
      val q = out.writeStream
        .outputMode("append").format("memory")
        .queryName("graft_stream_spans")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.pipeline.Dedup.mergeSpans(s.table("graft_stream_spans"), "doc_id")
        .orderBy("doc_id", "span_start")
    }),

    // streaming EDIT-<= k matching under the gate: the planted 2-edit
    // variants replayed against the persisted PassJoin segment index —
    // shares q_edit_k_incremental's oracle (pair-dedup collapses
    // shared-segment multiplicity)
    "q_stream_edit_k" -> ((s: SparkSession, dir: String) => {
      val keys = t(s, dir, "documents").select(F.col("doc_id"),
        F.md5(F.col("doc_id").cast("string")).as("k"))
      val variants = keys.select(
        F.lit(java.sql.Timestamp.valueOf("2026-01-01 00:00:00")).as("ts"),
        (F.col("doc_id") + 1000000L).as("doc_id"),
        F.concat(F.lit("z"), F.substring(F.col("k"), 2, 9),
          F.lit("y"), F.substring(F.col("k"), 12, 100)).as("k"))
      val idxPath = System.getProperty("java.io.tmpdir") + "/graft_q_stream_ek_idx"
      graft.pipeline.Dedup.buildEditKIndex(keys, "doc_id", "k", k = 2)
        .write.mode("overwrite").parquet(idxPath)
      val tmp = System.getProperty("java.io.tmpdir") + "/graft_q_stream_ek_src"
      variants.write.mode("overwrite").parquet(tmp)
      val stream = s.readStream.schema(variants.schema).parquet(tmp)
      val out = graft.streaming.SketchStreaming.editKStream(
        stream, "ts", "doc_id", "k", s.read.parquet(idxPath),
        watermarkDelay = "3650 days", k = 2)
      s.catalog.dropTempView("graft_stream_editk")
      val q = out.writeStream
        .outputMode("append").format("memory")
        .queryName("graft_stream_editk")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table("graft_stream_editk").orderBy("id_new")
    }),

    // streaming EDIT-1 matching under the gate: the planted 'z'
    // variants replayed as a file stream against the persisted
    // deletion-hash index of the md5 keys — shares the batch
    // incremental oracle (pair-dedup collapses shared-key multiplicity)
    "q_stream_edit_one" -> ((s: SparkSession, dir: String) => {
      val keys = t(s, dir, "documents").select(F.col("doc_id"),
        F.md5(F.col("doc_id").cast("string")).as("k"))
      val variants = keys.select(
        F.lit(java.sql.Timestamp.valueOf("2026-01-01 00:00:00")).as("ts"),
        (F.col("doc_id") + 1000000L).as("doc_id"),
        F.concat(F.lit("z"), F.substring(F.col("k"), 2, 100)).as("k"))
      val idxPath = System.getProperty("java.io.tmpdir") + "/graft_q_stream_e1_idx"
      graft.pipeline.Dedup.buildEditOneIndex(keys, "doc_id", "k")
        .write.mode("overwrite").parquet(idxPath)
      val tmp = System.getProperty("java.io.tmpdir") + "/graft_q_stream_e1_src"
      variants.write.mode("overwrite").parquet(tmp)
      val stream = s.readStream.schema(variants.schema).parquet(tmp)
      val out = graft.streaming.SketchStreaming.editOneStream(
        stream, "ts", "doc_id", "k", s.read.parquet(idxPath),
        // effectively-infinite horizon: bounded replays must never
        // expire pair-dedup state (the q_stream_dedup rule)
        watermarkDelay = "3650 days")
      s.catalog.dropTempView("graft_stream_editone")
      val q = out.writeStream
        .outputMode("append").format("memory")
        .queryName("graft_stream_editone")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table("graft_stream_editone").orderBy("id_new")
    }),

    // streaming EMBEDDING near-dup under the gate: fresh exact copies
    // replayed as a file stream, probed against the static LSH
    // signature index of history (incrementalEmbeddingDuplicates is
    // stateless, so it runs on a stream unchanged); the per-table
    // collision multiplicity collapses in a complete-mode aggregate
    // whose state is one row per verified pair. Shares the batch
    // incremental oracle (copies collide in every table, recall 1.0)
    "q_stream_embed_dedup" -> ((s: SparkSession, dir: String) => {
      val emb = t(s, dir, "embeddings")
      val hist = emb.select(F.col("vec_id"), F.col("embedding"))
      val index = graft.pipeline.Dedup
        .buildVectorSignatureIndex(hist, "vec_id", "embedding")
        .localCheckpoint(eager = false)
      val fresh = emb.filter(F.col("vec_id") < 50)
        .select((F.col("vec_id") + 100000L).as("vec_id"), F.col("embedding"))
      val tmp = System.getProperty("java.io.tmpdir") + "/graft_q_stream_emb_src"
      fresh.write.mode("overwrite").parquet(tmp)
      val stream = s.readStream.schema(fresh.schema).parquet(tmp)
      val out = graft.pipeline.Dedup
        .incrementalEmbeddingDuplicates(stream, index, "vec_id", "embedding", 0.99)
        .groupBy(F.col("id_new"), F.col("id_old"))
        .agg(F.min(F.col("cos") >= 0.999).as("cos_ok"))
      s.catalog.dropTempView("graft_stream_embdup")
      val q = out.writeStream
        .outputMode("complete").format("memory")
        .queryName("graft_stream_embdup")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table("graft_stream_embdup").orderBy("id_new")
    }),

    // streaming snapshot maintenance under the gate: latest-row-per-key
    // over the replayed events stream — Snapshot.latestByKey is a plain
    // max_by aggregate, so it runs on a stream unchanged (complete
    // mode; state = ONE packed row per key, never event-count-sized).
    // (version, tiebreak) = (ts, event_id) is unique per key, so the
    // surviving row is deterministic and the oracle replays it with a
    // window
    "q_stream_latest" -> ((s: SparkSession, dir: String) => {
      val ev = t(s, dir, "events")
        .filter(F.col("ts").isNotNull && F.col("user_id").isNotNull)
        .select(F.col("ts"), F.col("user_id"), F.col("event_id"),
          F.col("event_type"), F.col("value"))
      val tmp = System.getProperty("java.io.tmpdir") + "/graft_q_stream_latest_src"
      ev.write.mode("overwrite").parquet(tmp)
      val stream = s.readStream.schema(ev.schema).parquet(tmp)
      val latest = graft.pipeline.Snapshot.latestByKey(
        stream, F.col("user_id"), F.col("ts"), F.col("event_id"))
      s.catalog.dropTempView("graft_stream_latest")
      val q = latest.writeStream
        .outputMode("complete").format("memory")
        .queryName("graft_stream_latest")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table("graft_stream_latest")
        .select(F.col("user_id"), F.unix_millis(F.col("ts")).as("ts_ms"),
          F.col("event_id"), F.col("event_type"), F.col("value"))
        .orderBy("user_id")
    }),

    // time bucketing: hourly event counts (epoch millis keys)
    "q_rel_timebucket" -> ((s: SparkSession, dir: String) => {
      t(s, dir, "events")
        .groupBy(F.date_trunc("hour", F.col("ts")).as("hour"), F.col("event_type"))
        .agg(F.count(F.lit(1)).as("cnt"))
        .select(F.unix_millis(F.col("hour")).as("hour_ms"), F.col("event_type"), F.col("cnt"))
        .orderBy("hour_ms", "event_type")
    }),

    // as-of join: each click matched to the user's most recent prior
    // purchase (inclusive) — DuckDB's native ASOF JOIN is the oracle
    "q_rel_asof" -> ((s: SparkSession, dir: String) => {
      val ev = t(s, dir, "events")
      val clicks = ev.filter(F.col("event_type") === "click")
        .select(F.col("user_id"), F.unix_millis(F.col("ts")).as("ms"))
      val purchases = ev.filter(F.col("event_type") === "purchase")
        .select(F.col("user_id"), F.unix_millis(F.col("ts")).as("ms"), F.col("value"))
        .groupBy(F.col("user_id"), F.col("ms"))
        .agg(F.max(F.col("value")).as("purchase_value"))
      graft.operators.AsOfJoin
        .asofJoin(clicks, purchases, Seq("user_id"), "ms", "ms", Seq("purchase_value"))
        .groupBy(F.expr("ms div 86400000").as("day"))
        .agg(F.count(F.lit(1)).as("clicks"),
             F.count(F.col("purchase_value")).as("matched"),
             F.round(F.sum(F.col("purchase_value")) * 100, 0).cast("long").as("cents"))
        .orderBy("day")
    }),

    // skew-resistant as-of: salted left + replicated right must give
    // byte-identical results to q_rel_asof (same DuckDB ASOF oracle)
    "q_rel_asof_salted" -> ((s: SparkSession, dir: String) => {
      val ev = t(s, dir, "events")
      val clicks = ev.filter(F.col("event_type") === "click")
        .select(F.col("user_id"), F.unix_millis(F.col("ts")).as("ms"))
      val purchases = ev.filter(F.col("event_type") === "purchase")
        .select(F.col("user_id"), F.unix_millis(F.col("ts")).as("ms"), F.col("value"))
        .groupBy(F.col("user_id"), F.col("ms"))
        .agg(F.max(F.col("value")).as("purchase_value"))
      graft.operators.AsOfJoin
        .asofJoinSalted(clicks, purchases, Seq("user_id"), "ms", "ms",
          Seq("purchase_value"), saltBuckets = 4)
        .groupBy(F.expr("ms div 86400000").as("day"))
        .agg(F.count(F.lit(1)).as("clicks"),
             F.count(F.col("purchase_value")).as("matched"),
             F.round(F.sum(F.col("purchase_value")) * 100, 0).cast("long").as("cents"))
        .orderBy("day")
    }),

    // measured-skew dispatch: the auto hook profiles the left keys via
    // keyCountProfile and routes to the salted as-of (thresholds here
    // force the salted branch deterministically); same ASOF oracle
    "q_rel_asof_auto" -> ((s: SparkSession, dir: String) => {
      val ev = t(s, dir, "events")
      val clicks = ev.filter(F.col("event_type") === "click")
        .select(F.col("user_id"), F.unix_millis(F.col("ts")).as("ms"))
      val purchases = ev.filter(F.col("event_type") === "purchase")
        .select(F.col("user_id"), F.unix_millis(F.col("ts")).as("ms"), F.col("value"))
        .groupBy(F.col("user_id"), F.col("ms"))
        .agg(F.max(F.col("value")).as("purchase_value"))
      graft.operators.AutoSkew
        .asofJoinAuto(clicks, purchases, Seq("user_id"), "ms", "ms",
          Seq("purchase_value"), skewThreshold = 0.0, minHotCount = 1L)
        .groupBy(F.expr("ms div 86400000").as("day"))
        .agg(F.count(F.lit(1)).as("clicks"),
             F.count(F.col("purchase_value")).as("matched"),
             F.round(F.sum(F.col("purchase_value")) * 100, 0).cast("long").as("cents"))
        .orderBy("day")
    }),

    // bounded range join: click-purchase pairs within 10 minutes per
    // user. Bucketed equi-join (keys stay small ints, x3 replication)
    // vs DuckDB's inequality-join oracle
    "q_rel_range" -> ((s: SparkSession, dir: String) => {
      val ev = t(s, dir, "events")
      val clicks = ev.filter(F.col("event_type") === "click")
        .select(F.col("user_id"), F.unix_millis(F.col("ts")).as("ms"))
      val purchases = ev.filter(F.col("event_type") === "purchase")
        .select(F.col("user_id"), F.unix_millis(F.col("ts")).as("pms"), F.col("value"))
      graft.operators.RangeJoin
        .bandJoin(clicks, purchases, Seq("user_id"), "ms", "pms", 600000L, Seq("value"))
        .groupBy(F.expr("ms div 86400000").as("day"))
        .agg(F.count(F.lit(1)).as("pairs"),
             F.round(F.sum(F.col("value")) * 100, 0).cast("long").as("cents"))
        .orderBy("day")
    }),

    // point-in-interval join (IP-range/validity lookup shape): lineitem
    // prices probed against price bands derived from orders — exact vs
    // the DuckDB inequality join
    "q_rel_interval" -> ((s: SparkSession, dir: String) => {
      val iv = t(s, dir, "orders").filter(F.col("o_orderkey") % 50 === 0)
        .select(F.col("o_orderkey"),
          (F.floor(F.col("o_totalprice")).cast("long") - 500L).as("lo"),
          F.floor(F.col("o_totalprice")).cast("long").as("hi"))
      val pt = t(s, dir, "lineitem").filter(F.col("l_orderkey") % 20 === 0)
        .select(F.col("l_orderkey"),
          F.floor(F.col("l_extendedprice")).cast("long").as("p"))
      graft.operators.RangeJoin
        .intervalJoin(pt, iv, "p", "lo", "hi", Seq("o_orderkey"), cellWidth = 500L)
        .agg(F.count(F.lit(1)).as("matches"),
             F.coalesce(F.sum(F.col("l_orderkey") * F.col("o_orderkey")), F.lit(0L))
               .as("pair_sum"))
    }),

    // gap-based sessionization (30-min gap) — window-function semantics
    // replicated exactly by the DuckDB oracle
    "q_rel_session" -> ((s: SparkSession, dir: String) => {
      val ev = t(s, dir, "events")
        .select(F.col("user_id"), F.unix_millis(F.col("ts")).as("ms"))
      graft.operators.Sessionize
        .sessionStats(ev, F.col("user_id"), F.col("ms"), 1800000L)
        .groupBy(F.col("key").as("user_id"))
        .agg(F.count(F.lit(1)).as("n_sessions"),
             F.sum(F.col("n_events")).as("n_events"),
             F.max(F.col("n_events")).as("max_session_events"),
             F.sum(F.col("span")).as("total_span_ms"))
        .select("user_id", "n_sessions", "n_events", "max_session_events", "total_span_ms")
        .orderBy("user_id")
    }),

    // skew-resistant sessionization: (key, time-bucket) window + summary
    // stitch must match the single-window q_rel_session oracle exactly
    "q_rel_session_bucketed" -> ((s: SparkSession, dir: String) => {
      val ev = t(s, dir, "events")
        .select(F.col("user_id"), F.unix_millis(F.col("ts")).as("ms"))
      graft.operators.Sessionize
        .withSessionIdBucketed(ev, F.col("user_id"), F.col("ms"),
          maxGap = 1800000L, bucketSpan = 3600000L)
        .filter(F.col("session_id").isNotNull)
        .groupBy(F.col("user_id"), F.col("session_id"))
        .agg(F.count(F.lit(1)).as("n_events"),
             (F.max(F.col("ms")) - F.min(F.col("ms"))).as("span"))
        .groupBy(F.col("user_id"))
        .agg(F.count(F.lit(1)).as("n_sessions"),
             F.sum(F.col("n_events")).as("n_events"),
             F.max(F.col("n_events")).as("max_session_events"),
             F.sum(F.col("span")).as("total_span_ms"))
        .select("user_id", "n_sessions", "n_events", "max_session_events", "total_span_ms")
        .orderBy("user_id")
    }),

    // measured-skew dispatch for sessionization: the auto hook profiles
    // the key counts and picks the bucketed form (thresholds force that
    // branch deterministically); same oracle as q_rel_session
    "q_rel_session_auto" -> ((s: SparkSession, dir: String) => {
      val ev = t(s, dir, "events")
        .select(F.col("user_id"), F.unix_millis(F.col("ts")).as("ms"))
      graft.operators.AutoSkew
        .withSessionIdAuto(ev, "user_id", F.col("ms"), maxGap = 1800000L,
          skewThreshold = 0.0, minHotCount = 1L)
        .filter(F.col("session_id").isNotNull)
        .groupBy(F.col("user_id"), F.col("session_id"))
        .agg(F.count(F.lit(1)).as("n_events"),
             (F.max(F.col("ms")) - F.min(F.col("ms"))).as("span"))
        .groupBy(F.col("user_id"))
        .agg(F.count(F.lit(1)).as("n_sessions"),
             F.sum(F.col("n_events")).as("n_events"),
             F.max(F.col("n_events")).as("max_session_events"),
             F.sum(F.col("span")).as("total_span_ms"))
        .select("user_id", "n_sessions", "n_events", "max_session_events", "total_span_ms")
        .orderBy("user_id")
    }),

    // SQL surface: CTE + scalar subquery (reference test shapes,
    // test/sql/ddsketch.test:19,36; integration_test.sql:17-27)
    "q_rel_sql" -> ((s: SparkSession, dir: String) => {
      Graft.register(s)
      t(s, dir, "orders").createOrReplaceTempView("orders_v")
      s.sql(
        """WITH thresholds AS (SELECT avg(o_totalprice) AS avg_price FROM orders_v)
          |SELECT o_orderpriority, count(*) AS cnt
          |FROM orders_v
          |WHERE o_totalprice > (SELECT avg_price FROM thresholds)
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    }),

    // ----------------------------------------------------------------
    // Training-data pipeline operators (dedup / similarity / text / media)
    // ----------------------------------------------------------------

    // sketch sink/scan: persist per-group sketches to parquet, read back,
    // merge — the reference's "efficient storage in Parquet" claim
    // (README.md:203-206) plus the store-now-merge-later pattern
    "q_sketch_sink" -> ((s: SparkSession, dir: String) => {
      Graft.register(s)
      val tmp = java.nio.file.Files.createTempDirectory("graft_sink").toString
      t(s, dir, "events")
        .groupBy(F.col("event_type"), F.date_trunc("hour", F.col("ts")).as("hour"))
        .agg(G.ddsketch_agg_values(F.col("value")).as("sketch"))
        .write.mode("overwrite").parquet(s"$tmp/hourly")
      s.read.parquet(s"$tmp/hourly")
        .groupBy(F.col("event_type"))
        .agg(G.ddsketch_count(G.ddsketch_agg(F.col("sketch"))).as("cnt"),
             (F.max(F.octet_length(F.col("sketch"))) <= 8192).as("size_ok"))
        .orderBy("event_type")
    }),

    // KMV distinct-count sketch vs exact distinct per group
    "q_kmv_distinct" -> ((s: SparkSession, dir: String) => {
      import graft.sketch.{kmv => K}
      t(s, dir, "events").groupBy(F.col("event_type"))
        .agg(
          K.kmv_distinct(K.kmv_agg(F.col("user_id"))).as("est"),
          F.countDistinct(F.col("user_id")).as("exact_distinct"))
        .select(F.col("event_type"), F.col("exact_distinct"),
          ok(F.col("est"), F.col("exact_distinct").cast("double"), 0.12).as("est_ok"))
        .orderBy("event_type")
    }),

    // KMV containment/jaccard between user sets of two event types
    "q_kmv_overlap" -> ((s: SparkSession, dir: String) => {
      import graft.sketch.{kmv => K}
      val ev = t(s, dir, "events")
      val sk = ev.groupBy(F.col("event_type")).agg(K.kmv_agg(F.col("user_id")).as("s"))
      val j = sk.filter(F.col("event_type") === "click").select(F.col("s"))
        .crossJoin(sk.filter(F.col("event_type") === "purchase")
          .select(F.col("s").as("s2")))
        .select(K.kmv_jaccard(F.col("s"), F.col("s2")).as("j"))
      val a = ev.filter(F.col("event_type") === "click").select("user_id").distinct()
      val b = ev.filter(F.col("event_type") === "purchase").select("user_id").distinct()
      val inter = a.intersect(b).count()
      val union = a.union(b).distinct().count()
      j.select(
        F.lit(inter).as("exact_inter"),
        (F.abs(F.col("j") - inter.toDouble / union) < 0.08).as("jaccard_ok"))
    }),

    // Bloom membership sketch: corpus-scale "probably seen" pre-filter.
    // Exactness contract: zero false negatives (pinned boolean), false
    // positives bounded well above the configured 1% fpp
    "q_bloom" -> ((s: SparkSession, dir: String) => {
      import graft.sketch.{bloom => B}
      Graft.register(s)
      val ev = t(s, dir, "events")
      val build = ev
        .filter(F.col("event_type") === "click" && F.col("user_id") % 3 === 0)
        .select(F.col("user_id")).distinct()
      val bf = build.agg(B.bloom_agg(F.col("user_id"), 100000L, 0.01).as("bf"))
      // the broadcast-decoded probe path must agree with the SQL
      // bytes-in-plan path bit for bit: same inserted set and (items,
      // fpp) give an identical bitset (bit-OR is order-independent)
      val bc = B.broadcastFilter(build, "user_id", 100000L, 0.01)
      val probe = ev.select(F.col("user_id")).distinct()
      probe.join(build.withColumn("__in", F.lit(1)), Seq("user_id"), "left")
        .crossJoin(bf)
        .select(F.col("user_id"), F.col("__in").isNotNull.as("present"),
                B.bloom_contains(F.col("bf"), F.col("user_id")).as("hit"),
                B.contains_broadcast(bc, F.col("user_id")).as("bhit"))
        .agg(
          F.count(F.lit(1)).as("probed"),
          F.sum(F.when(F.col("present"), 1L).otherwise(0L)).as("present"),
          (F.sum(F.when(F.col("present") && !F.col("hit"), 1L).otherwise(0L)) === 0L)
            .as("no_false_negatives"),
          (F.sum(F.when(!F.col("present") && F.col("hit"), 1L).otherwise(0L)) <=
            F.greatest(F.lit(5L), F.ceil(F.count(F.lit(1)) * 0.05)))
            .as("fp_bounded"),
          (F.sum(F.when(F.col("hit") === F.col("bhit"), 0L).otherwise(1L)) === 0L)
            .as("paths_agree"))
    }),

    // count-min frequency sketch: corpus-wide per-user frequency in
    // O(depth x width) memory; estimates never undercount and overshoot
    // at most eps * totalCount (both pinned as booleans over ALL users)
    "q_cms" -> ((s: SparkSession, dir: String) => {
      import graft.sketch.{cms => C}
      Graft.register(s)
      val ev = t(s, dir, "events")
      val sk = ev.agg(C.cms_agg(F.col("user_id"), 0.001, 0.99).as("sk"))
      ev.groupBy(F.col("user_id")).agg(F.count(F.lit(1)).as("exact"))
        .crossJoin(sk)
        .select(F.col("exact"),
          C.cms_estimate(F.col("sk"), F.col("user_id")).as("est"),
          C.cms_total(F.col("sk")).as("n"))
        .agg(
          F.count(F.lit(1)).cast("long").as("probed"),
          F.min(F.col("n")).as("total"),
          (F.sum(F.when(F.col("est") >= F.col("exact"), 0L).otherwise(1L)) === 0L)
            .as("no_undercount"),
          (F.sum(F.when(F.col("est") <= F.col("exact") +
              F.ceil(F.col("n") * F.lit(0.001)).cast("long"), 0L).otherwise(1L)) === 0L)
            .as("overcount_bounded"))
    }),

    // distinct counting via Spark's built-in DataSketches HLL (the
    // Spark-first answer where the engine already ships a mergeable
    // sketch): per-group estimates within 2% of exact, and the UNION of
    // the per-group sketches re-estimates the global distinct count
    "q_hll_distinct" -> ((s: SparkSession, dir: String) => {
      val ev = t(s, dir, "events")
      val per = ev.groupBy(F.col("event_type")).agg(
        F.hll_sketch_agg(F.col("user_id")).as("hs"),
        F.count_distinct(F.col("user_id")).as("exact_users"))
      val tol = (est: org.apache.spark.sql.Column, exact: org.apache.spark.sql.Column) =>
        F.abs(est - exact) <= F.greatest(F.lit(2.0), exact * 0.02)
      val global = per.agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("hs"))).as("gest"))
        .crossJoin(ev.agg(F.count_distinct(F.col("user_id")).as("gexact")))
        .select(tol(F.col("gest"), F.col("gexact")).as("global_ok"))
      per.select(F.col("event_type"), F.col("exact_users"),
          tol(F.hll_sketch_estimate(F.col("hs")), F.col("exact_users")).as("est_ok"))
        .crossJoin(global)
        .orderBy("event_type")
    }),

    // ordered funnel: users per completed depth of view->click->purchase
    // within 1 day of the anchor view (strictly increasing epoch-millis
    // between steps; one hash exchange)
    "q_funnel" -> ((s: SparkSession, dir: String) => {
      val ev = t(s, dir, "events")
      graft.operators.Funnel.funnelCounts(ev, F.col("user_id"),
          F.unix_millis(F.col("ts")), F.col("event_type"),
          Seq("view", "click", "purchase"), maxSpan = Some(86400000L))
        .select(F.col("steps_completed"), F.col("users"))
        .orderBy("steps_completed")
    }),

    // cohort retention matrix: users from each first-day cohort active
    // again k days later (two exchanges; no event self-join)
    "q_retention" -> ((s: SparkSession, dir: String) => {
      val ev = t(s, dir, "events")
      graft.operators.Retention.cohortRetention(
          ev, F.col("user_id"), F.col("ts"), maxOffset = 14)
    }),

    // equi-depth feature binning: per-type deciles of value via the
    // sketch CDF — all 10 buckets used, every depth within 40% of n/10
    // (sketch accuracy band; exact depths probed at both local SFs)
    "q_quantile_buckets" -> ((s: SparkSession, dir: String) => {
      Graft.register(s)
      val ev = t(s, dir, "events")
      graft.sketch.SketchOps.quantileBuckets(ev, Seq("event_type"), "value", 10)
        .groupBy(F.col("event_type"), F.col("bucket"))
        .agg(F.count(F.lit(1)).as("depth"))
        .groupBy(F.col("event_type"))
        .agg(F.sum(F.col("depth")).as("cnt"),
             F.count(F.lit(1)).cast("long").as("buckets_used"),
             F.max(F.col("depth")).as("maxd"), F.min(F.col("depth")).as("mind"))
        .select(F.col("event_type"), F.col("cnt"),
          (F.col("buckets_used") === 10L &&
           F.col("maxd") * 10 <= F.col("cnt") * 1.4 &&
           F.col("mind") * 10 >= F.col("cnt") * 0.6).as("balanced_ok"))
        .orderBy("event_type")
    }),

    // z-order layout: write events z-ordered by (user_id, value), read
    // back — content preserved exactly, and every file's min/max span
    // in BOTH dimensions stays well under the global span (the property
    // that makes parquet row-group stats prune multi-column filters)
    "q_zorder" -> ((s: SparkSession, dir: String) => {
      val ev = t(s, dir, "events").select("event_id", "user_id", "value")
      val path = System.getProperty("java.io.tmpdir") + "/graft_q_zorder"
      graft.sources.ZOrder.writeZOrdered(
        ev, Seq("user_id", "value"), path, numFiles = 8)
      val back = s.read.parquet(path)
      val spans = back.groupBy(F.input_file_name())
        .agg((F.max("user_id") - F.min("user_id")).cast("double").as("us"),
             (F.max("value") - F.min("value")).as("vs"))
        .agg(F.avg(F.col("us")).as("us"), F.avg(F.col("vs")).as("vs"))
      val global = ev.agg(
        (F.max("user_id") - F.min("user_id")).cast("double").as("gu"),
        (F.max("value") - F.min("value")).as("gv"))
      back.agg(F.count(F.lit(1)).as("n_rows"),
               F.sum(F.col("event_id")).as("id_sum"))
        .crossJoin(spans).crossJoin(global)
        .select(F.col("n_rows"), F.col("id_sum"),
          (F.col("us") < F.col("gu") * 0.8 && F.col("vs") < F.col("gv") * 0.8)
            .as("locality_ok"))
    }),

    // the 100 TB z-order form: quantile-boundary scaling (one
    // percentile_approx pass + broadcast binary search) instead of
    // the single-partition rank window — same locality contract
    "q_zorder_scalable" -> ((s: SparkSession, dir: String) => {
      val ev = t(s, dir, "events").select("event_id", "user_id", "value")
      val path = System.getProperty("java.io.tmpdir") + "/graft_q_zorder_s"
      graft.sources.ZOrder.writeZOrderedScalable(
        ev, Seq("user_id", "value"), path, numFiles = 8)
      val back = s.read.parquet(path)
      val spans = back.groupBy(F.input_file_name())
        .agg((F.max("user_id") - F.min("user_id")).cast("double").as("us"),
             (F.max("value") - F.min("value")).as("vs"))
        .agg(F.avg(F.col("us")).as("us"), F.avg(F.col("vs")).as("vs"))
      val global = ev.agg(
        (F.max("user_id") - F.min("user_id")).cast("double").as("gu"),
        (F.max("value") - F.min("value")).as("gv"))
      back.agg(F.count(F.lit(1)).as("n_rows"),
               F.sum(F.col("event_id")).as("id_sum"))
        .crossJoin(spans).crossJoin(global)
        .select(F.col("n_rows"), F.col("id_sum"),
          (F.col("us") < F.col("gu") * 0.8 && F.col("vs") < F.col("gv") * 0.8)
            .as("locality_ok"))
    }),

    // deterministic byte-balanced sharding (the layout step in front
    // of the trainer sinks): shard = exclusive-cumulative-bytes div
    // target in doc_id order — pure arithmetic, replayed by a DuckDB
    // window; the routed WebDataset write must land every sample in
    // the tar NUMBERED by its shard (identity partitioner), pinned as
    // a boolean
    "q_shard_bytes" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents")
        .filter(F.col("text").isNotNull)
        // UTF-8 BYTE length (DuckDB strlen counts bytes, Spark length
        // counts chars — encode first so both engines meter bytes)
        .select(F.col("doc_id"), F.col("text"),
          F.length(F.encode(F.col("text"), "UTF-8")).cast("long").as("__b"))
      val (routed, n) = graft.pipeline.Sharding.shardByBytes(
        docs, F.col("doc_id"), F.col("__b"), targetBytes = 20000L)
      val base = System.getProperty("java.io.tmpdir") + "/graft_q_shard_wds"
      // shard count is data-derived: a prior run at another SF can
      // leave MORE part-*.tar files than this run writes, and read()
      // globs them all — delete first (the q_safetensors rule)
      org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(base), true)
      val keyed = routed.select(
        F.concat(F.lit("doc"), F.col("doc_id")).as("key"),
        F.map(F.lit("txt"), F.encode(F.col("text"), "UTF-8")).as("members"),
        F.col("shard"))
      graft.sources.WebDataset.write(keyed, F.col("key"), F.col("members"), base)
      val back = graft.sources.WebDataset.read(s, base)
        .select(F.regexp_extract(F.col("shard"), "part-(\\d+)\\.tar$", 1)
          .cast("int").as("__fs"), F.col("key"))
      val routedOk = back
        .join(keyed.select(F.col("key"), F.col("shard").as("__want")), "key")
        .filter(F.col("__fs") =!= F.col("__want")).isEmpty &&
        back.select("__fs").distinct().count() == n.toLong
      routed.groupBy(F.col("shard"))
        .agg(F.count(F.lit(1)).as("docs"), F.sum(F.col("__b")).as("bytes"))
        .withColumn("routed_ok", F.lit(routedOk))
        .orderBy("shard")
    }),

    // exact dedup by content hash
    "q_dedup_exact" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents")
      val kept = graft.pipeline.Dedup.dropExactDuplicates(docs, "doc_id", "text").count()
      docs.agg(
        F.count(F.lit(1)).as("total"),
        F.countDistinct(F.col("text")).as("distinct_docs"))
        .withColumn("kept", F.lit(kept))
    }),

    // MinHash-LSH near-dup pairs, exact-Jaccard verified (char 5-grams, j >= 0.8)
    "q_dedup_minhash" -> ((s: SparkSession, dir: String) => {
      graft.pipeline.Dedup.nearDuplicatePairs(
          t(s, dir, "documents"), "doc_id", "text",
          shingleSize = 5, threshold = 0.8, bands = 16, rowsPerBand = 8)
        .select("id_a", "id_b")
        .orderBy("id_a", "id_b")
    }),

    // incremental near-dup: a "new batch" (doc_id % 3 == 0) checked
    // against a persisted LSH signature index of the rest of the corpus
    // — history is never re-shingled, new-batch buckets broadcast
    "q_dedup_incremental" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents")
      val hist = docs.filter(F.col("doc_id") % 3 =!= 0)
      val fresh = docs.filter(F.col("doc_id") % 3 === 0)
      val path = System.getProperty("java.io.tmpdir") + "/graft_q_sigidx"
      graft.pipeline.Dedup.saveSignatureIndex(
        graft.pipeline.Dedup.buildSignatureIndex(hist, "doc_id", "text", 5, 16, 8),
        path)
      graft.pipeline.Dedup.incrementalNearDuplicatePairs(
          fresh, graft.pipeline.Dedup.loadSignatureIndex(s, path), hist,
          "doc_id", "text", 5, 0.8, 16, 8)
        .orderBy("id_new", "id_old")
    }),

    // n-gram Jaccard: same pairs with exact intersection/union counts
    "q_dedup_ngram" -> ((s: SparkSession, dir: String) => {
      graft.pipeline.Dedup.nearDuplicatePairs(
          t(s, dir, "documents"), "doc_id", "text",
          shingleSize = 5, threshold = 0.8, bands = 16, rowsPerBand = 8)
        .select("id_a", "id_b", "inter", "uni")
        .orderBy("id_a", "id_b")
    }),

    // transitive duplicate clusters: connected components over the
    // verified pair set, vs a DuckDB recursive-CTE reachability oracle
    "q_dedup_clusters" -> ((s: SparkSession, dir: String) => {
      val pairs = graft.pipeline.Dedup.nearDuplicatePairs(
        t(s, dir, "documents"), "doc_id", "text",
        shingleSize = 5, threshold = 0.8, bands = 16, rowsPerBand = 8)
      graft.pipeline.Dedup.duplicateClusters(pairs)
        .select(F.col("id").as("doc_id"), F.col("cluster"))
        .orderBy("doc_id")
    }),

    // duplicate DOWNWEIGHTING: soft dedup keeping each cluster member
    // w.p. 1/|cluster| by the md5-threshold rule — unique docs always
    // survive; the whole survivor set replays row-for-row in SQL
    // (cluster sizes from the recursive-CTE clusters, the same
    // %04x-rendered threshold as q_rebalance)
    "q_dedup_downweight" -> ((s: SparkSession, dir: String) =>
      graft.pipeline.Dedup.downweightDuplicates(
          t(s, dir, "documents"), "doc_id", "text",
          shingleSize = 5, threshold = 0.8, bands = 16, rowsPerBand = 8)
        .select(F.col("doc_id"))
        .orderBy("doc_id")),

    // URL-level canonical dedup: deterministic variant URLs from id
    // arithmetic (scheme-case + default port + tracking params +
    // fragment + query order all differ) collapse to one canonical
    // form; survivors AND their canonical strings replay in SQL — a
    // canonicalizer regression fails the string hash, not just counts
    "q_dedup_url" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents").select(F.col("doc_id"))
      val id = F.col("doc_id")
      // `/` on long columns is DOUBLE division (repo rule) — the two
      // variants would render m.0 vs m.333 and never collapse
      val grp = F.floor(id / 3L).cast("long").cast("string")
      val url = F.when(id % 3 === 0,
          F.concat(F.lit("HTTPS://Example.COM:443/p/"), grp,
            F.lit("?utm_source=x&b=2&a=1#f")))
        .when(id % 3 === 1,
          F.concat(F.lit("https://example.com/p/"), grp,
            F.lit("?b=2&a=1")))
        .otherwise(F.concat(F.lit("http://other.org/q/"), id.cast("string")))
      val withUrl = docs.withColumn("curl",
        graft.pipeline.Urls.canonicalizeUrl(url))
      graft.pipeline.Dedup.dropExactDuplicates(withUrl, "doc_id", "curl")
        .select(F.col("doc_id"), F.col("curl"))
        .orderBy("doc_id")
    }),

    // end-to-end near-dup dedup: survivors after dropping docs with a
    // smaller-id near-dup (direct-pair rule, SQL-replicable)
    "q_dedup_drop" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents")
      val kept = graft.pipeline.Dedup.dropNearDuplicates(
        docs, "doc_id", "text", shingleSize = 5, threshold = 0.8,
        bands = 16, rowsPerBand = 8)
      kept.agg(F.count(F.lit(1)).as("kept"),
               F.sum(F.col("doc_id")).as("kept_id_sum"))
    }),

    // EXACT set-similarity self-join (AllPairs/PPJoin prefix filter) at
    // word-token Jaccard >= 0.8 — guaranteed recall, vs the exact
    // all-pairs oracle; planted +1-token variants (doc_id % 7 == 0)
    // guarantee qualifying pairs exist (J = sz/(sz+1))
    "q_dedup_jaccard_join" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents")
      val planted = docs.filter(F.col("doc_id") % 7 === 0)
        .select((F.col("doc_id") + 100000L).as("doc_id"),
          F.concat(F.col("text"), F.lit(" zzextranew")).as("text"))
      val corpus = docs.select("doc_id", "text").unionAll(planted)
      graft.pipeline.Dedup.jaccardPrefixPairs(
          corpus, "doc_id", "text", threshold = 0.8)
        .orderBy("id_a", "id_b")
    }),

    // MinHash-LSH with the threshold-derived (bands, rows) auto-dial —
    // same exact-Jaccard oracle as q_dedup_minhash: the S-curve chosen
    // for t=0.8 must still reach every qualifying pair at this SF
    "q_dedup_minhash_auto" -> ((s: SparkSession, dir: String) => {
      graft.pipeline.Dedup.nearDuplicatePairsAuto(
          t(s, dir, "documents"), "doc_id", "text",
          shingleSize = 5, threshold = 0.8)
        .select("id_a", "id_b")
        .orderBy("id_a", "id_b")
    }),

    // corpus drift: exact two-sample KS distance between the value
    // distributions of two event cohorts — integer arithmetic
    // (d_num = max |F_a*n_b - F_b*n_a|), so the statistic is bit-exact
    // cross-engine; d is one IEEE division of exact longs
    "q_drift_ks" -> ((s: SparkSession, dir: String) => {
      val ev = t(s, dir, "events")
      val a = ev.filter(F.col("event_type").isin("click", "view"))
      val b = ev.filter(F.col("event_type").isin("purchase", "error"))
      graft.pipeline.Drift.ksStatistic(a, b, "value")
    }),

    // sketch-path KS (one DDSketch per side, driver CDF compare) must
    // land within 0.05 of the exact statistic — tolerance boolean
    // computed in Spark (both sides), oracle pins true
    "q_drift_ks_sketch" -> ((s: SparkSession, dir: String) => {
      val ev = t(s, dir, "events")
      val a = ev.filter(F.col("event_type").isin("click", "view"))
      val b = ev.filter(F.col("event_type").isin("purchase", "error"))
      val exact = graft.pipeline.Drift.ksStatistic(a, b, "value")
        .select(F.col("d")).first().getDouble(0)
      graft.pipeline.Drift.ksStatisticSketch(a, b, "value", 0.01)
        .select((F.abs(F.col("d_est") - exact) <= 0.05).as("within_tol"))
    }),

    // population-stability index over fixed cutoffs: exact per-bin
    // counts (empty bins included — the smoothing needs them)
    "q_drift_psi_bins" -> ((s: SparkSession, dir: String) => {
      val ev = t(s, dir, "events")
      val a = ev.filter(F.col("event_type").isin("click", "view"))
      val b = ev.filter(F.col("event_type").isin("purchase", "error"))
      graft.pipeline.Drift.psiBins(
          a, b, "value", Seq(10.0, 25.0, 50.0, 100.0, 250.0))
        .orderBy("bin")
    }),

    // the PSI statistic itself (add-one smoothed, 4dp — ln is libm)
    "q_drift_psi" -> ((s: SparkSession, dir: String) => {
      val ev = t(s, dir, "events")
      val a = ev.filter(F.col("event_type").isin("click", "view"))
      val b = ev.filter(F.col("event_type").isin("purchase", "error"))
      graft.pipeline.Drift.psiStatistic(
        a, b, "value", Seq(10.0, 25.0, 50.0, 100.0, 250.0))
    }),

    // chi-square homogeneity of the event-type mix between user cohorts:
    // exact counts + per-category contribution (4dp)
    "q_drift_chi2" -> ((s: SparkSession, dir: String) => {
      val ev = t(s, dir, "events")
      val a = ev.filter(F.col("user_id") % 2 === 0)
      val b = ev.filter(F.col("user_id") % 2 =!= 0)
      graft.pipeline.Drift.chiSquareDrift(a, b, "event_type")
        .orderBy("category")
    }),

    // GPT-style global token-stream packing: docs + EOS concatenate in
    // doc_id order, cut into 256-token sequences (docs straddle
    // boundaries); per-sequence occupancy is pure integer math
    "q_pack_stream" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents").filter(F.col("text").isNotNull)
      val nToks = F.size(F.filter(
        F.split(F.col("text"), "\\s+"), w => F.length(w) > 0))
      val layout = graft.pipeline.Packing.packTokenStream(
        docs, "doc_id", nToks, seqLen = 256L)
      graft.pipeline.Packing.packedSequenceStats(layout, 256L)
        .orderBy("seq_id")
    }),

    // per-sequence document spans (the block-diagonal-attention side
    // input): span cell counts and the id-weighted span dot product
    // replay exactly from the same integer layout; gapless tiling
    // from position 0 pins as booleans
    "q_pack_spans" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents").filter(F.col("text").isNotNull)
      val nToks = F.size(F.filter(
        F.split(F.col("text"), "\\s+"), w => F.length(w) > 0))
      val layout = graft.pipeline.Packing.packTokenStream(
        docs, "doc_id", nToks, seqLen = 256L)
      graft.pipeline.Packing.packedDocSpans(layout, "doc_id", 256L)
        .select(F.col("seq_id"),
          F.size(F.col("spans")).cast("long").as("n_docs"),
          F.expr("aggregate(spans, 0L, (a, sp) -> a + sp.`end` - sp.start + 1)")
            .as("cells"),
          F.expr("aggregate(spans, 0L, (a, sp) -> a + sp.id * (sp.`end` - sp.start + 1))")
            .as("id_dot"),
          // sequence(0, -1) DESCENDS, so the single-span case must
          // short-circuit before the pairwise walk
          F.expr("""spans[0].start = 0 AND (size(spans) < 2 OR
            forall(sequence(0, size(spans) - 2),
              i -> spans[i + 1].start = spans[i].`end` + 1))""")
            .as("tiles_ok"))
        .orderBy("seq_id")
    }),

    // materialized packed sequences (token ids = word lengths, EOS=0):
    // per-sequence count + id sum pins both the layout AND the
    // within-sequence contents cross-engine
    "q_pack_ids" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents").filter(F.col("text").isNotNull)
      val ids = F.transform(
        F.filter(F.split(F.col("text"), "\\s+"), w => F.length(w) > 0),
        w => F.length(w).cast("int"))
      graft.pipeline.Packing.packTokenIds(
          docs, "doc_id", ids, seqLen = 128L, eosId = 0)
        .select(F.col("seq_id"),
          F.size(F.col("ids")).cast("long").as("n_tokens"),
          F.aggregate(F.col("ids"), F.lit(0L),
            (acc, x) => acc + x.cast("long")).as("id_sum"))
        .orderBy("seq_id")
    }),

    // exact duplicated-substring spans (Lee et al. 2021 style): every
    // 8-token gram occurring >= 2x in the corpus marks its span;
    // overlapping/adjacent marks merge into maximal spans
    "q_dedup_substring" -> ((s: SparkSession, dir: String) => {
      graft.pipeline.Dedup.duplicateSpans(
          t(s, dir, "documents"), "doc_id", "text", k = 8)
        .orderBy("doc_id", "span_start")
    }),

    // arbitrary-length substring dedup at a suffix-array-style floor
    // (k = 24 tokens, far above the single-gram size): full-copy
    // plants (doc_id % 13) guarantee shared spans crossing many gram
    // windows; detection runs the gram-size ESCALATION path (seed 6 ->
    // 12 -> 24 — only the seed round touches the whole corpus), which
    // is output-identical to the direct k = 24 probe
    "q_dedup_spans_long" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents")
        .filter(F.col("text").isNotNull).select("doc_id", "text")
      val planted = docs.filter(F.col("doc_id") % 13 === 0)
        .select((F.col("doc_id") + 200000L).as("doc_id"), F.col("text"))
      graft.pipeline.Dedup.duplicateSpansEscalated(
          docs.unionAll(planted), "doc_id", "text", k = 24, seedK = 6)
        .orderBy("doc_id", "span_start")
    }),

    // incremental substring dedup: fresh batch (doc_id % 3 == 0)
    // checked against a persisted gram index of the rest — history is
    // never re-shingled; bloom-pruned probe + exact semi-join verify
    "q_dedup_incremental_substring" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents")
      val hist = docs.filter(F.col("doc_id") % 3 =!= 0)
      val fresh = docs.filter(F.col("doc_id") % 3 === 0)
      val path = System.getProperty("java.io.tmpdir") + "/graft_q_gramidx"
      graft.pipeline.Dedup.buildGramIndex(hist, "text", k = 8)
        .write.mode("overwrite").parquet(path)
      graft.pipeline.Dedup.incrementalDuplicateSpans(
          fresh, s.read.parquet(path), "doc_id", "text", k = 8)
        .orderBy("doc_id", "span_start")
    }),

    // paragraph-level exact dedup (Dolma granularity): documents are
    // paragraph-ified deterministically (3-token chunks joined by \n —
    // the small testdata vocabulary guarantees real repeats), then
    // every repeated paragraph keeps only its globally first copy
    "q_dedup_paragraph" -> ((s: SparkSession, dir: String) => {
      val toks = F.filter(F.split(F.col("text"), "\\s+"),
        (tk: Column) => F.length(tk) > 0)
      val withToks = t(s, dir, "documents")
        .filter(F.col("text").isNotNull)
        .select(F.col("doc_id"), toks.as("__toks"))
        .filter(F.size(F.col("__toks")) >= 1)
      val nChunks = F.ceil(F.size(F.col("__toks")).cast("double") / F.lit(3.0))
        .cast("int")
      val para = withToks.select(F.col("doc_id"),
        F.array_join(F.transform(F.sequence(F.lit(0), nChunks - 1),
          i => F.array_join(F.slice(F.col("__toks"), i * 3 + 1, F.lit(3)), " ")),
          "\n").as("text"))
      graft.pipeline.Dedup.dedupParagraphs(para, "doc_id", "text")
        .select(F.col("doc_id"), F.col("text"), F.col("paras_removed"))
        .orderBy("doc_id")
    }),

    // sentence segmentation: plant sentences by chunking punct-free
    // tokens 5-at-a-time joined with ". " — segment count is then
    // exactly ceil(ntoks/5), SQL-derivable; rejoining the segments
    // with single spaces must reproduce the constructed text
    "q_sentences" -> ((s: SparkSession, dir: String) => {
      val clean = F.regexp_replace(F.col("text"), "[.!?]", "")
      val toks = F.filter(F.split(clean, "\\s+"),
        (tk: Column) => F.length(tk) > 0)
      val base = t(s, dir, "documents")
        .filter(F.col("text").isNotNull)
        .select(F.col("doc_id"), toks.as("__toks"))
        .filter(F.size(F.col("__toks")) >= 1)
      val nChunks = F.ceil(F.size(F.col("__toks")).cast("double") / F.lit(5.0))
        .cast("int")
      val constructed = base.select(F.col("doc_id"),
        F.array_join(F.transform(F.sequence(F.lit(0), nChunks - 1),
          i => F.array_join(F.slice(F.col("__toks"), i * 5 + 1, F.lit(5)), " ")),
          ". ").as("__t"))
      constructed.select(F.col("doc_id"),
          graft.pipeline.TextFunctions.split_sentences(F.col("__t")).as("__s"),
          F.col("__t"))
        .select(F.col("doc_id"),
          F.size(F.col("__s")).cast("long").as("n_sentences"),
          (F.array_join(F.col("__s"), " ") === F.col("__t")).as("rejoin_ok"))
        .orderBy("doc_id")
    }),

    // PCA whitening: whitened coordinates must come out decorrelated
    // with unit variance over the fitting corpus — an invariant of
    // the transform itself, computed exactly in Spark and pinned as
    // booleans (eigen-noise tolerance 1e-3); count exact
    "q_embed_whiten" -> ((s: SparkSession, dir: String) => {
      val emb = t(s, dir, "embeddings").filter(F.col("embedding").isNotNull)
      val model = graft.pipeline.Embeddings.fitPca(emb, F.col("embedding"), 4)
      val w = emb.select(graft.pipeline.Embeddings
          .pcaWhiten(F.col("embedding"), model).as("__w"))
        .filter(F.col("__w").isNotNull)
      val dims = 0 until 4
      val aggs =
        F.count(F.lit(1)).as("n") +:
        (dims.map(j => F.avg(F.element_at(F.col("__w"), j + 1)).as(s"m$j")) ++
         dims.map(j => F.avg(F.pow(F.element_at(F.col("__w"), j + 1), 2)).as(s"s$j")) ++
         Seq(F.avg(F.element_at(F.col("__w"), 1) * F.element_at(F.col("__w"), 2))
           .as("c01")))
      w.agg(aggs.head, aggs.tail: _*)
        .select(F.col("n").as("n_vectors"),
          dims.map(j => (F.abs(F.col(s"m$j")) < 0.001).as(s"__z$j"))
            .reduce(_ && _).as("means_zero"),
          dims.map(j => (F.abs(F.col(s"s$j") - F.col(s"m$j") * F.col(s"m$j") - 1.0) < 0.001)
            .as(s"__v$j")).reduce(_ && _).as("unit_variance"),
          (F.abs(F.col("c01")) < 0.001).as("decorrelated"))
    }),

    // exact edit-distance-1 key join: every doc's md5 key gets a
    // planted first-char-'z' variant (md5 hex never contains 'z', so
    // the distance is exactly 1, and two distinct md5s within one
    // edit of each other is ~n²/16³¹ — never) — a full-row oracle
    // from id arithmetic
    "q_edit_one" -> ((s: SparkSession, dir: String) => {
      val keys = t(s, dir, "documents").select(F.col("doc_id"),
        F.md5(F.col("doc_id").cast("string")).as("k"))
      val variants = keys.select(
        (F.col("doc_id") + 1000000L).as("doc_id"),
        F.concat(F.lit("z"), F.substring(F.col("k"), 2, 100)).as("k"))
      graft.pipeline.Dedup.editOnePairs(
          keys.unionByName(variants), "doc_id", "k")
        .orderBy("id_a")
    }),

    // general edit-distance-<= k self-join (PassJoin segments + banded
    // verify): every doc's md5 key gets a TWO-substitution variant
    // ('z' at 0, 'y' at 10 — neither occurs in md5 hex, so distance
    // is exactly 2; accidental cross-pairs within distance 2 are
    // ~n²/16^30) — full-row oracle from id arithmetic
    "q_edit_k" -> ((s: SparkSession, dir: String) => {
      val keys = t(s, dir, "documents").select(F.col("doc_id"),
        F.md5(F.col("doc_id").cast("string")).as("k"))
      val variants = keys.select(
        (F.col("doc_id") + 1000000L).as("doc_id"),
        F.concat(F.lit("z"), F.substring(F.col("k"), 2, 9),
          F.lit("y"), F.substring(F.col("k"), 12, 100)).as("k"))
      graft.pipeline.Dedup.editKPairs(
          keys.unionByName(variants), "doc_id", "k", k = 2)
        .orderBy("id_a")
    }),

    // nightly form: the 2-edit variants probed against a persisted
    // PassJoin segment index of the md5 keys — same planted argument
    "q_edit_k_incremental" -> ((s: SparkSession, dir: String) => {
      val keys = t(s, dir, "documents").select(F.col("doc_id"),
        F.md5(F.col("doc_id").cast("string")).as("k"))
      val variants = keys.select(
        (F.col("doc_id") + 1000000L).as("doc_id"),
        F.concat(F.lit("z"), F.substring(F.col("k"), 2, 9),
          F.lit("y"), F.substring(F.col("k"), 12, 100)).as("k"))
      val path = System.getProperty("java.io.tmpdir") + "/graft_q_editkidx"
      graft.pipeline.Dedup.buildEditKIndex(keys, "doc_id", "k", k = 2)
        .write.mode("overwrite").parquet(path)
      graft.pipeline.Dedup.incrementalEditKPairs(
          s.read.parquet(path), variants, "doc_id", "k", k = 2)
        .orderBy("id_new")
    }),

    // incremental edit-1 matching vs a persisted deletion-hash index
    // (nightly shape): history = md5 keys, batch = the 'z' variants —
    // same planted argument as q_edit_one, full-row from id arithmetic
    "q_edit_one_incremental" -> ((s: SparkSession, dir: String) => {
      val keys = t(s, dir, "documents").select(F.col("doc_id"),
        F.md5(F.col("doc_id").cast("string")).as("k"))
      val variants = keys.select(
        (F.col("doc_id") + 1000000L).as("doc_id"),
        F.concat(F.lit("z"), F.substring(F.col("k"), 2, 100)).as("k"))
      val path = System.getProperty("java.io.tmpdir") + "/graft_q_editidx"
      graft.pipeline.Dedup.buildEditOneIndex(keys, "doc_id", "k")
        .write.mode("overwrite").parquet(path)
      graft.pipeline.Dedup.incrementalEditOnePairs(
          s.read.parquet(path), variants, "doc_id", "k")
        .orderBy("id_new")
    }),

    // leakage-free train/val/test: near-duplicate clusters must land
    // wholly in one split. Same pair geometry as q_dedup_clusters, so
    // the oracle reuses its recursive-CTE components and replays the
    // md5-range assignment off the cluster representative — full rows
    "q_split_leakfree" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents")
      val pairs = graft.pipeline.Dedup.nearDuplicatePairs(
        docs, "doc_id", "text", shingleSize = 5, threshold = 0.8,
        bands = 16, rowsPerBand = 8)
      graft.pipeline.Dedup.leakFreeSplits(
          docs.select("doc_id"), "doc_id", pairs,
          Seq(("train", 0.9), ("val", 0.05), ("test", 0.05)))
        .select("doc_id", "split")
        .orderBy("doc_id")
    }),

    // dataset canaries: plant release-keyed provenance tokens on the
    // md5-rule 10% of documents, scan them back, verify ownership —
    // every stage is deterministic id arithmetic, so the oracle
    // replays plant+scan+verify end to end without running any of it
    "q_canary" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val planted = graft.pipeline.Canary.plant(
        docs, "doc_id", "text", "r9", fraction = 0.1)
      val scanned = graft.pipeline.Canary.scan(planted, "doc_id", "text")
      graft.pipeline.Canary.verify(
          scanned, "r9", docs.select("doc_id"), "doc_id")
        .select("doc_id", "canary", "source_id")
        .orderBy("doc_id")
    }),

    // nightly-delta D4: materialize the D4 state (frozen IVF centroids
    // + cell-partitioned survivor scores) over the natural embeddings,
    // then ingest planted exact copies as the incremental batch —
    // copies co-cluster with their originals under the frozen
    // assignment and lose the SemDeDup tie (lower id keeps), so the
    // survivor set stays exactly the naturals; the global prune count
    // is ceil(0.7 * n) and incremental == frozen-assignment rebuild is
    // pinned as a set-equality boolean (the q_d4_pipeline oracle
    // pattern: counts + rule booleans, never survivor id sums)
    "q_d4_incremental" -> ((s: SparkSession, dir: String) => {
      val emb = t(s, dir, "embeddings").select(F.col("vec_id"), F.col("embedding"))
      val copies = emb.filter(F.col("vec_id") < 50)
        .select((F.col("vec_id") + 100000L).as("vec_id"), F.col("embedding"))
      val path = System.getProperty("java.io.tmpdir") + "/graft_q_d4_inc"
      // stale-state hazard: the index append is not idempotent across
      // verify re-runs — always start from a clean directory
      val root = new org.apache.hadoop.fs.Path(path)
      val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(root)) fs.delete(root, true)
      graft.pipeline.Diversity.d4Materialize(
        emb, "vec_id", "embedding", path, keepFraction = 0.7,
        nClusters = 16, dedupThreshold = 0.99)
      val kept = graft.pipeline.Diversity.d4Incremental(
          s, path, copies, "vec_id", "embedding", keepFraction = 0.7,
          dedupThreshold = 0.99)
        .localCheckpoint(eager = false)
      val scored = s.read.parquet(s"$path/scored")
        .select(F.col("vec_id"), F.col("proto_score"))
        .localCheckpoint(eager = false)
      val nInput = emb.count() + copies.count()
      val n1 = scored.count()
      val survIds = scored.select("vec_id")
      val keptNatural =
        survIds.exceptAll(emb.select("vec_id")).isEmpty &&
        emb.select("vec_id").exceptAll(survIds).isEmpty
      val n2 = kept.count()
      val pruneOk = scored
        .join(kept.withColumn("__k", F.lit(1)), Seq("vec_id"), "left")
        .agg(
          F.max(F.when(F.col("__k").isNotNull,
            F.struct(F.col("proto_score"), F.col("vec_id")))).as("__mx"),
          F.min(F.when(F.col("__k").isNull,
            F.struct(F.col("proto_score"), F.col("vec_id")))).as("__mn"))
        .select(F.coalesce(F.col("__mx") < F.col("__mn"), F.lit(true)))
        .head().getBoolean(0)
      val rebuilt = graft.pipeline.Diversity.d4RebuildFrozen(
        s, s"$path/index", emb.union(copies), "vec_id", "embedding",
        keepFraction = 0.7, dedupThreshold = 0.99).keptIds
      val matchesRebuild = kept.exceptAll(rebuilt).isEmpty &&
        rebuilt.exceptAll(kept).isEmpty
      s.range(1).select(
        F.lit(nInput).as("n_input"),
        F.lit(n1).as("n_semdedup"),
        F.lit(n2).as("n_pruned"),
        F.lit(keptNatural).as("semdedup_kept_natural"),
        F.lit(pruneOk).as("prune_rule_ok"),
        F.lit(matchesRebuild).as("matches_rebuild"))
    }),

    // contamination AUDIT TRAIL: which benchmark item each document
    // shares >= 1 distinct 8-gram with, and how many. Hash-join counts
    // equal text-join counts absent 64-bit collisions (~n²/2^64), so
    // the oracle replays the distinct-gram join on gram TEXT
    // cross-split leakage matrix (eval hygiene): an md5-rule 80/20
    // split over the corpus, then per-pair shared 8-gram contents and
    // leaked-document counts on each side — the whole matrix replays
    // exactly in SQL (gram TEXT join, the contamination precedent)
    "q_split_leakage" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents").filter(F.col("text").isNotNull)
        .withColumn("sp",
          F.when(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
            < "cccd", "train").otherwise("val"))
      graft.pipeline.Decontaminate.splitLeakageMatrix(
          docs, "doc_id", "text", "sp", n = 8)
        .orderBy("split_a", "split_b")
    }),

    // the NIGHTLY form of the leakage audit: index the even half once
    // (per-split gram-hash signatures), deliver the odd half as a
    // delta — only the delta is tokenized, and the matrix recomputed
    // from the 8-byte-hash index must equal the full-text recompute on
    // the grown corpus (q_split_leakage's oracle, verbatim)
    "q_split_leakage_incremental" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents").filter(F.col("text").isNotNull)
        .withColumn("sp",
          F.when(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
            < "cccd", "train").otherwise("val"))
      val path = System.getProperty("java.io.tmpdir") + "/graft_q_leak_idx"
      graft.pipeline.Dedup.saveSignatureIndex(
        graft.pipeline.Decontaminate.buildLeakageIndex(
          docs.filter(F.col("doc_id") % 2 === 0), "doc_id", "text", "sp",
          n = 8),
        path) // overwrite: a prior run's appended deltas start fresh
      graft.pipeline.Decontaminate.incrementalSplitLeakage(s, path,
          docs.filter(F.col("doc_id") % 2 =!= 0), "doc_id", "text", "sp",
          n = 8)
        .orderBy("split_a", "split_b")
    }),

    // the STATEFUL (delta-bounded) leakage audit: init on the even
    // half, one nightly delta with the odd half — maintained
    // memberships + doc-leak state + per-batch shared deltas must fold
    // to exactly the full-text matrix (q_split_leakage's oracle,
    // verbatim). Nothing corpus-sized shuffles in the update.
    "q_split_leakage_state" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents").filter(F.col("text").isNotNull)
        .withColumn("sp",
          F.when(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
            < "cccd", "train").otherwise("val"))
      val path = System.getProperty("java.io.tmpdir") + "/graft_q_leak_state"
      graft.pipeline.Decontaminate.initLeakageState(s, path,
        docs.filter(F.col("doc_id") % 2 === 0), "doc_id", "text", "sp")
      graft.pipeline.Decontaminate.updateLeakageState(s, path,
          docs.filter(F.col("doc_id") % 2 =!= 0), "doc_id", "text", "sp",
          batchId = 0L)
        .orderBy("split_a", "split_b")
    }),

    // leakage-state small-file compaction: two nightly partitions fold
    // into the base layer (matrix-invariant — distinct row sets +
    // summable shared deltas), then a POST-fold night with a fresh id
    // still lands exactly the full-text matrix (q_split_leakage's
    // oracle, verbatim)
    "q_leak_compact" -> ((s: SparkSession, dir: String) => {
      val DC = graft.pipeline.Decontaminate
      val docs = t(s, dir, "documents").filter(F.col("text").isNotNull)
        .withColumn("sp",
          F.when(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
            < "cccd", "train").otherwise("val"))
      val path = System.getProperty("java.io.tmpdir") + "/graft_q_leak_cp"
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      DC.initLeakageState(s, path,
        docs.filter(F.col("doc_id") % 2 === 0), "doc_id", "text", "sp")
      DC.updateLeakageState(s, path,
        docs.filter(F.col("doc_id") % 4 === 1), "doc_id", "text", "sp",
        batchId = 0L)
      val maxFolded = DC.compactLeakageState(s, path)
      DC.updateLeakageState(s, path,
          docs.filter(F.col("doc_id") % 4 === 3), "doc_id", "text", "sp",
          batchId = maxFolded + 1L)
        .orderBy("split_a", "split_b")
    }),

    "q_decontaminate_sources" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents")
        .filter(F.col("text").isNotNull).select("doc_id", "text")
      val bench = docs.filter(F.col("doc_id") % 17 === 0)
        .select(F.col("doc_id").as("bench_id"), F.col("text"))
      graft.pipeline.Decontaminate.contaminationSources(
          docs, "doc_id", "text", bench, "bench_id", "text", n = 8)
        .orderBy("doc_id", "bench_id")
    }),

    // per-host politeness from robots.txt: planted bodies carry
    // agent-specific and wildcard Crawl-delay groups plus Sitemap
    // lines; the schedule spaces each host's slots by ITS delay. Every
    // field replays from host arithmetic — agent-group precedence,
    // default fallback, slot windows, delay products
    "q_crawl_delay" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents").select(F.col("doc_id"))
      val urls = docs.select(
        F.concat(F.lit("https://host"),
          F.pmod(F.col("doc_id"), F.lit(20)).cast("string"),
          F.lit(".example.com/page"), F.col("doc_id").cast("string")).as("url"))
      val h = F.col("h")
      val robots = docs
        .select(F.pmod(F.col("doc_id"), F.lit(20)).as("h")).distinct()
        .select(
          F.concat(F.lit("host"), h.cast("string"), F.lit(".example.com"))
            .as("host"),
          F.concat(
            F.when(h % 7 === 0,
              F.lit("User-agent: graftbot\nCrawl-delay: 9\n\n"))
              .otherwise(F.lit("")),
            F.lit("User-agent: *\nDisallow: /private\n"),
            F.when(h % 4 === 0, F.lit(""))
              .otherwise(F.concat(F.lit("Crawl-delay: "),
                (h % 5 + 1).cast("string"), F.lit("\n"))),
            F.lit("Sitemap: https://s/a.xml\nSitemap: https://s/b.xml\n"))
            .as("txt"))
      val delays = graft.sources.Robots.delayTable(
        robots, "host", "txt", "graftbot", defaultDelayMs = 700L)
      graft.pipeline.Urls.crawlScheduleWithDelays(
          urls, "url", delays, defaultDelayMs = 700L,
          startMs = 1700000000000L)
        .join(F.broadcast(delays.select(F.col("host"), F.col("n_sitemaps"))),
          "host")
        .select(F.col("url"), F.col("host"), F.col("slot"),
          F.col("delay_ms"), F.col("fetch_at_ms"),
          F.col("n_sitemaps").cast("long").as("n_sitemaps"))
        .orderBy("url")
    }),

    // GROWING-corpus leak-free splits: history carries md5-rule splits
    // (an immutable input column); the fresh batch = exact COPIES of
    // the %3==0 slice (must inherit — or quarantine when the copy
    // bridges differently-assigned history near-dups) + NOVEL md5-text
    // docs (no match → md5 rule on their own cluster rep). The oracle
    // replays inheritance, bridge detection, and the fallback from the
    // recursive shingle-Jaccard machinery — full rows
    "q_split_incremental" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents").filter(F.col("text").isNotNull)
      val splits = Seq(("train", 0.5), ("val", 0.25), ("test", 0.25))
      val hist = graft.pipeline.Sampling.splitByHash(
        docs.select("doc_id", "text"), F.col("doc_id"), splits)
      val idxPath = System.getProperty("java.io.tmpdir") + "/graft_q_splitinc_idx"
      graft.pipeline.Dedup.saveSignatureIndex(
        graft.pipeline.Dedup.buildSignatureIndex(hist, "doc_id", "text", 5, 16, 8),
        idxPath)
      val copies = docs.filter(F.col("doc_id") % 3 === 0)
        .select((F.col("doc_id") + 500000L).as("doc_id"), F.col("text"))
      val novel = docs.filter(F.col("doc_id") % 3 === 1)
        .select((F.col("doc_id") + 600000L).as("doc_id"),
          F.md5(F.col("doc_id").cast("string")).as("text"))
      val fresh = copies.unionByName(novel)
      graft.pipeline.Dedup.incrementalLeakFreeSplits(
          fresh, "doc_id", "text",
          graft.pipeline.Dedup.loadSignatureIndex(s, idxPath), hist,
          "doc_id", "text", "split", splits,
          shingleSize = 5, threshold = 0.8, bands = 16, rowsPerBand = 8)
        .select("doc_id", "split")
        .orderBy("doc_id")
    }),

    // NFC canonicalization checked DIRECTLY cross-engine (DuckDB ships
    // nfc_normalize): plant decomposed combining sequences on every
    // doc; both engines hash the whole normalized string — composed
    // length shrinks by exactly the planted combining marks
    "q_unicode_nfc" -> ((s: SparkSession, dir: String) => {
      // " e+U0301 A+U030A o+U0302" — three decomposed pairs that
      // compose to single code points under NFC
      val planted = F.concat(F.col("text"),
        F.lit(" e\u0301 A\u030A o\u0302"))
      t(s, dir, "documents").filter(F.col("text").isNotNull)
        .select(F.col("doc_id"),
          graft.pipeline.TextFunctions.nfcNormalize(planted).as("__n"))
        .select(F.col("doc_id"), F.col("__n").as("nfc_text"),
          F.length(F.col("__n")).cast("long").as("nfc_chars"))
        .orderBy("doc_id")
    }),

    // unicode-script composition: plant a mixed-script suffix on every
    // 5th doc; all counts are regex quantities both engines compute
    // over the SAME planted string (the q_encoding_damage pattern),
    // dominant/mixed replay as CASE/greatest arithmetic — full rows
    "q_script_mix" -> ((s: SparkSession, dir: String) => {
      // suffix = " Привет 世界 مرحبا 42" (6 cyrillic + 2 cjk +
      // 5 arabic + 2 digit chars), spelled \uXXXX per the repo rule;
      // the oracle ADDS those constants to base-text regex counts
      // instead of reproducing the unicode literal in SQL
      val planted = F.when(F.col("doc_id") % 5 === 0,
        F.concat(F.col("text"),
          F.lit(" \u041F\u0440\u0438\u0432\u0435\u0442" +
            " \u4E16\u754C \u0645\u0631\u062D\u0628\u0627 42")))
        .otherwise(F.col("text"))
      t(s, dir, "documents").filter(F.col("text").isNotNull)
        .select(F.col("doc_id"),
          graft.pipeline.TextFunctions.scriptProfile(planted).as("__p"))
        .select(F.col("doc_id"),
          F.col("__p.latin").as("latin"),
          F.col("__p.cyrillic").as("cyrillic"),
          F.col("__p.arabic").as("arabic"),
          F.col("__p.cjk").as("cjk"),
          F.col("__p.digit").as("digits"),
          F.col("__p.dominant").as("dominant"),
          F.col("__p.mixed").as("mixed"))
        .orderBy("doc_id")
    }),

    // sitemap parsing: XML planted from doc_id (incl. an &amp; entity
    // the parser must decode — a stub can't pass the string match);
    // the oracle derives every field from doc_id arithmetic without
    // parsing. One urlset doc per document row + one sitemapindex
    // child count — full rows
    "q_sitemap" -> ((s: SparkSession, dir: String) => {
      val day = F.lpad((F.col("doc_id") % 28 + 1).cast("string"), 2, "0")
      val xml = F.concat(
        F.lit("<?xml version=\"1.0\"?>\n<urlset><url>\n  <loc>https://host"),
        (F.col("doc_id") % 20).cast("string"),
        F.lit(".example.com/page"), F.col("doc_id").cast("string"),
        F.lit("?a=1&amp;b=2</loc>\n  <lastmod>2026-01-"), day,
        F.lit("</lastmod>\n  <changefreq>daily</changefreq>\n  <priority>0."),
        (F.col("doc_id") % 10).cast("string"),
        F.lit("</priority>\n</url><url><location>decoy</location>" +
          "<loc>https://extra/page"),
        F.col("doc_id").cast("string"),
        F.lit("b</loc></url></urlset>"))
      val idx = F.concat(
        F.lit("<sitemapindex><sitemap><loc>https://s/"),
        F.col("doc_id").cast("string"),
        F.lit("/a.xml</loc></sitemap><sitemap><loc>https://s/"),
        F.col("doc_id").cast("string"),
        F.lit("/b.xml</loc></sitemap></sitemapindex>"))
      t(s, dir, "documents")
        .select(F.col("doc_id"),
          graft.pipeline.Urls.sitemapUrls(xml).as("__u"),
          F.size(graft.pipeline.Urls.sitemapChildren(idx)).cast("long")
            .as("n_children"))
        .select(F.col("doc_id"), F.posexplode(F.col("__u")),
          F.col("n_children"))
        .select(F.col("doc_id"), (F.col("pos") + 1).cast("long").as("entry"),
          F.col("col.loc").as("loc"), F.col("col.lastmod").as("lastmod"),
          F.col("col.changefreq").as("changefreq"),
          F.col("col.priority").as("priority"), F.col("n_children"))
        .orderBy("doc_id", "entry")
    }),

    // global dense id assignment without a single-partition window
    // (two-phase cumsum) — full-row oracle against row_number
    "q_assign_ids" -> ((s: SparkSession, dir: String) => {
      graft.pipeline.Sampling.withSequentialIds(
          t(s, dir, "documents").select(F.col("doc_id")), F.col("doc_id"))
        .orderBy("doc_id")
    }),

    // encoding-damage screen: plant mojibake + replacement + control
    // chars on every 10th doc; all three counts are regex quantities
    // both engines compute over the SAME planted string — full-row
    "q_encoding_damage" -> ((s: SparkSession, dir: String) => {
      val planted = F.when(F.col("doc_id") % 10 === 0,
        F.concat(F.col("text"), F.lit("\u00C3\u00A9\uFFFD\u0007")))
        .otherwise(F.col("text"))
      t(s, dir, "documents").filter(F.col("text").isNotNull)
        .select(F.col("doc_id"),
          graft.pipeline.TextFunctions.encodingDamage(planted).as("__d"))
        .select(F.col("doc_id"),
          F.col("__d.replacement_chars").cast("long").as("replacement_chars"),
          F.col("__d.control_chars").cast("long").as("control_chars"),
          F.col("__d.mojibake").cast("long").as("mojibake"),
          F.col("__d.is_clean").as("is_clean"))
        .orderBy("doc_id")
    }),

    // readability scoring: word/sentence/syllable-proxy counts are
    // exact regex quantities; both scores are two divisions on those
    // integers — 4dp-rounded like every cross-engine float sum
    "q_readability" -> ((s: SparkSession, dir: String) => {
      val tf = graft.pipeline.TextFunctions
      t(s, dir, "documents")
        .filter(F.col("text").isNotNull)
        .select(F.col("doc_id"),
          tf.readabilityCounts(F.col("text")).as("__c"),
          F.round(tf.fleschReadingEase(F.col("text")), 4).as("flesch"),
          F.round(tf.fleschKincaidGrade(F.col("text")), 4).as("fk_grade"))
        .select(F.col("doc_id"),
          F.col("__c.words").cast("long").as("words"),
          F.col("__c.sentences").cast("long").as("sentences"),
          F.col("__c.syllables").cast("long").as("syllables"),
          F.col("flesch"), F.col("fk_grade"))
        .orderBy("doc_id")
    }),

    // sentence-aware chunking over the same planted 5-token sentences:
    // maxWords = 15 packs exactly 3 sentences per chunk (a shorter
    // final sentence still can't admit a 4th — 15 is already full),
    // so chunk counts and word totals replay exactly in SQL
    "q_chunk_sentences" -> ((s: SparkSession, dir: String) => {
      val clean = F.regexp_replace(F.col("text"), "[.!?]", "")
      val toks = F.filter(F.split(clean, "\\s+"),
        (tk: Column) => F.length(tk) > 0)
      val base = t(s, dir, "documents")
        .filter(F.col("text").isNotNull)
        .select(F.col("doc_id"), toks.as("__toks"))
        .filter(F.size(F.col("__toks")) >= 1)
      val nChunks = F.ceil(F.size(F.col("__toks")).cast("double") / F.lit(5.0))
        .cast("int")
      val constructed = base.select(F.col("doc_id"),
        F.array_join(F.transform(F.sequence(F.lit(0), nChunks - 1),
          i => F.array_join(F.slice(F.col("__toks"), i * 5 + 1, F.lit(5)), " ")),
          ". ").as("__t"))
      graft.pipeline.Scrub.chunkSentences(constructed, F.col("__t"), 15)
        .groupBy(F.col("doc_id"))
        .agg(
          F.count(F.lit(1)).as("n_chunks"),
          F.sum(F.size(F.filter(F.split(F.col("chunk_text"), "\\s+"),
            (w: Column) => F.length(w) > 0)).cast("long")).as("words_total"),
          (F.array_join(F.transform(
            F.sort_array(F.collect_list(F.struct(F.col("chunk_idx"), F.col("chunk_text")))),
            c => c.getField("chunk_text")), " ") === F.first(F.col("__t")))
            .as("rejoin_ok"))
        .orderBy("doc_id")
    }),

    // within-document duplicate-line removal: 3-token lines (the
    // paragraph-ify construction — repeats are real at this vocab);
    // kept-line count = distinct-line count, exact cross-engine, and
    // the kept order must be the first-occurrence subsequence
    "q_dedup_lines" -> ((s: SparkSession, dir: String) => {
      val toks = F.filter(F.split(F.col("text"), "\\s+"),
        (tk: Column) => F.length(tk) > 0)
      val base = t(s, dir, "documents")
        .filter(F.col("text").isNotNull)
        .select(F.col("doc_id"), toks.as("__toks"))
        .filter(F.size(F.col("__toks")) >= 1)
      val nChunks = F.ceil(F.size(F.col("__toks")).cast("double") / F.lit(3.0))
        .cast("int")
      val para = base.select(F.col("doc_id"),
        F.array_join(F.transform(F.sequence(F.lit(0), nChunks - 1),
          i => F.array_join(F.slice(F.col("__toks"), i * 3 + 1, F.lit(3)), " ")),
          "\n").as("__t"))
      val refU = F.udf((t: String) => {
        val seen = new java.util.LinkedHashSet[String]()
        t.split("\n", -1).foreach(seen.add)
        String.join("\n", seen)
      })
      para.select(F.col("doc_id"),
          F.split(F.col("__t"), "\n").as("__lines"),
          graft.pipeline.TextFunctions.dedupLines(F.col("__t")).as("__d"),
          refU(F.col("__t")).as("__ref"))
        .select(F.col("doc_id"),
          F.size(F.col("__lines")).cast("long").as("n_lines"),
          F.size(F.split(F.col("__d"), "\n")).cast("long").as("n_kept"),
          (F.col("__d") === F.col("__ref")).as("order_ok"))
        .orderBy("doc_id")
    }),

    // duplicated-substring removal keeping the globally first copy:
    // per-doc removed-token counts for every rewritten document
    "q_dedup_substring_strip" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents")
      val nTok = F.size(F.filter(F.split(F.col("text"), "\\s+"),
        (x: org.apache.spark.sql.Column) => F.length(x) > 0))
      val before = docs.select(F.col("doc_id"), nTok.cast("long").as("__nb"))
      val after = graft.pipeline.Dedup
        .stripDuplicateSpans(docs, "doc_id", "text", k = 8)
        .select(F.col("doc_id"), nTok.cast("long").as("__na"))
      before.join(after, "doc_id")
        .select(F.col("doc_id"), (F.col("__nb") - F.col("__na")).as("removed"))
        .filter(F.col("removed") > 0)
        .orderBy("doc_id")
    }),

    // embedding-cosine near-dup: the corpus augmented with exact copies
    // of vectors 0-49 (shifted ids). Copies collide in every LSH table
    // (identical signatures), so recall is exactly 1.0 and the verified
    // pair list is deterministic; no natural pair reaches cos 0.99
    // (corpus max is ~0.6), so the oracle is precisely the copy pairs.
    "q_dedup_embed" -> ((s: SparkSession, dir: String) => {
      val emb = t(s, dir, "embeddings")
      val copies = emb.filter(F.col("vec_id") < 50)
        .select((F.col("vec_id") + 100000L).as("vec_id"), F.col("embedding"))
      val corpus = emb.select(F.col("vec_id"), F.col("embedding")).union(copies)
      graft.pipeline.Dedup
        .embeddingNearDuplicatePairs(corpus, "vec_id", "embedding", 0.99)
        .select(F.col("id_a"), F.col("id_b"), (F.col("cos") >= 0.999).as("cos_ok"))
        .orderBy("id_a")
    }),

    // SemDeDup semantic dedup: k-means cells + within-cell cosine,
    // keep the least-centroid-similar member per duplicate group.
    // Planted exact copies make the survivor set clustering-independent
    // (identical vectors always co-cluster; ties keep the lower id;
    // no natural pair reaches cos 0.99 in this testdata), so the
    // oracle pins the exact surviving ids
    "q_dedup_semantic" -> ((s: SparkSession, dir: String) => {
      val emb = t(s, dir, "embeddings")
      val copies = emb.filter(F.col("vec_id") < 50)
        .select((F.col("vec_id") + 100000L).as("vec_id"), F.col("embedding"))
      val corpus = emb.select(F.col("vec_id"), F.col("embedding")).union(copies)
      graft.pipeline.Dedup.semanticDeduplicate(
          corpus, "vec_id", "embedding", nClusters = 16, threshold = 0.99)
        .agg(F.count(F.lit(1)).as("kept"),
             F.sum(F.col("vec_id")).as("kept_id_sum"))
    }),

    // incremental SemDeDup: fresh exact copies probed against a
    // persisted partitioned-by-cell IVF index — copies probe their own
    // cell first, so the verified pair set is exactly the 50 copies
    "q_dedup_incremental_semantic" -> ((s: SparkSession, dir: String) => {
      val emb = t(s, dir, "embeddings").select(F.col("vec_id"), F.col("embedding"))
      val path = System.getProperty("java.io.tmpdir") + "/graft_q_ivfsem"
      graft.pipeline.Similarity
        .buildIvfIndex(emb, "vec_id", "embedding", nlist = 16).save(path)
      val index = graft.pipeline.Similarity.loadIvfIndex(s, path)
      val fresh = emb.filter(F.col("vec_id") < 50)
        .select((F.col("vec_id") + 100000L).as("vec_id"), F.col("embedding"))
      graft.pipeline.Dedup.incrementalSemanticDuplicates(
          fresh, index, "vec_id", "embedding", threshold = 0.99)
        .select(F.col("id_new"), F.col("id_old"),
          (F.col("cos") >= 0.999).as("cos_ok"))
        .orderBy("id_new")
    }),

    // incremental embedding dedup against a persisted signature index:
    // fresh batch = exact copies of history vectors 0-49 (shifted ids);
    // copies collide in every LSH table so recall is 1.0, no natural
    // pair reaches cos 0.99, and the verified pair set is exactly the
    // 50 copies (deduped from per-table collision emissions)
    "q_dedup_incremental_embed" -> ((s: SparkSession, dir: String) => {
      val emb = t(s, dir, "embeddings")
      val hist = emb.select(F.col("vec_id"), F.col("embedding"))
      val fresh = emb.filter(F.col("vec_id") < 50)
        .select((F.col("vec_id") + 100000L).as("vec_id"), F.col("embedding"))
      val index = graft.pipeline.Dedup
        .buildVectorSignatureIndex(hist, "vec_id", "embedding")
      graft.pipeline.Dedup
        .incrementalEmbeddingDuplicates(fresh, index, "vec_id", "embedding", 0.99)
        .select(F.col("id_new"), F.col("id_old"), (F.col("cos") >= 0.999).as("cos_ok"))
        .dropDuplicates("id_new", "id_old")
        .orderBy("id_new")
    }),

    // incremental EXACT dedup against a persisted content-hash index:
    // broadcast-bloom prune (no false negatives) + semi-join verify
    // must equal plain set membership on text
    "q_dedup_incremental_exact" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents")
      val hist = docs.filter(F.col("doc_id") % 3 =!= 0)
      val fresh = docs.filter(F.col("doc_id") % 3 === 0)
        .select(F.col("doc_id"), F.col("text"))
        .union(docs.filter(F.col("doc_id") % 3 =!= 0 && F.col("doc_id") % 7 === 0)
          .select((F.col("doc_id") + 1000000L).as("doc_id"), F.col("text")))
      val index = graft.pipeline.Dedup.buildContentHashIndex(hist, "text")
      graft.pipeline.Dedup
        .incrementalExactDuplicates(fresh, index, "doc_id", "text", 100000L, 0.01)
        .agg(F.count(F.lit(1)).as("dups"),
             F.coalesce(F.sum(F.col("doc_id")), F.lit(0L)).as("id_sum"))
    }),

    // canonical-document selection: one survivor per normalized-text
    // group, preferring longer then lower-id docs
    "q_dedup_keepbest" -> ((s: SparkSession, dir: String) => {
      val tf = graft.pipeline.TextFunctions
      val kept = graft.pipeline.Dedup.keepCanonical(
        t(s, dir, "documents"),
        tf.normalizeText(F.col("text")),
        Seq(F.col("n_chars").desc, F.col("doc_id").asc))
      kept.agg(
        F.count(F.lit(1)).as("kept"),
        F.sum(F.col("doc_id")).as("kept_id_sum"))
    }),

    // Gopher repetition rules over deterministically paragraph-ified
    // text (3-token lines, 2-line paragraphs): both engines see the
    // identical structure, stats are integer-counted with one double
    // division each, so values compare bit-exactly
    "q_gopher_repetition" -> ((s: SparkSession, dir: String) => {
      val toks = F.filter(F.split(F.col("text"), "\\s+"),
        (tk: Column) => F.length(tk) > 0)
      val withToks = t(s, dir, "documents")
        .filter(F.col("text").isNotNull)
        .select(F.col("doc_id"), toks.as("__toks"))
        .filter(F.size(F.col("__toks")) >= 1)
      val nLines = F.ceil(F.size(F.col("__toks")).cast("double") / F.lit(3.0))
        .cast("int")
      val linesArr = F.transform(F.sequence(F.lit(0), nLines - 1),
        i => F.array_join(F.slice(F.col("__toks"), i * 3 + 1, F.lit(3)), " "))
      val withLines = withToks.select(F.col("doc_id"), linesArr.as("__lines"))
      val nParas = F.ceil(F.size(F.col("__lines")).cast("double") / F.lit(2.0))
        .cast("int")
      val text2 = F.array_join(F.transform(F.sequence(F.lit(0), nParas - 1),
        j => F.array_join(F.slice(F.col("__lines"), j * 2 + 1, F.lit(2)), "\n")),
        "\n\n")
      withLines
        .select(F.col("doc_id"),
          graft.pipeline.GopherRules.repetitionStats(text2).as("rep"))
        .select(F.col("doc_id"), F.col("rep.lines"),
          F.col("rep.dup_line_frac"), F.col("rep.dup_line_char_frac"),
          F.col("rep.paras"),
          F.col("rep.dup_para_frac"), F.col("rep.dup_para_char_frac"),
          F.col("rep.top_gram_char_frac"), F.col("rep.dup_gram_char_frac"))
        .orderBy("doc_id")
    }),

    // Gopher structural quality stats over decorated text (bullet
    // prefix on doc_id%5, ellipsis suffix on doc_id%7 — both engines
    // build the identical string first)
    "q_gopher_quality" -> ((s: SparkSession, dir: String) => {
      val text2 = F.concat(
        F.when(F.col("doc_id") % 5 === 0, F.lit("- ")).otherwise(F.lit("")),
        F.col("text"),
        F.when(F.col("doc_id") % 7 === 0, F.lit(" ...")).otherwise(F.lit("")))
      t(s, dir, "documents")
        .filter(F.col("text").isNotNull)
        .select(F.col("doc_id"),
          graft.pipeline.GopherRules.qualityStats(text2).as("q"))
        .filter(F.col("q.words") >= 1)
        .select(F.col("doc_id"), F.col("q.words"), F.col("q.mean_word_len"),
          F.col("q.alpha_word_frac"), F.col("q.symbol_word_ratio"),
          F.col("q.bullet_line_frac"), F.col("q.ellipsis_line_frac"),
          F.col("q.stopword_hits"))
        .orderBy("doc_id")
    }),

    // deterministic + stratified sampling: md5-prefix predicate is
    // engine-portable, so the oracle reproduces the exact sample
    // PII scrubbing over the corpus with deterministically injected PII
    // (both engines build the same augmented text, then scrub/count)
    "q_scrub" -> ((s: SparkSession, dir: String) => {
      val scrub = graft.pipeline.Scrub
      val injected = F.concat(F.col("text"),
        F.when(F.col("doc_id") % 5 === 0,
            F.concat(F.lit(" contact user"), F.col("doc_id").cast("string"),
              F.lit("@example.com")))
          .when(F.col("doc_id") % 5 === 1, F.lit(" from 10.2.30.4"))
          .when(F.col("doc_id") % 5 === 2, F.lit(" call 555-867-5309"))
          .otherwise(F.lit("")))
      t(s, dir, "documents")
        .select(F.col("source"), scrub.piiCounts(injected).as("p"),
          F.length(scrub.scrubPii(injected)).cast("long").as("slen"))
        .groupBy(F.col("source"))
        .agg(F.count(F.lit(1)).as("docs"),
             F.sum(F.col("p.emails").cast("long")).as("emails"),
             F.sum(F.col("p.ips").cast("long")).as("ips"),
             F.sum(F.col("p.phones").cast("long")).as("phones"),
             F.sum(F.col("slen")).as("scrubbed_len"))
        .orderBy("source")
    }),

    // context-window chunking: 40-word chunks, 8-word overlap —
    // bounded explode, exact integer footprint per source
    "q_chunk" -> ((s: SparkSession, dir: String) => {
      graft.pipeline.Scrub
        .chunkWords(t(s, dir, "documents"), F.col("text"), 40, 8)
        .groupBy(F.col("source"))
        .agg(F.count(F.lit(1)).as("chunks"),
             F.sum(F.length(F.col("chunk_text")).cast("long")).as("chars"),
             F.sum(F.col("chunk_idx").cast("long")).as("idx_sum"),
             F.max(F.col("chunk_idx")).cast("long").as("max_idx"))
        .orderBy("source")
    }),

    // Gopher-style repetition filter: repeated-3-gram fraction per doc.
    // Counts are exact BIGINTs; the >0.3 threshold compares doubles the
    // oracle derives from the SAME integer inputs with the SAME IEEE
    // ops, so the flag is deterministic cross-engine
    "q_text_repetition" -> ((s: SparkSession, dir: String) => {
      val tf = graft.pipeline.TextFunctions
      val all = tf.allWordNgrams(F.col("text"), 3)
      t(s, dir, "documents")
        .select(F.col("source"),
          F.size(F.array_distinct(all)).cast("long").as("d"),
          F.size(all).cast("long").as("tt"),
          tf.repetitionScore(F.col("text"), 3).as("rep"))
        .groupBy(F.col("source"))
        .agg(F.count(F.lit(1)).as("docs"),
             F.sum(F.col("d")).as("distinct_grams"),
             F.sum(F.col("tt")).as("total_grams"),
             F.sum(F.when(F.col("rep") > 0.3, 1L).otherwise(0L)).as("high_rep"))
        .orderBy("source")
    }),

    // deterministic train/val/test split: md5-range assignment, fully
    // replicable in any engine with md5 (the oracle recomputes it)
    "q_split" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents")
      graft.pipeline.Sampling.splitByHash(docs, F.col("doc_id"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy(F.col("split"))
        .agg(F.count(F.lit(1)).as("cnt"), F.sum(F.col("doc_id")).as("id_sum"))
        .orderBy("split")
    }),

    // sequence packing: contiguous token-budget packs per source —
    // window prefix sum + integer division, exactly replicated in SQL
    "q_pack" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents")
      graft.pipeline.Packing
        .packSequences(docs, F.col("source"), F.col("doc_id"), F.col("n_chars"), 2000L)
        .groupBy(F.col("source"), F.col("pack_id"))
        .agg(F.count(F.lit(1)).as("docs_in_pack"),
             F.sum(F.col("n_chars")).as("tokens"))
        .orderBy("source", "pack_id")
    }),

    // benchmark decontamination: 5-gram overlap against an eval subset
    // (every 17th doc) — broadcast bench n-grams, corpus scanned once
    "q_decontaminate" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents")
      val bench = docs.filter(F.col("doc_id") % 17 === 0).select(F.col("text"))
      graft.pipeline.Decontaminate
        .contaminationFlags(docs, "doc_id", "text", bench, "text", n = 5)
        .agg(F.count(F.lit(1)).as("docs"),
             F.sum(F.when(F.col("contaminated"), 1L).otherwise(0L)).as("n_contaminated"),
             F.sum(F.col("overlap_ngrams")).as("overlap_total"))
    }),

    // semantic decontamination: benchmark = every 37th embedding row
    // verbatim, threshold 0.999 — exact copies are ALWAYS flagged
    // (identical vectors share the probe's first cell) and the
    // testdata has no natural pair near that cosine, so the flagged
    // set is exactly the planted subset, clustering-independent:
    // a full-row oracle from id arithmetic
    "q_decontaminate_semantic" -> ((s: SparkSession, dir: String) => {
      val emb = t(s, dir, "embeddings")
      // embedding IS NOT NULL on the planted predicate BOTH sides (the
      // oracle too): a NULL-embedding doc can never be flagged, so the
      // planted set must exclude it by construction
      val bench = emb.filter(F.col("vec_id") % 37 === 0 &&
        F.col("embedding").isNotNull).select(F.col("embedding"))
      graft.pipeline.Decontaminate.semanticContaminationFlags(
          emb, "vec_id", "embedding", bench, "embedding",
          threshold = 0.999, nlist = 8)
        .orderBy("vec_id")
    }),

    // persisted-index decontamination: save/load the corpus IVF index
    // and probe it — output-identical to the direct path for the
    // planted benchmark (shares its full-row oracle)
    "q_decontaminate_semantic_indexed" -> ((s: SparkSession, dir: String) => {
      val emb = t(s, dir, "embeddings")
      val bench = emb.filter(F.col("vec_id") % 37 === 0 &&
        F.col("embedding").isNotNull).select(F.col("embedding"))
      val path = System.getProperty("java.io.tmpdir") + "/graft_q_decon_ivf"
      graft.pipeline.Similarity
        .buildIvfIndex(emb, "vec_id", "embedding", nlist = 8)
        .save(path)
      val idx = graft.pipeline.Similarity.loadIvfIndex(s, path)
      graft.pipeline.Decontaminate.semanticContaminationFlagsIndexed(
          idx, emb, "vec_id", bench, "embedding", threshold = 0.999)
        .orderBy("vec_id")
    }),

    // nightly index GROWTH: build the IVF index on half the corpus,
    // append the other half against the FROZEN centroids
    // (Similarity.appendToIvfIndex — map-only, no re-clustering), then
    // probe. Exact benchmark copies are always flagged regardless of
    // which half they landed in (frozen centroids assign an identical
    // vector to the probe's first cell), so the appended index shares
    // the full-build planted oracle verbatim.
    "q_ivf_append" -> ((s: SparkSession, dir: String) => {
      val emb = t(s, dir, "embeddings")
      val bench = emb.filter(F.col("vec_id") % 37 === 0 &&
        F.col("embedding").isNotNull).select(F.col("embedding"))
      val nn = emb.filter(F.col("embedding").isNotNull)
      val path = System.getProperty("java.io.tmpdir") + "/graft_q_ivf_append"
      graft.pipeline.Similarity
        .buildIvfIndex(nn.filter(F.col("vec_id") % 2 === 0),
          "vec_id", "embedding", nlist = 8)
        .save(path)
      val grown = graft.pipeline.Similarity.appendToIvfIndex(
        s, path, nn.filter(F.col("vec_id") % 2 =!= 0), "vec_id", "embedding")
      graft.pipeline.Decontaminate.semanticContaminationFlagsIndexed(
          grown, emb, "vec_id", bench, "embedding", threshold = 0.999)
        .orderBy("vec_id")
    }),

    // takedown removal from the saved BM25 text index: drop every 3rd
    // document, probe the pruned index — dfs derive from matched
    // postings at query time, so the ranking equals an index built on
    // the remaining corpus, replayed by the q_bm25 oracle restricted
    // to the survivors (rank gaps re-measured at both SFs)
    "q_text_remove" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents")
      val path = System.getProperty("java.io.tmpdir") + "/graft_q_text_rm"
      // a prior run KILLED mid-removal leaves a fresh-looking
      // maintenance lock — start clean (locks release in finally, but
      // a SIGKILL has no finally)
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      graft.pipeline.Retrieval.buildTextIndex(docs, "doc_id", "text")
        .save(path)
      val pruned = graft.pipeline.Retrieval.removeFromTextIndex(
        s, path, docs.filter(F.col("doc_id") % 3 === 0).select("doc_id"),
        "doc_id")
      graft.pipeline.Retrieval.bm25TopKIndexed(
          pruned, Seq("slow", "merge", "window"), 10)
        .select(F.col("rank").cast("long").as("rank"),
          F.col("id").as("doc_id"), F.col("tf_total"), F.col("n_terms_hit"))
        .orderBy("rank")
    }),

    // continuous search indexing under the gate: the fresh slice
    // replayed as a file stream into streamToTextIndex (per-micro-batch
    // __batch partitions + exact stats deltas, replay-idempotent), then
    // one probe of the grown index must rank exactly like q_bm25 over
    // the full corpus (its oracle, verbatim)
    "q_stream_text_index" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val path = System.getProperty("java.io.tmpdir") + "/graft_q_stream_tidx"
      graft.pipeline.Retrieval.buildTextIndex(
        docs.filter(F.col("doc_id") % 3 =!= 0), "doc_id", "text").save(path)
      val fresh = docs.filter(F.col("doc_id") % 3 === 0)
      val tmp = System.getProperty("java.io.tmpdir") + "/graft_q_stream_tidx_src"
      fresh.write.mode("overwrite").parquet(tmp)
      val stream = s.readStream.schema(fresh.schema).parquet(tmp)
      val q = graft.pipeline.Retrieval.streamToTextIndex(
          stream, path, "doc_id", "text")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      graft.pipeline.Retrieval.bm25TopKIndexed(
          graft.pipeline.Retrieval.loadTextIndex(s, path),
          Seq("slow", "merge", "window"), 10)
        .select(F.col("rank").cast("long").as("rank"),
          F.col("id").as("doc_id"), F.col("tf_total"), F.col("n_terms_hit"))
        .orderBy("rank")
    }),

    // text-index small-file compaction: the streamed third folds into
    // the base __batch=-1 layer (newest micro-batch stays
    // merge-on-read; stats deltas fold by exact long adds) and the
    // probe still ranks exactly like q_bm25 over the full corpus —
    // its oracle, shared verbatim
    "q_index_compact" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val path = System.getProperty("java.io.tmpdir") + "/graft_q_idx_compact"
      // a prior run's maintenance watermark would suppress this run's
      // fresh batch ids — always start clean
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      graft.pipeline.Retrieval.buildTextIndex(
        docs.filter(F.col("doc_id") % 3 =!= 0), "doc_id", "text").save(path)
      val fresh = docs.filter(F.col("doc_id") % 3 === 0)
      val tmp = System.getProperty("java.io.tmpdir") + "/graft_q_idx_compact_src"
      fresh.repartition(3).write.mode("overwrite").parquet(tmp)
      val stream = s.readStream.schema(fresh.schema)
        .option("maxFilesPerTrigger", 1).parquet(tmp)
      val q = graft.pipeline.Retrieval.streamToTextIndex(
          stream, path, "doc_id", "text")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // writer stopped -> release its lease (the enforced handshake:
      // the stats fold refuses while a writer heartbeat is fresh)
      graft.pipeline.Maintenance.releaseWriterLease(s, path)
      val ix = graft.pipeline.Retrieval.compactTextIndex(s, path)
      graft.pipeline.Retrieval.bm25TopKIndexed(
          ix, Seq("slow", "merge", "window"), 10)
        .select(F.col("rank").cast("long").as("rank"),
          F.col("id").as("doc_id"), F.col("tf_total"), F.col("n_terms_hit"))
        .orderBy("rank")
    }),

    // takedown removal from a flat saved index (the saveSignatureIndex
    // family): the media hash index loses every variant-1 id, so the
    // variant-2 probe keeps exactly its (v2, v0, 4) pairs and the
    // (v2, v1, 5) pairs vanish — full rows from the planted bit plan
    "q_dedup_remove" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents").select(F.col("doc_id"))
      val hist = graft.pipeline.Multimodal.plantedNearDupMedia(
        docs.filter(F.col("doc_id") % 3 =!= 2), "doc_id")
      val path = System.getProperty("java.io.tmpdir") + "/graft_q_dedup_rm_idx"
      // the flat family's lock is a SIBLING file (the takedown swap
      // replaces the dir) — clear BOTH leftovers from a killed run
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      fs.delete(new org.apache.hadoop.fs.Path(path + "__maintenance_lock"), false)
      graft.pipeline.Dedup.saveSignatureIndex(
        graft.pipeline.Multimodal.buildMediaHashIndex(hist), path)
      val pruned = graft.pipeline.Dedup.removeFromSavedIndex(
        s, path, docs.filter(F.col("doc_id") % 3 === 1), "doc_id")
      val batch = graft.pipeline.Multimodal.plantedNearDupMedia(
        docs.filter(F.col("doc_id") % 3 === 2), "doc_id")
      graft.pipeline.Multimodal.incrementalNearDuplicateMedia(
          batch, pruned, maxHamming = 6)
        .orderBy("id_new", "id_old")
    }),

    // nightly index sync from snapshot diffs: yesterday's snapshot is
    // missing every 5th doc, carries REVERSED text for every 3rd, and
    // has 20 phantom docs; sync(old -> today) removes the phantoms,
    // re-indexes the changed, appends the added — and the synced index
    // must rank exactly like q_bm25 over today's corpus (its oracle,
    // verbatim)
    "q_index_sync" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents")
      val phantoms = s.range(900000L, 900020L)
        .select(F.col("id").as("doc_id"),
          F.lit("phantom slow merge window text").as("text"))
      val old = docs
        .withColumn("text", F.when(F.col("doc_id") % 3 === 0,
          F.reverse(F.col("text"))).otherwise(F.col("text")))
        .filter(F.col("doc_id") % 5 =!= 0)
        .select("doc_id", "text")
        .unionByName(phantoms)
      val path = System.getProperty("java.io.tmpdir") + "/graft_q_idx_sync"
      // clear any crash-leftover maintenance lock from a killed run
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      graft.pipeline.Retrieval.buildTextIndex(old, "doc_id", "text").save(path)
      val synced = graft.pipeline.Retrieval.syncTextIndex(
        s, path, old, docs.select("doc_id", "text"), "doc_id", "text")
      graft.pipeline.Retrieval.bm25TopKIndexed(
          synced, Seq("slow", "merge", "window"), 10)
        .select(F.col("rank").cast("long").as("rank"),
          F.col("id").as("doc_id"), F.col("tf_total"), F.col("n_terms_hit"))
        .orderBy("rank")
    }),

    // the self-maintenance policy hooks under one gate: maybeCompact
    // (files-per-partition dial — quiet below, folds above, quiet
    // again after) and maybeRetrainIvfIndex (drift dial — quiet on an
    // in-distribution batch, retrains when a shifted batch blows the
    // occupancy PSI). Exact cardinality + the new cell count pin that
    // the fired paths really ran.
    "q_index_policy" -> ((s: SparkSession, dir: String) => {
      val sim = graft.pipeline.Similarity
      val emb = t(s, dir, "embeddings")
        .filter(F.col("embedding").isNotNull)
        .select(F.col("vec_id").cast("long").as("vec_id"), F.col("embedding"))
      val path = System.getProperty("java.io.tmpdir") + "/graft_q_policy"
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      sim.buildIvfIndex(emb.filter(F.col("vec_id") % 4 === 0),
        "vec_id", "embedding", nlist = 8, iterations = 2).save(path)
      // calibrate at build time: the policy contract under test is
      // that a FIRED retrain re-measures this curve on the new
      // geometry instead of leaving a hole for a human to notice
      sim.recalibrateIvfIndex(s, path, k = 10)
      (1 to 3).foreach { m =>
        sim.appendToIvfIndexTouched(s, path,
          emb.filter(F.col("vec_id") % 4 === m), "vec_id", "embedding",
          batchId = m.toLong - 1L)
      }
      val compactQuiet = !sim.maybeCompactIvfIndex(s, path, maxFilesPerCell = 50)
      val compactFired = sim.maybeCompactIvfIndex(s, path, maxFilesPerCell = 1)
      val compactQuietAfter =
        !sim.maybeCompactIvfIndex(s, path, maxFilesPerCell = 1)
      val (r1, _) = sim.maybeRetrainIvfIndex(s, path, emb.limit(200),
        "embedding", psiThreshold = 0.2)
      val shiftU = F.udf((v: Seq[Float]) => v.map(x => x + 25.0f).toArray)
      val shifted = emb.limit(300)
        .select(F.col("vec_id"), shiftU(F.col("embedding")).as("embedding"))
      val (r2, _) = sim.maybeRetrainIvfIndex(s, path, shifted,
        "embedding", psiThreshold = 0.2, nlist = 16)
      val idx = sim.loadIvfIndex(s, path)
      // the fired retrain must leave a FRESH curve: auto-recalibrated
      // on the rebuilt 16-cell geometry (stamp matches), and solving a
      // 0.6 target on it achieves 0.6 on the calibration sample (the
      // on-sample replay argument — deterministic by construction)
      val calMeta = sim.loadCalibrationMeta(s, path)
      val recalFresh = calMeta.exists(_._2 == 16)
      val calSample = idx.assigned
        .orderBy(F.xxhash64(F.col("neighbor_id").cast("string")),
          F.col("neighbor_id").cast("string"))
        .limit(64)
        .select(F.col("neighbor_id").as("vec_id"), F.col("__cv").as("embedding"))
        .localCheckpoint(false)
      def rpairs(df: org.apache.spark.sql.DataFrame) = df
        .select(F.col("query_id").cast("long"), F.col("neighbor_id").cast("long"))
        .collect().groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      val gtCal = rpairs(sim.bruteForceTopK(emb, calSample,
        "vec_id", "embedding", 10))
      val gotCal = rpairs(sim.ivfTopKTarget(idx, calSample,
        "vec_id", "embedding", 10, 0.6, calMeta.get._1))
      val perQ = gtCal.map { case (q, tr) =>
        gotCal.getOrElse(q, Set.empty[Long]).intersect(tr).size.toDouble / tr.size }
      val recalAchieves = perQ.nonEmpty && perQ.sum / perQ.size >= 0.6
      // a STALE curve (stamped for geometry that no longer exists) is
      // refused by the validating loader, never silently solved
      sim.saveCalibration(s, path, calMeta.get._1, cells = 999)
      val staleRefused = scala.util.Try(
        sim.loadCalibrationValidated(s, path, idx.centroids.length)).isFailure
      sim.saveCalibration(s, path, calMeta.get._1, cells = 16) // restore
      // graph-family twin: the same quiet/fire drift boundary through
      // hnswDrift's frozen-graph assignment
      val hn = graft.pipeline.Hnsw
      val hpath = System.getProperty("java.io.tmpdir") + "/graft_q_policy_hnsw"
      fs.delete(new org.apache.hadoop.fs.Path(hpath), true)
      hn.buildHnswIndex(emb, "vec_id", "embedding",
        maxNav = 16, m = 8, efConstruction = 48, efAssign = 16).save(hpath)
      val (h1, _) = hn.maybeRetrainHnswIndex(s, hpath, emb.limit(200),
        "embedding", psiThreshold = 0.2)
      // no geometry args: the drift-triggered retrain must reproduce
      // the SAVED build parameters (m=8, efConstruction=48, efAssign=16
      // persisted in the nodes layout), not fall back to defaults
      val (h2, _) = hn.maybeRetrainHnswIndex(s, hpath, shifted,
        "embedding", psiThreshold = 0.2)
      val hAfter = hn.loadHnswIndex(s, hpath)
      val hGeomKept = hAfter.graph.vecs.length == 16 &&
        hAfter.graph.m == 8 && hAfter.graph.efConstruction == 48 &&
        hAfter.graph.efAssign == 16
      s.range(1).select(
        F.lit(idx.assigned.count()).as("n_rows"),
        F.lit(compactQuiet).as("compact_quiet"),
        F.lit(compactFired).as("compact_fired"),
        F.lit(compactQuietAfter).as("compact_quiet_after"),
        F.lit(!r1).as("retrain_quiet"),
        F.lit(r2).as("retrain_fired"),
        F.lit(idx.centroids.length == 16).as("nlist_ok"),
        F.lit(!h1).as("hnsw_retrain_quiet"),
        F.lit(h2).as("hnsw_retrain_fired"),
        F.lit(hAfter.assigned.count() == emb.count()).as("hnsw_rows_ok"),
        F.lit(hGeomKept).as("hnsw_geom_kept"),
        F.lit(recalFresh).as("recal_fresh"),
        F.lit(recalAchieves).as("recal_achieves"),
        F.lit(staleRefused).as("stale_refused"))
    }),

    // nightly index operations, COMPOSED (the q_pipeline_curation
    // precedent applied to operations): stream append -> auto-compact
    // fires -> takedown removal (writer-lease handshake ENFORCED: the
    // refusal is part of the gate) -> drift batch -> maybeRetrain
    // quiet-then-fires -> planted-copy probes, across IVF and the text
    // index in one run. The text leg's final probe hash-matches BM25
    // over the post-takedown corpus replayed in SQL (doc_id % 37 <> 0;
    // measured top-15 gaps >= 5.7e-5 at both SFs); the IVF leg pins
    // exact cardinalities and copy/absence facts at every stage.
    "q_pipeline_ops" -> ((s: SparkSession, dir: String) => {
      val sim = graft.pipeline.Similarity
      val mx = graft.pipeline.Maintenance
      val emb = t(s, dir, "embeddings")
        .filter(F.col("embedding").isNotNull)
        .select(F.col("vec_id").cast("long").as("vec_id"), F.col("embedding"))
      val base = System.getProperty("java.io.tmpdir") + "/graft_q_ops"
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)

      // ---- IVF leg ----
      val ivfDir = s"$base/ivf"
      sim.buildIvfIndex(emb.filter(F.col("vec_id") % 4 === 0),
        "vec_id", "embedding", nlist = 8, iterations = 2).save(ivfDir)
      val rest = emb.filter(F.col("vec_id") % 4 =!= 0)
      rest.repartition(3).write.mode("overwrite").parquet(s"$base/ivf_src")
      val q1 = sim.streamToIvfIndex(
          s.readStream.schema(rest.schema)
            .option("maxFilesPerTrigger", 1).parquet(s"$base/ivf_src"),
          ivfDir, "vec_id", "embedding")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", s"$base/ivf_ckpt")
        .start()
      q1.awaitTermination()
      val nAll = emb.count()
      val streamOk = sim.loadIvfIndex(s, ivfDir).assigned.count() == nAll
      // auto-compact: a tight dial fires exactly once, then stays quiet
      val compactFired = sim.maybeCompactIvfIndex(s, ivfDir, maxFilesPerCell = 1)
      val compactQuietAfter = !sim.maybeCompactIvfIndex(s, ivfDir, maxFilesPerCell = 1)
      val nAfterCompact = sim.loadIvfIndex(s, ivfDir).assigned.count() == nAll
      // takedown: the writer lease (heartbeated by the stream's last
      // micro-batch) must REFUSE the removal until released
      val doomed = emb.filter(F.col("vec_id") % 37 === 0).select("vec_id")
      val nDoomed = doomed.count()
      val handshake =
        try { sim.removeFromIvfIndex(s, ivfDir, doomed, "vec_id"); false }
        catch { case e: IllegalStateException =>
          e.getMessage.contains("releaseWriterLease") }
      mx.releaseWriterLease(s, ivfDir)
      val afterRemove = sim.removeFromIvfIndex(s, ivfDir, doomed, "vec_id")
      val removeOk = afterRemove.assigned.count() == nAll - nDoomed
      // drift: in-distribution batch quiet, shifted batch fires
      val (r1, _) = sim.maybeRetrainIvfIndex(s, ivfDir, emb.limit(200),
        "embedding", psiThreshold = 0.2)
      val shiftU = F.udf((v: Seq[Float]) => v.map(x => x + 25.0f).toArray)
      val (r2, _) = sim.maybeRetrainIvfIndex(s, ivfDir,
        emb.limit(300).select(F.col("vec_id"),
          shiftU(F.col("embedding")).as("embedding")),
        "embedding", psiThreshold = 0.2, nlist = 16)
      val re = sim.loadIvfIndex(s, ivfDir)
      val retrainOk = !r1 && r2 && re.centroids.length == 16 &&
        re.assigned.count() == nAll - nDoomed
      // probes: planted copies of survivors rank-1; removed ids absent
      // and never returned for their own vectors
      val survivors = emb.filter(F.col("vec_id") % 37 =!= 0 &&
        F.col("vec_id") % 5 === 0)
      val probes = survivors.select((F.col("vec_id") + 100000L).as("vec_id"),
        F.col("embedding"))
      val hits = sim.ivfTopKIndexed(re, probes, "vec_id", "embedding", 1,
          nprobe = 1).collect()
      val copiesFound = hits.length == survivors.count() &&
        hits.forall(r => r.getAs[Long]("neighbor_id") ==
          r.getAs[Long]("query_id") - 100000L)
      val doomedProbes = emb.filter(F.col("vec_id") % 37 === 0)
        .select((F.col("vec_id") + 100000L).as("vec_id"), F.col("embedding"))
      val removedAbsent = sim.ivfTopKIndexed(re, doomedProbes,
          "vec_id", "embedding", 5, nprobe = 2)
        .filter(F.col("neighbor_id") === F.col("query_id") - 100000L)
        .count() == 0L

      // ---- text leg (same schedule; final probe is cross-engine) ----
      val docs = t(s, dir, "documents")
      val tDir = s"$base/text"
      graft.pipeline.Retrieval.buildTextIndex(
        docs.filter(F.col("doc_id") % 2 === 0), "doc_id", "text", 32)
        .save(tDir)
      val oddDocs = docs.filter(F.col("doc_id") % 2 =!= 0)
        .select(F.col("doc_id"), F.col("text"))
      oddDocs.repartition(3).write.mode("overwrite").parquet(s"$base/t_src")
      val q2 = graft.pipeline.Retrieval.streamToTextIndex(
          s.readStream.schema(oddDocs.schema)
            .option("maxFilesPerTrigger", 1).parquet(s"$base/t_src"),
          tDir, "doc_id", "text")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", s"$base/t_ckpt")
        .start()
      q2.awaitTermination()
      val textCompactFired =
        graft.pipeline.Retrieval.maybeCompactTextIndex(s, tDir, 1)
      val textHandshake =
        try {
          graft.pipeline.Retrieval.removeFromTextIndex(s, tDir,
            docs.filter(F.col("doc_id") % 37 === 0).select("doc_id"), "doc_id")
          false
        } catch { case e: IllegalStateException =>
          e.getMessage.contains("releaseWriterLease") }
      mx.releaseWriterLease(s, tDir)
      val pruned = graft.pipeline.Retrieval.removeFromTextIndex(s, tDir,
        docs.filter(F.col("doc_id") % 37 === 0).select("doc_id"), "doc_id")
      graft.pipeline.Retrieval.bm25TopKIndexed(
          pruned, Seq("slow", "merge", "window"), 10)
        .select(F.col("rank").cast("long").as("rank"),
          F.col("id").as("doc_id"), F.col("tf_total"), F.col("n_terms_hit"),
          F.lit(streamOk).as("ivf_stream_ok"),
          F.lit(compactFired && compactQuietAfter && nAfterCompact)
            .as("ivf_compact_ok"),
          F.lit(handshake).as("ivf_handshake_enforced"),
          F.lit(removeOk).as("ivf_remove_ok"),
          F.lit(retrainOk).as("ivf_retrain_ok"),
          F.lit(copiesFound).as("ivf_copies_found"),
          F.lit(removedAbsent).as("ivf_removed_absent"),
          F.lit(textCompactFired).as("text_compact_fired"),
          F.lit(textHandshake).as("text_handshake_enforced"))
        .orderBy("rank")
    }),

    // zero-downtime IVF re-train (the drift-says-retrain endpoint):
    // fresh centroids trained over the index's own contents, staged
    // beside the live index, journaled, swapped. The gate retrains a
    // coarse nlist=4 index to nlist=8 and pins the exact surviving id
    // set (content is invariant under re-train), the new cell count,
    // and planted-copy rank-1 probes against the retrained geometry.
    "q_ivf_retrain" -> ((s: SparkSession, dir: String) => {
      val sim = graft.pipeline.Similarity
      val emb = t(s, dir, "embeddings")
        .filter(F.col("embedding").isNotNull)
        .select(F.col("vec_id").cast("long").as("vec_id"), F.col("embedding"))
      val path = System.getProperty("java.io.tmpdir") + "/graft_q_ivf_retrain"
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      sim.buildIvfIndex(emb, "vec_id", "embedding", nlist = 4, iterations = 1)
        .save(path)
      val re = sim.retrainIvfIndex(s, path, nlist = 8, iterations = 2)
      val nOk = re.assigned.count() == emb.count()
      val nlistOk = re.centroids.length == 8
      val probes = emb.filter(F.col("vec_id") % 37 === 0)
        .select((F.col("vec_id") + 100000L).as("vec_id"), F.col("embedding"))
      sim.ivfTopKIndexed(re, probes, "vec_id", "embedding", 1, nprobe = 1)
        .select(F.col("query_id"), F.col("neighbor_id").as("top1"),
          (F.col("cos") >= 0.999999).as("found"),
          F.lit(nOk).as("n_ok"), F.lit(nlistOk).as("nlist_ok"))
        .orderBy("query_id")
    }),

    // recall-target probe controller: the mass->recall curve is
    // MEASURED at build time (bounded sample vs exact brute force,
    // replaying each family's probe rule exactly), persisted beside
    // the geometry, and massFor(target) solves the dial. On the
    // calibration sample the solved mass achieves >= target BY
    // CONSTRUCTION (the curve was measured there with the identical
    // probe replay — deterministic, regeneration-proof); the
    // generalization leg demands 0.6 on independent queries while
    // probing for 0.85 (fat margin). Curve monotonicity is structural
    // (larger mass probes a superset prefix of the same ordering).
    "q_ann_target" -> ((s: SparkSession, dir: String) => {
      val sim = graft.pipeline.Similarity
      val emb = t(s, dir, "embeddings")
        .filter(F.col("embedding").isNotNull)
        .select(F.col("vec_id").cast("long").as("vec_id"), F.col("embedding"))
      val n = emb.count()
      val idx = sim.buildIvfIndex(emb, "vec_id", "embedding",
        sim.ivfNlistFor(n), iterations = 2)
      val cal = sim.calibrateIvfProbe(idx, k = 10, nSample = 64)
      val path = System.getProperty("java.io.tmpdir") + "/graft_q_ann_target"
      sim.saveCalibration(s, path, cal)
      val reloaded = sim.loadCalibration(s, path).get
      val calRoundtrip = reloaded == cal
      val monotoneCurve = cal.grid.sliding(2).forall {
        case Vector((_, r1), (_, r2)) => r2 >= r1
        case _ => true
      }
      val m60 = cal.massFor(0.6)
      val m85 = cal.massFor(0.85)
      // the calibration sample, re-derived (hash-ordered prefix of the
      // corpus — deterministic)
      val sample = idx.assigned
        .orderBy(F.xxhash64(F.col("neighbor_id").cast("string")),
          F.col("neighbor_id").cast("string"))
        .limit(64)
        .select(F.col("neighbor_id").as("vec_id"),
          F.col("__cv").as("embedding"))
        .localCheckpoint(false)
      def pairs(df: org.apache.spark.sql.DataFrame) = df
        .select(F.col("query_id").cast("long"), F.col("neighbor_id").cast("long"))
        .collect().groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      def recallOf(got: Map[Long, Set[Long]], gt: Map[Long, Set[Long]]) = {
        val per = gt.map { case (q, tr) =>
          got.getOrElse(q, Set.empty).intersect(tr).size.toDouble / tr.size }
        if (per.isEmpty) 0.0 else per.sum / per.size
      }
      val gtSample = pairs(sim.bruteForceTopK(emb, sample, "vec_id", "embedding", 10))
      val a60 = recallOf(pairs(sim.ivfTopKTarget(idx, sample,
        "vec_id", "embedding", 10, 0.6, cal)), gtSample)
      val a85 = recallOf(pairs(sim.ivfTopKTarget(idx, sample,
        "vec_id", "embedding", 10, 0.85, cal)), gtSample)
      // generalization: independent queries, solve for 0.85, demand 0.6
      val indep = emb.filter(F.col("vec_id") % 13 === 0)
      val gtIndep = pairs(sim.bruteForceTopK(emb, indep, "vec_id", "embedding", 10))
      val aIndep = recallOf(pairs(sim.ivfTopKTarget(idx, indep,
        "vec_id", "embedding", 10, 0.85, cal)), gtIndep)
      // graph-family twin: calibrate at the efSearch the query uses
      val hn = graft.pipeline.Hnsw
      val hidx = hn.buildHnswIndex(emb, "vec_id", "embedding",
        maxNav = 64, m = 8, efConstruction = 48, efAssign = 16)
      val hcal = hn.calibrateProbe(hidx, k = 10, nSample = 64, efSearch = 64)
      val h60 = recallOf(pairs(hn.hnswTopKTarget(hidx, sample,
        "vec_id", "embedding", 10, 0.6, hcal, efSearch = 64)), gtSample)
      // code-family twin: coarse-cell membership bounds recall; a
      // generous rerank pool makes it exact within probed cells
      val pq = graft.pipeline.ProductQuantization
      val pidx = pq.buildIvfPq(emb, "vec_id", "embedding",
        nlist = sim.ivfNlistFor(n), m = 16, ksub = 16, iterations = 2)
      val pcal = pq.calibrateIvfPqProbe(pidx, emb, "vec_id", "embedding",
        k = 10, nSample = 64)
      val p60 = recallOf(pairs(pq.ivfPqTopKTarget(pidx, emb, sample,
        "vec_id", "embedding", 10, 0.6, pcal, poolSize = 1024)), gtSample)
      // pool-family legs: recall's dial is the rerank POOL, measured
      // by the same machinery (coarse rank of each true neighbor) —
      // on-sample achievement is deterministic by the replay argument
      // (a pooled true top-k neighbor always survives the exact
      // rerank). Solve 0.85, demand 0.85 on the calibration sample.
      val bq = graft.pipeline.BinaryQuant
      val bcal = bq.calibratePool(emb, "vec_id", "embedding", k = 10)
      val b85 = recallOf(pairs(bq.binaryTopKTarget(emb, sample,
        "vec_id", "embedding", 10, 0.85, bcal)), gtSample)
      val bPoolMono = bcal.poolFor(0.95) >= bcal.poolFor(0.6)
      val sq = graft.pipeline.ScalarQuant
      val sqModel = sq.train(emb, "embedding")
      val sqCodes = sq.encode(emb, "vec_id", "embedding", sqModel)
        .localCheckpoint(false)
      val scal = sq.calibratePool(sqModel, sqCodes, emb, "vec_id",
        "embedding", k = 10)
      val s85 = recallOf(pairs(sq.sq8TopKTarget(sqModel, sqCodes, emb,
        sample, "vec_id", "embedding", 10, 0.85, scal)), gtSample)
      val pcb = pq.trainPq(emb, "vec_id", "embedding", m = 16, ksub = 16,
        iterations = 2)
      val pEnc = pq.pqEncode(emb, "vec_id", "embedding", pcb)
        .localCheckpoint(false)
      val ppool = pq.calibratePqPool(pcb, pEnc, emb, "vec_id", "embedding",
        k = 10)
      val pp85 = recallOf(pairs(pq.pqTopKTarget(pcb, pEnc, emb, sample,
        "vec_id", "embedding", 10, 0.85, ppool)), gtSample)
      s.range(1).select(
        F.lit(n).as("n"),
        F.lit(calRoundtrip).as("cal_roundtrip"),
        F.lit(monotoneCurve).as("curve_monotone"),
        F.lit(m85 >= m60).as("mass_monotone"),
        F.lit(a60 >= 0.6).as("ivf_t60_ok"),
        F.lit(a85 >= 0.85).as("ivf_t85_ok"),
        F.lit(aIndep >= 0.6).as("ivf_indep_ok"),
        F.lit(h60 >= 0.6).as("hnsw_t60_ok"),
        F.lit(p60 >= 0.6).as("pq_t60_ok"),
        F.lit(b85 >= 0.85).as("binary_pool_ok"),
        F.lit(bPoolMono).as("pool_monotone"),
        F.lit(s85 >= 0.85).as("sq8_pool_ok"),
        F.lit(pp85 >= 0.85).as("pq_pool_ok"))
    }),

    // incremental HNSW navigation growth: a drifted batch trains NEW
    // nav cells (k-means over the batch only), insertNav continues the
    // build loop on the existing graph, and one map-only re-walk puts
    // every row at its new-graph assignment (the exact-copy guarantee
    // survives). Staged like retrain. Pins: nav count, exact
    // cardinality, per-row walk self-consistency, drifted rows owning
    // new cells, and planted copies of drifted rows probing rank-1.
    "q_hnsw_nav_insert" -> ((s: SparkSession, dir: String) => {
      val hn = graft.pipeline.Hnsw
      val emb = t(s, dir, "embeddings")
        .filter(F.col("embedding").isNotNull)
        .select(F.col("vec_id").cast("long").as("vec_id"), F.col("embedding"))
      val path = System.getProperty("java.io.tmpdir") + "/graft_q_nav_insert"
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      hn.buildHnswIndex(emb, "vec_id", "embedding",
        maxNav = 16, m = 8, efConstruction = 48, efAssign = 16).save(path)
      val shiftU = F.udf((v: Seq[Float]) => v.map(x => x + 25.0f).toArray)
      val drifted = emb.filter(F.col("vec_id") < 60)
        .select((F.col("vec_id") + 500000L).as("vec_id"),
          shiftU(F.col("embedding")).as("embedding"))
        .localCheckpoint(false)
      hn.appendToHnswIndex(s, path, drifted, "vec_id", "embedding")
      val grown = hn.addNavNodes(s, path, drifted, "vec_id", "embedding",
        maxNewNav = 8)
      val navGrown = grown.graph.vecs.length == 24
      val nOk = grown.assigned.count() == emb.count() + drifted.count()
      val gB = s.sparkContext.broadcast(grown.graph)
      // fully qualified inside the UDF: capturing the `hn` object val
      // in the closure is the documented Task-not-serializable trap
      val selfU = F.udf((v: Seq[Float], c: Int) =>
        graft.pipeline.Hnsw.search(gB.value, v.toArray,
          gB.value.efAssign).head._1 == c)
      val selfConsistent = grown.assigned
        .filter(!selfU(F.col("__cv"), F.col("__cell"))).count() == 0L
      val driftedCells = grown.assigned
        .filter(F.col("neighbor_id").cast("long") >= 500000L)
        .select(F.col("__cell")).distinct().collect().map(_.getInt(0))
      val cellsOwned = driftedCells.forall(_ >= 16) && driftedCells.length >= 4
      val probes = drifted.filter(F.col("vec_id") < 500010L)
        .select((F.col("vec_id") + 100000L).as("vec_id"), F.col("embedding"))
      hn.hnswTopK(grown, probes, "vec_id", "embedding", 1,
          efSearch = 24, minProbe = 1, probeMass = 0.0)
        .select(F.col("query_id"), F.col("neighbor_id").as("top1"),
          (F.col("cos") >= 0.999999).as("found"),
          F.lit(navGrown).as("nav_grown"), F.lit(nOk).as("n_ok"),
          F.lit(selfConsistent).as("self_consistent"),
          F.lit(cellsOwned).as("cells_owned"))
        .orderBy("query_id")
    }),

    // graph ANN (HNSW-class): driver-built navigation graph over a
    // bounded sample, corpus assigned by a broadcast graph walk into
    // the shared cell-table layout, probes partition-prune to the
    // walked cells. Planted exact copies probe rank-1 THROUGH
    // save/load (identical vector -> identical assign-width walk ->
    // the copy's cell is the FIRST probed cell; no natural pair
    // reaches cos 0.999999 in the testdata); recall@10 vs brute force
    // at the default mass dial rides as a pinned boolean.
    "q_ann_hnsw" -> ((s: SparkSession, dir: String) => {
      val emb = t(s, dir, "embeddings")
        .filter(F.col("embedding").isNotNull)
        .select(F.col("vec_id").cast("long").as("vec_id"), F.col("embedding"))
      val path = System.getProperty("java.io.tmpdir") + "/graft_q_hnsw"
      graft.pipeline.Hnsw.buildHnswIndex(emb, "vec_id", "embedding",
        maxNav = 64, m = 8, efConstruction = 48, efAssign = 16).save(path)
      val idx = graft.pipeline.Hnsw.loadHnswIndex(s, path)
      val probes = emb.filter(F.col("vec_id") % 37 === 0)
        .select((F.col("vec_id") + 100000L).as("vec_id"), F.col("embedding"))
      val hits = graft.pipeline.Hnsw.hnswTopK(idx, probes, "vec_id",
        "embedding", 1, efSearch = 16, minProbe = 1, probeMass = 0.0)
      val queries = emb.filter(F.col("vec_id") % 13 === 0)
      val approx = graft.pipeline.Hnsw.hnswTopK(idx, queries, "vec_id",
          "embedding", 10)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val brute = graft.pipeline.Similarity.bruteForceTopK(
          emb, queries, "vec_id", "embedding", 10)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // 0.7 floor: measured 0.795 (sf0.001) at the default 0.45 mass,
      // ABOVE ivfTopKAuto's 0.767 on the same workload; margin covers
      // per-round testdata regeneration
      val recallOk = brute.count(approx.contains).toDouble / brute.size >= 0.7
      hits.select(F.col("query_id"), F.col("neighbor_id").as("top1"),
          (F.col("cos") >= 0.999999).as("found"),
          F.lit(recallOk).as("recall_ok"))
        .orderBy("query_id")
    }),

    // takedown removal from persisted ANN indexes: every 37th id is
    // removed from both the IVF assignment and the IVF-PQ code table
    // (touched-cell dynamic overwrite); the gate pins the surviving
    // row counts, that no removed id remains probe-able, and that
    // exact copies of SURVIVORS still find their originals at rank 1
    "q_index_remove" -> ((s: SparkSession, dir: String) => {
      val sim = graft.pipeline.Similarity
      val pq = graft.pipeline.ProductQuantization
      val emb = t(s, dir, "embeddings")
        .filter(F.col("embedding").isNotNull)
        .select(F.col("vec_id").cast("long").as("vec_id"), F.col("embedding"))
      val doomed = emb.filter(F.col("vec_id") % 37 === 0).select("vec_id")
      val ivfPath = System.getProperty("java.io.tmpdir") + "/graft_q_idxrm_ivf"
      val pqPath = System.getProperty("java.io.tmpdir") + "/graft_q_idxrm_pq"
      // clear any crash-leftover maintenance lock from a killed run
      val fs = new org.apache.hadoop.fs.Path(ivfPath)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(ivfPath), true)
      fs.delete(new org.apache.hadoop.fs.Path(pqPath), true)
      sim.buildIvfIndex(emb, "vec_id", "embedding", nlist = 8).save(ivfPath)
      pq.buildIvfPq(emb, "vec_id", "embedding", nlist = 8, m = 16, ksub = 16)
        .save(pqPath)
      val ivf = sim.removeFromIvfIndex(s, ivfPath, doomed, "vec_id")
      val ivfpq = pq.removeFromIvfPq(s, pqPath, doomed, "vec_id")
      val nIvf = ivf.assigned.count()
      val nPq = ivfpq.encoded.count()
      val absent =
        ivf.assigned.join(F.broadcast(doomed.select(
          F.col("vec_id").as("neighbor_id"))), "neighbor_id").isEmpty &&
        ivfpq.encoded.join(F.broadcast(doomed.select(
          F.col("vec_id").as("neighbor_id"))), "neighbor_id").isEmpty
      // survivors (first 5 non-doomed ids) probe their exact copies
      val probes = emb.filter(F.col("vec_id") % 37 =!= 0 && F.col("vec_id") < 6)
        .select((F.col("vec_id") + 100000L).as("vec_id"), F.col("embedding"))
      val hits = sim.ivfTopKIndexed(ivf, probes, "vec_id", "embedding", 1,
          nprobe = 1)
        .select(F.col("query_id"), F.col("neighbor_id"), F.col("cos"))
        .collect()
      val copiesFound = hits.length == probes.count() &&
        hits.forall(r => r.getLong(1) == r.getLong(0) - 100000L &&
          r.getDouble(2) >= 0.999999)
      s.range(1).select(
        F.lit(nIvf).as("n_after_ivf"),
        F.lit(nPq).as("n_after_ivfpq"),
        F.lit(absent).as("removed_absent"),
        F.lit(copiesFound).as("copies_found"))
    }),

    // embedding-distribution drift vs a frozen IVF index — the
    // documented re-train signal for every frozen-geometry maintenance
    // op: an identically-distributed batch (the index's own vectors)
    // has EXACTLY psi 0 (equal occupancy proportions term-by-term),
    // and a batch collapsed onto one vector piles into one cell and
    // blows past 0.5 — both pinned as booleans; counts replay in SQL
    "q_embed_drift" -> ((s: SparkSession, dir: String) => {
      val emb = t(s, dir, "embeddings")
        .filter(F.col("embedding").isNotNull)
        .select(F.col("vec_id"), F.col("embedding"))
      val idx = graft.pipeline.Similarity.buildIvfIndex(
        emb, "vec_id", "embedding", nlist = 16, iterations = 2)
      val same = graft.pipeline.Drift.embeddingDrift(idx, emb, "embedding")
        .head()
      val skewBatch = s.range(200).crossJoin(F.broadcast(
        emb.filter(F.col("vec_id") === 0).select(F.col("embedding"))))
      val skew = graft.pipeline.Drift.embeddingDrift(idx, skewBatch, "embedding")
        .head()
      s.range(1).select(
        F.lit(same.getLong(0)).as("n_index"),
        F.lit(same.getLong(1)).as("n_batch"),
        F.lit(same.getDouble(2) == 0.0).as("psi_same_zero"),
        F.lit(skew.getLong(1) == 200L && skew.getDouble(2) > 0.5)
          .as("psi_skew_big"))
    }),

    // IVF-PQ code-table append: build the OPQ index on the even half,
    // append the odd half with frozen rotation/centroids/codebooks,
    // then probe with exact copies of appended vectors (+100000 ids) —
    // an identical vector shares its twin's first-probed cell and wins
    // the exact rerank, so every planted query must return its
    // original at rank 1 (full rows from id arithmetic)
    "q_ivfpq_append" -> ((s: SparkSession, dir: String) => {
      val pq = graft.pipeline.ProductQuantization
      val emb = t(s, dir, "embeddings")
        .filter(F.col("embedding").isNotNull)
        .select(F.col("vec_id").cast("long").as("vec_id"), F.col("embedding"))
      val path = System.getProperty("java.io.tmpdir") + "/graft_q_ivfpq_append"
      // append is not replay-idempotent: always start clean
      val root = new org.apache.hadoop.fs.Path(path)
      val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(root)) fs.delete(root, true)
      pq.buildOpqIvfPq(emb.filter(F.col("vec_id") % 2 === 0),
        "vec_id", "embedding", nlist = 8, m = 16, ksub = 16,
        iterations = 2, opqIters = 2).save(path)
      val grown = pq.appendToOpqIvfPq(
        s, path, emb.filter(F.col("vec_id") % 2 =!= 0), "vec_id", "embedding")
      val queries = emb.filter(F.col("vec_id") % 2 =!= 0 && F.col("vec_id") < 10)
        .select((F.col("vec_id") + 100000L).as("vec_id"), F.col("embedding"))
      pq.opqIvfPqTopK(grown, emb, queries, "vec_id", "embedding", 1,
          nprobe = 2, poolSize = 200)
        .select(F.col("query_id"), F.col("neighbor_id").as("top1"),
          (F.col("cos") >= 0.999999).as("found"))
        .orderBy("query_id")
    }),

    // CONTINUOUS IVF maintenance: the odd half streams into the saved
    // even-half index as one-file micro-batches (per-batch dynamic
    // overwrite), then a REAL crash-replay — the last commit marker is
    // deleted and the stream restarted, so the engine re-executes that
    // micro-batch with the identical file set from its offset log —
    // must leave the index unchanged. Probed with exact copies of
    // appended vectors (+100000 ids): an identical vector shares its
    // twin's frozen cell, so every planted query returns its original
    // at rank 1 (full rows from id arithmetic)
    "q_stream_ivf_append" -> ((s: SparkSession, dir: String) => {
      val sim = graft.pipeline.Similarity
      val emb = t(s, dir, "embeddings")
        .filter(F.col("embedding").isNotNull)
        .select(F.col("vec_id").cast("long").as("vec_id"), F.col("embedding"))
      val base = System.getProperty("java.io.tmpdir") + "/graft_q_stream_ivf"
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      val path = s"$base/index"
      sim.buildIvfIndex(emb.filter(F.col("vec_id") % 2 === 0),
        "vec_id", "embedding", nlist = 8, iterations = 2).save(path)
      val fresh = emb.filter(F.col("vec_id") % 2 =!= 0)
      val src = s"$base/src"
      fresh.repartition(3).write.mode("overwrite").parquet(src)
      val ckpt = s"$base/ckpt"
      def run(): Unit = {
        val q = sim.streamToIvfIndex(
            s.readStream.schema(fresh.schema)
              .option("maxFilesPerTrigger", 1).parquet(src),
            path, "vec_id", "embedding")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .option("checkpointLocation", ckpt)
          .start()
        q.awaitTermination()
      }
      run()
      // crash-replay: drop the newest commit marker, restart — the
      // engine redelivers exactly that batch; dynamic overwrite makes
      // the redelivery a no-op
      val commits = new org.apache.hadoop.fs.Path(ckpt, "commits")
      val last = fs.listStatus(commits).map(_.getPath)
        .filter(p => p.getName.forall(_.isDigit))
        .maxBy(_.getName.toLong)
      fs.delete(last, false)
      run()
      val grown = sim.loadIvfIndex(s, path)
      // a top-1 probe alone can't see a duplicating replay (a twin row
      // ties at the same id) — pin the exact index cardinality too
      val nOk = grown.assigned.count() == emb.count()
      val queries = emb.filter(F.col("vec_id") % 2 =!= 0 && F.col("vec_id") < 10)
        .select((F.col("vec_id") + 100000L).as("vec_id"), F.col("embedding"))
      sim.ivfTopKIndexed(grown, queries, "vec_id", "embedding", 1, nprobe = 2)
        .select(F.col("query_id"), F.col("neighbor_id").as("top1"),
          (F.col("cos") >= 0.999999).as("found"), F.lit(nOk).as("n_ok"))
        .orderBy("query_id")
    }),

    // IVF small-file compaction: three micro-batch appends, then the
    // fold — retired batches collapse into __batch=-1 (the newest
    // stays merge-on-read), a crash-replay of a FOLDED batch writes
    // nothing (the fold advances the watermark before pruning), and
    // the probe result + exact cardinality are unchanged
    "q_ivf_compact" -> ((s: SparkSession, dir: String) => {
      val sim = graft.pipeline.Similarity
      val emb = t(s, dir, "embeddings")
        .filter(F.col("embedding").isNotNull)
        .select(F.col("vec_id").cast("long").as("vec_id"), F.col("embedding"))
      val path = System.getProperty("java.io.tmpdir") + "/graft_q_ivf_compact"
      val fsRoot = new org.apache.hadoop.fs.Path(path)
      val fs = fsRoot.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(fsRoot, true)
      sim.buildIvfIndex(emb.filter(F.col("vec_id") % 4 === 0),
        "vec_id", "embedding", nlist = 8, iterations = 2).save(path)
      (1 to 3).foreach { m =>
        sim.appendToIvfIndexTouched(s, path,
          emb.filter(F.col("vec_id") % 4 === m), "vec_id", "embedding",
          batchId = m.toLong - 1L)
      }
      sim.compactIvfIndex(s, path)
      // replay of a folded micro-batch: suppressed by the watermark
      sim.appendToIvfIndexTouched(s, path,
        emb.filter(F.col("vec_id") % 4 === 1), "vec_id", "embedding",
        batchId = 0L)
      val idx = sim.loadIvfIndex(s, path)
      val nOk = idx.assigned.count() == emb.count()
      val foldedOk = s.read.parquet(s"$path/assigned")
        .select(F.col("__batch").cast("long")).distinct()
        .collect().map(_.getLong(0)).toSet == Set(-1L, 2L)
      val queries = emb.filter(F.col("vec_id") % 4 === 1 && F.col("vec_id") < 10)
        .select((F.col("vec_id") + 100000L).as("vec_id"), F.col("embedding"))
      sim.ivfTopKIndexed(idx, queries, "vec_id", "embedding", 1, nprobe = 2)
        .select(F.col("query_id"), F.col("neighbor_id").as("top1"),
          (F.col("cos") >= 0.999999).as("found"),
          F.lit(nOk).as("n_ok"), F.lit(foldedOk).as("folded_ok"))
        .orderBy("query_id")
    }),

    // content-defined chunking dedup (FastCDC-style gear hash): plant
    // partial-overlap twins (new intro + the body from char 60) — CDC
    // boundaries re-align on content within ~one chunk of the edit, so
    // nearly every planted pair shares >= 2 interior chunks while
    // unrelated documents share almost none; chunk spans must cover
    // every document exactly. Corpus-level booleans (boundaries are
    // content-derived — per-pair rows would couple the oracle to the
    // regenerated-testdata bytes)
    // winnowing fingerprints (MOSS): planted suffix-sharing rewrites
    // must share fingerprints (the w+k-1 guarantee covers the shared
    // tail), natural pairs stay rare, per-doc fingerprint counts obey
    // the density bounds ceil(windows/w) <= fps <= windows, and the
    // nightly index probe equals the full recompute on the planted
    // split. Fingerprints are content-derived (like CDC boundaries)
    // so the gate pins corpus-level booleans, never per-pair rows
    "q_dedup_winnow" -> ((s: SparkSession, dir: String) => {
      val dd = graft.pipeline.Dedup
      val docs = t(s, dir, "documents")
        .filter(F.col("text").isNotNull && F.col("n_chars") >= 400)
        .select(F.col("doc_id"), F.col("text"))
      val planted = docs.unionByName(docs.select(
        (F.col("doc_id") + 1000000L).as("doc_id"),
        F.concat(F.lit("a freshly rewritten introduction that shares nothing "),
          F.expr("substring(text, 60)")).as("text")))
      val pairs = dd.winnowOverlapPairs(planted, "doc_id", "text",
        k = 5, w = 8, minShared = 2, maxBucket = 10000)
        .select(F.col("id_a"), F.col("id_b"))
        .localCheckpoint(false)
      val nBase = docs.count()
      val nFound = pairs
        .filter(F.col("id_b") === F.col("id_a") + 1000000L).count()
      val nNatural = pairs
        .filter(F.col("id_a") < 1000000L && F.col("id_b") < 1000000L).count()
      val densityBad = dd.winnowFingerprints(planted, "doc_id", "text", 5, 8)
        .groupBy(F.col("id")).agg(F.count(F.lit(1)).as("__c"))
        .join(planted.select(F.col("doc_id").as("id"),
          F.size(graft.pipeline.TextFunctions
            .allWordNgrams(F.col("text"), 5)).as("__n")), "id")
        .filter(F.col("__n") >= 8)
        .filter(F.col("__c") < F.ceil((F.col("__n") - 7).cast("double") / 8.0) ||
          F.col("__c") > F.col("__n") - 7)
        .count()
      val old = planted.filter(F.col("doc_id") < 1000000L)
      val fresh = planted.filter(F.col("doc_id") >= 1000000L)
      val idx = dd.buildWinnowIndex(old, "doc_id", "text", 5, 8, maxBucket = 10000)
      val inc = dd.incrementalWinnowOverlap(fresh, idx, "doc_id", "text", 5, 8,
          minShared = 2)
        .select(F.col("id_new"), F.col("id_old"), F.col("shared_fps"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val fullDir = dd.winnowOverlapPairs(planted, "doc_id", "text", 5, 8,
          minShared = 2, maxBucket = 10000)
        .filter(F.col("id_b") >= 1000000L && F.col("id_a") < 1000000L)
        .select(F.col("id_b"), F.col("id_a"), F.col("shared_fps"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      s.range(1).select(
        F.lit(nBase).as("n_base"),
        F.lit(nFound >= (nBase * 9L + 9L) / 10L).as("found_ok"),
        F.lit(nNatural <= nBase / 10L).as("no_hallucination"),
        F.lit(densityBad == 0L).as("density_ok"),
        F.lit(inc == fullDir).as("incremental_ok"))
    }),

    "q_dedup_cdc" -> ((s: SparkSession, dir: String) => {
      val dd = graft.pipeline.Dedup
      val docs = t(s, dir, "documents")
        .filter(F.col("text").isNotNull && F.col("n_chars") >= 400)
        .select(F.col("doc_id"), F.col("text"))
      val planted = docs.unionByName(docs.select(
        (F.col("doc_id") + 1000000L).as("doc_id"),
        F.concat(F.lit("a freshly rewritten introduction that shares nothing "),
          F.expr("substring(text, 60)")).as("text")))
      val chunks = dd.cdcChunks(planted, "doc_id", "text",
        minSize = 16, avgSize = 32, maxSize = 128)
      val coversBad = chunks.groupBy("id")
        .agg(F.sum(F.col("len")).as("__sum"))
        .join(planted.select(F.col("doc_id").as("id"),
          F.length(F.col("text")).as("__n")), "id")
        .filter(F.col("__sum") =!= F.col("__n")).count()
      val pairs = dd.chunkOverlapPairs(planted, "doc_id", "text",
        minShared = 2, minSize = 16, avgSize = 32, maxSize = 128)
        .select(F.col("id_a"), F.col("id_b"))
        .localCheckpoint(false)
      val nBase = docs.count()
      val nFound = pairs
        .filter(F.col("id_b") === F.col("id_a") + 1000000L).count()
      val nNatural = pairs
        .filter(F.col("id_a") < 1000000L && F.col("id_b") < 1000000L).count()
      s.range(1).select(
        F.lit(nBase).as("n_base"),
        F.lit(coversBad == 0L).as("covers_ok"),
        F.lit(nFound >= (nBase * 9L + 9L) / 10L).as("found_ok"),
        F.lit(nNatural <= nBase / 10L).as("no_hallucination"))
    }),

    // T5-style span corruption (denoising objective prep): sentinel
    // spans replace deterministic integer-math-placed token runs. The
    // per-doc corrupted/span counts are EXACT integer formulas —
    // replayed verbatim in SQL — and the inverse splice reconstructing
    // every document pins as a boolean
    "q_span_corruption" -> ((s: SparkSession, dir: String) => {
      val SC = graft.pipeline.SpanCorruption
      val docs = t(s, dir, "documents").filter(F.col("text").isNotNull)
        .select(F.col("doc_id"), F.col("text"))
      val out = SC.corrupt(docs, "doc_id", "text", 15, 100, 3, seed = 11L)
      val sep = java.util.regex.Pattern.compile("\\s+")
      val recU = F.udf((in: Seq[String], tg: Seq[String], t: String) =>
        in != null && tg != null &&
          graft.pipeline.SpanCorruption.reconstruct(in, tg) ==
            sep.split(t).filter(_.nonEmpty).toSeq)
      val sentU = F.udf((in: Seq[String], tg: Seq[String], spans: Long) =>
        in != null &&
          in.count(x => x.startsWith("<extra_id_") && x.endsWith(">")) == spans &&
          (spans == 0L || tg.lastOption.contains(
            graft.pipeline.SpanCorruption.sentinel(spans.toInt))))
      out.select(F.col("doc_id"), F.col("n_tokens"), F.col("n_corrupted"),
          F.col("n_spans"),
          recU(F.col("input_tokens"), F.col("target_tokens"), F.col("text"))
            .as("reconstructs"),
          sentU(F.col("input_tokens"), F.col("target_tokens"), F.col("n_spans"))
            .as("sentinel_ok"))
        .orderBy("doc_id")
    }),

    // incremental CDC overlap: the partial-overlap twins arrive as a
    // nightly batch probing a persisted chunk index of the history —
    // history never re-chunked; corpus-level booleans as in q_dedup_cdc
    "q_dedup_cdc_incremental" -> ((s: SparkSession, dir: String) => {
      val dd = graft.pipeline.Dedup
      val docs = t(s, dir, "documents")
        .filter(F.col("text").isNotNull && F.col("n_chars") >= 400)
        .select(F.col("doc_id"), F.col("text"))
      val path = System.getProperty("java.io.tmpdir") + "/graft_q_cdc_idx"
      dd.saveSignatureIndex(dd.buildChunkIndex(docs, "doc_id", "text",
        minSize = 16, avgSize = 32, maxSize = 128), path)
      val batch = docs.select(
        (F.col("doc_id") + 1000000L).as("doc_id"),
        F.concat(F.lit("a freshly rewritten introduction that shares nothing "),
          F.expr("substring(text, 60)")).as("text"))
      val inc = dd.incrementalChunkOverlap(batch,
          dd.loadSignatureIndex(s, path), "doc_id", "text",
          minShared = 2, minSize = 16, avgSize = 32, maxSize = 128)
        .localCheckpoint(false)
      val nBase = docs.count()
      val nFound = inc
        .filter(F.col("id_old") === F.col("id_new") - 1000000L).count()
      val nJunk = inc
        .filter(F.col("id_old") =!= F.col("id_new") - 1000000L).count()
      s.range(1).select(
        F.lit(nBase).as("n_base"),
        F.lit(nFound >= (nBase * 9L + 9L) / 10L).as("found_ok"),
        // directed natural overlap: up to twice q_dedup_cdc's
        // undirected natural count, plus slack
        F.lit(nJunk <= nBase / 4L).as("no_junk"))
    }),

    // STREAMING partial-overlap detection: the twins replayed as
    // one-file micro-batches through streamChunkOverlap (per-batch
    // dynamic overwrite of its own pair results); the folded results
    // must satisfy the same recall/junk booleans as the batch form —
    // its oracle, shared by structure
    "q_stream_cdc_overlap" -> ((s: SparkSession, dir: String) => {
      val dd = graft.pipeline.Dedup
      val docs = t(s, dir, "documents")
        .filter(F.col("text").isNotNull && F.col("n_chars") >= 400)
        .select(F.col("doc_id"), F.col("text"))
      val base = System.getProperty("java.io.tmpdir") + "/graft_q_stream_cdc"
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      dd.saveSignatureIndex(dd.buildChunkIndex(docs, "doc_id", "text",
        minSize = 16, avgSize = 32, maxSize = 128), s"$base/idx")
      val batch = docs.select(
        (F.col("doc_id") + 1000000L).as("doc_id"),
        F.concat(F.lit("a freshly rewritten introduction that shares nothing "),
          F.expr("substring(text, 60)")).as("text"))
      val src = s"$base/src"
      batch.repartition(3).write.mode("overwrite").parquet(src)
      val q = dd.streamChunkOverlap(
          s.readStream.schema(batch.schema)
            .option("maxFilesPerTrigger", 1).parquet(src),
          s"$base/idx", s"$base/out", "doc_id", "text",
          minShared = 2, minSize = 16, avgSize = 32, maxSize = 128)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", s"$base/ckpt")
        .start()
      q.awaitTermination()
      val inc = s.read.parquet(s"$base/out")
        .select("id_new", "id_old").localCheckpoint(false)
      val nBase = docs.count()
      val nFound = inc
        .filter(F.col("id_old") === F.col("id_new") - 1000000L).count()
      val nJunk = inc
        .filter(F.col("id_old") =!= F.col("id_new") - 1000000L).count()
      s.range(1).select(
        F.lit(nBase).as("n_base"),
        F.lit(nFound >= (nBase * 9L + 9L) / 10L).as("found_ok"),
        F.lit(nJunk <= nBase / 4L).as("no_junk"))
    }),

    // streaming winnowing overlap: micro-batches probe the persisted
    // fingerprint index (q_stream_cdc_overlap protocol — per-batch
    // dynamic overwrite, replay-idempotent); shares the planted
    // suffix-share expectations with q_dedup_winnow
    "q_stream_winnow" -> ((s: SparkSession, dir: String) => {
      val dd = graft.pipeline.Dedup
      val docs = t(s, dir, "documents")
        .filter(F.col("text").isNotNull && F.col("n_chars") >= 400)
        .select(F.col("doc_id"), F.col("text"))
      val base = System.getProperty("java.io.tmpdir") + "/graft_q_stream_winnow"
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      dd.saveSignatureIndex(dd.buildWinnowIndex(docs, "doc_id", "text",
        k = 5, w = 8, maxBucket = 10000), s"$base/idx")
      val batch = docs.select(
        (F.col("doc_id") + 1000000L).as("doc_id"),
        F.concat(F.lit("a freshly rewritten introduction that shares nothing "),
          F.expr("substring(text, 60)")).as("text"))
      val src = s"$base/src"
      batch.repartition(3).write.mode("overwrite").parquet(src)
      val q = dd.streamWinnowOverlap(
          s.readStream.schema(batch.schema)
            .option("maxFilesPerTrigger", 1).parquet(src),
          s"$base/idx", s"$base/out", "doc_id", "text",
          k = 5, w = 8, minShared = 2)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", s"$base/ckpt")
        .start()
      q.awaitTermination()
      val inc = s.read.parquet(s"$base/out")
        .select("id_new", "id_old").localCheckpoint(false)
      val nBase = docs.count()
      val nFound = inc
        .filter(F.col("id_old") === F.col("id_new") - 1000000L).count()
      val nJunk = inc
        .filter(F.col("id_old") =!= F.col("id_new") - 1000000L).count()
      s.range(1).select(
        F.lit(nBase).as("n_base"),
        F.lit(nFound >= (nBase * 9L + 9L) / 10L).as("found_ok"),
        F.lit(nJunk <= nBase / 4L).as("no_junk"))
    }),

    // dataset content manifest (versioning primitive): per-source row
    // counts + order-independent 60-bit xor content hashes — every
    // step (per-field md5 tuple encoding, 15-hex prefix to BIGINT,
    // bit_xor) replays verbatim in DuckDB, so the HASHES themselves
    // cross-engine match; tampering one document flags exactly its
    // source through diffManifests
    "q_manifest" -> ((s: SparkSession, dir: String) => {
      val sn = graft.pipeline.Snapshot
      val docs = t(s, dir, "documents")
      val man = sn.manifest(docs, Seq("source"), Seq("doc_id", "text"))
      val tampered = docs.withColumn("text",
        F.when(F.col("doc_id") === 7L, F.concat(F.coalesce(F.col("text"),
          F.lit("")), F.lit("!"))).otherwise(F.col("text")))
      val d = sn.diffManifests(man,
        sn.manifest(tampered, Seq("source"), Seq("doc_id", "text")),
        Seq("source"))
      man.join(d, Seq("source"))
        .select(F.col("source"), F.col("n_rows"), F.col("content_hash"),
          F.col("status"))
        .orderBy("source")
    }),

    // in-context-pretraining packing: semantic document ordering (IVF
    // cell, then descending centroid similarity) feeds the exact
    // token-stream packer, so related documents share context windows.
    // Slot totals and sequence counts replay exactly in SQL; the
    // adjacency gain (mean adjacent-pair cosine under the semantic
    // order strictly beats the id order) pins as a boolean
    "q_pack_semantic" -> ((s: SparkSession, dir: String) => {
      val emb = t(s, dir, "embeddings")
        .filter(F.col("embedding").isNotNull)
        .select(F.col("vec_id").cast("long").as("vec_id"), F.col("embedding"))
      val docs = t(s, dir, "documents")
        .filter(F.col("text").isNotNull)
        .select(F.col("doc_id"), F.col("text"))
      val joined = docs.join(emb, docs("doc_id") === emb("vec_id"))
        .select(F.col("doc_id"), F.col("text"), F.col("embedding"))
      val idx = graft.pipeline.Similarity.buildIvfIndex(
        joined.select(F.col("doc_id").as("vec_id"), F.col("embedding")),
        "vec_id", "embedding", nlist = 16, iterations = 2)
      val so = graft.pipeline.Packing.semanticOrder(
          joined, "doc_id", "embedding", idx)
        .withColumn("n_tokens", F.size(F.filter(
          F.split(F.col("text"), "\\s+"),
          (x: Column) => F.length(x) > 0)).cast("long"))
        .localCheckpoint(false)
      val layout = graft.pipeline.Packing.packTokenStream(
        so, "ord", F.col("n_tokens"), 512L)
      def meanAdj(order: Column): Double = {
        val w = org.apache.spark.sql.expressions.Window.orderBy(order)
        val r = so.withColumn("__prev", F.lag(F.col("embedding"), 1).over(w))
          .filter(F.col("__prev").isNotNull)
          .agg(F.avg(graft.pipeline.Similarity.cosine(
            F.col("embedding"), F.col("__prev")))).head()
        if (r.isNullAt(0)) 0.0 else r.getDouble(0)
      }
      val gain = meanAdj(F.col("ord")) > meanAdj(F.col("doc_id"))
      layout.agg(
        F.count(F.lit(1)).as("n_docs"),
        F.max(F.col("token_offset") + F.col("n_tokens") + 1L).as("total_slots"),
        (F.max(F.col("last_seq")) + 1L).as("n_seqs"))
        .withColumn("adjacency_gain", F.lit(gain))
    }),

    // the COMPOSED end-to-end curation pipeline the r11 operators were
    // built for, run as one chain: CDC partial-overlap dedup ->
    // duplicate downweighting -> cross-split leakage audit -> semantic
    // packing order -> token-stream packing -> dataset manifest. The
    // individually-gated stages compose deterministically (md5 rules,
    // frozen centroids, content-derived boundaries), so the gate pins
    // the exact input count plus stage-to-stage invariants: survivor
    // bounds, the audit's row budget, slot conservation through the
    // packer, and manifest stability across two independent runs of
    // the whole lazy chain (any nondeterminism upstream flips the xor).
    "q_pipeline_curation" -> ((s: SparkSession, dir: String) => {
      val D = graft.pipeline.Dedup
      val docs = t(s, dir, "documents").filter(F.col("text").isNotNull)
        .select(F.col("doc_id"), F.col("text"))
      val emb = t(s, dir, "embeddings").filter(F.col("embedding").isNotNull)
        .select(F.col("vec_id").cast("long").as("vec_id"), F.col("embedding"))
      val nIn = docs.count()
      // 1. CDC dedup: drop every partial-overlap cluster's non-reps
      val losers = D.duplicateClusters(
          D.chunkOverlapPairs(docs, "doc_id", "text", minShared = 2))
        .filter(F.col("id") =!= F.col("cluster"))
        .select(F.col("id").as("doc_id"))
      val deduped = docs.join(losers, Seq("doc_id"), "left_anti")
        .localCheckpoint(eager = false)
      val nDedup = deduped.count()
      // 2. soft dedup: each minhash cluster survives at 1/|cluster|
      // (rowsPerBand 8 — the b_pipeline candidate-flood tuning)
      val weighted = D.downweightDuplicates(deduped, "doc_id", "text",
          shingleSize = 5, threshold = 0.8, bands = 16, rowsPerBand = 8)
        .select("doc_id", "text").localCheckpoint(eager = false)
      val nDown = weighted.count()
      // 3. eval-hygiene audit over the curated corpus (md5 split rule)
      val audited = weighted.withColumn("sp",
        F.when(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
          < "cccd", "train").otherwise("val"))
      val leakRows = graft.pipeline.Decontaminate.splitLeakageMatrix(
        audited, "doc_id", "text", "sp").count()
      // 4. semantic order + token-stream packing over the survivors
      val joined = weighted.join(emb, weighted("doc_id") === emb("vec_id"))
        .select(F.col("doc_id"), F.col("text"), F.col("embedding"))
      val idx = graft.pipeline.Similarity.buildIvfIndex(
        joined.select(F.col("doc_id").as("vec_id"), F.col("embedding")),
        "vec_id", "embedding", nlist = 16, iterations = 2)
      val so = graft.pipeline.Packing.semanticOrder(
          joined, "doc_id", "embedding", idx)
        .withColumn("n_tokens", F.size(F.filter(
          F.split(F.col("text"), "\\s+"),
          (x: Column) => F.length(x) > 0)).cast("long"))
        .localCheckpoint(eager = false)
      val layout = graft.pipeline.Packing.packTokenStream(
          so, "ord", F.col("n_tokens"), 512L)
        .localCheckpoint(eager = false)
      // slot conservation: every doc contributes n_tokens+1 slots and
      // the cumsum's last slot equals their exact long sum
      val a = layout.agg(
        F.count(F.lit(1)).as("n"),
        F.sum(F.col("n_tokens") + 1L).as("slots"),
        F.max(F.col("token_offset") + F.col("n_tokens") + 1L).as("hi")).head()
      val conserved = a.getLong(0) > 0 && a.getLong(1) == a.getLong(2)
      // 5. manifest of the packed dataset — twice, order-independent
      def mf() = graft.pipeline.Snapshot.manifest(
          layout.select(F.col("ord"), F.col("token_offset"),
            F.col("first_seq"), F.col("last_seq")),
          Seq.empty, Seq("ord", "token_offset", "first_seq", "last_seq"))
        .select("n_rows", "content_hash").head()
      val m1 = mf(); val m2 = mf()
      val stable = m1 == m2 && m1.getLong(0) == a.getLong(0)
      s.range(1).select(
        F.lit(nIn).as("n_input"),
        F.lit(nDedup <= nIn && nDedup * 2L >= nIn).as("dedup_ok"),
        F.lit(nDown <= nDedup && nDown * 2L >= nDedup).as("downweight_ok"),
        F.lit(leakRows <= 1L).as("leak_audit_ok"),
        F.lit(conserved).as("tokens_conserved"),
        F.lit(stable).as("manifest_stable"))
    }),

    // CONTINUOUS manifest maintenance: the corpus replayed as
    // one-file micro-batches through streamManifest (per-batch delta
    // rows under their own __batch partition — a replayed batch
    // replaces its own rows, which xor folding REQUIRES: an appended
    // duplicate delta would cancel the hash out); the folded view
    // must equal the one-shot manifest, hashes and all
    "q_stream_manifest" -> ((s: SparkSession, dir: String) => {
      val sn = graft.pipeline.Snapshot
      val docs = t(s, dir, "documents").select("doc_id", "source", "text")
      val base = System.getProperty("java.io.tmpdir") + "/graft_q_stream_man"
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      val src = s"$base/src"
      docs.repartition(3).write.mode("overwrite").parquet(src)
      val q = sn.streamManifest(
          s.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1).parquet(src),
          s"$base/man", Seq("source"), Seq("doc_id", "text"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", s"$base/ckpt")
        .start()
      q.awaitTermination()
      sn.loadManifest(s, s"$base/man", Seq("source"))
        .orderBy("source")
    }),

    // CLIP-style image-text alignment curation: even ids pair with
    // their own embedding (a dual encoder that agrees → cos 1), odd
    // ids with their even neighbor's (mismatched caption → natural
    // cosine, far below threshold in this corpus); the cosine replays
    // in SQL from the embedding arrays, so scores themselves match at
    // 4 dp and the aligned flag is exact
    "q_multimodal_align" -> ((s: SparkSession, dir: String) => {
      val emb = t(s, dir, "embeddings")
        .filter(F.col("embedding").isNotNull)
        .select(F.col("vec_id").cast("long").as("vec_id"), F.col("embedding"))
      val img = emb.select(F.col("vec_id"), F.col("embedding").as("img"))
      val txt = emb.select(F.col("vec_id").as("tid"), F.col("embedding").as("txt"))
      val pairs = emb.select(F.col("vec_id"),
          F.when(F.col("vec_id") % 2 === 0, F.col("vec_id"))
            .otherwise(F.col("vec_id") - 1L).as("tid"))
        .join(img, "vec_id")
        .join(txt, "tid")
      graft.pipeline.Multimodal.alignmentScores(pairs, "img", "txt")
        .select(F.col("vec_id"),
          (F.col("alignment") >= 0.999).as("aligned"),
          F.round(F.col("alignment"), 4).as("score4"))
        .orderBy("vec_id")
    }),

    // per-source dataset card: every scalar column replays exactly in
    // DuckDB (strlen = bytes; dup = count - distinct texts; language
    // mode with the deterministic (count, tag) tie-break); the length
    // median pins at rank tolerance vs the exact order statistic
    "q_datacard" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents")
      val card = graft.pipeline.DataCard.sourceCards(
        docs, "source", "lang", "text")
      val exact = docs.filter(F.col("text").isNotNull)
        .groupBy(F.col("source"))
        .agg(F.sort_array(F.collect_list(F.length(F.col("text")).cast("double")))
            .as("__sl"),
          F.count(F.lit(1)).as("__n"))
      card.join(exact, "source")
        .select(F.col("source"), F.col("n_docs"), F.col("bytes"),
          F.col("n_langs"), F.col("dup_docs"),
          F.col("top_lang"), F.col("top_lang_docs"),
          ok(G.ddsketch_quantile(F.col("len_sketch"), 0.5),
            rankValue(F.col("__sl"), F.col("__n"), 0.5), RankTol).as("p50_ok"))
        .orderBy("source")
    }),

    // CONTINUOUS card maintenance: the corpus replayed as a
    // multi-micro-batch stream through streamCardViews (per-batch
    // dynamic overwrite in all four views — replay-safe), then the
    // card read from view rows. Shares q_datacard's oracle: the
    // merges are exact at any batching
    "q_stream_datacard" -> ((s: SparkSession, dir: String) => {
      Graft.register(s)
      val DC = graft.pipeline.DataCard
      val docs = t(s, dir, "documents")
        .withColumn("ts",
          F.lit(java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))
        .select("doc_id", "source", "lang", "text", "ts")
      val tmp = System.getProperty("java.io.tmpdir") + "/graft_q_stream_dc_src"
      docs.repartition(4).write.mode("overwrite").parquet(tmp)
      val base = System.getProperty("java.io.tmpdir") + "/graft_q_stream_dc"
      val fs = org.apache.hadoop.fs.FileSystem.get(
        s.sparkContext.hadoopConfiguration)
      // stale views/checkpoint would replay mismatched batch ids —
      // both start fresh each run (the q_stream_view rule)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      fs.delete(new org.apache.hadoop.fs.Path(base + "_ck"), true)
      val q = DC.streamCardViews(
          s.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "1").parquet(tmp),
          "source", "lang", "text", "ts", base)
        .option("checkpointLocation", base + "_ck")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val card = DC.cardsFromViews(s, base)
      val exact = docs.filter(F.col("text").isNotNull)
        .groupBy(F.col("source"))
        .agg(F.sort_array(F.collect_list(F.length(F.col("text")).cast("double")))
            .as("__sl"),
          F.count(F.lit(1)).as("__n"))
      card.join(exact, "source")
        .select(F.col("source"), F.col("n_docs"), F.col("bytes"),
          F.col("n_langs"), F.col("dup_docs"),
          F.col("top_lang"), F.col("top_lang_docs"),
          ok(G.ddsketch_quantile(F.col("len_sketch"), 0.5),
            rankValue(F.col("__sl"), F.col("__n"), 0.5), RankTol).as("p50_ok"))
        .orderBy("source")
    }),

    // the nightly-ops card: four persisted sketch views (len/bytes/
    // texts-KMV/langs) materialized on half the corpus and APPENDED
    // with the other half, then the card computed from view rows alone
    // — counts/sums/KMV unions are exact merges, so it shares
    // q_datacard's oracle verbatim (the one corpus read below is the
    // verification side's exact-p50 frame, same as q_datacard)
    "q_datacard_view" -> ((s: SparkSession, dir: String) => {
      Graft.register(s)
      val DC = graft.pipeline.DataCard
      val docs = t(s, dir, "documents")
        .withColumn("ts", F.lit(java.sql.Timestamp.valueOf("2026-01-01 00:00:00")))
      val base = System.getProperty("java.io.tmpdir") + "/graft_q_datacard_view"
      DC.materializeCardViews(docs.filter(F.col("doc_id") % 2 === 0),
        "source", "lang", "text", "ts", base)
      DC.appendCardViews(docs.filter(F.col("doc_id") % 2 =!= 0),
        "source", "lang", "text", "ts", base)
      val card = DC.cardsFromViews(s, base)
      val exact = docs.filter(F.col("text").isNotNull)
        .groupBy(F.col("source"))
        .agg(F.sort_array(F.collect_list(F.length(F.col("text")).cast("double")))
            .as("__sl"),
          F.count(F.lit(1)).as("__n"))
      card.join(exact, "source")
        .select(F.col("source"), F.col("n_docs"), F.col("bytes"),
          F.col("n_langs"), F.col("dup_docs"),
          F.col("top_lang"), F.col("top_lang_docs"),
          ok(G.ddsketch_quantile(F.col("len_sketch"), 0.5),
            rankValue(F.col("__sl"), F.col("__n"), 0.5), RankTol).as("p50_ok"))
        .orderBy("source")
    }),

    // Gale-Church sentence alignment on planted bitext: src and tgt
    // are the SAME constructed sentence-d document (the q_sentences
    // fixture), so equal lengths make every bead the free 1:1 and the
    // alignment is the exact diagonal — full rows replay from the
    // sentence-count arithmetic in SQL
    "q_bitext_align" -> ((s: SparkSession, dir: String) => {
      val clean = F.regexp_replace(F.col("text"), "[.!?]", "")
      val toks = F.filter(F.split(clean, "\\s+"),
        (tk: Column) => F.length(tk) > 0)
      val base = t(s, dir, "documents")
        .filter(F.col("text").isNotNull)
        .select(F.col("doc_id"), toks.as("__toks"))
        .filter(F.size(F.col("__toks")) >= 1)
      val nChunks = F.ceil(F.size(F.col("__toks")).cast("double") / F.lit(5.0))
        .cast("int")
      val constructed = base.select(F.col("doc_id"),
        F.array_join(F.transform(F.sequence(F.lit(0), nChunks - 1),
          i => F.array_join(F.slice(F.col("__toks"), i * 5 + 1, F.lit(5)), " ")),
          ". ").as("__t"))
      val pairs = constructed.select(F.col("doc_id"),
        F.col("__t").as("src"), F.col("__t").as("tgt"))
      graft.pipeline.Align.alignSentences(pairs, "doc_id", "src", "tgt")
        .select(F.col("doc_id"), F.col("bead").cast("long").as("bead"),
          F.col("src_start").cast("long").as("src_start"),
          F.col("src_len").cast("long").as("src_len"),
          F.col("tgt_start").cast("long").as("tgt_start"),
          F.col("tgt_len").cast("long").as("tgt_len"))
        .orderBy("doc_id", "bead")
    }),

    // safetensors embedding interchange: sharded write (streamed
    // bytes), seek-based read, exact F32/I64 round trip
    "q_safetensors" -> ((s: SparkSession, dir: String) => {
      val emb = t(s, dir, "embeddings").filter(F.col("embedding").isNotNull)
      val path = System.getProperty("java.io.tmpdir") + "/graft_q_safetensors"
      val fs = org.apache.hadoop.fs.FileSystem.get(
        s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)  // stale shards
      graft.sources.Safetensors.write(
        emb.repartition(4), F.col("vec_id"), F.col("embedding"), path)
      graft.sources.Safetensors.read(s, path)
        .join(emb.select(F.col("vec_id").as("id"),
          F.col("embedding").as("orig")), "id")
        .agg(F.count(F.lit(1)).as("n_vectors"),
          (F.sum(F.when(F.col("embedding") === F.col("orig"), 1L)
            .otherwise(0L)) === F.count(F.lit(1))).as("roundtrip_ok"))
    }),

    // bf16 safetensors: the read must equal the driver-side
    // round-to-nearest-even reference EXACTLY element-for-element (the
    // codec is deterministic integer bit math), and ids round-trip
    "q_safetensors_bf16" -> ((s: SparkSession, dir: String) => {
      val emb = t(s, dir, "embeddings").filter(F.col("embedding").isNotNull)
      val path = System.getProperty("java.io.tmpdir") + "/graft_q_st_bf16"
      val fs = org.apache.hadoop.fs.FileSystem.get(
        s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(path), true) // stale shards
      graft.sources.Safetensors.write(
        emb.repartition(4), F.col("vec_id"), F.col("embedding"), path,
        dtype = "BF16")
      val refU = F.udf((v: Seq[Float]) =>
        if (v == null) null
        else v.map(f => graft.sources.Safetensors.bf16ToFloat(
          graft.sources.Safetensors.bf16Bits(f))).toArray)
      val dtypeOk = {
        val shard = fs.globStatus(
          new org.apache.hadoop.fs.Path(path, "*.safetensors"))
          .head.getPath.toString
        graft.sources.Safetensors.listTensors(s, shard)
          .exists(ti => ti.name == "embeddings" && ti.dtype == "BF16")
      }
      graft.sources.Safetensors.read(s, path)
        .join(emb.select(F.col("vec_id").as("id"),
          refU(F.col("embedding")).as("ref")), "id")
        .agg(F.count(F.lit(1)).as("n_vectors"),
          (F.sum(F.when(F.col("embedding") === F.col("ref"), 1L)
            .otherwise(0L)) === F.count(F.lit(1))).as("roundtrip_ok"),
          F.lit(dtypeOk).as("dtype_ok"))
    }),

    // crawl-frontier politeness schedule: per-host serialized fetch
    // slots (priority DESC, url ASC), hosts parallel — pure window
    // arithmetic over synthesized URLs, full-row replay in SQL
    "q_crawl_schedule" -> ((s: SparkSession, dir: String) => {
      val id = F.col("doc_id")
      val url = F.concat(F.lit("https://host"), (id % 20).cast("string"),
        F.lit(".example.com/page"), id.cast("string"))
      val frontier = t(s, dir, "documents")
        .select(id.as("doc_id"), url.as("url"), (id % 7).as("priority"))
      graft.pipeline.Urls
        .crawlSchedule(frontier, "url", 5000L, 1700000000000L, Some("priority"))
        .select(F.col("doc_id"), F.col("url"), F.col("host"),
          F.col("slot"), F.col("fetch_at_ms"))
        .orderBy("host", "slot")
    }),

    "q_boilerplate" -> ((s: SparkSession, dir: String) => {
      val bp = graft.pipeline.Boilerplate
      val docs = t(s, dir, "documents")
      // integer-math ceil of 78% document frequency — bit-identical in
      // any engine, unlike a double-multiply threshold
      val th = (78L * docs.count() + 99L) / 100L
      val freqCount = bp.frequentSegments(docs, "text", "\\s+", th)
        .agg(F.count(F.lit(1)).as("n_frequent"),
          F.coalesce(F.sum(F.col("doc_freq")), F.lit(0L)).as("df_sum"))
      val stripped = bp.stripBoilerplate(
        docs.withColumn("orig", F.col("text")), "text", "\\s+", " ", th)
      stripped.agg(
          F.count(F.lit(1)).as("docs"),
          F.sum(F.when(F.col("text") =!= F.col("orig"), 1L).otherwise(0L)).as("n_changed"),
          F.sum(F.length(F.col("text")).cast("long")).as("chars_after"),
          F.sum(F.size(bp.segments(F.col("text"), "\\s+")).cast("long")).as("words_after"))
        .crossJoin(F.broadcast(freqCount))
    }),

    // join-based boilerplate strip (no driver-side segment set): same
    // aggregates, same oracle verbatim — the two forms are row-equal
    "q_boilerplate_joined" -> ((s: SparkSession, dir: String) => {
      val bp = graft.pipeline.Boilerplate
      val docs = t(s, dir, "documents")
      val th = (78L * docs.count() + 99L) / 100L
      val freqCount = bp.frequentSegments(docs, "text", "\\s+", th)
        .agg(F.count(F.lit(1)).as("n_frequent"),
          F.coalesce(F.sum(F.col("doc_freq")), F.lit(0L)).as("df_sum"))
      val stripped = bp.stripBoilerplateJoined(
        docs.withColumn("orig", F.col("text")), "doc_id", "text", "\\s+", " ", th)
      stripped.agg(
          F.count(F.lit(1)).as("docs"),
          F.sum(F.when(F.col("text") =!= F.col("orig"), 1L).otherwise(0L)).as("n_changed"),
          F.sum(F.length(F.col("text")).cast("long")).as("chars_after"),
          F.sum(F.size(bp.segments(F.col("text"), "\\s+")).cast("long")).as("words_after"))
        .crossJoin(F.broadcast(freqCount))
    }),

    // END-TO-END curation pipeline: exact dedup → near-dup drop →
    // benchmark decontamination → quality filter → boilerplate strip →
    // train/val split. Every stage is an oracle-gated operator; this
    // query proves they compose (the full DuckDB replica runs the same
    // six stages as CTEs).
    "q_pipeline" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents")
      val bench = docs.filter(F.col("doc_id") % 17 === 0).select(F.col("text"))
      val d1 = graft.pipeline.Dedup.dropExactDuplicates(docs, "doc_id", "text")
      val d2 = graft.pipeline.Dedup.dropNearDuplicates(d1, "doc_id", "text",
        shingleSize = 5, threshold = 0.8, bands = 16, rowsPerBand = 8)
      val d3 = graft.pipeline.Decontaminate.dropContaminated(
        d2, "doc_id", "text", bench, "text", n = 5)
      // the chain runs under several driver actions (count, the
      // boilerplate frequent-set collect, the final write): checkpoint
      // the surviving set once so near-dup detection never replays
      val d4 = d3.filter(graft.pipeline.TextFunctions
        .qualityScore(F.col("text"), F.col("n_chars")) > 0.55)
        .localCheckpoint(eager = false)
      val th = (78L * d4.count() + 99L) / 100L
      val d5 = graft.pipeline.Boilerplate.stripBoilerplate(d4, "text", "\\s+", " ", th)
      val d6 = graft.pipeline.Sampling.splitByHash(d5, F.col("doc_id"),
        Seq("train" -> 0.9, "val" -> 0.1))
      d6.groupBy(F.col("split"), F.col("source"))
        .agg(F.count(F.lit(1)).as("docs"),
             F.sum(F.col("doc_id")).as("id_sum"),
             F.sum(F.length(F.col("text")).cast("long")).as("chars_after"))
        .orderBy("split", "source")
    }),

    // exact-k per-stratum sampling over the md5 order
    "q_sample_fixedk" -> ((s: SparkSession, dir: String) =>
      graft.pipeline.Sampling
        .stratifiedFixedK(t(s, dir, "documents"), F.col("source"), F.col("doc_id"), 7)
        .groupBy(F.col("source"))
        .agg(F.count(F.lit(1)).as("n"), F.sum(F.col("doc_id")).as("id_sum"))
        .orderBy("source")),

    "q_sample" -> ((s: SparkSession, dir: String) => {
      val sampling = graft.pipeline.Sampling
      val docs = t(s, dir, "documents")
      val inPlain = sampling.sampledBy(F.col("doc_id"), 0.25)
      val inStrat = sampling.stratifiedSample(docs, F.col("source"), F.col("doc_id"),
          Map("src0" -> 0.8, "src1" -> 0.1), defaultFraction = 0.25)
        .select(F.col("doc_id").as("__sid"))
      // conditional aggregation over all sources so a stratum with an
      // empty sample still yields its zero row
      docs.join(inStrat, F.col("doc_id") === F.col("__sid"), "left")
        .groupBy(F.col("source"))
        .agg(
          F.sum(F.when(inPlain, 1L).otherwise(0L)).as("n_plain"),
          F.sum(F.when(inPlain, F.col("doc_id")).otherwise(0L)).as("plain_id_sum"),
          F.sum(F.when(F.col("__sid").isNotNull, 1L).otherwise(0L)).as("n_strat"))
        .orderBy("source")
    }),

    // per-source capping: keep the 5 longest docs per source (top-K
    // generalization of canonical selection), exact window oracle
    "q_sample_topk" -> ((s: SparkSession, dir: String) => {
      graft.pipeline.Dedup.keepTopK(
          t(s, dir, "documents"), F.col("source"),
          Seq(F.col("n_chars").desc, F.col("doc_id").asc), 5)
        .groupBy(F.col("source"))
        .agg(F.count(F.lit(1)).as("kept"),
             F.sum(F.col("doc_id")).as("kept_id_sum"),
             F.min(F.col("n_chars")).as("min_len_kept"))
        .orderBy("source")
    }),

    // weighted sampling: keep-probability proportional to document
    // length (least(n_chars/1000, 1)) — the exact per-row md5 threshold
    // is replicated by the oracle via printf
    // fixed-size deterministic sample: exactly 100 documents by lowest
    // md5(doc_id) — no prior row count needed, engine-portable order
    "q_sample_bottomk" -> ((s: SparkSession, dir: String) => {
      graft.pipeline.Sampling
        .bottomK(t(s, dir, "documents"), F.col("doc_id"), 100)
        .select(F.col("doc_id"))
    }),

    // rebalance the corpus to a 2:1:1 target mixture over three sources
    // (others dropped); weights 0.5/0.25/0.25 are binary-exact so the
    // in-plan fraction math reproduces bit-identically in the oracle
    "q_rebalance" -> ((s: SparkSession, dir: String) => {
      graft.pipeline.Sampling
        .rebalanceToDistribution(t(s, dir, "documents"),
          F.col("source"), F.col("doc_id"),
          Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.25))
        .groupBy(F.col("source"))
        .agg(F.count(F.lit(1)).as("n_kept"),
             F.sum(F.col("doc_id")).cast("long").as("id_sum"))
        .orderBy(F.col("source"))
    }),

    // temperature-flattened mixture (alpha = 0.5): small sources keep
    // everything, large sources thin toward sqrt-proportional shares
    "q_mix_temperature" -> ((s: SparkSession, dir: String) => {
      graft.pipeline.Sampling
        .temperatureRebalance(t(s, dir, "documents"),
          F.col("source"), F.col("doc_id"), alpha = 0.5)
        .groupBy(F.col("source"))
        .agg(F.count(F.lit(1)).as("n_kept"),
             F.sum(F.col("doc_id")).cast("long").as("id_sum"))
        .orderBy(F.col("source"))
    }),

    // waterfilling a GLOBAL token budget across weighted domains
    // (frozen-λ breakpoint form): small sources saturate, the rest
    // split the remainder by weight; selection is the md5-ordered
    // prefix within each source's allocation. Exact integers out;
    // the oracle replays the same breakpoint math in SQL windows
    "q_mix_budget" -> ((s: SparkSession, dir: String) => {
      val weights = (0 until 64).map(i => s"src$i" -> (1.0 + i % 3)).toMap
      graft.pipeline.Sampling.waterfillMixture(
          t(s, dir, "documents"), F.col("source"), F.col("doc_id"),
          F.col("n_chars"), weights, budget = 100000L)
        .groupBy(F.col("source"))
        .agg(F.count(F.lit(1)).as("n_kept"),
             F.sum(F.col("n_chars")).cast("long").as("tok_sum"))
        .orderBy(F.col("source"))
    }),

    // per-source token budget: deterministic md5-ordered prefix whose
    // inclusive running token total stays <= 2000
    "q_token_budget" -> ((s: SparkSession, dir: String) => {
      val toks = F.coalesce(
        F.size(F.filter(F.split(F.col("text"), "\\s+"),
          (x: org.apache.spark.sql.Column) => F.length(x) > 0)).cast("long"),
        F.lit(0L))
      graft.pipeline.Sampling
        .takeTokenBudget(
          t(s, dir, "documents").withColumn("__tok", toks),
          F.col("source"), F.col("doc_id"), F.col("__tok"), budget = 2000L)
        .groupBy(F.col("source"))
        .agg(F.count(F.lit(1)).as("n_kept"),
             F.sum(F.col("__tok")).cast("long").as("tok_sum"),
             F.sum(F.col("doc_id")).cast("long").as("id_sum"))
        .orderBy(F.col("source"))
    }),

    // training-mixture build: strip duplicated substrings (keep-first)
    // -> temperature-flatten the source mixture -> cap each source at a
    // token budget. Composes three operators; the oracle replays the
    // identical chain in SQL
    "q_mixture_pipeline" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents")
      val stripped = graft.pipeline.Dedup
        .stripDuplicateSpans(docs, "doc_id", "text", k = 8)
      val rebal = graft.pipeline.Sampling.temperatureRebalance(
        stripped, F.col("source"), F.col("doc_id"), alpha = 0.5)
      val toks = F.coalesce(
        F.size(F.filter(F.split(F.col("text"), "\\s+"),
          (x: org.apache.spark.sql.Column) => F.length(x) > 0)).cast("long"),
        F.lit(0L))
      graft.pipeline.Sampling.takeTokenBudget(
          rebal.withColumn("__tok", toks),
          F.col("source"), F.col("doc_id"), F.col("__tok"), budget = 1500L)
        .groupBy(F.col("source"))
        .agg(F.count(F.lit(1)).as("n_kept"),
             F.sum(F.col("__tok")).cast("long").as("tok_sum"),
             F.sum(F.col("doc_id")).cast("long").as("id_sum"))
        .orderBy(F.col("source"))
    }),

    "q_sample_weighted" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents")
      val w = F.least(F.col("n_chars") / 1000.0, F.lit(1.0))
      graft.pipeline.Sampling.weightedSample(docs, F.col("doc_id"), w)
        .groupBy(F.col("source"))
        .agg(F.count(F.lit(1)).as("n_kept"),
             F.sum(F.col("doc_id")).as("kept_id_sum"))
        .orderBy("source")
    }),

    // text cleaning: normalization collapses whitespace variants into
    // shared keys; counts and lengths replicated exactly by the oracle
    "q_text_clean" -> ((s: SparkSession, dir: String) => {
      val tf = graft.pipeline.TextFunctions
      t(s, dir, "documents")
        .withColumn("nt", tf.normalizeText(F.col("text")))
        .groupBy(F.col("source"))
        .agg(
          F.countDistinct(F.col("nt")).as("distinct_norm"),
          F.sum(F.length(F.col("nt"))).as("norm_chars"),
          F.sum(F.length(F.col("text"))).as("raw_chars"))
        .orderBy("source")
    }),

    // SimHash near-dup candidates: recall against the exact jaccard>=0.8
    // pair set (SimHash tracks feature-vector cosine, not Jaccard, so
    // recall < 1 is possible by design — the oracle pins the true pair
    // count and a recall floor, not the exact pair list)
    "q_dedup_simhash" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents")
      val truePairs = graft.pipeline.Dedup.nearDuplicatePairs(
          docs, "doc_id", "text", shingleSize = 5, threshold = 0.8,
          bands = 32, rowsPerBand = 4)
        .select("id_a", "id_b")
      val sim = graft.pipeline.Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 6)
        .select("id_a", "id_b")
      val trueCnt = truePairs.count()
      val foundCnt = truePairs.intersect(sim).count()
      s.range(1).select(
        F.lit(trueCnt).as("true_pairs"),
        F.lit(foundCnt >= (trueCnt * 0.9).ceil.toLong).as("recall_ok"))
    }),

    // embedding ANN: exact brute-force cosine top-5 for query vectors 0-4
    "q_embed_topk" -> ((s: SparkSession, dir: String) => {
      val emb = t(s, dir, "embeddings")
      graft.pipeline.Similarity.bruteForceTopK(
          emb, emb.filter(F.col("vec_id") < 5), "vec_id", "embedding", 5)
        .select(F.col("query_id"), F.col("rank").cast("long").as("rank"),
                F.col("neighbor_id"))
        .orderBy("query_id", "rank")
    }),

    // contrastive hard-negative mining: for 10 query vectors, the 5
    // most-similar items with a DIFFERENT lang label (vec_id ≡ doc_id
    // in the testdata) — near-boundary negatives for embedding
    // training; exact ranks, label filter before the rank window
    "q_mine_hard" -> ((s: SparkSession, dir: String) => {
      val emb = t(s, dir, "embeddings")
      val lab = t(s, dir, "documents").select(
        F.col("doc_id").as("vec_id"), F.col("lang"))
      val items = emb.join(lab, "vec_id")
      graft.pipeline.Similarity.hardNegatives(
          items, items.filter(F.col("vec_id") < 10), "vec_id", "embedding",
          "lang", 5)
        .select(F.col("query_id"), F.col("rank").cast("long").as("rank"),
          F.col("neighbor_id"), F.col("query_label"), F.col("neighbor_label"))
        .orderBy("query_id", "rank")
    }),

    // embedding ANN: LSH-bucketed variant. Hyperplanes are hash-derived
    // (Similarity.planeCoef) so recall per dataset is a deterministic
    // constant — measured 20-25/25 at tables=16 across sf0.001/0.01/0.1;
    // the oracle pins a 0.7 recall floor plus the exact-pair count
    // (= 5 neighbors x the data-derived query count)
    "q_embed_lsh" -> ((s: SparkSession, dir: String) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(F.col("vec_id") < 5)
      val exact = graft.pipeline.Similarity
        .bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
        .select(F.col("query_id"), F.col("neighbor_id"))
      val approx = graft.pipeline.Similarity
        .lshTopK(emb, queries, "vec_id", "embedding", 5, tables = 16)
        .select(F.col("query_id"), F.col("neighbor_id"))
      val trueCnt = exact.count()
      val hits = exact.intersect(approx).count()
      s.range(1).select(
        F.lit(trueCnt).as("exact_pairs"),
        F.lit(hits >= (trueCnt * 0.7).ceil.toLong).as("recall_ok"))
    }),

    // embedding ANN: IVF (k-means cells) variant. Seeds are hash-ordered
    // so recall is near-constant, but centroid training sums floats in
    // partition order — the floor (0.6) leaves margin for that; measured
    // 21-22/25 at nprobe=8 across all three SFs
    "q_embed_ivf" -> ((s: SparkSession, dir: String) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(F.col("vec_id") < 5)
      val exact = graft.pipeline.Similarity
        .bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
        .select(F.col("query_id"), F.col("neighbor_id"))
      val approx = graft.pipeline.Similarity
        .ivfTopK(emb, queries, "vec_id", "embedding", 5, nlist = 16, nprobe = 8)
        .select(F.col("query_id"), F.col("neighbor_id"))
      val trueCnt = exact.count()
      val hits = exact.intersect(approx).count()
      s.range(1).select(
        F.lit(trueCnt).as("exact_pairs"),
        F.lit(hits >= (trueCnt * 0.6).ceil.toLong).as("recall_ok"))
    }),

    // embedding ANN: product-quantization codes + ADC scan + exact
    // rerank of a 100-candidate pool. Codebook seeds are hash-ordered
    // (ProductQuantization.trainPq) so recall is near-constant; the
    // 0.7 floor leaves margin for partition-order float sums in
    // training — measured 18-25/25 at m=16, ksub=16, pool=100 across
    // sf0.001/0.01/0.1
    "q_embed_pq" -> ((s: SparkSession, dir: String) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(F.col("vec_id") < 5)
      val exact = graft.pipeline.Similarity
        .bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
        .select(F.col("query_id"), F.col("neighbor_id"))
      val pq = graft.pipeline.ProductQuantization
      val cb = pq.trainPq(emb, "vec_id", "embedding", m = 16, ksub = 16, iterations = 2)
      val enc = pq.pqEncode(emb, "vec_id", "embedding", cb)
      val approx = pq
        .pqTopKReranked(cb, enc, emb, queries, "vec_id", "embedding", 5, poolSize = 100)
        .select(F.col("query_id"), F.col("neighbor_id"))
      val trueCnt = exact.count()
      val hits = exact.intersect(approx).count()
      s.range(1).select(
        F.lit(trueCnt).as("exact_pairs"),
        F.lit(hits >= (trueCnt * 0.7).ceil.toLong).as("recall_ok"))
    }),

    // embedding ANN: IVF-PQ — coarse k-means cells + residual PQ codes,
    // ADC scan of the probed cells, exact rerank. Measured 21/25 at
    // nprobe=8, pool=100 on every SF; floor 0.6 leaves margin for
    // partition-order float sums in both training stages
    "q_embed_ivfpq" -> ((s: SparkSession, dir: String) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(F.col("vec_id") < 5)
      val exact = graft.pipeline.Similarity
        .bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
        .select(F.col("query_id"), F.col("neighbor_id"))
      val pq = graft.pipeline.ProductQuantization
      val idx = pq.buildIvfPq(emb, "vec_id", "embedding",
        nlist = 16, m = 16, ksub = 16, iterations = 2)
      val approx = pq
        .ivfPqTopK(idx, emb, queries, "vec_id", "embedding", 5,
          nprobe = 8, poolSize = 100)
        .select(F.col("query_id"), F.col("neighbor_id"))
      val trueCnt = exact.count()
      val hits = exact.intersect(approx).count()
      s.range(1).select(
        F.lit(trueCnt).as("exact_pairs"),
        F.lit(hits >= (trueCnt * 0.6).ceil.toLong).as("recall_ok"))
    }),

    // embedding ANN: OPQ-rotated IVF-PQ — the learned orthogonal
    // rotation is part of the index; corpus and queries rotate into
    // the same space, so cell recall is preserved while PQ code
    // fidelity improves on correlated data (PqSpec proves the error
    // cut on an anisotropic fixture; this synthetic corpus is
    // isotropic, so the gate pins recall + the orthogonality invariant)
    "q_embed_opq" -> ((s: SparkSession, dir: String) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(F.col("vec_id") < 5)
      val exact = graft.pipeline.Similarity
        .bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
        .select(F.col("query_id"), F.col("neighbor_id"))
      val pq = graft.pipeline.ProductQuantization
      val idx = pq.buildOpqIvfPq(emb, "vec_id", "embedding",
        nlist = 16, m = 16, ksub = 16, iterations = 2, opqIters = 4)
      val approx = pq
        .opqIvfPqTopK(idx, emb, queries, "vec_id", "embedding", 5,
          nprobe = 8, poolSize = 100)
        .select(F.col("query_id"), F.col("neighbor_id"))
      val dim = idx.rotation.length
      var maxDev = 0.0
      var i = 0
      while (i < dim) {
        var j = 0
        while (j < dim) {
          var acc = 0.0
          var k2 = 0
          while (k2 < dim) {
            acc += idx.rotation(i)(k2).toDouble * idx.rotation(j)(k2).toDouble
            k2 += 1
          }
          val dev = math.abs(acc - (if (i == j) 1.0 else 0.0))
          if (dev > maxDev) maxDev = dev
          j += 1
        }
        i += 1
      }
      val trueCnt = exact.count()
      val hits = exact.intersect(approx).count()
      s.range(1).select(
        F.lit(trueCnt).as("exact_pairs"),
        F.lit(hits >= (trueCnt * 0.6).ceil.toLong).as("recall_ok"),
        F.lit(maxDev < 1e-4).as("rotation_orthogonal"))
    }),

    // binary (sign-bit) quantization ANN: hamming coarse scan + exact
    // cosine rerank. Planted exact copies share the signature
    // (hamming 0) so they always pool and rerank to rank 1; with the
    // pool covering the corpus the rerank is exhaustive and MUST
    // equal bruteForceTopK row-for-row (same cosine expression, same
    // tie-breaks) — the exactness contract, not a recall floor
    "q_ann_binary" -> ((s: SparkSession, dir: String) => {
      val bq = graft.pipeline.BinaryQuant
      val emb = t(s, dir, "embeddings").filter(F.col("embedding").isNotNull)
        .select(F.col("vec_id").cast("long").as("vec_id"), F.col("embedding"))
      val copies = emb.filter(F.col("vec_id") < 5)
        .select((F.col("vec_id") + 100000L).as("vec_id"), F.col("embedding"))
      val corpus = emb.unionByName(copies)
      val planted = bq.binaryTopK(corpus, copies, "vec_id", "embedding", 3,
        poolSize = 50).collect()
      val top1 = planted.filter(_.getAs[Int]("rank") == 1)
      val copyOk = top1.length == 5 && top1.forall(r =>
        r.getAs[Long]("neighbor_id") == r.getAs[Long]("query_id") - 100000L &&
        math.abs(r.getAs[Double]("cos") - 1.0) < 1e-6)
      val queries = emb.filter(F.col("vec_id") < 10)
      def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Long)] = df
        .select("query_id", "rank", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val exact = pairs(graft.pipeline.Similarity
        .bruteForceTopK(emb, queries, "vec_id", "embedding", 5))
      val exhaustive = pairs(bq.binaryTopK(emb, queries, "vec_id", "embedding", 5,
        poolSize = 1 << 20))
      // persisted bit-table path: the coarse scan reads only the
      // signature table; results must equal the one-shot form exactly
      val pooled = pairs(bq.binaryTopK(emb, queries, "vec_id", "embedding", 5,
        poolSize = 500))
      val indexed = pairs(bq.binaryTopKIndexed(
        bq.buildBinarySignatures(emb, "vec_id", "embedding"),
        emb, queries, "vec_id", "embedding", 5, poolSize = 500))
      s.range(1).select(
        F.lit(planted.length.toLong).as("n_rows"),
        F.lit(copyOk).as("copies_rank1"),
        F.lit(exhaustive == exact).as("pool_exhaustive_exact"),
        F.lit(indexed == pooled).as("indexed_exact"))
    }),

    // int8 scalar quantization (the 4x rung of the quantization
    // ladder): per-dim mean±3σ affine bounds from ONE constant-width
    // aggregate, asymmetric factor-table coarse scoring over byte
    // codes, exact-cosine rerank. Contracts mirror q_ann_binary:
    // planted copies rank-1, pool-exhaustive ≡ brute force row for
    // row, persisted codes ≡ one-shot
    "q_ann_sq8" -> ((s: SparkSession, dir: String) => {
      val emb = t(s, dir, "embeddings").filter(F.col("embedding").isNotNull)
        .select(F.col("vec_id").cast("long").as("vec_id"), F.col("embedding"))
      val copies = emb.filter(F.col("vec_id") < 5)
        .select((F.col("vec_id") + 100000L).as("vec_id"), F.col("embedding"))
      val corpus = emb.unionByName(copies)
      val planted = graft.pipeline.ScalarQuant.sq8TopK(corpus, copies,
        "vec_id", "embedding", 3, poolSize = 50).collect()
      val top1 = planted.filter(_.getAs[Int]("rank") == 1)
      val copyOk = top1.length == 5 && top1.forall(r =>
        r.getAs[Long]("neighbor_id") == r.getAs[Long]("query_id") - 100000L &&
        math.abs(r.getAs[Double]("cos") - 1.0) < 1e-6)
      val queries = emb.filter(F.col("vec_id") < 10)
      def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Long)] = df
        .select("query_id", "rank", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val exact = pairs(graft.pipeline.Similarity
        .bruteForceTopK(emb, queries, "vec_id", "embedding", 5))
      val exhaustive = pairs(graft.pipeline.ScalarQuant.sq8TopK(
        emb, queries, "vec_id", "embedding", 5, poolSize = 1 << 20))
      // persisted-vs-transient comparison uses ONE model (the saved
      // one): training twice would compare two parallel-float-sum
      // trainings, whose last-ulp bound differences can flip pool
      // boundary ties — the documented score-ONCE rule
      val path = System.getProperty("java.io.tmpdir") + "/graft_q_sq8"
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      graft.pipeline.ScalarQuant.saveSq8Index(emb, "vec_id", "embedding", path)
      val (reModel, reCodes) = graft.pipeline.ScalarQuant.loadSq8Index(s, path)
      val pooled = pairs(graft.pipeline.ScalarQuant.sq8TopKIndexed(reModel,
        graft.pipeline.ScalarQuant.encode(emb, "vec_id", "embedding", reModel),
        emb, queries, "vec_id", "embedding", 5, poolSize = 200))
      val indexed = pairs(graft.pipeline.ScalarQuant.sq8TopKIndexed(reModel,
        reCodes, emb, queries, "vec_id", "embedding", 5, poolSize = 200))
      // ---- maintenance lifecycle legs (persisted ≡ one-shot across
      // mutations; both sides always derive from the SAVED model — two
      // independent trainings are never compared for exactness) ----
      val sq = graft.pipeline.ScalarQuant
      val path2 = System.getProperty("java.io.tmpdir") + "/graft_q_sq8_life"
      fs.delete(new org.apache.hadoop.fs.Path(path2), true)
      sq.saveSq8Index(emb.filter(F.col("vec_id") % 2 === 0),
        "vec_id", "embedding", path2)
      val (m2, codesGrown) = sq.appendToSq8Index(s, path2,
        emb.filter(F.col("vec_id") % 2 =!= 0), "vec_id", "embedding")
      val appendExact = pairs(sq.sq8TopKIndexed(m2, codesGrown, emb,
        queries, "vec_id", "embedding", 5, poolSize = 200)) ==
        pairs(sq.sq8TopKIndexed(m2,
          sq.encode(emb, "vec_id", "embedding", m2), emb, queries,
          "vec_id", "embedding", 5, poolSize = 200))
      val doomed = emb.filter(F.col("vec_id") % 37 === 0).select("vec_id")
      val (m3, codesPruned) = sq.removeFromSq8Index(s, path2, doomed, "vec_id")
      val kept = emb.filter(F.col("vec_id") % 37 =!= 0)
      val prunedRows = sq.sq8TopKIndexed(m3, codesPruned, kept, queries,
        "vec_id", "embedding", 5, poolSize = 200)
      val removeExact = pairs(prunedRows) == pairs(sq.sq8TopKIndexed(m3,
        sq.encode(kept, "vec_id", "embedding", m3), kept, queries,
        "vec_id", "embedding", 5, poolSize = 200))
      val removedAbsent = prunedRows.select("neighbor_id").collect()
        .forall(_.getLong(0) % 37 != 0)
      // drift dial: in-distribution batch quiet; a +25 shift clips
      // nearly every coordinate past mean+3σ and fires the rebuild
      val (q1, _) = sq.maybeRetrainSq8Index(s, path2, emb.limit(200),
        kept, "vec_id", "embedding")
      val shiftU = F.udf((v: Seq[Float]) => v.map(x => x + 25.0f).toArray)
      val (q2, _) = sq.maybeRetrainSq8Index(s, path2,
        emb.limit(200).select(F.col("vec_id"),
          shiftU(F.col("embedding")).as("embedding")),
        kept, "vec_id", "embedding")
      val (m4, codes4) = sq.loadSq8Index(s, path2)
      val retrainExact = pairs(sq.sq8TopKIndexed(m4, codes4, kept, queries,
        "vec_id", "embedding", 5, poolSize = 1 << 20)) ==
        pairs(graft.pipeline.Similarity.bruteForceTopK(kept, queries,
          "vec_id", "embedding", 5))
      s.range(1).select(
        F.lit(planted.length.toLong).as("n_rows"),
        F.lit(copyOk).as("copies_rank1"),
        F.lit(exhaustive == exact).as("pool_exhaustive_exact"),
        F.lit(indexed == pooled).as("indexed_exact"),
        F.lit(appendExact).as("append_exact"),
        F.lit(removeExact).as("remove_exact"),
        F.lit(removedAbsent).as("removed_absent"),
        F.lit(!q1).as("clip_quiet"),
        F.lit(q2).as("clip_fired"),
        F.lit(retrainExact).as("retrain_exact"))
    }),

    // continuous SQ8 ingest: odd half streamed through the
    // batch-stamped foreachBatch sink with TWO real crash-replays —
    // one mid-ingest (the replayed leaf overwrites exactly its own
    // files) and one AFTER a takedown removal (the maintenance
    // watermark makes it a no-op instead of resurrecting removed
    // rows). Exact cardinalities at every stage; the final probe is
    // persisted ≡ recomputed from the SAME saved bounds.
    "q_stream_sq8" -> ((s: SparkSession, dir: String) => {
      val sq = graft.pipeline.ScalarQuant
      val emb = t(s, dir, "embeddings").filter(F.col("embedding").isNotNull)
        .select(F.col("vec_id").cast("long").as("vec_id"), F.col("embedding"))
      val base = System.getProperty("java.io.tmpdir") + "/graft_q_stream_sq8"
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      val path = s"$base/idx"
      sq.saveSq8Index(emb.filter(F.col("vec_id") % 2 === 0),
        "vec_id", "embedding", path)
      val fresh = emb.filter(F.col("vec_id") % 2 =!= 0)
      fresh.repartition(3).write.mode("overwrite").parquet(s"$base/src")
      def runStream(): Unit = {
        val q = sq.streamToSq8Index(
            s.readStream.schema(fresh.schema)
              .option("maxFilesPerTrigger", 1).parquet(s"$base/src"),
            path, "vec_id", "embedding")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .option("checkpointLocation", s"$base/ckpt")
          .start()
        q.awaitTermination()
      }
      def dropNewestCommit(): Unit = {
        val commits = new org.apache.hadoop.fs.Path(s"$base/ckpt/commits")
        val newest = fs.listStatus(commits).map(_.getPath)
          .filter(p => p.getName.forall(_.isDigit))
          .maxBy(_.getName.toLong)
        fs.delete(newest, false)
      }
      runStream()
      dropNewestCommit()
      runStream() // mid-ingest crash-replay: own-leaf overwrite
      val nAll = emb.count()
      val (m1, c1) = sq.loadSq8Index(s, path)
      val streamOk = c1.count() == nAll
      val queries = emb.filter(F.col("vec_id") < 10)
      def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Long)] = df
        .select("query_id", "rank", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val probeExact = pairs(sq.sq8TopKIndexed(m1, c1, emb, queries,
        "vec_id", "embedding", 5, poolSize = 200)) ==
        pairs(sq.sq8TopKIndexed(m1,
          sq.encode(emb, "vec_id", "embedding", m1), emb, queries,
          "vec_id", "embedding", 5, poolSize = 200))
      // takedown with the writer stopped (lease handshake), then a
      // crash-replay that must NOT resurrect the removed rows
      graft.pipeline.Maintenance.releaseWriterLease(s, path)
      val doomed = emb.filter(F.col("vec_id") % 37 === 0).select("vec_id")
      val nDoomed = doomed.count()
      sq.removeFromSq8Index(s, path, doomed, "vec_id")
      dropNewestCommit()
      runStream() // suppressed by the maintenance watermark
      graft.pipeline.Maintenance.releaseWriterLease(s, path)
      val (_, c2) = sq.loadSq8Index(s, path)
      val removeOk = c2.count() == nAll - nDoomed
      val removedAbsent = c2.join(
        F.broadcast(doomed.select(F.col("vec_id").as("id"))), Seq("id"),
        "left_semi").count() == 0L
      s.range(1).select(
        F.lit(nAll).as("n_streamed"),
        F.lit(streamOk).as("stream_ok"),
        F.lit(probeExact).as("probe_exact"),
        F.lit(removeOk).as("remove_ok"),
        F.lit(removedAbsent).as("replay_no_resurrect"))
    }),

    // metadata-filtered ANN: top-k among rows passing a predicate
    // (allowed-id semi-join, the PRE-filter strategy). At probeMass 1
    // the probe covers every cell, so the filtered result must equal
    // brute force over the filtered subset row-for-row; the auto
    // dispatch's two branches (filtered brute force / compensated-
    // mass probe) must both put a planted copy at rank 1 and never
    // return a disallowed neighbor
    "q_ann_filtered" -> ((s: SparkSession, dir: String) => {
      val sim = graft.pipeline.Similarity
      val emb = t(s, dir, "embeddings").filter(F.col("embedding").isNotNull)
        .select(F.col("vec_id").cast("long").as("vec_id"), F.col("embedding"))
      val copies = emb.filter(F.col("vec_id") < 10 && F.col("vec_id") % 2 === 0)
        .select((F.col("vec_id") + 100000L).as("vec_id"), F.col("embedding"))
      val corpus = emb.unionByName(copies)
      val allowed = emb.filter(F.col("vec_id") % 2 === 0).select("vec_id")
      val idx = sim.buildIvfIndex(corpus, "vec_id", "embedding", nlist = 16)
      def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Long)] = df
        .select("query_id", "rank", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val full = sim.ivfTopKFilteredIndexed(idx, copies, "vec_id", "embedding",
        allowed, k = 3, probeMass = 1.0)
      val fullRows = full.collect()
      val exact = pairs(sim.bruteForceTopK(
        emb.filter(F.col("vec_id") % 2 === 0), copies, "vec_id", "embedding", 3))
      def top1CopyOk(rows: Array[org.apache.spark.sql.Row]): Boolean = {
        val t1 = rows.filter(_.getAs[Int]("rank") == 1)
        t1.length == 5 && t1.forall(r =>
          r.getAs[Long]("neighbor_id") == r.getAs[Long]("query_id") - 100000L)
      }
      def allowedOnly(rows: Array[org.apache.spark.sql.Row]): Boolean =
        rows.forall { r =>
          val n = r.getAs[Long]("neighbor_id"); n % 2 == 0 && n < 100000L }
      val autoBrute = sim.ivfTopKFilteredAuto(idx, copies, "vec_id", "embedding",
        allowed, k = 3, bruteThreshold = Long.MaxValue).collect()
      val autoProbe = sim.ivfTopKFilteredAuto(idx, copies, "vec_id", "embedding",
        allowed, k = 3, baseMass = 0.45, bruteThreshold = 0L).collect()
      // graph-family twin: the same pre-filter inside HNSW-probed
      // cells. Unlike IVF, mass 1.0 does NOT guarantee every cell (the
      // beam can miss navs), so the pins are the guaranteed facts:
      // planted copies rank-1 (assign-walk head first), filter honored,
      // k filled
      val hidx = graft.pipeline.Hnsw.buildHnswIndex(corpus, "vec_id",
        "embedding", maxNav = 32, m = 8, efConstruction = 48, efAssign = 16)
      val hRows = graft.pipeline.Hnsw.hnswTopKFiltered(hidx, copies, "vec_id",
        "embedding", allowed, k = 3, probeMass = 1.0).collect()
      // PQ-family twin: the allowed semi-join lands on the encoded
      // table before the ADC scan; copies' codes equal their sources'
      // so the exact rerank puts them at rank 1
      val pqm = graft.pipeline.ProductQuantization
      val pcb = pqm.trainPq(corpus, "vec_id", "embedding", m = 16, ksub = 16,
        iterations = 2)
      val pRows = pqm.pqTopKRerankedFiltered(pcb,
        pqm.pqEncode(corpus, "vec_id", "embedding", pcb), corpus, copies,
        "vec_id", "embedding", allowed, k = 3, poolSize = 100).collect()
      s.range(1).select(
        F.lit(fullRows.length.toLong).as("n_rows"),
        F.lit(pairs(full) == exact).as("full_mass_exact"),
        F.lit(top1CopyOk(fullRows)).as("full_top1_copies"),
        F.lit(allowedOnly(fullRows)).as("full_allowed_only"),
        F.lit(top1CopyOk(autoBrute) && allowedOnly(autoBrute)).as("brute_branch_ok"),
        F.lit(top1CopyOk(autoProbe) && allowedOnly(autoProbe)).as("probe_branch_ok"),
        F.lit(hRows.length == 15 &&
          top1CopyOk(hRows) && allowedOnly(hRows)).as("hnsw_ok"),
        F.lit(pRows.length == 15 &&
          top1CopyOk(pRows) && allowedOnly(pRows)).as("pq_ok"))
    }),

    // unified serving dispatch (annTopKAuto): brute / probe /
    // filtered-brute / compensated-filtered-probe branches, the mass
    // solved from the measured calibration curve — dispatch cannot
    // change the pinned results (planted exact copies rank 1 in EVERY
    // branch, filter honored, k filled; the brute branches are exact
    // row-for-row vs brute force)
    "q_ann_auto" -> ((s: SparkSession, dir: String) => {
      val sim = graft.pipeline.Similarity
      val emb = t(s, dir, "embeddings").filter(F.col("embedding").isNotNull)
        .select(F.col("vec_id").cast("long").as("vec_id"), F.col("embedding"))
      val copies = emb.filter(F.col("vec_id") < 10 && F.col("vec_id") % 2 === 0)
        .select((F.col("vec_id") + 100000L).as("vec_id"), F.col("embedding"))
      val corpus = emb.unionByName(copies)
      val allowed = emb.filter(F.col("vec_id") % 2 === 0).select("vec_id")
      val idx = sim.buildIvfIndex(corpus, "vec_id", "embedding", nlist = 16)
      val cal = Some(sim.calibrateIvfProbe(idx, k = 3, nSample = 32))
      def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Long)] = df
        .select("query_id", "rank", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      def top1Src(rows: Array[org.apache.spark.sql.Row]): Boolean = {
        val t1 = rows.filter(_.getAs[Int]("rank") == 1)
        t1.length == 5 && t1.forall(r =>
          r.getAs[Long]("neighbor_id") == r.getAs[Long]("query_id") - 100000L)
      }
      // brute branch (unfiltered): exact vs brute force row-for-row
      val bruteEq = pairs(sim.annTopKAuto(idx, copies, "vec_id", "embedding",
        3, cal, None, bruteThreshold = Long.MaxValue)) ==
        pairs(sim.bruteForceTopK(corpus, copies, "vec_id", "embedding", 3))
      // probe branch (unfiltered, curve-solved mass): copies rank 1
      val probeRows = sim.annTopKAuto(idx, copies, "vec_id", "embedding",
        3, cal, None, bruteThreshold = 0L).collect()
      // filtered brute: exact vs filtered brute force
      val fBruteEq = pairs(sim.annTopKAuto(idx, copies, "vec_id", "embedding",
        3, cal, Some(allowed), bruteThreshold = Long.MaxValue)) ==
        pairs(sim.bruteForceTopK(emb.filter(F.col("vec_id") % 2 === 0),
          copies, "vec_id", "embedding", 3))
      // filtered probe (selectivity-compensated mass): copies' sources
      // rank 1, filter honored
      val fProbeRows = sim.annTopKAuto(idx, copies, "vec_id", "embedding",
        3, cal, Some(allowed), targetRecall = 0.6,
        bruteThreshold = 0L).collect()
      val fAllowedOnly = fProbeRows.forall { r =>
        val nb = r.getAs[Long]("neighbor_id"); nb % 2 == 0 && nb < 100000L }
      // uncalibrated fallback (baseMass): copies still rank 1
      val fallbackRows = sim.annTopKAuto(idx, copies, "vec_id", "embedding",
        3, None, None, bruteThreshold = 0L).collect()
      s.range(1).select(
        F.lit(probeRows.length.toLong).as("n_rows"),
        F.lit(bruteEq).as("brute_exact"),
        F.lit(top1Src(probeRows)).as("probe_copies_rank1"),
        F.lit(fBruteEq).as("filtered_brute_exact"),
        F.lit(top1Src(fProbeRows) && fAllowedOnly).as("filtered_probe_ok"),
        F.lit(top1Src(fallbackRows)).as("fallback_copies_rank1"))
    }),

    // composed SERVING pipeline (the retrieval twin of
    // q_pipeline_curation): three independent ANN families (IVF probe,
    // HNSW graph probe, binary-quantization scan) fused by per-query
    // reciprocal-rank fusion, then MMR-diversified. A planted exact
    // copy is rank 1 in EVERY family (first-cell / assign-walk /
    // hamming-0 arguments), so it must survive fusion at n_lists = 3
    // and emerge as MMR's first pick; marginal orderings are never
    // pinned (rrf sums carry union-order ulps)
    "q_pipeline_serving" -> ((s: SparkSession, dir: String) => {
      val sim = graft.pipeline.Similarity
      val emb = t(s, dir, "embeddings").filter(F.col("embedding").isNotNull)
        .select(F.col("vec_id").cast("long").as("vec_id"), F.col("embedding"))
      val copies = emb.filter(F.col("vec_id") < 5)
        .select((F.col("vec_id") + 100000L).as("vec_id"), F.col("embedding"))
      val corpus = emb.unionByName(copies)
      val ivf = sim.ivfTopKIndexed(
        sim.buildIvfIndex(corpus, "vec_id", "embedding", nlist = 16),
        copies, "vec_id", "embedding", 10, nprobe = 4, probeMass = 0.45)
      val hnsw = graft.pipeline.Hnsw.hnswTopK(
        graft.pipeline.Hnsw.buildHnswIndex(corpus, "vec_id", "embedding",
          maxNav = 32, m = 8, efConstruction = 48, efAssign = 16),
        copies, "vec_id", "embedding", 10)
      val bin = graft.pipeline.BinaryQuant.binaryTopK(
        corpus, copies, "vec_id", "embedding", 10, poolSize = 200)
      val fused = graft.pipeline.Retrieval.rrfFusePerQuery(
        Seq(ivf, hnsw, bin), k = 10).localCheckpoint(false)
      val diversified = sim.mmrRerank(
        fused.select(F.col("query_id"), F.col("neighbor_id"),
          F.col("rrf_score").as("cos")),
        corpus, "vec_id", "embedding", k = 5, lambda = 0.7)
        .collect()
      val fusedRows = fused.collect()
      val fusedTop1 = fusedRows.filter(_.getAs[Int]("rank") == 1)
      val copyFused = fusedTop1.length == 5 && fusedTop1.forall(r =>
        r.getAs[Long]("neighbor_id") == r.getAs[Long]("query_id") - 100000L &&
        r.getAs[Long]("n_lists") == 3L)
      val mmrTop1 = diversified.filter(_.getAs[Int]("rank") == 1)
      val copyMmr = mmrTop1.length == 5 && mmrTop1.forall(r =>
        r.getAs[Long]("neighbor_id") == r.getAs[Long]("query_id") - 100000L)
      val validIds = diversified.forall(r => r.getAs[Long]("neighbor_id") < 100500L)
      s.range(1).select(
        F.lit(fusedRows.length.toLong).as("n_fused"),
        F.lit(diversified.length.toLong).as("n_final"),
        F.lit(copyFused).as("fusion_copy_rank1"),
        F.lit(copyMmr).as("mmr_copy_rank1"),
        F.lit(validIds).as("ids_valid"))
    }),

    // kNN label propagation: exact copies of 20 labeled rows recover
    // exactly their source's label at k=1 (identical vectors share
    // the probe's first cell; cosine 1 outranks every natural
    // neighbor — testdata has no natural pair at cos 0.999). Full-row
    // oracle from id arithmetic
    "q_knn_label" -> ((s: SparkSession, dir: String) => {
      val emb = t(s, dir, "embeddings")
        .filter(F.col("embedding").isNotNull && F.col("label").isNotNull)
        .select(F.col("vec_id").cast("long").as("vec_id"), F.col("embedding"),
          F.col("label"))
      val copies = emb.filter(F.col("vec_id") < 20)
        .select((F.col("vec_id") + 100000L).as("vec_id"), F.col("embedding"))
      graft.pipeline.Similarity
        .knnClassify(emb, copies, "vec_id", "embedding", "label",
          k = 1, probeMass = 0.45)
        .select(F.col("query_id"), F.col("label"),
          (F.abs(F.col("weight") - 1.0) < 1e-9).as("w_ok"), F.col("votes"))
        .orderBy("query_id")
    }),

    // MMR diversified rerank: planted 2-D angular clusters make the
    // greedy selection exactly computable (pure per-row double math,
    // no cross-partition sums) — lambda=1 must reproduce relevance
    // order, lambda=0.2 must jump to the far cluster at rank 2; on
    // real embeddings rank 1 always equals the relevance top-1
    // (step 0 maximizes lambda*rel alone)
    "q_mmr_rerank" -> ((s: SparkSession, dir: String) => {
      val sim = graft.pipeline.Similarity
      def v(theta: Double) = Array(math.cos(theta).toFloat, math.sin(theta).toFloat)
      val corpus = s.createDataFrame(Seq(
        (1L, v(0.05)), (2L, v(0.10)), (3L, v(0.50)), (4L, v(1.20))))
        .toDF("vec_id", "embedding")
      val q0 = s.createDataFrame(Seq((0L, v(0.0)))).toDF("vec_id", "embedding")
      val rel = sim.mmrTopK(corpus, q0, "vec_id", "embedding", 3,
        lambda = 1.0, poolSize = 4)
        .orderBy("rank").select("neighbor_id")
        .collect().map(_.getLong(0)).toSeq
      val emb = t(s, dir, "embeddings").filter(F.col("embedding").isNotNull)
        .select(F.col("vec_id").cast("long").as("vec_id"), F.col("embedding"))
      val queries = emb.filter(F.col("vec_id") < 5)
      val pool = sim.bruteForceTopK(emb, queries, "vec_id", "embedding", 20)
      val top1 = pool.filter(F.col("rank") === 1)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val mmrTop1 = sim.mmrRerank(pool, emb, "vec_id", "embedding", 5, lambda = 0.6)
        .filter(F.col("rank") === 1)
        .select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val realOk = top1.size == 5 && mmrTop1 == top1
      sim.mmrTopK(corpus, q0, "vec_id", "embedding", 3,
          lambda = 0.2, poolSize = 4)
        .select(F.col("query_id"), F.col("rank"), F.col("neighbor_id"),
          F.lit(rel == Seq(1L, 2L, 3L)).as("rel_order_ok"),
          F.lit(realOk).as("real_top1_ok"))
        .orderBy("rank")
    }),

    // corpus novelty vs a reference: exact copies score 0, token-
    // transformed rewrites ('qz' prefix on every token — a bijection,
    // so gram counts carry over and no transformed gram can collide
    // with natural vocabulary) score exactly 1; totals replay in SQL
    // from the original texts
    "q_novelty" -> ((s: SparkSession, dir: String) => {
      val toks = F.filter(F.split(F.lower(F.col("text")), "\\s+"),
        (t: org.apache.spark.sql.Column) => F.length(t) > 0)
      val docs = t(s, dir, "documents").filter(F.col("text").isNotNull)
        .select(F.col("doc_id"), F.col("text"))
      val copies = docs.select((F.col("doc_id") + 1000000L).as("doc_id"),
        F.col("text"))
      val fresh = docs.select((F.col("doc_id") + 2000000L).as("doc_id"),
        F.array_join(F.transform(toks,
          (w: org.apache.spark.sql.Column) => F.concat(F.lit("qz"), w)), " ")
          .as("text"))
      graft.pipeline.Decontaminate
        .noveltyScores(copies.unionByName(fresh), docs, "doc_id", "text", n = 8)
        .orderBy("id")
    }),

    // exact-k weighted sampling without replacement (A-ES reservoir,
    // deterministic md5-derived uniforms): the selection replays
    // EXACTLY in SQL — u is exact rational math, ln's 1-ulp noise is
    // dwarfed by random adjacent score gaps, ties break by id
    "q_sample_weighted_k" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents")
        .filter(F.col("n_chars").isNotNull && F.col("n_chars") > 0)
        .select(F.col("source"), F.col("doc_id"), F.col("n_chars"))
      graft.pipeline.Sampling.weightedFixedK(docs, F.col("source"),
          F.col("doc_id"), F.col("n_chars"), 20)
        .select(F.col("source"), F.col("doc_id"))
        .orderBy("source", "doc_id")
    }),

    // BM25F field-weighted retrieval: title = first 5 tokens (w=2.0,
    // b=0.5), body = rest (w=1.0, b=0.75); cross-field tf sums BEFORE
    // saturation (the property separating BM25F from a weighted sum
    // of per-field BM25s). Ranks pinned (q_bm25 rule): measured top-15
    // adjacent gaps >= 2.2e-4 at both SFs; scores are ln-based and
    // never emitted raw
    "q_bm25f" -> ((s: SparkSession, dir: String) => {
      val toks = F.filter(F.split(F.lower(F.col("text")), "\\s+"),
        (t: org.apache.spark.sql.Column) => F.length(t) > 0)
      val docs = t(s, dir, "documents").filter(F.col("text").isNotNull)
        .select(F.col("doc_id"), toks.as("__t"))
        .select(F.col("doc_id"),
          F.array_join(F.slice(F.col("__t"), 1, 5), " ").as("title"),
          F.array_join(F.slice(F.col("__t"), 6, 2000000), " ").as("body"))
      graft.pipeline.Retrieval.bm25fTopK(docs, "doc_id",
          Seq(("title", 2.0, 0.5), ("body", 1.0, 0.75)),
          Seq("slow", "merge", "window"), 10)
        .select(F.col("rank").cast("long").as("rank"),
          F.col("id").as("doc_id"), F.col("n_terms_hit"))
        .orderBy("rank")
    }),

    // BM25F probe of a PERSISTED fielded index (one TextIndex per
    // field + an N manifest): partition-pruned per-field scans, saved
    // exact avgdl, one id repartition — must rank exactly like the
    // one-shot q_bm25f over the same fixture (its oracle, shared
    // verbatim post-merge)
    "q_bm25f_indexed" -> ((s: SparkSession, dir: String) => {
      val toks = F.filter(F.split(F.lower(F.col("text")), "\\s+"),
        (t: org.apache.spark.sql.Column) => F.length(t) > 0)
      val docs = t(s, dir, "documents").filter(F.col("text").isNotNull)
        .select(F.col("doc_id"), toks.as("__t"))
        .select(F.col("doc_id"),
          F.array_join(F.slice(F.col("__t"), 1, 5), " ").as("title"),
          F.array_join(F.slice(F.col("__t"), 6, 2000000), " ").as("body"))
      val path = System.getProperty("java.io.tmpdir") + "/graft_q_bm25f_idx"
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      // saveFieldedTextIndex already returns the RELOADED index (it
      // ends with a load) — a second load would be a redundant
      // manifest read plus per-field stats aggregates
      val fidx = graft.pipeline.Retrieval.saveFieldedTextIndex(
        docs, "doc_id", Seq("title", "body"), path, buckets = 32)
      graft.pipeline.Retrieval.bm25fTopKIndexed(fidx,
          Seq(("title", 2.0, 0.5), ("body", 1.0, 0.75)),
          Seq("slow", "merge", "window"), 10)
        .select(F.col("rank").cast("long").as("rank"),
          F.col("id").as("doc_id"), F.col("n_terms_hit"))
        .orderBy("rank")
    }),

    // batched multi-query BM25F against the persisted fielded index:
    // 3 queries ride ONE pruned scan per field, the query-independent
    // cross-field tf sum and dfs computed once, one query_id
    // repartition. Ranks pinned (per-query top-15 gaps measured
    // >= 2.3e-5 at both SFs); per_query_same pins batch ≡ the
    // single-query fielded probe
    "q_bm25f_batch" -> ((s: SparkSession, dir: String) => {
      val rt = graft.pipeline.Retrieval
      val toks = F.filter(F.split(F.lower(F.col("text")), "\\s+"),
        (t: org.apache.spark.sql.Column) => F.length(t) > 0)
      val docs = t(s, dir, "documents").filter(F.col("text").isNotNull)
        .select(F.col("doc_id"), toks.as("__t"))
        .select(F.col("doc_id"),
          F.array_join(F.slice(F.col("__t"), 1, 5), " ").as("title"),
          F.array_join(F.slice(F.col("__t"), 6, 2000000), " ").as("body"))
      val path = System.getProperty("java.io.tmpdir") + "/graft_q_bm25f_batch"
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      val fidx = rt.saveFieldedTextIndex(
        docs, "doc_id", Seq("title", "body"), path, buckets = 32)
      val params = Seq(("title", 2.0, 0.5), ("body", 1.0, 0.75))
      val qTerms = Seq(
        0L -> Seq("slow", "merge", "window"),
        1L -> Seq("hash", "batch", "scan"),
        2L -> Seq("filter", "row", "group"))
      val qdf = s.createDataFrame(qTerms).toDF("query_id", "terms")
      val out = rt.bm25fTopKBatch(fidx, params, qdf, 10).localCheckpoint(false)
      val perQuerySame = qTerms.forall { case (qid, terms) =>
        val single = rt.bm25fTopKIndexed(fidx, params, terms, 10)
          .orderBy("rank").collect()
          .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("id"))).toSeq
        val batch = out.filter(F.col("query_id") === qid)
          .orderBy("rank").collect()
          .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("id"))).toSeq
        single == batch
      }
      out.select(F.col("query_id"),
          F.col("rank").cast("long").as("rank"),
          F.col("id").as("doc_id"), F.col("n_terms_hit"),
          F.lit(perQuerySame).as("per_query_same"))
        .orderBy("query_id", "rank")
    }),

    // continuous fielded indexing: half the corpus saved, the other
    // half streamed through the per-field foreachBatch fan-out — WITH
    // a real crash-replay (newest checkpoint commit marker deleted,
    // stream restarted: the engine re-executes that batch against the
    // identical file set; every field's postings and the N delta
    // dynamic-overwrite their own partitions). The final probe must
    // rank exactly like the one-shot q_bm25f over the full corpus —
    // its oracle, shared verbatim (N double-counting would shift idf;
    // exact-N and per-field cardinality pins live in
    // FieldedStreamSpec)
    "q_stream_bm25f" -> ((s: SparkSession, dir: String) => {
      val toks = F.filter(F.split(F.lower(F.col("text")), "\\s+"),
        (t: org.apache.spark.sql.Column) => F.length(t) > 0)
      val docs = t(s, dir, "documents").filter(F.col("text").isNotNull)
        .select(F.col("doc_id"), toks.as("__t"))
        .select(F.col("doc_id"),
          F.array_join(F.slice(F.col("__t"), 1, 5), " ").as("title"),
          F.array_join(F.slice(F.col("__t"), 6, 2000000), " ").as("body"))
      val base = System.getProperty("java.io.tmpdir") + "/graft_q_stream_bm25f"
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      val path = s"$base/idx"
      graft.pipeline.Retrieval.saveFieldedTextIndex(
        docs.filter(F.col("doc_id") % 2 === 0), "doc_id",
        Seq("title", "body"), path, buckets = 32)
      val fresh = docs.filter(F.col("doc_id") % 2 =!= 0)
      fresh.repartition(3).write.mode("overwrite").parquet(s"$base/src")
      def runStream(): Unit = {
        val q = graft.pipeline.Retrieval.streamToFieldedTextIndex(
            s.readStream.schema(fresh.schema)
              .option("maxFilesPerTrigger", 1).parquet(s"$base/src"),
            path, "doc_id")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .option("checkpointLocation", s"$base/ckpt")
          .start()
        q.awaitTermination()
      }
      runStream()
      // crash-replay: drop the newest commit marker and restart — the
      // engine re-executes that micro-batch with the identical files
      val commits = new org.apache.hadoop.fs.Path(s"$base/ckpt/commits")
      val newest = fs.listStatus(commits).map(_.getPath)
        .filter(p => p.getName.forall(_.isDigit))
        .maxBy(_.getName.toLong)
      fs.delete(newest, false)
      runStream()
      val fidx = graft.pipeline.Retrieval.loadFieldedTextIndex(s, path)
      graft.pipeline.Retrieval.bm25fTopKIndexed(fidx,
          Seq(("title", 2.0, 0.5), ("body", 1.0, 0.75)),
          Seq("slow", "merge", "window"), 10)
        .select(F.col("rank").cast("long").as("rank"),
          F.col("id").as("doc_id"), F.col("n_terms_hit"))
        .orderBy("rank")
    }),

    // metadata-filtered BM25F: q_bm25f's fixture with candidates
    // restricted to doc_id % 3 = 0; corpus-level any-field df and N
    // (the q_retrieval_filtered contract on the field-weighted form).
    // Ranks pinned: measured filtered top-15 adjacent gaps >= 9.3e-5
    // at both SFs
    "q_retrieval_filtered_f" -> ((s: SparkSession, dir: String) => {
      val toks = F.filter(F.split(F.lower(F.col("text")), "\\s+"),
        (t: org.apache.spark.sql.Column) => F.length(t) > 0)
      val docs = t(s, dir, "documents").filter(F.col("text").isNotNull)
        .select(F.col("doc_id"), toks.as("__t"))
        .select(F.col("doc_id"),
          F.array_join(F.slice(F.col("__t"), 1, 5), " ").as("title"),
          F.array_join(F.slice(F.col("__t"), 6, 2000000), " ").as("body"))
      val allowed = docs.filter(F.col("doc_id") % 3 === 0).select("doc_id")
      graft.pipeline.Retrieval.bm25fTopKFiltered(docs, "doc_id",
          Seq(("title", 2.0, 0.5), ("body", 1.0, 0.75)),
          Seq("slow", "merge", "window"), 10, allowed)
        .select(F.col("rank").cast("long").as("rank"),
          F.col("id").as("doc_id"), F.col("n_terms_hit"))
        .orderBy("rank")
    }),

    // streaming novelty: the same planted probes replayed as
    // micro-batches against the PERSISTED reference gram index —
    // stateless per batch, replay-idempotent; shares q_novelty's
    // full-row oracle verbatim
    "q_stream_novelty" -> ((s: SparkSession, dir: String) => {
      val toks = F.filter(F.split(F.lower(F.col("text")), "\\s+"),
        (t: org.apache.spark.sql.Column) => F.length(t) > 0)
      val docs = t(s, dir, "documents").filter(F.col("text").isNotNull)
        .select(F.col("doc_id"), F.col("text"))
      val base = System.getProperty("java.io.tmpdir") + "/graft_q_stream_novelty"
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      graft.pipeline.Decontaminate.buildNoveltyIndex(docs, "text", 8)
        .write.mode("overwrite").parquet(s"$base/idx")
      val probes = docs.select((F.col("doc_id") + 1000000L).as("doc_id"),
          F.col("text"))
        .unionByName(docs.select((F.col("doc_id") + 2000000L).as("doc_id"),
          F.array_join(F.transform(toks,
            (w: org.apache.spark.sql.Column) => F.concat(F.lit("qz"), w)), " ")
            .as("text")))
      probes.repartition(3).write.mode("overwrite").parquet(s"$base/src")
      val q = graft.pipeline.Decontaminate.noveltyStream(
          s.readStream.schema(probes.schema)
            .option("maxFilesPerTrigger", 1).parquet(s"$base/src"),
          s"$base/idx", s"$base/out", "doc_id", "text", 8)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", s"$base/ckpt")
        .start()
      q.awaitTermination()
      s.read.parquet(s"$base/out")
        .select("id", "total_grams", "unseen_grams", "novelty")
        .orderBy("id")
    }),

    // length-bucketed batching: order by token length desc, chunk into
    // 32-row batches; per-batch padding waste is exact integer math
    // the oracle REPLAYS with the same window functions. sorted_no_worse
    // is a REPLAYED comparison, not an asserted invariant — sorted
    // batching TYPICALLY wastes less than arrival order but the
    // remainder batch can flip it (lens {10,9,9} at size 2 arriving
    // 9,9,10 waste 0 sorted-desc wastes 1), so both engines just
    // recompute the same boolean
    "q_pack_batches" -> ((s: SparkSession, dir: String) => {
      val toks = F.filter(F.split(F.col("text"), "\\s+"),
        (t: org.apache.spark.sql.Column) => F.length(t) > 0)
      val docs = t(s, dir, "documents").filter(F.col("text").isNotNull)
        .select(F.col("doc_id"), F.size(toks).as("len0"))
      val pk = graft.pipeline.Packing
      val rep = pk.paddingWasteReport(
        pk.lengthBucketBatches(docs, "doc_id", F.col("len0"), 32))
        .localCheckpoint(false)
      val arrival = docs
        .withColumn("__rn", F.row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(F.col("doc_id"))))
        .select(F.col("len0").cast("long").as("len"),
          F.expr("CAST((__rn - 1) div 32 AS BIGINT)").as("batch"))
      val wasteSorted = rep.agg(F.sum(F.col("padding_waste"))).head().getLong(0)
      val wasteArrival = pk.paddingWasteReport(arrival)
        .agg(F.sum(F.col("padding_waste"))).head().getLong(0)
      rep.select(F.col("batch"), F.col("n"), F.col("max_len"), F.col("sum_len"),
          F.col("padding_waste"),
          F.lit(wasteSorted <= wasteArrival).as("sorted_no_worse"))
        .orderBy("batch")
    }),

    // preference-pair (DPO) hygiene: triples derive from token slices
    // of documents with deterministic per-id mutations (exact dup,
    // case-only dup, whitespace-only, degenerate length); every
    // validation boolean is exact string/integer math that the oracle
    // RECOMPUTES from the same strings — a full replay, not pins
    "q_pref_pairs" -> ((s: SparkSession, dir: String) => {
      val toks = F.filter(F.split(F.col("text"), "\\s+"),
        (t: org.apache.spark.sql.Column) => F.length(t) > 0)
      val base = t(s, dir, "documents")
        .filter(F.col("text").isNotNull)
        .select(F.col("doc_id"), toks.as("__t"))
        .filter(F.size(F.col("__t")) >= 23)
        .select(F.col("doc_id"),
          F.array_join(F.slice(F.col("__t"), 1, 3), " ").as("prompt"),
          F.array_join(F.slice(F.col("__t"), 4, 10), " ").as("chosen"),
          F.array_join(F.slice(F.col("__t"), 14, 10), " ").as("rejected0"))
      val mutated = base.withColumn("rejected",
        F.when(F.col("doc_id") % 7 === 0, F.col("chosen"))
          .when(F.col("doc_id") % 7 === 1, F.upper(F.col("chosen")))
          .when(F.col("doc_id") % 7 === 2, F.lit("   "))
          .when(F.col("doc_id") % 7 === 3, F.substring(F.col("chosen"), 1, 2))
          .otherwise(F.col("rejected0")))
        .drop("rejected0")
      graft.pipeline.Preferences
        .validatePairs(mutated, "prompt", "chosen", "rejected")
        .select("doc_id", "nonempty", "distinct_exact", "distinct_norm",
          "length_ok", "valid")
        .orderBy("doc_id")
    }),

    // incremental conflict detection: fresh reversed annotations
    // probed against the PERSISTED history digest index — only the
    // delta normalizes/hashes; expected pairs replay from id
    // arithmetic exactly like the batch gate
    "q_pref_conflicts_incremental" -> ((s: SparkSession, dir: String) => {
      val toks = F.filter(F.split(F.col("text"), "\\s+"),
        (t: org.apache.spark.sql.Column) => F.length(t) > 0)
      val base = t(s, dir, "documents")
        .filter(F.col("text").isNotNull)
        .select(F.col("doc_id"), toks.as("__t"))
        .filter(F.size(F.col("__t")) >= 23)
        .select(F.col("doc_id"),
          F.concat(F.col("doc_id"), F.lit(" "),
            F.array_join(F.slice(F.col("__t"), 1, 3), " ")).as("prompt"),
          F.array_join(F.slice(F.col("__t"), 4, 10), " ").as("chosen"),
          F.array_join(F.slice(F.col("__t"), 14, 10), " ").as("rejected"))
      val pr = graft.pipeline.Preferences
      val path = System.getProperty("java.io.tmpdir") + "/graft_q_pref_idx"
      graft.pipeline.Dedup.saveSignatureIndex(
        pr.buildPreferenceIndex(base, "doc_id", "prompt", "chosen", "rejected"),
        path)
      val fresh = base.filter(F.col("doc_id") % 50 === 0)
        .select((F.col("doc_id") + 1000000L).as("doc_id"),
          F.concat(F.lit(" "), F.col("prompt"), F.lit("  ")).as("prompt"),
          F.col("rejected").as("chosen"), F.col("chosen").as("rejected"))
      pr.incrementalConflicts(fresh,
          graft.pipeline.Dedup.loadSignatureIndex(s, path),
          "doc_id", "prompt", "chosen", "rejected")
        .orderBy("id_new")
    }),

    // streaming conflict detection: the same reversed deltas replayed
    // as micro-batches against the persisted digest index — shares the
    // incremental gate's id-arithmetic oracle verbatim
    "q_stream_pref_conflicts" -> ((s: SparkSession, dir: String) => {
      val toks = F.filter(F.split(F.col("text"), "\\s+"),
        (t: org.apache.spark.sql.Column) => F.length(t) > 0)
      val base = t(s, dir, "documents")
        .filter(F.col("text").isNotNull)
        .select(F.col("doc_id"), toks.as("__t"))
        .filter(F.size(F.col("__t")) >= 23)
        .select(F.col("doc_id"),
          F.concat(F.col("doc_id"), F.lit(" "),
            F.array_join(F.slice(F.col("__t"), 1, 3), " ")).as("prompt"),
          F.array_join(F.slice(F.col("__t"), 4, 10), " ").as("chosen"),
          F.array_join(F.slice(F.col("__t"), 14, 10), " ").as("rejected"))
      val pr = graft.pipeline.Preferences
      val baseDir = System.getProperty("java.io.tmpdir") + "/graft_q_stream_pref"
      val fs = new org.apache.hadoop.fs.Path(baseDir)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(baseDir), true)
      graft.pipeline.Dedup.saveSignatureIndex(
        pr.buildPreferenceIndex(base, "doc_id", "prompt", "chosen", "rejected"),
        s"$baseDir/idx")
      val fresh = base.filter(F.col("doc_id") % 50 === 0)
        .select((F.col("doc_id") + 1000000L).as("doc_id"),
          F.concat(F.lit(" "), F.col("prompt"), F.lit("  ")).as("prompt"),
          F.col("rejected").as("chosen"), F.col("chosen").as("rejected"))
      fresh.repartition(2).write.mode("overwrite").parquet(s"$baseDir/src")
      val q = pr.conflictStream(
          s.readStream.schema(fresh.schema)
            .option("maxFilesPerTrigger", 1).parquet(s"$baseDir/src"),
          s"$baseDir/idx", s"$baseDir/out", "doc_id", "prompt", "chosen",
          "rejected")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", s"$baseDir/ckpt")
        .start()
      q.awaitTermination()
      s.read.parquet(s"$baseDir/out")
        .select("id_new", "id_old")
        .orderBy("id_new")
    }),

    // contradictory-preference detection: reversed copies planted at
    // id+1000000 (prompt whitespace-perturbed to exercise the
    // normalized join) must pair with their sources — exactly and
    // only those (natural 13-token collisions are ~vocab^-13)
    "q_pref_conflicts" -> ((s: SparkSession, dir: String) => {
      val toks = F.filter(F.split(F.col("text"), "\\s+"),
        (t: org.apache.spark.sql.Column) => F.length(t) > 0)
      val base = t(s, dir, "documents")
        .filter(F.col("text").isNotNull)
        .select(F.col("doc_id"), toks.as("__t"))
        .filter(F.size(F.col("__t")) >= 23)
        .select(F.col("doc_id"),
          // doc_id prefixes the prompt: the testdata PLANTS duplicate
          // documents, so unprefixed 23-token triples collide exactly
          // and cross-document conflicts appear (found the hard way)
          F.concat(F.col("doc_id"), F.lit(" "),
            F.array_join(F.slice(F.col("__t"), 1, 3), " ")).as("prompt"),
          F.array_join(F.slice(F.col("__t"), 4, 10), " ").as("chosen"),
          F.array_join(F.slice(F.col("__t"), 14, 10), " ").as("rejected"))
      val reversed = base.filter(F.col("doc_id") % 50 === 0)
        .select((F.col("doc_id") + 1000000L).as("doc_id"),
          F.concat(F.lit(" "), F.col("prompt"), F.lit("  ")).as("prompt"),
          F.col("rejected").as("chosen"), F.col("chosen").as("rejected"))
      graft.pipeline.Preferences
        .conflictingPairs(base.unionByName(reversed), "doc_id",
          "prompt", "chosen", "rejected")
        .orderBy("id_a")
    }),

    // redirect-chain resolution (pointer doubling, log rounds): edges
    // derive from doc_id arithmetic (i -> i+1 within 5-blocks), so
    // final target and hop count replay EXACTLY in SQL — full-row
    // oracle; the chain tail clamps at the max id's terminal
    "q_url_redirects" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents").select(F.col("doc_id"))
      val mx = docs.agg(F.max(F.col("doc_id"))).head().getLong(0)
      val edges = docs
        .filter(F.col("doc_id") % 5 =!= 4 && F.col("doc_id") < mx)
        .select(
          F.concat(F.lit("https://ex.com/"), F.col("doc_id")).as("src"),
          F.concat(F.lit("https://ex.com/"), F.col("doc_id") + 1L).as("dst"))
      graft.pipeline.Urls.resolveRedirectChains(edges, "src", "dst",
          maxHops = 16)
        .select(F.col("src"), F.col("final_url"), F.col("hops"), F.col("cycled"))
        .orderBy("src")
    }),

    // streaming kNN labeling: micro-batches of unlabeled copies
    // classified against the persisted labeled index — stateless,
    // replay-idempotent per-batch dynamic overwrite; full rows equal
    // the batch form's exactly (frozen index, k=1 copy argument), so
    // q_knn_label's oracle is shared verbatim
    "q_stream_knn_label" -> ((s: SparkSession, dir: String) => {
      val sim = graft.pipeline.Similarity
      val emb = t(s, dir, "embeddings")
        .filter(F.col("embedding").isNotNull && F.col("label").isNotNull)
        .select(F.col("vec_id").cast("long").as("vec_id"), F.col("embedding"),
          F.col("label"))
      val base = System.getProperty("java.io.tmpdir") + "/graft_q_stream_knn"
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      val n = emb.count()
      sim.buildIvfIndex(emb, "vec_id", "embedding", sim.ivfNlistFor(n))
        .save(s"$base/idx")
      val copies = emb.filter(F.col("vec_id") < 20)
        .select((F.col("vec_id") + 100000L).as("vec_id"), F.col("embedding"))
      copies.repartition(3).write.mode("overwrite").parquet(s"$base/src")
      val q = sim.knnClassifyStream(
          s.readStream.schema(copies.schema)
            .option("maxFilesPerTrigger", 1).parquet(s"$base/src"),
          s"$base/idx", emb, s"$base/out", "vec_id", "embedding", "label",
          k = 1, probeMass = 0.45)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", s"$base/ckpt")
        .start()
      q.awaitTermination()
      s.read.parquet(s"$base/out")
        .select(F.col("query_id"), F.col("label"),
          (F.abs(F.col("weight") - 1.0) < 1e-9).as("w_ok"), F.col("votes"))
        .orderBy("query_id")
    }),

    // text statistics per source: counts, tokens, chars, languages
    "q_text_stats" -> ((s: SparkSession, dir: String) => {
      t(s, dir, "documents").groupBy(F.col("source"))
        .agg(
          F.count(F.lit(1)).as("docs"),
          F.sum(graft.pipeline.TextFunctions.tokenCount(F.col("text"))).cast("long").as("tokens"),
          F.sum(graft.pipeline.TextFunctions.bpeTokenCount(F.col("text"))).cast("long").as("bpe_tokens"),
          F.sum(F.col("n_chars")).as("chars_total"),
          F.countDistinct(F.col("lang")).as("langs"))
        .orderBy("source")
    }),

    // quality scoring: SQL-replicable score formula, bucketed counts
    "q_text_quality" -> ((s: SparkSession, dir: String) => {
      val tf = graft.pipeline.TextFunctions
      val tokens = tf.tokenCount(F.col("text"))
      t(s, dir, "documents")
        .withColumn("score", tf.qualityScore(F.col("text"), F.col("n_chars")))
        .groupBy(F.col("source"))
        .agg(
          F.sum(F.when(F.col("n_chars") >= 300, 1L).otherwise(0L)).as("long_cnt"),
          F.sum(F.when(tokens >= 50, 1L).otherwise(0L)).as("rich_cnt"),
          F.sum(F.when(F.col("score") > 0.7, 1L).otherwise(0L)).as("hq_cnt"))
        .orderBy("source")
    }),

    // frequent-items (SpaceSaving) sketch: top words — exact regime
    // since the corpus vocabulary fits the sketch capacity
    "q_topk_words" -> ((s: SparkSession, dir: String) => {
      import graft.sketch.{topk => T}
      t(s, dir, "documents")
        .select(F.explode(F.split(F.col("text"), "\\s+")).as("w"))
        .agg(T.topk_items(T.topk_agg(F.col("w"), 256), 10).as("top"))
        .select(F.explode(F.col("top")).as("t"))
        .select(F.col("t.item").as("item"), F.col("t.count").as("cnt"))
        .orderBy(F.col("cnt").desc, F.col("item"))
    }),

    // diversity selection: greedy k-center over embeddings — k rows,
    // seeded at min id, strictly more spread than a naive prefix pick
    "q_diverse" -> ((s: SparkSession, dir: String) => {
      val emb = t(s, dir, "embeddings")
      val k = 8
      val sel = graft.pipeline.Diversity
        .farthestPointSample(emb, "vec_id", "embedding", k)
      def minPair(ids: org.apache.spark.sql.DataFrame) = {
        val a = emb.join(ids, "vec_id")
          .select(F.col("vec_id").as("ia"), F.col("embedding").as("va"))
        val b = a.select(F.col("ia").as("ib"), F.col("va").as("vb"))
        a.crossJoin(b).filter(F.col("ia") < F.col("ib"))
          .agg(F.min(F.lit(1.0) -
            graft.pipeline.Similarity.cosine(F.col("va"), F.col("vb")))
            .as("mind"))
      }
      val prefix = emb.orderBy("vec_id").limit(k).select("vec_id")
      sel.agg(F.count(F.lit(1)).as("k_selected"),
              F.min(F.when(F.col("pick_order") === 0, F.col("vec_id")))
                .as("seed_id"))
        .crossJoin(minPair(sel.select("vec_id")).withColumnRenamed("mind", "gd"))
        .crossJoin(minPair(prefix).withColumnRenamed("mind", "pd"))
        .select(F.col("k_selected"), F.col("seed_id"),
          (F.col("gd") >= F.col("pd")).as("more_diverse_than_prefix"))
    }),

    // prototypicality pruning (SSL-prototypes / D4): keep the
    // least-centroid-similar ceil-fraction of every k-means cell.
    // Clustering is float-sum dependent, so per-doc membership is not
    // oracle-able; the oracle pins the exact input count plus
    // booleans derived from ONE scoring pass (centroids collect at
    // build time, so the scored frame is deterministic afterwards):
    // per-cell kept counts hit ceil(f*n) exactly, and every kept
    // (score, id) precedes every dropped one within its cell
    "q_proto_prune" -> ((s: SparkSession, dir: String) => {
      val emb = t(s, dir, "embeddings").filter(F.col("embedding").isNotNull)
      val f = 0.7
      val scored = graft.pipeline.Diversity
        .prototypicalityScores(emb, "vec_id", "embedding", nClusters = 8)
      val kept = graft.pipeline.Diversity
        .keepLeastPrototypical(scored, "vec_id", f)
        .withColumn("__kept", F.lit(1))
      val keptG = graft.pipeline.Diversity
        .keepLeastPrototypicalGlobal(scored, "vec_id", f)
        .withColumn("__keptg", F.lit(1))
      val perCell = scored.join(kept, Seq("vec_id"), "left")
        .groupBy(F.col("cell"))
        .agg(
          F.count(F.lit(1)).as("__n"),
          F.sum(F.coalesce(F.col("__kept"), F.lit(0))).as("__nk"),
          F.max(F.when(F.col("__kept").isNotNull,
            F.struct(F.col("proto_score"), F.col("vec_id")))).as("__maxk"),
          F.min(F.when(F.col("__kept").isNull,
            F.struct(F.col("proto_score"), F.col("vec_id")))).as("__mind"))
        .agg(
          F.sum(F.col("__n")).as("n_input"),
          F.min(F.col("__nk") === F.ceil(F.lit(f) * F.col("__n")))
            .as("counts_ok"),
          F.min(F.col("__mind").isNull || F.col("__maxk") < F.col("__mind"))
            .as("rule_ok"))
      // global variant: kept count is an exact cross-engine value
      // (ceil of one IEEE multiply); ordering pins as a boolean
      val globalAgg = scored.join(keptG, Seq("vec_id"), "left")
        .agg(
          F.sum(F.coalesce(F.col("__keptg"), F.lit(0))).cast("long")
            .as("n_kept_global"),
          F.max(F.when(F.col("__keptg").isNotNull,
            F.struct(F.col("proto_score"), F.col("vec_id")))).as("__maxk"),
          F.min(F.when(F.col("__keptg").isNull,
            F.struct(F.col("proto_score"), F.col("vec_id")))).as("__mind"))
        .select(F.col("n_kept_global"),
          F.coalesce(F.col("__maxk") < F.col("__mind"), F.lit(true))
            .as("global_rule_ok"))
      perCell.crossJoin(globalAgg)
    }),

    // the published D4 composition (Tirumala et al. 2023) end-to-end:
    // SemDeDup -> global prototypicality prune -> temperature mixture,
    // one query. Kept-set arithmetic replays exactly: planted copies
    // make the SemDeDup survivor set the natural ids (kept ==
    // embeddings, pinned as a set-equality boolean), the global prune
    // count is ceil(0.7 * n) (one IEEE multiply, exact cross-engine),
    // and the mix stage's md5-threshold rule is replayed query-side
    // over the survivor counts (frozen-formula parity boolean) — the
    // q_pipeline pattern applied to the D4 chain
    "q_d4_pipeline" -> ((s: SparkSession, dir: String) => {
      val emb = t(s, dir, "embeddings").select(F.col("vec_id"), F.col("embedding"))
      val copies = emb.filter(F.col("vec_id") < 50)
        .select((F.col("vec_id") + 100000L).as("vec_id"), F.col("embedding"))
      val corpus = emb.union(copies)
      // ONE shared clustering feeds both stages (the paper's own
      // construction; scores and kept sets derive from a single pass —
      // k-means means are float sums, not bit-stable across calls)
      val d4 = graft.pipeline.Diversity.d4Stages(
        corpus, "vec_id", "embedding", keepFraction = 0.7,
        nClusters = 16, dedupThreshold = 0.99)
      val nInput = corpus.count()
      val n1 = d4.dedupedIds.count()
      val keptNatural =
        d4.dedupedIds.exceptAll(emb.select("vec_id")).isEmpty &&
        emb.select("vec_id").exceptAll(d4.dedupedIds).isEmpty
      val scored = d4.scored
      val keptIds = d4.keptIds
      val n2 = keptIds.count()
      val pruneOk = scored
        .join(keptIds.withColumn("__k", F.lit(1)), Seq("vec_id"), "left")
        .agg(
          F.max(F.when(F.col("__k").isNotNull,
            F.struct(F.col("proto_score"), F.col("vec_id")))).as("__mx"),
          F.min(F.when(F.col("__k").isNull,
            F.struct(F.col("proto_score"), F.col("vec_id")))).as("__mn"))
        .select(F.coalesce(F.col("__mx") < F.col("__mn"), F.lit(true)))
        .head().getBoolean(0)
      val docs = t(s, dir, "documents")
        .select(F.col("doc_id").as("vec_id"), F.col("source"))
      val surv = keptIds.join(docs, "vec_id").localCheckpoint(eager = false)
      val mixed = graft.pipeline.Sampling.temperatureRebalance(
        surv, F.col("source"), F.col("vec_id"), alpha = 0.5)
      // frozen-formula replay of the md5-threshold selection over the
      // SAME survivor counts (Sampling.temperatureRebalance parity)
      val cnts = surv.groupBy(F.col("source"))
        .agg(F.count(F.lit(1)).cast("double").as("__n"))
        .withColumn("__w", F.pow(F.col("__n"), 0.5))
      val tmin = cnts.agg(F.min(F.col("__n") / F.col("__w")).as("__t"))
      val fr = cnts.crossJoin(tmin).select(F.col("source"),
        F.least(F.lit(1.0), F.col("__w") * F.col("__t") / F.col("__n")).as("__f"))
      val thr = F.round(F.col("__f") * 65536.0, 0).cast("int")
      val expect = surv.join(fr, "source")
        .filter(F.col("__f") >= 1.0 ||
          (F.col("__f") > 0.0 && (thr >= 65536 ||
            F.substring(F.md5(F.col("vec_id").cast("string")), 1, 4) <
              F.format_string("%04x", thr))))
        .select("vec_id")
      val mixIds = mixed.select("vec_id")
      val mixOk = mixIds.exceptAll(expect).isEmpty &&
        expect.exceptAll(mixIds).isEmpty
      s.range(1).select(
        F.lit(nInput).as("n_input"),
        F.lit(n1).as("n_semdedup"),
        F.lit(n2).as("n_pruned"),
        F.lit(keptNatural).as("semdedup_kept_natural"),
        F.lit(pruneOk).as("prune_rule_ok"),
        F.lit(mixOk).as("mix_rule_ok"))
    }),

    // vocabulary induction: top-100 tokens + the OOV mass they leave
    // (token counts shuffle once; vocabulary broadcast for the OOV pass)
    "q_vocab" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents")
      val vocab = graft.pipeline.Vocab.buildVocabulary(docs, F.col("text"), 100)
      graft.pipeline.Vocab.oovStats(docs, F.col("text"), vocab)
    }),

    // TF-IDF-style keyword extraction: top-3 distinctive terms per doc,
    // ranked tf/df (same order as tf*idf, engine-exact — one IEEE
    // division, no transcendental)
    "q_keywords" -> ((s: SparkSession, dir: String) =>
      graft.pipeline.Vocab.topDistinctiveTerms(
        t(s, dir, "documents"), "doc_id", "text", 3)),

    // join-based keyword extraction (no driver-side df map — the
    // 100 TB form): row-equal to the broadcast form, oracle shared
    "q_keywords_joined" -> ((s: SparkSession, dir: String) =>
      graft.pipeline.Vocab.topDistinctiveTermsJoined(
        t(s, dir, "documents"), "doc_id", "text", 3)),

    // BPE merge learning: the first two learned merges with pair
    // frequencies, vs an unrolled 2-iteration SQL replica
    "q_bpe" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      graft.pipeline.Vocab.learnBpeMerges(t(s, dir, "documents"), "text", 2)
        .zipWithIndex
        .map { case ((l, r, f), i) => (i + 1L, l, r, f) }
        .toDF("rank", "lft", "rgt", "f")
    }),

    // distributed BPE tokenization: rank-based apply (merge-table-size
    // independent) must equal the sequential learned-order apply on
    // every document, and the tokens must reconstruct the text exactly
    "q_tokenize_bpe" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents")
      val merges = graft.pipeline.Vocab.learnBpeMerges(docs, "text", 8)
        .map(m => (m._1, m._2))
      val seqU = F.udf((t: String) =>
        if (t == null) null
        else t.split("\\s+").iterator.filter(_.nonEmpty)
          .flatMap(w => graft.pipeline.Vocab.applyBpe(merges, w)).toArray)
      graft.pipeline.Vocab.tokenizeBpe(docs, "text", merges)
        .select(F.col("text"), F.col("tokens"), seqU(F.col("text")).as("__seq"))
        .agg(
          F.count(F.lit(1)).as("docs"),
          (F.sum(F.when(F.col("text").isNull, 0L)
            .when(F.col("tokens") <=> F.col("__seq"), 0L).otherwise(1L)) === 0L)
            .as("rank_eq_seq"),
          (F.sum(F.when(F.col("text").isNull, 0L)
            .when(F.concat_ws("", F.col("tokens")) <=>
              F.regexp_replace(F.col("text"), "\\s+", ""), 0L).otherwise(1L)) === 0L)
            .as("reconstructs"))
    }),

    // BPE-dropout (Provilkov 2020): per-occurrence merge dropout,
    // draws seeded per (doc, word position, draw index) — the
    // merge-table sibling of q_tokenize_unigram_sampled. Invariants:
    // every sample reconstructs, the seed replays bit-for-bit, p=0
    // equals plain tokenizeBpe exactly, and p=0.1 leaves the plain
    // segmentation somewhere in the corpus at the fixed seed
    "q_tokenize_bpe_dropout" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents")
      val merges = graft.pipeline.Vocab.learnBpeMerges(docs, "text", 8)
        .map(m => (m._1, m._2))
      def run(p: Double, seed: Long, out: String) =
        graft.pipeline.Vocab.tokenizeBpeDropout(
            docs, "doc_id", "text", merges, p, seed, out)
          .select(F.col("doc_id"), F.col(out))
      val plain = graft.pipeline.Vocab.tokenizeBpe(docs, "text", merges, "ptokens")
        .select(F.col("doc_id"), F.col("ptokens"))
      val joined = docs.select(F.col("doc_id"), F.col("source"), F.col("text"))
        .join(run(0.1, 7L, "tokens"), "doc_id")
        .join(run(0.1, 7L, "tokens2"), "doc_id")
        .join(run(0.0, 7L, "tokens0"), "doc_id")
        .join(plain, "doc_id")
        .localCheckpoint(false)
      val shifted = joined
        .filter(F.col("text").isNotNull && !(F.col("tokens") <=> F.col("ptokens")))
        .limit(1).count() > 0
      joined.groupBy(F.col("source"))
        .agg(
          F.count(F.lit(1)).as("docs"),
          (F.sum(F.when(F.col("text").isNull, 0L)
            .when(F.concat_ws("", F.col("tokens")) <=>
              F.regexp_replace(F.col("text"), "\\s+", ""), 0L).otherwise(1L)) === 0L)
            .as("reconstructs"),
          (F.sum(F.when(F.col("tokens") <=> F.col("tokens2"), 0L).otherwise(1L))
            === 0L).as("deterministic"),
          (F.sum(F.when(F.col("tokens0") <=> F.col("ptokens"), 0L).otherwise(1L))
            === 0L).as("p0_equals_plain"))
        .withColumn("shifted", F.lit(shifted))
        .orderBy(F.col("source"))
    }),

    // tokenizer interchange: learned BPE merges+vocab exported as
    // merges.txt / vocab.json (the GPT-2 pair) and a WordPiece model
    // as vocab.txt (BERT form), reloaded, and required to reproduce
    // the learned artifacts and the corpus tokenization EXACTLY; the
    // oracle pins the invariant booleans plus the SQL-derivable count
    "q_tokenizer_roundtrip" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents")
      val merges = graft.pipeline.Vocab.learnBpeMerges(docs, "text", 8)
        .map(m => (m._1, m._2))
      val out = System.getProperty("java.io.tmpdir") + "/graft_q_tokio"
      graft.pipeline.TokenizerIO.saveBpe(s, out, merges)
      val reMerges = graft.pipeline.TokenizerIO.loadBpeMerges(s, out)
      val reVocab = graft.pipeline.TokenizerIO.loadBpeVocab(s, out)
      val vocabOk = reVocab ==
        graft.pipeline.TokenizerIO.bpeVocabFromMerges(merges).zipWithIndex.toMap
      val wp = graft.pipeline.WordPiece.learn(docs, "text", vocabSize = 96)
      graft.pipeline.TokenizerIO.saveWordPieceVocab(s, s"$out/vocab.txt", wp)
      val reWp = graft.pipeline.TokenizerIO.loadWordPieceVocab(s, s"$out/vocab.txt")
      // single-file HF fast-tokenizer form: same model, one json
      graft.pipeline.TokenizerIO.saveTokenizerJson(
        s, s"$out/tokenizer.json", merges, addedTokens = Seq("<|endoftext|>"))
      val tkJson = graft.pipeline.TokenizerIO.loadTokenizerJson(s, s"$out/tokenizer.json")
      val jsonOk = tkJson.merges == merges &&
        tkJson.vocab == graft.pipeline.TokenizerIO
          .bpeVocabFromMerges(merges).zipWithIndex.toMap &&
        tkJson.addedTokens == Seq("<|endoftext|>")
      val a = graft.pipeline.Vocab.tokenizeBpe(docs, "text", merges)
        .select(F.col("doc_id"), F.col("tokens"))
      val b = graft.pipeline.Vocab.tokenizeBpe(docs, "text", reMerges)
        .select(F.col("doc_id"), F.col("tokens").as("__rt"))
      val wa = graft.pipeline.WordPiece.tokenize(docs, "text", wp)
        .select(F.col("doc_id"), F.col("tokens").as("__wa"))
      val wb = graft.pipeline.WordPiece.tokenize(docs, "text", reWp)
        .select(F.col("doc_id"), F.col("tokens").as("__wb"))
      a.join(b, "doc_id").join(wa, "doc_id").join(wb, "doc_id")
        .agg(
          F.count(F.lit(1)).as("docs"),
          F.lit(reMerges == merges).as("merges_roundtrip"),
          F.lit(vocabOk).as("vocab_roundtrip"),
          (F.sum(F.when(F.col("tokens") <=> F.col("__rt"), 0L).otherwise(1L)) === 0L)
            .as("bpe_tokens_identical"),
          F.lit(reWp.pieces == wp.pieces && reWp.unk == wp.unk)
            .as("wp_model_roundtrip"),
          (F.sum(F.when(F.col("__wa") <=> F.col("__wb"), 0L).otherwise(1L)) === 0L)
            .as("wp_tokens_identical"),
          F.lit(jsonOk).as("tokenizer_json_roundtrip"))
    }),

    // the other two HF single-file model families: a learned WordPiece
    // model exported/reloaded as model.type = "WordPiece" (unk + "##"
    // continuation prefix + max_input_chars) and a learned Unigram
    // model as model.type = "Unigram" ([piece, logprob] pairs; the
    // unk_id row carries the fallback score, Double.toString-exact) —
    // reloaded models must reproduce the learned artifacts and the
    // corpus tokenization EXACTLY
    "q_tokenizer_json_models" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents")
      val out = System.getProperty("java.io.tmpdir") + "/graft_q_tokio_models"
      val wp = graft.pipeline.WordPiece.learn(docs, "text", vocabSize = 96)
      graft.pipeline.TokenizerIO.saveWordPieceTokenizerJson(
        s, s"$out/wp.json", wp, addedTokens = Seq("[CLS]", "[SEP]"))
      val (reWp, wpAdded) =
        graft.pipeline.TokenizerIO.loadWordPieceTokenizerJson(s, s"$out/wp.json")
      val wpModelOk = reWp == wp && wpAdded == Seq("[CLS]", "[SEP]")
      val uni = graft.pipeline.UnigramLm.learn(
        docs, "text", vocabSize = 256, iters = 2)
      graft.pipeline.TokenizerIO.saveUnigramTokenizerJson(
        s, s"$out/uni.json", uni, addedTokens = Seq("<s>"))
      val (reUni, uniAdded) =
        graft.pipeline.TokenizerIO.loadUnigramTokenizerJson(s, s"$out/uni.json")
      // maxPieceLen re-derives from the longest piece (<= the learn
      // param) — segmentation-equivalent, so equality pins the pieces
      // map (score-exact) + unkScore, and token identity pins the rest
      val uniModelOk = reUni.pieces == uni.pieces &&
        reUni.unkScore == uni.unkScore && uniAdded == Seq("<s>")
      val wa = graft.pipeline.WordPiece.tokenize(docs, "text", wp)
        .select(F.col("doc_id"), F.col("tokens").as("__wa"))
      val wb = graft.pipeline.WordPiece.tokenize(docs, "text", reWp)
        .select(F.col("doc_id"), F.col("tokens").as("__wb"))
      val ua = graft.pipeline.UnigramLm.tokenize(docs, "text", uni)
        .select(F.col("doc_id"), F.col("tokens").as("__ua"))
      val ub = graft.pipeline.UnigramLm.tokenize(docs, "text", reUni)
        .select(F.col("doc_id"), F.col("tokens").as("__ub"))
      wa.join(wb, "doc_id").join(ua, "doc_id").join(ub, "doc_id")
        .agg(
          F.count(F.lit(1)).as("docs"),
          F.lit(wpModelOk).as("wp_model_roundtrip"),
          (F.sum(F.when(F.col("__wa") <=> F.col("__wb"), 0L).otherwise(1L)) === 0L)
            .as("wp_tokens_identical"),
          F.lit(uniModelOk).as("unigram_model_roundtrip"),
          (F.sum(F.when(F.col("__ua") <=> F.col("__ub"), 0L).otherwise(1L)) === 0L)
            .as("unigram_tokens_identical"))
    }),

    // SentencePiece .model interchange (the Llama on-disk artifact):
    // a byte-fallback unigram model round-trips through the protobuf
    // wire format. Scores are protobuf FLOATS, so the contract is
    // equality with the float-cast model — pieces score-exact at
    // float precision, tokenization identical, flag preserved, and
    // byte-fallback decode still lossless on a planted non-ASCII word
    "q_tokenizer_spm" -> ((s: SparkSession, dir: String) => {
      val U = graft.pipeline.UnigramLm
      val docs = t(s, dir, "documents")
      val out = System.getProperty("java.io.tmpdir") + "/graft_q_spm"
      val uni = U.withByteFallback(
        U.learn(docs, "text", vocabSize = 256, iters = 2))
      graft.pipeline.TokenizerIO.saveSentencePieceModel(
        s, s"$out/spm.model", uni)
      val (re, unk) = graft.pipeline.TokenizerIO.loadSentencePieceModel(
        s, s"$out/spm.model")
      val floatCast = U.withByteFallback(U.Model(
        uni.pieces.map { case (p, v) => p -> v.toFloat.toDouble },
        uni.maxPieceLen, uni.unkScore.toFloat.toDouble))
      val modelOk = re.pieces == floatCast.pieces &&
        re.unkScore == floatCast.unkScore && re.byteFallback && unk == "<unk>"
      val w = "caf\u00e9\u20ac\uD83D\uDE00"
      val losslessOk = U.decodePieces(U.viterbiSegment(re, w)) == w &&
        U.viterbiSegment(re, w).exists(U.isBytePiece)
      val a = U.tokenize(docs, "text", floatCast)
        .select(F.col("doc_id"), F.col("tokens").as("__a"))
      val b = U.tokenize(docs, "text", re)
        .select(F.col("doc_id"), F.col("tokens").as("__b"))
      a.join(b, "doc_id")
        .agg(
          F.count(F.lit(1)).as("docs"),
          F.lit(modelOk).as("model_roundtrip"),
          (F.sum(F.when(F.col("__a") <=> F.col("__b"), 0L).otherwise(1L)) === 0L)
            .as("tokens_identical"),
          F.lit(losslessOk).as("byte_fallback_lossless"))
    }),

    // SentencePiece BPE .model: the format stores scored PIECES, not
    // merge pairs — the loader reconstructs pair ranks as every
    // two-piece split at the concatenation's priority (SentencePiece's
    // own inference rule); for a self-consistent learned model the
    // extra splits are unreachable, so reloaded tokenization must
    // equal the learned merges' tokenization exactly on the corpus
    "q_tokenizer_spm_bpe" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents")
      val merges = graft.pipeline.Vocab.learnBpeMerges(docs, "text", 8)
        .map(m => (m._1, m._2))
      val path = System.getProperty("java.io.tmpdir") + "/graft_q_spm_bpe.model"
      graft.pipeline.TokenizerIO.saveSentencePieceBpe(s, path, merges)
      val (ranks, vocab, unk) =
        graft.pipeline.TokenizerIO.loadSentencePieceBpe(s, path)
      val vocabOk = vocab == graft.pipeline.TokenizerIO.bpeVocabFromMerges(merges) &&
        unk == "<unk>" && merges.forall(ranks.contains)
      val a = graft.pipeline.Vocab.tokenizeBpe(docs, "text", merges, "ta")
        .select(F.col("doc_id"), F.col("ta"))
      val b = graft.pipeline.Vocab.tokenizeBpeRanked(docs, "text", ranks, "tb")
        .select(F.col("doc_id"), F.col("tb"))
      a.join(b, "doc_id")
        .agg(
          F.count(F.lit(1)).as("docs"),
          F.lit(vocabOk).as("vocab_roundtrip"),
          (F.sum(F.when(F.col("ta") <=> F.col("tb"), 0L).otherwise(1L)) === 0L)
            .as("tokens_identical"))
    }),

    // byte-level (GPT-2-style) BPE: pre-tokenize with the GPT-2 regex,
    // map to the 256-char byte alphabet, learn merges, tokenize. The
    // oracle has two exact cross-engine hooks: the token strings
    // partition the UTF-8 byte stream (sum of token lengths in the
    // byte alphabet == DuckDB strlen, which counts BYTES), and the
    // lossless decode/id round-trips pin as booleans
    "q_bpe_bytelevel" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents")
      val merges = graft.pipeline.ByteLevelBpe.learnMerges(docs, "text", 64)
        .map(m => (m._1, m._2))
      val decU = F.udf((toks: Seq[String]) =>
        graft.pipeline.ByteLevelBpe.decodeTokens(toks))
      val idsDecU = F.udf((ids: Seq[Int]) =>
        graft.pipeline.ByteLevelBpe.decodeIds(ids, merges))
      graft.pipeline.ByteLevelBpe.encodeIds(
          graft.pipeline.ByteLevelBpe.tokenize(docs, "text", merges),
          "text", merges)
        .select(
          F.col("doc_id"),
          F.aggregate(F.transform(F.col("tokens"), tk => F.length(tk)),
            F.lit(0L), (a, x) => a + x).as("n_bytes"),
          (decU(F.col("tokens")) <=> F.col("text")).as("roundtrip_ok"),
          (idsDecU(F.col("ids")) <=> F.col("text")).as("ids_roundtrip_ok"))
        .orderBy(F.col("doc_id"))
    }),

    // unigram-LM (SentencePiece-style) tokenizer: EM-trained piece
    // vocabulary + Viterbi segmentation. Non-SQL-expressible DP, so
    // the oracle pins structural invariants computed exactly in Spark:
    // pieces reconstruct each document, every word yields >= 1 piece,
    // and the vocabulary stays within its budget
    "q_tokenize_unigram" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents")
      val model = graft.pipeline.UnigramLm.learn(
        docs, "text", vocabSize = 512, iters = 2)
      val words = F.filter(F.split(F.col("text"), "\\s+"),
        (x: org.apache.spark.sql.Column) => F.length(x) > 0)
      graft.pipeline.UnigramLm.tokenize(docs, "text", model)
        .select(F.col("source"), F.col("text"), F.col("tokens"),
          F.size(words).as("__nw"))
        .groupBy(F.col("source"))
        .agg(
          F.count(F.lit(1)).as("docs"),
          (F.sum(F.when(F.col("text").isNull, 0L)
            .when(F.concat_ws("", F.col("tokens")) <=>
              F.regexp_replace(F.col("text"), "\\s+", ""), 0L).otherwise(1L)) === 0L)
            .as("reconstructs"),
          (F.sum(F.when(F.col("text").isNull, 0L)
            .when(F.size(F.col("tokens")) >= F.col("__nw"), 0L).otherwise(1L)) === 0L)
            .as("ge_one_piece_per_word"),
          F.lit(model.pieces.size <= 512).as("vocab_in_budget"))
        .orderBy(F.col("source"))
    }),

    // soft-EM unigram trainer: forward-backward expected counts (the
    // real SentencePiece E-step; learn() stays the hard-EM fast path).
    // Non-SQL-expressible — invariant booleans: corpus MARGINAL
    // likelihood monotone over 3 fixed-vocab EM rounds (pure-ML M-step
    // over exact posteriors = the EM theorem; no smoothing, no
    // pruning inside the witness), the learned model reconstructs
    // every document within budget, and the model round-trips through
    // BOTH codecs (tokenizer.json is Double.toString-exact; .model
    // compares at the protobuf-float contract)
    // likelihood-loss vocabulary pruning (the SentencePiece prune
    // step): staged shrink from the EM-trained vocab to a hard target;
    // invariant booleans (target reached, chars kept, surviving multi
    // pieces are a subset, fixed params carried, pruned model still
    // reconstructs with >= 1 piece per word) — the q_tokenize_unigram
    // oracle convention
    "q_tokenize_prune" -> ((s: SparkSession, dir: String) => {
      val U = graft.pipeline.UnigramLm
      val docs = t(s, dir, "documents")
      val model = U.learnSoft(docs, "text", vocabSize = 384, iters = 2)
      val chars = model.pieces.keys.filter(_.length == 1).toSet
      val target = chars.size + 48
      val pruned = U.pruneVocab(docs, "text", model, target,
        shrinkFactor = 0.7)
      val targetReached = pruned.pieces.size <= target &&
        pruned.pieces.size < model.pieces.size
      val charsKept = chars.forall(pruned.pieces.contains)
      val subset = pruned.pieces.keys.forall(model.pieces.contains)
      val paramsCarried = pruned.unkScore == model.unkScore &&
        pruned.byteFallback == model.byteFallback &&
        pruned.maxPieceLen == model.maxPieceLen
      val words = F.filter(F.split(F.col("text"), "\\s+"),
        (x: org.apache.spark.sql.Column) => F.length(x) > 0)
      U.tokenize(docs, "text", pruned)
        .select(F.col("source"), F.col("text"), F.col("tokens"),
          F.size(words).as("__nw"))
        .groupBy(F.col("source"))
        .agg(
          F.count(F.lit(1)).as("docs"),
          (F.sum(F.when(F.col("text").isNull, 0L)
            .when(F.concat_ws("", F.col("tokens")) <=>
              F.regexp_replace(F.col("text"), "\\s+", ""), 0L).otherwise(1L)) === 0L)
            .as("reconstructs"),
          (F.sum(F.when(F.col("text").isNull, 0L)
            .when(F.size(F.col("tokens")) >= F.col("__nw"), 0L).otherwise(1L)) === 0L)
            .as("ge_one_piece_per_word"),
          F.lit(targetReached).as("target_reached"),
          F.lit(charsKept).as("chars_kept"),
          F.lit(subset).as("pieces_subset"),
          F.lit(paramsCarried).as("params_carried"))
        .orderBy(F.col("source"))
    }),

    "q_tokenize_unigram_em" -> ((s: SparkSession, dir: String) => {
      val U = graft.pipeline.UnigramLm
      val docs = t(s, dir, "documents")
      val model = U.learnSoft(docs, "text", vocabSize = 512, iters = 2)
      val m0 = U.learn(docs, "text", vocabSize = 256, iters = 1)
      val (_, lls) = U.softEmLikelihoods(docs, "text", m0, rounds = 3)
      val monotone = lls.sliding(2).forall {
        case Seq(a, b) => b >= a - 1e-9
        case _ => true
      }
      val out = System.getProperty("java.io.tmpdir") + "/graft_q_uni_em"
      graft.pipeline.TokenizerIO.saveUnigramTokenizerJson(
        s, s"$out/tokenizer.json", model)
      val (reJson, _) = graft.pipeline.TokenizerIO.loadUnigramTokenizerJson(
        s, s"$out/tokenizer.json")
      val jsonOk = reJson.pieces == model.pieces &&
        reJson.unkScore == model.unkScore
      graft.pipeline.TokenizerIO.saveSentencePieceModel(
        s, s"$out/spm.model", model)
      val (reSpm, unk) = graft.pipeline.TokenizerIO.loadSentencePieceModel(
        s, s"$out/spm.model")
      val floatCast = U.Model(
        model.pieces.map { case (p, v) => p -> v.toFloat.toDouble },
        model.maxPieceLen, model.unkScore.toFloat.toDouble)
      val spmOk = reSpm.pieces == floatCast.pieces &&
        reSpm.unkScore == floatCast.unkScore && unk == "<unk>"
      val words = F.filter(F.split(F.col("text"), "\\s+"),
        (x: org.apache.spark.sql.Column) => F.length(x) > 0)
      U.tokenize(docs, "text", model)
        .select(F.col("source"), F.col("text"), F.col("tokens"),
          F.size(words).as("__nw"))
        .groupBy(F.col("source"))
        .agg(
          F.count(F.lit(1)).as("docs"),
          (F.sum(F.when(F.col("text").isNull, 0L)
            .when(F.concat_ws("", F.col("tokens")) <=>
              F.regexp_replace(F.col("text"), "\\s+", ""), 0L).otherwise(1L)) === 0L)
            .as("reconstructs"),
          (F.sum(F.when(F.col("text").isNull, 0L)
            .when(F.size(F.col("tokens")) >= F.col("__nw"), 0L).otherwise(1L)) === 0L)
            .as("ge_one_piece_per_word"),
          F.lit(model.pieces.size <= 512).as("vocab_in_budget"),
          F.lit(monotone).as("marginal_ll_monotone"),
          F.lit(jsonOk).as("json_roundtrip"),
          F.lit(spmOk).as("spm_roundtrip"))
        .orderBy(F.col("source"))
    }),

    // subword-regularization sampling (Kudo 2018 n-best/alpha): each
    // word draws from its n-best segmentation list under the
    // alpha-scaled distribution, seeded per (doc, word position) like
    // the md5 sampling rules. Invariant-boolean oracle: every sample
    // reconstructs, piece counts stay within [n_words, n_chars],
    // replaying the seed reproduces the corpus bit-for-bit, and at
    // alpha=0.1 the sampler leaves the Viterbi argmax somewhere in the
    // corpus (the distribution-shift pin, computed at the fixed seed)
    "q_tokenize_unigram_sampled" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents")
      val model = graft.pipeline.UnigramLm.learn(
        docs, "text", vocabSize = 512, iters = 2)
      val words = F.filter(F.split(F.col("text"), "\\s+"),
        (x: org.apache.spark.sql.Column) => F.length(x) > 0)
      def sampleRun(out: String) = graft.pipeline.UnigramLm.tokenizeSampled(
          docs, "doc_id", "text", model, alpha = 0.1, nBest = 4, seed = 7L,
          outCol = out)
        .select(F.col("doc_id"), F.col(out))
      val vit = graft.pipeline.UnigramLm.tokenize(docs, "text", model, "vtokens")
        .select(F.col("doc_id"), F.col("vtokens"))
      val joined = docs.select(F.col("doc_id"), F.col("source"), F.col("text"),
          F.size(words).as("__nw"),
          F.length(F.regexp_replace(F.col("text"), "\\s+", "")).as("__nc"))
        .join(sampleRun("tokens"), "doc_id")
        .join(sampleRun("tokens2"), "doc_id")
        .join(vit, "doc_id")
        .localCheckpoint(false)
      val shifted = joined
        .filter(F.col("text").isNotNull && !(F.col("tokens") <=> F.col("vtokens")))
        .limit(1).count() > 0
      joined.groupBy(F.col("source"))
        .agg(
          F.count(F.lit(1)).as("docs"),
          (F.sum(F.when(F.col("text").isNull, 0L)
            .when(F.concat_ws("", F.col("tokens")) <=>
              F.regexp_replace(F.col("text"), "\\s+", ""), 0L).otherwise(1L)) === 0L)
            .as("reconstructs"),
          (F.sum(F.when(F.col("text").isNull, 0L)
            .when(F.size(F.col("tokens")) >= F.col("__nw") &&
              F.size(F.col("tokens")) <= F.col("__nc"), 0L).otherwise(1L)) === 0L)
            .as("bounds_ok"),
          (F.sum(F.when(F.col("tokens") <=> F.col("tokens2"), 0L).otherwise(1L))
            === 0L).as("deterministic"))
        .withColumn("shifted", F.lit(shifted))
        .orderBy(F.col("source"))
    }),

    // byte-fallback Unigram (SentencePiece byte_fallback, the
    // Llama-family lossless mode): uncovered characters tokenize to
    // <0xNN> byte pieces instead of unk. The corpus is ASCII, so a
    // planted non-ASCII suffix (Latin-1 + BMP currency + an astral
    // emoji, exercising the surrogate re-join) forces the fallback in
    // EVERY document. Invariant-boolean oracle: decode reconstructs
    // each document byte-exactly (no unk can decode), every piece is
    // in vocab ∪ byte alphabet, every doc used the fallback, and the
    // tokenization replays identically
    "q_tokenize_unigram_bytefallback" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents")
      val model = graft.pipeline.UnigramLm.withByteFallback(
        graft.pipeline.UnigramLm.learn(docs, "text", vocabSize = 512, iters = 2))
      val planted = docs.withColumn("text",
        F.when(F.col("text").isNull, F.lit(null).cast("string"))
          .otherwise(F.concat(F.col("text"), F.lit(" caf\u00e9\u20ac\uD83D\uDE00"))))
      val decU = F.udf((ts: Seq[String]) =>
        if (ts == null) null else graft.pipeline.UnigramLm.decodePieces(ts))
      val pieceSet = model.pieces.keySet
      val inVocabU = F.udf((ts: Seq[String]) =>
        ts != null && ts.forall(p =>
          pieceSet.contains(p) || graft.pipeline.UnigramLm.isBytePiece(p)))
      val usedU = F.udf((ts: Seq[String]) =>
        ts != null && ts.exists(graft.pipeline.UnigramLm.isBytePiece))
      val tok1 = graft.pipeline.UnigramLm.tokenize(planted, "text", model, "tokens")
      val both = graft.pipeline.UnigramLm.tokenize(tok1, "text", model, "tokens2")
      both.groupBy(F.col("source"))
        .agg(
          F.count(F.lit(1)).as("docs"),
          (F.sum(F.when(F.col("text").isNull, 0L)
            .when(decU(F.col("tokens")) <=>
              F.regexp_replace(F.col("text"), "\\s+", ""), 0L).otherwise(1L)) === 0L)
            .as("reconstructs"),
          (F.sum(F.when(F.col("text").isNull, 0L)
            .when(inVocabU(F.col("tokens")), 0L).otherwise(1L)) === 0L)
            .as("no_unk"),
          (F.sum(F.when(F.col("text").isNull, 0L)
            .when(usedU(F.col("tokens")), 0L).otherwise(1L)) === 0L)
            .as("used_fallback"),
          (F.sum(F.when(F.col("tokens") <=> F.col("tokens2"), 0L).otherwise(1L))
            === 0L).as("deterministic"))
        .orderBy(F.col("source"))
    }),

    // WordPiece (BERT-style) tokenizer: greedy longest-match against a
    // corpus-learned ##-marked piece vocabulary. Greedy matching is
    // non-SQL-expressible, so the oracle pins invariants computed
    // exactly in Spark: stripping ## reconstructs each document, the
    // training corpus yields zero [UNK], every word gives >= 1 piece,
    // and the vocabulary respects its budget
    "q_tokenize_wordpiece" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents")
      val learned = graft.pipeline.WordPiece.learn(docs, "text", vocabSize = 256)
      // persist + reload: the gate also covers the artifact round-trip
      val path = System.getProperty("java.io.tmpdir") + "/graft_q_wordpiece"
      graft.pipeline.Tokenizers.saveWordPieceModel(s, learned, path)
      val model = graft.pipeline.Tokenizers.loadWordPieceModel(s, path)
      val words = F.filter(F.split(F.col("text"), "\\s+"),
        (x: Column) => F.length(x) > 0)
      graft.pipeline.WordPiece.tokenize(docs, "text", model)
        .select(F.col("source"), F.col("text"), F.col("tokens"),
          F.size(words).as("__nw"))
        .groupBy(F.col("source"))
        .agg(
          F.count(F.lit(1)).as("docs"),
          (F.sum(F.when(F.col("text").isNull, 0L)
            .when(F.regexp_replace(F.concat_ws("", F.col("tokens")), "##", "") <=>
              F.regexp_replace(F.col("text"), "\\s+", ""), 0L).otherwise(1L)) === 0L)
            .as("reconstructs"),
          (F.sum(F.when(F.col("text").isNull, 0L)
            .when(!F.array_contains(F.col("tokens"), model.unk), 0L).otherwise(1L)) === 0L)
            .as("no_unk"),
          (F.sum(F.when(F.col("text").isNull, 0L)
            .when(F.size(F.col("tokens")) >= F.col("__nw"), 0L).otherwise(1L)) === 0L)
            .as("ge_one_piece_per_word"),
          F.lit(model.pieces.size <= 256).as("vocab_in_budget"))
        .orderBy(F.col("source"))
    }),

    // unigram cross-entropy quality signal (rounded to 4 decimals —
    // ln ulp differences across engines sit ~11 orders below the
    // rounding boundary)
    "q_lm_score" -> ((s: SparkSession, dir: String) =>
      graft.pipeline.Vocab.unigramLogLoss(t(s, dir, "documents"), "doc_id", "text")),

    // join-based unigram cross-entropy (no driver-side count map):
    // per-token terms bit-identical, 4-dp rounding absorbs the
    // summation-order difference — oracle shared with q_lm_score
    "q_lm_joined" -> ((s: SparkSession, dir: String) =>
      graft.pipeline.Vocab.unigramLogLossJoined(t(s, dir, "documents"), "doc_id", "text")),

    // trainable linear quality filter (hashed bag-of-words + logistic
    // regression), the spam-filter shape: real documents are the clean
    // class, deterministic doc_id-seeded spam the positive class;
    // trained on the even-id half, the broadcast-coefficient scorer
    // must classify the UNSEEN odd-id half near-perfectly (the
    // vocabularies are genuinely separable, unlike the testdata's
    // text-independent lang/source labels)
    "q_quality_classifier" -> ((s: SparkSession, dir: String) => {
      val spamWords = Array("click", "winner", "casino", "pills", "free",
        "prize", "claim", "bonus", "unsubscribe", "offer")
      val spamU = F.udf((id: Long) => {
        val r = new scala.util.Random(id)
        Seq.fill(60)(spamWords(r.nextInt(spamWords.length))).mkString(" ")
      })
      val docs = t(s, dir, "documents")
      val clean = docs.select(F.col("doc_id"), F.col("text"),
        F.lit(0).as("label"))
      val spam = docs.select((F.col("doc_id") + 1000000L).as("doc_id"),
        spamU(F.col("doc_id")).as("text"), F.lit(1).as("label"))
      val all = clean.union(spam)
      val model = graft.pipeline.QualityClassifier.train(
        all.filter(F.col("doc_id") % 2 === 0), "text", "label", dim = 1 << 16)
      val holdout = graft.pipeline.QualityClassifier.score(
        all.filter(F.col("doc_id") % 2 === 1), "text", model)
      holdout.agg(
        F.count(F.lit(1)).as("held_out"),
        ((F.sum(F.when(
          (F.col("quality_prob") >= 0.5 && F.col("label") === 1) ||
          (F.col("quality_prob") < 0.5 && F.col("label") === 0), 1L)
          .otherwise(0L)).cast("double") / F.count(F.lit(1))) >= 0.95)
          .as("holdout_acc_ok"))
    }),

    // Deflate compression-ratio redundancy signal: a document repeated
    // 4x must compress strictly better (lower ratio) than one copy,
    // ratios stay in sane bounds, and NULL text yields NULL —
    // orderings pinned, never raw zlib values
    "q_text_compression" -> ((s: SparkSession, dir: String) => {
      val tf = graft.pipeline.TextFunctions
      val rep4 = F.concat_ws(" ", F.col("text"), F.col("text"),
        F.col("text"), F.col("text"))
      t(s, dir, "documents")
        .filter(F.col("text").isNotNull)
        .select(F.col("source"),
          tf.compressionRatio(F.col("text")).as("__r1"),
          tf.compressionRatio(rep4).as("__r4"))
        .groupBy(F.col("source"))
        .agg(F.count(F.lit(1)).as("docs"),
          (F.sum(F.when(F.col("__r4") < F.col("__r1"), 0L).otherwise(1L)) === 0L)
            .as("repeat_compresses_better"),
          (F.sum(F.when(F.col("__r1") > 0.0 && F.col("__r1") < 1.5, 0L)
            .otherwise(1L)) === 0L).as("bounds_ok"))
        .orderBy(F.col("source"))
    }),

    // DSIR importance selection (Xie et al. 2023): hashed n-gram
    // likelihood-ratio scores toward a planted target domain. The
    // model learns from the EVEN-id half of the spam domain; top-k
    // selection over the mixed corpus must recover the whole domain
    // (including the unseen odd-id half) with >= 95% precision
    "q_dsir_select" -> ((s: SparkSession, dir: String) => {
      val spamWords = Array("click", "winner", "casino", "pills", "free",
        "prize", "claim", "bonus", "unsubscribe", "offer")
      val spamU = F.udf((id: Long) => {
        val r = new scala.util.Random(id)
        Seq.fill(60)(spamWords(r.nextInt(spamWords.length))).mkString(" ")
      })
      val docs = t(s, dir, "documents")
      val clean = docs.select(F.col("doc_id"), F.col("text"))
      val spam = docs.select((F.col("doc_id") + 1000000L).as("doc_id"),
        spamU(F.col("doc_id")).as("text"))
      val raw = clean.union(spam)
      val target = spam.filter(F.col("doc_id") % 2 === 0).select("text")
      val m = graft.pipeline.Dsir.learn(raw, target, "text", dim = 1 << 14)
      val k = spam.count()
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(F.col("dsir_score").desc, F.col("doc_id"))
      graft.pipeline.Dsir.score(raw, "text", m)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .agg(
          F.lit(2 * k).as("n_raw"),
          F.count(F.lit(1)).as("n_selected"),
          ((F.sum(F.when(F.col("doc_id") >= 1000000L, 1L).otherwise(0L))
            .cast("double") / F.count(F.lit(1))) >= 0.95).as("precision_ok"))
    }),

    // bigram cross-entropy quality signal — fluency, not just token
    // rarity; counts exact, ln/round cross-engine safe as in q_lm_score
    "q_lm_bigram" -> ((s: SparkSession, dir: String) =>
      graft.pipeline.Vocab.bigramLogLoss(t(s, dir, "documents"), "doc_id", "text")),

    // interpolated Kneser-Ney bigram scoring (KenLM-style perplexity
    // filter): join-based — no driver-side vocabulary — with the
    // counts-of-counts discount; per-doc avg -ln P rounded to 4 dp
    // (the q_lm_bigram cross-engine float form)
    "q_kn_score" -> ((s: SparkSession, dir: String) =>
      graft.pipeline.NgramLm.kneserNeyLogLoss(
        t(s, dir, "documents"), "doc_id", "text")),

    // full trigram interpolated KN (trigram → continuation-bigram →
    // continuation-unigram), every level type-derived; same join-based
    // no-driver-vocab shape and 4-dp float form as q_kn_score
    "q_kn3_score" -> ((s: SparkSession, dir: String) =>
      graft.pipeline.NgramLm.kneserNey3LogLoss(
        t(s, dir, "documents"), "doc_id", "text")),

    // CCNet-style head/middle/tail corpus partition: LM cross-entropy
    // scores, min-shifted sketch thresholds, explicit-cutoff tiers.
    // Totals exact; tier balance pinned within sketch slop (same
    // invariant form as q_quantile_buckets)
    "q_ccnet_tiers" -> ((s: SparkSession, dir: String) => {
      val p = graft.pipeline.Vocab.perplexityPartition(
        t(s, dir, "documents"), "doc_id", "text")
      p.groupBy(F.col("tier")).agg(F.count(F.lit(1)).as("__n"))
        .agg(F.sum(F.col("__n")).as("n_docs"),
             F.count(F.lit(1)).cast("long").as("tiers"),
             F.max(F.col("__n")).as("__maxn"), F.min(F.col("__n")).as("__minn"))
        .select(F.col("n_docs"), F.col("tiers"),
          (F.col("__maxn") * 3 <= F.col("n_docs") * 1.4 &&
           F.col("__minn") * 3 >= F.col("n_docs") * 0.6).as("balanced_ok"))
    }),

    // rolling-hash document fingerprints: collision-free vs normalized text
    "q_text_fingerprint" -> ((s: SparkSession, dir: String) => {
      val tf = graft.pipeline.TextFunctions
      t(s, dir, "documents").agg(
        F.countDistinct(tf.fingerprint(F.col("text"))).as("distinct_fp"),
        F.countDistinct(F.regexp_replace(F.col("text"), "\\s+", " ")).as("distinct_norm"))
        .withColumn("collision_free", F.col("distinct_fp") === F.col("distinct_norm"))
    }),

    // language-ID heuristic distribution (no ANSI-SQL equivalent heuristic)
    "q_lang_id" -> ((s: SparkSession, dir: String) => {
      val tf = graft.pipeline.TextFunctions
      t(s, dir, "documents")
        .groupBy(F.col("lang"), tf.lang_id(F.col("text")).as("predicted"))
        .agg(F.count(F.lit(1)).as("cnt"))
        .orderBy("lang", "predicted")
    }),

    // multimodal resize + frame sampling: payloads capped at 384 bytes,
    // then every-2nd 64-byte frame with at most 2 per record — params
    // chosen so BOTH the resize cap and the frame cap bind on this
    // corpus (fr docs are 47-569 bytes); exactly replicable from UTF-8
    // byte lengths in the oracle
    "q_multimodal_frames" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents")
      val media = graft.pipeline.Multimodal.mediaFromDocuments(s, docs)
        .filter(F.col("modality") === "video")
      val resized = graft.pipeline.Multimodal.resize(media, 384)
      graft.pipeline.Multimodal.sampleFrames(resized, 64, everyNth = 2, maxFrames = 2)
        .groupBy()
        .agg(
          F.count(F.lit(1)).as("frames"),
          F.coalesce(F.sum(F.col("frame_bytes")), F.lit(0L)).as("bytes_total"),
          F.coalesce(F.sum(F.col("frame_idx").cast("long")), F.lit(0L)).as("idx_sum"))
    }),

    // REAL image decode, oracle-gated: deterministic PNGs are generated
    // per doc (dims derived from doc_id), decoded by the javax.imageio
    // path, and the oracle recomputes the expected dimension sums from
    // doc_id alone — a stub fallback would report fake dims and fail
    "q_multimodal_decode" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val pngUdf = F.udf((id: Long) => {
        val w = 16 + (id % 32).toInt
        val h = 8 + (id % 16).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, ((x * 37 + y * 101) & 0xFFFFFF)); x += 1 }
          y += 1
        }
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", baos)
        baos.toByteArray
      })
      val media = t(s, dir, "documents")
        .filter(F.col("doc_id") % 10 === 0)
        .select(F.col("doc_id").as("media_id"), F.lit("image").as("modality"),
          pngUdf(F.col("doc_id")).as("payload"), F.lit(0L).as("meta_bytes"),
          F.col("source").as("meta_source"))
        .as[graft.pipeline.Multimodal.MediaRecord]
      graft.pipeline.Multimodal.extractFeatures(media)
        .agg(F.count(F.lit(1)).as("imgs"),
             F.sum(F.col("width").cast("long")).as("width_sum"),
             F.sum(F.col("height").cast("long")).as("height_sum"))
    }),

    // REAL audio decode via javax.sound.sampled: deterministic 8-bit
    // PCM WAVs built from document bytes; decoder must recover the
    // exact header facts, and the RMS envelope must be a sane signal
    "q_multimodal_audio" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val wavU = F.udf((text: String) =>
        graft.pipeline.Multimodal.pcmWav(text.getBytes("UTF-8"), 8000))
      val media = t(s, dir, "documents")
        .filter(F.col("doc_id") % 7 === 0)
        .select(F.col("doc_id").as("media_id"), F.lit("audio").as("modality"),
          wavU(F.col("text")).as("payload"), F.lit(0L).as("meta_bytes"),
          F.col("source").as("meta_source"))
        .as[graft.pipeline.Multimodal.MediaRecord]
      graft.pipeline.Multimodal.extractFeatures(media)
        .agg(F.count(F.lit(1)).as("clips"),
             F.sum(F.col("width").cast("long")).as("rate_sum"),
             F.sum(F.col("height").cast("long")).as("channel_sum"),
             F.sum(F.col("payload_bytes")).as("bytes_sum"),
             F.min(F.array_min(F.col("feature")) > 0.0f &&
                   F.array_max(F.col("feature")) < 1.0f).as("rms_ok"))
    }),

    // REAL video decode: deterministic MJPEG-in-AVI containers (frame
    // count, dims, and solid-gray frame shades all derived from
    // doc_id), decoded by the pure-JVM AVI parser + javax.imageio
    // keyframe path. The oracle recomputes container dims and keyframe
    // counts from doc_id alone — a stub fallback would report fake
    // dims and fail; the luminance envelope must track the known frame
    // shades (first frame gray 40, last 40 + 40*(n-1), tol 0.08)
    "q_multimodal_video" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val aviU = F.udf((id: Long) => {
        val w = 32 + (id % 16).toInt
        val h = 24 + (id % 8).toInt
        val n = 2 + (id % 4).toInt
        val frames = Seq.tabulate(n) { i =>
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = img.createGraphics()
          try {
            val shade = 40 + 40 * i
            g.setColor(new java.awt.Color(shade, shade, shade))
            g.fillRect(0, 0, w, h)
          } finally g.dispose()
          val baos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "jpg", baos)
          baos.toByteArray
        }
        graft.pipeline.Multimodal.mjpegAvi(frames, w, h)
      })
      def media = t(s, dir, "documents")
        .filter(F.col("doc_id") % 11 === 0)
        .select(F.col("doc_id").as("media_id"), F.lit("video").as("modality"),
          aviU(F.col("doc_id")).as("payload"), F.lit(0L).as("meta_bytes"),
          F.col("source").as("meta_source"))
        .as[graft.pipeline.Multimodal.MediaRecord]
      val nFrames = (F.lit(2) + F.col("media_id") % 4).cast("int")
      val firstOk = F.abs(F.element_at(F.col("feature"), 1) - 40.0 / 255.0) < 0.08
      val lastOk = F.abs(F.element_at(F.col("feature"), nFrames) -
        (F.lit(40.0) + (nFrames - 1) * 40.0) / 255.0) < 0.08
      val kf = graft.pipeline.Multimodal.sampleKeyframes(media).groupBy().agg(
        F.count(F.lit(1)).as("keyframes"),
        F.coalesce(F.sum(F.col("frame_idx").cast("long")), F.lit(0L)).as("idx_sum"))
      graft.pipeline.Multimodal.extractFeatures(media).toDF()
        .agg(
          F.count(F.lit(1)).as("clips"),
          F.sum(F.col("width").cast("long")).as("width_sum"),
          F.sum(F.col("height").cast("long")).as("height_sum"),
          (F.sum(F.when(firstOk && lastOk, 0L).otherwise(1L)) === 0L)
            .as("envelope_ok"))
        .crossJoin(kf)
    }),

    // REAL PDF decode: each doc's text split into 500-char pages,
    // written as a Flate-compressed PDF, parsed back — the extracted
    // text must equal the original BYTE-EXACTLY and the page count /
    // char count must match the pre-PDF facts (a stub fallback fails
    // all three)
    "q_multimodal_pdf" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val pdfU = F.udf((text: String) => {
        val tx = if (text == null) "" else text
        graft.pipeline.Multimodal.simplePdf(
          if (tx.isEmpty) Seq("") else tx.grouped(500).toSeq)
      })
      val textU = F.udf((p: Array[Byte]) =>
        graft.pipeline.Multimodal.pdfText(p).map(_._2).orNull)
      val jlenU = F.udf((t: String) => if (t == null) 0 else t.length)
      val expPagesU = F.udf((t: String) =>
        if (t == null || t.isEmpty) 1 else (t.length + 499) / 500)
      val docs = t(s, dir, "documents").filter(F.col("doc_id") % 13 === 0)
      val media = docs
        .select(F.col("doc_id").as("media_id"), F.lit("pdf").as("modality"),
          pdfU(F.col("text")).as("payload"), F.lit(0L).as("meta_bytes"),
          F.col("source").as("meta_source"))
        .as[graft.pipeline.Multimodal.MediaRecord]
      val feats = graft.pipeline.Multimodal.extractFeatures(media).toDF()
        .select(F.col("media_id"), F.col("width"), F.col("height"))
      docs.select(F.col("doc_id"), F.col("text"), pdfU(F.col("text")).as("payload"))
        .withColumn("dtext", textU(F.col("payload")))
        .join(feats, F.col("doc_id") === F.col("media_id"))
        .agg(
          F.count(F.lit(1)).as("docs"),
          (F.sum(F.when(F.col("dtext") === F.col("text"), 0L).otherwise(1L)) === 0L)
            .as("text_roundtrip"),
          (F.sum(F.when(F.col("width") === expPagesU(F.col("text")), 0L)
            .otherwise(1L)) === 0L).as("pages_ok"),
          (F.sum(F.when(F.col("height") === jlenU(F.col("text")), 0L)
            .otherwise(1L)) === 0L).as("chars_ok"))
    }),

    // perceptual-hash media dedup: planted near-duplicate images (9x8
    // PNGs carrying exact dHashes — groups of 3 ids with pairwise
    // distances 1/4/5, cross-group ~Binomial(64, 1/2)) through the
    // full decode -> dHash -> Hamming-banded-bucket pipeline; the
    // oracle replays the expected pair set and the EXACT per-pair
    // hammings from id arithmetic, so a stub hash or a banding
    // recall hole fails row-for-row
    "q_multimodal_dedup" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val media = graft.pipeline.Multimodal.plantedNearDupMedia(
        t(s, dir, "documents").select(F.col("doc_id")), "doc_id")
      graft.pipeline.Multimodal.nearDuplicateMedia(media, maxHamming = 6)
        .select(F.col("id_a"), F.col("id_b"), F.col("hamming"))
        .orderBy("id_a", "id_b")
    }),

    // DCT pHash sibling of q_multimodal_dedup: fixtures plant the
    // hash in the DCT DOMAIN (±24 low-frequency AC coefficients,
    // signs survive integer pixel rounding exactly), the signature
    // rides the same banded dedup unchanged — same planted groups,
    // same id-arithmetic oracle
    "q_image_phash" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val media = graft.pipeline.Multimodal.plantedNearDupMedia(
        t(s, dir, "documents").select(F.col("doc_id")), "doc_id", phash = true)
      val sigs = graft.pipeline.Multimodal.imageSignatures(media)
      graft.pipeline.Dedup.hammingPairs(sigs, "media_id", "phash", maxHamming = 6)
        .select(F.col("id_a"), F.col("id_b"), F.col("hamming"))
        .orderBy("id_a", "id_b")
    }),

    // multi-keyframe video dedup: planted pairs where the odd id is a
    // TRIMMED re-cut (first keyframe dropped, survivor one bit off).
    // nearDuplicateVideos catches every pair at closest-frame
    // hamming 1; the single-signature path compares the dropped lead
    // frame against the survivor (~Binomial(64, 1/2)) and misses all
    // of them — single_missed pins that per row
    "q_video_dedup" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val media = graft.pipeline.Multimodal.plantedTrimmedVideos(
        t(s, dir, "documents").select(F.col("doc_id")), "doc_id")
      val multi = graft.pipeline.Multimodal.nearDuplicateVideos(media, maxHamming = 6)
      val single = graft.pipeline.Multimodal.nearDuplicateMedia(media, maxHamming = 6)
        .select(F.col("id_a"), F.col("id_b"), F.lit(1).as("__s"))
      multi.join(single, Seq("id_a", "id_b"), "left")
        .select(F.col("id_a"), F.col("id_b"), F.col("hamming"),
          F.col("__s").isNull.as("single_missed"))
        .orderBy("id_a", "id_b")
    }),

    // broadcast Aho-Corasick blocklist scan: planted borderless
    // patterns appended per doc_id; the oracle counts each pattern
    // with the length/replace trick (equal to all-position counts
    // for borderless patterns) over the SAME augmented text, so
    // natural corpus occurrences also reconcile exactly
    "q_keyword_scan" -> ((s: SparkSession, dir: String) => {
      val aug = F.concat(F.col("text"), F.lit(" "),
        F.when(F.col("doc_id") % 3 === 0, "spamword buynow spamword")
          .when(F.col("doc_id") % 3 === 1, "zzqx")
          .otherwise("cleantail"))
      graft.pipeline.Keywords.keywordHits(
          t(s, dir, "documents"), aug, Seq("spamword", "buynow", "zzqx"))
        .select(F.col("doc_id"), F.col("kw.hits").as("hits"),
          F.col("kw.patterns").as("patterns"))
        .orderBy("doc_id")
    }),

    // folded blocklist scan: planted MIXED-CASE / fullwidth variants
    // of zzqx-prefixed patterns (absent from the natural vocabulary,
    // so planted counts are the whole signal — DuckDB cannot replay
    // the NFKC fold, hence the id-arithmetic oracle); the folded
    // automaton counts them, the unfolded scan provably cannot
    "q_keyword_scan_folded" -> ((s: SparkSession, dir: String) => {
      val aug = F.concat(F.col("text"), F.lit(" "),
        F.when(F.col("doc_id") % 4 === 0, "ZzQxSpam zzqxspam")
          .when(F.col("doc_id") % 4 === 1, "ＺＺＱＸＢＵＹ")
          .when(F.col("doc_id") % 4 === 2, "zzqｘspam café")
          .otherwise("cleantail"))
      graft.pipeline.Keywords.keywordHits(
          t(s, dir, "documents"), aug, Seq("zzqxspam", "zzqxbuy"), folded = true)
        .select(F.col("doc_id"), F.col("kw.hits").as("hits"),
          F.col("kw.patterns").as("patterns"))
        .orderBy("doc_id")
    }),

    // automaton redaction: star-out the union of matched spans. For
    // these patterns (pairwise non-overlapping, borderless, no
    // substring relations, '*' in none) chained SQL replace with
    // equal-length star runs is provably identical, so the oracle
    // hash-matches the full scrubbed strings
    "q_keyword_scrub" -> ((s: SparkSession, dir: String) => {
      val aug = F.concat(F.col("text"), F.lit(" "),
        F.when(F.col("doc_id") % 3 === 0, "spamword buynow spamword")
          .when(F.col("doc_id") % 3 === 1, "zzqx")
          .otherwise("cleantail"))
      graft.pipeline.Keywords.scrubKeywords(
          t(s, dir, "documents").select(F.col("doc_id"), aug.as("t")),
          F.col("t"), Seq("spamword", "buynow", "zzqx"), "clean")
        .select(F.col("doc_id"), F.col("clean"))
        .orderBy("doc_id")
    }),

    // fill-in-the-middle rewrite (PSM + SPM): split points from pure
    // id/length arithmetic, so the oracle rebuilds the exact
    // sentinel-assembled strings with substr (both engines index
    // characters); a slicing or assembly regression hash-fails
    "q_fim" -> ((s: SparkSession, dir: String) => {
      val p1 = F.expr("(length(text) * (1 + doc_id % 5)) div 10")
      val p2 = F.expr(
        "(length(text) * (1 + doc_id % 5)) div 10 + " +
        "((length(text) - (length(text) * (1 + doc_id % 5)) div 10) * " +
        "(1 + doc_id % 3)) div 4")
      t(s, dir, "documents")
        .filter(F.col("text").isNotNull)
        .select(F.col("doc_id"),
          graft.pipeline.Fim.fimTransform(F.col("text"), p1, p2).as("psm"),
          graft.pipeline.Fim.fimTransform(F.col("text"), p1, p2, spm = true)
            .as("spm"))
        .orderBy("doc_id")
    }),

    // epoch up-sampling to per-domain token budgets: floor(B/T) full
    // copies + the md5-prefix partial epoch; the oracle replays the
    // epoch arithmetic and the prefix selection with window sums
    "q_mix_epochs" -> ((s: SparkSession, dir: String) => {
      val tok = F.when(F.col("text").isNotNull,
        F.size(F.filter(F.split(F.col("text"), "\\s+"),
          (x: Column) => F.length(x) > 0)).cast("long")).otherwise(0L)
      val budgets = t(s, dir, "documents")
        .select(F.col("source").cast("string").as("d")).distinct()
        .collect().map(r => r.getString(0) -> 6000L).toMap
      graft.pipeline.Sampling.repeatToBudget(
          t(s, dir, "documents").withColumn("__tok", tok),
          F.col("source"), F.col("doc_id"), F.col("__tok"), budgets)
        .groupBy(F.col("source"))
        .agg(F.count(F.lit(1)).as("rows_out"),
          F.sum(F.col("__tok")).as("tok_out"),
          F.sum(F.col("doc_id") * (F.col("epoch") + 1L)).as("weighted_id_sum"),
          F.max(F.col("epoch")).as("max_epoch"))
        .orderBy("source")
    }),

    // margin-scored pair mining (LASER/CCMatrix criterion): cosine
    // top-3 of each query in a disjoint corpus half, scored by
    // cos / mean of both local neighborhood averages. Ranks ride the
    // measured cosine-gap stability (the q_rank_metrics rule); cos and
    // margin round 4dp (sum-order noise ~1e-13)
    "q_bitext_margin" -> ((s: SparkSession, dir: String) => {
      val emb = t(s, dir, "embeddings")
      graft.pipeline.Similarity.mineMarginPairs(
          emb.filter(F.col("vec_id") < 24), emb.filter(F.col("vec_id") >= 24),
          "vec_id", "embedding", k = 3, kAvg = 4)
        .select(F.col("a_id"), F.col("b_id"), F.col("rank"),
          F.round(F.col("cos"), 4).as("cos4"),
          F.round(F.col("margin"), 4).as("margin4"))
        .orderBy("a_id", "b_id")
    }),

    // indexed margin mining: IVF cell joins on both directions, no
    // cartesian/broadcast of either corpus. Planted exact-copy queries
    // (a = copies of b vecs 24..35, id + 10000) make the output
    // clustering-independent: identical vectors co-cluster always, so
    // each query's twin cell is probed first and the twin (cos 1.0,
    // strict max — no natural pair reaches 0.99) is rank 1; both
    // neighborhood averages are <= 1 so margin >= 1
    "q_bitext_margin_indexed" -> ((s: SparkSession, dir: String) => {
      val emb = t(s, dir, "embeddings")
      val bNat = emb.filter(F.col("vec_id") >= 24)
      val aPlanted = emb.filter(F.col("vec_id").between(24, 35))
        .select((F.col("vec_id") + 10000L).as("vec_id"), F.col("embedding"))
      graft.pipeline.Similarity.mineMarginPairsAuto(
          aPlanted, bNat, "vec_id", "embedding", k = 1, kAvg = 4, probeMass = 0.45)
        .select(F.col("a_id"), F.col("b_id"), F.col("rank"),
          F.round(F.col("cos"), 4).as("cos4"),
          (F.col("margin") >= 1.0 - 1e-9).as("margin_ge_1"))
        .orderBy("a_id")
    }),

    // signal-agreement audit: Pearson + Spearman (tie-averaged ranks)
    // between doc length and token count per source; the oracle
    // replays the rank windows and the sum-form Pearson verbatim,
    // both rounded 4dp (sum-order noise ~1e-9 relative)
    "q_rank_correlation" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents")
        .select(F.col("source"), F.col("n_chars"),
          F.size(F.filter(F.split(F.col("text"), "\\s+"),
            (x: Column) => F.length(x) > 0)).as("toks"))
      graft.pipeline.Eval.rankCorrelation(docs, "n_chars", "toks", Seq("source"))
        .select(F.col("source"), F.col("n"),
          F.round(F.col("pearson"), 4).as("pearson4"),
          F.round(F.col("spearman"), 4).as("spearman4"))
        .orderBy("source")
    }),

    // first-fit-decreasing packing: totals and doc counts exact per
    // source; the FFD guarantees ride as pinned booleans (non-singleton
    // packs fit the budget; at most one pack per stratum half-empty —
    // a second could never have been opened by first-fit)
    "q_pack_ffd" -> ((s: SparkSession, dir: String) => {
      val budget = 2000L
      val ffd = graft.pipeline.Packing.packBestFit(
        t(s, dir, "documents").filter(F.col("n_chars").isNotNull),
        "source", "doc_id", "n_chars", budget)
      ffd.groupBy(F.col("source"), F.col("pack_id"))
        .agg(F.sum(F.col("n_chars")).as("__t"), F.count(F.lit(1)).as("__n"))
        .groupBy(F.col("source"))
        .agg(
          F.sum(F.col("__n")).as("docs"),
          F.sum(F.col("__t")).as("chars"),
          (F.sum(F.when(F.col("__t") > budget && F.col("__n") > 1, 1L)
            .otherwise(0L)) === 0L).as("fits_ok"),
          (F.sum(F.when(F.col("__t") * 2 <= budget, 1L).otherwise(0L)) <= 1L)
            .as("halfempty_ok"))
        .orderBy("source")
    }),

    // BLEU-4 / ROUGE-1/2 text-overlap metrics: candidate = first 3/4
    // of each document's tokens vs the full text as reference. Clipped
    // n-gram matches are exact BIGINTs; BLEU (exp/ln) rounds to 4dp,
    // ROUGE ratios/F1 are single divisions of exact ints (bit-exact
    // raw doubles, the q_rank_metrics rule)
    "q_text_overlap" -> ((s: SparkSession, dir: String) => {
      val toks = F.filter(F.split(F.col("text"), "\\s+"),
        (x: Column) => F.length(x) > 0)
      val prepared = t(s, dir, "documents")
        .filter(F.col("text").isNotNull)
        .select(F.col("doc_id"), toks.as("__w"))
        .select(F.col("doc_id"),
          F.array_join(F.slice(F.col("__w"), F.lit(1),
            F.floor(F.size(F.col("__w")) * 3 / 4).cast("int")), " ").as("cand"),
          F.array_join(F.col("__w"), " ").as("ref"))
      graft.pipeline.Eval.textOverlap(prepared, "doc_id", "cand", "ref")
        .select(F.col("doc_id"), F.col("cand_tokens"), F.col("ref_tokens"),
          F.col("m1"), F.col("m2"), F.col("m3"), F.col("m4"),
          F.round(F.col("bleu"), 4).as("bleu4"),
          F.col("rouge1_p"), F.col("rouge1_r"),
          F.col("rouge1_f1"), F.col("rouge2_f1"))
        .orderBy("doc_id")
    }),

    // incremental perceptual dedup: history (variants 0/1) behind a
    // PERSISTED hash index, fresh batch (variant 2) probes it —
    // history is never re-decoded; expected pairs are exactly
    // (v2, v0, 4) and (v2, v1, 5) per group from the planted bit plan
    "q_dedup_incremental_media" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents").select(F.col("doc_id"))
      val hist = graft.pipeline.Multimodal.plantedNearDupMedia(
        docs.filter(F.col("doc_id") % 3 =!= 2), "doc_id")
      val batch = graft.pipeline.Multimodal.plantedNearDupMedia(
        docs.filter(F.col("doc_id") % 3 === 2), "doc_id")
      val path = System.getProperty("java.io.tmpdir") + "/graft_q_mhidx"
      graft.pipeline.Dedup.saveSignatureIndex(
        graft.pipeline.Multimodal.buildMediaHashIndex(hist), path)
      graft.pipeline.Multimodal.incrementalNearDuplicateMedia(
          batch, graft.pipeline.Dedup.loadSignatureIndex(s, path), maxHamming = 6)
        .orderBy("id_new", "id_old")
    }),

    // streaming perceptual media dedup under the gate: the fresh
    // variant-2 slice replayed as a file-source stream of (ts,
    // media_id, modality, payload) rows and probed against the
    // PERSISTED media hash index of variants 0/1 — decode + dHash on
    // the stream side only, popcount verify against signatures
    // carried in the index. Stateless except the pair dedup, so
    // AvailableNow replay emits exactly the batch incremental pair
    // set (shares q_dedup_incremental_media's oracle)
    "q_stream_media_dedup" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents").select(F.col("doc_id"))
      val hist = graft.pipeline.Multimodal.plantedNearDupMedia(
        docs.filter(F.col("doc_id") % 3 =!= 2), "doc_id")
      val idxPath = System.getProperty("java.io.tmpdir") + "/graft_q_stream_md_idx"
      graft.pipeline.Dedup.saveSignatureIndex(
        graft.pipeline.Multimodal.buildMediaHashIndex(hist), idxPath)
      val fresh = graft.pipeline.Multimodal.plantedNearDupMedia(
          docs.filter(F.col("doc_id") % 3 === 2), "doc_id")
        .toDF()
        .select(F.lit(java.sql.Timestamp.valueOf("2026-01-01 00:00:00")).as("ts"),
          F.col("media_id"), F.col("modality"), F.col("payload"))
      val tmp = System.getProperty("java.io.tmpdir") + "/graft_q_stream_md_src"
      fresh.write.mode("overwrite").parquet(tmp)
      val stream = s.readStream.schema(fresh.schema).parquet(tmp)
      val out = graft.streaming.SketchStreaming.mediaDupStream(
        stream, "ts", "media_id", "modality", "payload",
        graft.pipeline.Dedup.loadSignatureIndex(s, idxPath),
        // effectively-infinite horizon: bounded replays must never
        // expire pair-dedup state (see q_stream_dedup)
        watermarkDelay = "3650 days", maxHamming = 6)
      s.catalog.dropTempView("graft_stream_media")
      val q = out.writeStream
        .outputMode("append").format("memory")
        .queryName("graft_stream_media")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table("graft_stream_media")
        .select(F.col("id_new"), F.col("id_old"), F.col("hamming"))
        .orderBy("id_new", "id_old")
    }),

    // streaming canary scan under the gate: the planted corpus
    // replayed as a file stream through the stateless scan -> verify
    // chain (map-only regex + broadcast expected-token join) — shares
    // q_canary's oracle
    "q_stream_canary" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents").select("doc_id", "text")
      val planted = graft.pipeline.Canary.plant(
        docs, "doc_id", "text", "r9", fraction = 0.1)
      val tmp = System.getProperty("java.io.tmpdir") + "/graft_q_stream_cn_src"
      planted.write.mode("overwrite").parquet(tmp)
      val stream = s.readStream.schema(planted.schema).parquet(tmp)
      val out = graft.streaming.SketchStreaming.canaryStream(
        stream, "doc_id", "text", "r9", docs.select("doc_id"), "doc_id")
      s.catalog.dropTempView("graft_stream_canary")
      val q = out.writeStream
        .outputMode("append").format("memory")
        .queryName("graft_stream_canary")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table("graft_stream_canary")
        .select("doc_id", "canary", "source_id")
        .orderBy("doc_id")
    }),

    // audio sibling of q_multimodal_dedup: WAV payloads carrying exact
    // planted fingerprints through decode -> gain-invariant
    // audioFingerprint -> Hamming banding; same id-arithmetic oracle
    "q_audio_dedup" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val media = graft.pipeline.Multimodal.plantedNearDupAudio(
        t(s, dir, "documents").select(F.col("doc_id")), "doc_id")
      graft.pipeline.Multimodal.nearDuplicateMedia(media, maxHamming = 6)
        .select(F.col("id_a"), F.col("id_b"), F.col("hamming"))
        .orderBy("id_a", "id_b")
    }),

    // multimodal plumbing: binary payloads through batched (stub) decode
    // WARC (ISO 28500) ingestion + WET extraction: per-doc Common
    // Crawl-layout files (per-record gzip members: warcinfo +
    // text/html resource with entities planted in the markup) are
    // parsed by the REAL parser; doc_id is recovered from the PARSED
    // WARC-Target-URI, content_length from the record header, and the
    // text by the real HTML state machine (entity decode load-bearing:
    // the oracle's expected strings contain the decoded forms)
    "q_warc" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val warcU = F.udf((id: Long, text: String) => {
        val html = "<html><head><title>doc " + id + " &amp; crawl</title></head>" +
          "<body><p>" + text + "</p><p>caf&#233; r&#xE9;sum&#xE9;</p></body></html>"
        graft.sources.Warc.writeWarc(Seq(
          graft.sources.Warc.WarcRecord("warcinfo", s"<urn:uuid:info-$id>", "",
            "2026-01-01T00:00:00Z", "application/warc-fields", 17L,
            "software: graft\r\n".getBytes("US-ASCII")),
          graft.sources.Warc.WarcRecord("resource", s"<urn:uuid:doc-$id>",
            s"http://example.com/doc/$id", "2026-01-01T00:00:00Z",
            "text/html; charset=utf-8",
            html.getBytes("UTF-8").length.toLong, html.getBytes("UTF-8"))))
      })
      val files = t(s, dir, "documents")
        .select(F.col("doc_id"), warcU(F.col("doc_id"), F.col("text")).as("warc"))
      val recs = graft.sources.Warc.records(files, "doc_id", "warc")
      val perFile = recs.groupBy(F.col("file_id"))
        .agg(F.count(F.lit(1)).as("records"))
      graft.sources.Warc.wetConversion(recs)
        .join(perFile, "file_id")
        .select(
          F.element_at(F.split(F.col("target_uri"), "/"), -1).cast("long").as("doc_id"),
          F.col("records"), F.col("content_length"), F.col("text"))
        .orderBy("doc_id")
    }),

    // Unicode canonicalization: NFKC + accent strip + typographic
    // punctuation fold on text with planted compat forms; the oracle
    // states the expected ASCII literals outright — real Normalizer
    // behavior is load-bearing, a pass-through fails the string hash
    "q_unicode_fold" -> ((s: SparkSession, dir: String) => {
      val id = F.col("doc_id")
      val planted = F.when(id % 4 === 0, " ﬁle Ｔｅｓｔ café")
        .when(id % 4 === 1, " naïve Müller ½")
        .when(id % 4 === 2, " “quoted” – it’s …")
        .otherwise(" № Ⅸ ⁄ plain")
      t(s, dir, "documents")
        .select(id.as("doc_id"),
          graft.pipeline.TextFunctions.foldUnicode(
            F.concat(F.col("text"), planted)).as("folded"))
        .orderBy("doc_id")
    }),

    // URL blocklist screening: hosts/paths built in-plan from doc_id;
    // suffix-label domain matching (badcasino.com.safe.org must NOT
    // block), strict substrings, and token-level soft words are all
    // genuinely recomputed by the oracle
    "q_url_filter" -> ((s: SparkSession, dir: String) => {
      val id = F.col("doc_id")
      val str = (c: org.apache.spark.sql.Column) => c.cast("string")
      val host = F.when(id % 7 === 0, F.lit("www.badcasino.com"))
        .when(id % 7 === 1, F.lit("sub.tracker.net"))
        .when(id % 7 === 2, F.concat(F.lit("example"), str(id % 5), F.lit(".com")))
        .when(id % 7 === 3, F.lit("news.example.co.uk"))
        .when(id % 7 === 4, F.lit("badcasino.com.safe.org"))
        .when(id % 7 === 5, F.concat(F.lit("shop.example"), str(id % 5), F.lit(".com")))
        .otherwise(F.lit("BadCasino.COM"))
      val url = F.concat(F.lit("http://"), host, F.lit("/page/"), str(id),
        F.when(id % 3 === 0, F.lit("/free-poker-online")).otherwise(F.lit("")),
        F.when(id % 11 === 0, F.lit("/xxx-ads")).otherwise(F.lit("")))
      val blocked = Set("badcasino.com", "tracker.net")
      val strict = Seq("xxx", "porn")
      val soft = Seq("poker", "bet", "online")
      val hits = graft.pipeline.Urls.urlKeywordHits(url, strict, soft)
      t(s, dir, "documents").select(id.as("doc_id"),
          graft.pipeline.Urls.urlBlocked(s, url, blocked).as("domain_blocked"),
          hits.getField("strict_hits").as("strict_hits"),
          hits.getField("soft_hits").as("soft_hits"),
          graft.pipeline.Urls.urlAllowed(s, url, blocked, strict, soft)
            .as("allowed"))
        .orderBy("doc_id")
    }),

    // Luhn-gated credit-card scrub: the checksum decides (4111...1111
    // valid -> tagged; ...1112 invalid -> untouched; 12-digit and
    // 21-digit runs are out of candidate range)
    "q_scrub_cc" -> ((s: SparkSession, dir: String) => {
      val id = F.col("doc_id")
      val planted = F.when(id % 5 === 0, " pay 4111 1111 1111 1111 now")
        .when(id % 5 === 1, " pay 4111-1111-1111-1112 now")
        .when(id % 5 === 2, " mc 5500 0000 0000 0004 ok")
        .when(id % 5 === 3, " id 1234 5678 9012 ok")
        .otherwise(" acct 123456789012345678901 x")
      t(s, dir, "documents").select(id.as("doc_id"),
          F.concat(F.col("text"),
            graft.pipeline.Scrub.scrubCreditCards(planted)).as("scrubbed"))
        .orderBy("doc_id")
    }),

    // asymmetric containment: 30-token quotes planted as probe docs
    // (id + 1e6) against the full corpus; gram-join with df-capped
    // postings, stop grams out of numerator AND denominator
    "q_dedup_containment" -> ((s: SparkSession, dir: String) => {
      val d = t(s, dir, "documents")
      val toks = F.filter(F.split(F.lower(F.col("text")), "\\s+"),
        w => F.length(w) > 0)
      val probe = d.filter(F.col("doc_id") % 17 === 0 && F.col("text").isNotNull)
        .withColumn("__toks", toks)
        .filter(F.size(F.col("__toks")) >= 30)
        .select((F.col("doc_id") + 1000000L).as("doc_id"),
          F.array_join(F.slice(F.col("__toks"), 1, 30), " ").as("text"))
      graft.pipeline.Dedup.containmentPairs(probe, d, "doc_id", "text",
          gramSize = 5, threshold = 0.9, maxDf = 1024)
        .orderBy("id_p", "id_c")
    }),

    // containment against a PERSISTED gram index (save -> load ->
    // probe): history is shingled once at build; output must equal the
    // direct path, so it shares q_dedup_containment's oracle
    "q_dedup_containment_indexed" -> ((s: SparkSession, dir: String) => {
      val d = t(s, dir, "documents")
      val toks = F.filter(F.split(F.lower(F.col("text")), "\\s+"),
        w => F.length(w) > 0)
      val probe = d.filter(F.col("doc_id") % 17 === 0 && F.col("text").isNotNull)
        .withColumn("__toks", toks)
        .filter(F.size(F.col("__toks")) >= 30)
        .select((F.col("doc_id") + 1000000L).as("doc_id"),
          F.array_join(F.slice(F.col("__toks"), 1, 30), " ").as("text"))
      val path = System.getProperty("java.io.tmpdir") + "/graft_q_cidx"
      graft.pipeline.Dedup.saveSignatureIndex(
        graft.pipeline.Dedup.buildContainmentIndex(d, "doc_id", "text",
          gramSize = 5, maxDf = 1024), path)
      graft.pipeline.Dedup.probeContainment(probe,
          graft.pipeline.Dedup.loadSignatureIndex(s, path), "doc_id", "text",
          gramSize = 5, threshold = 0.9)
        .orderBy("id_p", "id_c")
    }),

    // crawl-graph edges: planted links in in-plan HTML; extraction,
    // entity decoding, and RFC 3986 resolution all recomputed by the
    // oracle (mailto dropped, protocol-relative adopts the scheme)
    "q_links" -> ((s: SparkSession, dir: String) =>
      graft.sources.Warc.outlinks(crawlPages(s, dir), "url", "html")
        .orderBy("src", "dst", "anchor")),

    // PageRank over the planted crawl graph (3 iterations, d = 0.85,
    // dangling targets redistribute uniformly): ranks normalized by N
    // and rounded 4 dp (the q_lm_bigram cross-engine float form); the
    // oracle unrolls the iterations as chained CTEs
    "q_pagerank" -> ((s: SparkSession, dir: String) => {
      val edges = graft.sources.Warc.outlinks(crawlPages(s, dir), "url", "html")
      val pr = graft.pipeline.LinkGraph.pageRank(edges,
        iterations = 3, damping = 0.85)
      val n = pr.agg(F.count(F.lit(1)).cast("double").as("__n"))
      pr.crossJoin(F.broadcast(n))
        .select(F.col("node"),
          F.round(F.col("rank") * F.col("__n"), 4).as("rank_n"))
        .orderBy("node")
    }),

    // warm-start continuation: two cold iterations seed one warm
    // iteration — the same iteration sequence as cold(3) (seed
    // renormalization perturbs at ~1e-15, far under the 4dp round),
    // so the unrolled 3-iteration oracle replays verbatim
    "q_pagerank_warm" -> ((s: SparkSession, dir: String) => {
      val edges = graft.sources.Warc.outlinks(crawlPages(s, dir), "url", "html")
      val prior = graft.pipeline.LinkGraph.pageRank(edges,
        iterations = 2, damping = 0.85)
      val pr = graft.pipeline.LinkGraph.pageRankWarmStart(edges, prior,
        iterations = 1, damping = 0.85)
      val n = pr.agg(F.count(F.lit(1)).cast("double").as("__n"))
      pr.crossJoin(F.broadcast(n))
        .select(F.col("node"),
          F.round(F.col("rank") * F.col("__n"), 4).as("rank_n"))
        .orderBy("node")
    }),

    // HITS hubs/authorities over the planted crawl graph: 2 unrolled
    // iterations replay in SQL (the q_pagerank convention — scores
    // ×N at 4dp; normalizers are exact sums over the same edge set)
    "q_hits" -> ((s: SparkSession, dir: String) => {
      val edges = graft.sources.Warc.outlinks(crawlPages(s, dir), "url", "html")
      val out = graft.pipeline.LinkGraph.hits(edges, iterations = 2)
      val n = out.agg(F.count(F.lit(1)).cast("double").as("__n"))
      out.crossJoin(F.broadcast(n))
        .select(F.col("node"),
          F.round(F.col("hub") * F.col("__n"), 4).as("hub_n"),
          F.round(F.col("authority") * F.col("__n"), 4).as("auth_n"))
        .orderBy("node")
    }),

    // anchor-text aggregation per link target (retrieval anchor field):
    // distinct-page counts per (dst, anchor), ranked
    "q_link_anchors" -> ((s: SparkSession, dir: String) =>
      graft.pipeline.LinkGraph.topAnchors(
          graft.sources.Warc.outlinks(crawlPages(s, dir), "url", "html"), k = 2)
        .orderBy("dst", "rank")),

    // host-level rollup of the crawl graph: registrable-domain edges
    // with distinct page-pair weights, self-domain links dropped (the
    // site{i}.com -> top/rel edges vanish; ext/cdn edges survive)
    "q_host_graph" -> ((s: SparkSession, dir: String) =>
      graft.pipeline.LinkGraph.hostGraph(
          graft.sources.Warc.outlinks(crawlPages(s, dir), "url", "html"))
        .orderBy("src_domain", "dst_domain")),

    // CSV ingest with corrupt-line quarantine (type-cast failures):
    // the Csv sibling of q_jsonl
    "q_csv" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents").select("doc_id", "lang")
      val base = System.getProperty("java.io.tmpdir") + "/graft_q_csv"
      docs.select(F.concat(F.col("doc_id").cast("string"), F.lit(","),
          F.col("lang")).as("value"))
        .union(s.range(2).select(F.concat(F.lit("oops"),
          F.col("id").cast("string"), F.lit(",zz")).as("value")))
        .repartition(4).write.mode("overwrite").text(base)
      val schema = new org.apache.spark.sql.types.StructType()
        .add("doc_id", org.apache.spark.sql.types.LongType)
        .add("lang", org.apache.spark.sql.types.StringType)
      val (good, bad) = graft.sources.Csv.readWithQuarantine(s, base, schema)
      good.agg(F.count(F.lit(1)).as("n_rows"),
          F.sum(F.col("doc_id")).as("id_sum"),
          F.count_distinct(F.col("lang")).as("langs"))
        .crossJoin(bad.agg(F.count(F.lit(1)).as("corrupt")))
    }),

    // HTML head metadata extraction (title / meta description /
    // canonical link / lang attr): planted head markup with entities
    // and a decoy second title; the oracle states every expected
    // string arithmetically from doc_id
    "q_page_meta" -> ((s: SparkSession, dir: String) => {
      val id = F.col("doc_id")
      val str = (c: Column) => c.cast("string")
      val html = F.concat(
        F.lit("<html lang=\""),
        F.when(id % 2 === 0, F.lit("en")).otherwise(F.lit("de")),
        F.lit("\"><head><title>Doc "), str(id),
        F.lit(" &amp;\n  more</title>"),
        F.lit("<meta name=\"description\" content=\"Desc "), str(id % 13),
        F.lit("\">"),
        F.when(id % 3 === 0, F.concat(
          F.lit("<link rel=\"canonical\" href=\"http://c.org/"), str(id),
          F.lit("\">"))).otherwise(F.lit("")),
        F.lit("<title>decoy</title></head><body>b</body></html>"))
      t(s, dir, "documents")
        .select(id.as("doc_id"),
          graft.sources.Warc.pageMetaColumn(html).as("__m"))
        .select(F.col("doc_id"), F.col("__m.title").as("title"),
          F.col("__m.description").as("description"),
          F.col("__m.canonical").as("canonical"), F.col("__m.lang").as("lang"))
        .orderBy("doc_id")
    }),

    // robots.txt screening (RFC 9309): per-host rule tables joined to
    // a URL list; named-group selection, wildcard + $ anchor,
    // longest-match, allow tie-break, and missing-robots default all
    // exercised; the oracle replays the decisions as CASE arithmetic
    "q_robots" -> ((s: SparkSession, dir: String) => {
      val id = F.col("doc_id")
      val host = F.concat(F.lit("h"), (id % 5).cast("string"), F.lit(".com"))
      val path = F.element_at(F.array(
        F.lit("/home"), F.lit("/private/a"), F.lit("/private/pub/b"),
        F.lit("/x-12.bin"), F.lit("/x-12.bin?k"), F.lit("/priv"),
        F.lit("/private")), (id % 7 + 1).cast("int"))
      val urls = t(s, dir, "documents")
        .select(id.as("doc_id"), host.as("host"), path.as("path"))
      val robotsTxt = "User-agent: graftbot\nDisallow: /private\n" +
        "Allow: /private/pub\nDisallow: /x*.bin$\n\nUser-agent: *\nDisallow: /\n"
      val robots = t(s, dir, "documents")
        .select((id % 5).as("k")).distinct().filter(F.col("k") =!= 4)
        .select(F.concat(F.lit("h"), F.col("k").cast("string"),
          F.lit(".com")).as("host"), F.lit(robotsTxt).as("robots"))
      graft.sources.Robots.screen(urls,
          graft.sources.Robots.ruleTable(robots, "host", "robots", "GraftBot"),
          "host", "path")
        .select("doc_id", "host", "path", "allowed")
        .orderBy("doc_id")
    }),

    // TFRecord egress + re-ingest: corpus rows ride the framed-record
    // format (masked CRC32C, Example proto) through a tmp dir and
    // back; aggregates match the parquet truth, and the float32 wire
    // width is pinned by an in-Spark cast-equality boolean
    // WebDataset tar shards: write (txt, lang) members per doc, read
    // back, and require byte-exact member content per key; byte
    // totals replay via DuckDB strlen
    "q_webdataset" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents")
        .filter(F.col("text").isNotNull && F.col("lang").isNotNull)
      val keyed = docs.select(
        F.concat(F.lit("doc"), F.col("doc_id")).as("key"),
        F.map(
          F.lit("txt"), F.encode(F.col("text"), "UTF-8"),
          F.lit("lang"), F.encode(F.col("lang"), "UTF-8")).as("members"))
      val base = System.getProperty("java.io.tmpdir") + "/graft_q_wds"
      graft.sources.WebDataset.write(
        keyed.repartition(4), F.col("key"), F.col("members"), base)
      val back = graft.sources.WebDataset.read(s, base)
      val orig = docs.select(
        F.concat(F.lit("doc"), F.col("doc_id")).as("key"),
        F.col("text").as("__ot"), F.col("lang").as("__ol"))
      back.join(orig, Seq("key"))
        .agg(
          F.count(F.lit(1)).as("n_samples"),
          F.sum(F.length(F.element_at(F.col("members"), "txt")).cast("long"))
            .as("txt_bytes"),
          F.sum(F.length(F.element_at(F.col("members"), "lang")).cast("long"))
            .as("lang_bytes"),
          F.min(
            (F.decode(F.element_at(F.col("members"), "txt"), "UTF-8") <=> F.col("__ot")) &&
            (F.decode(F.element_at(F.col("members"), "lang"), "UTF-8") <=> F.col("__ol")))
            .as("content_ok"))
    }),

    // Megatron .bin/.idx interchange: write token-id shards, read
    // them back; totals replay from documents in SQL and multiset
    // round-trip equality pins as a boolean
    "q_megatron" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents").filter(F.col("text").isNotNull)
      val ids = F.transform(
        F.filter(F.split(F.col("text"), "\\s+"), w => F.length(w) > 0),
        w => F.length(w).cast("int"))
      val withIds = docs.select(ids.as("__ids"))
      val base = System.getProperty("java.io.tmpdir") + "/graft_q_megatron"
      graft.sources.MegatronIdx.write(
        withIds.repartition(4), F.col("__ids"), base)
      val back = graft.sources.MegatronIdx.read(s, base)
      val a = back.select(F.col("ids")).groupBy(F.col("ids")).count()
      val b = withIds.select(F.col("__ids").cast("array<int>").as("ids"))
        .groupBy(F.col("ids")).count()
      val same = a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty
      back.agg(
        F.count(F.lit(1)).as("n_seqs"),
        F.sum(F.size(F.col("ids")).cast("long")).as("cells"),
        F.sum(F.aggregate(F.col("ids"), F.lit(0L), (acc, x) => acc + x))
          .as("id_sum"),
        F.lit(same).as("roundtrip_ok"))
    }),

    "q_tfrecord" -> ((s: SparkSession, dir: String) => {
      val base = System.getProperty("java.io.tmpdir") + "/graft_q_tfrec"
      val docs = t(s, dir, "documents").select(
        F.col("doc_id"), F.col("lang"), F.col("text"),
        ((F.col("doc_id") % 97).cast("double") / 7.0).as("score"),
        F.array(F.col("doc_id") % 5, F.col("doc_id") % 11,
          F.lit(7L)).as("toks"))
      graft.sources.TfRecord.write(docs.repartition(4), base)
      val schema = new org.apache.spark.sql.types.StructType()
        .add("doc_id", org.apache.spark.sql.types.LongType)
        .add("lang", org.apache.spark.sql.types.StringType)
        .add("text", org.apache.spark.sql.types.StringType)
        .add("score", org.apache.spark.sql.types.DoubleType)
        .add("toks", org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType))
      val orig = docs.select(F.col("doc_id").as("o_id"),
        F.col("score").cast("float").cast("double").as("o_score"))
      graft.sources.TfRecord.read(s, base, schema)
        .join(orig, F.col("doc_id") === F.col("o_id"))
        .agg(F.count(F.lit(1)).as("n_rows"),
          F.sum(F.col("doc_id")).as("id_sum"),
          F.sum(F.length(F.col("text"))).as("chars"),
          F.count_distinct(F.col("lang")).as("langs"),
          F.sum(F.aggregate(F.col("toks"), F.lit(0L), _ + _)).as("tok_sum"),
          F.min(F.col("score") === F.col("o_score")).as("score_f32_ok"))
    }),

    // JSONL ingest with corrupt-line quarantine: corpus round-trips
    // through to_json text, 3 planted malformed lines land in the
    // quarantine frame, good-side aggregates match the parquet truth
    "q_jsonl" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents").select("doc_id", "text", "lang")
      val base = System.getProperty("java.io.tmpdir") + "/graft_q_jsonl"
      val goodLines = docs.select(F.to_json(F.struct(
        F.col("doc_id"), F.col("text"), F.col("lang"))).as("value"))
      val badLines = s.range(3).select(F.concat(
        F.lit("{\"doc_id\": "), F.col("id").cast("string"),
        F.lit(", \"text\": \"trunc")).as("value"))
      goodLines.union(badLines).repartition(4)
        .write.mode("overwrite").text(base)
      val schema = new org.apache.spark.sql.types.StructType()
        .add("doc_id", org.apache.spark.sql.types.LongType)
        .add("text", org.apache.spark.sql.types.StringType)
        .add("lang", org.apache.spark.sql.types.StringType)
      val (good, bad) = graft.sources.Jsonl.readWithQuarantine(s, base, schema)
      good.agg(F.count(F.lit(1)).as("n_rows"),
          F.sum(F.col("doc_id")).as("id_sum"),
          F.sum(F.length(F.col("text"))).as("chars"))
        .crossJoin(bad.agg(F.count(F.lit(1)).as("corrupt")))
    }),

    // URL canonicalization + registrable domain: messy URLs built
    // in-plan from doc_id (case noise, default port, dot-segments,
    // duplicate slashes, tracking params, unsorted query, fragment,
    // multi-part TLD every 5th row); the oracle constructs the
    // EXPECTED canonical string and domain independently in SQL
    "q_url" -> ((s: SparkSession, dir: String) => {
      val id = F.col("doc_id")
      val str = (c: org.apache.spark.sql.Column) => c.cast("string")
      val messy = F.concat(
        F.lit("HTTP://"),
        F.when(id % 5 === 0,
            F.concat(F.lit("News.Site"), str(id % 7), F.lit(".CO.UK")))
          .otherwise(F.concat(F.lit("ExAmple"), str(id % 7), F.lit(".COM"))),
        F.when(id % 3 === 0, F.lit(":80")).otherwise(F.lit("")),
        F.lit("/a//b"), str(id), F.lit("/./c/../d"), str(id % 4), F.lit("/"),
        F.lit("?z="), str(id), F.lit("&utm_source=x&a="), str(id % 9),
        F.lit("&fbclid=q#frag"), str(id))
      t(s, dir, "documents")
        .select(id.as("doc_id"),
          graft.pipeline.Urls.canonicalizeUrl(messy).as("canonical"),
          graft.pipeline.Urls.urlDomain(messy).as("domain"))
        .orderBy("doc_id")
    }),

    "q_multimodal" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents")
      val media = graft.pipeline.Multimodal.mediaFromDocuments(s, docs)
      val feats = graft.pipeline.Multimodal.extractFeatures(media)
      feats.groupBy(F.col("modality"))
        .agg(
          F.count(F.lit(1)).as("cnt"),
          F.sum(F.col("payload_bytes")).as("bytes_total"),
          (F.min(F.size(F.col("feature"))) === 8).as("feat_ok"))
        .orderBy("modality")
    }),

    // positional inverted index over documents: exact integer profile
    // (postings, vocabulary, tf mass, max document frequency) plus a
    // positional-integrity boolean (Σ|positions| == Σtf by construction)
    "q_retrieval_index" -> ((s: SparkSession, dir: String) => {
      val idx = graft.pipeline.Retrieval
        .buildIndex(t(s, dir, "documents"), "doc_id", "text")
      idx.groupBy(F.col("term"))
        .agg(F.count(F.lit(1)).as("df"), F.sum(F.col("tf")).as("tfs"),
          F.sum(F.size(F.col("positions"))).as("nps"))
        .agg(
          F.count(F.lit(1)).as("n_terms"),
          F.sum(F.col("df")).as("n_postings"),
          F.sum(F.col("tfs")).as("tf_total"),
          F.max(F.col("df")).as("max_df"),
          (F.sum(F.col("nps")) === F.sum(F.col("tfs"))).as("positions_ok"))
    }),

    // BM25 ranked search: top-10 documents for a 3-term query. Ranks
    // are the tested surface (integer output; the ln-based score stays
    // engine-side) — top-15 score gaps measured ≥ 5e-5 at both SFs, far
    // above cross-engine libm noise
    "q_bm25" -> ((s: SparkSession, dir: String) => {
      graft.pipeline.Retrieval.bm25TopK(
          t(s, dir, "documents"), "doc_id", "text",
          Seq("slow", "merge", "window"), 10)
        .select(F.col("rank").cast("long").as("rank"),
          F.col("id").as("doc_id"), F.col("tf_total"), F.col("n_terms_hit"))
        .orderBy("rank")
    }),

    // metadata-filtered BM25 (the serving constraint: "search within
    // this collection"): candidates restricted to doc_id % 3 = 0 with
    // CORPUS-LEVEL df/N/avgdl — the exactness contract is filter-then-
    // rank of full-corpus scoring, which the oracle replays by adding
    // the predicate to the scored set only. Ranks pinned (q_bm25
    // rule): measured filtered top-15 adjacent gaps >= 4.0e-5 at both
    // SFs. indexed_same pins the partition-pruned saved-index probe
    // equal to the one-shot row for row.
    "q_retrieval_filtered" -> ((s: SparkSession, dir: String) => {
      val d = t(s, dir, "documents")
      val q = Seq("slow", "merge", "window")
      val allowed = d.filter(F.col("doc_id") % 3 === 0).select("doc_id")
      val oneShot = graft.pipeline.Retrieval.bm25TopKFiltered(
        d, "doc_id", "text", q, 10, allowed)
      val path = System.getProperty("java.io.tmpdir") + "/graft_q_retr_filt"
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      graft.pipeline.Retrieval.buildTextIndex(d, "doc_id", "text", 32)
        .save(path)
      val probed = graft.pipeline.Retrieval.bm25TopKFilteredIndexed(
        graft.pipeline.Retrieval.loadTextIndex(s, path), q, 10, allowed)
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .select(F.col("rank").cast("long"), F.col("id"),
          F.col("tf_total"), F.col("n_terms_hit"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSeq.sortBy(_._1)
      val same = rows(oneShot) == rows(probed)
      oneShot
        .select(F.col("rank").cast("long").as("rank"),
          F.col("id").as("doc_id"), F.col("tf_total"),
          F.col("n_terms_hit"), F.lit(same).as("indexed_same"))
        .orderBy("rank")
    }),

    // batched multi-query BM25 (the serving form): three queries rank
    // in ONE pass — union-of-terms postings scan, broadcast
    // (term -> query) map, one query_id repartition for sum + window.
    // Each query's semantics are exactly the single-query ones (the
    // per_query_same boolean pins batch ≡ per-query probes row for
    // row). Ranks pinned: measured per-query top-15 nonzero gaps >=
    // 1.0e-4 at both SFs; the zero-gap pairs are identical-profile
    // planted duplicates, whose doc_id tie-break is engine-independent
    "q_retrieval_batch" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val d = t(s, dir, "documents")
      val idx = graft.pipeline.Retrieval.buildTextIndex(d, "doc_id", "text", 32)
      val qs: Seq[(Long, Seq[String])] = Seq(
        0L -> Seq("slow", "merge", "window"),
        1L -> Seq("hash", "batch"),
        2L -> Seq("filter", "scan", "index"))
      val got = graft.pipeline.Retrieval.bm25TopKBatch(
        idx, qs.toDF("query_id", "terms"), 10)
        .localCheckpoint(false)
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .select(F.col("rank").cast("long"), F.col("id"),
          F.col("tf_total"), F.col("n_terms_hit"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq.sortBy(_._1)
      val same = qs.forall { case (qid, ts) =>
        rows(got.filter(F.col("query_id") === qid)) ==
          rows(graft.pipeline.Retrieval.bm25TopKIndexed(idx, ts, 10))
      }
      got.select(F.col("query_id"), F.col("rank").cast("long").as("rank"),
          F.col("id").as("doc_id"), F.col("tf_total"), F.col("n_terms_hit"),
          F.lit(same).as("per_query_same"))
        .orderBy("query_id", "rank")
    }),

    // best-window snippet extraction from the positional index: per
    // matching doc, the width-12 token window covering the most
    // DISTINCT query terms, leftmost on ties — a FULL REPLAY oracle
    // (the window maximization re-runs in SQL over the same integer
    // positions; the snippet string is the normalized token slice, so
    // strings hash-match too)
    "q_retrieval_snippet" -> ((s: SparkSession, dir: String) => {
      graft.pipeline.Retrieval.snippets(
          t(s, dir, "documents"), "doc_id", "text",
          Seq("slow", "merge", "window"), 12)
        .select(F.col("id").as("doc_id"),
          F.col("start").cast("long").as("start"),
          F.col("end").cast("long").as("end"),
          F.col("n_terms").cast("long").as("n_terms"),
          F.col("n_hits").cast("long").as("n_hits"),
          F.col("snippet"))
        .orderBy("doc_id")
    }),

    // RM3-style pseudo-relevance feedback: feedback probe -> RM1-
    // weighted expansion terms (Σ tf/dl over the top-10 docs, original
    // terms excluded) -> final probe with the union query. The WHOLE
    // two-pass composition replays in SQL; ranks AND the expansion
    // list pinned (cutoff gaps measured >= 9.5e-3, within-selection
    // ordering gaps >= 3.0e-5, final ranking gaps >= 1.1e-6 at both
    // SFs — all orders above cross-engine ulp noise)
    "q_retrieval_prf" -> ((s: SparkSession, dir: String) => {
      graft.pipeline.Retrieval.bm25TopKPrf(
          t(s, dir, "documents"), "doc_id", "text",
          Seq("slow", "merge", "window"), 10)
        .select(F.col("rank").cast("long").as("rank"),
          F.col("id").as("doc_id"), F.col("n_terms_hit"),
          F.array_join(F.col("expansion"), " ").as("expansion"))
        .orderBy("rank")
    }),

    // proximity-boosted BM25 (score = bm25 + 0.5 * Σ_pairs
    // 1/(1+minDist) from the positional index): ranks pinned — the
    // combined-score top-15 adjacent gaps measured >= 5.8e-4 at both
    // SFs, 12 orders above cross-engine ulp noise. Planted leg: two
    // equal-bm25 docs (same tf profile, same dl) where only term
    // ADJACENCY differs — proximity must rank the adjacent one first
    // even against the id tie-break, and lambda = 0 must reproduce
    // plain bm25TopK's ranks exactly on the real corpus.
    "q_retrieval_proximity" -> ((s: SparkSession, dir: String) => {
      val rt = graft.pipeline.Retrieval
      val d = t(s, dir, "documents")
      val q = Seq("slow", "merge", "window")
      // planted: B (id 1, scattered) wins the id tie-break at plain
      // bm25; A (id 2, adjacent) must overtake it under proximity
      val planted = s.createDataFrame(Seq(
        (1L, "slow pad1 pad2 merge pad3 pad4 pad5 window"),
        (2L, "slow merge window pad1 pad2 pad3 pad4 pad5")))
        .toDF("doc_id", "text")
      val proxTop = rt.bm25TopKProximity(planted, "doc_id", "text", q,
        k = 2, lambdaProx = 0.5).orderBy("rank")
        .collect().map(_.getAs[Long]("id")).toSeq
      val plainTop = rt.bm25TopK(planted, "doc_id", "text", q, k = 2)
        .orderBy("rank").collect().map(_.getAs[Long]("id")).toSeq
      val plantedOk = proxTop == Seq(2L, 1L) && plainTop == Seq(1L, 2L)
      // lambda = 0 degenerates to plain bm25 exactly (x + 0.0 * p = x)
      val lam0 = rt.bm25TopKProximity(d, "doc_id", "text", q, 10,
          lambdaProx = 0.0)
        .orderBy("rank").collect().map(_.getAs[Long]("id")).toSeq
      val plain = rt.bm25TopK(d, "doc_id", "text", q, 10)
        .orderBy("rank").collect().map(_.getAs[Long]("id")).toSeq
      rt.bm25TopKProximity(d, "doc_id", "text", q, 10, lambdaProx = 0.5)
        .select(F.col("rank").cast("long").as("rank"),
          F.col("id").as("doc_id"), F.col("n_terms_hit"),
          F.lit(plantedOk).as("planted_ok"),
          F.lit(lam0 == plain).as("lambda0_plain"))
        .orderBy("rank")
    }),

    // the RAG serving tail, composed: BM25 top-10 -> best-window
    // snippets -> greedy rank-order prefix fill under a 60-token
    // budget (the fill STOPS at the first overflow — later smaller
    // snippets never leapfrog rank order). Every number is exact
    // integer math and the snippet strings are normalized token
    // slices, so the WHOLE composition replays in SQL.
    "q_pipeline_rag" -> ((s: SparkSession, dir: String) => {
      val d = t(s, dir, "documents")
      val ranked = graft.pipeline.Retrieval.bm25TopK(
          d, "doc_id", "text", Seq("slow", "merge", "window"), 10)
        .select(F.col("rank"), F.col("id"))
      graft.pipeline.Retrieval.assembleContext(
          d, "doc_id", "text", ranked, Seq("slow", "merge", "window"),
          window = 12, budgetTokens = 60)
        .select(F.col("rank").cast("long").as("rank"),
          F.col("id").as("doc_id"),
          F.col("start").cast("long").as("start"),
          F.col("end").cast("long").as("end"),
          F.col("n_tokens").cast("long").as("n_tokens"),
          F.col("cum_tokens").cast("long").as("cum_tokens"),
          F.col("snippet"))
        .orderBy("rank")
    }),

    // batched RAG assembly: three queries ride ONE bm25TopKBatch +
    // ONE assembleContextBatch (one query_id repartition end-to-end);
    // each query's snippets use its own terms and its prefix stops at
    // its own first overflow. Full SQL replay per query; plus the
    // batch ≡ single-query assembleContext pin (rank gaps measured —
    // the q_bm25 rule — so cross-plan float sums cannot flip ranks)
    "q_pipeline_rag_batch" -> ((s: SparkSession, dir: String) => {
      val rt = graft.pipeline.Retrieval
      val d = t(s, dir, "documents")
      val idx = rt.buildTextIndex(d, "doc_id", "text", buckets = 32)
      val qTerms = Seq(
        0L -> Seq("slow", "merge", "window"),
        1L -> Seq("hash", "batch", "scan"),
        2L -> Seq("filter", "row", "group"))
      val qdf = s.createDataFrame(qTerms).toDF("query_id", "terms")
      val ranked = rt.bm25TopKBatch(idx, qdf, 10)
        .select(F.col("query_id"), F.col("rank"), F.col("id"))
        .localCheckpoint(false)
      val ctx = rt.assembleContextBatch(d, "doc_id", "text", ranked, qdf,
        window = 12, budgetTokens = 60).localCheckpoint(false)
      def norm(rows: Array[org.apache.spark.sql.Row])
          : Seq[(Int, Long, Long, Long, Long, Long, String)] = rows.map(r =>
        (r.getAs[Int]("rank"), r.getAs[Long]("id"),
          r.getAs[Number]("start").longValue(),
          r.getAs[Number]("end").longValue(),
          r.getAs[Number]("n_tokens").longValue(),
          r.getAs[Number]("cum_tokens").longValue(),
          r.getAs[String]("snippet"))).sortBy(_._1).toSeq
      val perQuerySame = qTerms.forall { case (qid, terms) =>
        val single = rt.assembleContext(d, "doc_id", "text",
          rt.bm25TopKIndexed(idx, terms, 10)
            .select(F.col("rank"), F.col("id")),
          terms, window = 12, budgetTokens = 60).collect()
        val batch = ctx.filter(F.col("query_id") === qid).collect()
        norm(single) == norm(batch)
      }
      ctx.select(F.col("query_id"), F.col("rank").cast("long").as("rank"),
          F.col("id").as("doc_id"),
          F.col("start").cast("long").as("start"),
          F.col("end").cast("long").as("end"),
          F.col("n_tokens").cast("long").as("n_tokens"),
          F.col("cum_tokens").cast("long").as("cum_tokens"),
          F.col("snippet"),
          F.lit(perQuerySame).as("per_query_same"))
        .orderBy("query_id", "rank")
    }),

    // MaxScore-pruned BM25: a fixture with a guaranteed stopword-class
    // tail term (fillertok on EVERY doc -> idf ~ 0.5/N) and a planted
    // rare essential term (raretok17 on doc_id % 17) makes the theta >
    // S_tail bound check pass STRUCTURALLY (theta >= the rare idf ~
    // ln(18) x a bounded tf-part; S_tail <= 1.1/N) — pruned pins true
    // regeneration-proof. Ranks replay the BM25 formula over the
    // fixture (measured top-15 adjacent gaps at both SFs; the q_bm25
    // rule); same_as_plain pins the exactness contract row for row
    // INCLUDING scores to 1e-9.
    "q_retrieval_maxscore" -> ((s: SparkSession, dir: String) => {
      val rt = graft.pipeline.Retrieval
      val d = t(s, dir, "documents").withColumn("text2",
        F.concat(F.col("text"),
          F.when(F.col("doc_id") % 17 === 0, F.lit(" raretok17"))
            .otherwise(F.lit("")),
          F.lit(" fillertok")))
      val path = System.getProperty("java.io.tmpdir") + "/graft_q_maxscore"
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      rt.buildTextIndex(d, "doc_id", "text2", buckets = 32).save(path)
      val q = Seq("raretok17", "merge", "fillertok")
      val r = rt.bm25TopKMaxScore(s, path, q, 10, maxTailShare = 0.02)
      val plain = rt.bm25TopKIndexed(rt.loadTextIndex(s, path), q, 10)
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .select("rank", "id", "score", "tf_total", "n_terms_hit")
        .collect().map(x => (x.getInt(0), x.getLong(1), x.getDouble(2),
          x.getLong(3), x.getLong(4))).sortBy(_._1).toSeq
      val (a, b) = (rows(r.rows), rows(plain))
      val same = a.size == b.size && a.zip(b).forall { case (x, y) =>
        x._1 == y._1 && x._2 == y._2 && math.abs(x._3 - y._3) < 1e-9 &&
        x._4 == y._4 && x._5 == y._5
      }
      r.rows.select(F.col("rank").cast("long").as("rank"),
          F.col("id").as("doc_id"), F.col("tf_total"),
          F.col("n_terms_hit"))
        .withColumn("pruned", F.lit(r.pruned))
        .withColumn("tail_is_filler", F.lit(r.tail == Seq("fillertok")))
        .withColumn("same_as_plain", F.lit(same))
        .orderBy("rank")
    }),

    // batched MaxScore: the q_retrieval_maxscore fixture with TWO
    // planted rare tokens; three queries share one pruned pass and the
    // theta-check runs per query. Per-query top-11 nonzero gaps
    // measured >= 7.3e-4 at both SFs; zero-gap pairs are equal-dl docs
    // matching the same (tf=1, tf=1) pair — 2-addend commutative sums,
    // safe per the q_retrieval_batch rule. pruned_q0/q1 pin the
    // structural engagement; batch_same pins row equality (scores to
    // 1e-9) with the plain bm25TopKBatch; fallback_same pins the
    // k-beyond-candidates leg.
    "q_retrieval_batch_maxscore" -> ((s: SparkSession, dir: String) => {
      val rt = graft.pipeline.Retrieval
      val d = t(s, dir, "documents").withColumn("text2",
        F.concat(F.col("text"),
          F.when(F.col("doc_id") % 17 === 0, F.lit(" raretok17"))
            .otherwise(F.lit("")),
          F.when(F.col("doc_id") % 23 === 0, F.lit(" raretok23"))
            .otherwise(F.lit("")),
          F.lit(" fillertok")))
      val path = System.getProperty("java.io.tmpdir") + "/graft_q_bmaxscore"
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      rt.buildTextIndex(d, "doc_id", "text2", buckets = 32).save(path)
      val qTerms = Seq(
        0L -> Seq("raretok17", "merge", "fillertok"),
        1L -> Seq("raretok23", "window", "fillertok"),
        2L -> Seq("raretok17", "fillertok"))
      val qdf = s.createDataFrame(qTerms).toDF("query_id", "terms")
      val r = rt.bm25TopKBatchMaxScore(s, path, qdf, 10,
        maxTailShare = 0.02)
      val plain = rt.bm25TopKBatch(rt.loadTextIndex(s, path), qdf, 10)
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .select("query_id", "rank", "id", "score", "tf_total",
          "n_terms_hit")
        .collect().map(x => (x.getLong(0), x.getInt(1), x.getLong(2),
          x.getDouble(3), x.getLong(4), x.getLong(5)))
        .sortBy(t => (t._1, t._2)).toSeq
      val (a, bq) = (rows(r.rows), rows(plain))
      val batchSame = a.size == bq.size && a.zip(bq).forall { case (x, y) =>
        x._1 == y._1 && x._2 == y._2 && x._3 == y._3 &&
        math.abs(x._4 - y._4) < 1e-9 && x._5 == y._5 && x._6 == y._6
      }
      // k beyond the rare pool -> that query must take the exact
      // fallback leg
      val big = Seq(9L -> Seq("raretok17", "fillertok"))
      val bigDf = s.createDataFrame(big).toDF("query_id", "terms")
      val rBig = rt.bm25TopKBatchMaxScore(s, path, bigDf, 100000,
        maxTailShare = 0.02)
      val plainBig = rt.bm25TopKBatch(rt.loadTextIndex(s, path), bigDf,
        100000)
      val fallbackSame = rBig.fallbackQueries == Seq(9L) &&
        rows(rBig.rows) == rows(plainBig)
      r.rows.select(F.col("query_id"),
          F.col("rank").cast("long").as("rank"),
          F.col("id").as("doc_id"), F.col("tf_total"),
          F.col("n_terms_hit"))
        .withColumn("pruned_q0", F.lit(r.prunedQueries.contains(0L)))
        .withColumn("pruned_q1", F.lit(r.prunedQueries.contains(1L)))
        .withColumn("batch_same", F.lit(batchSame))
        .withColumn("fallback_same", F.lit(fallbackSame))
        .orderBy("query_id", "rank")
    }),

    // spelling suggestions from the corpus term dictionary (SymSpell
    // deletion-neighborhood candidates + exact DP verify): everything
    // in the ranking is an INTEGER (distance, df), so the suggestion
    // lists replay exactly via SQL levenshtein — no floats, no
    // measured gaps needed
    "q_retrieval_spell" -> ((s: SparkSession, dir: String) => {
      // planted near-miss terms with distinct dfs exercise the
      // (distance, df DESC, term) ranking: mergia (%5) and mergib
      // (%7) are both distance 2 from "mergi"; merge is distance 1
      val d = t(s, dir, "documents").withColumn("text2",
        F.concat(F.col("text"),
          F.when(F.col("doc_id") % 5 === 0, F.lit(" mergia"))
            .otherwise(F.lit("")),
          F.when(F.col("doc_id") % 7 === 0, F.lit(" mergib"))
            .otherwise(F.lit(""))))
      val idx = graft.pipeline.Retrieval.buildIndex(d, "doc_id", "text2")
      val dict = graft.pipeline.Spelling.termDictionary(idx)
      val sidx = graft.pipeline.Spelling.buildSpellIndex(dict, 2)
      graft.pipeline.Spelling.suggestBatch(sidx,
          Seq("mergi", "windoq", "zzzzzz"), 2, 5)
        .select(F.col("query_term"),
          F.col("rank").cast("long").as("rank"), F.col("term"),
          F.col("distance").cast("long").as("distance"), F.col("df"))
        .orderBy("query_term", "rank")
    }),

    // query-likelihood ranking (Dirichlet mu=300): the LM-based
    // alternative to BM25, rank-equivalent decomposition over matched
    // postings with the exact corpus token total as the collection
    // model. Ranks pinned (top-16 gaps measured >= 8.5e-4 at both SFs,
    // no zero gaps); indexed_same pins the saved-index probe (exact
    // dlSum) equal to the one-shot row for row.
    "q_retrieval_ql" -> ((s: SparkSession, dir: String) => {
      val rt = graft.pipeline.Retrieval
      val d = t(s, dir, "documents")
      val q = Seq("slow", "merge", "window")
      val oneShot = rt.queryLikelihoodTopK(d, "doc_id", "text", q, 10)
      val probed = rt.queryLikelihoodTopKIndexed(
        rt.buildTextIndex(d, "doc_id", "text", 16), q, 10)
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .select("rank", "id", "score", "tf_total", "n_terms_hit")
        .collect().map(x => (x.getInt(0), x.getLong(1), x.getDouble(2),
          x.getLong(3), x.getLong(4))).sortBy(_._1).toSeq
      val (a, b) = (rows(oneShot), rows(probed))
      val same = a.size == b.size && a.zip(b).forall { case (x, y) =>
        x._1 == y._1 && x._2 == y._2 && math.abs(x._3 - y._3) < 1e-9 &&
        x._4 == y._4 && x._5 == y._5
      }
      oneShot.select(F.col("rank").cast("long").as("rank"),
          F.col("id").as("doc_id"), F.col("tf_total"),
          F.col("n_terms_hit"))
        .withColumn("indexed_same", F.lit(same))
        .orderBy("rank")
    }),

    // deep pagination (search_after): page 2 from page 1's cursor —
    // page_rank replays as global ranks 11-20 (top-21 adjacent gaps
    // measured >= 1.1e-5 at both SFs in the hybrid work, same query);
    // pages_exact pins page1 ∪ page2 ≡ top-20 row for row
    "q_retrieval_page" -> ((s: SparkSession, dir: String) => {
      val rt = graft.pipeline.Retrieval
      val idx = rt.buildTextIndex(t(s, dir, "documents"), "doc_id",
        "text", 16)
      val q = Seq("slow", "merge", "window")
      val page1 = rt.bm25TopKIndexed(idx, q, 10)
        .collect().sortBy(_.getInt(0))
      val cur = page1.last
      val page2 = rt.bm25TopKAfter(idx, q, 10,
        cur.getDouble(2), cur.getLong(1))
      val both = (page1.map(r => r.getLong(1)) ++
        page2.collect().sortBy(_.getInt(0)).map(_.getLong(1))).toSeq
      val top20 = rt.bm25TopKIndexed(idx, q, 20)
        .collect().sortBy(_.getInt(0)).map(_.getLong(1)).toSeq
      val pagesExact = both == top20
      page2.select(F.col("rank").cast("long").as("page_rank"),
          F.col("id").as("doc_id"), F.col("tf_total"),
          F.col("n_terms_hit"))
        .withColumn("pages_exact", F.lit(pagesExact))
        .orderBy("page_rank")
    }),

    // boolean-structured retrieval (should/must/must_not): scored on
    // should ∪ must, qualified by the must/mustNot clauses — full SQL
    // replay; filtered top-11 gaps >= 3.5e-4 nonzero at both SFs, the
    // one zero-gap pair is identical-profile (the q_retrieval_batch
    // rule)
    "q_retrieval_boolean" -> ((s: SparkSession, dir: String) => {
      val rt = graft.pipeline.Retrieval
      val idx = rt.buildTextIndex(t(s, dir, "documents"), "doc_id",
        "text", 16)
      rt.bm25TopKBoolean(idx, should = Seq("slow", "window"),
          must = Seq("merge"), mustNot = Seq("hash"), 10)
        .select(F.col("rank").cast("long").as("rank"),
          F.col("id").as("doc_id"), F.col("tf_total"),
          F.col("n_terms_hit"))
        .orderBy("rank")
    }),

    // phrase-filtered ranking ("quoted phrase" semantics): BM25 over
    // the query terms, candidates restricted to documents containing
    // the exact adjacent phrase — both the filter and the ranking
    // replay in SQL (gaps >= 1.0e-4 both SFs, no zeros; the phrase
    // match set is data-derived on both sides, so regeneration-proof)
    "q_retrieval_phrase_rank" -> ((s: SparkSession, dir: String) => {
      val rt = graft.pipeline.Retrieval
      val idx = rt.buildTextIndex(t(s, dir, "documents"), "doc_id",
        "text", 16)
      rt.bm25TopKPhraseFiltered(idx, Seq("slow", "merge", "window"),
          phrase = Seq("slow", "merge"), 10)
        .select(F.col("rank").cast("long").as("rank"),
          F.col("id").as("doc_id"), F.col("tf_total"),
          F.col("n_terms_hit"))
        .orderBy("rank")
    }),

    // search facet panel: per-facet-value counts over the MATCHED set
    // (both source and lang panels in one output) — exact integers,
    // full SQL replay
    "q_retrieval_facets" -> ((s: SparkSession, dir: String) => {
      val d = t(s, dir, "documents")
      val idx = graft.pipeline.Retrieval.buildTextIndex(
        d, "doc_id", "text", buckets = 32)
      val q = Seq("slow", "merge", "window")
      def panel(col: String) = graft.pipeline.Retrieval
        .facetCounts(idx, q, d, "doc_id", col, 30)
        .select(F.lit(col).as("facet"), F.col(col).as("value"),
          F.col("n_docs"))
      panel("source").unionByName(panel("lang"))
        .orderBy("facet", "value")
    }),

    // did-you-mean composition: spell-correct two typo'd terms against
    // the term dictionary (top suggestion each), then retrieve with
    // the corrected query — BOTH stages replay in SQL (the correction
    // is all-integer argmin; corrected-query top-11 gaps measured
    // >= 1.0e-4 at both SFs, no zero gaps)
    "q_retrieval_didyoumean" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val d = t(s, dir, "documents")
      val idx = graft.pipeline.Retrieval.buildIndex(d, "doc_id", "text")
      val sidx = graft.pipeline.Spelling.buildSpellIndex(
        graft.pipeline.Spelling.termDictionary(idx), 2)
      val corrected = graft.pipeline.Spelling.suggestBatch(sidx,
          Seq("mergi", "windoq"), 2, 1)
        .select("term").as[String].collect().toSeq.distinct.sorted
      graft.pipeline.Retrieval.bm25TopK(d, "doc_id", "text", corrected, 10)
        .select(F.col("rank").cast("long").as("rank"),
          F.col("id").as("doc_id"), F.col("tf_total"),
          F.col("n_terms_hit"))
        .withColumn("corrected", F.lit(corrected.mkString(" ")))
        .orderBy("rank")
    }),

    // two-stage dense serving (the ColBERT pattern): a single-vector
    // first stage (the query's lead vector, cosine top-30) bounds the
    // candidate pool; MaxSim late interaction reranks the pool. Both
    // stages replay in SQL over exact float32 inputs — first-stage
    // boundary gap >= 2.8e-5, rerank gaps >= 7.3e-4 at both SFs;
    // planted identity (the query IS group 0) pins rank 1.
    "q_pipeline_colbert" -> ((s: SparkSession, dir: String) => {
      val emb = t(s, dir, "embeddings")
      val dv = emb.select(
        F.floor(F.col("vec_id") / 4).cast("long").as("doc_id"),
        F.col("vec_id"), F.col("embedding"))
      val firstStage = graft.pipeline.Similarity.bruteForceTopK(
          emb, emb.filter(F.col("vec_id") === 0), "vec_id", "embedding", 30)
        .select(F.floor(F.col("neighbor_id") / 4).cast("long").as("doc_id"))
        .distinct()
      val cand = firstStage
        .unionByName(s.range(0, 1).select(F.col("id").as("doc_id")))
        .distinct()
        .select(F.lit(0L).as("query_id"), F.col("doc_id"))
      val nCand = cand.count()
      val qv = emb.filter(F.col("vec_id") < 4)
        .select(F.lit(0L).as("query_id"), F.col("vec_id"),
          F.col("embedding"))
      graft.pipeline.Similarity.maxSimRerank(cand, qv, dv, 10)
        .select(F.col("rank").cast("long").as("rank"), F.col("doc_id"))
        .withColumn("n_cand", F.lit(nCand))
        .orderBy("rank")
    }),

    // Porter-stemmed retrieval: every doc carries ONE planted
    // morphological variant (zzmerge/zzmerges/zzmerged/zzmerging by
    // doc_id % 4 — the zz prefix is absent from the 31-token natural
    // vocabulary, the q_keyword_scan planting rule), so the stemmed
    // query "zzmerging" matches EVERY document iff the analyzer folds
    // all four forms to one stem on both the index and query sides.
    // With df = N and tf = 1 everywhere, each score is a SINGLE
    // product monotone decreasing in dl -> rank replays in SQL as
    // (dl ASC, doc_id ASC) with bit-exact tie semantics (no float
    // sums at all).
    "q_retrieval_stemmed" -> ((s: SparkSession, dir: String) => {
      val d = t(s, dir, "documents").withColumn("text2",
        F.concat(F.col("text"), F.element_at(
          F.array(F.lit(" zzmerge"), F.lit(" zzmerges"),
            F.lit(" zzmerged"), F.lit(" zzmerging")),
          (F.col("doc_id") % 4 + 1).cast("int"))))
      val all = graft.pipeline.Retrieval.bm25TopKStemmed(
        d, "doc_id", "text2", Seq("zzmerging"), 2000000)
      val nMatched = all.count()
      val oneShot = graft.pipeline.Retrieval.bm25TopKStemmed(
        d, "doc_id", "text2", Seq("zzmerging"), 15)
      // the paired saved-index form ranks identically (same analyzer
      // on both sides by construction)
      val probed = graft.pipeline.Retrieval.bm25TopKIndexedStemmed(
        graft.pipeline.Retrieval.buildStemmedTextIndex(
          d, "doc_id", "text2", 16),
        Seq("zzmerging"), 15)
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .select("rank", "id", "tf_total", "n_terms_hit")
        .collect().map(x => (x.getInt(0), x.getLong(1), x.getLong(2),
          x.getLong(3))).sortBy(_._1).toSeq
      val indexedSame = rows(oneShot) == rows(probed)
      oneShot
        .select(F.col("rank").cast("long").as("rank"),
          F.col("id").as("doc_id"), F.col("tf_total"),
          F.col("n_terms_hit"))
        .withColumn("n_matched", F.lit(nMatched))
        .withColumn("indexed_same", F.lit(indexedSame))
        .orderBy("rank")
    }),

    // score-normalized hybrid fusion (CombSUM over min-max-normalized
    // lists, 0.6 lexical / 0.4 semantic): both input lists and the
    // fused ranking replay in SQL. Measured adjacent gaps at both SFs:
    // lexical top-21 >= 1.1e-5, cosine top-21 >= 7.7e-6, fused top-11
    // >= 4.2e-4 — rank pins safe (the q_bm25 / q_rank_metrics rule);
    // the fused sum has exactly 2 addends (commutative, order-proof).
    "q_retrieval_hybrid" -> ((s: SparkSession, dir: String) => {
      val d = t(s, dir, "documents")
      val lex = graft.pipeline.Retrieval.bm25TopK(
          d, "doc_id", "text", Seq("slow", "merge", "window"), 20)
        .select(F.col("id"), F.col("score"))
      val emb = t(s, dir, "embeddings")
      val sem = graft.pipeline.Similarity.bruteForceTopK(
          emb, emb.filter(F.col("vec_id") === 0), "vec_id", "embedding", 20)
        .select(F.col("neighbor_id").as("id"), F.col("cos").as("score"))
      graft.pipeline.Retrieval.fuseScoresMinMax(
          Seq(lex -> 0.6, sem -> 0.4), 10)
        .select(F.col("rank").cast("long").as("rank"),
          F.col("id").as("doc_id"), F.col("n_lists"))
        .orderBy("rank")
    }),

    // team-draft interleaving of two disjoint rankers (odd-id vs
    // even-id BM25 for the same query): the md5 per-round coin and the
    // alternating draft replay exactly in SQL (disjoint lists never
    // trigger the stateful skip — that path is spec-pinned). Parity
    // list gaps measured >= 5.0e-5 at both SFs through rank 11.
    "q_eval_interleave" -> ((s: SparkSession, dir: String) => {
      val d = t(s, dir, "documents")
      val q = Seq("slow", "merge", "window")
      def side(parity: Int) = graft.pipeline.Retrieval.bm25TopKFiltered(
          d, "doc_id", "text", q, 10,
          d.filter(F.col("doc_id") % 2 === parity).select("doc_id"))
        .select(F.col("rank"), F.col("id"))
      graft.pipeline.Eval.teamDraftInterleave(side(1), side(0), 20, "il7")
        .select(F.col("pos").cast("long").as("pos"),
          F.col("id").as("doc_id"), F.col("team"))
        .orderBy("pos")
    }),

    // ColBERT-style MaxSim late-interaction rerank: documents are
    // 4-vector groups (gid = vec_id / 4), the query IS group 0's
    // vector set — every per-vector max is exactly 1.0 against group 0
    // (planted-identity contract, score 4.0) and the oracle replays
    // the full max/sum interaction in SQL. Measured top-11 adjacent
    // gaps >= 1.1e-4 at both SFs.
    "q_retrieval_maxsim" -> ((s: SparkSession, dir: String) => {
      val emb = t(s, dir, "embeddings")
      val dv = emb.select(
        F.floor(F.col("vec_id") / 4).cast("long").as("doc_id"),
        F.col("vec_id"), F.col("embedding"))
      val qv = emb.filter(F.col("vec_id") < 4)
        .select(F.lit(0L).as("query_id"), F.col("vec_id"),
          F.col("embedding"))
      val cand = dv.select("doc_id").distinct()
        .select(F.lit(0L).as("query_id"), F.col("doc_id"))
      val top = graft.pipeline.Similarity.maxSimRerank(cand, qv, dv, 10)
      val selfExact = top.filter(F.col("rank") === 1)
        .select(F.col("doc_id"),
          (F.abs(F.col("score") - 4.0) < 1e-9).as("ok"))
        .collect().headOption.exists(r => r.getLong(0) == 0L && r.getBoolean(1))
      top.select(F.col("rank").cast("long").as("rank"), F.col("doc_id"))
        .withColumn("self_exact", F.lit(selfExact))
        .orderBy("rank")
    }),

    // streaming RAG serving: the 3-query fixture replayed one file per
    // micro-batch (AvailableNow) against a SAVED index, answers landed
    // under per-batch partitions with dynamic overwrite — then a
    // crash-replay (newest commit marker dropped, restart) pins
    // effectively-once. Batches are stateless and the index frozen, so
    // the streamed union shares q_pipeline_rag_batch's oracle
    // (stream_same additionally pins equality with the one-shot batch
    // composition, computed in Spark).
    "q_stream_rag" -> ((s: SparkSession, dir: String) => {
      val rt = graft.pipeline.Retrieval
      val d = t(s, dir, "documents")
      val base = System.getProperty("java.io.tmpdir") + "/graft_q_stream_rag"
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      rt.buildTextIndex(d, "doc_id", "text", buckets = 32).save(s"$base/idx")
      val qTerms = Seq(
        0L -> Seq("slow", "merge", "window"),
        1L -> Seq("hash", "batch", "scan"),
        2L -> Seq("filter", "row", "group"))
      qTerms.zipWithIndex.foreach { case (row, i) =>
        s.createDataFrame(Seq(row)).toDF("query_id", "terms")
          .repartition(1).write.mode("overwrite").parquet(s"$base/q/q$i")
      }
      def runStream(): Unit =
        rt.ragStream(
            s.readStream.schema("query_id LONG, terms ARRAY<STRING>")
              .option("maxFilesPerTrigger", 1).parquet(s"$base/q/*"),
            s"$base/idx", d, "doc_id", "text",
            k = 10, window = 12, budgetTokens = 60, outPath = s"$base/out")
          .option("checkpointLocation", s"$base/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start().awaitTermination()
      runStream()
      val commits = new org.apache.hadoop.fs.Path(s"$base/ckpt/commits")
      val newest = fs.listStatus(commits).map(_.getPath)
        .filter(p => p.getName.forall(_.isDigit))
        .maxBy(_.getName.toLong)
      fs.delete(newest, false)
      runStream()
      val streamed = s.read.parquet(s"$base/out")
      val idx = rt.loadTextIndex(s, s"$base/idx")
      val qdf = s.createDataFrame(qTerms).toDF("query_id", "terms")
      val ranked = rt.bm25TopKBatch(idx, qdf, 10)
        .select(F.col("query_id"), F.col("rank"), F.col("id"))
        .localCheckpoint(false)
      val batch = rt.assembleContextBatch(d, "doc_id", "text", ranked,
        qdf, window = 12, budgetTokens = 60)
      def norm(df: org.apache.spark.sql.DataFrame) = df
        .select("query_id", "rank", "id", "start", "end", "n_tokens",
          "cum_tokens", "snippet")
        .collect().map(x => (x.getAs[Long]("query_id"),
          x.getAs[Int]("rank"), x.getAs[Long]("id"),
          x.getAs[Number]("start").longValue(),
          x.getAs[Number]("end").longValue(),
          x.getAs[Number]("n_tokens").longValue(),
          x.getAs[Number]("cum_tokens").longValue(),
          x.getAs[String]("snippet"))).sortBy(y => (y._1, y._2)).toSeq
      val same = norm(streamed) == norm(batch)
      streamed.select(F.col("query_id"),
          F.col("rank").cast("long").as("rank"),
          F.col("id").as("doc_id"),
          F.col("start").cast("long").as("start"),
          F.col("end").cast("long").as("end"),
          F.col("n_tokens").cast("long").as("n_tokens"),
          F.col("cum_tokens").cast("long").as("cum_tokens"),
          F.col("snippet"))
        .withColumn("stream_same", F.lit(same))
        .orderBy("query_id", "rank")
    }),

    // exact phrase search from the positional index: overlap-counting
    // occurrence semantics; coalesced so a zero-hit SF still yields the
    // (0,0,0) row
    "q_phrase" -> ((s: SparkSession, dir: String) => {
      val idx = graft.pipeline.Retrieval
        .buildIndex(t(s, dir, "documents"), "doc_id", "text")
      graft.pipeline.Retrieval.phraseCount(idx, Seq("slow", "hash", "batch"))
        .agg(
          F.count(F.lit(1)).as("n_docs"),
          F.coalesce(F.sum(F.col("n_occurrences")), F.lit(0L)).as("n_occ"),
          F.coalesce(F.sum(F.col("id")), F.lit(0L)).as("id_sum"))
    }),

    // hybrid retrieval: reciprocal-rank fusion of the BM25 top-20 and
    // the embedding-cosine top-20 for query vector 0 (doc_id ≡ vec_id
    // in the testdata); fused score = Σ 1/(60+rank) — 2-element sums
    // are order-invariant in IEEE doubles, so ranks replay exactly
    "q_retrieval_rrf" -> ((s: SparkSession, dir: String) => {
      val lex = graft.pipeline.Retrieval.bm25TopK(
          t(s, dir, "documents"), "doc_id", "text",
          Seq("slow", "merge", "window"), 20)
        .select(F.col("id"), F.col("rank"))
      val emb = t(s, dir, "embeddings")
      val sem = graft.pipeline.Similarity.bruteForceTopK(
          emb, emb.filter(F.col("vec_id") === 0), "vec_id", "embedding", 20)
        .select(F.col("neighbor_id").as("id"), F.col("rank"))
      graft.pipeline.Retrieval.rrfFuse(Seq(lex, sem), k = 10)
        .select(F.col("rank").cast("long").as("rank"),
          F.col("id").as("doc_id"), F.col("n_lists"))
        .orderBy("rank")
    }),

    // snapshot "latest version wins": one row per customer (newest
    // order by date, then key) via the map-side-combinable max_by
    // aggregate; sums stay integral (epoch-millis, price cents)
    "q_snapshot_latest" -> ((s: SparkSession, dir: String) => {
      graft.pipeline.Snapshot.latestByKey(t(s, dir, "orders"),
          F.col("o_custkey"), F.col("o_orderdate"), F.col("o_orderkey"))
        .agg(F.count(F.lit(1)).as("n"),
          F.sum(F.col("o_orderkey")).as("key_sum"),
          F.sum(F.unix_millis(F.col("o_orderdate").cast("timestamp")))
            .as("ts_sum"),
          F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .as("cents"))
    }),

    // CDC upsert: a delta (every 5th order, price doubled, version
    // bumped 1000 days) merged into the base snapshot — newer version
    // wins per order key; the oracle states the expected OUTPUT
    // directly (base minus delta keys, plus delta)
    "q_snapshot_merge" -> ((s: SparkSession, dir: String) => {
      val base = t(s, dir, "orders")
      val delta = base.filter(F.col("o_orderkey") % 5 === 0)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        .withColumn("o_orderdate",
          F.col("o_orderdate") + F.expr("INTERVAL 1000 DAYS"))
      graft.pipeline.Snapshot.mergeSnapshot(base, delta,
          F.col("o_orderkey"), F.col("o_orderdate"), F.col("o_orderkey"))
        .agg(F.count(F.lit(1)).as("n"),
          F.sum(F.col("o_orderkey")).as("key_sum"),
          F.sum(F.unix_millis(F.col("o_orderdate").cast("timestamp")))
            .as("ts_sum"),
          F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
            .as("cents"))
    }),

    // crawl-over-crawl delta: two synthetic snapshots from documents
    // (old = ids not divisible by 3; new = ids not divisible by 5,
    // with every 7th text mutated) — the full outer join + status
    // case replays exactly in SQL, a full-row oracle
    "q_snapshot_diff" -> ((s: SparkSession, dir: String) => {
      val docs = t(s, dir, "documents").filter(F.col("text").isNotNull)
      val old = docs.filter(F.col("doc_id") % 3 =!= 0)
        .select(F.col("doc_id"), F.col("text"))
      val nw = docs.filter(F.col("doc_id") % 5 =!= 0)
        .select(F.col("doc_id"),
          F.when(F.col("doc_id") % 7 === 0, F.concat(F.col("text"), F.lit(" v2")))
            .otherwise(F.col("text")).as("text"))
      graft.pipeline.Snapshot.diffSnapshots(old, nw, "doc_id", Seq("text"))
        .orderBy("doc_id")
    }),

    // deterministic training-order shuffle: first 20 documents of the
    // seed-42 permutation — md5 order replays identically in any
    // engine; orderBy+limit compiles to TakeOrdered (no global sort)
    "q_shuffle_order" -> ((s: SparkSession, dir: String) => {
      graft.pipeline.Sampling
        .deterministicShuffle(t(s, dir, "documents"), F.col("doc_id"), 42L)
        .limit(20)
        .select(F.col("doc_id"),
          graft.pipeline.Sampling.shuffleKey(F.col("doc_id"), 42L).as("h"))
    }),

    // exact tie-aware ROC AUC on a planted score/label: label every
    // 3rd doc, score = 6-decimal LCG noise + 0.4 lift for positives —
    // rank arithmetic is BIGINT to the final division, so the double
    // matches bit-for-bit cross-engine
    "q_eval_auc" -> ((s: SparkSession, dir: String) => {
      val id = F.col("doc_id")
      val scored = t(s, dir, "documents").select(
        (((id * 1103515245L + 12345L) % 1000000L).cast("double") / 1000000.0 +
          F.when(id % 3 === 0, 0.4).otherwise(0.0)).as("s"),
        (id % 3 === 0).as("y"))
      graft.pipeline.Eval.binaryAuc(scored, F.col("s"), F.col("y"))
    }),

    // operating-point metrics at threshold 0.7 on the same planted
    // scores: integer confusion counts, exact-ratio precision/recall/f1
    "q_eval_confusion" -> ((s: SparkSession, dir: String) => {
      val id = F.col("doc_id")
      val scored = t(s, dir, "documents").select(
        (((id * 1103515245L + 12345L) % 1000000L).cast("double") / 1000000.0 +
          F.when(id % 3 === 0, 0.4).otherwise(0.0)).as("s"),
        (id % 3 === 0).as("y"))
      graft.pipeline.Eval.confusionAt(scored, F.col("s"), F.col("y"), 0.7)
    }),

    // calibration table: 10 equal-width bins over the same scores;
    // per-bin mean is an integral micro-units sum divided once
    "q_eval_calibration" -> ((s: SparkSession, dir: String) => {
      val id = F.col("doc_id")
      val scored = t(s, dir, "documents").select(
        (((id * 1103515245L + 12345L) % 1000000L).cast("double") / 1000000.0 +
          F.when(id % 3 === 0, 0.4).otherwise(0.0)).as("s"),
        (id % 3 === 0).as("y"))
      graft.pipeline.Eval.calibrationBins(scored, F.col("s"), F.col("y"), 10)
        .orderBy("bin")
    }),

    // embedding normalization + matryoshka truncation: unit-norm and
    // prefix-renormalization invariants as in-Spark booleans (float
    // math never hash-matches an oracle; the exact side is the same
    // Spark arithmetic, the oracle pins true)
    "q_embed_normalize" -> ((s: SparkSession, dir: String) => {
      val emb = t(s, dir, "embeddings")
      val e = graft.pipeline.Embeddings
      val norm2 = (v: org.apache.spark.sql.Column) => F.aggregate(
        v, F.lit(0.0), (acc, x) => acc + x * x)
      emb.select(
          norm2(e.l2Normalize(F.col("embedding"))).as("n2"),
          norm2(e.truncateNormalize(F.col("embedding"), 32)).as("t2"),
          F.size(e.truncateNormalize(F.col("embedding"), 32)).as("tlen"))
        .agg(
          F.count(F.lit(1)).as("n"),
          F.min(F.abs(F.col("n2") - 1.0) < 1e-9).as("all_unit"),
          F.min(F.abs(F.col("t2") - 1.0) < 1e-9).as("trunc_unit"),
          F.min(F.col("tlen") === 32).as("trunc_len_ok"))
    }),

    // int8 storage quantization: per-element reconstruction error is
    // bounded by scale/2 and the code range by construction; cosine
    // of (dequantized, original) stays >= 0.999 on every vector
    "q_embed_int8" -> ((s: SparkSession, dir: String) => {
      val e = graft.pipeline.Embeddings
      val emb = t(s, dir, "embeddings")
        .select(F.col("vec_id"), F.col("embedding"),
          e.quantizeInt8(F.col("embedding")).as("q"))
      val deq = e.dequantInt8(F.col("q"))
      val dot = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
        F.aggregate(F.zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
          F.lit(0.0), (acc, x) => acc + x)
      emb.select(
          F.col("q.scale").as("scale"),
          F.aggregate(F.zip_with(deq, F.col("embedding"),
              (d, o) => F.abs(d - o.cast("double"))),
            F.lit(0.0), (acc, x) => F.greatest(acc, x)).as("max_err"),
          F.aggregate(F.col("q.codes"), F.lit(0),
            (acc, c) => F.greatest(acc, F.abs(c.cast("int")))).as("max_code"),
          (dot(deq, F.col("embedding")) /
            (F.sqrt(dot(deq, deq)) * F.sqrt(dot(F.col("embedding"),
              F.col("embedding"))))).as("cos"))
        .agg(
          F.count(F.lit(1)).as("n"),
          F.min(F.col("max_err") <= F.col("scale") / 2 + 1e-12).as("err_bounded"),
          F.min(F.col("max_code") <= 127).as("codes_in_range"),
          F.min(F.col("cos") >= 0.999).as("cos_ok"))
    }),

    // one-pass distributed PCA (d²-wide vec_sum aggregate + driver
    // Jacobi): basis orthonormality and the spectrum checked driver-
    // side; the projected per-component variance re-measured
    // DISTRIBUTED and pinned against the eigenvalues
    "q_embed_pca" -> ((s: SparkSession, dir: String) => {
      val e = graft.pipeline.Embeddings
      val emb = t(s, dir, "embeddings")
      val model = e.fitPca(emb, F.col("embedding"), 8)
      val orthonormal = (for {
        i <- 0 until model.k; j <- i until model.k
      } yield {
        val d = model.components(i).zip(model.components(j))
          .map(t => t._1 * t._2).sum
        math.abs(d - (if (i == j) 1.0 else 0.0)) < 1e-8
      }).forall(identity)
      val evalsDesc = model.eigenvalues.toSeq ==
        model.eigenvalues.sorted(Ordering[Double].reverse).toSeq
      val evLit = F.typedlit(model.eigenvalues.toSeq)
      val proj = emb.select(e.pcaProject(F.col("embedding"), model).as("p"))
      proj
        .select(F.posexplode(F.col("p")).as(Seq("j", "x")))
        .groupBy(F.col("j"))
        .agg(F.count(F.lit(1)).as("nj"), F.sum(F.col("x")).as("sx"),
          F.sum(F.col("x") * F.col("x")).as("sxx"))
        .select(F.col("j"),
          ((F.col("sxx") / F.col("nj")) -
            (F.col("sx") / F.col("nj")) * (F.col("sx") / F.col("nj")))
            .as("vj"),
          F.element_at(evLit, F.col("j") + 1).as("ev"))
        .agg(
          F.count(F.lit(1)).cast("int").as("n_components"),
          F.min(F.abs(F.col("vj") - F.col("ev")) <=
            F.lit(1e-6) * F.greatest(F.col("ev"), F.lit(1.0))).as("var_matches"),
          F.lit(model.dim).cast("int").as("dim"),
          F.lit(orthonormal).as("orthonormal"),
          F.lit(evalsDesc).as("evals_desc"))
    }),

    // Arrow IPC egress + re-ingest: corpus rows (with a token list and
    // a float score) ride Feather v2 shards through a tmp dir and
    // back; doubles/floats round-trip EXACTLY in arrow (unlike the
    // Example proto's f32 squeeze), pinned by an equality boolean
    "q_arrow" -> ((s: SparkSession, dir: String) => {
      val base = System.getProperty("java.io.tmpdir") + "/graft_q_arrow"
      val docs = t(s, dir, "documents").select(
        F.col("doc_id"), F.col("lang"), F.col("text"),
        ((F.col("doc_id") % 97).cast("double") / 7.0).as("score"),
        F.split(F.col("text"), "\\s+").as("toks"))
      graft.sources.ArrowIpc.write(docs.repartition(4), base)
      val schema = new org.apache.spark.sql.types.StructType()
        .add("doc_id", org.apache.spark.sql.types.LongType)
        .add("lang", org.apache.spark.sql.types.StringType)
        .add("text", org.apache.spark.sql.types.StringType)
        .add("score", org.apache.spark.sql.types.DoubleType)
        .add("toks", org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType))
      val orig = docs.select(F.col("doc_id").as("o_id"),
        F.col("score").as("o_score"))
      graft.sources.ArrowIpc.read(s, base, schema)
        .join(orig, F.col("doc_id") === F.col("o_id"))
        .agg(F.count(F.lit(1)).as("n_rows"),
          F.sum(F.col("doc_id")).as("id_sum"),
          F.sum(F.length(F.col("text"))).as("chars"),
          F.count_distinct(F.col("lang")).as("langs"),
          F.sum(F.size(F.col("toks"))).as("tok_n"),
          F.min(F.col("score") === F.col("o_score")).as("score_exact"))
    }),

    // PromQL-style counter rollup: per-user hourly increase with reset
    // detection (value < previous => the whole new value is growth),
    // summarized per bucket; the (user_id, ms) pre-aggregation makes
    // the within-key order unique so both engines see the same series.
    // NULL series values are filtered on BOTH sides: counterIncrease
    // skips NULL baselines (last ignoreNulls) where the oracle's
    // lag(v) would not, so the oracle only covers the operator on
    // non-NULL series — make that explicit rather than silent
    "q_ts_rate" -> ((s: SparkSession, dir: String) => {
      val ser = t(s, dir, "events")
        .groupBy(F.col("user_id"), F.unix_millis(F.col("ts")).as("ms"))
        .agg(F.max(F.col("value")).as("v"))
        .filter(F.col("v").isNotNull)
      graft.operators.TimeSeries
        .counterRate(ser, Seq("user_id"), "ms", "v", bucketMillis = 3600000L)
        .groupBy(F.col("bucket_ms"))
        .agg(F.count(F.lit(1)).as("series"),
          F.sum(F.col("samples")).as("samples"),
          F.round(F.sum(F.col("increase")) * 100, 0).cast("long").as("cents"))
        .orderBy("bucket_ms")
    }),

    // gap-fill: per-user hourly series regularized onto the hour grid
    // with linear interpolation; interpolation is pure IEEE add/sub/
    // mul/div so per-cell values are bit-identical cross-engine.
    // repartition-by-key before the bucket agg = gapFill's one-exchange
    // partitioning contract (pinned in TimeSeriesSpec); result-neutral
    "q_ts_gapfill" -> ((s: SparkSession, dir: String) => {
      val ms = F.unix_millis(F.col("ts"))
      val hr = t(s, dir, "events")
        .repartition(F.col("user_id"))
        .groupBy(F.col("user_id"), (ms - F.pmod(ms, F.lit(3600000L))).as("ms"))
        .agg(F.max(F.col("value")).as("v"))
      graft.operators.TimeSeries
        .gapFill(hr, Seq("user_id"), "ms", "v", stepMillis = 3600000L)
        .groupBy(F.col("was_observed"))
        .agg(F.count(F.lit(1)).as("cnt"),
          F.round(F.sum(F.col("filled")) * 100, 0).cast("long").as("cents"))
        .orderBy("was_observed")
    }),

    // bounded-window exponential smoothing: each user's last EWMA value
    // (pandas ewm adjust=True over the trailing 16 samples)
    "q_ts_ewma" -> ((s: SparkSession, dir: String) => {
      import org.apache.spark.sql.expressions.Window
      val ser = t(s, dir, "events")
        .groupBy(F.col("user_id"), F.unix_millis(F.col("ts")).as("ms"))
        .agg(F.max(F.col("value")).as("v"))
      val ew = graft.operators.TimeSeries
        .ewma(ser, Seq("user_id"), "ms", "v", alpha = 0.25, window = 16)
      val w = Window.partitionBy(F.col("user_id")).orderBy(F.col("ms").desc)
      ew.withColumn("__rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy(F.col("user_id"))))
        .filter(F.col("__rn") === 1)
        .select(F.col("user_id"), F.col("n"),
          F.round(F.col("ewma"), 4).as("ewma_last"))
        .orderBy("user_id")
    }),

    // retrieval evaluation: exact brute-force cosine top-10 for 32
    // query vectors, relevance = same embedding label; per-query
    // hits/precision/recall/RR are exact integer divisions, nDCG is
    // the repo's 4-decimal cross-engine float form. Top-12 adjacent
    // cosine gaps measured >= 1.9e-5 at sf0.01 (>= 5.5e-6 at sf0.001)
    // before trusting exact rank stability, per the BM25 rule.
    "q_rank_metrics" -> ((s: SparkSession, dir: String) => {
      val emb = t(s, dir, "embeddings")
      val lab = emb.select(F.col("vec_id"), F.col("label"))
      val ranked = graft.pipeline.Similarity.bruteForceTopK(
          emb, emb.filter(F.col("vec_id") < 32), "vec_id", "embedding", 10)
        .join(lab.select(F.col("vec_id").as("query_id"), F.col("label").as("__ql")),
          "query_id")
        .join(lab.select(F.col("vec_id").as("neighbor_id"), F.col("label").as("__nl")),
          "neighbor_id")
        .withColumn("rel", F.col("__ql") === F.col("__nl"))
      val totals = emb.filter(F.col("vec_id") < 32)
        .select(F.col("vec_id").as("query_id"), F.col("label"))
        .join(F.broadcast(emb.groupBy(F.col("label")).count()), "label")
        .select(F.col("query_id"), (F.col("count") - 1).as("n_rel"))
      graft.pipeline.Eval
        .rankingMetrics(ranked, "query_id", "rank", "rel", totals, "n_rel", 10)
        .select(F.col("query_id"), F.col("n_rel"), F.col("hits"),
          F.col("first_rank"), F.col("precision_at_k"), F.col("recall_at_k"),
          F.col("reciprocal_rank"), F.round(F.col("dcg"), 4).as("dcg4"),
          F.col("ndcg"))
        .orderBy("query_id")
    }),

    // SFT chat-data preparation: documents chunked into 3-token
    // alternating user/assistant turns, validated, rendered through
    // the canonical template, with assistant loss-mask spans. The
    // oracle replays the exact character arithmetic (span positions
    // included via span_sum), so a stubbed render or fold fails it.
    "q_sft" -> ((s: SparkSession, dir: String) => {
      // fused JVM kernel (sftTextProfile); SftSpec pins it
      // field-for-field equal to the composable validate/render/mask
      // expression chain, and this oracle covers it cross-engine
      t(s, dir, "documents")
        .select(F.col("doc_id"),
          graft.pipeline.Sft.sftTextProfile(F.col("text"), 3).as("p"))
        .select(F.col("doc_id"),
          F.col("p.n_turns").cast("long").as("n_turns"),
          F.col("p.valid").as("valid"),
          F.col("p.rendered_chars").as("rendered_chars"),
          F.col("p.masked_chars").as("masked_chars"),
          F.col("p.n_spans").cast("long").as("n_spans"),
          F.col("p.span_sum").as("span_sum"))
        .orderBy("doc_id")
    }),

    // semi-structured payload parsing: events.props is a JSON string;
    // from_json with an explicit schema (never inference at scale),
    // malformed input → NULL per the repo-wide NULL discipline
    "q_json_props" -> ((s: SparkSession, dir: String) => {
      val parsed = t(s, dir, "events")
        .select(F.col("event_type"),
          F.from_json(F.col("props"),
            org.apache.spark.sql.types.StructType.fromDDL("k LONG"))
            .getField("k").as("k"))
      parsed.groupBy(F.col("event_type"))
        .agg(F.count(F.lit(1)).as("n"),
          F.count(F.col("k")).as("parsed"),
          F.sum(F.col("k")).as("k_sum"),
          F.min(F.col("k")).as("k_min"),
          F.max(F.col("k")).as("k_max"))
        .orderBy("event_type")
    }),

    // curriculum ordering: difficulty-sorted (n_chars) but strata-
    // interleaved emission order — ord = rank_within_source * S + s_idx
    "q_curriculum" -> ((s: SparkSession, dir: String) => {
      graft.pipeline.Curriculum.interleaveStrata(
          t(s, dir, "documents"), "source", "n_chars", "doc_id")
        .select(F.col("doc_id"), F.col("source"), F.col("ord"))
        .orderBy("doc_id")
    }),

    // more-like-this: the source doc's 4 most distinctive terms by the
    // ALL-INTEGER (df asc, tf desc, term asc) ranking become a BM25
    // query excluding the source — term selection replays exactly in
    // SQL; result ranks pinned by the q_bm25 rule (gaps measured at
    // both SFs before trusting)
    "q_retrieval_mlt" -> ((s: SparkSession, dir: String) => {
      val d = t(s, dir, "documents")
      val srcText = d.filter(F.col("doc_id") === 5L)
        .select("text").head.getString(0)
      val idx = graft.pipeline.Retrieval.buildTextIndex(
        d, "doc_id", "text", buckets = 32)
      graft.pipeline.Serving.moreLikeThisTopK(idx, 5L, srcText,
          mTerms = 4, k = 10)
        .select(F.col("rank").cast("long").as("rank"),
          F.col("id").as("doc_id"), F.col("tf_total"),
          F.col("n_terms_hit"), F.col("query"))
        .orderBy("rank")
    }),

    // prefix completion: (df desc, term asc) top-k per prefix — all
    // integer, full SQL replay; persisted probe == from-index pinned
    // as a boolean
    "q_retrieval_complete" -> ((s: SparkSession, dir: String) => {
      val d = t(s, dir, "documents")
      val idx = graft.pipeline.Retrieval.buildTextIndex(
        d, "doc_id", "text", buckets = 32)
      val tmp = System.getProperty("java.io.tmpdir") + "/graft_q_complete"
      val fs = new org.apache.hadoop.fs.Path(tmp)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      idx.save(s"$tmp/idx")
      graft.pipeline.Serving.saveCompletionIndex(s, s"$tmp/idx", s"$tmp/cmp")
      def leg(p: String) = {
        val persisted = graft.pipeline.Serving.completeTopK(s, s"$tmp/cmp", p, 8)
        val adhoc = graft.pipeline.Serving.completionsFromIndex(idx, p, 8)
        val same = persisted.collect().map(_.toSeq).toSeq ==
          adhoc.collect().map(_.toSeq).toSeq
        persisted.withColumn("prefix", F.lit(p))
          .withColumn("persisted_same", F.lit(same))
      }
      leg("s").unionByName(leg("me"))
        .select(F.col("prefix"), F.col("rank").cast("long").as("rank"),
          F.col("term"), F.col("df"), F.col("persisted_same"))
        .orderBy("prefix", "rank")
    }),

    // field collapsing: best-ranked doc per `source` group from a
    // 40-deep BM25 pool, groups re-ranked by representative rank —
    // the collapse is all-integer over the pinned pool ranking
    // (documents.source is null-free at both SFs)
    "q_retrieval_collapse" -> ((s: SparkSession, dir: String) => {
      val d = t(s, dir, "documents")
      val pool = graft.pipeline.Retrieval.bm25TopK(
        d, "doc_id", "text", Seq("slow", "merge", "window"), 40)
      graft.pipeline.Serving.collapseTopK(
          pool, d.select(F.col("doc_id").as("id"), F.col("source")),
          "id", "source", 8)
        .select(F.col("collapsed_rank").cast("long").as("collapsed_rank"),
          F.col("group").as("grp"), F.col("rank").cast("long").as("pool_rank"),
          F.col("id").as("doc_id"))
        .orderBy("collapsed_rank")
    }),

    // federated sharded search: 3 independent shard indexes merged
    // with EXACT global statistics (summed long stats deltas, dfs
    // from the union of per-shard matches) — equals the monolithic
    // probe, so the oracle is q_bm25's verbatim
    "q_retrieval_sharded" -> ((s: SparkSession, dir: String) => {
      val d = t(s, dir, "documents")
      val tmp = System.getProperty("java.io.tmpdir") + "/graft_q_sharded"
      val fs = new org.apache.hadoop.fs.Path(tmp)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      graft.pipeline.Serving.saveShardedTextIndex(
        d, "doc_id", "text", tmp, shards = 3, buckets = 32)
      graft.pipeline.Serving.bm25TopKSharded(
          s, tmp, Seq("slow", "merge", "window"), 10)
        .select(F.col("rank").cast("long").as("rank"),
          F.col("id").as("doc_id"), F.col("tf_total"), F.col("n_terms_hit"))
        .orderBy("rank")
    }),

    // Matryoshka dim-prefix retrieval: coarse over the first d' dims,
    // exact full-dim rerank — q_ann_binary's exactness contracts
    // (pool-exhaustive == brute force row for row; persisted prefix
    // table == one-shot; planted copies rank 1 — a prefix of a copy
    // is a copy, so the coarse pass can never miss one)
    "q_ann_matryoshka" -> ((s: SparkSession, dir: String) => {
      val mk = graft.pipeline.Matryoshka
      val emb = t(s, dir, "embeddings").filter(F.col("embedding").isNotNull)
        .select(F.col("vec_id").cast("long").as("vec_id"), F.col("embedding"))
      val copies = emb.filter(F.col("vec_id") < 5)
        .select((F.col("vec_id") + 100000L).as("vec_id"), F.col("embedding"))
      val corpus = emb.unionByName(copies)
      val planted = mk.truncatedTopK(corpus, copies, "vec_id", "embedding",
        dPrime = 4, k = 3, poolSize = 50).collect()
      val top1 = planted.filter(_.getAs[Int]("rank") == 1)
      val copyOk = top1.length == 5 && top1.forall(r =>
        r.getAs[Long]("neighbor_id") == r.getAs[Long]("query_id") - 100000L &&
        math.abs(r.getAs[Double]("cos") - 1.0) < 1e-6)
      val queries = emb.filter(F.col("vec_id") < 10)
      def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Long)] = df
        .select("query_id", "rank", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val exact = pairs(graft.pipeline.Similarity
        .bruteForceTopK(emb, queries, "vec_id", "embedding", 5))
      val exhaustive = pairs(mk.truncatedTopK(emb, queries, "vec_id",
        "embedding", 8, 5, poolSize = 1 << 20))
      val pooled = pairs(mk.truncatedTopK(emb, queries, "vec_id", "embedding",
        8, 5, poolSize = 500))
      val indexed = pairs(mk.truncatedTopKIndexed(
        mk.buildTruncatedTable(emb, "vec_id", "embedding", 8),
        emb, queries, "vec_id", "embedding", 8, 5, poolSize = 500))
      s.range(1).select(
        F.lit(planted.length.toLong).as("n_rows"),
        F.lit(copyOk).as("copies_rank1"),
        F.lit(exhaustive == exact).as("pool_exhaustive_exact"),
        F.lit(indexed == pooled).as("indexed_exact"))
    }),

    // manifest-keyed result cache: miss -> hit -> mutation
    // invalidates (file-listing state token) -> refreshed result sees
    // the appended doc -> hit again; rows identical across miss/hit
    "q_serving_cache" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val d = t(s, dir, "documents")
      val tmp = System.getProperty("java.io.tmpdir") + "/graft_q_cache"
      val fs = new org.apache.hadoop.fs.Path(tmp)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      val ipath = s"$tmp/idx"; val cpath = s"$tmp/cache"
      graft.pipeline.Retrieval.buildTextIndex(d, "doc_id", "text", 32)
        .save(ipath)
      val q = Seq("slow", "merge", "window")
      val sv = graft.pipeline.Serving
      val r1 = sv.cachedTopK(s, cpath, ipath, q, 10)
      val r2 = sv.cachedTopK(s, cpath, ipath, q, 10)
      val rowsSame = r1.rows.orderBy("rank").collect().map(_.toSeq).toSeq ==
        r2.rows.orderBy("rank").collect().map(_.toSeq).toSeq
      val otherMiss = !sv.cachedTopK(s, cpath, ipath, Seq("window"), 5).hit
      graft.pipeline.Retrieval.appendToTextIndex(s, ipath,
        Seq((10000000L, "slow slow slow merge merge window"))
          .toDF("doc_id", "text"), "doc_id", "text")
      val r3 = sv.cachedTopK(s, cpath, ipath, q, 10)
      val newDocRanked = r3.rows.filter(F.col("id") === 10000000L).count() == 1
      val r4 = sv.cachedTopK(s, cpath, ipath, q, 10)
      s.range(1).select(
        F.lit(!r1.hit).as("first_miss"),
        F.lit(r2.hit && r2.token == r1.token).as("second_hit"),
        F.lit(rowsSame).as("rows_same"),
        F.lit(otherMiss).as("other_query_miss"),
        F.lit(!r3.hit && r3.token != r1.token).as("mutation_invalidates"),
        F.lit(newDocRanked).as("new_doc_ranked"),
        F.lit(r4.hit).as("refreshed_hit"))
    }),

    // paired randomization significance test: per-query integer
    // metrics (hit counts per doc_id%12 stratum), 200 deterministic
    // md5 sign assignments — the whole test replays exactly in SQL
    // (integer sums, one final division)
    "q_eval_significance" -> ((s: SparkSession, dir: String) => {
      val d = t(s, dir, "documents")
      val toks = d.select(F.col("doc_id"),
          F.explode(F.split(F.lower(F.col("text")), "\\s+")).as("term"))
        .filter(F.length(F.col("term")) > 0)
      def hits(term: String) = toks.filter(F.col("term") === term)
        .select("doc_id").distinct()
        .groupBy((F.col("doc_id") % 12).as("g"))
        .agg(F.count(F.lit(1)).as("n"))
      val grid = s.range(0, 12).select(F.col("id").as("g"))
      val perQ = grid
        .join(hits("slow").withColumnRenamed("n", "a"), Seq("g"), "left")
        .join(hits("merge").withColumnRenamed("n", "b"), Seq("g"), "left")
        .select(F.col("g"),
          F.coalesce(F.col("a"), F.lit(0L)).cast("double").as("ma"),
          F.coalesce(F.col("b"), F.lit(0L)).cast("double").as("mb"))
      graft.pipeline.Eval.pairedRandomizationTest(
          perQ, "g", "ma", "mb", reps = 200, seed = "sig14")
        .select(F.col("n_queries"), F.col("obs_diff"), F.col("reps"),
          F.col("n_ge"), F.col("p_value"))
    }),

    // sharded-index maintenance: appends route to shards by the build
    // hash and ride the unchanged single-index append — the probe
    // then ranks exactly like the monolithic full-corpus index
    // (q_bm25's oracle, shared verbatim)
    "q_sharded_append" -> ((s: SparkSession, dir: String) => {
      val d = t(s, dir, "documents")
      val tmp = System.getProperty("java.io.tmpdir") + "/graft_q_shard_app"
      val fs = new org.apache.hadoop.fs.Path(tmp)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      graft.pipeline.Serving.saveShardedTextIndex(
        d.filter(F.col("doc_id") % 2 === 1), "doc_id", "text", tmp,
        shards = 3, buckets = 32)
      graft.pipeline.Serving.appendToShardedTextIndex(
        s, tmp, d.filter(F.col("doc_id") % 2 === 0), "doc_id", "text")
      graft.pipeline.Serving.bm25TopKSharded(
          s, tmp, Seq("slow", "merge", "window"), 10)
        .select(F.col("rank").cast("long").as("rank"),
          F.col("id").as("doc_id"), F.col("tf_total"), F.col("n_terms_hit"))
        .orderBy("rank")
    }),

    // point-in-time index read: batch-stamped layout makes as-of a
    // partition filter — the probe at batch 0 ranks over exactly the
    // base + batch-0 documents with THAT moment's exact stats (the
    // oracle replays the same doc subset by its deterministic
    // predicate)
    "q_index_asof" -> ((s: SparkSession, dir: String) => {
      val d = t(s, dir, "documents").select("doc_id", "text")
      val tmp = System.getProperty("java.io.tmpdir") + "/graft_q_asof"
      val fs = new org.apache.hadoop.fs.Path(tmp)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      graft.pipeline.Retrieval.buildTextIndex(
        d.filter(F.col("doc_id") % 2 === 1), "doc_id", "text", 32).save(tmp)
      graft.pipeline.Retrieval.appendBatchToTextIndex(s, tmp,
        d.filter(F.col("doc_id") % 4 === 0), "doc_id", "text", 0L)
      graft.pipeline.Retrieval.appendBatchToTextIndex(s, tmp,
        d.filter(F.col("doc_id") % 4 === 2), "doc_id", "text", 1L)
      val at0 = graft.pipeline.Retrieval.loadTextIndexAsOf(s, tmp, 0L)
      graft.pipeline.Retrieval.bm25TopKIndexed(
          at0, Seq("slow", "merge", "window"), 10)
        .select(F.col("rank").cast("long").as("rank"),
          F.col("id").as("doc_id"), F.col("tf_total"), F.col("n_terms_hit"))
        .withColumn("n_docs_asof", F.lit(at0.nDocs))
        .orderBy("rank")
    }),

    // BM25 hard-negative mining (the DPR/ANCE training-pair recipe):
    // top-ranked non-positives per training query — the positive
    // exclusion and neg re-rank are all-integer over the pinned batch
    // ranking (q_retrieval_batch's measured-gap query set)
    "q_retrieval_negatives" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val d = t(s, dir, "documents")
      val idx = graft.pipeline.Retrieval.buildTextIndex(d, "doc_id", "text", 32)
      val qs = Seq(
        0L -> Seq("slow", "merge", "window"),
        1L -> Seq("hash", "batch"),
        2L -> Seq("filter", "scan", "index"))
      val positives = d.filter(F.col("doc_id") % 10 === 3)
        .select(F.lit(0L).as("query_id"), F.col("doc_id"))
        .unionByName(d.filter(F.col("doc_id") % 10 === 4)
          .select(F.lit(1L).as("query_id"), F.col("doc_id")))
        .unionByName(d.filter(F.col("doc_id") % 10 === 5)
          .select(F.lit(2L).as("query_id"), F.col("doc_id")))
      graft.pipeline.Serving.mineHardNegatives(
          idx, qs.toDF("query_id", "terms"), positives,
          nNegatives = 5, pool = 20)
        .select(F.col("query_id"), F.col("neg_rank").cast("long").as("neg_rank"),
          F.col("negative_id"), F.col("pool_rank").cast("long").as("pool_rank"))
        .orderBy("query_id", "neg_rank")
    }),

    // LTR feature export: per (query, candidate) BM25 + idf-sum +
    // exact integer features off ONE matched-postings pass; float
    // features at the 4dp cross-engine convention, label join with
    // the implicit-negative default
    "q_ltr_features" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val d = t(s, dir, "documents")
      val idx = graft.pipeline.Retrieval.buildTextIndex(d, "doc_id", "text", 32)
      val qs = Seq(0L -> Seq("slow", "merge"), 1L -> Seq("window", "group"))
      val labels = d.filter(F.col("doc_id") % 7 === 1)
        .select(F.lit(0L).as("query_id"), F.col("doc_id"), F.lit(1.0).as("label"))
        .unionByName(d.filter(F.col("doc_id") % 7 === 2)
          .select(F.lit(1L).as("query_id"), F.col("doc_id"),
            F.lit(2.0).as("label")))
      graft.pipeline.Retrieval.ltrFeatures(
          idx, qs.toDF("query_id", "terms"), labels, pool = 1000000)
        .select(F.col("query_id"), F.col("id").as("doc_id"), F.col("label"),
          F.round(F.col("f_bm25") * 10000).cast("long").as("f_bm25_4dp"),
          F.round(F.col("f_idf_sum") * 10000).cast("long").as("f_idf_4dp"),
          F.col("f_tf_sum"), F.col("f_n_hit"), F.col("f_dl"),
          F.col("f_n_qterms"),
          F.round(F.col("f_matched_frac") * 10000).cast("long")
            .as("f_frac_4dp"))
        .orderBy("query_id", "doc_id")
    }),

    // batched more-like-this: term selection, dfs, and scoring all
    // in-plan for 3 source docs at once; selection is all-integer per
    // source, the related re-rank all-integer over the pinned pool
    // (gaps measured per source before trusting)
    "q_retrieval_mlt_batch" -> ((s: SparkSession, dir: String) => {
      val d = t(s, dir, "documents")
      val idx = graft.pipeline.Retrieval.buildTextIndex(d, "doc_id", "text", 32)
      graft.pipeline.Serving.moreLikeThisBatch(
          idx, d.filter(F.col("doc_id").isin(3L, 5L, 9L)),
          "doc_id", "text", mTerms = 4, k = 8)
        .select(F.col("query_id"),
          F.col("rel_rank").cast("long").as("rel_rank"),
          F.col("id").as("doc_id"), F.col("tf_total"),
          F.col("n_terms_hit"), F.col("query"))
        .orderBy("query_id", "rel_rank")
    }),

    // percolation (reverse search / alerting): stored conjunctive
    // queries match incoming docs — all-integer distinct-term counts,
    // exact SQL replay
    "q_percolate" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val stored = Seq(
        (1L, Seq("slow", "merge")),
        (2L, Seq("window")),
        (3L, Seq("slow", "window", "group"))).toDF("query_id", "terms")
      graft.pipeline.Serving.percolate(
          stored, t(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id", "query_id")
    }),

    // streaming percolation: micro-batches land batch-stamped matches
    // with dynamic overwrite (replay-idempotent); the union over
    // batches equals the batch percolation — oracle shared verbatim
    "q_stream_percolate" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val stored = Seq(
        (1L, Seq("slow", "merge")),
        (2L, Seq("window")),
        (3L, Seq("slow", "window", "group"))).toDF("query_id", "terms")
      val d = t(s, dir, "documents").select("doc_id", "text")
      val tmp = System.getProperty("java.io.tmpdir") + "/graft_q_percolate"
      val fs = new org.apache.hadoop.fs.Path(tmp)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      d.repartition(2).write.parquet(s"$tmp/src")
      val stream = s.readStream.schema(d.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$tmp/src")
      val q = graft.pipeline.Serving.percolateStream(
          stored, stream, s"$tmp/out", "doc_id", "text")
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(s"$tmp/out")
        .select("doc_id", "query_id", "n_terms")
        .orderBy("doc_id", "query_id")
    }),

    // token-gated completion refresh: rebuild iff the source index
    // changed (indexStateToken invalidation applied to a derived
    // index); the refreshed dictionary serves the planted new term
    "q_complete_sync" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val d = t(s, dir, "documents")
      val tmp = System.getProperty("java.io.tmpdir") + "/graft_q_csync"
      val fs = new org.apache.hadoop.fs.Path(tmp)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      val ipath = s"$tmp/idx"; val cpath = s"$tmp/cmp"
      graft.pipeline.Retrieval.buildTextIndex(d, "doc_id", "text", 32)
        .save(ipath)
      val sv = graft.pipeline.Serving
      val first = sv.syncCompletionIndex(s, ipath, cpath)
      val noop = !sv.syncCompletionIndex(s, ipath, cpath)
      graft.pipeline.Retrieval.appendToTextIndex(s, ipath,
        Seq((10000001L, "ssyncterm ssyncterm other"))
          .toDF("doc_id", "text"), "doc_id", "text")
      val rebuilt = sv.syncCompletionIndex(s, ipath, cpath)
      val probe = sv.completeTopK(s, cpath, "ssy", 5).collect()
      val planted = probe.length == 1 &&
        probe.head.getString(1) == "ssyncterm" && probe.head.getLong(2) == 1L
      s.range(1).select(
        F.lit(first).as("initial_build"),
        F.lit(noop).as("unchanged_noop"),
        F.lit(rebuilt).as("rebuilt_after_append"),
        F.lit(planted).as("planted_term_served"))
    }),

    // sharded streaming ingest: micro-batches fan out to shard
    // indexes (per-shard batch stamping, replay-idempotent); the
    // federated probe then ranks exactly like the monolithic index —
    // q_bm25's oracle, shared verbatim
    "q_stream_sharded" -> ((s: SparkSession, dir: String) => {
      val d = t(s, dir, "documents").select("doc_id", "text")
      val tmp = System.getProperty("java.io.tmpdir") + "/graft_q_stream_shard"
      val fs = new org.apache.hadoop.fs.Path(tmp)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      graft.pipeline.Serving.saveShardedTextIndex(
        d.filter(F.col("doc_id") % 2 === 1), "doc_id", "text",
        s"$tmp/idx", shards = 3, buckets = 32)
      val fresh = d.filter(F.col("doc_id") % 2 === 0)
      fresh.repartition(2).write.parquet(s"$tmp/src")
      val stream = s.readStream.schema(fresh.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$tmp/src")
      val q = graft.pipeline.Serving.streamToShardedTextIndex(
          stream, s"$tmp/idx", "doc_id", "text")
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      (0 until 3).foreach(sh => graft.pipeline.Maintenance
        .releaseWriterLease(s, s"$tmp/idx/shard=$sh"))
      graft.pipeline.Serving.bm25TopKSharded(
          s, s"$tmp/idx", Seq("slow", "merge", "window"), 10)
        .select(F.col("rank").cast("long").as("rank"),
          F.col("id").as("doc_id"), F.col("tf_total"), F.col("n_terms_hit"))
        .orderBy("rank")
    }),

    // upsert: remove-then-append replacement of changed documents —
    // probe over the upserted index ranks exactly like a rebuild of
    // the modified corpus (the oracle replays the modification as a
    // CASE append); planted term in the query exercises the new text
    "q_index_upsert" -> ((s: SparkSession, dir: String) => {
      val d = t(s, dir, "documents")
      val tmp = System.getProperty("java.io.tmpdir") + "/graft_q_upsert"
      val fs = new org.apache.hadoop.fs.Path(tmp)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      graft.pipeline.Retrieval.buildTextIndex(d, "doc_id", "text", 32)
        .save(tmp)
      val changed = d.filter(F.col("doc_id") % 5 === 0)
        .select(F.col("doc_id"),
          F.concat(F.col("text"), F.lit(" zzupserted")).as("text"))
      graft.pipeline.Retrieval.upsertIntoTextIndex(
        s, tmp, changed, "doc_id", "text")
      graft.pipeline.Retrieval.bm25TopKIndexed(
          graft.pipeline.Retrieval.loadTextIndex(s, tmp),
          Seq("slow", "merge", "zzupserted"), 10)
        .select(F.col("rank").cast("long").as("rank"),
          F.col("id").as("doc_id"), F.col("tf_total"), F.col("n_terms_hit"))
        .orderBy("rank")
    }),

    // term-level statistics: df / exact collection frequency / idf at
    // current N, partition-pruned to the queried terms — full replay
    "q_term_stats" -> ((s: SparkSession, dir: String) => {
      val idx = graft.pipeline.Retrieval.buildTextIndex(
        t(s, dir, "documents"), "doc_id", "text", 32)
      graft.pipeline.Retrieval.termStats(
          idx, Seq("slow", "merge", "window", "zzabsent"))
        .select(F.col("term"), F.col("df"), F.col("cf"),
          F.round(F.col("idf") * 10000).cast("long").as("idf_4dp"))
        .orderBy("term")
    }),

    // numeric facet panel over the matched set: exact counts + exact
    // n_chars sums per source; stat_avg is one division over exact
    // longs (deterministic raw doubles cross-engine)
    "q_retrieval_facet_stats" -> ((s: SparkSession, dir: String) => {
      val d = t(s, dir, "documents")
      val idx = graft.pipeline.Retrieval.buildTextIndex(d, "doc_id", "text", 32)
      graft.pipeline.Retrieval.facetStats(
          idx, Seq("slow", "merge", "window"), d, "doc_id", "source",
          "n_chars", 10)
        .select(F.col("source"), F.col("n_docs"), F.col("stat_sum"),
          F.col("stat_avg"))
    }),

    // paired bootstrap CI: deterministic hex-draw resamples of the
    // 12-group integer metrics, order-statistic percentile interval —
    // exact integer sums, full SQL replay
    "q_eval_bootstrap" -> ((s: SparkSession, dir: String) => {
      val d = t(s, dir, "documents")
      val toks = d.select(F.col("doc_id"),
          F.explode(F.split(F.lower(F.col("text")), "\\s+")).as("term"))
        .filter(F.length(F.col("term")) > 0)
      def hits(term: String) = toks.filter(F.col("term") === term)
        .select("doc_id").distinct()
        .groupBy((F.col("doc_id") % 12).as("g"))
        .agg(F.count(F.lit(1)).as("n"))
      val perQ = s.range(0, 12).select(F.col("id").as("g"))
        .join(hits("slow").withColumnRenamed("n", "a"), Seq("g"), "left")
        .join(hits("merge").withColumnRenamed("n", "b"), Seq("g"), "left")
        .select(F.col("g"),
          F.coalesce(F.col("a"), F.lit(0L)).cast("double").as("ma"),
          F.coalesce(F.col("b"), F.lit(0L)).cast("double").as("mb"))
      graft.pipeline.Eval.pairedBootstrapCI(
          perQ, "g", "ma", "mb", reps = 200, seed = "bs14")
        .select(F.col("n_queries"), F.col("obs_mean"), F.col("reps"),
          F.col("ci_lo"), F.col("ci_hi"))
    }),

    // BM25+ (delta * idf floor per matched term): the long-document
    // fix — same idf/weight builders as BM25, replayed term-shape-
    // exact in SQL; ranks pinned by the q_bm25 rule (gaps measured)
    "q_retrieval_bm25plus" -> ((s: SparkSession, dir: String) => {
      val idx = graft.pipeline.Retrieval.buildTextIndex(
        t(s, dir, "documents"), "doc_id", "text", 32)
      graft.pipeline.Retrieval.bm25PlusTopKIndexed(
          idx, Seq("slow", "merge", "window"), 10, delta = 1.0)
        .select(F.col("rank").cast("long").as("rank"),
          F.col("id").as("doc_id"), F.col("tf_total"), F.col("n_terms_hit"))
        .orderBy("rank")
    }),

    // pinned (editorial) results: given ids take ranks 1..p in order,
    // matched or not; organic fills excluding them — all-integer over
    // the pinned organic ranking (scores dropped from the gate:
    // `matched` carries the fact without a nullable float column)
    "q_retrieval_pinned" -> ((s: SparkSession, dir: String) => {
      val idx = graft.pipeline.Retrieval.buildTextIndex(
        t(s, dir, "documents"), "doc_id", "text", 32)
      graft.pipeline.Serving.pinnedTopK(
          idx, Seq("slow", "merge", "window"), Seq(2L, 7L), 10)
        .select(F.col("rank").cast("long").as("rank"),
          F.col("id").as("doc_id"), F.col("pinned"),
          F.col("score").isNotNull.as("matched"))
        .orderBy("rank")
    }),

    // synonym-group retrieval: variants share tf/df statistics (the
    // analyzer-level synonym contract) — the oracle replays the group
    // aggregation; ranks pinned by the q_bm25 rule (gaps measured)
    "q_retrieval_synonyms" -> ((s: SparkSession, dir: String) => {
      val idx = graft.pipeline.Retrieval.buildTextIndex(
        t(s, dir, "documents"), "doc_id", "text", 32)
      graft.pipeline.Serving.synonymTopK(
          idx, Seq(Seq("slow", "fast"), Seq("merge"), Seq("window")), 10)
        .select(F.col("rank").cast("long").as("rank"),
          F.col("id").as("doc_id"), F.col("tf_total"), F.col("n_terms_hit"))
        .orderBy("rank")
    }),

    // score explanation: the per-(doc, term) breakdown behind served
    // scores — corpus-level dfs under the doc restriction, weights
    // from the ONE shared builder; full replay at 4dp
    "q_retrieval_explain" -> ((s: SparkSession, dir: String) => {
      val idx = graft.pipeline.Retrieval.buildTextIndex(
        t(s, dir, "documents"), "doc_id", "text", 32)
      graft.pipeline.Retrieval.explainScores(
          idx, Seq("slow", "merge", "window"), Seq(3L, 6L, 9L))
        .select(F.col("id").as("doc_id"), F.col("term"), F.col("tf"),
          F.col("df"), F.col("dl"),
          F.round(F.col("idf") * 10000).cast("long").as("idf_4dp"),
          F.round(F.col("weight") * 10000).cast("long").as("weight_4dp"))
        .orderBy("doc_id", "term")
    }),

    // rank-list diff between two serving configs (BM25 vs BM25+):
    // all-integer over two pinned rankings, coalesced absences
    "q_eval_rankdiff" -> ((s: SparkSession, dir: String) => {
      val idx = graft.pipeline.Retrieval.buildTextIndex(
        t(s, dir, "documents"), "doc_id", "text", 32)
      val q = Seq("slow", "merge", "window")
      graft.pipeline.Eval.rankListDiff(
          graft.pipeline.Retrieval.bm25TopKIndexed(idx, q, 10),
          graft.pipeline.Retrieval.bm25PlusTopKIndexed(idx, q, 10, 1.0))
        .select(F.col("id").as("doc_id"), F.col("rank_a"),
          F.col("rank_b"), F.col("delta"))
        .orderBy("doc_id")
    }),

    // deterministic random walks (the DeepWalk corpus generator):
    // md5-draw steps over a doc-id-derived graph — every hop replays
    // in SQL (3 chained joins), all-integer
    "q_graph_walks" -> ((s: SparkSession, dir: String) => {
      val d = t(s, dir, "documents").select("doc_id")
      val n = d.count()
      val edges = d.select(F.col("doc_id").as("src"),
          ((F.col("doc_id") * 7 + 3) % n).as("dst"))
        .unionByName(d.select(F.col("doc_id").as("src"),
          ((F.col("doc_id") * 13 + 5) % n).as("dst")))
      graft.pipeline.LinkGraph.randomWalks(
          edges, walkLen = 4, walksPerNode = 2, seed = "walk14")
        .select(F.col("start"), F.col("walk"), F.col("step"), F.col("node"))
        .orderBy("start", "walk", "step")
    }),

    // tokenizer-coverage report: OOV mass per source vs the top-300
    // (df desc, term) dictionary — exact occurrence counts, one
    // division; full replay
    "q_vocab_coverage" -> ((s: SparkSession, dir: String) => {
      val d = t(s, dir, "documents")
      val toks = d.select(F.col("doc_id"),
          F.explode(F.split(F.lower(F.col("text")), "\\s+")).as("term"))
        .filter(F.length(F.col("term")) > 0)
      val vocab = toks.select("doc_id", "term").distinct()
        .groupBy("term").agg(F.count(F.lit(1)).as("df"))
        .orderBy(F.col("df").desc, F.col("term").asc)
        .limit(300).select("term")
      graft.pipeline.TextFunctions.tokenCoverage(d, "text", vocab, "source")
        .orderBy("group")
    }),

    // LSH banding auto-tune: the s-curve threshold grid over the
    // divisor pairs of 128 and the closest pair per target — pow is
    // the only libm call and the measured margins dwarf its ulp
    "q_dedup_autotune" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val pairs = (1 to 128).filter(128 % _ == 0).map(b => (b, 128 / b))
      val rows = for {
        pct <- Seq(50, 70, 90)
        (b, r) <- pairs
      } yield {
        val chosen = graft.pipeline.Dedup.chooseBandsRows(128, pct / 100.0)
        (pct.toLong, b.toLong, r.toLong,
          math.round(graft.pipeline.Dedup.sCurveThreshold(b, r) * 10000),
          (b, r) == chosen)
      }
      rows.toDF("target_pct", "bands", "rows_per_band", "threshold_4dp", "chosen")
        .orderBy("target_pct", "bands")
    }),

    // shard consolidation: two half-corpus indexes merged into one —
    // postings union + exact stats addition; the merged probe ranks
    // exactly like a full rebuild (q_bm25's oracle, shared verbatim)
    "q_index_merge" -> ((s: SparkSession, dir: String) => {
      val d = t(s, dir, "documents")
      val tmp = System.getProperty("java.io.tmpdir") + "/graft_q_merge"
      val fs = new org.apache.hadoop.fs.Path(tmp)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      graft.pipeline.Retrieval.buildTextIndex(
        d.filter(F.col("doc_id") % 2 === 1), "doc_id", "text", 32)
        .save(s"$tmp/a")
      graft.pipeline.Retrieval.buildTextIndex(
        d.filter(F.col("doc_id") % 2 === 0), "doc_id", "text", 32)
        .save(s"$tmp/b")
      graft.pipeline.Retrieval.mergeTextIndexes(
        s, Seq(s"$tmp/a", s"$tmp/b"), s"$tmp/m")
      graft.pipeline.Retrieval.bm25TopKIndexed(
          graft.pipeline.Retrieval.loadTextIndex(s, s"$tmp/m"),
          Seq("slow", "merge", "window"), 10)
        .select(F.col("rank").cast("long").as("rank"),
          F.col("id").as("doc_id"), F.col("tf_total"), F.col("n_terms_hit"))
        .orderBy("rank")
    }),

    // per-node triangle counts over a ring + parity-gated chords
    // (every consecutive triple with an even anchor closes) —
    // all-integer wedge-closing joins, exact SQL replay
    "q_graph_triangles" -> ((s: SparkSession, dir: String) => {
      val d = t(s, dir, "documents").select("doc_id")
      val n = d.count()
      val edges = d.select(F.col("doc_id").as("src"),
          ((F.col("doc_id") + 1) % n).as("dst"))
        .unionByName(d.filter(F.col("doc_id") % 2 === 0)
          .select(F.col("doc_id").as("src"),
            ((F.col("doc_id") + 2) % n).as("dst")))
      graft.pipeline.LinkGraph.triangleCounts(edges)
        .orderBy("node")
    }),

    // bigram collocations by PMI: exact counts, the single libm log
    // at 4dp — corpus phrase mining for query segmentation
    "q_text_collocations" -> ((s: SparkSession, dir: String) => {
      graft.pipeline.TextFunctions.collocations(
          t(s, dir, "documents"), "text", minCount = 5)
        .select(F.col("bigram"), F.col("n"),
          F.round(F.col("pmi") * 10000).cast("long").as("pmi_4dp"))
        .orderBy("bigram")
    }),

    // near-real-time serving: saved index + fresh unindexed tail
    // merged with exact global stats (the federation math applied to
    // recency) — equals the full-corpus probe, q_bm25 oracle verbatim
    "q_retrieval_nrt" -> ((s: SparkSession, dir: String) => {
      val d = t(s, dir, "documents")
      val idx = graft.pipeline.Retrieval.buildTextIndex(
        d.filter(F.col("doc_id") % 3 =!= 0), "doc_id", "text", 32)
      graft.pipeline.Serving.bm25TopKWithTail(
          idx, d.filter(F.col("doc_id") % 3 === 0), "doc_id", "text",
          Seq("slow", "merge", "window"), 10)
        .select(F.col("rank").cast("long").as("rank"),
          F.col("id").as("doc_id"), F.col("tf_total"), F.col("n_terms_hit"))
        .orderBy("rank")
    }),

    // static-prior boosted ranking: score + lambda * tier with
    // integer doc tiers — the prior expression replays exactly;
    // combined-score gaps measured before pinning
    "q_retrieval_boosted" -> ((s: SparkSession, dir: String) => {
      val d = t(s, dir, "documents")
      val idx = graft.pipeline.Retrieval.buildTextIndex(d, "doc_id", "text", 32)
      val boosts = d.select(F.col("doc_id").as("id"),
        (F.col("doc_id") % 4).cast("double").as("boost"))
      graft.pipeline.Serving.bm25TopKBoosted(
          idx, Seq("slow", "merge", "window"), boosts, 10, lambda = 0.05)
        .select(F.col("rank").cast("long").as("rank"),
          F.col("id").as("doc_id"), F.col("tf_total"), F.col("n_terms_hit"))
        .orderBy("rank")
    }),

    // label propagation over the ring graph: 3 iterations from sparse
    // seeds — all-integer votes with the min-label tie-break, full
    // SQL replay (3 nested vote CTEs)
    "q_graph_labelprop" -> ((s: SparkSession, dir: String) => {
      val d = t(s, dir, "documents").select("doc_id")
      val n = d.count()
      val edges = d.select(F.col("doc_id").as("src"),
        ((F.col("doc_id") + 1) % n).as("dst"))
      val seeds = d.filter(F.col("doc_id") % 25 === 0)
        .select(F.col("doc_id").as("node"),
          (F.col("doc_id") % 3).as("label"))
      graft.pipeline.LinkGraph.labelPropagation(edges, seeds, 3)
        .filter(F.col("label").isNotNull)
        .orderBy("node")
    }),

    // federated ops composition: sharded save -> routed append ->
    // routed takedown -> merge to one index -> probe == a rebuild of
    // the surviving corpus (deterministic predicate replay)
    "q_pipeline_federated" -> ((s: SparkSession, dir: String) => {
      val d = t(s, dir, "documents")
      val tmp = System.getProperty("java.io.tmpdir") + "/graft_q_fed"
      val fs = new org.apache.hadoop.fs.Path(tmp)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      val sv = graft.pipeline.Serving
      sv.saveShardedTextIndex(d.filter(F.col("doc_id") % 2 === 1),
        "doc_id", "text", s"$tmp/idx", shards = 3, buckets = 32)
      sv.appendToShardedTextIndex(s, s"$tmp/idx",
        d.filter(F.col("doc_id") % 2 === 0), "doc_id", "text")
      sv.removeFromShardedTextIndex(s, s"$tmp/idx",
        d.filter(F.col("doc_id") % 10 === 7).select("doc_id"), "doc_id")
      graft.pipeline.Retrieval.mergeTextIndexes(s,
        (0 until 3).map(i => s"$tmp/idx/shard=$i"), s"$tmp/merged")
      graft.pipeline.Retrieval.bm25TopKIndexed(
          graft.pipeline.Retrieval.loadTextIndex(s, s"$tmp/merged"),
          Seq("slow", "merge", "window"), 10)
        .select(F.col("rank").cast("long").as("rank"),
          F.col("id").as("doc_id"), F.col("tf_total"), F.col("n_terms_hit"))
        .orderBy("rank")
    }),

    // static impact-ordered pruning: the kept postings are the
    // (tf desc, id asc) per-term prefix — all-integer, exact SQL
    // replay; corpus stats unchanged; the pruned probe still fills k
    "q_index_prune" -> ((s: SparkSession, dir: String) => {
      val d = t(s, dir, "documents")
      val idx = graft.pipeline.Retrieval.buildTextIndex(
        d, "doc_id", "text", buckets = 32)
      val p = graft.pipeline.Retrieval.prunedTextIndex(idx, 20)
      val statsKept = p.nDocs == idx.nDocs && p.dlSum == idx.dlSum
      val probeFull = graft.pipeline.Retrieval.bm25TopKIndexed(
        p, Seq("slow", "merge"), 10).count() == 10L
      p.postings.filter(F.col("term").isin("slow", "merge"))
        .select(F.col("term"), F.col("id").as("doc_id"), F.col("tf"))
        .withColumn("stats_kept", F.lit(statsKept))
        .withColumn("probe_full", F.lit(probeFull))
        .orderBy("term", "doc_id")
    })
  )

  def oracleSql: Map[String, String] = {
    val base = Map(
    "q_sketch_create" ->
      "SELECT CAST(0 AS BIGINT) AS cnt, true AS nonempty, true AS sum_is_null",
    "q_sketch_add" ->
      """SELECT event_type, count(*) + 1 AS cnt_after_add, true AS add_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_sketch_weighted" ->
      """SELECT event_type, count(*) AS cnt, true AS wcount_ok, true AS minmax_ok,
        |       true AS p50_ok, true AS p95_ok, true AS sum_ok, true AS add2_ok,
        |       true AS skip_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_sketch_merge" ->
      """SELECT event_type, count(*) AS cnt
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_sketch_quantile" ->
      """SELECT event_type, count(*) AS cnt, true AS p50_ok, true AS p95_ok, true AS p99_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_sketch_scalars" ->
      """SELECT event_type, count(*) AS cnt, true AS sum_ok, true AS min_ok,
        |       true AS max_ok, true AS avg_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_sketch_stats" ->
      """SELECT event_type, count(*) AS cnt, true AS count_ok, true AS avg_ok, true AS minmax_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_sketch_agg_rollup" ->
      """SELECT event_type, count(*) AS cnt
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_safetensors" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_vectors, true AS roundtrip_ok
        |FROM embeddings WHERE embedding IS NOT NULL""".stripMargin,
    "q_safetensors_bf16" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_vectors, true AS roundtrip_ok,
        |  true AS dtype_ok
        |FROM embeddings WHERE embedding IS NOT NULL""".stripMargin,
    "q_crawl_schedule" ->
      """WITH u AS (
        |  SELECT doc_id,
        |         'https://host' || (doc_id % 20) || '.example.com/page' || doc_id
        |           AS url,
        |         'host' || (doc_id % 20) || '.example.com' AS host,
        |         doc_id % 7 AS priority
        |  FROM documents),
        |r AS (SELECT doc_id, url, host,
        |        CAST(row_number() OVER (
        |          PARTITION BY host ORDER BY priority DESC, url ASC) - 1
        |          AS BIGINT) AS slot
        |      FROM u)
        |SELECT doc_id, url, host, slot,
        |       CAST(1700000000000 + slot * 5000 AS BIGINT) AS fetch_at_ms
        |FROM r ORDER BY host, slot""".stripMargin,
    "q_bitext_align" ->
      """WITH d AS (SELECT doc_id,
        |             list_filter(string_split_regex(
        |               regexp_replace(text, '[.!?]', '', 'g'), '\s+'),
        |               w -> len(w) > 0) AS toks
        |           FROM documents WHERE text IS NOT NULL),
        |n AS (SELECT doc_id, CAST(ceil(len(toks) / 5.0) AS BIGINT) AS ns
        |      FROM d WHERE len(toks) >= 1),
        |g AS (SELECT doc_id,
        |        unnest(generate_series(CAST(0 AS BIGINT), ns - 1)) AS i
        |      FROM n)
        |SELECT doc_id, i AS bead, i AS src_start, CAST(1 AS BIGINT) AS src_len,
        |       i AS tgt_start, CAST(1 AS BIGINT) AS tgt_len
        |FROM g ORDER BY doc_id, bead""".stripMargin,
    "q_datacard" ->
      """WITH d AS (SELECT source, lang, text FROM documents
        |           WHERE text IS NOT NULL),
        |base AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |                CAST(sum(strlen(text)) AS BIGINT) AS bytes,
        |                CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |                CAST(count(*) - count(DISTINCT text) AS BIGINT) AS dup_docs
        |         FROM d GROUP BY 1),
        |lc AS (SELECT source, lang, count(*) AS c FROM d
        |       WHERE lang IS NOT NULL GROUP BY 1, 2),
        |top AS (SELECT source, lang AS top_lang, CAST(c AS BIGINT) AS top_lang_docs
        |        FROM (SELECT *, row_number() OVER (
        |                PARTITION BY source ORDER BY c DESC, lang DESC) AS rn
        |              FROM lc)
        |        WHERE rn = 1)
        |SELECT base.source, n_docs, bytes, n_langs, dup_docs,
        |       top_lang, top_lang_docs, true AS p50_ok
        |FROM base LEFT JOIN top ON base.source = top.source
        |ORDER BY base.source""".stripMargin,
    "q_stream_burst" ->
      """WITH e AS (SELECT (epoch_ms(ts) // 14400000) * 14400000 AS w,
        |                  event_type, CAST(user_id AS VARCHAR) AS item,
        |                  epoch_ms(date_trunc('hour', ts)) AS h
        |           FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        |mn AS (SELECT (min(h) // 86400000) * 86400000 AS f0 FROM e),
        |ref AS (SELECT item, count(*) AS r FROM e, mn
        |        WHERE h >= f0 AND h < f0 + 86400000 GROUP BY item),
        |c AS (SELECT w, event_type, item, count(*) AS cnt FROM e GROUP BY 1, 2, 3),
        |j AS (SELECT c.w, c.event_type, c.item, c.cnt,
        |             coalesce(ref.r, 0) AS ref0
        |      FROM c LEFT JOIN ref USING (item))
        |SELECT CAST(w AS BIGINT) AS win_ms, event_type, item,
        |       CAST(cnt AS BIGINT) AS cnt, CAST(ref0 AS BIGINT) AS ref,
        |       CAST(cnt AS DOUBLE) / (ref0 + 1) AS rise
        |FROM j WHERE CAST(cnt AS DOUBLE) / (ref0 + 1) >= 0.3
        |ORDER BY win_ms, event_type, item""".stripMargin,
    "q_view_seasonal" ->
      """WITH c AS (SELECT epoch_ms(date_trunc('hour', ts)) AS bucket_ms,
        |                  event_type, count(*) AS n
        |           FROM events WHERE ts IS NOT NULL GROUP BY 1, 2)
        |SELECT CAST(a.bucket_ms AS BIGINT) AS bucket_ms, a.event_type,
        |       CAST(a.n AS BIGINT) AS n, CAST(p.n AS BIGINT) AS n_prev,
        |       CAST(a.n AS DOUBLE) / CAST(p.n AS DOUBLE) AS ratio
        |FROM c a LEFT JOIN c p
        |  ON p.bucket_ms = a.bucket_ms - 86400000
        | AND p.event_type = a.event_type
        |ORDER BY bucket_ms, a.event_type""".stripMargin,
    "q_moments_view" ->
      """WITH b AS (SELECT epoch_ms(date_trunc('hour', ts)) AS bucket_ms,
        |                  event_type, CAST(user_id AS DOUBLE) AS v
        |           FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        |g AS (SELECT bucket_ms, event_type, count(v) AS n, sum(v) AS s,
        |             sum(v*v) AS s2
        |      FROM b GROUP BY 1, 2)
        |SELECT CAST(bucket_ms AS BIGINT) AS bucket_ms, event_type,
        |       CAST(n AS BIGINT) AS n, CAST(s AS BIGINT) AS sum_v,
        |       s/n AS mean, greatest(s2/n - (s/n)*(s/n), 0) AS variance
        |FROM g ORDER BY bucket_ms, event_type""".stripMargin,
    "q_slo_forecast" ->
      """WITH b AS (
        |  SELECT epoch_ms(date_trunc('hour', ts)) AS h, event_type
        |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
        |mx AS (SELECT max(h) + 3600000 AS until FROM b)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_period,
        |       CAST(count(*) FILTER (WHERE h >= until - 172800000) AS BIGINT)
        |         AS n_recent,
        |       true AS consumed_ok, true AS burn_recent_ok, true AS exhaust_ok
        |FROM b, mx GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_hll_view" ->
      """SELECT CAST(epoch_ms(date_trunc('hour', ts)) AS BIGINT) AS bucket_ms,
        |       event_type,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        |       true AS est_ok
        |FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
        |GROUP BY 1, 2 ORDER BY bucket_ms, event_type""".stripMargin,
    "q_kmv_retention" ->
      """WITH e AS (SELECT epoch_ms(date_trunc('hour', ts)) AS h, event_type,
        |                  user_id
        |           FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        |mn AS (SELECT (min(h) // 86400000) * 86400000 AS f0 FROM e),
        |a AS (SELECT DISTINCT event_type, user_id FROM e, mn
        |      WHERE h >= f0 AND h < f0 + 86400000),
        |b AS (SELECT DISTINCT event_type, user_id FROM e, mn
        |      WHERE h >= f0 + 86400000 AND h < f0 + 172800000),
        |ka AS (SELECT event_type, count(*) AS ua FROM a GROUP BY 1),
        |kb AS (SELECT event_type, count(*) AS ub FROM b GROUP BY 1),
        |ko AS (SELECT a.event_type, count(*) AS ov FROM a
        |       JOIN b ON a.event_type = b.event_type AND a.user_id = b.user_id
        |       GROUP BY 1),
        |keys AS (SELECT event_type FROM ka UNION SELECT event_type FROM kb)
        |SELECT k.event_type,
        |  CAST(coalesce(ua, 0) AS BIGINT) AS uniques_a,
        |  CAST(coalesce(ub, 0) AS BIGINT) AS uniques_b,
        |  CAST(coalesce(ua, 0) + coalesce(ub, 0) - coalesce(ov, 0) AS BIGINT)
        |    AS uniques_union,
        |  CAST(coalesce(ov, 0) AS BIGINT) AS overlap
        |FROM keys k LEFT JOIN ka USING (event_type)
        |LEFT JOIN kb USING (event_type) LEFT JOIN ko USING (event_type)
        |ORDER BY event_type""".stripMargin,
    "q_topk_trending" ->
      """WITH e AS (SELECT epoch_ms(date_trunc('hour', ts)) AS h, event_type,
        |                  CAST(user_id AS VARCHAR) AS item
        |           FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        |mn AS (SELECT (min(h) // 86400000) * 86400000 AS f0 FROM e),
        |a AS (SELECT event_type, item, count(*) AS ca FROM e, mn
        |      WHERE h >= f0 AND h < f0 + 86400000 GROUP BY 1, 2),
        |b AS (SELECT event_type, item, count(*) AS cb FROM e, mn
        |      WHERE h >= f0 + 86400000 AND h < f0 + 172800000 GROUP BY 1, 2),
        |j AS (SELECT coalesce(a.event_type, b.event_type) AS event_type,
        |             coalesce(a.item, b.item) AS item,
        |             coalesce(ca, 0) AS count_a, coalesce(cb, 0) AS count_b
        |      FROM a FULL OUTER JOIN b
        |        ON a.event_type = b.event_type AND a.item = b.item)
        |SELECT event_type, item, CAST(count_a AS BIGINT) AS count_a,
        |       CAST(count_b AS BIGINT) AS count_b,
        |       CAST(count_b - count_a AS BIGINT) AS delta
        |FROM j ORDER BY event_type, item""".stripMargin,
    "q_slo_burn" ->
      """WITH b AS (
        |  SELECT epoch_ms(date_trunc('hour', ts)) AS h, event_type
        |  FROM events),
        |mx AS (SELECT max(h) + 3600000 AS until FROM b)
        |SELECT event_type,
        |       CAST(count(*) FILTER (WHERE h >= until - 172800000) AS BIGINT)
        |         AS n_short,
        |       CAST(count(*) AS BIGINT) AS n_long,
        |       true AS burn_short_ok, true AS burn_long_ok
        |FROM b, mx GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_sketch_regrain" ->
      """WITH per_user AS (
        |  SELECT date_trunc('day', ts) AS day, event_type, user_id,
        |         count(*) AS c
        |  FROM events GROUP BY 1, 2, 3)
        |SELECT CAST(epoch_ms(day) AS BIGINT) AS day_ms, event_type,
        |       CAST(count(*) AS BIGINT) AS uniques,
        |       CAST(sum(c) AS BIGINT) AS total,
        |       CAST(max(c) AS BIGINT) AS top1
        |FROM per_user GROUP BY 1, 2 ORDER BY day_ms, event_type""".stripMargin,
    "q_bloom_view" ->
      """SELECT event_type,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_members,
        |       true AS no_false_negatives
        |FROM events WHERE ts IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_cms_view" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS total,
        |       true AS total_exact, true AS no_undercount
        |FROM events WHERE ts IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_topk_view" ->
      """WITH c AS (SELECT event_type, user_id, count(*) AS n
        |           FROM events WHERE ts IS NOT NULL GROUP BY 1, 2)
        |SELECT event_type, CAST(max(n) AS BIGINT) AS top1
        |FROM c GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_kmv_view" ->
      """SELECT CAST(epoch_ms(date_trunc('hour', ts)) AS BIGINT) AS bucket_ms,
        |       event_type,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS uniques
        |FROM events WHERE ts IS NOT NULL
        |GROUP BY 1, 2 ORDER BY bucket_ms, event_type""".stripMargin,
    "q_sketch_view" ->
      """SELECT CAST(epoch_ms(date_trunc('hour', ts)) AS BIGINT) AS bucket_ms,
        |       event_type, count(*) AS n, true AS bytes_eq
        |FROM events GROUP BY 1, 2 ORDER BY bucket_ms, event_type""".stripMargin,
    "q_sketch_stats_agg" ->
      """SELECT event_type, count(*) AS cnt, true AS count_ok, true AS p50_ok,
        |       true AS p95_ok, true AS sketch_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_sketch_cdf" ->
      """SELECT event_type, count(*) AS cnt, true AS cdf10_ok, true AS cdf50_ok,
        |       true AS cdf200_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_trim_outliers" ->
      """SELECT event_type, count(*) AS cnt, true AS kept_in_band
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_sketch_histogram" ->
      """SELECT event_type, r.bucket, true AS within_tol
        |FROM (SELECT DISTINCT event_type FROM events),
        |     (SELECT range AS bucket FROM range(0, 10)) r
        |ORDER BY event_type, r.bucket""".stripMargin,
    "q_bloom_prune" ->
      """SELECT CAST(count(*) AS BIGINT) AS matches,
        |       CAST(sum(l_orderkey) AS BIGINT) AS key_sum,
        |       true AS prune_sound, true AS prune_effective
        |FROM lineitem JOIN (SELECT o_orderkey FROM orders WHERE o_orderkey % 97 = 0) o
        |  ON l_orderkey = o_orderkey""".stripMargin,
    "q_compact" ->
      """SELECT CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(epoch_ms(ts)) AS BIGINT) AS ms_sum,
        |       CAST(sum(user_id) AS BIGINT) AS uid_sum,
        |       true AS fragmented_ok, true AS compacted_ok
        |FROM events""".stripMargin,
    "q_profile" ->
      """SELECT 'event_type' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
        |       true AS distinct_ok FROM events
        |UNION ALL
        |SELECT 'user_id', CAST(count(*) AS BIGINT),
        |       CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |       true FROM events
        |UNION ALL
        |SELECT 'value', CAST(count(*) AS BIGINT),
        |       CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |       true FROM events
        |ORDER BY "column"""".stripMargin,
    "q_format_roundtrip" ->
      """SELECT CAST(count(*) AS BIGINT) AS "rows",
        |       true AS csv_rows_ok, true AS json_rows_ok, true AS orc_rows_ok,
        |       true AS csv_longs_ok, true AS json_longs_ok, true AS orc_longs_ok,
        |       true AS doubles_ok
        |FROM events""".stripMargin,
    "q_keyskew" ->
      """WITH k AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n
        |           FROM orders GROUP BY o_custkey)
        |SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |       CAST(sum(n) AS BIGINT) AS n_rows,
        |       CAST(max(n) AS BIGINT) AS max_count,
        |       CAST(sum(n) AS DOUBLE) / count(*) AS mean_count,
        |       CAST(max(n) AS DOUBLE) * count(*) / sum(n) AS skew_ratio,
        |       true AS p50_ok, true AS p90_ok, true AS p99_ok, true AS p999_ok
        |FROM k""".stripMargin,
    "q_sketch_window" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS cnt, true AS rolling_p95_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_robust_stats" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
        |       true AS med_ok, true AS mad_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_sketch_nulls" ->
      """SELECT true AS null_count_ok, true AS null_quantile_ok, true AS null_add_ok,
        |       true AS garbage_count_ok, true AS null_merge_ok, true AS garbage_stats_ok""".stripMargin,
    "q_sketch_lineitem" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt, true AS p50_ok, true AS p99_ok
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_rel_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        |       CAST(round(sum(l_extendedprice) * 100, 0) AS BIGINT) AS sum_price_cents,
        |       count(*) AS cnt
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_rel_join" ->
      """SELECT c_mktsegment, count(*) AS order_cnt,
        |       CAST(round(sum(o_totalprice) * 100, 0) AS BIGINT) AS total_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS items,
        |       CAST(round(sum(l_extendedprice) * 100, 0) AS BIGINT) AS price_cents
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_rel_filter" ->
      """SELECT count(*) AS cnt,
        |       CAST(round(sum(l_extendedprice * l_discount) * 100, 0) AS BIGINT) AS revenue_cents
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1994-01-01 00:00:00' AND TIMESTAMP '1994-12-31 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q_rel_union" ->
      """SELECT count(*) AS distinct_users FROM (
        |  SELECT DISTINCT user_id FROM (
        |    SELECT user_id FROM events WHERE event_type = 'click'
        |    UNION ALL
        |    SELECT user_id FROM events WHERE event_type = 'purchase') u) v""".stripMargin,
    "q_rel_window" ->
      """SELECT o_orderpriority, count(*) AS first_order_cnt FROM (
        |  SELECT o_orderpriority,
        |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders) t WHERE rn = 1
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_stream_slo" ->
      """SELECT CAST(epoch_ms(date_trunc('hour', ts)) AS BIGINT) AS hour_ms,
        |       event_type, count(*) AS n, true AS burn_ok
        |FROM events WHERE ts IS NOT NULL
        |GROUP BY 1, 2 ORDER BY hour_ms, event_type""".stripMargin,
    // sliding windows replay via the events × range(1, 9) expansion:
    // ends e = floor(ms/slide)*slide + k*slide, k = 1..long/slide are
    // exactly the windows containing ms (epoch-aligned, slide | long)
    "q_stream_slo_multi" ->
      """WITH e AS (SELECT epoch_ms(ts) AS ms, event_type FROM events
        |           WHERE ts IS NOT NULL),
        |w AS (SELECT (ms // 21600000 + k) * 21600000 AS end_ms, event_type, ms
        |      FROM e CROSS JOIN range(1, 9) r(k)),
        |g AS (SELECT end_ms, event_type,
        |             sum(CASE WHEN ms >= end_ms - 21600000 THEN 1 ELSE 0 END) AS ns,
        |             count(*) AS nl
        |      FROM w GROUP BY 1, 2)
        |SELECT CAST(end_ms AS BIGINT) AS end_ms, event_type,
        |       CAST(ns AS BIGINT) AS n_short, CAST(nl AS BIGINT) AS n_long,
        |       true AS burn_short_ok, true AS burn_long_ok, true AS alert_ok
        |FROM g ORDER BY end_ms, event_type""".stripMargin,
    "q_stream_drift" ->
      """WITH pool AS (
        |  SELECT date_trunc('hour', ts) AS h, value AS v FROM events
        |  WHERE value IS NOT NULL AND NOT isnan(value) AND ts IS NOT NULL),
        |bb AS (SELECT h, CASE WHEN v <= 10.0 THEN 0 WHEN v <= 25.0 THEN 1
        |                      WHEN v <= 50.0 THEN 2 WHEN v <= 100.0 THEN 3
        |                      WHEN v <= 250.0 THEN 4 ELSE 5 END AS bin FROM pool),
        |hours AS (SELECT DISTINCT h FROM bb),
        |grid AS (SELECT h, i AS bin FROM hours CROSS JOIN range(0, 6) r(i)),
        |g AS (SELECT h, bin, count(*) AS c FROM bb GROUP BY 1, 2),
        |f AS (SELECT grid.h, grid.bin, CAST(coalesce(g.c, 0) AS DOUBLE) AS c
        |      FROM grid LEFT JOIN g ON g.h = grid.h AND g.bin = grid.bin),
        |t AS (SELECT h, sum(c) AS n FROM f GROUP BY 1),
        |rg AS (SELECT bin, CAST(count(*) AS DOUBLE) AS rc FROM bb GROUP BY 1),
        |rf AS (SELECT i AS bin, CAST(coalesce(rc, 0) AS DOUBLE) AS rc
        |       FROM range(0, 6) r(i) LEFT JOIN rg ON rg.bin = r.i),
        |rt AS (SELECT sum(rc) AS nr FROM rf)
        |SELECT CAST(epoch_ms(f.h) AS BIGINT) AS hour_ms,
        |       CAST(t.n AS BIGINT) AS n,
        |       round(sum(((f.c + 1)/(t.n + 6) - (rf.rc + 1)/(rt.nr + 6)) *
        |                 ln(((f.c + 1)/(t.n + 6)) /
        |                    ((rf.rc + 1)/(rt.nr + 6)))), 4) AS psi
        |FROM f JOIN t ON f.h = t.h JOIN rf ON f.bin = rf.bin CROSS JOIN rt
        |GROUP BY 1, t.n
        |ORDER BY hour_ms""".stripMargin,
    "q_stream_frequency" ->
      """WITH e AS (SELECT epoch_ms(ts) // 14400000 AS h, event_type, user_id
        |           FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
        |g AS (SELECT h, event_type, user_id, count(*) AS c
        |      FROM e GROUP BY 1, 2, 3)
        |SELECT CAST(h * 14400000 AS BIGINT) AS hour_ms, event_type,
        |       CAST(sum(c) AS BIGINT) AS total,
        |       CAST(max(c) AS BIGINT) AS top1_cnt
        |FROM g GROUP BY 1, 2 ORDER BY hour_ms, event_type""".stripMargin,
    "q_stream_running" ->
      """SELECT CAST(user_id AS VARCHAR) AS key,
        |       count(value) AS n, true AS p50_ok
        |FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
        |GROUP BY user_id ORDER BY key""".stripMargin,
    // session_window's boundary: a gap of EXACTLY the duration starts
    // a new session (window end is exclusive) — hence >= , where the
    // batch Sessionize oracle uses >
    "q_stream_session" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ms FROM events
        |           WHERE ts IS NOT NULL),
        |l AS (SELECT user_id, ms,
        |             lag(ms) OVER (PARTITION BY user_id ORDER BY ms) AS prev FROM e),
        |f AS (SELECT user_id, ms,
        |             CASE WHEN prev IS NULL OR ms - prev >= 1800000 THEN 1 ELSE 0 END AS ns FROM l),
        |s AS (SELECT user_id, ms,
        |             sum(ns) OVER (PARTITION BY user_id ORDER BY ms
        |                           ROWS UNBOUNDED PRECEDING) AS sid FROM f),
        |g AS (SELECT user_id, sid, count(*) AS ev, max(ms) - min(ms) AS span
        |      FROM s GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_sessions, CAST(sum(ev) AS BIGINT) AS n_events,
        |       CAST(max(ev) AS BIGINT) AS max_session_events,
        |       CAST(sum(span) AS BIGINT) AS total_span_ms
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_stream_embed_dedup" ->
      """SELECT vec_id + 100000 AS id_new, vec_id AS id_old, true AS cos_ok
        |FROM embeddings WHERE vec_id < 50 ORDER BY id_new""".stripMargin,
    "q_stream_latest" ->
      """SELECT user_id, CAST(epoch_ms(ts) AS BIGINT) AS ts_ms, event_id,
        |       event_type, value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    // NULL values: concat_ws skips them, and DuckDB's DISTINCT also
    // collapses NULL into one group per (user, type) — consistent
    "q_stream_dedup" ->
      """SELECT count(*) AS n_unique FROM (
        |  SELECT DISTINCT user_id, event_type, value
        |  FROM events WHERE ts IS NOT NULL)""".stripMargin,
    "q_stream_stats" ->
      """SELECT CAST(epoch_ms(date_trunc('hour', ts)) AS BIGINT) AS hour_ms,
        |       event_type, count(value) AS cnt,
        |       min(value) AS vmin, max(value) AS vmax, true AS p50_ok
        |FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
        |GROUP BY 1, 2 ORDER BY hour_ms, event_type""".stripMargin,
    // the sketch counts only non-null values, so the oracle counts
    // `value` (not *); null event times are filtered on both sides
    "q_stream_rollup" ->
      """SELECT CAST(epoch_ms(date_trunc('hour', ts)) AS BIGINT) AS hour_ms,
        |       event_type, count(value) AS cnt, true AS p50_ok
        |FROM events WHERE ts IS NOT NULL
        |GROUP BY 1, 2 ORDER BY hour_ms, event_type""".stripMargin,
    "q_rel_timebucket" ->
      """SELECT CAST(epoch_ms(date_trunc('hour', ts)) AS BIGINT) AS hour_ms,
        |       event_type, count(*) AS cnt
        |FROM events GROUP BY 1, 2 ORDER BY hour_ms, event_type""".stripMargin,
    "q_rel_asof" ->
      """WITH clicks AS (
        |  SELECT user_id, epoch_ms(ts) AS ms FROM events WHERE event_type = 'click'),
        |purchases AS (
        |  SELECT user_id, epoch_ms(ts) AS ms, max(value) AS purchase_value
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT ms // 86400000 AS day, count(*) AS clicks,
        |       count(purchase_value) AS matched,
        |       CAST(round(sum(purchase_value) * 100, 0) AS BIGINT) AS cents
        |FROM (SELECT c.ms, p.purchase_value
        |      FROM clicks c ASOF LEFT JOIN purchases p
        |        ON c.user_id = p.user_id AND c.ms >= p.ms) t
        |GROUP BY 1 ORDER BY day""".stripMargin,
    "q_rel_asof_salted" ->
      """WITH clicks AS (
        |  SELECT user_id, epoch_ms(ts) AS ms FROM events WHERE event_type = 'click'),
        |purchases AS (
        |  SELECT user_id, epoch_ms(ts) AS ms, max(value) AS purchase_value
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT ms // 86400000 AS day, count(*) AS clicks,
        |       count(purchase_value) AS matched,
        |       CAST(round(sum(purchase_value) * 100, 0) AS BIGINT) AS cents
        |FROM (SELECT c.ms, p.purchase_value
        |      FROM clicks c ASOF LEFT JOIN purchases p
        |        ON c.user_id = p.user_id AND c.ms >= p.ms) t
        |GROUP BY 1 ORDER BY day""".stripMargin,
    "q_rel_interval" ->
      """WITH iv AS (SELECT o_orderkey,
        |              CAST(floor(o_totalprice) AS BIGINT) - 500 AS lo,
        |              CAST(floor(o_totalprice) AS BIGINT) AS hi
        |            FROM orders WHERE o_orderkey % 50 = 0),
        |pt AS (SELECT l_orderkey, CAST(floor(l_extendedprice) AS BIGINT) AS p
        |       FROM lineitem WHERE l_orderkey % 20 = 0)
        |SELECT CAST(count(*) AS BIGINT) AS matches,
        |       CAST(coalesce(sum(l_orderkey * o_orderkey), 0) AS BIGINT) AS pair_sum
        |FROM pt JOIN iv ON p >= lo AND p <= hi""".stripMargin,
    "q_rel_range" ->
      """WITH clicks AS (
        |  SELECT user_id, epoch_ms(ts) AS ms FROM events WHERE event_type = 'click'),
        |purchases AS (
        |  SELECT user_id, epoch_ms(ts) AS pms, value
        |  FROM events WHERE event_type = 'purchase')
        |SELECT ms // 86400000 AS day, count(*) AS pairs,
        |       CAST(round(sum(value) * 100, 0) AS BIGINT) AS cents
        |FROM clicks c JOIN purchases p
        |  ON c.user_id = p.user_id AND abs(c.ms - p.pms) <= 600000
        |GROUP BY 1 ORDER BY day""".stripMargin,
    "q_rel_session" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ms FROM events),
        |l AS (SELECT user_id, ms,
        |             lag(ms) OVER (PARTITION BY user_id ORDER BY ms) AS prev FROM e),
        |f AS (SELECT user_id, ms,
        |             CASE WHEN prev IS NULL OR ms - prev > 1800000 THEN 1 ELSE 0 END AS ns FROM l),
        |s AS (SELECT user_id, ms,
        |             sum(ns) OVER (PARTITION BY user_id ORDER BY ms
        |                           ROWS UNBOUNDED PRECEDING) AS sid FROM f),
        |g AS (SELECT user_id, sid, count(*) AS ev, max(ms) - min(ms) AS span
        |      FROM s GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_sessions, CAST(sum(ev) AS BIGINT) AS n_events,
        |       CAST(max(ev) AS BIGINT) AS max_session_events,
        |       CAST(sum(span) AS BIGINT) AS total_span_ms
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_rel_session_bucketed" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ms FROM events),
        |l AS (SELECT user_id, ms,
        |             lag(ms) OVER (PARTITION BY user_id ORDER BY ms) AS prev FROM e),
        |f AS (SELECT user_id, ms,
        |             CASE WHEN prev IS NULL OR ms - prev > 1800000 THEN 1 ELSE 0 END AS ns FROM l),
        |s AS (SELECT user_id, ms,
        |             sum(ns) OVER (PARTITION BY user_id ORDER BY ms
        |                           ROWS UNBOUNDED PRECEDING) AS sid FROM f),
        |g AS (SELECT user_id, sid, count(*) AS ev, max(ms) - min(ms) AS span
        |      FROM s GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_sessions, CAST(sum(ev) AS BIGINT) AS n_events,
        |       CAST(max(ev) AS BIGINT) AS max_session_events,
        |       CAST(sum(span) AS BIGINT) AS total_span_ms
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_rel_sql" ->
      """WITH thresholds AS (SELECT avg(o_totalprice) AS avg_price FROM orders)
        |SELECT o_orderpriority, count(*) AS cnt
        |FROM orders
        |WHERE o_totalprice > (SELECT avg_price FROM thresholds)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_sketch_sink" ->
      """SELECT event_type, count(*) AS cnt, true AS size_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_kmv_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_distinct, true AS est_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_kmv_overlap" ->
      """SELECT count(*) AS exact_inter, true AS jaccard_ok FROM (
        |  SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
        |  INTERSECT
        |  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase') t""".stripMargin,
    "q_bloom" ->
      """WITH build AS (SELECT DISTINCT user_id FROM events
        |               WHERE event_type = 'click' AND user_id % 3 = 0),
        |probe AS (SELECT DISTINCT user_id FROM events)
        |SELECT count(*) AS probed,
        |  CAST(count(*) FILTER (user_id IN (SELECT user_id FROM build)) AS BIGINT) AS present,
        |  true AS no_false_negatives, true AS fp_bounded, true AS paths_agree
        |FROM probe""".stripMargin,
    "q_quantile_buckets" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS cnt, true AS balanced_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_zorder" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows, CAST(sum(event_id) AS BIGINT) AS id_sum,
        |       true AS locality_ok
        |FROM events""".stripMargin,
    "q_retention" ->
      """WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |coh AS (SELECT user_id, min(d) AS c FROM act GROUP BY user_id)
        |SELECT c AS cohort_day, CAST(d - c AS BIGINT) AS day_offset,
        |       CAST(count(*) AS BIGINT) AS users
        |FROM act JOIN coh USING (user_id)
        |WHERE d - c <= 14
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_funnel" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS tm, event_type FROM events),
        |s1 AS (SELECT user_id, min(tm) AS t1 FROM e
        |       WHERE event_type = 'view' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(tm) AS t2 FROM e JOIN s1 USING (user_id)
        |       WHERE event_type = 'click' AND tm > t1
        |         AND tm - t1 <= 86400000 GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(tm) AS t3 FROM e JOIN s2 USING (user_id)
        |       JOIN s1 USING (user_id)
        |       WHERE event_type = 'purchase' AND tm > t2
        |         AND tm - t1 <= 86400000 GROUP BY e.user_id),
        |per AS (SELECT u.user_id,
        |          CASE WHEN s3.user_id IS NOT NULL THEN 3
        |               WHEN s2.user_id IS NOT NULL THEN 2
        |               WHEN s1.user_id IS NOT NULL THEN 1
        |               ELSE 0 END AS steps_completed
        |        FROM (SELECT DISTINCT user_id FROM e) u
        |        LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
        |        LEFT JOIN s3 USING (user_id))
        |SELECT CAST(steps_completed AS BIGINT) AS steps_completed,
        |       CAST(count(*) AS BIGINT) AS users
        |FROM per GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_hll_distinct" ->
      """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        |       true AS est_ok, true AS global_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_cms" ->
      """SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS probed,
        |       CAST(count(*) AS BIGINT) AS total,
        |       true AS no_undercount, true AS overcount_bounded
        |FROM events""".stripMargin,
    "q_dedup_exact" ->
      """SELECT count(*) AS total, count(DISTINCT text) AS distinct_docs,
        |       count(DISTINCT text) AS kept FROM documents""".stripMargin,
    "q_shard_bytes" ->
      """WITH d AS (SELECT doc_id, CAST(strlen(text) AS BIGINT) AS b
        |           FROM documents WHERE text IS NOT NULL),
        |c AS (SELECT doc_id, b,
        |             coalesce(sum(b) OVER (ORDER BY doc_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS excl
        |      FROM d)
        |SELECT CAST(excl // 20000 AS INT) AS shard, count(*) AS docs,
        |       CAST(sum(b) AS BIGINT) AS bytes, true AS routed_ok
        |FROM c GROUP BY 1 ORDER BY shard""".stripMargin,
    "q_dedup_minhash" ->
      """WITH sh AS (SELECT DISTINCT doc_id, substr(text, r.i, 5) AS g
        |            FROM documents, range(1, 1000) r(i) WHERE r.i + 4 <= length(text)),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
        |pairs AS (SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS inter
        |          FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT ida AS id_a, idb AS id_b
        |FROM pairs JOIN sizes sa ON ida = sa.doc_id JOIN sizes sb ON idb = sb.doc_id
        |WHERE inter >= (sa.sz + sb.sz - inter) * 0.8
        |ORDER BY id_a, id_b""".stripMargin,
    "q_dedup_incremental" ->
      """WITH sh AS (SELECT DISTINCT doc_id, substr(text, r.i, 5) AS g
        |            FROM documents, range(1, 1000) r(i) WHERE r.i + 4 <= length(text)),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
        |pairs AS (SELECT n.doc_id AS idn, o.doc_id AS ido, count(*) AS inter
        |          FROM sh n JOIN sh o ON n.g = o.g
        |          WHERE n.doc_id % 3 = 0 AND o.doc_id % 3 <> 0 GROUP BY 1, 2)
        |SELECT idn AS id_new, ido AS id_old, CAST(inter AS BIGINT) AS inter,
        |       CAST(sa.sz + sb.sz - inter AS BIGINT) AS uni
        |FROM pairs JOIN sizes sa ON idn = sa.doc_id JOIN sizes sb ON ido = sb.doc_id
        |WHERE inter >= (sa.sz + sb.sz - inter) * 0.8
        |ORDER BY id_new, id_old""".stripMargin,
    "q_dedup_clusters" ->
      """WITH RECURSIVE
        |sh AS (SELECT DISTINCT doc_id, substr(text, r.i, 5) AS g
        |       FROM documents, range(1, 1000) r(i) WHERE r.i + 4 <= length(text)),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
        |cand AS (SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS inter
        |         FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |p AS (SELECT ida, idb
        |      FROM cand JOIN sizes sa ON ida = sa.doc_id JOIN sizes sb ON idb = sb.doc_id
        |      WHERE inter >= (sa.sz + sb.sz - inter) * 0.8),
        |e AS (SELECT ida AS a, idb AS b FROM p UNION SELECT idb, ida FROM p),
        |n AS (SELECT DISTINCT a AS id FROM e),
        |reach(src, dst) AS (
        |  SELECT id, id FROM n
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN e ON r.dst = e.a
        |)
        |SELECT dst AS doc_id, CAST(min(src) AS BIGINT) AS cluster
        |FROM reach GROUP BY dst ORDER BY doc_id""".stripMargin,
    "q_dedup_downweight" ->
      """WITH RECURSIVE
        |sh AS (SELECT DISTINCT doc_id, substr(text, r.i, 5) AS g
        |       FROM documents, range(1, 1000) r(i) WHERE r.i + 4 <= length(text)),
        |szs AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
        |cand AS (SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS inter
        |         FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |p AS (SELECT ida, idb
        |      FROM cand JOIN szs sa ON ida = sa.doc_id JOIN szs sb ON idb = sb.doc_id
        |      WHERE inter >= (sa.sz + sb.sz - inter) * 0.8),
        |e AS (SELECT ida AS a, idb AS b FROM p UNION SELECT idb, ida FROM p),
        |n AS (SELECT DISTINCT a AS id FROM e),
        |reach(src, dst) AS (
        |  SELECT id, id FROM n
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN e ON r.dst = e.a
        |),
        |cl AS (SELECT dst AS doc_id, min(src) AS cluster FROM reach GROUP BY dst),
        |cs AS (SELECT cluster, CAST(count(*) AS DOUBLE) AS csz FROM cl GROUP BY cluster),
        |wd AS (SELECT d.doc_id, cs.csz
        |       FROM documents d LEFT JOIN cl ON d.doc_id = cl.doc_id
        |                        LEFT JOIN cs ON cl.cluster = cs.cluster)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id FROM wd
        |WHERE csz IS NULL
        |   OR substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
        |        < printf('%04x', CAST(round(65536.0 / csz) AS INT))
        |ORDER BY doc_id""".stripMargin,
    "q_dedup_url" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |       CASE WHEN doc_id % 3 = 0 THEN
        |              'https://example.com/p/' || CAST(doc_id // 3 AS VARCHAR)
        |                || '?a=1&b=2'
        |            WHEN doc_id % 3 = 2 THEN
        |              'http://other.org/q/' || CAST(doc_id AS VARCHAR)
        |       END AS curl
        |FROM documents
        |WHERE doc_id % 3 <> 1
        |ORDER BY doc_id""".stripMargin,
    "q_dedup_ngram" ->
      """WITH sh AS (SELECT DISTINCT doc_id, substr(text, r.i, 5) AS g
        |            FROM documents, range(1, 1000) r(i) WHERE r.i + 4 <= length(text)),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
        |pairs AS (SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS inter
        |          FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT ida AS id_a, idb AS id_b, inter,
        |       sa.sz + sb.sz - inter AS uni
        |FROM pairs JOIN sizes sa ON ida = sa.doc_id JOIN sizes sb ON idb = sb.doc_id
        |WHERE inter >= (sa.sz + sb.sz - inter) * 0.8
        |ORDER BY id_a, id_b""".stripMargin,
    "q_dedup_drop" ->
      """WITH sh AS (SELECT DISTINCT doc_id, substr(text, r.i, 5) AS g
        |            FROM documents, range(1, 1000) r(i) WHERE r.i + 4 <= length(text)),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
        |pairs AS (SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS inter
        |          FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |removed AS (SELECT DISTINCT idb AS doc_id
        |            FROM pairs JOIN sizes sa ON ida = sa.doc_id
        |                       JOIN sizes sb ON idb = sb.doc_id
        |            WHERE inter >= (sa.sz + sb.sz - inter) * 0.8)
        |SELECT count(*) AS kept, CAST(sum(doc_id) AS BIGINT) AS kept_id_sum
        |FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM removed)""".stripMargin,
    "q_dedup_jaccard_join" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 100000, text || ' zzextranew'
        |  FROM documents WHERE doc_id % 7 = 0),
        |tk AS (SELECT DISTINCT doc_id, tok FROM (
        |         SELECT doc_id,
        |                unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
        |         FROM corpus) WHERE tok <> ''),
        |sz AS (SELECT doc_id, count(*) AS sz FROM tk GROUP BY 1),
        |pairs AS (SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS inter
        |          FROM tk a JOIN tk b ON a.tok = b.tok AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2)
        |SELECT ida AS id_a, idb AS id_b, CAST(inter AS BIGINT) AS inter,
        |       CAST(sa.sz + sb.sz - inter AS BIGINT) AS uni
        |FROM pairs JOIN sz sa ON ida = sa.doc_id JOIN sz sb ON idb = sb.doc_id
        |WHERE inter >= (sa.sz + sb.sz - inter) * 0.8
        |ORDER BY id_a, id_b""".stripMargin,
    "q_dedup_minhash_auto" ->
      """WITH sh AS (SELECT DISTINCT doc_id, substr(text, r.i, 5) AS g
        |            FROM documents, range(1, 1000) r(i) WHERE r.i + 4 <= length(text)),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
        |pairs AS (SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS inter
        |          FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT ida AS id_a, idb AS id_b
        |FROM pairs JOIN sizes sa ON ida = sa.doc_id JOIN sizes sb ON idb = sb.doc_id
        |WHERE inter >= (sa.sz + sb.sz - inter) * 0.8
        |ORDER BY id_a, id_b""".stripMargin,
    "q_drift_ks" ->
      """WITH pool AS (
        |  SELECT value AS v,
        |         CASE WHEN event_type IN ('click','view') THEN 1 ELSE 0 END AS sa,
        |         CASE WHEN event_type IN ('purchase','error') THEN 1 ELSE 0 END AS sb
        |  FROM events
        |  WHERE event_type IN ('click','view','purchase','error')
        |    AND value IS NOT NULL AND NOT isnan(value)),
        |u AS (SELECT v, CAST(sum(sa) AS BIGINT) AS ca, CAST(sum(sb) AS BIGINT) AS cb
        |      FROM pool GROUP BY v),
        |t AS (SELECT CAST(sum(sa) AS BIGINT) AS na, CAST(sum(sb) AS BIGINT) AS nb
        |      FROM pool),
        |c AS (SELECT CAST(sum(ca) OVER (ORDER BY v) AS BIGINT) AS fa,
        |             CAST(sum(cb) OVER (ORDER BY v) AS BIGINT) AS fb FROM u)
        |SELECT CAST(max(abs(fa * t.nb - fb * t.na)) AS BIGINT) AS d_num,
        |       t.na AS n_a, t.nb AS n_b,
        |       CAST(max(abs(fa * t.nb - fb * t.na)) AS DOUBLE) /
        |         CAST(t.na * t.nb AS DOUBLE) AS d
        |FROM c, t GROUP BY t.na, t.nb""".stripMargin,
    "q_drift_ks_sketch" -> "SELECT true AS within_tol",
    "q_drift_psi_bins" ->
      """WITH pool AS (
        |  SELECT value AS v,
        |         CASE WHEN event_type IN ('click','view') THEN 1 ELSE 0 END AS sa,
        |         CASE WHEN event_type IN ('purchase','error') THEN 1 ELSE 0 END AS sb
        |  FROM events
        |  WHERE event_type IN ('click','view','purchase','error')
        |    AND value IS NOT NULL AND NOT isnan(value)),
        |b AS (SELECT CASE WHEN v <= 10.0 THEN 0 WHEN v <= 25.0 THEN 1
        |                  WHEN v <= 50.0 THEN 2 WHEN v <= 100.0 THEN 3
        |                  WHEN v <= 250.0 THEN 4 ELSE 5 END AS bin, sa, sb FROM pool),
        |g AS (SELECT bin, CAST(sum(sa) AS BIGINT) AS count_a,
        |             CAST(sum(sb) AS BIGINT) AS count_b FROM b GROUP BY 1)
        |SELECT CAST(r.i AS INTEGER) AS bin,
        |       coalesce(count_a, CAST(0 AS BIGINT)) AS count_a,
        |       coalesce(count_b, CAST(0 AS BIGINT)) AS count_b
        |FROM range(0, 6) r(i) LEFT JOIN g ON g.bin = r.i
        |ORDER BY bin""".stripMargin,
    "q_drift_psi" ->
      """WITH pool AS (
        |  SELECT value AS v,
        |         CASE WHEN event_type IN ('click','view') THEN 1 ELSE 0 END AS sa,
        |         CASE WHEN event_type IN ('purchase','error') THEN 1 ELSE 0 END AS sb
        |  FROM events
        |  WHERE event_type IN ('click','view','purchase','error')
        |    AND value IS NOT NULL AND NOT isnan(value)),
        |bb AS (SELECT CASE WHEN v <= 10.0 THEN 0 WHEN v <= 25.0 THEN 1
        |                   WHEN v <= 50.0 THEN 2 WHEN v <= 100.0 THEN 3
        |                   WHEN v <= 250.0 THEN 4 ELSE 5 END AS bin, sa, sb FROM pool),
        |g AS (SELECT bin, sum(sa) AS count_a, sum(sb) AS count_b FROM bb GROUP BY 1),
        |f AS (SELECT CAST(coalesce(count_a, 0) AS DOUBLE) AS ca,
        |             CAST(coalesce(count_b, 0) AS DOUBLE) AS cb
        |      FROM range(0, 6) r(i) LEFT JOIN g ON g.bin = r.i),
        |t AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM f)
        |SELECT round(sum(((ca + 1)/(na + 6) - (cb + 1)/(nb + 6)) *
        |                 ln(((ca + 1)/(na + 6)) / ((cb + 1)/(nb + 6)))), 4) AS psi
        |FROM f, t""".stripMargin,
    "q_drift_chi2" ->
      """WITH pool AS (
        |  SELECT event_type AS category,
        |         CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS sa,
        |         CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END AS sb
        |  FROM events WHERE event_type IS NOT NULL AND user_id IS NOT NULL),
        |g AS (SELECT category, CAST(sum(sa) AS BIGINT) AS count_a,
        |             CAST(sum(sb) AS BIGINT) AS count_b FROM pool GROUP BY 1),
        |t AS (SELECT CAST(sum(count_a) AS BIGINT) AS na,
        |             CAST(sum(count_b) AS BIGINT) AS nb FROM g),
        |e AS (SELECT category, count_a, count_b,
        |        CAST(count_a + count_b AS DOUBLE) * CAST(na AS DOUBLE) /
        |          CAST(na + nb AS DOUBLE) AS ea,
        |        CAST(count_a + count_b AS DOUBLE) * CAST(nb AS DOUBLE) /
        |          CAST(na + nb AS DOUBLE) AS eb
        |      FROM g, t)
        |SELECT category, count_a, count_b,
        |       CASE WHEN ea > 0 AND eb > 0 THEN
        |         round((count_a - ea)*(count_a - ea)/ea +
        |               (count_b - eb)*(count_b - eb)/eb, 4) END AS contrib
        |FROM e ORDER BY category""".stripMargin,
    "q_pack_stream" ->
      """WITH d AS (SELECT doc_id,
        |             CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
        |                                  x -> x <> '')) AS BIGINT) AS n
        |           FROM documents WHERE text IS NOT NULL),
        |o AS (SELECT doc_id, n,
        |        CAST(coalesce(sum(n + 1) OVER (ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |          AS off
        |      FROM d),
        |s AS (SELECT off, n,
        |        unnest(generate_series(off // 256, (off + n) // 256)) AS seq_id
        |      FROM o)
        |SELECT seq_id, count(*) AS n_docs,
        |       CAST(sum(least((seq_id+1)*256 - 1, off + n) -
        |                greatest(seq_id*256, off) + 1) AS BIGINT) AS n_tokens
        |FROM s GROUP BY 1 ORDER BY seq_id""".stripMargin,
    "q_pack_spans" ->
      """WITH d AS (SELECT doc_id,
        |             CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
        |                                  x -> x <> '')) AS BIGINT) AS n
        |           FROM documents WHERE text IS NOT NULL),
        |o AS (SELECT doc_id, n,
        |        CAST(coalesce(sum(n + 1) OVER (ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |          AS off
        |      FROM d),
        |s AS (SELECT doc_id, off, n,
        |        unnest(generate_series(off // 256, (off + n) // 256)) AS seq_id
        |      FROM o),
        |sp AS (SELECT doc_id, seq_id,
        |         greatest(seq_id*256, off) AS st,
        |         least((seq_id+1)*256 - 1, off + n) AS en
        |       FROM s)
        |SELECT seq_id, count(*) AS n_docs,
        |       CAST(sum(en - st + 1) AS BIGINT) AS cells,
        |       CAST(sum(doc_id * (en - st + 1)) AS BIGINT) AS id_dot,
        |       true AS tiles_ok
        |FROM sp GROUP BY seq_id ORDER BY seq_id""".stripMargin,
    "q_pack_ids" ->
      """WITH d AS (SELECT doc_id, list_append(
        |             list_transform(
        |               list_filter(regexp_split_to_array(text, '\s+'), x -> x <> ''),
        |               x -> CAST(length(x) AS INTEGER)), 0) AS ids
        |           FROM documents WHERE text IS NOT NULL),
        |o AS (SELECT doc_id, ids,
        |        CAST(coalesce(sum(len(ids)) OVER (ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |          AS off
        |      FROM d),
        |p AS (SELECT off, ids,
        |        unnest(generate_series(CAST(1 AS BIGINT),
        |                               CAST(len(ids) AS BIGINT))) AS i
        |      FROM o),
        |t AS (SELECT (off + i - 1) // 128 AS seq_id, ids[i] AS tok FROM p)
        |SELECT seq_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |       CAST(sum(tok) AS BIGINT) AS id_sum
        |FROM t GROUP BY 1 ORDER BY seq_id""".stripMargin,
    "q_dedup_substring" ->
      """WITH d AS (SELECT doc_id,
        |             list_filter(string_split_regex(text, '\s+'), s -> len(s) > 0) AS toks
        |           FROM documents WHERE text IS NOT NULL),
        |g AS (SELECT doc_id, i AS s, i + 7 AS e, array_to_string(toks[i:i+7], ' ') AS gram
        |      FROM d, range(1, 4000) u(i) WHERE u.i <= len(toks) - 7),
        |dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
        |m AS (SELECT g.doc_id, g.s, g.e FROM g JOIN dup USING (gram)),
        |o AS (SELECT doc_id, s, e,
        |             max(e) OVER (PARTITION BY doc_id ORDER BY s, e
        |                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |      FROM m),
        |isl AS (SELECT doc_id, s, e,
        |               sum(CASE WHEN pmax IS NULL OR s > pmax + 1 THEN 1 ELSE 0 END)
        |                 OVER (PARTITION BY doc_id ORDER BY s, e) AS grp
        |        FROM o),
        |spans AS (SELECT doc_id, min(s) AS ss, max(e) AS se FROM isl GROUP BY doc_id, grp)
        |SELECT doc_id, CAST(ss AS BIGINT) AS span_start, CAST(se AS BIGINT) AS span_end
        |FROM spans ORDER BY doc_id, span_start""".stripMargin,
    "q_dedup_spans_long" ->
      """WITH c AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL
        |           UNION ALL
        |           SELECT doc_id + 200000, text FROM documents
        |           WHERE text IS NOT NULL AND doc_id % 13 = 0),
        |d AS (SELECT doc_id,
        |        list_filter(string_split_regex(text, '\s+'), s -> len(s) > 0) AS toks
        |      FROM c),
        |g AS (SELECT doc_id, i AS s, i + 23 AS e,
        |             array_to_string(toks[i:i+23], ' ') AS gram
        |      FROM d, range(1, 4000) u(i) WHERE u.i <= len(toks) - 23),
        |dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
        |m AS (SELECT g.doc_id, g.s, g.e FROM g JOIN dup USING (gram)),
        |o AS (SELECT doc_id, s, e,
        |             max(e) OVER (PARTITION BY doc_id ORDER BY s, e
        |                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |      FROM m),
        |isl AS (SELECT doc_id, s, e,
        |               sum(CASE WHEN pmax IS NULL OR s > pmax + 1 THEN 1 ELSE 0 END)
        |                 OVER (PARTITION BY doc_id ORDER BY s, e) AS grp FROM o),
        |spans AS (SELECT doc_id, min(s) AS ss, max(e) AS se FROM isl GROUP BY doc_id, grp)
        |SELECT doc_id, CAST(ss AS BIGINT) AS span_start, CAST(se AS BIGINT) AS span_end
        |FROM spans ORDER BY doc_id, span_start""".stripMargin,
    "q_dedup_incremental_substring" ->
      """WITH d AS (SELECT doc_id,
        |             list_filter(string_split_regex(text, '\s+'), s -> len(s) > 0) AS toks
        |           FROM documents WHERE text IS NOT NULL),
        |g AS (SELECT doc_id, i AS s, i + 7 AS e, array_to_string(toks[i:i+7], ' ') AS gram
        |      FROM d, range(1, 4000) u(i) WHERE u.i <= len(toks) - 7),
        |fg AS (SELECT doc_id, s, e, gram FROM g WHERE doc_id % 3 = 0),
        |dup AS (SELECT DISTINCT gram FROM g WHERE doc_id % 3 <> 0
        |        UNION
        |        SELECT gram FROM fg GROUP BY gram HAVING count(*) >= 2),
        |m AS (SELECT fg.doc_id, fg.s, fg.e FROM fg JOIN dup USING (gram)),
        |o AS (SELECT doc_id, s, e,
        |             max(e) OVER (PARTITION BY doc_id ORDER BY s, e
        |                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |      FROM m),
        |isl AS (SELECT doc_id, s, e,
        |               sum(CASE WHEN pmax IS NULL OR s > pmax + 1 THEN 1 ELSE 0 END)
        |                 OVER (PARTITION BY doc_id ORDER BY s, e) AS grp FROM o),
        |spans AS (SELECT doc_id, min(s) AS ss, max(e) AS se FROM isl GROUP BY doc_id, grp)
        |SELECT doc_id, CAST(ss AS BIGINT) AS span_start, CAST(se AS BIGINT) AS span_end
        |FROM spans ORDER BY doc_id, span_start""".stripMargin,
    "q_dedup_paragraph" ->
      """WITH d AS (SELECT doc_id,
        |             list_filter(string_split_regex(text, '\s+'), s -> len(s) > 0) AS toks
        |           FROM documents WHERE text IS NOT NULL),
        |d2 AS (SELECT doc_id, toks FROM d WHERE len(toks) >= 1),
        |p AS (SELECT doc_id, u.i AS pi,
        |             array_to_string(toks[(u.i-1)*3+1:(u.i-1)*3+3], ' ') AS para
        |      FROM d2, range(1, 4000) u(i)
        |      WHERE u.i <= CAST(ceil(len(toks) / 3.0) AS INT)),
        |dup AS (SELECT para, min(doc_id*1000000 + pi) AS first
        |        FROM p GROUP BY para HAVING count(*) >= 2),
        |keep AS (SELECT p.doc_id, p.pi, p.para FROM p LEFT JOIN dup USING (para)
        |         WHERE dup.para IS NULL OR p.doc_id*1000000 + p.pi = dup.first),
        |tot AS (SELECT doc_id, count(*) AS total FROM p GROUP BY doc_id),
        |reb AS (SELECT doc_id, count(*) AS kept,
        |               string_agg(para, chr(10) ORDER BY pi) AS text
        |        FROM keep GROUP BY doc_id)
        |SELECT t.doc_id, COALESCE(r.text, '') AS text,
        |       CAST(t.total - COALESCE(r.kept, 0) AS BIGINT) AS paras_removed
        |FROM tot t LEFT JOIN reb r USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin,
    "q_sentences" ->
      """WITH d AS (SELECT doc_id,
        |             list_filter(string_split_regex(
        |               regexp_replace(text, '[.!?]', '', 'g'), '\s+'),
        |               w -> len(w) > 0) AS toks
        |           FROM documents WHERE text IS NOT NULL)
        |SELECT doc_id, CAST(ceil(len(toks) / 5.0) AS BIGINT) AS n_sentences,
        |       true AS rejoin_ok
        |FROM d WHERE len(toks) >= 1 ORDER BY doc_id""".stripMargin,
    "q_embed_whiten" ->
      """SELECT count(*) AS n_vectors, true AS means_zero,
        |       true AS unit_variance, true AS decorrelated
        |FROM embeddings WHERE embedding IS NOT NULL""".stripMargin,
    "q_edit_one" ->
      """SELECT doc_id AS id_a, doc_id + 1000000 AS id_b
        |FROM documents ORDER BY id_a""".stripMargin,
    "q_edit_one_incremental" ->
      """SELECT doc_id + 1000000 AS id_new, doc_id AS id_old
        |FROM documents ORDER BY id_new""".stripMargin,
    "q_edit_k" ->
      """SELECT doc_id AS id_a, doc_id + 1000000 AS id_b
        |FROM documents ORDER BY id_a""".stripMargin,
    "q_edit_k_incremental" ->
      """SELECT doc_id + 1000000 AS id_new, doc_id AS id_old
        |FROM documents ORDER BY id_new""".stripMargin,
    // q_dedup_clusters' recursive components + the md5-range split off
    // the cluster representative (thresholds e666/f333 = round(f*65536)
    // in hex — the Sampling.splitColumn rendering)
    "q_split_leakfree" ->
      """WITH RECURSIVE
        |sh AS (SELECT DISTINCT doc_id, substr(text, r.i, 5) AS g
        |       FROM documents, range(1, 1000) r(i) WHERE r.i + 4 <= length(text)),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
        |cand AS (SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS inter
        |         FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |p AS (SELECT ida, idb
        |      FROM cand JOIN sizes sa ON ida = sa.doc_id JOIN sizes sb ON idb = sb.doc_id
        |      WHERE inter >= (sa.sz + sb.sz - inter) * 0.8),
        |e AS (SELECT ida AS a, idb AS b FROM p UNION SELECT idb, ida FROM p),
        |n AS (SELECT DISTINCT a AS id FROM e),
        |reach(src, dst) AS (
        |  SELECT id, id FROM n
        |  UNION
        |  SELECT r.src, e.b FROM reach r JOIN e ON r.dst = e.a
        |),
        |cl AS (SELECT dst AS doc_id, min(src) AS cluster FROM reach GROUP BY dst),
        |k AS (SELECT d.doc_id, coalesce(cl.cluster, d.doc_id) AS rep
        |      FROM documents d LEFT JOIN cl USING (doc_id)),
        |h AS (SELECT doc_id, substr(md5(CAST(rep AS VARCHAR)), 1, 4) AS hx FROM k)
        |SELECT doc_id, CASE WHEN hx < 'e666' THEN 'train'
        |                    WHEN hx < 'f333' THEN 'val'
        |                    ELSE 'test' END AS split
        |FROM h ORDER BY doc_id""".stripMargin,
    // thresholdHex(0.1) = round(.1*65536) = 6554 = 0x199A (the
    // Sampling.splitColumn rendering)
    "q_canary" ->
      """SELECT doc_id, 'canary' || md5('r9:' || doc_id) AS canary,
        |       doc_id AS source_id
        |FROM documents
        |WHERE text IS NOT NULL
        |  AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '199a'
        |ORDER BY doc_id""".stripMargin,
    "q_split_leakage" ->
      """WITH d AS (SELECT doc_id,
        |             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccd'
        |                  THEN 'train' ELSE 'val' END AS sp,
        |             list_filter(string_split_regex(lower(text), '\s+'),
        |               s -> len(s) > 0) AS toks
        |           FROM documents WHERE text IS NOT NULL),
        |dg AS (SELECT DISTINCT sp, doc_id, array_to_string(toks[i:i+7], ' ') AS gram
        |       FROM d, range(1, 4000) u(i) WHERE u.i <= len(toks) - 7),
        |sg AS (SELECT DISTINCT sp, gram FROM dg),
        |sh AS (SELECT a.sp AS split_a, b.sp AS split_b,
        |              CAST(count(*) AS BIGINT) AS shared_grams
        |       FROM sg a JOIN sg b ON a.gram = b.gram AND a.sp < b.sp
        |       GROUP BY 1, 2),
        |la AS (SELECT sp AS split_a, split_b,
        |              CAST(count(*) AS BIGINT) AS leaked_docs_a FROM (
        |         SELECT DISTINCT dg.sp, b.sp AS split_b, dg.doc_id
        |         FROM dg JOIN sg b ON dg.gram = b.gram AND dg.sp < b.sp)
        |       GROUP BY 1, 2),
        |lb AS (SELECT split_a, sp AS split_b,
        |              CAST(count(*) AS BIGINT) AS leaked_docs_b FROM (
        |         SELECT DISTINCT a.sp AS split_a, dg.sp, dg.doc_id
        |         FROM dg JOIN sg a ON dg.gram = a.gram AND a.sp < dg.sp)
        |       GROUP BY 1, 2)
        |SELECT split_a, split_b, shared_grams, leaked_docs_a, leaked_docs_b
        |FROM sh JOIN la USING (split_a, split_b)
        |        JOIN lb USING (split_a, split_b)
        |ORDER BY split_a, split_b""".stripMargin,
    "q_decontaminate_sources" ->
      """WITH d AS (SELECT doc_id,
        |             list_filter(string_split_regex(lower(text), '\s+'),
        |               s -> len(s) > 0) AS toks
        |           FROM documents WHERE text IS NOT NULL),
        |dg AS (SELECT DISTINCT doc_id, array_to_string(toks[i:i+7], ' ') AS gram
        |       FROM d, range(1, 4000) u(i) WHERE u.i <= len(toks) - 7),
        |bg AS (SELECT doc_id AS bench_id, gram FROM dg WHERE doc_id % 17 = 0)
        |SELECT dg.doc_id, bg.bench_id,
        |       CAST(count(*) AS BIGINT) AS shared_ngrams
        |FROM dg JOIN bg USING (gram)
        |GROUP BY 1, 2
        |ORDER BY doc_id, bench_id""".stripMargin,
    "q_crawl_delay" ->
      """WITH u AS (SELECT doc_id,
        |    'https://host' || (doc_id % 20) || '.example.com/page' || doc_id AS url,
        |    'host' || (doc_id % 20) || '.example.com' AS host,
        |    doc_id % 20 AS h
        |  FROM documents),
        |d AS (SELECT *, CASE WHEN h % 7 = 0 THEN 9000
        |                     WHEN h % 4 = 0 THEN 700
        |                     ELSE (h % 5 + 1) * 1000 END AS delay_ms FROM u),
        |r AS (SELECT *, row_number() OVER (PARTITION BY host ORDER BY url) - 1
        |        AS slot FROM d)
        |SELECT url, host, CAST(slot AS BIGINT) AS slot,
        |       CAST(delay_ms AS BIGINT) AS delay_ms,
        |       CAST(1700000000000 + slot * delay_ms AS BIGINT) AS fetch_at_ms,
        |       CAST(2 AS BIGINT) AS n_sitemaps
        |FROM r ORDER BY url""".stripMargin,
    // hm = src-level exact-Jaccard matches of the copied slice against
    // ALL history (self included, J = 1); reused both for inheritance
    // (via hid) and for the fresh-fresh edge set (hid % 3 = 0)
    "q_split_incremental" ->
      """WITH RECURSIVE
        |d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
        |hsplit AS (SELECT doc_id,
        |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '8000' THEN 'train'
        |       WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'c000' THEN 'val'
        |       ELSE 'test' END AS split FROM d),
        |sh AS (SELECT DISTINCT doc_id, substr(text, r.i, 5) AS g
        |       FROM d, range(1, 1000) r(i) WHERE r.i + 4 <= length(text)),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
        |hc AS (SELECT a.doc_id AS src, b.doc_id AS hid, count(*) AS inter
        |       FROM sh a JOIN sh b ON a.g = b.g
        |       WHERE a.doc_id % 3 = 0 GROUP BY 1, 2),
        |hm AS (SELECT src, hid FROM hc
        |       JOIN sizes sa ON hc.src = sa.doc_id
        |       JOIN sizes sb ON hc.hid = sb.doc_id
        |       WHERE inter >= (sa.sz + sb.sz - inter) * 0.8),
        |inh AS (SELECT src + 500000 AS fid, hsplit.split
        |        FROM hm JOIN hsplit ON hm.hid = hsplit.doc_id GROUP BY 1, 2),
        |fe AS (SELECT src + 500000 AS a, hid + 500000 AS b FROM hm
        |       WHERE hid % 3 = 0 AND src <> hid),
        |n AS (SELECT DISTINCT a AS id FROM fe),
        |reach(src0, dst) AS (
        |  SELECT id, id FROM n
        |  UNION
        |  SELECT r.src0, fe.b FROM reach r JOIN fe ON r.dst = fe.a
        |),
        |rep AS (SELECT dst AS fid, min(src0) AS rp FROM reach GROUP BY dst),
        |allf AS (SELECT doc_id + 500000 AS fid FROM d WHERE doc_id % 3 = 0
        |         UNION ALL
        |         SELECT doc_id + 600000 FROM d WHERE doc_id % 3 = 1),
        |m AS (SELECT allf.fid, coalesce(rep.rp, allf.fid) AS rp
        |      FROM allf LEFT JOIN rep ON allf.fid = rep.fid),
        |cagg AS (SELECT m.rp, count(DISTINCT inh.split) AS nsp,
        |                min(inh.split) AS sp
        |         FROM m LEFT JOIN inh ON inh.fid = m.fid GROUP BY m.rp)
        |SELECT m.fid AS doc_id,
        |  CASE WHEN nsp = 0 THEN
        |         (CASE WHEN substr(md5(CAST(m.rp AS VARCHAR)), 1, 4) < '8000' THEN 'train'
        |               WHEN substr(md5(CAST(m.rp AS VARCHAR)), 1, 4) < 'c000' THEN 'val'
        |               ELSE 'test' END)
        |       WHEN nsp = 1 THEN sp
        |       ELSE 'quarantine' END AS split
        |FROM m JOIN cagg ON m.rp = cagg.rp
        |ORDER BY doc_id""".stripMargin,
    "q_unicode_nfc" ->
      """SELECT doc_id,
        |  nfc_normalize(text || ' e' || chr(769) || ' A' || chr(778)
        |    || ' o' || chr(770)) AS nfc_text,
        |  CAST(length(nfc_normalize(text || ' e' || chr(769) || ' A'
        |    || chr(778) || ' o' || chr(770))) AS BIGINT) AS nfc_chars
        |FROM documents WHERE text IS NOT NULL ORDER BY doc_id""".stripMargin,
    // base-text counts via the same RE2 ranges + planted-suffix
    // constants (6 cyrillic, 5 arabic, 2 cjk, 2 digits) — no unicode
    // literal needs reproducing in SQL
    "q_script_mix" ->
      """WITH b AS (SELECT doc_id, text,
        |             CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS pl
        |           FROM documents WHERE text IS NOT NULL),
        |c AS (SELECT doc_id,
        |  len(regexp_extract_all(text, '[A-Za-z\x{00C0}-\x{024F}]')) AS lat,
        |  len(regexp_extract_all(text, '[\x{0400}-\x{04FF}]')) + 6*pl AS cyr,
        |  len(regexp_extract_all(text, '[\x{0370}-\x{03FF}]')) AS grk,
        |  len(regexp_extract_all(text, '[\x{0600}-\x{06FF}]')) + 5*pl AS ara,
        |  len(regexp_extract_all(text, '[\x{0590}-\x{05FF}]')) AS heb,
        |  len(regexp_extract_all(text, '[\x{0900}-\x{097F}]')) AS dev,
        |  len(regexp_extract_all(text,
        |    '[\x{3040}-\x{30FF}\x{4E00}-\x{9FFF}\x{AC00}-\x{D7AF}]')) + 2*pl AS cjk,
        |  len(regexp_extract_all(text, '[0-9]')) + 2*pl AS dig
        |  FROM b),
        |m AS (SELECT *, greatest(lat, cyr, grk, ara, heb, dev, cjk) AS mx FROM c)
        |SELECT doc_id, CAST(lat AS BIGINT) AS latin, CAST(cyr AS BIGINT) AS cyrillic,
        |       CAST(ara AS BIGINT) AS arabic, CAST(cjk AS BIGINT) AS cjk,
        |       CAST(dig AS BIGINT) AS digits,
        |       CASE WHEN mx = 0 THEN 'und'
        |            WHEN lat = mx THEN 'latin' WHEN cyr = mx THEN 'cyrillic'
        |            WHEN grk = mx THEN 'greek' WHEN ara = mx THEN 'arabic'
        |            WHEN heb = mx THEN 'hebrew' WHEN dev = mx THEN 'devanagari'
        |            ELSE 'cjk' END AS dominant,
        |       (CASE WHEN lat > 0 THEN 1 ELSE 0 END +
        |        CASE WHEN cyr > 0 THEN 1 ELSE 0 END +
        |        CASE WHEN grk > 0 THEN 1 ELSE 0 END +
        |        CASE WHEN ara > 0 THEN 1 ELSE 0 END +
        |        CASE WHEN heb > 0 THEN 1 ELSE 0 END +
        |        CASE WHEN dev > 0 THEN 1 ELSE 0 END +
        |        CASE WHEN cjk > 0 THEN 1 ELSE 0 END) > 1 AS mixed
        |FROM m ORDER BY doc_id""".stripMargin,
    // every field re-derived from doc_id arithmetic — incl. the
    // DECODED &amp; in the loc, which only a real parser reproduces
    "q_sitemap" ->
      """SELECT doc_id, CAST(u.e AS BIGINT) AS entry,
        |       CASE WHEN u.e = 1
        |            THEN 'https://host' || (doc_id % 20) || '.example.com/page'
        |                 || doc_id || '?a=1&b=2'
        |            ELSE 'https://extra/page' || doc_id || 'b' END AS loc,
        |       CASE WHEN u.e = 1
        |            THEN '2026-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
        |            END AS lastmod,
        |       CASE WHEN u.e = 1 THEN 'daily' END AS changefreq,
        |       CASE WHEN u.e = 1 THEN (doc_id % 10) / 10.0 END AS priority,
        |       CAST(2 AS BIGINT) AS n_children
        |FROM documents CROSS JOIN (VALUES (1), (2)) u(e)
        |ORDER BY doc_id, entry""".stripMargin,
    "q_assign_ids" ->
      """SELECT doc_id,
        |       CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS seq_id
        |FROM documents ORDER BY doc_id""".stripMargin,
    // RE2 spells code points \x{....}; Java regex \uXXXX — same sets
    "q_encoding_damage" ->
      """WITH p AS (SELECT doc_id,
        |  CASE WHEN doc_id % 10 = 0
        |       THEN text || chr(195) || chr(169) || chr(65533) || chr(7)
        |       ELSE text END AS t
        |  FROM documents WHERE text IS NOT NULL),
        |c AS (SELECT doc_id,
        |  len(regexp_extract_all(t, '\x{FFFD}')) AS r,
        |  len(regexp_extract_all(t,
        |    '[\x{0000}-\x{0008}\x{000B}\x{000C}\x{000E}-\x{001F}\x{007F}-\x{009F}]')) AS c,
        |  len(regexp_extract_all(t,
        |    '[\x{00C2}\x{00C3}][\x{0080}-\x{00BF}]|\x{00E2}[\x{0080}\x{20AC}]')) AS m
        |  FROM p)
        |SELECT doc_id, CAST(r AS BIGINT) AS replacement_chars,
        |       CAST(c AS BIGINT) AS control_chars,
        |       CAST(m AS BIGINT) AS mojibake,
        |       r + c + m = 0 AS is_clean
        |FROM c ORDER BY doc_id""".stripMargin,
    "q_readability" ->
      """WITH c AS (SELECT doc_id,
        |  len(list_filter(string_split_regex(text, '\s+'), w -> len(w) > 0)) AS w,
        |  CASE WHEN len(trim(text)) = 0 THEN 0
        |       ELSE len(regexp_extract_all(trim(text), '[.!?]+\s+')) + 1 END AS s,
        |  len(regexp_extract_all(lower(text), '[aeiouy]+')) AS y
        |  FROM documents WHERE text IS NOT NULL)
        |SELECT doc_id, CAST(w AS BIGINT) AS words, CAST(s AS BIGINT) AS sentences,
        |       CAST(y AS BIGINT) AS syllables,
        |       CASE WHEN w > 0 AND s > 0 THEN
        |         round(206.835 - 1.015 * (CAST(w AS DOUBLE) / s)
        |                       - 84.6 * (CAST(y AS DOUBLE) / w), 4) END AS flesch,
        |       CASE WHEN w > 0 AND s > 0 THEN
        |         round(0.39 * (CAST(w AS DOUBLE) / s)
        |               + 11.8 * (CAST(y AS DOUBLE) / w) - 15.59, 4) END AS fk_grade
        |FROM c ORDER BY doc_id""".stripMargin,
    "q_chunk_sentences" ->
      """WITH d AS (SELECT doc_id,
        |             list_filter(string_split_regex(
        |               regexp_replace(text, '[.!?]', '', 'g'), '\s+'),
        |               w -> len(w) > 0) AS toks
        |           FROM documents WHERE text IS NOT NULL)
        |SELECT doc_id,
        |       CAST(ceil(ceil(len(toks) / 5.0) / 3.0) AS BIGINT) AS n_chunks,
        |       CAST(len(toks) AS BIGINT) AS words_total,
        |       true AS rejoin_ok
        |FROM d WHERE len(toks) >= 1 ORDER BY doc_id""".stripMargin,
    "q_dedup_lines" ->
      """WITH d AS (SELECT doc_id,
        |             list_filter(string_split_regex(text, '\s+'),
        |               w -> len(w) > 0) AS toks
        |           FROM documents WHERE text IS NOT NULL),
        |d2 AS (SELECT doc_id, toks FROM d WHERE len(toks) >= 1),
        |p AS (SELECT doc_id, u.i AS pi,
        |             array_to_string(toks[(u.i-1)*3+1:(u.i-1)*3+3], ' ') AS line
        |      FROM d2, range(1, 4000) u(i)
        |      WHERE u.i <= CAST(ceil(len(toks) / 3.0) AS INT))
        |SELECT doc_id, count(*) AS n_lines,
        |       count(DISTINCT line) AS n_kept, true AS order_ok
        |FROM p GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_dedup_substring_strip" ->
      """WITH d AS (SELECT doc_id,
        |             list_filter(string_split_regex(text, '\s+'), s -> len(s) > 0) AS toks
        |           FROM documents WHERE text IS NOT NULL),
        |g AS (SELECT doc_id, i AS s, i + 7 AS e, array_to_string(toks[i:i+7], ' ') AS gram
        |      FROM d, range(1, 4000) u(i) WHERE u.i <= len(toks) - 7),
        |-- keeper = globally first occurrence (lowest (doc_id, pos));
        |-- positions are < 1e6 so the packed key orders identically
        |dup AS (SELECT gram, min(doc_id * 1000000 + s) AS fk
        |        FROM g GROUP BY gram HAVING count(*) >= 2),
        |m AS (SELECT g.doc_id, g.s, g.e FROM g JOIN dup USING (gram)
        |      WHERE g.doc_id * 1000000 + g.s <> dup.fk),
        |o AS (SELECT doc_id, s, e,
        |             max(e) OVER (PARTITION BY doc_id ORDER BY s, e
        |                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |      FROM m),
        |isl AS (SELECT doc_id, s, e,
        |               sum(CASE WHEN pmax IS NULL OR s > pmax + 1 THEN 1 ELSE 0 END)
        |                 OVER (PARTITION BY doc_id ORDER BY s, e) AS grp
        |        FROM o),
        |spans AS (SELECT doc_id, min(s) AS ss, max(e) AS se FROM isl GROUP BY doc_id, grp)
        |SELECT doc_id, CAST(sum(se - ss + 1) AS BIGINT) AS removed
        |FROM spans GROUP BY doc_id HAVING sum(se - ss + 1) > 0
        |ORDER BY doc_id""".stripMargin,
    "q_dedup_incremental_embed" ->
      """SELECT vec_id + 100000 AS id_new, vec_id AS id_old, true AS cos_ok
        |FROM embeddings WHERE vec_id < 50 ORDER BY id_new""".stripMargin,
    "q_dedup_embed" ->
      """SELECT vec_id AS id_a, vec_id + 100000 AS id_b, true AS cos_ok
        |FROM embeddings WHERE vec_id < 50 ORDER BY id_a""".stripMargin,
    "q_dedup_semantic" ->
      """SELECT CAST(count(*) AS BIGINT) AS kept,
        |       CAST(sum(vec_id) AS BIGINT) AS kept_id_sum
        |FROM embeddings""".stripMargin,
    "q_dedup_incremental_semantic" ->
      """SELECT vec_id + 100000 AS id_new, vec_id AS id_old, true AS cos_ok
        |FROM embeddings WHERE vec_id < 50 ORDER BY id_new""".stripMargin,
    "q_d4_pipeline" ->
      """SELECT CAST(count(*) + sum(CASE WHEN vec_id < 50 THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_input,
        |       count(*) AS n_semdedup,
        |       CAST(ceil(0.7 * count(*)) AS BIGINT) AS n_pruned,
        |       true AS semdedup_kept_natural,
        |       true AS prune_rule_ok,
        |       true AS mix_rule_ok
        |FROM embeddings""".stripMargin,
    "q_d4_incremental" ->
      """SELECT CAST(count(*) + sum(CASE WHEN vec_id < 50 THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_input,
        |       count(*) AS n_semdedup,
        |       CAST(ceil(0.7 * count(*)) AS BIGINT) AS n_pruned,
        |       true AS semdedup_kept_natural,
        |       true AS prune_rule_ok,
        |       true AS matches_rebuild
        |FROM embeddings""".stripMargin,
    "q_dedup_keepbest" ->
      """WITH n AS (SELECT doc_id,  n_chars,
        |  lower(trim(regexp_replace(regexp_replace(text,
        |    '[\x00-\x08\x0E-\x1F\x7F]', '', 'g'), '[ \t\n\r\x0B\f]+', ' ', 'g'))) AS nt
        |  FROM documents),
        |r AS (SELECT doc_id,
        |        row_number() OVER (PARTITION BY nt ORDER BY n_chars DESC, doc_id) AS rn
        |      FROM n)
        |SELECT count(*) AS kept, CAST(sum(doc_id) AS BIGINT) AS kept_id_sum
        |FROM r WHERE rn = 1""".stripMargin,
    "q_gopher_repetition" ->
      """WITH d AS (SELECT doc_id,
        |             list_filter(string_split_regex(text, '\s+'), s -> len(s) > 0) AS toks
        |           FROM documents WHERE text IS NOT NULL),
        |d2 AS (SELECT doc_id, toks FROM d WHERE len(toks) >= 1),
        |l AS (SELECT doc_id, u.i AS li,
        |             array_to_string(toks[(u.i-1)*3+1:(u.i-1)*3+3], ' ') AS line
        |      FROM d2, range(1, 100) u(i)
        |      WHERE u.i <= CAST(ceil(len(toks) / 3.0) AS INT)),
        |lc AS (SELECT doc_id, line, count(*) AS c, len(line) AS chs
        |       FROM l GROUP BY 1, 2),
        |ls AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS lines,
        |              CAST(sum(CASE WHEN c > 1 THEN c - 1 ELSE 0 END) AS DOUBLE)
        |                / CAST(sum(c) AS DOUBLE) AS dup_line_frac,
        |              CAST(sum(CASE WHEN c > 1 THEN (c - 1) * chs ELSE 0 END) AS DOUBLE)
        |                / CAST(sum(c * chs) AS DOUBLE) AS dup_line_char_frac
        |       FROM lc GROUP BY 1),
        |p AS (SELECT doc_id, CAST(ceil(li / 2.0) AS INT) AS pj,
        |             string_agg(line, chr(10) ORDER BY li) AS para
        |      FROM l GROUP BY 1, 2),
        |pc AS (SELECT doc_id, para, count(*) AS c, len(para) AS chs
        |       FROM p GROUP BY 1, 2),
        |ps AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS paras,
        |              CAST(sum(CASE WHEN c > 1 THEN c - 1 ELSE 0 END) AS DOUBLE)
        |                / CAST(sum(c) AS DOUBLE) AS dup_para_frac,
        |              CAST(sum(CASE WHEN c > 1 THEN (c - 1) * chs ELSE 0 END) AS DOUBLE)
        |                / CAST(sum(c * chs) AS DOUBLE) AS dup_para_char_frac
        |       FROM pc GROUP BY 1),
        |lt AS (SELECT doc_id, list_transform(toks, s -> lower(s)) AS lw FROM d2),
        |tc AS (SELECT doc_id, CAST(len(array_to_string(lw, ' ')) AS BIGINT) AS total
        |       FROM lt),
        |g2 AS (SELECT doc_id, array_to_string(lw[u.i:u.i+1], ' ') AS g
        |       FROM lt, range(1, 100) u(i) WHERE u.i + 1 <= len(lw)),
        |c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2),
        |t2 AS (SELECT doc_id, c * len(g) AS chars FROM (
        |         SELECT doc_id, g, c,
        |                row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g ASC) AS rn
        |         FROM c2) WHERE rn = 1),
        |g5 AS (SELECT doc_id, array_to_string(lw[u.i:u.i+4], ' ') AS g
        |       FROM lt, range(1, 100) u(i) WHERE u.i + 4 <= len(lw)),
        |c5 AS (SELECT doc_id, g, count(*) AS c FROM g5 GROUP BY 1, 2),
        |d5 AS (SELECT doc_id, sum(CASE WHEN c > 1 THEN c * len(g) ELSE 0 END) AS chars
        |       FROM c5 GROUP BY 1)
        |SELECT d2.doc_id, ls.lines, ls.dup_line_frac, ls.dup_line_char_frac,
        |       ps.paras, ps.dup_para_frac, ps.dup_para_char_frac,
        |       COALESCE(CAST(t2.chars AS DOUBLE) / CAST(tc.total AS DOUBLE), 0.0)
        |         AS top_gram_char_frac,
        |       COALESCE(CAST(d5.chars AS DOUBLE) / CAST(tc.total AS DOUBLE), 0.0)
        |         AS dup_gram_char_frac
        |FROM d2 JOIN ls USING (doc_id) JOIN ps USING (doc_id) JOIN tc USING (doc_id)
        |LEFT JOIN t2 USING (doc_id) LEFT JOIN d5 USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "q_gopher_quality" ->
      """WITH t0 AS (SELECT doc_id,
        |              (CASE WHEN doc_id % 5 = 0 THEN '- ' ELSE '' END) || text ||
        |              (CASE WHEN doc_id % 7 = 0 THEN ' ...' ELSE '' END) AS t
        |            FROM documents WHERE text IS NOT NULL),
        |w AS (SELECT doc_id, t,
        |             list_filter(string_split_regex(t, '\s+'), s -> len(s) > 0) AS ws
        |      FROM t0)
        |SELECT doc_id,
        |  CAST(len(ws) AS BIGINT) AS words,
        |  CAST(list_sum(list_transform(ws, s -> len(s))) AS DOUBLE)
        |    / CAST(len(ws) AS DOUBLE) AS mean_word_len,
        |  CAST(len(list_filter(ws, s -> regexp_matches(s, '[A-Za-z]'))) AS DOUBLE)
        |    / CAST(len(ws) AS DOUBLE) AS alpha_word_frac,
        |  CAST((len(t) - len(replace(t, '#', '')))
        |     + (len(t) - len(replace(t, '...', ''))) // 3
        |     + (len(t) - len(replace(t, '…', ''))) AS DOUBLE)
        |    / CAST(len(ws) AS DOUBLE) AS symbol_word_ratio,
        |  CASE WHEN left(trim(t), 1) IN ('-', '*', '•') THEN 1.0 ELSE 0.0 END
        |    AS bullet_line_frac,
        |  CASE WHEN right(trim(t), 3) = '...' OR right(trim(t), 1) = '…'
        |       THEN 1.0 ELSE 0.0 END AS ellipsis_line_frac,
        |  CAST(len(list_intersect(list_distinct(list_transform(ws, s -> lower(s))),
        |       ['the','be','to','of','and','that','have','with'])) AS BIGINT)
        |    AS stopword_hits
        |FROM w WHERE len(ws) >= 1
        |ORDER BY doc_id""".stripMargin,
    "q_scrub" ->
      """WITH d AS (SELECT source,
        |  text || CASE WHEN doc_id % 5 = 0
        |                 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
        |               WHEN doc_id % 5 = 1 THEN ' from 10.2.30.4'
        |               WHEN doc_id % 5 = 2 THEN ' call 555-867-5309'
        |               ELSE '' END AS t
        |  FROM documents),
        |m AS (SELECT source,
        |  len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS e,
        |  len(regexp_extract_all(t, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS i,
        |  len(regexp_extract_all(
        |    regexp_replace(t, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '', 'g'),
        |    '(\+[0-9]{1,3}[ .-]?)?(\([0-9]{2,4}\)[ .-]?)?[0-9]{3,4}[ .-][0-9]{3,4}[ .-]?[0-9]{0,4}')) AS ph,
        |  length(regexp_replace(regexp_replace(regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g'),
        |    '(\+[0-9]{1,3}[ .-]?)?(\([0-9]{2,4}\)[ .-]?)?[0-9]{3,4}[ .-][0-9]{3,4}[ .-]?[0-9]{0,4}',
        |    '<PHONE>', 'g')) AS slen
        |  FROM d)
        |SELECT source, count(*) AS docs, CAST(sum(e) AS BIGINT) AS emails,
        |       CAST(sum(i) AS BIGINT) AS ips, CAST(sum(ph) AS BIGINT) AS phones,
        |       CAST(sum(slen) AS BIGINT) AS scrubbed_len
        |FROM m GROUP BY source ORDER BY source""".stripMargin,
    "q_chunk" ->
      """WITH dw AS (SELECT source,
        |              list_filter(string_split_regex(coalesce(text, ''), '\s+'),
        |                          w -> len(w) > 0) AS ws
        |            FROM documents),
        |n AS (SELECT source, ws, greatest((len(ws) + 32 - 1 - 8) // 32, 1) AS nc FROM dw),
        |c AS (SELECT source, ws, unnest(range(0, nc)) AS ci FROM n),
        |x AS (SELECT source, ci,
        |        array_to_string(ws[ci*32+1 : ci*32+40], ' ') AS ct FROM c)
        |SELECT source, count(*) AS chunks, CAST(sum(length(ct)) AS BIGINT) AS chars,
        |       CAST(sum(ci) AS BIGINT) AS idx_sum, CAST(max(ci) AS BIGINT) AS max_idx
        |FROM x GROUP BY source ORDER BY source""".stripMargin,
    "q_text_repetition" ->
      """WITH dw AS (SELECT source,
        |              list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
        |                          w -> len(w) > 0) AS ws
        |            FROM documents),
        |g AS (SELECT source,
        |        CASE WHEN len(ws) >= 3
        |             THEN list_transform(range(1, len(ws) - 1),
        |                                 i -> array_to_string(ws[i:i+2], ' '))
        |             ELSE [] END AS gs
        |      FROM dw),
        |m AS (SELECT source, len(list_distinct(gs)) AS d, len(gs) AS tt,
        |             CASE WHEN len(gs) > 0
        |                  THEN 1.0 - CAST(len(list_distinct(gs)) AS DOUBLE) / CAST(len(gs) AS DOUBLE)
        |                  ELSE 0.0 END AS rep
        |      FROM g)
        |SELECT source, count(*) AS docs,
        |       CAST(sum(d) AS BIGINT) AS distinct_grams,
        |       CAST(sum(tt) AS BIGINT) AS total_grams,
        |       CAST(count(*) FILTER (rep > 0.3) AS BIGINT) AS high_rep
        |FROM m GROUP BY source ORDER BY source""".stripMargin,
    "q_split" ->
      """WITH s AS (SELECT doc_id,
        |             substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS h
        |           FROM documents),
        |a AS (SELECT doc_id, CASE WHEN h < 'cccd' THEN 'train'
        |                          WHEN h < 'e666' THEN 'val'
        |                          ELSE 'test' END AS split FROM s)
        |SELECT split, count(*) AS cnt, CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM a GROUP BY split ORDER BY split""".stripMargin,
    "q_pack" ->
      """WITH w AS (SELECT source, doc_id, n_chars,
        |             coalesce(sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cs
        |           FROM documents)
        |SELECT source, CAST(cs // 2000 AS BIGINT) AS pack_id,
        |       count(*) AS docs_in_pack, CAST(sum(n_chars) AS BIGINT) AS tokens
        |FROM w GROUP BY 1, 2 ORDER BY source, pack_id""".stripMargin,
    "q_decontaminate" ->
      """WITH dw AS (SELECT doc_id,
        |              list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
        |                          w -> len(w) > 0) AS ws
        |            FROM documents),
        |dg AS (SELECT DISTINCT doc_id, g FROM (
        |         SELECT doc_id, unnest(list_transform(range(1, greatest(len(ws) - 4, 0) + 1),
        |                  i -> array_to_string(ws[i:i+4], ' '))) AS g FROM dw)),
        |bg AS (SELECT DISTINCT g FROM dg WHERE doc_id % 17 = 0),
        |ov AS (SELECT doc_id, count(*) AS o FROM dg JOIN bg USING (g) GROUP BY doc_id)
        |SELECT count(*) AS docs,
        |       CAST(count(*) FILTER (coalesce(o, 0) >= 1) AS BIGINT) AS n_contaminated,
        |       CAST(coalesce(sum(o), 0) AS BIGINT) AS overlap_total
        |FROM documents LEFT JOIN ov USING (doc_id)""".stripMargin,
    "q_decontaminate_semantic" ->
      """SELECT vec_id, vec_id % 37 = 0 AND embedding IS NOT NULL AS contaminated
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q_pipeline" ->
      """WITH e AS (SELECT d.* FROM documents d
        |           JOIN (SELECT text, min(doc_id) AS m FROM documents GROUP BY text) k
        |             ON d.text = k.text AND d.doc_id = k.m),
        |sh AS (SELECT DISTINCT doc_id, substr(text, r.i, 5) AS g
        |       FROM e, range(1, 1000) r(i) WHERE r.i + 4 <= length(text)),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
        |pairs AS (SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS inter
        |          FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |removed AS (SELECT DISTINCT idb AS doc_id FROM pairs
        |            JOIN sizes sa ON ida = sa.doc_id JOIN sizes sb ON idb = sb.doc_id
        |            WHERE inter >= (sa.sz + sb.sz - inter) * 0.8),
        |nd AS (SELECT * FROM e WHERE doc_id NOT IN (SELECT doc_id FROM removed)),
        |dw AS (SELECT doc_id, list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
        |                                  w -> len(w) > 0) AS ws FROM nd),
        |dg AS (SELECT DISTINCT doc_id, g FROM (
        |         SELECT doc_id, unnest(list_transform(range(1, greatest(len(ws) - 4, 0) + 1),
        |                  i -> array_to_string(ws[i:i+4], ' '))) AS g FROM dw)),
        |bw AS (SELECT list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
        |                          w -> len(w) > 0) AS ws FROM documents WHERE doc_id % 17 = 0),
        |bg AS (SELECT DISTINCT g FROM (
        |         SELECT unnest(list_transform(range(1, greatest(len(ws) - 4, 0) + 1),
        |                  i -> array_to_string(ws[i:i+4], ' '))) AS g FROM bw)),
        |contaminated AS (SELECT DISTINCT doc_id FROM dg JOIN bg USING (g)),
        |dc AS (SELECT * FROM nd WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
        |q AS (SELECT doc_id, source, text FROM (
        |        SELECT doc_id, source, text,
        |          round((least(n_chars / 500.0, 1.0)
        |            + (CASE WHEN (n_chars - tokens + 1) * 1.0 / tokens BETWEEN 3.0 AND 8.0
        |                    THEN 1.0 ELSE 0.5 END)
        |            + least(tokens / 100.0, 1.0)) / 3.0, 4) AS score
        |        FROM (SELECT doc_id, source, text, n_chars,
        |                     len(string_split_regex(text, '\s+')) AS tokens FROM dc) t1) t2
        |      WHERE score > 0.55),
        |segs AS (SELECT doc_id, source, list_filter(string_split_regex(text, '\s+'),
        |                                            s2 -> len(s2) > 0) AS ws FROM q),
        |freq AS (SELECT g2 AS segment, count(*) AS df FROM (
        |           SELECT DISTINCT doc_id, unnest(ws) AS g2 FROM segs) GROUP BY g2),
        |hot AS (SELECT coalesce(list(segment), []) AS hl FROM freq
        |        WHERE df >= (SELECT (78 * count(*) + 99) // 100 FROM q)),
        |rew AS (SELECT doc_id, source,
        |          list_filter(ws, s2 -> NOT list_contains(hl, s2)) AS kept
        |        FROM segs CROSS JOIN hot),
        |sp AS (SELECT doc_id, source, kept,
        |         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666'
        |              THEN 'train' ELSE 'val' END AS split
        |       FROM rew)
        |SELECT split, source, CAST(count(*) AS BIGINT) AS docs,
        |       CAST(sum(doc_id) AS BIGINT) AS id_sum,
        |       CAST(sum(length(coalesce(array_to_string(kept, ' '), ''))) AS BIGINT) AS chars_after
        |FROM sp GROUP BY split, source ORDER BY split, source""".stripMargin,
    "q_boilerplate" ->
      """WITH tot AS (SELECT count(*) AS n FROM documents),
        |segs AS (SELECT doc_id, text,
        |           list_filter(string_split_regex(text, '\s+'), s -> len(s) > 0) AS ws
        |         FROM documents),
        |freq AS (SELECT g AS segment, count(*) AS df FROM (
        |           SELECT DISTINCT doc_id, unnest(ws) AS g FROM segs) GROUP BY g),
        |hot AS (SELECT coalesce(list(segment), []) AS hl
        |        FROM freq WHERE df >= (SELECT (78 * n + 99) // 100 FROM tot)),
        |rew AS (SELECT doc_id, text,
        |          list_filter(ws, s -> NOT list_contains(hl, s)) AS kept
        |        FROM segs CROSS JOIN hot)
        |SELECT CAST(count(*) AS BIGINT) AS docs,
        |  -- array_to_string([], ' ') is NULL in DuckDB, not '': coalesce so an
        |  -- all-boilerplate document still counts as changed
        |  CAST(sum(CASE WHEN text IS NOT NULL
        |                 AND coalesce(array_to_string(kept, ' '), '') <> text
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
        |  CAST(sum(CASE WHEN text IS NOT NULL
        |                THEN length(coalesce(array_to_string(kept, ' '), '')) END) AS BIGINT) AS chars_after,
        |  CAST(sum(len(kept)) AS BIGINT) AS words_after,
        |  (SELECT CAST(count(*) AS BIGINT) FROM freq
        |   WHERE df >= (SELECT (78 * n + 99) // 100 FROM tot)) AS n_frequent,
        |  (SELECT CAST(coalesce(sum(df), 0) AS BIGINT) FROM freq
        |   WHERE df >= (SELECT (78 * n + 99) // 100 FROM tot)) AS df_sum
        |FROM rew""".stripMargin,
    "q_sample_fixedk" ->
      """WITH r AS (SELECT source, doc_id,
        |             row_number() OVER (PARTITION BY source
        |               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |           FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n, CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM r WHERE rn <= 7 GROUP BY source ORDER BY source""".stripMargin,
    "q_sample" ->
      """WITH s AS (SELECT source, doc_id,
        |             substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS h
        |           FROM documents)
        |SELECT source,
        |  CAST(count(*) FILTER (h < '4000') AS BIGINT) AS n_plain,
        |  CAST(coalesce(sum(doc_id) FILTER (h < '4000'), 0) AS BIGINT) AS plain_id_sum,
        |  CAST(count(*) FILTER (h < CASE source WHEN 'src0' THEN 'cccd'
        |                                        WHEN 'src1' THEN '199a'
        |                                        ELSE '4000' END) AS BIGINT) AS n_strat
        |FROM s GROUP BY source ORDER BY source""".stripMargin,
    "q_sample_topk" ->
      """SELECT source, count(*) AS kept, CAST(sum(doc_id) AS BIGINT) AS kept_id_sum,
        |       min(n_chars) AS min_len_kept
        |FROM (SELECT source, doc_id, n_chars,
        |        row_number() OVER (PARTITION BY source
        |                           ORDER BY n_chars DESC, doc_id) AS rn
        |      FROM documents) t
        |WHERE rn <= 5 GROUP BY source ORDER BY source""".stripMargin,
    "q_sample_bottomk" ->
      """SELECT doc_id FROM documents
        |ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 100""".stripMargin,
    "q_rebalance" ->
      """WITH w(dom, wt) AS (VALUES ('src0', CAST(0.5 AS DOUBLE)),
        |                           ('src1', CAST(0.25 AS DOUBLE)),
        |                           ('src2', CAST(0.25 AS DOUBLE))),
        |cnt AS (SELECT source AS dom, CAST(count(*) AS DOUBLE) AS n
        |        FROM documents GROUP BY 1),
        |tw AS (SELECT dom, wt, n FROM w JOIN cnt USING (dom)),
        |t AS (SELECT min(n / wt) AS t FROM tw),
        |frac AS (SELECT dom, least(1.0, wt * t / n) AS f FROM tw, t)
        |SELECT source, count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM documents d JOIN frac ON d.source = frac.dom
        |WHERE f >= 1.0 OR (f > 0.0 AND (CAST(round(f * 65536.0) AS INT) >= 65536
        |  OR substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
        |       < printf('%04x', CAST(round(f * 65536.0) AS INT))))
        |GROUP BY source ORDER BY source""".stripMargin,
    "q_mix_budget" ->
      """WITH tot AS (SELECT source, CAST(sum(n_chars) AS DOUBLE) AS t,
        |        CAST(1 + CAST(substr(source, 4, 8) AS INT) % 3 AS DOUBLE) AS w
        |      FROM documents GROUP BY source),
        |ord AS (SELECT source, t, w,
        |        sum(t) OVER (ORDER BY t / w, source ROWS UNBOUNDED PRECEDING) - t AS pt,
        |        sum(w) OVER (ORDER BY t / w, source ROWS UNBOUNDED PRECEDING) - w AS pw,
        |        sum(w) OVER () AS wtot
        |      FROM tot),
        |sat AS (SELECT *, (t * (wtot - pw) <= (100000.0 - pt) * w) AS is_sat FROM ord),
        |fail AS (SELECT t / w AS r, source AS fsrc,
        |                (100000.0 - pt) / (wtot - pw) AS lam
        |         FROM sat WHERE NOT is_sat ORDER BY r, source LIMIT 1),
        |alloc AS (SELECT o.source,
        |          CASE WHEN f.fsrc IS NULL
        |                 OR o.t / o.w < f.r
        |                 OR (o.t / o.w = f.r AND o.source < f.fsrc)
        |               THEN CAST(o.t AS BIGINT)
        |               ELSE CAST(floor(f.lam * o.w) AS BIGINT) END AS b
        |          FROM ord o LEFT JOIN fail f ON true),
        |sel AS (SELECT source, doc_id, n_chars,
        |        sum(n_chars) OVER (PARTITION BY source
        |          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        |          ROWS UNBOUNDED PRECEDING) AS cum
        |        FROM documents)
        |SELECT s.source, count(*) AS n_kept,
        |       CAST(sum(s.n_chars) AS BIGINT) AS tok_sum
        |FROM sel s JOIN alloc a USING (source)
        |WHERE s.cum <= a.b GROUP BY s.source ORDER BY source""".stripMargin,
    "q_mix_temperature" ->
      """WITH cnt AS (SELECT source AS dom, CAST(count(*) AS DOUBLE) AS n
        |             FROM documents GROUP BY 1),
        |w AS (SELECT dom, n, pow(n, 0.5) AS wt FROM cnt),
        |t AS (SELECT min(n / wt) AS t FROM w),
        |frac AS (SELECT dom, least(1.0, wt * t / n) AS f FROM w, t)
        |SELECT source, count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM documents d JOIN frac ON d.source = frac.dom
        |WHERE f >= 1.0 OR (f > 0.0 AND (CAST(round(f * 65536.0) AS INT) >= 65536
        |  OR substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
        |       < printf('%04x', CAST(round(f * 65536.0) AS INT))))
        |GROUP BY source ORDER BY source""".stripMargin,
    "q_token_budget" ->
      """WITH d AS (SELECT source, doc_id,
        |             coalesce(len(list_filter(string_split_regex(text, '\s+'),
        |                                      s -> len(s) > 0)), 0) AS tok
        |           FROM documents),
        |c AS (SELECT source, doc_id, tok,
        |             sum(tok) OVER (PARTITION BY source
        |                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        |                            ROWS UNBOUNDED PRECEDING) AS cum
        |      FROM d)
        |SELECT source, count(*) AS n_kept, CAST(sum(tok) AS BIGINT) AS tok_sum,
        |       CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM c WHERE cum <= 2000 GROUP BY source ORDER BY source""".stripMargin,
    "q_mixture_pipeline" ->
      """WITH d AS (SELECT doc_id, source,
        |             list_filter(string_split_regex(text, '\s+'), s -> len(s) > 0) AS toks
        |           FROM documents WHERE text IS NOT NULL),
        |g AS (SELECT doc_id, i AS s, i + 7 AS e, array_to_string(toks[i:i+7], ' ') AS gram
        |      FROM d, range(1, 4000) u(i) WHERE u.i <= len(toks) - 7),
        |dup AS (SELECT gram, min(doc_id * 1000000 + s) AS fk
        |        FROM g GROUP BY gram HAVING count(*) >= 2),
        |m AS (SELECT g.doc_id, g.s, g.e FROM g JOIN dup USING (gram)
        |      WHERE g.doc_id * 1000000 + g.s <> dup.fk),
        |o AS (SELECT doc_id, s, e,
        |             max(e) OVER (PARTITION BY doc_id ORDER BY s, e
        |                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |      FROM m),
        |isl AS (SELECT doc_id, s, e,
        |               sum(CASE WHEN pmax IS NULL OR s > pmax + 1 THEN 1 ELSE 0 END)
        |                 OVER (PARTITION BY doc_id ORDER BY s, e) AS grp FROM o),
        |spans AS (SELECT doc_id, min(s) AS ss, max(e) AS se FROM isl GROUP BY doc_id, grp),
        |rem AS (SELECT doc_id, sum(se - ss + 1) AS removed FROM spans GROUP BY doc_id),
        |base AS (SELECT dd.doc_id, dd.source,
        |           coalesce(len(d.toks), 0) - coalesce(rem.removed, 0) AS tok
        |         FROM documents dd LEFT JOIN d ON dd.doc_id = d.doc_id
        |                           LEFT JOIN rem ON dd.doc_id = rem.doc_id),
        |cnt AS (SELECT source AS dom, CAST(count(*) AS DOUBLE) AS n
        |        FROM documents GROUP BY 1),
        |w AS (SELECT dom, n, pow(n, 0.5) AS wt FROM cnt),
        |t AS (SELECT min(n / wt) AS t FROM w),
        |frac AS (SELECT dom, least(1.0, wt * t / n) AS f FROM w, t),
        |kept AS (SELECT b.doc_id, b.source, b.tok
        |         FROM base b JOIN frac ON b.source = frac.dom
        |         WHERE f >= 1.0 OR (f > 0.0 AND (CAST(round(f * 65536.0) AS INT) >= 65536
        |           OR substr(md5(CAST(b.doc_id AS VARCHAR)), 1, 4)
        |                < printf('%04x', CAST(round(f * 65536.0) AS INT))))),
        |c AS (SELECT doc_id, source, tok,
        |             sum(tok) OVER (PARTITION BY source
        |                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        |                            ROWS UNBOUNDED PRECEDING) AS cum
        |      FROM kept)
        |SELECT source, count(*) AS n_kept, CAST(sum(tok) AS BIGINT) AS tok_sum,
        |       CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM c WHERE cum <= 1500 GROUP BY source ORDER BY source""".stripMargin,
    "q_sample_weighted" ->
      """WITH w AS (SELECT source, doc_id,
        |             least(n_chars / 1000.0, 1.0) AS wt,
        |             substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS h
        |           FROM documents)
        |SELECT source, count(*) AS n_kept, CAST(sum(doc_id) AS BIGINT) AS kept_id_sum
        |FROM w
        |WHERE wt >= 1.0 OR (wt > 0.0 AND (round(wt * 65536, 0) >= 65536 OR
        |      h < printf('%04x', CAST(round(wt * 65536, 0) AS INT))))
        |GROUP BY source ORDER BY source""".stripMargin,
    "q_text_clean" ->
      """SELECT source,
        |  count(DISTINCT lower(trim(regexp_replace(regexp_replace(text,
        |    '[\x00-\x08\x0E-\x1F\x7F]', '', 'g'), '[ \t\n\r\x0B\f]+', ' ', 'g')))) AS distinct_norm,
        |  CAST(sum(length(lower(trim(regexp_replace(regexp_replace(text,
        |    '[\x00-\x08\x0E-\x1F\x7F]', '', 'g'), '[ \t\n\r\x0B\f]+', ' ', 'g'))))) AS BIGINT) AS norm_chars,
        |  CAST(sum(length(text)) AS BIGINT) AS raw_chars
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q_dedup_simhash" ->
      """WITH sh AS (SELECT DISTINCT doc_id, substr(text, r.i, 5) AS g
        |            FROM documents, range(1, 1000) r(i) WHERE r.i + 4 <= length(text)),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
        |pairs AS (SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS inter
        |          FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT count(*) AS true_pairs, true AS recall_ok
        |FROM pairs JOIN sizes sa ON ida = sa.doc_id JOIN sizes sb ON idb = sb.doc_id
        |WHERE inter >= (sa.sz + sb.sz - inter) * 0.8""".stripMargin,
    // ANN recall oracles: the planes/seeds are deterministic so per-dataset
    // recall is a constant; Spark emits the floor check as a boolean and the
    // oracle pins `true` plus the data-derived exact-pair count (5 neighbors
    // per query; every SF has a corpus far larger than k+1)
    "q_embed_lsh" ->
      """SELECT CAST((SELECT count(*) FROM embeddings WHERE vec_id < 5) * 5 AS BIGINT)
        |  AS exact_pairs, true AS recall_ok""".stripMargin,
    "q_embed_ivf" ->
      """SELECT CAST((SELECT count(*) FROM embeddings WHERE vec_id < 5) * 5 AS BIGINT)
        |  AS exact_pairs, true AS recall_ok""".stripMargin,
    "q_embed_pq" ->
      """SELECT CAST((SELECT count(*) FROM embeddings WHERE vec_id < 5) * 5 AS BIGINT)
        |  AS exact_pairs, true AS recall_ok""".stripMargin,
    "q_embed_ivfpq" ->
      """SELECT CAST((SELECT count(*) FROM embeddings WHERE vec_id < 5) * 5 AS BIGINT)
        |  AS exact_pairs, true AS recall_ok""".stripMargin,
    "q_embed_opq" ->
      """SELECT CAST((SELECT count(*) FROM embeddings WHERE vec_id < 5) * 5 AS BIGINT)
        |  AS exact_pairs, true AS recall_ok,
        |  true AS rotation_orthogonal""".stripMargin,
    "q_ann_binary" ->
      """SELECT CAST(15 AS BIGINT) AS n_rows, true AS copies_rank1,
        |  true AS pool_exhaustive_exact, true AS indexed_exact""".stripMargin,
    "q_ann_sq8" ->
      """SELECT CAST(15 AS BIGINT) AS n_rows, true AS copies_rank1,
        |  true AS pool_exhaustive_exact, true AS indexed_exact,
        |  true AS append_exact, true AS remove_exact,
        |  true AS removed_absent, true AS clip_quiet, true AS clip_fired,
        |  true AS retrain_exact""".stripMargin,
    "q_ann_filtered" ->
      """SELECT CAST(15 AS BIGINT) AS n_rows, true AS full_mass_exact,
        |  true AS full_top1_copies, true AS full_allowed_only,
        |  true AS brute_branch_ok, true AS probe_branch_ok,
        |  true AS hnsw_ok, true AS pq_ok""".stripMargin,
    "q_ann_auto" ->
      """SELECT CAST(15 AS BIGINT) AS n_rows, true AS brute_exact,
        |  true AS probe_copies_rank1, true AS filtered_brute_exact,
        |  true AS filtered_probe_ok, true AS fallback_copies_rank1""".stripMargin,
    "q_stream_sq8" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_streamed, true AS stream_ok,
        |  true AS probe_exact, true AS remove_ok,
        |  true AS replay_no_resurrect
        |FROM embeddings WHERE embedding IS NOT NULL""".stripMargin,
    "q_knn_label" ->
      """SELECT CAST(vec_id + 100000 AS BIGINT) AS query_id, label,
        |  true AS w_ok, CAST(1 AS BIGINT) AS votes
        |FROM embeddings
        |WHERE embedding IS NOT NULL AND label IS NOT NULL AND vec_id < 20
        |ORDER BY query_id""".stripMargin,
    "q_mmr_rerank" ->
      """SELECT CAST(0 AS BIGINT) AS query_id, CAST(r AS INTEGER) AS rank,
        |  CAST(n AS BIGINT) AS neighbor_id,
        |  true AS rel_order_ok, true AS real_top1_ok
        |FROM (VALUES (1, 1), (2, 4), (3, 3)) AS t(r, n) ORDER BY r""".stripMargin,
    "q_pipeline_serving" ->
      """SELECT CAST(50 AS BIGINT) AS n_fused, CAST(25 AS BIGINT) AS n_final,
        |  true AS fusion_copy_rank1, true AS mmr_copy_rank1,
        |  true AS ids_valid""".stripMargin,
    "q_sample_weighted_k" ->
      """WITH d AS (
        |  SELECT source, doc_id, n_chars,
        |    ln((CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |         AS BIGINT) + 0.5) / 4294967296.0) / n_chars AS score
        |  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
        |r AS (SELECT source, doc_id,
        |        row_number() OVER (PARTITION BY source
        |                           ORDER BY score DESC, doc_id) AS rn
        |      FROM d)
        |SELECT source, doc_id FROM r WHERE rn <= 20
        |ORDER BY source, doc_id""".stripMargin,
    "q_bm25f_batch" ->
      """WITH qs AS (SELECT * FROM (VALUES
        |    (0, 'slow'), (0, 'merge'), (0, 'window'),
        |    (1, 'hash'), (1, 'batch'), (1, 'scan'),
        |    (2, 'filter'), (2, 'row'), (2, 'group')) v(query_id, term)),
        |f AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
        |                    x -> len(x) > 0) AS w
        |           FROM documents WHERE text IS NOT NULL),
        |fl AS (SELECT doc_id, w[1:5] AS tw, w[6:len(w)] AS bw FROM f),
        |tdl AS (SELECT doc_id, len(tw) AS dl FROM fl WHERE len(tw) > 0),
        |bdl AS (SELECT doc_id, len(bw) AS dl FROM fl WHERE len(bw) > 0),
        |tp AS (SELECT term, doc_id, count(*) AS tf
        |       FROM (SELECT doc_id, unnest(tw) AS term FROM fl)
        |       WHERE term IN (SELECT DISTINCT term FROM qs) GROUP BY 1, 2),
        |bp AS (SELECT term, doc_id, count(*) AS tf
        |       FROM (SELECT doc_id, unnest(bw) AS term FROM fl)
        |       WHERE term IN (SELECT DISTINCT term FROM qs) GROUP BY 1, 2),
        |ts AS (SELECT avg(dl) AS avgdl FROM tdl),
        |bs AS (SELECT avg(dl) AS avgdl FROM bdl),
        |tfn AS (
        |  SELECT term, doc_id,
        |         2.0 * tf / (0.5 + 0.5 * d.dl / s.avgdl) AS tfn
        |  FROM tp JOIN tdl d USING (doc_id) CROSS JOIN ts s
        |  UNION ALL
        |  SELECT term, doc_id,
        |         1.0 * tf / (0.25 + 0.75 * d.dl / s.avgdl) AS tfn
        |  FROM bp JOIN bdl d USING (doc_id) CROSS JOIN bs s),
        |tft AS (SELECT term, doc_id, sum(tfn) AS tft FROM tfn GROUP BY 1, 2),
        |dfs AS (SELECT term, count(*) AS df FROM tft GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM f),
        |scored AS (
        |  SELECT q.query_id, t.doc_id,
        |         sum(ln(1 + (n.n - dfs.df + 0.5) / (dfs.df + 0.5)) *
        |             t.tft / (1.2 + t.tft)) AS score,
        |         CAST(count(*) AS BIGINT) AS n_terms_hit
        |  FROM qs q JOIN tft t USING (term) JOIN dfs USING (term)
        |  CROSS JOIN n GROUP BY 1, 2)
        |SELECT CAST(query_id AS BIGINT) AS query_id, rank, doc_id,
        |       n_terms_hit, true AS per_query_same
        |FROM (
        |  SELECT query_id, doc_id, n_terms_hit,
        |         CAST(row_number() OVER (PARTITION BY query_id
        |           ORDER BY score DESC, doc_id) AS BIGINT) AS rank
        |  FROM scored) t
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    "q_bm25f" ->
      """WITH f AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
        |                    x -> len(x) > 0) AS w
        |           FROM documents WHERE text IS NOT NULL),
        |fl AS (SELECT doc_id, w[1:5] AS tw, w[6:len(w)] AS bw FROM f),
        |tdl AS (SELECT doc_id, len(tw) AS dl FROM fl WHERE len(tw) > 0),
        |bdl AS (SELECT doc_id, len(bw) AS dl FROM fl WHERE len(bw) > 0),
        |tp AS (SELECT term, doc_id, count(*) AS tf
        |       FROM (SELECT doc_id, unnest(tw) AS term FROM fl)
        |       WHERE term IN ('slow', 'merge', 'window') GROUP BY 1, 2),
        |bp AS (SELECT term, doc_id, count(*) AS tf
        |       FROM (SELECT doc_id, unnest(bw) AS term FROM fl)
        |       WHERE term IN ('slow', 'merge', 'window') GROUP BY 1, 2),
        |ts AS (SELECT avg(dl) AS avgdl FROM tdl),
        |bs AS (SELECT avg(dl) AS avgdl FROM bdl),
        |tfn AS (
        |  SELECT term, doc_id,
        |         2.0 * tf / (0.5 + 0.5 * d.dl / s.avgdl) AS tfn
        |  FROM tp JOIN tdl d USING (doc_id) CROSS JOIN ts s
        |  UNION ALL
        |  SELECT term, doc_id,
        |         1.0 * tf / (0.25 + 0.75 * d.dl / s.avgdl) AS tfn
        |  FROM bp JOIN bdl d USING (doc_id) CROSS JOIN bs s),
        |tft AS (SELECT term, doc_id, sum(tfn) AS tft FROM tfn GROUP BY 1, 2),
        |dfs AS (SELECT term, count(*) AS df FROM tft GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM f),
        |scored AS (
        |  SELECT doc_id,
        |         sum(ln(1 + (n.n - dfs.df + 0.5) / (dfs.df + 0.5)) *
        |             tft / (1.2 + tft)) AS score,
        |         CAST(count(*) AS BIGINT) AS n_terms_hit
        |  FROM tft JOIN dfs USING (term) CROSS JOIN n GROUP BY doc_id)
        |SELECT rank, doc_id, n_terms_hit FROM (
        |  SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
        |           AS rank, doc_id, n_terms_hit FROM scored) t
        |WHERE rank <= 10 ORDER BY rank""".stripMargin,
    "q_retrieval_filtered_f" ->
      """WITH f AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
        |                    x -> len(x) > 0) AS w
        |           FROM documents WHERE text IS NOT NULL),
        |fl AS (SELECT doc_id, w[1:5] AS tw, w[6:len(w)] AS bw FROM f),
        |tdl AS (SELECT doc_id, len(tw) AS dl FROM fl WHERE len(tw) > 0),
        |bdl AS (SELECT doc_id, len(bw) AS dl FROM fl WHERE len(bw) > 0),
        |tp AS (SELECT term, doc_id, count(*) AS tf
        |       FROM (SELECT doc_id, unnest(tw) AS term FROM fl)
        |       WHERE term IN ('slow', 'merge', 'window') GROUP BY 1, 2),
        |bp AS (SELECT term, doc_id, count(*) AS tf
        |       FROM (SELECT doc_id, unnest(bw) AS term FROM fl)
        |       WHERE term IN ('slow', 'merge', 'window') GROUP BY 1, 2),
        |ts AS (SELECT avg(dl) AS avgdl FROM tdl),
        |bs AS (SELECT avg(dl) AS avgdl FROM bdl),
        |tfn AS (
        |  SELECT term, doc_id,
        |         2.0 * tf / (0.5 + 0.5 * d.dl / s.avgdl) AS tfn
        |  FROM tp JOIN tdl d USING (doc_id) CROSS JOIN ts s
        |  UNION ALL
        |  SELECT term, doc_id,
        |         1.0 * tf / (0.25 + 0.75 * d.dl / s.avgdl) AS tfn
        |  FROM bp JOIN bdl d USING (doc_id) CROSS JOIN bs s),
        |tft AS (SELECT term, doc_id, sum(tfn) AS tft FROM tfn GROUP BY 1, 2),
        |dfs AS (SELECT term, count(*) AS df FROM tft GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM f),
        |scored AS (
        |  SELECT doc_id,
        |         sum(ln(1 + (n.n - dfs.df + 0.5) / (dfs.df + 0.5)) *
        |             tft / (1.2 + tft)) AS score,
        |         CAST(count(*) AS BIGINT) AS n_terms_hit
        |  FROM tft JOIN dfs USING (term) CROSS JOIN n GROUP BY doc_id)
        |SELECT rank, doc_id, n_terms_hit FROM (
        |  SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
        |           AS rank, doc_id, n_terms_hit FROM scored
        |  WHERE doc_id % 3 = 0) t
        |WHERE rank <= 10 ORDER BY rank""".stripMargin,
    "q_novelty" ->
      """WITH d AS (SELECT doc_id,
        |             list_filter(string_split_regex(lower(text), '\s+'),
        |                 s -> len(s) > 0) AS toks
        |           FROM documents WHERE text IS NOT NULL),
        |g AS (SELECT doc_id,
        |        count(DISTINCT array_to_string(toks[i:i+7], ' ')) AS total
        |      FROM (SELECT doc_id, toks,
        |              unnest(generate_series(1, len(toks) - 7)) AS i
        |            FROM d WHERE len(toks) >= 8) gg
        |      GROUP BY doc_id)
        |SELECT id, total_grams, unseen_grams, novelty FROM (
        |  SELECT CAST(doc_id + 1000000 AS BIGINT) AS id,
        |         CAST(total AS BIGINT) AS total_grams,
        |         CAST(0 AS BIGINT) AS unseen_grams, 0.0 AS novelty
        |  FROM g
        |  UNION ALL
        |  SELECT CAST(doc_id + 2000000 AS BIGINT),
        |         CAST(total AS BIGINT), CAST(total AS BIGINT), 1.0
        |  FROM g)
        |ORDER BY id""".stripMargin,
    "q_pack_batches" ->
      """WITH d AS (SELECT doc_id,
        |             len(list_filter(string_split_regex(text, '\s+'),
        |                 s -> len(s) > 0)) AS len
        |           FROM documents WHERE text IS NOT NULL),
        |r AS (SELECT doc_id, len,
        |        row_number() OVER (ORDER BY len DESC, doc_id) AS rn FROM d),
        |g AS (SELECT CAST((rn - 1) // 32 AS BIGINT) AS batch,
        |        CAST(count(*) AS BIGINT) AS n, CAST(max(len) AS BIGINT) AS max_len,
        |        CAST(sum(len) AS BIGINT) AS sum_len
        |      FROM r GROUP BY 1),
        |a AS (SELECT CAST((row_number() OVER (ORDER BY doc_id) - 1) // 32 AS BIGINT)
        |        AS batch, len FROM d),
        |ga AS (SELECT batch, max(len) AS mx, count(*) AS n, sum(len) AS sl
        |       FROM a GROUP BY batch),
        |ws AS (SELECT sum(max_len * n - sum_len) AS w FROM g),
        |wa AS (SELECT sum(mx * n - sl) AS w FROM ga)
        |SELECT g.batch, g.n, g.max_len, g.sum_len,
        |       CAST(g.max_len * g.n - g.sum_len AS BIGINT) AS padding_waste,
        |       (SELECT ws.w <= wa.w FROM ws, wa) AS sorted_no_worse
        |FROM g ORDER BY batch""".stripMargin,
    "q_pref_pairs" ->
      """WITH d AS (SELECT doc_id,
        |             list_filter(string_split_regex(text, '\s+'), s -> len(s) > 0) AS toks
        |           FROM documents WHERE text IS NOT NULL),
        |b AS (SELECT doc_id,
        |        array_to_string(toks[1:3], ' ') AS prompt,
        |        array_to_string(toks[4:13], ' ') AS chosen,
        |        array_to_string(toks[14:23], ' ') AS rejected0
        |      FROM d WHERE len(toks) >= 23),
        |m AS (SELECT doc_id, prompt, chosen,
        |        CASE WHEN doc_id % 7 = 0 THEN chosen
        |             WHEN doc_id % 7 = 1 THEN upper(chosen)
        |             WHEN doc_id % 7 = 2 THEN '   '
        |             WHEN doc_id % 7 = 3 THEN substr(chosen, 1, 2)
        |             ELSE rejected0 END AS rejected
        |      FROM b),
        |n AS (SELECT *,
        |        trim(regexp_replace(lower(coalesce(chosen, '')), '\s+', ' ', 'g')) AS nc,
        |        trim(regexp_replace(lower(coalesce(rejected, '')), '\s+', ' ', 'g')) AS nr,
        |        (len(trim(prompt)) > 0 AND len(trim(chosen)) > 0
        |         AND len(trim(rejected)) > 0) AS ne,
        |        (chosen <> rejected) AS de,
        |        (len(chosen) > 0 AND len(rejected) > 0
        |         AND greatest(CAST(len(chosen) AS DOUBLE), CAST(len(rejected) AS DOUBLE))
        |             <= least(CAST(len(chosen) AS DOUBLE), CAST(len(rejected) AS DOUBLE)) * 8.0)
        |          AS lok
        |      FROM m)
        |SELECT doc_id, ne AS nonempty, de AS distinct_exact,
        |       (nc <> nr) AS distinct_norm, lok AS length_ok,
        |       (ne AND de AND nc <> nr AND lok) AS valid
        |FROM n ORDER BY doc_id""".stripMargin,
    "q_pref_conflicts" ->
      """WITH d AS (SELECT doc_id,
        |             list_filter(string_split_regex(text, '\s+'), s -> len(s) > 0) AS toks
        |           FROM documents WHERE text IS NOT NULL)
        |SELECT CAST(doc_id AS BIGINT) AS id_a,
        |       CAST(doc_id + 1000000 AS BIGINT) AS id_b
        |FROM d WHERE len(toks) >= 23 AND doc_id % 50 = 0
        |ORDER BY id_a""".stripMargin,
    "q_pref_conflicts_incremental" ->
      """WITH d AS (SELECT doc_id,
        |             list_filter(string_split_regex(text, '\s+'), s -> len(s) > 0) AS toks
        |           FROM documents WHERE text IS NOT NULL)
        |SELECT CAST(doc_id + 1000000 AS BIGINT) AS id_new,
        |       CAST(doc_id AS BIGINT) AS id_old
        |FROM d WHERE len(toks) >= 23 AND doc_id % 50 = 0
        |ORDER BY id_new""".stripMargin,
    "q_url_redirects" ->
      """WITH m AS (SELECT max(doc_id) AS mx FROM documents)
        |SELECT concat('https://ex.com/', CAST(doc_id AS VARCHAR)) AS src,
        |  concat('https://ex.com/',
        |    CAST(least(doc_id - doc_id % 5 + 4, mx) AS VARCHAR)) AS final_url,
        |  CAST(least(doc_id - doc_id % 5 + 4, mx) - doc_id AS BIGINT) AS hops,
        |  false AS cycled
        |FROM documents, m
        |WHERE doc_id % 5 <> 4 AND doc_id < mx
        |ORDER BY src""".stripMargin,
    "q_embed_drift" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_index,
        |       CAST(count(*) AS BIGINT) AS n_batch,
        |       true AS psi_same_zero, true AS psi_skew_big
        |FROM embeddings WHERE embedding IS NOT NULL""".stripMargin,
    "q_dedup_remove" ->
      """SELECT doc_id AS id_new, doc_id - 2 AS id_old,
        |       CAST(4 AS INT) AS hamming
        |FROM documents WHERE doc_id % 3 = 2
        |ORDER BY id_new""".stripMargin,
    "q_text_remove" ->
      """WITH f AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
        |                    x -> len(x) > 0) AS w
        |           FROM documents WHERE doc_id % 3 <> 0),
        |dl AS (SELECT doc_id, len(w) AS dl FROM f WHERE len(w) > 0),
        |toks AS (SELECT doc_id, unnest(w) AS term FROM f),
        |post AS (SELECT term, doc_id, count(*) AS tf FROM toks
        |         WHERE term IN ('slow', 'merge', 'window') GROUP BY 1, 2),
        |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
        |dfs AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
        |scored AS (
        |  SELECT p.doc_id,
        |         sum(ln(1 + (s.n - f2.df + 0.5) / (f2.df + 0.5)) * p.tf * 2.2 /
        |             (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl))) AS score,
        |         CAST(sum(p.tf) AS BIGINT) AS tf_total,
        |         CAST(count(*) AS BIGINT) AS n_terms_hit
        |  FROM post p JOIN dfs f2 USING (term) JOIN dl d USING (doc_id)
        |  CROSS JOIN stats s GROUP BY 1)
        |SELECT rank, doc_id, tf_total, n_terms_hit FROM (
        |  SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
        |         doc_id, tf_total, n_terms_hit FROM scored) t
        |WHERE rank <= 10 ORDER BY rank""".stripMargin,
    "q_index_policy" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |       true AS compact_quiet, true AS compact_fired,
        |       true AS compact_quiet_after, true AS retrain_quiet,
        |       true AS retrain_fired, true AS nlist_ok,
        |       true AS hnsw_retrain_quiet, true AS hnsw_retrain_fired,
        |       true AS hnsw_rows_ok, true AS hnsw_geom_kept,
        |       true AS recal_fresh, true AS recal_achieves,
        |       true AS stale_refused
        |FROM embeddings WHERE embedding IS NOT NULL""".stripMargin,
    "q_ivf_retrain" ->
      """SELECT CAST(vec_id + 100000 AS BIGINT) AS query_id,
        |       CAST(vec_id AS BIGINT) AS top1,
        |       true AS found, true AS n_ok, true AS nlist_ok
        |FROM embeddings
        |WHERE embedding IS NOT NULL AND vec_id % 37 = 0
        |ORDER BY query_id""".stripMargin,
    "q_ann_hnsw" ->
      """SELECT CAST(vec_id + 100000 AS BIGINT) AS query_id,
        |       CAST(vec_id AS BIGINT) AS top1,
        |       true AS found, true AS recall_ok
        |FROM embeddings
        |WHERE embedding IS NOT NULL AND vec_id % 37 = 0
        |ORDER BY query_id""".stripMargin,
    "q_pipeline_ops" ->
      """WITH f AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
        |                    x -> len(x) > 0) AS w
        |           FROM documents WHERE doc_id % 37 <> 0),
        |dl AS (SELECT doc_id, len(w) AS dl FROM f WHERE len(w) > 0),
        |toks AS (SELECT doc_id, unnest(w) AS term FROM f),
        |post AS (SELECT term, doc_id, count(*) AS tf FROM toks
        |         WHERE term IN ('slow', 'merge', 'window') GROUP BY 1, 2),
        |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
        |dfs AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
        |scored AS (
        |  SELECT p.doc_id,
        |         sum(ln(1 + (s.n - f2.df + 0.5) / (f2.df + 0.5)) * p.tf * 2.2 /
        |             (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl))) AS score,
        |         CAST(sum(p.tf) AS BIGINT) AS tf_total,
        |         CAST(count(*) AS BIGINT) AS n_terms_hit
        |  FROM post p JOIN dfs f2 USING (term) JOIN dl d USING (doc_id)
        |  CROSS JOIN stats s GROUP BY 1)
        |SELECT rank, doc_id, tf_total, n_terms_hit,
        |       true AS ivf_stream_ok, true AS ivf_compact_ok,
        |       true AS ivf_handshake_enforced, true AS ivf_remove_ok,
        |       true AS ivf_retrain_ok, true AS ivf_copies_found,
        |       true AS ivf_removed_absent, true AS text_compact_fired,
        |       true AS text_handshake_enforced
        |FROM (
        |  SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
        |         doc_id, tf_total, n_terms_hit FROM scored) t
        |WHERE rank <= 10 ORDER BY rank""".stripMargin,
    "q_hnsw_nav_insert" ->
      """SELECT CAST(vec_id + 600000 AS BIGINT) AS query_id,
        |       CAST(vec_id + 500000 AS BIGINT) AS top1,
        |       true AS found, true AS nav_grown, true AS n_ok,
        |       true AS self_consistent, true AS cells_owned
        |FROM embeddings
        |WHERE embedding IS NOT NULL AND vec_id < 10
        |ORDER BY query_id""".stripMargin,
    "q_ann_target" ->
      """SELECT CAST(count(*) AS BIGINT) AS n,
        |       true AS cal_roundtrip, true AS curve_monotone,
        |       true AS mass_monotone, true AS ivf_t60_ok,
        |       true AS ivf_t85_ok, true AS ivf_indep_ok,
        |       true AS hnsw_t60_ok, true AS pq_t60_ok,
        |       true AS binary_pool_ok, true AS pool_monotone,
        |       true AS sq8_pool_ok, true AS pq_pool_ok
        |FROM embeddings WHERE embedding IS NOT NULL""".stripMargin,
    "q_index_remove" ->
      """SELECT CAST(sum(CASE WHEN vec_id % 37 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_after_ivf,
        |       CAST(sum(CASE WHEN vec_id % 37 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_after_ivfpq,
        |       true AS removed_absent, true AS copies_found
        |FROM embeddings WHERE embedding IS NOT NULL""".stripMargin,
    "q_stream_embed_drift" ->
      """SELECT CAST(200 AS BIGINT) AS n, true AS psi_ok
        |UNION ALL
        |SELECT CAST(count(*) AS BIGINT) AS n, true AS psi_ok
        |FROM embeddings WHERE embedding IS NOT NULL
        |ORDER BY n""".stripMargin,
    "q_ivfpq_append" ->
      """SELECT CAST(vec_id + 100000 AS BIGINT) AS query_id,
        |       CAST(vec_id AS BIGINT) AS top1, true AS found
        |FROM embeddings
        |WHERE vec_id % 2 = 1 AND vec_id < 10 AND embedding IS NOT NULL
        |ORDER BY query_id""".stripMargin,
    "q_stream_ivf_append" ->
      """SELECT CAST(vec_id + 100000 AS BIGINT) AS query_id,
        |       CAST(vec_id AS BIGINT) AS top1, true AS found, true AS n_ok
        |FROM embeddings
        |WHERE vec_id % 2 = 1 AND vec_id < 10 AND embedding IS NOT NULL
        |ORDER BY query_id""".stripMargin,
    "q_ivf_compact" ->
      """SELECT CAST(vec_id + 100000 AS BIGINT) AS query_id,
        |       CAST(vec_id AS BIGINT) AS top1, true AS found, true AS n_ok,
        |       true AS folded_ok
        |FROM embeddings
        |WHERE vec_id % 4 = 1 AND vec_id < 10 AND embedding IS NOT NULL
        |ORDER BY query_id""".stripMargin,
    "q_dedup_winnow" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_base, true AS found_ok,
        |       true AS no_hallucination, true AS density_ok,
        |       true AS incremental_ok
        |FROM documents WHERE text IS NOT NULL AND n_chars >= 400""".stripMargin,
    "q_dedup_cdc" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_base, true AS covers_ok,
        |       true AS found_ok, true AS no_hallucination
        |FROM documents WHERE text IS NOT NULL AND n_chars >= 400""".stripMargin,
    "q_dedup_cdc_incremental" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_base, true AS found_ok,
        |       true AS no_junk
        |FROM documents WHERE text IS NOT NULL AND n_chars >= 400""".stripMargin,
    "q_span_corruption" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(len(list_filter(string_split_regex(text, '\s+'),
        |        x -> len(x) > 0)) AS BIGINT) AS nt
        |  FROM documents WHERE text IS NOT NULL)
        |SELECT doc_id, nt AS n_tokens,
        |       CAST(nt * 15 // 100 AS BIGINT) AS n_corrupted,
        |       CAST(CASE WHEN nt * 15 // 100 = 0 THEN 0
        |            ELSE greatest(1, (nt * 15 // 100) // 3) END AS BIGINT)
        |         AS n_spans,
        |       true AS reconstructs, true AS sentinel_ok
        |FROM d ORDER BY doc_id""".stripMargin,
    "q_manifest" ->
      """WITH tok AS (
        |  SELECT source,
        |         CAST(concat('0x', substr(md5(concat(
        |           md5(CAST(doc_id AS VARCHAR)),
        |           coalesce(md5(text), chr(1)))), 1, 15)) AS BIGINT) AS t
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
        |       bit_xor(t) AS content_hash,
        |       CASE WHEN source = (SELECT source FROM documents WHERE doc_id = 7)
        |            THEN 'changed' ELSE 'unchanged' END AS status
        |FROM tok GROUP BY source ORDER BY source""".stripMargin,
    "q_pack_semantic" ->
      """WITH d AS (SELECT doc_id,
        |    len(list_filter(string_split_regex(text, '\s+'),
        |        x -> len(x) > 0)) AS nt
        |  FROM documents JOIN embeddings ON doc_id = vec_id
        |  WHERE text IS NOT NULL AND embedding IS NOT NULL)
        |SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(nt + 1) AS BIGINT) AS total_slots,
        |       CAST((sum(nt + 1) - 1) // 512 + 1 AS BIGINT) AS n_seqs,
        |       true AS adjacency_gain
        |FROM d""".stripMargin,
    "q_pipeline_curation" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_input,
        |       true AS dedup_ok, true AS downweight_ok,
        |       true AS leak_audit_ok, true AS tokens_conserved,
        |       true AS manifest_stable
        |FROM documents WHERE text IS NOT NULL""".stripMargin,
    "q_stream_manifest" ->
      """WITH tok AS (
        |  SELECT source,
        |         CAST(concat('0x', substr(md5(concat(
        |           md5(CAST(doc_id AS VARCHAR)),
        |           coalesce(md5(text), chr(1)))), 1, 15)) AS BIGINT) AS t
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
        |       bit_xor(t) AS content_hash
        |FROM tok GROUP BY source ORDER BY source""".stripMargin,
    "q_multimodal_align" ->
      """WITH flat AS (SELECT vec_id, r.i AS i, embedding[r.i] AS x
        |              FROM embeddings, range(1, 65) r(i)
        |              WHERE embedding IS NOT NULL),
        |pairs AS (SELECT vec_id,
        |            CASE WHEN vec_id % 2 = 0 THEN vec_id ELSE vec_id - 1 END AS tid
        |          FROM embeddings WHERE embedding IS NOT NULL),
        |dots AS (SELECT p.vec_id, sum(a.x * b.x) AS dot,
        |                sqrt(sum(a.x * a.x)) AS na, sqrt(sum(b.x * b.x)) AS nb
        |         FROM pairs p
        |         JOIN flat a ON a.vec_id = p.vec_id
        |         JOIN flat b ON b.vec_id = p.tid AND b.i = a.i
        |         GROUP BY p.vec_id)
        |SELECT CAST(vec_id AS BIGINT) AS vec_id,
        |       (dot / (na * nb)) >= 0.999 AS aligned,
        |       round(dot / (na * nb), 4) AS score4
        |FROM dots ORDER BY vec_id""".stripMargin,
    "q_embed_topk" ->
      """WITH flat AS (SELECT vec_id, r.i AS i, embedding[r.i] AS x
        |              FROM embeddings, range(1, 65) r(i)),
        |norms AS (SELECT vec_id, sqrt(sum(x * x)) AS n FROM flat GROUP BY 1),
        |dots AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, sum(q.x * c.x) AS dot
        |         FROM flat q JOIN flat c ON q.i = c.i
        |         WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id GROUP BY 1, 2),
        |cos AS (SELECT query_id, neighbor_id, dot / (nq.n * nc.n) AS c
        |        FROM dots JOIN norms nq ON query_id = nq.vec_id
        |                  JOIN norms nc ON neighbor_id = nc.vec_id)
        |SELECT query_id, rank, neighbor_id FROM (
        |  SELECT query_id, neighbor_id,
        |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS BIGINT) AS rank
        |  FROM cos) t
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "q_mine_hard" ->
      """WITH lab AS (SELECT doc_id AS id, lang FROM documents),
        |flat AS (SELECT vec_id, r.i AS i, embedding[r.i] AS x
        |         FROM embeddings, range(1, 65) r(i)),
        |norms AS (SELECT vec_id, sqrt(sum(x * x)) AS n FROM flat GROUP BY 1),
        |dots AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, sum(q.x * c.x) AS dot
        |         FROM flat q JOIN flat c ON q.i = c.i
        |         WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id GROUP BY 1, 2),
        |cos AS (SELECT query_id, neighbor_id, dot / (nq.n * nc.n) AS c
        |        FROM dots JOIN norms nq ON query_id = nq.vec_id
        |                  JOIN norms nc ON neighbor_id = nc.vec_id),
        |neg AS (SELECT query_id, neighbor_id, c,
        |               ql.lang AS query_label, nl.lang AS neighbor_label
        |        FROM cos JOIN lab ql ON query_id = ql.id
        |                 JOIN lab nl ON neighbor_id = nl.id
        |        WHERE ql.lang <> nl.lang)
        |SELECT query_id, rank, neighbor_id, query_label, neighbor_label FROM (
        |  SELECT query_id, neighbor_id, query_label, neighbor_label,
        |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS BIGINT) AS rank
        |  FROM neg) t
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "q_text_stats" ->
      """SELECT source, count(*) AS docs,
        |       CAST(sum(len(string_split_regex(text, '\s+'))) AS BIGINT) AS tokens,
        |       CAST(sum(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+'))) AS BIGINT) AS bpe_tokens,
        |       CAST(sum(n_chars) AS BIGINT) AS chars_total,
        |       count(DISTINCT lang) AS langs
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "q_text_quality" ->
      """SELECT source,
        |  CAST(sum(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END) AS BIGINT) AS long_cnt,
        |  CAST(sum(CASE WHEN tokens >= 50 THEN 1 ELSE 0 END) AS BIGINT) AS rich_cnt,
        |  CAST(sum(CASE WHEN score > 0.7 THEN 1 ELSE 0 END) AS BIGINT) AS hq_cnt
        |FROM (
        |  SELECT source, n_chars, tokens,
        |    round((least(n_chars / 500.0, 1.0)
        |         + (CASE WHEN (n_chars - tokens + 1) * 1.0 / tokens BETWEEN 3.0 AND 8.0
        |                 THEN 1.0 ELSE 0.5 END)
        |         + least(tokens / 100.0, 1.0)) / 3.0, 4) AS score
        |  FROM (SELECT source, n_chars,
        |               len(string_split_regex(text, '\s+')) AS tokens
        |        FROM documents) x) y
        |GROUP BY source ORDER BY source""".stripMargin,
    "q_topk_words" ->
      """SELECT w AS item, count(*) AS cnt FROM (
        |  SELECT unnest(string_split_regex(text, '\s+')) AS w FROM documents) t
        |GROUP BY w ORDER BY cnt DESC, item LIMIT 10""".stripMargin,
    "q_diverse" ->
      """SELECT CAST(8 AS BIGINT) AS k_selected,
        |       CAST(min(vec_id) AS BIGINT) AS seed_id,
        |       true AS more_diverse_than_prefix
        |FROM embeddings""".stripMargin,
    // n_kept_global = ceil of ONE IEEE multiply — bit-identical
    // cross-engine (the repo's pure +-*/ rule)
    "q_proto_prune" ->
      """SELECT count(*) AS n_input, true AS counts_ok, true AS rule_ok,
        |       CAST(ceil(0.7 * count(*)) AS BIGINT) AS n_kept_global,
        |       true AS global_rule_ok
        |FROM embeddings WHERE embedding IS NOT NULL""".stripMargin,
    "q_vocab" ->
      """WITH toks AS (SELECT unnest(string_split_regex(text, '\s+')) AS w
        |              FROM documents),
        |vocab AS (SELECT w FROM (SELECT w, count(*) AS c FROM toks
        |                         GROUP BY w ORDER BY c DESC, w LIMIT 100) v)
        |SELECT CAST(count(*) AS BIGINT) AS total_tokens,
        |       CAST(count(*) FILTER (w NOT IN (SELECT w FROM vocab)) AS BIGINT)
        |         AS oov_tokens,
        |       CAST((SELECT count(*) FROM vocab) AS BIGINT) AS vocab_size
        |FROM toks""".stripMargin,
    // double-space symbol separators so replace()'s left-to-right
    // non-overlapping scan matches symbol-level BPE merging even for
    // adjacent occurrences (single-space sentinels would share the
    // boundary space and skip every second merge site)
    "q_bpe" ->
      """WITH toks AS (SELECT unnest(list_filter(string_split_regex(text, '\s+'),
        |                x -> len(x) > 0)) AS w FROM documents),
        |words AS (SELECT w, count(*) AS c FROM toks GROUP BY w),
        |seq1 AS (SELECT '  ' || array_to_string(string_split(w, ''), '  ') || '  ' AS s, c
        |         FROM words),
        |p1 AS (SELECT l AS lft, r AS rgt, CAST(sum(cnt) AS BIGINT) AS f FROM (
        |         SELECT sp[i] AS l, sp[i+1] AS r, c AS cnt
        |         FROM (SELECT string_split(trim(s), '  ') AS sp, c FROM seq1),
        |              unnest(range(1, len(sp))) t(i)) GROUP BY l, r),
        |m1 AS (SELECT lft, rgt, f FROM p1 ORDER BY f DESC, lft, rgt LIMIT 1),
        |seq2 AS (SELECT replace(s,
        |                  ' ' || (SELECT lft FROM m1) || '  ' || (SELECT rgt FROM m1) || ' ',
        |                  ' ' || (SELECT lft || rgt FROM m1) || ' ') AS s, c
        |         FROM seq1),
        |p2 AS (SELECT l AS lft, r AS rgt, CAST(sum(cnt) AS BIGINT) AS f FROM (
        |         SELECT sp[i] AS l, sp[i+1] AS r, c AS cnt
        |         FROM (SELECT string_split(trim(s), '  ') AS sp, c FROM seq2),
        |              unnest(range(1, len(sp))) t(i)) GROUP BY l, r),
        |m2 AS (SELECT lft, rgt, f FROM p2 ORDER BY f DESC, lft, rgt LIMIT 1)
        |SELECT CAST(1 AS BIGINT) AS "rank", lft, rgt, f FROM m1
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), lft, rgt, f FROM m2""".stripMargin,
    "q_lm_score" ->
      """WITH toks AS (SELECT doc_id, unnest(list_filter(
        |                string_split_regex(text, '\s+'), x -> len(x) > 0)) AS token
        |              FROM documents),
        |cnt AS (SELECT token, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY token),
        |tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM toks)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS tokens,
        |       round(avg(-ln(c / (SELECT n FROM tot))), 4) AS score
        |FROM toks JOIN cnt USING (token) GROUP BY doc_id""".stripMargin,
    "q_ccnet_tiers" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(3 AS BIGINT) AS tiers,
        |       true AS balanced_ok
        |FROM documents
        |WHERE text IS NOT NULL
        |  AND len(list_filter(string_split_regex(text, '\s+'), s -> len(s) > 0)) >= 1
        |""".stripMargin,
    "q_keywords" ->
      """WITH toks AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf FROM (
        |                SELECT doc_id, unnest(list_filter(
        |                  string_split_regex(text, '\s+'), x -> len(x) > 0)) AS token
        |                FROM documents) GROUP BY doc_id, token),
        |dfm AS (SELECT token, CAST(count(*) AS BIGINT) AS dfreq FROM toks GROUP BY token),
        |ranked AS (SELECT toks.doc_id, toks.token, toks.tf, dfm.dfreq,
        |             row_number() OVER (PARTITION BY toks.doc_id
        |               ORDER BY CAST(toks.tf AS DOUBLE) / dfm.dfreq DESC, toks.token) AS rk
        |           FROM toks JOIN dfm USING (token))
        |SELECT doc_id, CAST(rk AS BIGINT) AS "rank", token AS term, tf, dfreq
        |FROM ranked WHERE rk <= 3""".stripMargin,
    "q_text_fingerprint" ->
      """SELECT count(DISTINCT regexp_replace(text, '\s+', ' ', 'g')) AS distinct_fp,
        |       count(DISTINCT regexp_replace(text, '\s+', ' ', 'g')) AS distinct_norm,
        |       true AS collision_free FROM documents""".stripMargin,
    // replicates the stopword heuristic: only the English stopword list
    // intersects this corpus's vocabulary, so predicted = en iff any
    // English stopword occurs, else und
    "q_lang_id" ->
      """SELECT lang,
        |  CASE WHEN regexp_matches(text,
        |    '\b(a|the|of|and|to|in|is|it|that|on|for|with|as|was|are)\b')
        |  THEN 'en' ELSE 'und' END AS predicted,
        |  count(*) AS cnt
        |FROM documents GROUP BY 1, 2 ORDER BY lang, predicted""".stripMargin,
    "q_multimodal_frames" ->
      """WITH v AS (SELECT least(octet_length(encode(text)), 384) // 64 AS nf
        |           FROM documents WHERE lang = 'fr'),
        |t AS (SELECT least((nf + 1) // 2, 2) AS tk FROM v)
        |SELECT CAST(coalesce(sum(tk), 0) AS BIGINT) AS frames,
        |       CAST(coalesce(sum(tk) * 64, 0) AS BIGINT) AS bytes_total,
        |       CAST(coalesce(sum(tk * (tk - 1)), 0) AS BIGINT) AS idx_sum
        |FROM t""".stripMargin,
    "q_multimodal_decode" ->
      """SELECT count(*) AS imgs,
        |       CAST(sum(16 + doc_id % 32) AS BIGINT) AS width_sum,
        |       CAST(sum(8 + doc_id % 16) AS BIGINT) AS height_sum
        |FROM documents WHERE doc_id % 10 = 0""".stripMargin,
    "q_multimodal_audio" ->
      """SELECT CAST(count(*) AS BIGINT) AS clips,
        |       CAST(8000 * count(*) AS BIGINT) AS rate_sum,
        |       CAST(count(*) AS BIGINT) AS channel_sum,
        |       CAST(sum(44 + octet_length(encode(text))) AS BIGINT) AS bytes_sum,
        |       true AS rms_ok
        |FROM documents WHERE doc_id % 7 = 0""".stripMargin,
    "q_multimodal_video" ->
      """SELECT count(*) AS clips,
        |       CAST(sum(32 + doc_id % 16) AS BIGINT) AS width_sum,
        |       CAST(sum(24 + doc_id % 8) AS BIGINT) AS height_sum,
        |       true AS envelope_ok,
        |       CAST(sum(2 + doc_id % 4) AS BIGINT) AS keyframes,
        |       CAST(sum(((2 + doc_id % 4) * (1 + doc_id % 4)) // 2) AS BIGINT) AS idx_sum
        |FROM documents WHERE doc_id % 11 = 0""".stripMargin,
    "q_multimodal_pdf" ->
      """SELECT count(*) AS docs, true AS text_roundtrip,
        |       true AS pages_ok, true AS chars_ok
        |FROM documents WHERE doc_id % 13 = 0""".stripMargin,
    "q_multimodal_dedup" ->
      """WITH d AS (SELECT doc_id, doc_id // 3 AS g, doc_id % 3 AS v
        |           FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(CASE WHEN a.v = 0 AND b.v = 1 THEN 1
        |                 WHEN a.v = 0 AND b.v = 2 THEN 4
        |                 ELSE 5 END AS INT) AS hamming
        |FROM d a JOIN d b ON a.g = b.g AND a.doc_id < b.doc_id
        |ORDER BY id_a, id_b""".stripMargin,
    "q_image_phash" ->
      """WITH d AS (SELECT doc_id, doc_id // 3 AS g, doc_id % 3 AS v
        |           FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(CASE WHEN a.v = 0 AND b.v = 1 THEN 1
        |                 WHEN a.v = 0 AND b.v = 2 THEN 4
        |                 ELSE 5 END AS INT) AS hamming
        |FROM d a JOIN d b ON a.g = b.g AND a.doc_id < b.doc_id
        |ORDER BY id_a, id_b""".stripMargin,
    "q_video_dedup" ->
      """SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(1 AS INT) AS hamming, true AS single_missed
        |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        |WHERE a.doc_id % 2 = 0
        |ORDER BY id_a, id_b""".stripMargin,
    "q_keyword_scan_folded" ->
      """SELECT doc_id,
        |  CAST(CASE CAST(doc_id % 4 AS INTEGER)
        |    WHEN 0 THEN 2 WHEN 1 THEN 1 WHEN 2 THEN 1 ELSE 0 END AS BIGINT)
        |    AS hits,
        |  CAST(CASE WHEN doc_id % 4 IN (0, 1, 2) THEN 1 ELSE 0 END AS INT)
        |    AS patterns
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_keyword_scrub" ->
      """WITH a AS (SELECT doc_id,
        |             text || ' ' || CASE CAST(doc_id % 3 AS INTEGER)
        |               WHEN 0 THEN 'spamword buynow spamword'
        |               WHEN 1 THEN 'zzqx' ELSE 'cleantail' END AS t
        |           FROM documents)
        |SELECT doc_id,
        |       replace(replace(replace(t, 'spamword', '********'),
        |               'buynow', '******'), 'zzqx', '****') AS clean
        |FROM a ORDER BY doc_id""".stripMargin,
    "q_keyword_scan" ->
      """WITH a AS (SELECT doc_id,
        |             text || ' ' || CASE CAST(doc_id % 3 AS INTEGER)
        |               WHEN 0 THEN 'spamword buynow spamword'
        |               WHEN 1 THEN 'zzqx' ELSE 'cleantail' END AS t
        |           FROM documents),
        |c AS (SELECT doc_id,
        |  CAST(coalesce((length(t) - length(replace(t, 'spamword', ''))) // 8,
        |       0) AS BIGINT) AS h1,
        |  CAST(coalesce((length(t) - length(replace(t, 'buynow', ''))) // 6,
        |       0) AS BIGINT) AS h2,
        |  CAST(coalesce((length(t) - length(replace(t, 'zzqx', ''))) // 4,
        |       0) AS BIGINT) AS h3
        |  FROM a)
        |SELECT doc_id, h1 + h2 + h3 AS hits,
        |       CAST(CAST(h1 > 0 AS INTEGER) + CAST(h2 > 0 AS INTEGER) +
        |            CAST(h3 > 0 AS INTEGER) AS INTEGER) AS patterns
        |FROM c ORDER BY doc_id""".stripMargin,
    "q_fim" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS n
        |           FROM documents WHERE text IS NOT NULL),
        |p AS (SELECT doc_id, text, n,
        |             (n * (1 + doc_id % 5)) // 10 AS p1 FROM d),
        |q AS (SELECT doc_id, text, n, p1,
        |             p1 + ((n - p1) * (1 + doc_id % 3)) // 4 AS p2 FROM p),
        |s AS (SELECT doc_id,
        |        substr(text, 1, CAST(p1 AS INTEGER)) AS pre,
        |        substr(text, CAST(p1 + 1 AS INTEGER),
        |               CAST(p2 - p1 AS INTEGER)) AS mid,
        |        substr(text, CAST(p2 + 1 AS INTEGER),
        |               CAST(n - p2 AS INTEGER)) AS suf
        |      FROM q)
        |SELECT doc_id,
        |  '<|fim_pre|>' || pre || '<|fim_suf|>' || suf || '<|fim_mid|>' || mid
        |    AS psm,
        |  '<|fim_suf|>' || suf || '<|fim_pre|>' || pre || '<|fim_mid|>' || mid
        |    AS spm
        |FROM s ORDER BY doc_id""".stripMargin,
    "q_mix_epochs" ->
      """WITH d AS (SELECT source, doc_id,
        |             coalesce(len(list_filter(string_split_regex(text, '\s+'),
        |                                      s -> len(s) > 0)), 0) AS tok
        |           FROM documents),
        |t AS (SELECT source, sum(tok) AS total FROM d GROUP BY 1),
        |c AS (SELECT source, doc_id, tok,
        |             sum(tok) OVER (PARTITION BY source
        |                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        |                            ROWS UNBOUNDED PRECEDING) AS cum
        |      FROM d),
        |j AS (SELECT c.source, c.doc_id, c.tok, c.cum,
        |             CAST(6000 // t.total AS BIGINT) AS e,
        |             CAST(6000 % t.total AS BIGINT) AS rem
        |      FROM c JOIN t ON c.source = t.source WHERE t.total > 0),
        |x AS (SELECT source, doc_id, tok, cum, e, rem,
        |             unnest(generate_series(CAST(0 AS BIGINT), e)) AS epoch
        |      FROM j)
        |SELECT source, count(*) AS rows_out, CAST(sum(tok) AS BIGINT) AS tok_out,
        |       CAST(sum(doc_id * (epoch + 1)) AS BIGINT) AS weighted_id_sum,
        |       CAST(max(epoch) AS BIGINT) AS max_epoch
        |FROM x WHERE epoch < e OR cum <= rem
        |GROUP BY source ORDER BY source""".stripMargin,
    "q_bitext_margin" ->
      """WITH flat AS (SELECT vec_id, r.i AS i, embedding[r.i] AS x
        |              FROM embeddings, range(1, 65) r(i)),
        |norms AS (SELECT vec_id, sqrt(sum(x * x)) AS n FROM flat GROUP BY 1),
        |dots AS (SELECT qa.vec_id AS a_id, qb.vec_id AS b_id,
        |                sum(qa.x * qb.x) AS dot
        |         FROM flat qa JOIN flat qb ON qa.i = qb.i
        |         WHERE qa.vec_id < 24 AND qb.vec_id >= 24 GROUP BY 1, 2),
        |cosv AS (SELECT a_id, b_id, dot / (na.n * nb.n) AS c
        |         FROM dots JOIN norms na ON a_id = na.vec_id
        |                   JOIN norms nb ON b_id = nb.vec_id),
        |ra AS (SELECT a_id, b_id, c, row_number() OVER (
        |         PARTITION BY a_id ORDER BY c DESC, b_id) AS rka FROM cosv),
        |rb AS (SELECT a_id, b_id, c, row_number() OVER (
        |         PARTITION BY b_id ORDER BY c DESC, a_id) AS rkb FROM cosv),
        |aa AS (SELECT a_id, avg(c) AS avga FROM ra WHERE rka <= 4 GROUP BY 1),
        |ab AS (SELECT b_id, avg(c) AS avgb FROM rb WHERE rkb <= 4 GROUP BY 1)
        |SELECT r.a_id, r.b_id, CAST(r.rka AS BIGINT) AS rank,
        |       round(r.c, 4) AS cos4,
        |       round(r.c / ((aa.avga + ab.avgb) / 2), 4) AS margin4
        |FROM ra r JOIN aa ON r.a_id = aa.a_id JOIN ab ON r.b_id = ab.b_id
        |WHERE r.rka <= 3
        |ORDER BY r.a_id, r.b_id""".stripMargin,
    "q_bitext_margin_indexed" ->
      """SELECT CAST(vec_id + 10000 AS BIGINT) AS a_id,
        |       CAST(vec_id AS BIGINT) AS b_id,
        |       CAST(1 AS BIGINT) AS rank,
        |       1.0 AS cos4, true AS margin_ge_1
        |FROM embeddings WHERE vec_id BETWEEN 24 AND 35
        |ORDER BY a_id""".stripMargin,
    "q_rank_correlation" ->
      """WITH d AS (
        |  SELECT source, CAST(n_chars AS DOUBLE) AS x,
        |         CAST(len(list_filter(string_split_regex(text, '\s+'),
        |           t -> len(t) > 0)) AS DOUBLE) AS y
        |  FROM documents WHERE n_chars IS NOT NULL AND text IS NOT NULL),
        |r AS (
        |  SELECT source, x, y,
        |    CAST(rank() OVER (PARTITION BY source ORDER BY x) AS DOUBLE) +
        |      (CAST(count(*) OVER (PARTITION BY source, x) AS DOUBLE) - 1) / 2
        |      AS rx,
        |    CAST(rank() OVER (PARTITION BY source ORDER BY y) AS DOUBLE) +
        |      (CAST(count(*) OVER (PARTITION BY source, y) AS DOUBLE) - 1) / 2
        |      AS ry
        |  FROM d),
        |a AS (
        |  SELECT source, CAST(count(*) AS DOUBLE) AS n,
        |         sum(x) AS sx, sum(x*x) AS ssx, sum(y) AS sy, sum(y*y) AS ssy,
        |         sum(x*y) AS sxy, sum(rx) AS srx, sum(rx*rx) AS ssrx,
        |         sum(ry) AS sry, sum(ry*ry) AS ssry, sum(rx*ry) AS srxy
        |  FROM r GROUP BY source)
        |SELECT source, CAST(n AS BIGINT) AS n,
        |  CASE WHEN n*ssx - sx*sx > 0 AND n*ssy - sy*sy > 0
        |       THEN round((n*sxy - sx*sy) /
        |            sqrt((n*ssx - sx*sx) * (n*ssy - sy*sy)), 4) END AS pearson4,
        |  CASE WHEN n*ssrx - srx*srx > 0 AND n*ssry - sry*sry > 0
        |       THEN round((n*srxy - srx*sry) /
        |            sqrt((n*ssrx - srx*srx) * (n*ssry - sry*sry)), 4)
        |  END AS spearman4
        |FROM a ORDER BY source""".stripMargin,
    "q_pack_ffd" ->
      """SELECT source, CAST(count(*) AS BIGINT) AS docs,
        |       CAST(sum(n_chars) AS BIGINT) AS chars,
        |       true AS fits_ok, true AS halfempty_ok
        |FROM documents WHERE n_chars IS NOT NULL
        |GROUP BY source ORDER BY source""".stripMargin,
    "q_text_overlap" ->
      """WITH f AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
        |           x -> len(x) > 0) AS w
        |  FROM documents WHERE text IS NOT NULL),
        |base AS (SELECT doc_id, w[1:(3*len(w))//4] AS c, w AS r FROM f),
        |lens AS (SELECT doc_id, len(c) AS cl, len(r) AS rl FROM base),
        |ns AS (SELECT unnest([1, 2, 3, 4]) AS n),
        |cg AS (SELECT doc_id, n, unnest(list_transform(range(1, len(c) - n + 2),
        |              i -> array_to_string(c[i:i+n-1], chr(1)))) AS g
        |       FROM base, ns WHERE len(c) >= n),
        |rg AS (SELECT doc_id, n, unnest(list_transform(range(1, len(r) - n + 2),
        |              i -> array_to_string(r[i:i+n-1], chr(1)))) AS g
        |       FROM base, ns WHERE len(r) >= n),
        |cc AS (SELECT doc_id, n, g, count(*) AS c FROM cg GROUP BY 1, 2, 3),
        |rc AS (SELECT doc_id, n, g, count(*) AS c FROM rg GROUP BY 1, 2, 3),
        |mm AS (SELECT cc.doc_id, cc.n, sum(least(cc.c, rc.c)) AS m
        |       FROM cc JOIN rc ON cc.doc_id = rc.doc_id AND cc.n = rc.n
        |                      AND cc.g = rc.g
        |       GROUP BY 1, 2),
        |agg AS (SELECT l.doc_id, l.cl, l.rl,
        |          CAST(coalesce(max(CASE WHEN n = 1 THEN m END), 0) AS BIGINT) AS m1,
        |          CAST(coalesce(max(CASE WHEN n = 2 THEN m END), 0) AS BIGINT) AS m2,
        |          CAST(coalesce(max(CASE WHEN n = 3 THEN m END), 0) AS BIGINT) AS m3,
        |          CAST(coalesce(max(CASE WHEN n = 4 THEN m END), 0) AS BIGINT) AS m4
        |        FROM lens l LEFT JOIN mm ON l.doc_id = mm.doc_id
        |        GROUP BY 1, 2, 3),
        |pr AS (SELECT doc_id, cl, rl, m1, m2, m3, m4,
        |         CASE WHEN cl = 0 THEN NULL
        |              WHEN m1 = 0 OR m2 = 0 OR m3 = 0 OR m4 = 0 THEN 0.0
        |              ELSE round(least(1.0, exp(1.0 - rl / cl)) *
        |                exp((ln(m1 / cl) + ln(m2 / (cl - 1)) + ln(m3 / (cl - 2)) +
        |                     ln(m4 / (cl - 3))) / 4), 4)
        |         END AS bleu4,
        |         CASE WHEN cl > 0 THEN m1 / cl ELSE 0.0 END AS rouge1_p,
        |         CASE WHEN rl > 0 THEN m1 / rl ELSE 0.0 END AS rouge1_r,
        |         CASE WHEN cl > 1 THEN m2 / (cl - 1) ELSE 0.0 END AS r2p,
        |         CASE WHEN rl > 1 THEN m2 / (rl - 1) ELSE 0.0 END AS r2r
        |       FROM agg)
        |SELECT doc_id, cl AS cand_tokens, rl AS ref_tokens, m1, m2, m3, m4,
        |       bleu4, rouge1_p, rouge1_r,
        |       CASE WHEN rouge1_p + rouge1_r > 0
        |            THEN 2 * rouge1_p * rouge1_r / (rouge1_p + rouge1_r)
        |            ELSE 0.0 END AS rouge1_f1,
        |       CASE WHEN r2p + r2r > 0
        |            THEN 2 * r2p * r2r / (r2p + r2r)
        |            ELSE 0.0 END AS rouge2_f1
        |FROM pr ORDER BY doc_id""".stripMargin,
    "q_dedup_incremental_media" ->
      """SELECT doc_id AS id_new, doc_id - 2 + o.k AS id_old,
        |       CAST(CASE WHEN o.k = 0 THEN 4 ELSE 5 END AS INT) AS hamming
        |FROM documents, (SELECT unnest([0, 1]) AS k) o
        |WHERE doc_id % 3 = 2
        |ORDER BY id_new, id_old""".stripMargin,
    "q_audio_dedup" ->
      """WITH d AS (SELECT doc_id, doc_id // 3 AS g, doc_id % 3 AS v
        |           FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(CASE WHEN a.v = 0 AND b.v = 1 THEN 1
        |                 WHEN a.v = 0 AND b.v = 2 THEN 4
        |                 ELSE 5 END AS INT) AS hamming
        |FROM d a JOIN d b ON a.g = b.g AND a.doc_id < b.doc_id
        |ORDER BY id_a, id_b""".stripMargin,
    "q_unicode_fold" ->
      """SELECT doc_id,
        |  text || CASE doc_id % 4
        |    WHEN 0 THEN ' file Test cafe'
        |    WHEN 1 THEN ' naive Muller 1/2'
        |    WHEN 2 THEN ' "quoted" - it''s ...'
        |    ELSE ' No IX / plain' END AS folded
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_url_filter" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    CASE doc_id % 7
        |      WHEN 0 THEN 'www.badcasino.com'
        |      WHEN 1 THEN 'sub.tracker.net'
        |      WHEN 2 THEN 'example' || (doc_id % 5) || '.com'
        |      WHEN 3 THEN 'news.example.co.uk'
        |      WHEN 4 THEN 'badcasino.com.safe.org'
        |      WHEN 5 THEN 'shop.example' || (doc_id % 5) || '.com'
        |      ELSE 'BadCasino.COM' END AS host,
        |    '/page/' || doc_id ||
        |      CASE WHEN doc_id % 3 = 0 THEN '/free-poker-online' ELSE '' END ||
        |      CASE WHEN doc_id % 11 = 0 THEN '/xxx-ads' ELSE '' END AS pth
        |  FROM documents),
        |k AS (SELECT doc_id, lower(host) AS h,
        |             lower('http://' || host || pth) AS url FROM u),
        |t2 AS (
        |  SELECT doc_id,
        |    (h = 'badcasino.com' OR h LIKE '%.badcasino.com'
        |     OR h = 'tracker.net' OR h LIKE '%.tracker.net') AS domain_blocked,
        |    (CASE WHEN contains(url, 'xxx') THEN 1 ELSE 0 END +
        |     CASE WHEN contains(url, 'porn') THEN 1 ELSE 0 END) AS strict_hits,
        |    CAST(len(list_filter(['poker', 'bet', 'online'],
        |      w -> list_contains(string_split_regex(url, '[^a-z0-9]+'), w)))
        |      AS INTEGER) AS soft_hits
        |  FROM k)
        |SELECT doc_id, domain_blocked, strict_hits, soft_hits,
        |  (NOT domain_blocked AND strict_hits = 0 AND soft_hits < 2) AS allowed
        |FROM t2 ORDER BY doc_id""".stripMargin,
    "q_scrub_cc" ->
      """SELECT doc_id, text || CASE doc_id % 5
        |    WHEN 0 THEN ' pay <CC> now'
        |    WHEN 1 THEN ' pay 4111-1111-1111-1112 now'
        |    WHEN 2 THEN ' mc <CC> ok'
        |    WHEN 3 THEN ' id 1234 5678 9012 ok'
        |    ELSE ' acct 123456789012345678901 x' END AS scrubbed
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_dedup_containment" ->
      """WITH d AS (SELECT doc_id,
        |             list_filter(string_split_regex(lower(text), '\s+'),
        |                         s -> len(s) > 0) AS toks
        |           FROM documents WHERE text IS NOT NULL),
        |p AS (SELECT doc_id + 1000000 AS id_p, toks[1:30] AS toks
        |      FROM d WHERE doc_id % 17 = 0 AND len(toks) >= 30),
        |pg AS (SELECT DISTINCT id_p, array_to_string(toks[i:i+4], ' ') AS g
        |       FROM p, range(1, 27) u(i)),
        |cg AS (SELECT DISTINCT doc_id AS id_c, array_to_string(toks[i:i+4], ' ') AS g
        |       FROM d, range(1, 4000) u(i) WHERE u.i <= len(toks) - 4),
        |stop AS (SELECT g FROM cg GROUP BY g HAVING count(*) > 1024),
        |inter AS (SELECT id_p, id_c, count(*) AS inter
        |          FROM pg JOIN cg USING (g)
        |          WHERE g NOT IN (SELECT g FROM stop)
        |          GROUP BY 1, 2),
        |szp AS (SELECT id_p, count(*) AS sz_p FROM pg
        |        WHERE g NOT IN (SELECT g FROM stop) GROUP BY 1)
        |SELECT id_p, id_c, inter, sz_p
        |FROM inter JOIN szp USING (id_p)
        |WHERE id_p <> id_c AND inter >= sz_p * 0.9
        |ORDER BY id_p, id_c""".stripMargin,
    "q_jsonl" ->
      """SELECT count(*) AS n_rows, CAST(sum(doc_id) AS BIGINT) AS id_sum,
        |       CAST(sum(length(text)) AS BIGINT) AS chars,
        |       CAST(3 AS BIGINT) AS corrupt
        |FROM documents""".stripMargin,
    "q_csv" ->
      """SELECT count(*) AS n_rows, CAST(sum(doc_id) AS BIGINT) AS id_sum,
        |       CAST(count(DISTINCT lang) AS BIGINT) AS langs,
        |       CAST(2 AS BIGINT) AS corrupt
        |FROM documents""".stripMargin,
    "q_page_meta" ->
      """SELECT doc_id,
        |       'Doc ' || doc_id || ' & more' AS title,
        |       'Desc ' || (doc_id % 13) AS description,
        |       CASE WHEN doc_id % 3 = 0 THEN 'http://c.org/' || doc_id END AS canonical,
        |       CASE WHEN doc_id % 2 = 0 THEN 'en' ELSE 'de' END AS lang
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_robots" ->
      """SELECT doc_id,
        |       'h' || (doc_id % 5) || '.com' AS host,
        |       ['/home', '/private/a', '/private/pub/b', '/x-12.bin',
        |        '/x-12.bin?k', '/priv', '/private'][(doc_id % 7) + 1] AS path,
        |       CASE WHEN doc_id % 5 = 4 THEN true
        |            WHEN doc_id % 7 IN (1, 3, 6) THEN false
        |            ELSE true END AS allowed
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_webdataset" ->
      """SELECT count(*) AS n_samples,
        |       CAST(sum(strlen(text)) AS BIGINT) AS txt_bytes,
        |       CAST(sum(strlen(lang)) AS BIGINT) AS lang_bytes,
        |       true AS content_ok
        |FROM documents
        |WHERE text IS NOT NULL AND lang IS NOT NULL""".stripMargin,
    "q_megatron" ->
      """WITH d AS (SELECT list_filter(string_split_regex(text, '\s+'),
        |                              w -> len(w) > 0) AS toks
        |           FROM documents WHERE text IS NOT NULL)
        |SELECT count(*) AS n_seqs,
        |       CAST(coalesce(sum(len(toks)), 0) AS BIGINT) AS cells,
        |       CAST(coalesce(sum(list_sum(list_transform(toks, x -> len(x)))), 0)
        |         AS BIGINT) AS id_sum,
        |       true AS roundtrip_ok
        |FROM d""".stripMargin,
    "q_tfrecord" ->
      """SELECT count(*) AS n_rows, CAST(sum(doc_id) AS BIGINT) AS id_sum,
        |       CAST(sum(length(text)) AS BIGINT) AS chars,
        |       CAST(count(DISTINCT lang) AS BIGINT) AS langs,
        |       CAST(sum(doc_id % 5 + doc_id % 11 + 7) AS BIGINT) AS tok_sum,
        |       true AS score_f32_ok
        |FROM documents""".stripMargin,
    "q_links" ->
      """WITH s AS (SELECT doc_id,
        |  'http://site' || (doc_id % 9) || '.com/dir' || (doc_id % 4) ||
        |    '/page' || doc_id || '.html' AS src
        |  FROM documents)
        |SELECT src, dst, anchor FROM (
        |  SELECT src, 'http://site' || (doc_id % 9) || '.com/top/' ||
        |         (doc_id % 7) AS dst, 'Top & best' AS anchor FROM s
        |  UNION ALL
        |  SELECT src, 'http://site' || (doc_id % 9) || '.com/dir' ||
        |         (doc_id % 4) || '/rel' || (doc_id % 5) || '.html', 'rel link' FROM s
        |  UNION ALL
        |  SELECT src, 'http://ext' || (doc_id % 3) || '.org/x', 'ext' FROM s
        |  UNION ALL
        |  SELECT src, 'http://cdn.net/l.js', 'cdn' FROM s WHERE doc_id % 2 = 0
        |) ORDER BY src, dst, anchor""".stripMargin,
    "q_pagerank" ->
      """WITH d AS (SELECT doc_id AS id FROM documents),
        |e AS (
        |  SELECT 'http://site'||(id%9)||'.com/dir'||(id%4)||'/page'||id||'.html' AS src,
        |         'http://site'||(id%9)||'.com/top/'||(id%7) AS dst FROM d
        |  UNION ALL
        |  SELECT 'http://site'||(id%9)||'.com/dir'||(id%4)||'/page'||id||'.html',
        |         'http://site'||(id%9)||'.com/dir'||(id%4)||'/rel'||(id%5)||'.html' FROM d
        |  UNION ALL
        |  SELECT 'http://site'||(id%9)||'.com/dir'||(id%4)||'/page'||id||'.html',
        |         'http://ext'||(id%3)||'.org/x' FROM d
        |  UNION ALL
        |  SELECT 'http://site'||(id%9)||'.com/dir'||(id%4)||'/page'||id||'.html',
        |         'http://cdn.net/l.js' FROM d WHERE id%2 = 0),
        |de AS (SELECT DISTINCT src, dst FROM e),
        |nodes AS (SELECT src AS node FROM de UNION SELECT dst FROM de),
        |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
        |deg AS (SELECT src, count(*) AS dg FROM de GROUP BY src),
        |ce AS (SELECT src, dst, 1.0/dg AS w FROM de JOIN deg USING (src)),
        |r0 AS (SELECT node, 1.0/(SELECT n FROM nn) AS r FROM nodes),
        |dm0 AS (SELECT coalesce(sum(r), 0) AS m FROM r0
        |        WHERE node NOT IN (SELECT src FROM deg)),
        |r1 AS (SELECT nodes.node, 0.15/(SELECT n FROM nn) + 0.85*(coalesce(c.cb, 0)
        |         + (SELECT m FROM dm0)/(SELECT n FROM nn)) AS r
        |       FROM nodes LEFT JOIN (SELECT ce.dst, sum(w*r) AS cb FROM ce
        |         JOIN r0 ON r0.node = ce.src GROUP BY ce.dst) c ON nodes.node = c.dst),
        |dm1 AS (SELECT coalesce(sum(r), 0) AS m FROM r1
        |        WHERE node NOT IN (SELECT src FROM deg)),
        |r2 AS (SELECT nodes.node, 0.15/(SELECT n FROM nn) + 0.85*(coalesce(c.cb, 0)
        |         + (SELECT m FROM dm1)/(SELECT n FROM nn)) AS r
        |       FROM nodes LEFT JOIN (SELECT ce.dst, sum(w*r) AS cb FROM ce
        |         JOIN r1 ON r1.node = ce.src GROUP BY ce.dst) c ON nodes.node = c.dst),
        |dm2 AS (SELECT coalesce(sum(r), 0) AS m FROM r2
        |        WHERE node NOT IN (SELECT src FROM deg)),
        |r3 AS (SELECT nodes.node, 0.15/(SELECT n FROM nn) + 0.85*(coalesce(c.cb, 0)
        |         + (SELECT m FROM dm2)/(SELECT n FROM nn)) AS r
        |       FROM nodes LEFT JOIN (SELECT ce.dst, sum(w*r) AS cb FROM ce
        |         JOIN r2 ON r2.node = ce.src GROUP BY ce.dst) c ON nodes.node = c.dst)
        |SELECT node, round(r * (SELECT n FROM nn), 4) AS rank_n
        |FROM r3 ORDER BY node""".stripMargin,
    "q_hits" ->
      """WITH d AS (SELECT doc_id AS id FROM documents),
        |e AS (
        |  SELECT 'http://site'||(id%9)||'.com/dir'||(id%4)||'/page'||id||'.html' AS src,
        |         'http://site'||(id%9)||'.com/top/'||(id%7) AS dst FROM d
        |  UNION ALL
        |  SELECT 'http://site'||(id%9)||'.com/dir'||(id%4)||'/page'||id||'.html',
        |         'http://site'||(id%9)||'.com/dir'||(id%4)||'/rel'||(id%5)||'.html' FROM d
        |  UNION ALL
        |  SELECT 'http://site'||(id%9)||'.com/dir'||(id%4)||'/page'||id||'.html',
        |         'http://ext'||(id%3)||'.org/x' FROM d
        |  UNION ALL
        |  SELECT 'http://site'||(id%9)||'.com/dir'||(id%4)||'/page'||id||'.html',
        |         'http://cdn.net/l.js' FROM d WHERE id%2 = 0),
        |de AS (SELECT DISTINCT src, dst FROM e),
        |nodes AS (SELECT src AS node FROM de UNION SELECT dst FROM de),
        |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
        |h0 AS (SELECT node, 1.0/(SELECT n FROM nn) AS v FROM nodes),
        |a1r AS (SELECT nodes.node, coalesce(x.v, 0) AS v FROM nodes LEFT JOIN (
        |          SELECT de.dst AS node, sum(h.v) AS v FROM de
        |          JOIN h0 h ON h.node = de.src GROUP BY de.dst) x
        |        ON nodes.node = x.node),
        |a1 AS (SELECT node, v/(SELECT sum(v) FROM a1r) AS v FROM a1r),
        |h1r AS (SELECT nodes.node, coalesce(x.v, 0) AS v FROM nodes LEFT JOIN (
        |          SELECT de.src AS node, sum(a.v) AS v FROM de
        |          JOIN a1 a ON a.node = de.dst GROUP BY de.src) x
        |        ON nodes.node = x.node),
        |h1 AS (SELECT node, v/(SELECT sum(v) FROM h1r) AS v FROM h1r),
        |a2r AS (SELECT nodes.node, coalesce(x.v, 0) AS v FROM nodes LEFT JOIN (
        |          SELECT de.dst AS node, sum(h.v) AS v FROM de
        |          JOIN h1 h ON h.node = de.src GROUP BY de.dst) x
        |        ON nodes.node = x.node),
        |a2 AS (SELECT node, v/(SELECT sum(v) FROM a2r) AS v FROM a2r),
        |h2r AS (SELECT nodes.node, coalesce(x.v, 0) AS v FROM nodes LEFT JOIN (
        |          SELECT de.src AS node, sum(a.v) AS v FROM de
        |          JOIN a2 a ON a.node = de.dst GROUP BY de.src) x
        |        ON nodes.node = x.node),
        |h2 AS (SELECT node, v/(SELECT sum(v) FROM h2r) AS v FROM h2r)
        |SELECT h2.node, round(h2.v * (SELECT n FROM nn), 4) AS hub_n,
        |       round(a2.v * (SELECT n FROM nn), 4) AS auth_n
        |FROM h2 JOIN a2 ON h2.node = a2.node ORDER BY h2.node""".stripMargin,
    "q_link_anchors" ->
      """WITH d AS (SELECT doc_id AS id FROM documents),
        |e AS (
        |  SELECT 'http://site'||(id%9)||'.com/dir'||(id%4)||'/page'||id||'.html' AS src,
        |         'http://site'||(id%9)||'.com/top/'||(id%7) AS dst,
        |         'Top & best' AS anchor FROM d
        |  UNION ALL
        |  SELECT 'http://site'||(id%9)||'.com/dir'||(id%4)||'/page'||id||'.html',
        |         'http://site'||(id%9)||'.com/dir'||(id%4)||'/rel'||(id%5)||'.html',
        |         'rel link' FROM d
        |  UNION ALL
        |  SELECT 'http://site'||(id%9)||'.com/dir'||(id%4)||'/page'||id||'.html',
        |         'http://ext'||(id%3)||'.org/x', 'ext' FROM d
        |  UNION ALL
        |  SELECT 'http://site'||(id%9)||'.com/dir'||(id%4)||'/page'||id||'.html',
        |         'http://cdn.net/l.js', 'cdn' FROM d WHERE id%2 = 0)
        |SELECT dst, anchor, CAST(count(DISTINCT src) AS BIGINT) AS pages,
        |       CAST(1 AS BIGINT) AS rank
        |FROM e GROUP BY dst, anchor ORDER BY dst, rank""".stripMargin,
    "q_host_graph" ->
      """WITH d AS (SELECT doc_id AS id FROM documents),
        |u AS (
        |  SELECT 'site'||(id%9)||'.com' AS sd, 'ext'||(id%3)||'.org' AS dd FROM d
        |  UNION ALL
        |  SELECT 'site'||(id%9)||'.com', 'cdn.net' FROM d WHERE id%2 = 0)
        |SELECT sd AS src_domain, dd AS dst_domain,
        |       CAST(count(*) AS BIGINT) AS links
        |FROM u GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_url" ->
      """SELECT doc_id,
        |  'http://' ||
        |  CASE WHEN doc_id % 5 = 0
        |       THEN 'news.site' || (doc_id % 7) || '.co.uk'
        |       ELSE 'example' || (doc_id % 7) || '.com' END ||
        |  '/a/b' || doc_id || '/d' || (doc_id % 4) ||
        |  '?a=' || (doc_id % 9) || '&z=' || doc_id AS canonical,
        |  CASE WHEN doc_id % 5 = 0
        |       THEN 'site' || (doc_id % 7) || '.co.uk'
        |       ELSE 'example' || (doc_id % 7) || '.com' END AS domain
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_warc" ->
      """WITH h AS (
        |  SELECT doc_id, text,
        |         '<html><head><title>doc ' || doc_id ||
        |         ' &amp; crawl</title></head><body><p>' || text ||
        |         '</p><p>caf&#233; r&#xE9;sum&#xE9;</p></body></html>' AS html
        |  FROM documents)
        |SELECT doc_id, CAST(2 AS BIGINT) AS records,
        |       CAST(strlen(html) AS BIGINT) AS content_length,
        |       'doc ' || doc_id || ' & crawl' || chr(10) || text || chr(10) ||
        |         'café résumé' AS text
        |FROM h ORDER BY doc_id""".stripMargin,
    "q_multimodal" ->
      """SELECT CASE lang WHEN 'en' THEN 'image' WHEN 'de' THEN 'audio'
        |                 WHEN 'fr' THEN 'video' WHEN 'es' THEN 'pdf'
        |                 ELSE 'text' END AS modality,
        |       count(*) AS cnt,
        |       CAST(sum(length(text)) AS BIGINT) AS bytes_total,
        |       true AS feat_ok
        |FROM documents GROUP BY 1 ORDER BY modality""".stripMargin
    )
    // the auto-dispatch forms are output-identical to the operators
    // they route to, so they share those oracles verbatim
    val extra = Map(
      "q_rel_asof_auto" -> base("q_rel_asof_salted"),
      "q_rel_session_auto" -> base("q_rel_session"),
      // persisted-index probe is output-identical to the direct path
      "q_dedup_containment_indexed" -> base("q_dedup_containment"),
      "q_decontaminate_semantic_indexed" -> base("q_decontaminate_semantic"),
      // frozen-centroid append reaches the same flagged set as the
      // full build (exact copies probe their own cell; no natural
      // pair near cos 0.999 in the testdata)
      "q_ivf_append" -> base("q_decontaminate_semantic"),
      // per-micro-batch dynamic-overwrite appends merge to the same
      // view as one batch materialize (exact bin addition)
      "q_stream_view" -> base("q_sketch_view"),
      // quantile-boundary scaling keeps the rank form's locality
      // contract — identical output columns over the same events
      "q_zorder_scalable" -> base("q_zorder"),
      // warm(cold(2), 1) computes cold(3)'s iteration sequence
      "q_pagerank_warm" -> base("q_pagerank"),
      // compact/backfill preserve the exact merge; expire drops day
      // one, so the lifecycle's readRange matches the rebuild from
      // the second day's floor on (same // long math both engines)
      "q_sketch_view_lifecycle" ->
        """WITH h AS (SELECT epoch_ms(date_trunc('hour', ts)) AS b,
          |                  event_type
          |           FROM events),
          |mn AS (SELECT ((min(b) // 86400000) + 1) * 86400000 AS bf FROM h)
          |SELECT CAST(b AS BIGINT) AS bucket_ms, event_type,
          |       CAST(count(*) AS BIGINT) AS n, true AS bytes_eq
          |FROM h, mn WHERE b >= bf
          |GROUP BY 1, 2 ORDER BY bucket_ms, event_type""".stripMargin,
      // the streaming probe is output-identical to the batch
      // incremental pair set on a bounded replay (batch≡stream spec)
      "q_stream_neardup" -> base("q_dedup_incremental"),
      // streaming edit-1 probe: same planted argument as the batch
      // incremental form — pair-dedup makes the replay emit each pair once
      "q_stream_edit_one" -> base("q_edit_one_incremental"),
      // streaming edit-<= k probe shares the batch incremental oracle
      "q_stream_edit_k" -> base("q_edit_k_incremental"),
      // streaming perceptual-media probe: output-identical to the
      // batch incremental pair set on a bounded replay
      "q_stream_media_dedup" -> base("q_dedup_incremental_media"),
      // stateless scan->verify chain: stream output == batch output
      "q_stream_canary" -> base("q_canary"),
      // the view-computed card's merges are exact (bin/set addition),
      // so it reproduces the one-shot card's numbers
      "q_datacard_view" -> base("q_datacard"),
      // ...at any micro-batching too (replay-idempotent appendBatch)
      "q_stream_datacard" -> base("q_datacard"),
      // streaming span probe: q_dedup_incremental_substring's oracle
      // MINUS the within-batch branch (batch-global context a
      // stateless stream can't see) — history hits only, merged
      "q_stream_spans" ->
        """WITH d AS (SELECT doc_id,
          |             list_filter(string_split_regex(text, '\s+'), s -> len(s) > 0) AS toks
          |           FROM documents WHERE text IS NOT NULL),
          |g AS (SELECT doc_id, i AS s, i + 7 AS e, array_to_string(toks[i:i+7], ' ') AS gram
          |      FROM d, range(1, 4000) u(i) WHERE u.i <= len(toks) - 7),
          |fg AS (SELECT doc_id, s, e, gram FROM g WHERE doc_id % 3 = 0),
          |dup AS (SELECT DISTINCT gram FROM g WHERE doc_id % 3 <> 0),
          |m AS (SELECT fg.doc_id, fg.s, fg.e FROM fg JOIN dup USING (gram)),
          |o AS (SELECT doc_id, s, e,
          |             max(e) OVER (PARTITION BY doc_id ORDER BY s, e
          |                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
          |      FROM m),
          |isl AS (SELECT doc_id, s, e,
          |               sum(CASE WHEN pmax IS NULL OR s > pmax + 1 THEN 1 ELSE 0 END)
          |                 OVER (PARTITION BY doc_id ORDER BY s, e) AS grp FROM o),
          |spans AS (SELECT doc_id, min(s) AS ss, max(e) AS se FROM isl GROUP BY doc_id, grp)
          |SELECT doc_id, CAST(ss AS BIGINT) AS span_start, CAST(se AS BIGINT) AS span_end
          |FROM spans ORDER BY doc_id, span_start""".stripMargin,
      "q_tokenize_bpe" ->
        """SELECT count(*) AS docs, true AS rank_eq_seq, true AS reconstructs
          |FROM documents""".stripMargin,
      // DuckDB strlen counts BYTES: the byte-level token partition is
      // an exact cross-engine quantity, not just a pinned boolean
      "q_bpe_bytelevel" ->
        """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
          |       true AS roundtrip_ok, true AS ids_roundtrip_ok
          |FROM documents ORDER BY doc_id""".stripMargin,
      "q_tokenizer_roundtrip" ->
        """SELECT count(*) AS docs, true AS merges_roundtrip,
          |       true AS vocab_roundtrip, true AS bpe_tokens_identical,
          |       true AS wp_model_roundtrip, true AS wp_tokens_identical,
          |       true AS tokenizer_json_roundtrip
          |FROM documents""".stripMargin,
      "q_tokenizer_json_models" ->
        """SELECT count(*) AS docs, true AS wp_model_roundtrip,
          |       true AS wp_tokens_identical, true AS unigram_model_roundtrip,
          |       true AS unigram_tokens_identical
          |FROM documents""".stripMargin,
      "q_tokenize_unigram" ->
        """SELECT source, count(*) AS docs, true AS reconstructs,
          |       true AS ge_one_piece_per_word, true AS vocab_in_budget
          |FROM documents GROUP BY source ORDER BY source""".stripMargin,
      "q_tokenize_prune" ->
        """SELECT source, count(*) AS docs, true AS reconstructs,
          |       true AS ge_one_piece_per_word, true AS target_reached,
          |       true AS chars_kept, true AS pieces_subset,
          |       true AS params_carried
          |FROM documents GROUP BY source ORDER BY source""".stripMargin,
      "q_tokenize_unigram_em" ->
        """SELECT source, count(*) AS docs, true AS reconstructs,
          |       true AS ge_one_piece_per_word, true AS vocab_in_budget,
          |       true AS marginal_ll_monotone, true AS json_roundtrip,
          |       true AS spm_roundtrip
          |FROM documents GROUP BY source ORDER BY source""".stripMargin,
      "q_tokenize_wordpiece" ->
        """SELECT source, count(*) AS docs, true AS reconstructs,
          |       true AS no_unk, true AS ge_one_piece_per_word,
          |       true AS vocab_in_budget
          |FROM documents GROUP BY source ORDER BY source""".stripMargin,
      "q_tokenize_unigram_sampled" ->
        """SELECT source, count(*) AS docs, true AS reconstructs,
          |       true AS bounds_ok, true AS deterministic, true AS shifted
          |FROM documents GROUP BY source ORDER BY source""".stripMargin,
      "q_tokenize_unigram_bytefallback" ->
        """SELECT source, count(*) AS docs, true AS reconstructs,
          |       true AS no_unk, true AS used_fallback, true AS deterministic
          |FROM documents GROUP BY source ORDER BY source""".stripMargin,
      "q_tokenizer_spm" ->
        """SELECT count(*) AS docs, true AS model_roundtrip,
          |       true AS tokens_identical, true AS byte_fallback_lossless
          |FROM documents""".stripMargin,
      "q_tokenizer_spm_bpe" ->
        """SELECT count(*) AS docs, true AS vocab_roundtrip,
          |       true AS tokens_identical
          |FROM documents""".stripMargin,
      "q_tokenize_bpe_dropout" ->
        """SELECT source, count(*) AS docs, true AS reconstructs,
          |       true AS deterministic, true AS p0_equals_plain,
          |       true AS shifted
          |FROM documents GROUP BY source ORDER BY source""".stripMargin,
      "q_quality_classifier" ->
        """SELECT CAST(2 * count(*) AS BIGINT) AS held_out, true AS holdout_acc_ok
          |FROM documents WHERE doc_id % 2 = 1""".stripMargin,
      "q_dsir_select" ->
        """SELECT CAST(2 * count(*) AS BIGINT) AS n_raw,
          |       CAST(count(*) AS BIGINT) AS n_selected,
          |       true AS precision_ok
          |FROM documents""".stripMargin,
      "q_text_compression" ->
        """SELECT source, count(*) AS docs, true AS repeat_compresses_better,
          |       true AS bounds_ok
          |FROM documents WHERE text IS NOT NULL
          |GROUP BY source ORDER BY source""".stripMargin,
      "q_dedup_incremental_exact" ->
        """WITH hist AS (SELECT text FROM documents WHERE doc_id % 3 <> 0),
          |fresh AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
          |          UNION ALL
          |          SELECT doc_id + 1000000, text FROM documents
          |          WHERE doc_id % 3 <> 0 AND doc_id % 7 = 0)
          |SELECT CAST(count(*) AS BIGINT) AS dups,
          |       CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS id_sum
          |FROM fresh WHERE text IN (SELECT text FROM hist)""".stripMargin,
      "q_lm_bigram" ->
        """WITH f AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
          |                    x -> len(x) > 0) AS w FROM documents),
          |big AS (SELECT doc_id, unnest(list_transform(range(1, len(w)),
          |                 i -> w[i] || chr(1) || w[i+1])) AS bg
          |        FROM f),
          |bc AS (SELECT bg, CAST(count(*) AS DOUBLE) AS cb FROM big GROUP BY bg),
          |lc AS (SELECT split_part(bg, chr(1), 1) AS l, sum(cb) AS cl FROM bc GROUP BY 1)
          |SELECT doc_id, CAST(count(*) AS BIGINT) AS bigrams,
          |       round(avg(-ln(cb / cl)), 4) AS score
          |FROM big JOIN bc USING (bg) JOIN lc ON split_part(big.bg, chr(1), 1) = lc.l
          |GROUP BY doc_id""".stripMargin,
      "q_kn_score" ->
        """WITH f AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
          |                    x -> len(x) > 0) AS w FROM documents),
          |big AS (SELECT doc_id, unnest(list_transform(range(1, len(w)),
          |                 i -> w[i] || chr(1) || w[i+1])) AS bg
          |        FROM f),
          |bc AS (SELECT bg, CAST(count(*) AS DOUBLE) AS c FROM big GROUP BY bg),
          |ls AS (SELECT split_part(bg, chr(1), 1) AS l, sum(c) AS cl,
          |              CAST(count(*) AS DOUBLE) AS nl FROM bc GROUP BY 1),
          |rs AS (SELECT split_part(bg, chr(1), 2) AS r,
          |              CAST(count(*) AS DOUBLE) AS nr FROM bc GROUP BY 1),
          |st AS (SELECT CAST(count(*) AS DOUBLE) AS t,
          |              CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS n1,
          |              CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS DOUBLE) AS n2
          |       FROM bc),
          |dd AS (SELECT t, CASE WHEN n1 = 0 THEN 0.75
          |                      ELSE n1 / (n1 + 2 * n2) END AS d FROM st)
          |SELECT doc_id, CAST(count(*) AS BIGINT) AS bigrams,
          |       round(avg(-ln(greatest(c - d, 0) / cl + d * nl / cl * nr / t)), 4)
          |         AS score
          |FROM big JOIN bc USING (bg)
          |         JOIN ls ON split_part(big.bg, chr(1), 1) = ls.l
          |         JOIN rs ON split_part(big.bg, chr(1), 2) = rs.r
          |         CROSS JOIN dd
          |GROUP BY doc_id""".stripMargin,
      "q_kn3_score" ->
        """WITH f AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
          |                    x -> len(x) > 0) AS w FROM documents),
          |tri AS (SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
          |                 i -> w[i] || chr(1) || w[i+1] || chr(1) || w[i+2])) AS tg
          |        FROM f WHERE len(w) >= 3),
          |tc AS (SELECT tg, CAST(count(*) AS DOUBLE) AS c3 FROM tri GROUP BY tg),
          |ts AS (SELECT tg, c3,
          |              split_part(tg, chr(1), 1) AS u,
          |              split_part(tg, chr(1), 2) AS v,
          |              split_part(tg, chr(1), 3) AS wd FROM tc),
          |ctx AS (SELECT u, v, sum(c3) AS c2, CAST(count(*) AS DOUBLE) AS n3l
          |        FROM ts GROUP BY u, v),
          |cb AS (SELECT v, wd, CAST(count(*) AS DOUBLE) AS nvw FROM ts GROUP BY v, wd),
          |mid AS (SELECT v, sum(nvw) AS nv, CAST(count(*) AS DOUBLE) AS nvr
          |        FROM cb GROUP BY v),
          |big AS (SELECT DISTINCT bg FROM (
          |  SELECT unnest(list_transform(range(1, len(w)),
          |           i -> w[i] || chr(1) || w[i+1])) AS bg FROM f) q),
          |uni AS (SELECT split_part(bg, chr(1), 2) AS wd,
          |               CAST(count(*) AS DOUBLE) AS nw FROM big GROUP BY 1),
          |tt AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM big),
          |d3s AS (SELECT CASE WHEN n1 = 0 THEN 0.75 ELSE n1 / (n1 + 2 * n2) END AS d3
          |        FROM (SELECT CAST(sum(CASE WHEN c3 = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS n1,
          |                     CAST(sum(CASE WHEN c3 = 2 THEN 1 ELSE 0 END) AS DOUBLE) AS n2
          |              FROM tc)),
          |d2s AS (SELECT CASE WHEN n1 = 0 THEN 0.75 ELSE n1 / (n1 + 2 * n2) END AS d2
          |        FROM (SELECT CAST(sum(CASE WHEN nvw = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS n1,
          |                     CAST(sum(CASE WHEN nvw = 2 THEN 1 ELSE 0 END) AS DOUBLE) AS n2
          |              FROM cb)),
          |j AS (SELECT tri.doc_id, ts.c3, ctx.c2, ctx.n3l, cb.nvw,
          |             mid.nv, mid.nvr, uni.nw
          |      FROM tri JOIN ts USING (tg)
          |               JOIN ctx ON ts.u = ctx.u AND ts.v = ctx.v
          |               JOIN cb ON ts.v = cb.v AND ts.wd = cb.wd
          |               JOIN mid ON ts.v = mid.v
          |               JOIN uni ON ts.wd = uni.wd)
          |SELECT doc_id, CAST(count(*) AS BIGINT) AS trigrams,
          |       round(avg(-ln(
          |         greatest(c3 - d3, 0) / c2 + d3 * n3l / c2 *
          |           (greatest(nvw - d2, 0) / nv + d2 * nvr / nv * (nw / t)))), 4)
          |         AS score
          |FROM j CROSS JOIN tt CROSS JOIN d3s CROSS JOIN d2s
          |GROUP BY doc_id""".stripMargin,
      "q_retrieval_index" ->
        """WITH f AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
          |                    x -> len(x) > 0) AS w FROM documents),
          |toks AS (SELECT doc_id, unnest(w) AS term FROM f),
          |post AS (SELECT term, doc_id, count(*) AS tf FROM toks GROUP BY 1, 2),
          |byterm AS (SELECT term, count(*) AS df, sum(tf) AS tfs FROM post GROUP BY 1)
          |SELECT CAST(count(*) AS BIGINT) AS n_terms,
          |       CAST(sum(df) AS BIGINT) AS n_postings,
          |       CAST(sum(tfs) AS BIGINT) AS tf_total,
          |       CAST(max(df) AS BIGINT) AS max_df,
          |       true AS positions_ok
          |FROM byterm""".stripMargin,
      "q_bm25" ->
        """WITH f AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
          |                    x -> len(x) > 0) AS w FROM documents),
          |dl AS (SELECT doc_id, len(w) AS dl FROM f WHERE len(w) > 0),
          |toks AS (SELECT doc_id, unnest(w) AS term FROM f),
          |post AS (SELECT term, doc_id, count(*) AS tf FROM toks
          |         WHERE term IN ('slow', 'merge', 'window') GROUP BY 1, 2),
          |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
          |dfs AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
          |scored AS (
          |  SELECT p.doc_id,
          |         sum(ln(1 + (s.n - f2.df + 0.5) / (f2.df + 0.5)) * p.tf * 2.2 /
          |             (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl))) AS score,
          |         CAST(sum(p.tf) AS BIGINT) AS tf_total,
          |         CAST(count(*) AS BIGINT) AS n_terms_hit
          |  FROM post p JOIN dfs f2 USING (term) JOIN dl d USING (doc_id)
          |  CROSS JOIN stats s GROUP BY 1)
          |SELECT rank, doc_id, tf_total, n_terms_hit FROM (
          |  SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
          |         doc_id, tf_total, n_terms_hit FROM scored) t
          |WHERE rank <= 10 ORDER BY rank""".stripMargin,
      "q_retrieval_filtered" ->
        """WITH f AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
          |                    x -> len(x) > 0) AS w FROM documents),
          |dl AS (SELECT doc_id, len(w) AS dl FROM f WHERE len(w) > 0),
          |toks AS (SELECT doc_id, unnest(w) AS term FROM f),
          |post AS (SELECT term, doc_id, count(*) AS tf FROM toks
          |         WHERE term IN ('slow', 'merge', 'window') GROUP BY 1, 2),
          |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
          |dfs AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
          |scored AS (
          |  SELECT p.doc_id,
          |         sum(ln(1 + (s.n - f2.df + 0.5) / (f2.df + 0.5)) * p.tf * 2.2 /
          |             (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl))) AS score,
          |         CAST(sum(p.tf) AS BIGINT) AS tf_total,
          |         CAST(count(*) AS BIGINT) AS n_terms_hit
          |  FROM post p JOIN dfs f2 USING (term) JOIN dl d USING (doc_id)
          |  CROSS JOIN stats s GROUP BY 1)
          |SELECT rank, doc_id, tf_total, n_terms_hit, true AS indexed_same FROM (
          |  SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
          |         doc_id, tf_total, n_terms_hit FROM scored
          |  WHERE doc_id % 3 = 0) t
          |WHERE rank <= 10 ORDER BY rank""".stripMargin,
      "q_retrieval_batch" ->
        """WITH f AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
          |                    x -> len(x) > 0) AS w FROM documents),
          |dl AS (SELECT doc_id, len(w) AS dl FROM f WHERE len(w) > 0),
          |toks AS (SELECT doc_id, unnest(w) AS term FROM f),
          |qt AS (SELECT * FROM (VALUES
          |         (0, 'slow'), (0, 'merge'), (0, 'window'),
          |         (1, 'hash'), (1, 'batch'),
          |         (2, 'filter'), (2, 'scan'), (2, 'index'))
          |       v(query_id, term)),
          |post AS (SELECT term, doc_id, count(*) AS tf FROM toks
          |         WHERE term IN (SELECT term FROM qt) GROUP BY 1, 2),
          |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
          |dfs AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
          |scored AS (
          |  SELECT q.query_id, p.doc_id,
          |         sum(ln(1 + (s.n - f2.df + 0.5) / (f2.df + 0.5)) * p.tf * 2.2 /
          |             (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl))) AS score,
          |         CAST(sum(p.tf) AS BIGINT) AS tf_total,
          |         CAST(count(*) AS BIGINT) AS n_terms_hit
          |  FROM post p JOIN qt q USING (term) JOIN dfs f2 USING (term)
          |       JOIN dl d USING (doc_id)
          |  CROSS JOIN stats s GROUP BY 1, 2)
          |SELECT CAST(query_id AS BIGINT) AS query_id, rank, doc_id,
          |       tf_total, n_terms_hit, true AS per_query_same
          |FROM (
          |  SELECT query_id,
          |         CAST(row_number() OVER (PARTITION BY query_id
          |           ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
          |         doc_id, tf_total, n_terms_hit FROM scored) t
          |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
      "q_pipeline_rag" ->
        """WITH f AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
          |                    x -> len(x) > 0) AS w FROM documents),
          |dl AS (SELECT doc_id, len(w) AS dl FROM f WHERE len(w) > 0),
          |toks AS (SELECT doc_id, unnest(w) AS term FROM f),
          |post AS (SELECT term, doc_id, count(*) AS tf FROM toks
          |         WHERE term IN ('slow', 'merge', 'window') GROUP BY 1, 2),
          |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
          |dfs AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
          |scored AS (
          |  SELECT p.doc_id,
          |         sum(ln(1 + (s.n - f2.df + 0.5) / (f2.df + 0.5)) * p.tf * 2.2 /
          |             (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl))) AS score
          |  FROM post p JOIN dfs f2 USING (term) JOIN dl d USING (doc_id)
          |  CROSS JOIN stats s GROUP BY 1),
          |rk AS (SELECT doc_id, rank FROM (
          |  SELECT doc_id,
          |         CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
          |           AS rank FROM scored) t WHERE rank <= 10),
          |fr AS (SELECT f.doc_id, f.w FROM f JOIN rk USING (doc_id)),
          |pos AS (SELECT doc_id, w[i] AS term, i - 1 AS p
          |        FROM (SELECT doc_id, w, unnest(generate_series(1, len(w))) AS i
          |              FROM fr)
          |        WHERE w[i] IN ('slow', 'merge', 'window')),
          |cand AS (
          |  SELECT a.doc_id, a.p AS start, count(DISTINCT b.term) AS n_terms
          |  FROM pos a JOIN pos b ON a.doc_id = b.doc_id
          |    AND b.p >= a.p AND b.p < a.p + 12
          |  GROUP BY 1, 2),
          |best AS (
          |  SELECT doc_id, start,
          |         row_number() OVER (PARTITION BY doc_id
          |           ORDER BY n_terms DESC, start ASC) AS rn
          |  FROM cand),
          |sn AS (SELECT b.doc_id, b.start,
          |              least(b.start + 12, len(f.w)) AS e,
          |              array_to_string(
          |                f.w[b.start + 1 : least(b.start + 12, len(f.w))],
          |                ' ') AS snippet
          |       FROM best b JOIN f USING (doc_id) WHERE rn = 1),
          |j AS (SELECT rk.rank, rk.doc_id, sn.start, sn.e,
          |             sn.e - sn.start AS n_tokens,
          |             sum(sn.e - sn.start) OVER (ORDER BY rk.rank)
          |               AS cum_tokens,
          |             sn.snippet
          |      FROM rk JOIN sn USING (doc_id)),
          |ov AS (SELECT min(CASE WHEN cum_tokens > 60 THEN rank END) AS o
          |       FROM j)
          |SELECT rank, doc_id, CAST(start AS BIGINT) AS start,
          |       CAST(e AS BIGINT) AS "end",
          |       CAST(n_tokens AS BIGINT) AS n_tokens,
          |       CAST(cum_tokens AS BIGINT) AS cum_tokens, snippet
          |FROM j, ov WHERE ov.o IS NULL OR rank < ov.o
          |ORDER BY rank""".stripMargin,
      "q_retrieval_prf" ->
        """WITH f AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
          |                    x -> len(x) > 0) AS w FROM documents),
          |dl AS (SELECT doc_id, len(w) AS dl FROM f WHERE len(w) > 0),
          |toks AS (SELECT doc_id, unnest(w) AS term FROM f),
          |post0 AS (SELECT term, doc_id, count(*) AS tf FROM toks
          |          WHERE term IN ('slow', 'merge', 'window') GROUP BY 1, 2),
          |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
          |dfs0 AS (SELECT term, count(*) AS df FROM post0 GROUP BY 1),
          |scored0 AS (
          |  SELECT p.doc_id,
          |         sum(ln(1 + (s.n - f2.df + 0.5) / (f2.df + 0.5)) * p.tf * 2.2 /
          |             (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl))) AS score
          |  FROM post0 p JOIN dfs0 f2 USING (term) JOIN dl d USING (doc_id)
          |  CROSS JOIN stats s GROUP BY 1),
          |fb AS (SELECT doc_id FROM (
          |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r
          |  FROM scored0) t WHERE r <= 10),
          |fbpost AS (SELECT t.term, t.doc_id, count(*) AS tf
          |           FROM toks t JOIN fb USING (doc_id) GROUP BY 1, 2),
          |cand AS (SELECT a.term, sum(CAST(a.tf AS DOUBLE) / d.dl) AS wt
          |         FROM fbpost a JOIN dl d USING (doc_id)
          |         WHERE a.term NOT IN ('slow', 'merge', 'window')
          |         GROUP BY 1),
          |exp AS (SELECT term, r FROM (
          |  SELECT term, row_number() OVER (ORDER BY wt DESC, term) AS r
          |  FROM cand) t WHERE r <= 5),
          |eq AS (SELECT term FROM exp
          |       UNION ALL SELECT unnest(['slow', 'merge', 'window'])),
          |post AS (SELECT term, doc_id, count(*) AS tf FROM toks
          |         WHERE term IN (SELECT term FROM eq) GROUP BY 1, 2),
          |dfs AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
          |scored AS (
          |  SELECT p.doc_id,
          |         sum(ln(1 + (s.n - f2.df + 0.5) / (f2.df + 0.5)) * p.tf * 2.2 /
          |             (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl))) AS score,
          |         CAST(count(*) AS BIGINT) AS n_terms_hit
          |  FROM post p JOIN dfs f2 USING (term) JOIN dl d USING (doc_id)
          |  CROSS JOIN stats s GROUP BY 1)
          |SELECT rank, doc_id, n_terms_hit,
          |       (SELECT string_agg(term, ' ' ORDER BY r) FROM exp) AS expansion
          |FROM (
          |  SELECT doc_id, n_terms_hit,
          |         CAST(row_number() OVER (ORDER BY score DESC, doc_id)
          |           AS BIGINT) AS rank
          |  FROM scored) t
          |WHERE rank <= 10 ORDER BY rank""".stripMargin,
      "q_retrieval_proximity" ->
        """WITH f AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
          |                    x -> len(x) > 0) AS w FROM documents),
          |dl AS (SELECT doc_id, len(w) AS dl FROM f WHERE len(w) > 0),
          |toks AS (SELECT doc_id, unnest(w) AS term FROM f),
          |post AS (SELECT term, doc_id, count(*) AS tf FROM toks
          |         WHERE term IN ('slow', 'merge', 'window') GROUP BY 1, 2),
          |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
          |dfs AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
          |scored AS (
          |  SELECT p.doc_id,
          |         sum(ln(1 + (s.n - f2.df + 0.5) / (f2.df + 0.5)) * p.tf * 2.2 /
          |             (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl))) AS score,
          |         CAST(count(*) AS BIGINT) AS n_terms_hit
          |  FROM post p JOIN dfs f2 USING (term) JOIN dl d USING (doc_id)
          |  CROSS JOIN stats s GROUP BY 1),
          |pos AS (SELECT doc_id, w[i] AS term, i - 1 AS p
          |        FROM (SELECT doc_id, w, unnest(generate_series(1, len(w))) AS i
          |              FROM f)
          |        WHERE w[i] IN ('slow', 'merge', 'window')),
          |pd AS (SELECT a.doc_id, a.term AS t1, b.term AS t2,
          |              min(abs(a.p - b.p)) AS md
          |       FROM pos a JOIN pos b ON a.doc_id = b.doc_id
          |         AND a.term < b.term
          |       GROUP BY 1, 2, 3),
          |prox AS (SELECT doc_id,
          |                sum(CAST(1 AS DOUBLE) / (1 + md)) AS prox
          |         FROM pd GROUP BY 1),
          |comb AS (SELECT s.doc_id, s.n_terms_hit,
          |                s.score + 0.5 * coalesce(p.prox, 0) AS score
          |         FROM scored s LEFT JOIN prox p USING (doc_id))
          |SELECT rank, doc_id, n_terms_hit,
          |       true AS planted_ok, true AS lambda0_plain
          |FROM (
          |  SELECT doc_id, n_terms_hit,
          |         CAST(row_number() OVER (ORDER BY score DESC, doc_id)
          |           AS BIGINT) AS rank
          |  FROM comb) t
          |WHERE rank <= 10 ORDER BY rank""".stripMargin,
      "q_pipeline_rag_batch" ->
        """WITH qs AS (SELECT * FROM (VALUES
          |    (0, 'slow'), (0, 'merge'), (0, 'window'),
          |    (1, 'hash'), (1, 'batch'), (1, 'scan'),
          |    (2, 'filter'), (2, 'row'), (2, 'group')) v(query_id, term)),
          |f AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
          |                    x -> len(x) > 0) AS w FROM documents),
          |dl AS (SELECT doc_id, len(w) AS dl FROM f WHERE len(w) > 0),
          |toks AS (SELECT doc_id, unnest(w) AS term FROM f),
          |post AS (SELECT term, doc_id, count(*) AS tf FROM toks
          |         WHERE term IN (SELECT DISTINCT term FROM qs) GROUP BY 1, 2),
          |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
          |dfs AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
          |scored AS (
          |  SELECT q.query_id, p.doc_id,
          |         sum(ln(1 + (s.n - f2.df + 0.5) / (f2.df + 0.5)) * p.tf * 2.2 /
          |             (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl))) AS score
          |  FROM qs q JOIN post p USING (term) JOIN dfs f2 USING (term)
          |  JOIN dl d ON p.doc_id = d.doc_id
          |  CROSS JOIN stats s GROUP BY 1, 2),
          |rk AS (SELECT query_id, doc_id, rank FROM (
          |  SELECT query_id, doc_id,
          |         CAST(row_number() OVER (PARTITION BY query_id
          |           ORDER BY score DESC, doc_id) AS BIGINT) AS rank
          |  FROM scored) t WHERE rank <= 10),
          |fr AS (SELECT rk.query_id, f.doc_id, f.w FROM f JOIN rk USING (doc_id)),
          |pos AS (SELECT query_id, doc_id, w[i] AS term, i - 1 AS p
          |        FROM (SELECT query_id, doc_id, w,
          |                     unnest(generate_series(1, len(w))) AS i
          |              FROM fr)),
          |posq AS (SELECT pos.query_id, pos.doc_id, pos.term, pos.p
          |         FROM pos JOIN qs USING (query_id, term)),
          |cand AS (
          |  SELECT a.query_id, a.doc_id, a.p AS start,
          |         count(DISTINCT b.term) AS n_terms
          |  FROM posq a JOIN posq b ON a.query_id = b.query_id
          |    AND a.doc_id = b.doc_id AND b.p >= a.p AND b.p < a.p + 12
          |  GROUP BY 1, 2, 3),
          |best AS (
          |  SELECT query_id, doc_id, start,
          |         row_number() OVER (PARTITION BY query_id, doc_id
          |           ORDER BY n_terms DESC, start ASC) AS rn
          |  FROM cand),
          |sn AS (SELECT b.query_id, b.doc_id, b.start,
          |              least(b.start + 12, len(f.w)) AS e,
          |              array_to_string(
          |                f.w[b.start + 1 : least(b.start + 12, len(f.w))],
          |                ' ') AS snippet
          |       FROM best b JOIN f USING (doc_id) WHERE rn = 1),
          |j AS (SELECT rk.query_id, rk.rank, rk.doc_id,
          |             coalesce(sn.start, 0) AS start,
          |             coalesce(sn.e, 0) AS e,
          |             coalesce(sn.e - sn.start, 0) AS n_tokens,
          |             sum(coalesce(sn.e - sn.start, 0))
          |               OVER (PARTITION BY rk.query_id ORDER BY rk.rank)
          |               AS cum_tokens,
          |             coalesce(sn.snippet, '') AS snippet
          |      FROM rk LEFT JOIN sn ON rk.query_id = sn.query_id
          |        AND rk.doc_id = sn.doc_id),
          |ov AS (SELECT query_id, min(CASE WHEN cum_tokens > 60 THEN rank END)
          |         AS o FROM j GROUP BY 1)
          |SELECT CAST(j.query_id AS BIGINT) AS query_id, j.rank, j.doc_id,
          |       CAST(start AS BIGINT) AS start, CAST(e AS BIGINT) AS "end",
          |       CAST(n_tokens AS BIGINT) AS n_tokens,
          |       CAST(cum_tokens AS BIGINT) AS cum_tokens, snippet,
          |       true AS per_query_same
          |FROM j JOIN ov USING (query_id)
          |WHERE ov.o IS NULL OR j.rank < ov.o
          |ORDER BY query_id, rank""".stripMargin,
      "q_retrieval_snippet" ->
        """WITH f AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
          |                    x -> len(x) > 0) AS w
          |           FROM documents WHERE text IS NOT NULL),
          |pos AS (SELECT doc_id, w[i] AS term, i - 1 AS p
          |        FROM (SELECT doc_id, w, unnest(generate_series(1, len(w))) AS i
          |              FROM f)
          |        WHERE w[i] IN ('slow', 'merge', 'window')),
          |cand AS (
          |  SELECT a.doc_id, a.p AS start,
          |         count(DISTINCT b.term) AS n_terms, count(*) AS n_hits
          |  FROM pos a JOIN pos b ON a.doc_id = b.doc_id
          |    AND b.p >= a.p AND b.p < a.p + 12
          |  GROUP BY 1, 2),
          |best AS (
          |  SELECT doc_id, start, n_terms, n_hits,
          |         row_number() OVER (PARTITION BY doc_id
          |           ORDER BY n_terms DESC, start ASC) AS rn
          |  FROM cand)
          |SELECT b.doc_id, CAST(b.start AS BIGINT) AS start,
          |       CAST(least(b.start + 12, len(f.w)) AS BIGINT) AS "end",
          |       CAST(b.n_terms AS BIGINT) AS n_terms,
          |       CAST(b.n_hits AS BIGINT) AS n_hits,
          |       array_to_string(f.w[b.start + 1 : least(b.start + 12, len(f.w))],
          |                       ' ') AS snippet
          |FROM best b JOIN f USING (doc_id)
          |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
      "q_retrieval_maxscore" ->
        """WITH f AS (SELECT doc_id, list_filter(string_split_regex(lower(
          |         text || CASE WHEN doc_id % 17 = 0 THEN ' raretok17' ELSE '' END
          |              || ' fillertok'), '\s+'),
          |                    x -> len(x) > 0) AS w FROM documents),
          |dl AS (SELECT doc_id, len(w) AS dl FROM f WHERE len(w) > 0),
          |toks AS (SELECT doc_id, unnest(w) AS term FROM f),
          |post AS (SELECT term, doc_id, count(*) AS tf FROM toks
          |         WHERE term IN ('raretok17', 'merge', 'fillertok') GROUP BY 1, 2),
          |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
          |dfs AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
          |scored AS (
          |  SELECT p.doc_id,
          |         sum(ln(1 + (s.n - f2.df + 0.5) / (f2.df + 0.5)) * p.tf * 2.2 /
          |             (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl))) AS score,
          |         CAST(sum(p.tf) AS BIGINT) AS tf_total,
          |         CAST(count(*) AS BIGINT) AS n_terms_hit
          |  FROM post p JOIN dfs f2 USING (term) JOIN dl d USING (doc_id)
          |  CROSS JOIN stats s GROUP BY 1)
          |SELECT rank, doc_id, tf_total, n_terms_hit,
          |       true AS pruned, true AS tail_is_filler, true AS same_as_plain
          |FROM (
          |  SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
          |         doc_id, tf_total, n_terms_hit FROM scored) t
          |WHERE rank <= 10 ORDER BY rank""".stripMargin,
      "q_retrieval_batch_maxscore" ->
        """WITH f AS (SELECT doc_id, list_filter(string_split_regex(lower(
          |     text || CASE WHEN doc_id % 17 = 0 THEN ' raretok17' ELSE '' END
          |          || CASE WHEN doc_id % 23 = 0 THEN ' raretok23' ELSE '' END
          |          || ' fillertok'), '\s+'), x -> len(x) > 0) AS w FROM documents),
          |dl AS (SELECT doc_id, len(w) AS dl FROM f WHERE len(w) > 0),
          |toks AS (SELECT doc_id, unnest(w) AS term FROM f),
          |qt AS (SELECT * FROM (VALUES
          |         (0, 'raretok17'), (0, 'merge'), (0, 'fillertok'),
          |         (1, 'raretok23'), (1, 'window'), (1, 'fillertok'),
          |         (2, 'raretok17'), (2, 'fillertok')) v(query_id, term)),
          |post AS (SELECT term, doc_id, count(*) AS tf FROM toks
          |         WHERE term IN (SELECT term FROM qt) GROUP BY 1, 2),
          |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
          |dfs AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
          |scored AS (
          |  SELECT q.query_id, p.doc_id,
          |         sum(ln(1 + (s.n - f2.df + 0.5) / (f2.df + 0.5)) * p.tf * 2.2 /
          |             (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl))) AS score,
          |         CAST(sum(p.tf) AS BIGINT) AS tf_total,
          |         CAST(count(*) AS BIGINT) AS n_terms_hit
          |  FROM post p JOIN qt q USING (term) JOIN dfs f2 USING (term)
          |       JOIN dl d USING (doc_id)
          |  CROSS JOIN stats s GROUP BY 1, 2)
          |SELECT CAST(query_id AS BIGINT) AS query_id, rank, doc_id,
          |       tf_total, n_terms_hit, true AS pruned_q0, true AS pruned_q1,
          |       true AS batch_same, true AS fallback_same
          |FROM (
          |  SELECT query_id,
          |         CAST(row_number() OVER (PARTITION BY query_id
          |           ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
          |         doc_id, tf_total, n_terms_hit FROM scored) t
          |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
      "q_pipeline_colbert" ->
        """WITH flat AS (SELECT vec_id, vec_id // 4 AS gid, r.i AS i, embedding[r.i] AS x
          |              FROM embeddings, range(1, 65) r(i)),
          |norms AS (SELECT vec_id, sqrt(sum(x * x)) AS n FROM flat GROUP BY 1),
          |dots AS (SELECT c.vec_id AS nid, sum(q.x * c.x) AS dot
          |         FROM flat q JOIN flat c ON q.i = c.i
          |         WHERE q.vec_id = 0 AND c.vec_id <> 0 GROUP BY 1),
          |cos0 AS (SELECT nid, dot / (nq.n * nc.n) AS c
          |         FROM dots JOIN norms nq ON nq.vec_id = 0
          |                   JOIN norms nc ON nid = nc.vec_id),
          |fst AS (SELECT nid, row_number() OVER (ORDER BY c DESC, nid) rk FROM cos0),
          |cand AS (SELECT DISTINCT nid // 4 AS gid FROM fst WHERE rk <= 30
          |         UNION SELECT 0),
          |nc2 AS (SELECT CAST(count(*) AS BIGINT) AS n_cand FROM cand),
          |qdots AS (SELECT q.vec_id AS qv, c.vec_id AS dv, c.gid AS gid,
          |                 sum(q.x * c.x) AS dot
          |          FROM flat q JOIN flat c ON q.i = c.i
          |          WHERE q.gid = 0 AND c.gid IN (SELECT gid FROM cand)
          |          GROUP BY 1, 2, 3),
          |qcos AS (SELECT qv, gid, dot / (nq.n * nc.n) AS c
          |         FROM qdots JOIN norms nq ON qv = nq.vec_id
          |                    JOIN norms nc ON dv = nc.vec_id),
          |mx AS (SELECT qv, gid, max(c) AS m FROM qcos GROUP BY 1, 2),
          |sc AS (SELECT gid, sum(m) AS score FROM mx GROUP BY 1)
          |SELECT rank, doc_id, nc2.n_cand FROM (
          |  SELECT CAST(row_number() OVER (ORDER BY score DESC, gid) AS BIGINT) AS rank,
          |         gid AS doc_id FROM sc) t CROSS JOIN nc2
          |WHERE rank <= 10 ORDER BY rank""".stripMargin,
      "q_retrieval_ql" ->
        """WITH f AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
          |                    x -> len(x) > 0) AS w FROM documents),
          |dl AS (SELECT doc_id, len(w) AS dl FROM f WHERE len(w) > 0),
          |toks AS (SELECT doc_id, unnest(w) AS term FROM f),
          |post AS (SELECT term, doc_id, count(*) AS tf FROM toks
          |         WHERE term IN ('slow', 'merge', 'window') GROUP BY 1, 2),
          |coll AS (SELECT CAST(sum(dl) AS DOUBLE) AS c FROM dl),
          |cf AS (SELECT term, CAST(sum(tf) AS DOUBLE) AS cfv FROM post GROUP BY 1),
          |scored AS (
          |  SELECT p.doc_id,
          |         sum(ln(1 + p.tf / (300.0 * cf.cfv / coll.c))) +
          |           3 * ln(300.0 / (d.dl + 300.0)) AS score,
          |         CAST(sum(p.tf) AS BIGINT) AS tf_total,
          |         CAST(count(*) AS BIGINT) AS n_terms_hit
          |  FROM post p JOIN cf USING (term) JOIN dl d USING (doc_id)
          |  CROSS JOIN coll GROUP BY p.doc_id, d.dl)
          |SELECT rank, doc_id, tf_total, n_terms_hit, true AS indexed_same
          |FROM (
          |  SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
          |         doc_id, tf_total, n_terms_hit FROM scored) t
          |WHERE rank <= 10 ORDER BY rank""".stripMargin,
      "q_retrieval_page" ->
        """WITH f AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
          |                    x -> len(x) > 0) AS w FROM documents),
          |dl AS (SELECT doc_id, len(w) AS dl FROM f WHERE len(w) > 0),
          |toks AS (SELECT doc_id, unnest(w) AS term FROM f),
          |post AS (SELECT term, doc_id, count(*) AS tf FROM toks
          |         WHERE term IN ('slow', 'merge', 'window') GROUP BY 1, 2),
          |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
          |dfs AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
          |scored AS (
          |  SELECT p.doc_id,
          |         sum(ln(1 + (s.n - f2.df + 0.5) / (f2.df + 0.5)) * p.tf * 2.2 /
          |             (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl))) AS score,
          |         CAST(sum(p.tf) AS BIGINT) AS tf_total,
          |         CAST(count(*) AS BIGINT) AS n_terms_hit
          |  FROM post p JOIN dfs f2 USING (term) JOIN dl d USING (doc_id)
          |  CROSS JOIN stats s GROUP BY 1)
          |SELECT CAST(rank - 10 AS BIGINT) AS page_rank, doc_id,
          |       tf_total, n_terms_hit, true AS pages_exact
          |FROM (
          |  SELECT row_number() OVER (ORDER BY score DESC, doc_id) AS rank,
          |         doc_id, tf_total, n_terms_hit FROM scored) t
          |WHERE rank BETWEEN 11 AND 20 ORDER BY page_rank""".stripMargin,
      "q_retrieval_boolean" ->
        """WITH f AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
          |                    x -> len(x) > 0) AS w FROM documents),
          |dl AS (SELECT doc_id, len(w) AS dl FROM f WHERE len(w) > 0),
          |toks AS (SELECT doc_id, unnest(w) AS term FROM f),
          |post AS (SELECT term, doc_id, count(*) AS tf FROM toks
          |         WHERE term IN ('slow', 'window', 'merge') GROUP BY 1, 2),
          |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
          |dfs AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
          |scored AS (
          |  SELECT p.doc_id,
          |         sum(ln(1 + (s.n - f2.df + 0.5) / (f2.df + 0.5)) * p.tf * 2.2 /
          |             (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl))) AS score,
          |         CAST(sum(p.tf) AS BIGINT) AS tf_total,
          |         CAST(count(*) AS BIGINT) AS n_terms_hit
          |  FROM post p JOIN dfs f2 USING (term) JOIN dl d USING (doc_id)
          |  CROSS JOIN stats s GROUP BY 1),
          |flt AS (SELECT s2.* FROM scored s2
          |        WHERE s2.doc_id IN (SELECT doc_id FROM post WHERE term = 'merge')
          |          AND s2.doc_id NOT IN (SELECT DISTINCT doc_id FROM toks
          |                                WHERE term = 'hash'))
          |SELECT rank, doc_id, tf_total, n_terms_hit FROM (
          |  SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
          |         doc_id, tf_total, n_terms_hit FROM flt) t
          |WHERE rank <= 10 ORDER BY rank""".stripMargin,
      "q_retrieval_phrase_rank" ->
        """WITH f AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
          |                    x -> len(x) > 0) AS w FROM documents),
          |dl AS (SELECT doc_id, len(w) AS dl FROM f WHERE len(w) > 0),
          |toks AS (SELECT doc_id, unnest(w) AS term FROM f),
          |post AS (SELECT term, doc_id, count(*) AS tf FROM toks
          |         WHERE term IN ('slow', 'merge', 'window') GROUP BY 1, 2),
          |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
          |dfs AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
          |scored AS (
          |  SELECT p.doc_id,
          |         sum(ln(1 + (s.n - f2.df + 0.5) / (f2.df + 0.5)) * p.tf * 2.2 /
          |             (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl))) AS score,
          |         CAST(sum(p.tf) AS BIGINT) AS tf_total,
          |         CAST(count(*) AS BIGINT) AS n_terms_hit
          |  FROM post p JOIN dfs f2 USING (term) JOIN dl d USING (doc_id)
          |  CROSS JOIN stats s GROUP BY 1),
          |ph AS (SELECT doc_id FROM (
          |         SELECT doc_id, len(list_filter(range(1, len(w)),
          |                  i -> w[i] = 'slow' AND w[i+1] = 'merge')) AS n
          |         FROM f WHERE len(w) >= 2) q2 WHERE n > 0),
          |flt AS (SELECT s2.* FROM scored s2 JOIN ph ON s2.doc_id = ph.doc_id)
          |SELECT rank, doc_id, tf_total, n_terms_hit FROM (
          |  SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
          |         doc_id, tf_total, n_terms_hit FROM flt) t
          |WHERE rank <= 10 ORDER BY rank""".stripMargin,
      "q_retrieval_facets" ->
        """WITH f AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
          |                    x -> len(x) > 0) AS w FROM documents),
          |toks AS (SELECT doc_id, unnest(w) AS term FROM f),
          |hit AS (SELECT DISTINCT doc_id FROM toks
          |        WHERE term IN ('slow', 'merge', 'window')),
          |m AS (SELECT d.source, d.lang FROM documents d JOIN hit USING (doc_id))
          |SELECT facet, value, n_docs FROM (
          |  SELECT 'source' AS facet, source AS value,
          |         CAST(count(*) AS BIGINT) AS n_docs FROM m GROUP BY 2
          |  UNION ALL
          |  SELECT 'lang' AS facet, lang AS value,
          |         CAST(count(*) AS BIGINT) AS n_docs FROM m GROUP BY 2) t
          |ORDER BY facet, value""".stripMargin,
      "q_retrieval_didyoumean" ->
        """WITH f AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
          |                    x -> len(x) > 0) AS w FROM documents),
          |dl AS (SELECT doc_id, len(w) AS dl FROM f WHERE len(w) > 0),
          |toks AS (SELECT doc_id, unnest(w) AS term FROM f),
          |dict AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
          |typos AS (SELECT * FROM (VALUES ('mergi'), ('windoq')) v(qt)),
          |sugg AS (SELECT qt, term, row_number() OVER (PARTITION BY qt
          |           ORDER BY levenshtein(qt, term), df DESC, term) AS rk
          |         FROM dict CROSS JOIN typos
          |         WHERE levenshtein(qt, term) <= 2),
          |corrected AS (SELECT DISTINCT term FROM sugg WHERE rk = 1),
          |cstr AS (SELECT string_agg(term, ' ' ORDER BY term) AS c FROM corrected),
          |post AS (SELECT term, doc_id, count(*) AS tf FROM toks
          |         WHERE term IN (SELECT term FROM corrected) GROUP BY 1, 2),
          |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
          |dfs AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
          |scored AS (
          |  SELECT p.doc_id,
          |         sum(ln(1 + (s.n - f2.df + 0.5) / (f2.df + 0.5)) * p.tf * 2.2 /
          |             (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl))) AS score,
          |         CAST(sum(p.tf) AS BIGINT) AS tf_total,
          |         CAST(count(*) AS BIGINT) AS n_terms_hit
          |  FROM post p JOIN dfs f2 USING (term) JOIN dl d USING (doc_id)
          |  CROSS JOIN stats s GROUP BY 1)
          |SELECT rank, doc_id, tf_total, n_terms_hit, cstr.c AS corrected
          |FROM (
          |  SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
          |         doc_id, tf_total, n_terms_hit FROM scored) t
          |CROSS JOIN cstr WHERE rank <= 10 ORDER BY rank""".stripMargin,
      "q_retrieval_spell" ->
        """WITH f AS (SELECT doc_id, list_filter(string_split_regex(lower(
          |     text || CASE WHEN doc_id % 5 = 0 THEN ' mergia' ELSE '' END
          |          || CASE WHEN doc_id % 7 = 0 THEN ' mergib' ELSE '' END), '\s+'),
          |                    x -> len(x) > 0) AS w FROM documents),
          |toks AS (SELECT doc_id, unnest(w) AS term FROM f),
          |dict AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
          |         FROM toks GROUP BY 1),
          |qs AS (SELECT * FROM (VALUES ('mergi'), ('windoq'), ('zzzzzz')) v(query_term)),
          |cand AS (SELECT q.query_term, d.term, d.df,
          |                CAST(levenshtein(q.query_term, d.term) AS BIGINT) AS distance
          |         FROM dict d CROSS JOIN qs q
          |         WHERE levenshtein(q.query_term, d.term) <= 2)
          |SELECT query_term, rank, term, distance, df FROM (
          |  SELECT query_term,
          |         CAST(row_number() OVER (PARTITION BY query_term
          |           ORDER BY distance, df DESC, term) AS BIGINT) AS rank,
          |         term, distance, df FROM cand) t
          |WHERE rank <= 5 ORDER BY query_term, rank""".stripMargin,
      "q_retrieval_stemmed" ->
        """WITH f AS (SELECT doc_id,
          |  len(list_filter(string_split_regex(lower(text), '\s+'),
          |      x -> len(x) > 0)) + 1 AS dl
          |  FROM documents WHERE text IS NOT NULL),
          |n AS (SELECT CAST(count(*) AS BIGINT) AS n_matched FROM f)
          |SELECT rank, doc_id, CAST(1 AS BIGINT) AS tf_total,
          |       CAST(1 AS BIGINT) AS n_terms_hit, n.n_matched,
          |       true AS indexed_same
          |FROM (
          |  SELECT CAST(row_number() OVER (ORDER BY dl, doc_id) AS BIGINT) AS rank,
          |         doc_id FROM f) t CROSS JOIN n
          |WHERE rank <= 15 ORDER BY rank""".stripMargin,
      "q_retrieval_hybrid" ->
        """WITH f AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
          |                    x -> len(x) > 0) AS w FROM documents),
          |dl AS (SELECT doc_id, len(w) AS dl FROM f WHERE len(w) > 0),
          |toks AS (SELECT doc_id, unnest(w) AS term FROM f),
          |post AS (SELECT term, doc_id, count(*) AS tf FROM toks
          |         WHERE term IN ('slow', 'merge', 'window') GROUP BY 1, 2),
          |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
          |dfs AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
          |lexs AS (
          |  SELECT p.doc_id AS id,
          |         sum(ln(1 + (s.n - f2.df + 0.5) / (f2.df + 0.5)) * p.tf * 2.2 /
          |             (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl))) AS score
          |  FROM post p JOIN dfs f2 USING (term) JOIN dl d USING (doc_id)
          |  CROSS JOIN stats s GROUP BY 1),
          |lex AS (SELECT id, score, row_number() OVER (ORDER BY score DESC, id) rk FROM lexs),
          |flat AS (SELECT vec_id, r.i AS i, embedding[r.i] AS x
          |         FROM embeddings, range(1, 65) r(i)),
          |norms AS (SELECT vec_id, sqrt(sum(x * x)) AS n FROM flat GROUP BY 1),
          |dots AS (SELECT c.vec_id AS id, sum(q.x * c.x) AS dot
          |         FROM flat q JOIN flat c ON q.i = c.i
          |         WHERE q.vec_id = 0 AND c.vec_id <> 0 GROUP BY 1),
          |coss AS (SELECT id, dot / (nq.n * nc.n) AS score
          |         FROM dots JOIN norms nq ON nq.vec_id = 0
          |                   JOIN norms nc ON id = nc.vec_id),
          |sem AS (SELECT id, score, row_number() OVER (ORDER BY score DESC, id) rk FROM coss),
          |lex20 AS (SELECT id, score FROM lex WHERE rk <= 20),
          |sem20 AS (SELECT id, score FROM sem WHERE rk <= 20),
          |lmm AS (SELECT min(score) mn, max(score) mx FROM lex20),
          |smm AS (SELECT min(score) mn, max(score) mx FROM sem20),
          |parts AS (
          |  SELECT id, 0.6 * CASE WHEN mx > mn THEN (score - mn) / (mx - mn)
          |                        ELSE 1.0 END AS c FROM lex20, lmm
          |  UNION ALL
          |  SELECT id, 0.4 * CASE WHEN mx > mn THEN (score - mn) / (mx - mn)
          |                        ELSE 1.0 END AS c FROM sem20, smm),
          |fused AS (SELECT id, sum(c) AS score, CAST(count(*) AS BIGINT) AS n_lists
          |          FROM parts GROUP BY 1)
          |SELECT rank, doc_id, n_lists FROM (
          |  SELECT CAST(row_number() OVER (ORDER BY score DESC, id) AS BIGINT) AS rank,
          |         id AS doc_id, n_lists FROM fused) t
          |WHERE rank <= 10 ORDER BY rank""".stripMargin,
      "q_eval_interleave" ->
        """WITH f AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
          |                    x -> len(x) > 0) AS w FROM documents),
          |dl AS (SELECT doc_id, len(w) AS dl FROM f WHERE len(w) > 0),
          |toks AS (SELECT doc_id, unnest(w) AS term FROM f),
          |post AS (SELECT term, doc_id, count(*) AS tf FROM toks
          |         WHERE term IN ('slow', 'merge', 'window') GROUP BY 1, 2),
          |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
          |dfs AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
          |scored AS (
          |  SELECT p.doc_id AS id,
          |         sum(ln(1 + (s.n - f2.df + 0.5) / (f2.df + 0.5)) * p.tf * 2.2 /
          |             (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl))) AS score
          |  FROM post p JOIN dfs f2 USING (term) JOIN dl d USING (doc_id)
          |  CROSS JOIN stats s GROUP BY 1),
          |a AS (SELECT id, row_number() OVER (ORDER BY score DESC, id) rk
          |      FROM scored WHERE id % 2 = 1),
          |b AS (SELECT id, row_number() OVER (ORDER BY score DESC, id) rk
          |      FROM scored WHERE id % 2 = 0),
          |coins AS (SELECT r, substr(md5('il7:' || CAST(r AS VARCHAR)), 1, 1)
          |                   IN ('0', '2', '4', '6', '8', 'a', 'c', 'e') AS afirst
          |          FROM range(1, 11) t(r)),
          |picks AS (
          |  SELECT 2 * c.r - 2 + CASE WHEN c.afirst THEN 1 ELSE 2 END AS pos,
          |         a.id, 'a' AS team
          |  FROM coins c JOIN a ON a.rk = c.r WHERE a.rk <= 10
          |  UNION ALL
          |  SELECT 2 * c.r - 2 + CASE WHEN c.afirst THEN 2 ELSE 1 END AS pos,
          |         b.id, 'b' AS team
          |  FROM coins c JOIN b ON b.rk = c.r WHERE b.rk <= 10)
          |SELECT CAST(pos AS BIGINT) AS pos, id AS doc_id, team
          |FROM picks ORDER BY pos""".stripMargin,
      "q_retrieval_maxsim" ->
        """WITH flat AS (SELECT vec_id, vec_id // 4 AS gid, r.i AS i, embedding[r.i] AS x
          |              FROM embeddings, range(1, 65) r(i)),
          |norms AS (SELECT vec_id, sqrt(sum(x * x)) AS n FROM flat GROUP BY 1),
          |dots AS (SELECT q.vec_id AS qv, c.vec_id AS dv, c.gid AS gid,
          |                sum(q.x * c.x) AS dot
          |         FROM flat q JOIN flat c ON q.i = c.i
          |         WHERE q.gid = 0 GROUP BY 1, 2, 3),
          |coss AS (SELECT qv, gid, dot / (nq.n * nc.n) AS c
          |         FROM dots JOIN norms nq ON qv = nq.vec_id
          |                   JOIN norms nc ON dv = nc.vec_id),
          |mx AS (SELECT qv, gid, max(c) AS m FROM coss GROUP BY 1, 2),
          |sc AS (SELECT gid, sum(m) AS score FROM mx GROUP BY 1)
          |SELECT rank, doc_id, true AS self_exact FROM (
          |  SELECT CAST(row_number() OVER (ORDER BY score DESC, gid) AS BIGINT) AS rank,
          |         gid AS doc_id FROM sc) t
          |WHERE rank <= 10 ORDER BY rank""".stripMargin,
      "q_phrase" ->
        """WITH f AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
          |                    x -> len(x) > 0) AS w FROM documents),
          |per_doc AS (SELECT doc_id, n FROM (
          |  SELECT doc_id, len(list_filter(range(1, len(w) - 1),
          |           i -> w[i] = 'slow' AND w[i+1] = 'hash' AND w[i+2] = 'batch')) AS n
          |  FROM f WHERE len(w) >= 3) q WHERE n > 0)
          |SELECT CAST(count(*) AS BIGINT) AS n_docs,
          |       CAST(coalesce(sum(n), 0) AS BIGINT) AS n_occ,
          |       CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS id_sum
          |FROM per_doc""".stripMargin,
      "q_retrieval_rrf" ->
        """WITH f AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
          |                    x -> len(x) > 0) AS w FROM documents),
          |dl AS (SELECT doc_id, len(w) AS dl FROM f WHERE len(w) > 0),
          |toks AS (SELECT doc_id, unnest(w) AS term FROM f),
          |post AS (SELECT term, doc_id, count(*) AS tf FROM toks
          |         WHERE term IN ('slow', 'merge', 'window') GROUP BY 1, 2),
          |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
          |dfs AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
          |scored AS (
          |  SELECT p.doc_id,
          |         sum(ln(1 + (s.n - f2.df + 0.5) / (f2.df + 0.5)) * p.tf * 2.2 /
          |             (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl))) AS score
          |  FROM post p JOIN dfs f2 USING (term) JOIN dl d USING (doc_id)
          |  CROSS JOIN stats s GROUP BY 1),
          |lex AS (SELECT doc_id, rank FROM (
          |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank
          |  FROM scored) t WHERE rank <= 20),
          |flat AS (SELECT vec_id, r.i AS i, embedding[r.i] AS x
          |         FROM embeddings, range(1, 65) r(i)),
          |norms AS (SELECT vec_id, sqrt(sum(x * x)) AS n FROM flat GROUP BY 1),
          |dots AS (SELECT c.vec_id AS doc_id, sum(q.x * c.x) AS dot
          |         FROM flat q JOIN flat c ON q.i = c.i
          |         WHERE q.vec_id = 0 AND c.vec_id <> 0 GROUP BY 1),
          |cos AS (SELECT doc_id, dot / (nq.n * nc.n) AS c
          |        FROM dots JOIN norms nq ON nq.vec_id = 0
          |                  JOIN norms nc ON doc_id = nc.vec_id),
          |sem AS (SELECT doc_id, rank FROM (
          |  SELECT doc_id, row_number() OVER (ORDER BY c DESC, doc_id) AS rank
          |  FROM cos) t WHERE rank <= 20),
          |rrf AS (
          |  SELECT coalesce(l.doc_id, m.doc_id) AS doc_id,
          |         coalesce(1.0 / (60.0 + l.rank), 0) + coalesce(1.0 / (60.0 + m.rank), 0) AS score,
          |         (CASE WHEN l.rank IS NULL THEN 0 ELSE 1 END
          |        + CASE WHEN m.rank IS NULL THEN 0 ELSE 1 END) AS n_lists
          |  FROM lex l FULL OUTER JOIN sem m ON l.doc_id = m.doc_id)
          |SELECT rank, doc_id, n_lists FROM (
          |  SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
          |         doc_id, CAST(n_lists AS BIGINT) AS n_lists
          |  FROM rrf) t
          |WHERE rank <= 10 ORDER BY rank""".stripMargin,
      "q_snapshot_latest" ->
        """WITH r AS (SELECT *, row_number() OVER (PARTITION BY o_custkey
          |             ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
          |           FROM orders)
          |SELECT count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
          |       CAST(sum(epoch_ms(o_orderdate)) AS BIGINT) AS ts_sum,
          |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
          |         AS cents
          |FROM r WHERE rn = 1""".stripMargin,
      "q_snapshot_merge" ->
        """WITH merged AS (
          |  SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
          |  WHERE o_orderkey % 5 <> 0
          |  UNION ALL
          |  SELECT o_orderkey, o_orderdate + INTERVAL 1000 DAY,
          |         o_totalprice * 2
          |  FROM orders WHERE o_orderkey % 5 = 0)
          |SELECT count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
          |       CAST(sum(epoch_ms(o_orderdate)) AS BIGINT) AS ts_sum,
          |       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
          |         AS cents
          |FROM merged""".stripMargin,
      "q_snapshot_diff" ->
        """WITH o AS (SELECT doc_id, text FROM documents
          |           WHERE text IS NOT NULL AND doc_id % 3 <> 0),
          |n AS (SELECT doc_id,
          |             CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
          |      FROM documents WHERE text IS NOT NULL AND doc_id % 5 <> 0)
          |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
          |       CASE WHEN o.doc_id IS NULL THEN 'added'
          |            WHEN n.doc_id IS NULL THEN 'removed'
          |            WHEN o.text = n.text THEN 'unchanged'
          |            ELSE 'changed' END AS status
          |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
          |ORDER BY doc_id""".stripMargin,
      "q_shuffle_order" ->
        """SELECT doc_id, md5('42:' || CAST(doc_id AS VARCHAR)) AS h
          |FROM documents ORDER BY h, doc_id LIMIT 20""".stripMargin,
      "q_eval_auc" ->
        """WITH scored AS (
          |  SELECT round(((doc_id * 1103515245 + 12345) % 1000000)
          |           / 1000000.0
          |           + CASE WHEN doc_id % 3 = 0 THEN 0.4 ELSE 0.0 END, 6) AS s,
          |         doc_id % 3 = 0 AS y
          |  FROM documents),
          |per AS (SELECT s, CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS p,
          |               CAST(count(*) AS BIGINT) AS t
          |        FROM scored GROUP BY s),
          |cum AS (SELECT p, t,
          |          coalesce(sum(t) OVER (ORDER BY s
          |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c
          |        FROM per),
          |tot AS (SELECT CAST(sum(p) AS BIGINT) AS n_pos,
          |               CAST(sum(t - p) AS BIGINT) AS n_neg,
          |               CAST(sum(p * (2 * c + t + 1)) AS BIGINT) AS rank2_sum
          |        FROM cum)
          |SELECT n_pos, n_neg, rank2_sum,
          |       CASE WHEN n_pos > 0 AND n_neg > 0 THEN
          |         CAST(rank2_sum - n_pos * (n_pos + 1) AS DOUBLE)
          |           / CAST(2 * n_pos * n_neg AS DOUBLE)
          |       END AS auc
          |FROM tot""".stripMargin,
      "q_eval_confusion" ->
        """WITH scored AS (
          |  SELECT ((doc_id * 1103515245 + 12345) % 1000000) / 1000000.0
          |           + CASE WHEN doc_id % 3 = 0 THEN 0.4 ELSE 0.0 END AS s,
          |         doc_id % 3 = 0 AS y
          |  FROM documents),
          |c AS (SELECT
          |  CAST(sum(CASE WHEN s >= 0.7 AND y THEN 1 ELSE 0 END) AS BIGINT) AS tp,
          |  CAST(sum(CASE WHEN s >= 0.7 AND NOT y THEN 1 ELSE 0 END) AS BIGINT) AS fp,
          |  CAST(sum(CASE WHEN s < 0.7 AND NOT y THEN 1 ELSE 0 END) AS BIGINT) AS tn,
          |  CAST(sum(CASE WHEN s < 0.7 AND y THEN 1 ELSE 0 END) AS BIGINT) AS fn
          |  FROM scored),
          |d AS (SELECT *,
          |  CASE WHEN tp + fp > 0
          |       THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END AS precision,
          |  CASE WHEN tp + fn > 0
          |       THEN CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END AS recall
          |  FROM c)
          |SELECT tp, fp, tn, fn, precision, recall,
          |       CASE WHEN precision IS NOT NULL AND recall IS NOT NULL
          |                 AND precision + recall > 0
          |            THEN 2.0 * precision * recall / (precision + recall)
          |       END AS f1
          |FROM d""".stripMargin,
      "q_eval_calibration" ->
        """WITH scored AS (
          |  SELECT round(((doc_id * 1103515245 + 12345) % 1000000)
          |           / 1000000.0
          |           + CASE WHEN doc_id % 3 = 0 THEN 0.4 ELSE 0.0 END, 6) AS s,
          |         doc_id % 3 = 0 AS y
          |  FROM documents)
          |SELECT CAST(least(greatest(floor(s * 10), 0), 9) AS INT) AS bin,
          |       count(*) AS n,
          |       CAST(sum(CAST(round(s * 1000000) AS BIGINT)) AS DOUBLE)
          |         / CAST(count(*) * 1000000 AS DOUBLE) AS mean_score,
          |       CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS DOUBLE)
          |         / CAST(count(*) AS DOUBLE) AS pos_rate
          |FROM scored GROUP BY 1 ORDER BY bin""".stripMargin,
      "q_embed_normalize" ->
        """SELECT count(*) AS n, true AS all_unit, true AS trunc_unit,
          |       true AS trunc_len_ok
          |FROM embeddings""".stripMargin,
      "q_embed_int8" ->
        """SELECT count(*) AS n, true AS err_bounded, true AS codes_in_range,
          |       true AS cos_ok
          |FROM embeddings""".stripMargin,
      "q_embed_pca" ->
        """SELECT CAST(8 AS INT) AS n_components, true AS var_matches,
          |       CAST(64 AS INT) AS dim, true AS orthonormal,
          |       true AS evals_desc""".stripMargin,
      "q_arrow" ->
        """SELECT count(*) AS n_rows, CAST(sum(doc_id) AS BIGINT) AS id_sum,
          |       CAST(sum(length(text)) AS BIGINT) AS chars,
          |       CAST(count(DISTINCT lang) AS BIGINT) AS langs,
          |       CAST(sum(len(string_split_regex(text, '\s+'))) AS BIGINT)
          |         AS tok_n,
          |       true AS score_exact
          |FROM documents""".stripMargin,
      "q_ts_rate" ->
        """WITH ser AS (SELECT user_id, epoch_ms(ts) AS ms, max(value) AS v
          |             FROM events GROUP BY 1, 2
          |             HAVING max(value) IS NOT NULL),
          |inc AS (SELECT user_id, ms, v,
          |               lag(v) OVER (PARTITION BY user_id ORDER BY ms) AS prev
          |        FROM ser),
          |d AS (SELECT user_id, ms - ms % 3600000 AS bucket_ms,
          |             CASE WHEN prev IS NULL THEN NULL
          |                  WHEN v >= prev THEN v - prev ELSE v END AS inc
          |      FROM inc),
          |r AS (SELECT user_id, bucket_ms, count(*) AS samples,
          |             coalesce(sum(inc), 0) AS increase
          |      FROM d GROUP BY 1, 2)
          |SELECT bucket_ms, count(*) AS series,
          |       CAST(sum(samples) AS BIGINT) AS samples,
          |       CAST(round(sum(increase) * 100, 0) AS BIGINT) AS cents
          |FROM r GROUP BY 1 ORDER BY bucket_ms""".stripMargin,
      "q_ts_gapfill" ->
        """WITH hr AS (SELECT user_id,
          |              epoch_ms(ts) - epoch_ms(ts) % 3600000 AS ms,
          |              max(value) AS v
          |            FROM events GROUP BY 1, 2),
          |led AS (SELECT user_id, ms, v, lead(ms) OVER w AS nt,
          |               lead(v) OVER w AS nv
          |        FROM hr WINDOW w AS (PARTITION BY user_id ORDER BY ms)),
          |cells AS (SELECT user_id, ms, v, nt, nv,
          |                 unnest(generate_series(ms,
          |                   CASE WHEN nt IS NULL THEN ms ELSE nt - 3600000 END,
          |                   3600000)) AS ct
          |          FROM led),
          |f AS (SELECT ct = ms AS was_observed,
          |             CASE WHEN ct = ms THEN v
          |                  ELSE v + (nv - v) *
          |                    (CAST(ct - ms AS DOUBLE) / CAST(nt - ms AS DOUBLE))
          |             END AS filled
          |      FROM cells)
          |SELECT was_observed, count(*) AS cnt,
          |       CAST(round(sum(filled) * 100, 0) AS BIGINT) AS cents
          |FROM f GROUP BY 1 ORDER BY was_observed""".stripMargin,
      "q_ts_ewma" ->
        """WITH ser AS (SELECT user_id, epoch_ms(ts) AS ms, max(value) AS v
          |             FROM events GROUP BY 1, 2),
          |rn AS (SELECT user_id, v,
          |              row_number() OVER (PARTITION BY user_id ORDER BY ms) AS rn
          |       FROM ser),
          |lastn AS (SELECT user_id, max(rn) AS n FROM rn GROUP BY 1),
          |pairs AS (SELECT l.user_id, l.n, r.v, l.n - r.rn AS k
          |          FROM lastn l JOIN rn r
          |            ON l.user_id = r.user_id AND r.rn > l.n - 16),
          |e AS (SELECT user_id, any_value(n) AS n,
          |             sum(v * power(0.75, k)) / sum(power(0.75, k)) AS ew
          |      FROM pairs GROUP BY user_id)
          |SELECT user_id, CAST(n AS BIGINT) AS n, round(ew, 4) AS ewma_last
          |FROM e ORDER BY user_id""".stripMargin,
      "q_rank_metrics" ->
        """WITH flat AS (SELECT vec_id, r.i AS i, embedding[r.i] AS x
          |              FROM embeddings, range(1, 65) r(i)),
          |norms AS (SELECT vec_id, sqrt(sum(x * x)) AS n FROM flat GROUP BY 1),
          |dots AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
          |                sum(q.x * c.x) AS dot
          |         FROM flat q JOIN flat c ON q.i = c.i
          |         WHERE q.vec_id < 32 AND c.vec_id <> q.vec_id GROUP BY 1, 2),
          |cos AS (SELECT query_id, neighbor_id, dot / (nq.n * nc.n) AS c
          |        FROM dots JOIN norms nq ON query_id = nq.vec_id
          |                  JOIN norms nc ON neighbor_id = nc.vec_id),
          |ranked AS (SELECT query_id, neighbor_id,
          |                  row_number() OVER (PARTITION BY query_id
          |                                     ORDER BY c DESC, neighbor_id) AS rank
          |           FROM cos),
          |lab AS (SELECT vec_id, label FROM embeddings),
          |rel AS (SELECT r.query_id, r.rank, ql.label = nl.label AS rel
          |        FROM ranked r JOIN lab ql ON r.query_id = ql.vec_id
          |                      JOIN lab nl ON r.neighbor_id = nl.vec_id
          |        WHERE r.rank <= 10),
          |agg AS (SELECT query_id, sum(CASE WHEN rel THEN 1 ELSE 0 END) AS hits,
          |               min(CASE WHEN rel THEN rank END) AS fr,
          |               sum(CASE WHEN rel THEN 1.0 / log2(rank + 1) ELSE 0 END) AS dcg
          |        FROM rel GROUP BY 1),
          |cnt AS (SELECT label, count(*) AS c FROM embeddings GROUP BY 1),
          |tot AS (SELECT e.vec_id AS query_id, cnt.c - 1 AS n_rel
          |        FROM embeddings e JOIN cnt ON e.label = cnt.label
          |        WHERE e.vec_id < 32),
          |-- every label has >= 42 members at these SFs, so
          |-- least(n_rel, 10) = 10: the ideal DCG is one constant
          |idcg AS (SELECT sum(1.0 / log2(i + 1)) AS v
          |         FROM generate_series(1, 10) g(i))
          |SELECT t.query_id, CAST(t.n_rel AS BIGINT) AS n_rel,
          |       CAST(coalesce(a.hits, 0) AS BIGINT) AS hits,
          |       CAST(a.fr AS BIGINT) AS first_rank,
          |       CAST(coalesce(a.hits, 0) AS DOUBLE) / 10 AS precision_at_k,
          |       CAST(coalesce(a.hits, 0) AS DOUBLE) / t.n_rel AS recall_at_k,
          |       coalesce(1.0 / CAST(a.fr AS DOUBLE), 0.0) AS reciprocal_rank,
          |       round(coalesce(a.dcg, 0), 4) AS dcg4,
          |       round(coalesce(a.dcg, 0) / i.v, 4) AS ndcg
          |FROM tot t LEFT JOIN agg a ON t.query_id = a.query_id
          |           CROSS JOIN idcg i
          |ORDER BY t.query_id""".stripMargin,
      "q_sft" ->
        """WITH toks AS (SELECT doc_id,
          |                list_filter(string_split_regex(text, '\s+'),
          |                            x -> length(x) > 0) AS tk
          |              FROM documents),
          |tok AS (SELECT doc_id, i, tk[i] AS t FROM (
          |          SELECT doc_id, tk,
          |                 unnest(generate_series(1, len(tk))) AS i
          |          FROM toks) z),
          |chunk AS (SELECT doc_id, CAST(floor((i - 1) / 3) AS BIGINT) AS ci,
          |                 CAST(sum(length(t)) + count(*) - 1 AS BIGINT) AS clen
          |          FROM tok GROUP BY 1, 2),
          |w AS (SELECT doc_id, ci, clen,
          |             CASE WHEN ci % 2 = 0 THEN 4 ELSE 9 END AS rlen,
          |             CASE WHEN ci % 2 = 0 THEN 4 ELSE 9 END + 13 + clen AS width
          |      FROM chunk),
          |pos AS (SELECT doc_id, ci, clen, rlen, width,
          |               coalesce(sum(width) OVER (PARTITION BY doc_id ORDER BY ci
          |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS p
          |        FROM w),
          |per AS (SELECT doc_id, count(*) AS n_turns,
          |               sum(width) AS rendered_chars,
          |               sum(CASE WHEN ci % 2 = 1 THEN clen ELSE 0 END) AS masked_chars,
          |               sum(CASE WHEN ci % 2 = 1 THEN 1 ELSE 0 END) AS n_spans,
          |               sum(CASE WHEN ci % 2 = 1
          |                   THEN 2 * (p + rlen + 5) + clen ELSE 0 END) AS span_sum
          |        FROM pos GROUP BY 1)
          |SELECT d.doc_id,
          |       CAST(coalesce(per.n_turns, 0) AS BIGINT) AS n_turns,
          |       coalesce(per.n_turns, 0) > 0 AND
          |         coalesce(per.n_turns, 0) % 2 = 0 AS valid,
          |       CAST(coalesce(per.rendered_chars, 0) AS BIGINT) AS rendered_chars,
          |       CAST(coalesce(per.masked_chars, 0) AS BIGINT) AS masked_chars,
          |       CAST(coalesce(per.n_spans, 0) AS BIGINT) AS n_spans,
          |       CAST(coalesce(per.span_sum, 0) AS BIGINT) AS span_sum
          |FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
          |ORDER BY d.doc_id""".stripMargin,
      "q_json_props" ->
        """SELECT event_type, count(*) AS n,
          |       count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS parsed,
          |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
          |            AS BIGINT) AS k_sum,
          |       CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT))
          |            AS BIGINT) AS k_min,
          |       CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT))
          |            AS BIGINT) AS k_max
          |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,
      "q_curriculum" ->
        """WITH idx AS (SELECT st, row_number() OVER (ORDER BY st) - 1 AS si,
          |                    count(*) OVER () AS s
          |             FROM (SELECT DISTINCT source AS st FROM documents) d),
          |r AS (SELECT doc_id, source,
          |             row_number() OVER (PARTITION BY source
          |                                ORDER BY n_chars, doc_id) - 1 AS r
          |      FROM documents)
          |SELECT r.doc_id, r.source, CAST(r.r * idx.s + idx.si AS BIGINT) AS ord
          |FROM r JOIN idx ON r.source = idx.st
          |ORDER BY r.doc_id""".stripMargin,
      "q_retrieval_mlt" ->
        """WITH f AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
          |                    x -> len(x) > 0) AS w FROM documents),
          |dl AS (SELECT doc_id, len(w) AS dl FROM f WHERE len(w) > 0),
          |toks AS (SELECT doc_id, unnest(w) AS term FROM f),
          |src AS (SELECT term, count(*) AS tf FROM toks WHERE doc_id = 5 GROUP BY 1),
          |dfs0 AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
          |sel AS (SELECT s.term, row_number() OVER (ORDER BY d.df, s.tf DESC, s.term) AS rk
          |        FROM src s JOIN dfs0 d USING (term)),
          |qstr AS (SELECT string_agg(term, ' ' ORDER BY rk) AS q FROM sel WHERE rk <= 4),
          |post AS (SELECT term, doc_id, count(*) AS tf FROM toks
          |         WHERE term IN (SELECT term FROM sel WHERE rk <= 4) GROUP BY 1, 2),
          |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
          |dfs AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
          |scored AS (
          |  SELECT p.doc_id,
          |         sum(ln(1 + (s.n - f2.df + 0.5) / (f2.df + 0.5)) * p.tf * 2.2 /
          |             (p.tf + 1.2 * (0.25 + 0.75 * d2.dl / s.avgdl))) AS score,
          |         CAST(sum(p.tf) AS BIGINT) AS tf_total,
          |         CAST(count(*) AS BIGINT) AS n_terms_hit
          |  FROM post p JOIN dfs f2 USING (term) JOIN dl d2 USING (doc_id)
          |  CROSS JOIN stats s WHERE p.doc_id <> 5 GROUP BY 1)
          |SELECT rank, doc_id, tf_total, n_terms_hit, qstr.q AS query FROM (
          |  SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
          |         doc_id, tf_total, n_terms_hit FROM scored) t
          |CROSS JOIN qstr WHERE rank <= 10 ORDER BY rank""".stripMargin,
      "q_retrieval_complete" ->
        """WITH f AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
          |                    x -> len(x) > 0) AS w FROM documents),
          |toks AS (SELECT doc_id, unnest(w) AS term FROM f),
          |dict AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
          |         FROM toks GROUP BY 1),
          |ps AS (SELECT * FROM (VALUES ('s'), ('me')) v(prefix)),
          |ranked AS (SELECT p.prefix, d.term, d.df,
          |             row_number() OVER (PARTITION BY p.prefix
          |                                ORDER BY d.df DESC, d.term) AS rk
          |           FROM dict d JOIN ps p ON d.term LIKE p.prefix || '%')
          |SELECT prefix, CAST(rk AS BIGINT) AS rank, term, df,
          |       true AS persisted_same
          |FROM ranked WHERE rk <= 8 ORDER BY prefix, rank""".stripMargin,
      "q_retrieval_collapse" ->
        """WITH f AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
          |                    x -> len(x) > 0) AS w FROM documents),
          |dl AS (SELECT doc_id, len(w) AS dl FROM f WHERE len(w) > 0),
          |toks AS (SELECT doc_id, unnest(w) AS term FROM f),
          |post AS (SELECT term, doc_id, count(*) AS tf FROM toks
          |         WHERE term IN ('slow', 'merge', 'window') GROUP BY 1, 2),
          |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
          |dfs AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
          |scored AS (
          |  SELECT p.doc_id,
          |         sum(ln(1 + (s.n - f2.df + 0.5) / (f2.df + 0.5)) * p.tf * 2.2 /
          |             (p.tf + 1.2 * (0.25 + 0.75 * d2.dl / s.avgdl))) AS score
          |  FROM post p JOIN dfs f2 USING (term) JOIN dl d2 USING (doc_id)
          |  CROSS JOIN stats s GROUP BY 1),
          |pool AS (SELECT rank, doc_id FROM (
          |  SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
          |         doc_id FROM scored) t WHERE rank <= 40),
          |withg AS (SELECT p.rank, p.doc_id, d.source AS grp
          |          FROM pool p JOIN documents d USING (doc_id)),
          |reps AS (SELECT grp, rank, doc_id,
          |           row_number() OVER (PARTITION BY grp ORDER BY rank) AS wi
          |         FROM withg)
          |SELECT collapsed_rank, grp, pool_rank, doc_id FROM (
          |  SELECT CAST(row_number() OVER (ORDER BY rank) AS BIGINT) AS collapsed_rank,
          |         grp, rank AS pool_rank, doc_id
          |  FROM reps WHERE wi = 1) t
          |WHERE collapsed_rank <= 8 ORDER BY collapsed_rank""".stripMargin,
      "q_ann_matryoshka" ->
        """SELECT CAST(15 AS BIGINT) AS n_rows, true AS copies_rank1,
          |  true AS pool_exhaustive_exact, true AS indexed_exact""".stripMargin,
      "q_serving_cache" ->
        """SELECT true AS first_miss, true AS second_hit, true AS rows_same,
          |  true AS other_query_miss, true AS mutation_invalidates,
          |  true AS new_doc_ranked, true AS refreshed_hit""".stripMargin,
      "q_eval_significance" ->
        """WITH f AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
          |                    x -> len(x) > 0) AS w FROM documents),
          |toks AS (SELECT doc_id, unnest(w) AS term FROM f),
          |dq AS (SELECT doc_id,
          |         max(CASE WHEN term = 'slow' THEN 1 ELSE 0 END) AS hs,
          |         max(CASE WHEN term = 'merge' THEN 1 ELSE 0 END) AS hm
          |       FROM toks GROUP BY 1),
          |gm AS (SELECT gg.g,
          |         coalesce(sum(q.hs), 0) AS ma, coalesce(sum(q.hm), 0) AS mb
          |       FROM generate_series(0, 11) gg(g)
          |       LEFT JOIN (SELECT doc_id % 12 AS g2, hs, hm FROM dq) q
          |         ON gg.g = q.g2
          |       GROUP BY 1),
          |obs AS (SELECT CAST(count(*) AS BIGINT) AS n_queries,
          |               CAST(sum(ma - mb) AS DOUBLE) AS obs_diff FROM gm),
          |sums AS (SELECT r.r,
          |           sum(CASE WHEN substr(md5('sig14:' || CAST(r.r AS VARCHAR)
          |                 || ':' || CAST(gm.g AS VARCHAR)), 1, 1)
          |               IN ('0','2','4','6','8','a','c','e')
          |               THEN gm.ma - gm.mb ELSE gm.mb - gm.ma END) AS s
          |         FROM range(1, 201) r(r) CROSS JOIN gm GROUP BY 1),
          |ge AS (SELECT CAST(count(*) AS BIGINT) AS reps,
          |         CAST(sum(CASE WHEN abs(CAST(s AS DOUBLE)) >= abs(o.obs_diff)
          |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_ge
          |       FROM sums CROSS JOIN obs o)
          |SELECT o.n_queries, o.obs_diff, g.reps, g.n_ge,
          |       (CAST(g.n_ge AS DOUBLE) + CAST(1 AS DOUBLE)) /
          |       (CAST(g.reps AS DOUBLE) + CAST(1 AS DOUBLE)) AS p_value
          |FROM obs o CROSS JOIN ge g""".stripMargin,
      "q_index_asof" ->
        """WITH sub AS (SELECT doc_id, text FROM documents
          |             WHERE doc_id % 2 = 1 OR doc_id % 4 = 0),
          |f AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
          |                    x -> len(x) > 0) AS w FROM sub),
          |dl AS (SELECT doc_id, len(w) AS dl FROM f WHERE len(w) > 0),
          |toks AS (SELECT doc_id, unnest(w) AS term FROM f),
          |post AS (SELECT term, doc_id, count(*) AS tf FROM toks
          |         WHERE term IN ('slow', 'merge', 'window') GROUP BY 1, 2),
          |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
          |dfs AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
          |scored AS (
          |  SELECT p.doc_id,
          |         sum(ln(1 + (s.n - f2.df + 0.5) / (f2.df + 0.5)) * p.tf * 2.2 /
          |             (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl))) AS score,
          |         CAST(sum(p.tf) AS BIGINT) AS tf_total,
          |         CAST(count(*) AS BIGINT) AS n_terms_hit
          |  FROM post p JOIN dfs f2 USING (term) JOIN dl d USING (doc_id)
          |  CROSS JOIN stats s GROUP BY 1)
          |SELECT rank, doc_id, tf_total, n_terms_hit,
          |       (SELECT CAST(count(*) AS BIGINT) FROM dl) AS n_docs_asof
          |FROM (
          |  SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
          |         doc_id, tf_total, n_terms_hit FROM scored) t
          |WHERE rank <= 10 ORDER BY rank""".stripMargin,
      "q_retrieval_negatives" ->
        """WITH f AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
          |                    x -> len(x) > 0) AS w FROM documents),
          |dl AS (SELECT doc_id, len(w) AS dl FROM f WHERE len(w) > 0),
          |toks AS (SELECT doc_id, unnest(w) AS term FROM f),
          |qt AS (SELECT * FROM (VALUES
          |         (0, 'slow'), (0, 'merge'), (0, 'window'),
          |         (1, 'hash'), (1, 'batch'),
          |         (2, 'filter'), (2, 'scan'), (2, 'index'))
          |       v(query_id, term)),
          |post AS (SELECT term, doc_id, count(*) AS tf FROM toks
          |         WHERE term IN (SELECT term FROM qt) GROUP BY 1, 2),
          |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
          |dfs AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
          |scored AS (
          |  SELECT q.query_id, p.doc_id,
          |         sum(ln(1 + (s.n - f2.df + 0.5) / (f2.df + 0.5)) * p.tf * 2.2 /
          |             (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl))) AS score
          |  FROM post p JOIN qt q USING (term) JOIN dfs f2 USING (term)
          |       JOIN dl d USING (doc_id)
          |  CROSS JOIN stats s GROUP BY 1, 2),
          |pool AS (SELECT query_id, rank, doc_id FROM (
          |  SELECT query_id,
          |         CAST(row_number() OVER (PARTITION BY query_id
          |           ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
          |         doc_id FROM scored) t WHERE rank <= 20),
          |negs AS (SELECT query_id, rank, doc_id FROM pool
          |         WHERE NOT (query_id = 0 AND doc_id % 10 = 3)
          |           AND NOT (query_id = 1 AND doc_id % 10 = 4)
          |           AND NOT (query_id = 2 AND doc_id % 10 = 5))
          |SELECT CAST(query_id AS BIGINT) AS query_id, neg_rank,
          |       doc_id AS negative_id, rank AS pool_rank
          |FROM (
          |  SELECT query_id, rank, doc_id,
          |         CAST(row_number() OVER (PARTITION BY query_id
          |           ORDER BY rank) AS BIGINT) AS neg_rank
          |  FROM negs) t
          |WHERE neg_rank <= 5 ORDER BY query_id, neg_rank""".stripMargin,
      "q_ltr_features" ->
        """WITH f AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
          |                    x -> len(x) > 0) AS w FROM documents),
          |dl AS (SELECT doc_id, len(w) AS dl FROM f WHERE len(w) > 0),
          |toks AS (SELECT doc_id, unnest(w) AS term FROM f),
          |qt AS (SELECT * FROM (VALUES
          |         (0, 'slow'), (0, 'merge'), (1, 'window'), (1, 'group'))
          |       v(query_id, term)),
          |post AS (SELECT term, doc_id, count(*) AS tf FROM toks
          |         WHERE term IN (SELECT term FROM qt) GROUP BY 1, 2),
          |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
          |dfs AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
          |nq AS (SELECT query_id, CAST(count(*) AS BIGINT) AS f_n_qterms
          |       FROM qt GROUP BY 1),
          |agg AS (
          |  SELECT q.query_id, p.doc_id,
          |         sum(ln(1 + (s.n - f2.df + 0.5) / (f2.df + 0.5)) * p.tf * 2.2 /
          |             (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl))) AS f_bm25,
          |         sum(ln(1 + (s.n - f2.df + 0.5) / (f2.df + 0.5))) AS f_idf,
          |         CAST(sum(p.tf) AS BIGINT) AS f_tf_sum,
          |         CAST(count(*) AS BIGINT) AS f_n_hit,
          |         CAST(min(d.dl) AS BIGINT) AS f_dl
          |  FROM post p JOIN qt q USING (term) JOIN dfs f2 USING (term)
          |       JOIN dl d USING (doc_id)
          |  CROSS JOIN stats s GROUP BY 1, 2)
          |SELECT CAST(a.query_id AS BIGINT) AS query_id, a.doc_id,
          |       CASE WHEN a.query_id = 0 AND a.doc_id % 7 = 1
          |              THEN CAST(1 AS DOUBLE)
          |            WHEN a.query_id = 1 AND a.doc_id % 7 = 2
          |              THEN CAST(2 AS DOUBLE)
          |            ELSE CAST(0 AS DOUBLE) END AS label,
          |       CAST(round(a.f_bm25 * 10000) AS BIGINT) AS f_bm25_4dp,
          |       CAST(round(a.f_idf * 10000) AS BIGINT) AS f_idf_4dp,
          |       a.f_tf_sum, a.f_n_hit, a.f_dl, n.f_n_qterms,
          |       CAST(round(CAST(a.f_n_hit AS DOUBLE) / n.f_n_qterms * 10000)
          |            AS BIGINT) AS f_frac_4dp
          |FROM agg a JOIN nq n USING (query_id)
          |ORDER BY query_id, doc_id""".stripMargin,
      "q_retrieval_mlt_batch" ->
        """WITH f AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
          |                    x -> len(x) > 0) AS w FROM documents),
          |dl AS (SELECT doc_id, len(w) AS dl FROM f WHERE len(w) > 0),
          |toks AS (SELECT doc_id, unnest(w) AS term FROM f),
          |src AS (SELECT doc_id AS query_id, term, count(*) AS tf FROM toks
          |        WHERE doc_id IN (3, 5, 9) GROUP BY 1, 2),
          |dfs0 AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks
          |         WHERE term IN (SELECT term FROM src) GROUP BY 1),
          |sel AS (SELECT s.query_id, s.term,
          |          row_number() OVER (PARTITION BY s.query_id
          |            ORDER BY coalesce(d.df, 0), s.tf DESC, s.term) AS rk
          |        FROM src s LEFT JOIN dfs0 d USING (term)),
          |qt AS (SELECT query_id, term FROM sel WHERE rk <= 4),
          |qstr AS (SELECT query_id, string_agg(term, ' ' ORDER BY rk) AS q
          |         FROM sel WHERE rk <= 4 GROUP BY 1),
          |post AS (SELECT term, doc_id, count(*) AS tf FROM toks
          |         WHERE term IN (SELECT term FROM qt) GROUP BY 1, 2),
          |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
          |dfs AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
          |scored AS (
          |  SELECT q.query_id, p.doc_id,
          |         sum(ln(1 + (s.n - f2.df + 0.5) / (f2.df + 0.5)) * p.tf * 2.2 /
          |             (p.tf + 1.2 * (0.25 + 0.75 * d2.dl / s.avgdl))) AS score,
          |         CAST(sum(p.tf) AS BIGINT) AS tf_total,
          |         CAST(count(*) AS BIGINT) AS n_terms_hit
          |  FROM post p JOIN qt q USING (term) JOIN dfs f2 USING (term)
          |       JOIN dl d2 USING (doc_id)
          |  CROSS JOIN stats s GROUP BY 1, 2),
          |pool AS (SELECT query_id, rank, doc_id, tf_total, n_terms_hit FROM (
          |  SELECT query_id,
          |         CAST(row_number() OVER (PARTITION BY query_id
          |           ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
          |         doc_id, tf_total, n_terms_hit FROM scored) t
          |  WHERE rank <= 9)
          |SELECT p.query_id, p.rel_rank, p.doc_id, p.tf_total,
          |       p.n_terms_hit, qs.q AS query
          |FROM (
          |  SELECT query_id, doc_id, tf_total, n_terms_hit,
          |         CAST(row_number() OVER (PARTITION BY query_id
          |           ORDER BY rank) AS BIGINT) AS rel_rank
          |  FROM pool WHERE doc_id <> query_id) p
          |JOIN qstr qs USING (query_id)
          |WHERE p.rel_rank <= 8
          |ORDER BY query_id, rel_rank""".stripMargin,
      "q_percolate" ->
        """WITH f AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
          |                    x -> len(x) > 0) AS w FROM documents),
          |dtoks AS (SELECT DISTINCT doc_id, unnest(w) AS term FROM f),
          |q AS (SELECT * FROM (VALUES
          |        (1, 'slow'), (1, 'merge'),
          |        (2, 'window'),
          |        (3, 'slow'), (3, 'window'), (3, 'group'))
          |      v(query_id, term)),
          |qs AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_terms
          |       FROM q GROUP BY 1),
          |m AS (SELECT d.doc_id, q.query_id, count(*) AS matched
          |      FROM dtoks d JOIN q ON d.term = q.term GROUP BY 1, 2)
          |SELECT m.doc_id, CAST(m.query_id AS BIGINT) AS query_id, s.n_terms
          |FROM m JOIN qs s USING (query_id)
          |WHERE m.matched = s.n_terms
          |ORDER BY doc_id, query_id""".stripMargin,
      "q_complete_sync" ->
        """SELECT true AS initial_build, true AS unchanged_noop,
          |  true AS rebuilt_after_append, true AS planted_term_served""".stripMargin,
      "q_index_upsert" ->
        """WITH up AS (SELECT doc_id,
          |              text || CASE WHEN doc_id % 5 = 0 THEN ' zzupserted'
          |                           ELSE '' END AS text
          |            FROM documents),
          |f AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
          |                    x -> len(x) > 0) AS w FROM up),
          |dl AS (SELECT doc_id, len(w) AS dl FROM f WHERE len(w) > 0),
          |toks AS (SELECT doc_id, unnest(w) AS term FROM f),
          |post AS (SELECT term, doc_id, count(*) AS tf FROM toks
          |         WHERE term IN ('slow', 'merge', 'zzupserted') GROUP BY 1, 2),
          |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
          |dfs AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
          |scored AS (
          |  SELECT p.doc_id,
          |         sum(ln(1 + (s.n - f2.df + 0.5) / (f2.df + 0.5)) * p.tf * 2.2 /
          |             (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl))) AS score,
          |         CAST(sum(p.tf) AS BIGINT) AS tf_total,
          |         CAST(count(*) AS BIGINT) AS n_terms_hit
          |  FROM post p JOIN dfs f2 USING (term) JOIN dl d USING (doc_id)
          |  CROSS JOIN stats s GROUP BY 1)
          |SELECT rank, doc_id, tf_total, n_terms_hit FROM (
          |  SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
          |         doc_id, tf_total, n_terms_hit FROM scored) t
          |WHERE rank <= 10 ORDER BY rank""".stripMargin,
      "q_term_stats" ->
        """WITH f AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
          |                    x -> len(x) > 0) AS w FROM documents),
          |dl AS (SELECT doc_id, len(w) AS dl FROM f WHERE len(w) > 0),
          |toks AS (SELECT doc_id, unnest(w) AS term FROM f),
          |post AS (SELECT term, doc_id, count(*) AS tf FROM toks
          |         WHERE term IN ('slow', 'merge', 'window', 'zzabsent')
          |         GROUP BY 1, 2),
          |n AS (SELECT count(*) AS n_docs FROM dl)
          |SELECT term, CAST(count(*) AS BIGINT) AS df,
          |       CAST(sum(tf) AS BIGINT) AS cf,
          |       CAST(round(ln(1 + (n.n_docs - count(*) + 0.5) /
          |                         (count(*) + 0.5)) * 10000) AS BIGINT)
          |         AS idf_4dp
          |FROM post CROSS JOIN n GROUP BY term, n.n_docs
          |ORDER BY term""".stripMargin,
      "q_retrieval_facet_stats" ->
        """WITH f AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
          |                    x -> len(x) > 0) AS w FROM documents),
          |toks AS (SELECT doc_id, unnest(w) AS term FROM f),
          |hit AS (SELECT DISTINCT doc_id FROM toks
          |        WHERE term IN ('slow', 'merge', 'window')),
          |m AS (SELECT d.source, d.n_chars FROM documents d
          |      JOIN hit USING (doc_id))
          |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
          |       CAST(sum(n_chars) AS BIGINT) AS stat_sum,
          |       CAST(sum(n_chars) AS DOUBLE) / count(*) AS stat_avg
          |FROM m GROUP BY source
          |ORDER BY n_docs DESC, source LIMIT 10""".stripMargin,
      "q_eval_bootstrap" ->
        """WITH f AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
          |                    x -> len(x) > 0) AS w FROM documents),
          |toks AS (SELECT doc_id, unnest(w) AS term FROM f),
          |dq AS (SELECT doc_id,
          |         max(CASE WHEN term = 'slow' THEN 1 ELSE 0 END) AS hs,
          |         max(CASE WHEN term = 'merge' THEN 1 ELSE 0 END) AS hm
          |       FROM toks GROUP BY 1),
          |gm AS (SELECT gg.g,
          |         coalesce(sum(q.hs), 0) AS ma, coalesce(sum(q.hm), 0) AS mb
          |       FROM generate_series(0, 11) gg(g)
          |       LEFT JOIN (SELECT doc_id % 12 AS g2, hs, hm FROM dq) q
          |         ON gg.g = q.g2
          |       GROUP BY 1),
          |base AS (SELECT g, ma - mb AS d,
          |           row_number() OVER (ORDER BY CAST(g AS VARCHAR)) - 1 AS i
          |         FROM gm),
          |obs AS (SELECT CAST(count(*) AS BIGINT) AS n_queries,
          |               sum(d) AS obs_sum FROM base),
          |draws AS (SELECT r.r,
          |            CAST(concat('0x', substr(md5('bs14:'
          |              || CAST(r.r AS VARCHAR) || ':'
          |              || CAST(sl.s AS VARCHAR)), 1, 8)) AS BIGINT) % 12 AS i
          |          FROM range(1, 201) r(r) CROSS JOIN range(0, 12) sl(s)),
          |sums AS (SELECT d2.r, sum(b.d) AS s
          |         FROM draws d2 JOIN base b USING (i) GROUP BY 1),
          |ranked AS (SELECT s, row_number() OVER (ORDER BY s) AS rn FROM sums),
          |lo AS (SELECT s AS lo_s FROM ranked WHERE rn = 5),
          |hi AS (SELECT s AS hi_s FROM ranked WHERE rn = 195)
          |SELECT o.n_queries,
          |       CAST(o.obs_sum AS DOUBLE) / o.n_queries AS obs_mean,
          |       CAST(200 AS BIGINT) AS reps,
          |       CAST(l.lo_s AS DOUBLE) / o.n_queries AS ci_lo,
          |       CAST(h.hi_s AS DOUBLE) / o.n_queries AS ci_hi
          |FROM obs o CROSS JOIN lo l CROSS JOIN hi h""".stripMargin,
      "q_retrieval_bm25plus" ->
        """WITH f AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
          |                    x -> len(x) > 0) AS w FROM documents),
          |dl AS (SELECT doc_id, len(w) AS dl FROM f WHERE len(w) > 0),
          |toks AS (SELECT doc_id, unnest(w) AS term FROM f),
          |post AS (SELECT term, doc_id, count(*) AS tf FROM toks
          |         WHERE term IN ('slow', 'merge', 'window') GROUP BY 1, 2),
          |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
          |dfs AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
          |scored AS (
          |  SELECT p.doc_id,
          |         sum(ln(1 + (s.n - f2.df + 0.5) / (f2.df + 0.5)) * p.tf * 2.2 /
          |             (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl))
          |             + CAST(1 AS DOUBLE) *
          |               ln(1 + (s.n - f2.df + 0.5) / (f2.df + 0.5))) AS score,
          |         CAST(sum(p.tf) AS BIGINT) AS tf_total,
          |         CAST(count(*) AS BIGINT) AS n_terms_hit
          |  FROM post p JOIN dfs f2 USING (term) JOIN dl d USING (doc_id)
          |  CROSS JOIN stats s GROUP BY 1)
          |SELECT rank, doc_id, tf_total, n_terms_hit FROM (
          |  SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
          |         doc_id, tf_total, n_terms_hit FROM scored) t
          |WHERE rank <= 10 ORDER BY rank""".stripMargin,
      "q_retrieval_pinned" ->
        """WITH f AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
          |                    x -> len(x) > 0) AS w FROM documents),
          |dl AS (SELECT doc_id, len(w) AS dl FROM f WHERE len(w) > 0),
          |toks AS (SELECT doc_id, unnest(w) AS term FROM f),
          |post AS (SELECT term, doc_id, count(*) AS tf FROM toks
          |         WHERE term IN ('slow', 'merge', 'window') GROUP BY 1, 2),
          |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
          |dfs AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
          |scored AS (
          |  SELECT p.doc_id,
          |         sum(ln(1 + (s.n - f2.df + 0.5) / (f2.df + 0.5)) * p.tf * 2.2 /
          |             (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl))) AS score
          |  FROM post p JOIN dfs f2 USING (term) JOIN dl d USING (doc_id)
          |  CROSS JOIN stats s GROUP BY 1)
          |SELECT rank, doc_id, pinned, matched FROM (
          |  SELECT CAST(p.rnk AS BIGINT) AS rank,
          |         CAST(p.did AS BIGINT) AS doc_id, true AS pinned,
          |         p.did IN (SELECT doc_id FROM scored) AS matched
          |  FROM (VALUES (1, 2), (2, 7)) p(rnk, did)
          |  UNION ALL
          |  SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) + 2
          |              AS BIGINT) AS rank,
          |         doc_id, false AS pinned, true AS matched
          |  FROM scored WHERE doc_id NOT IN (2, 7)) t
          |WHERE rank <= 10 ORDER BY rank""".stripMargin,
      "q_retrieval_synonyms" ->
        """WITH f AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
          |                    x -> len(x) > 0) AS w FROM documents),
          |dl AS (SELECT doc_id, len(w) AS dl FROM f WHERE len(w) > 0),
          |toks AS (SELECT doc_id, unnest(w) AS term FROM f),
          |map AS (SELECT * FROM (VALUES
          |          ('slow', 0), ('fast', 0), ('merge', 1), ('window', 2))
          |        v(term, gid)),
          |post AS (SELECT term, doc_id, count(*) AS tf FROM toks
          |         WHERE term IN (SELECT term FROM map) GROUP BY 1, 2),
          |bygroup AS (SELECT m.gid, p.doc_id, sum(p.tf) AS tf
          |            FROM post p JOIN map m USING (term) GROUP BY 1, 2),
          |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
          |dfs AS (SELECT gid, count(*) AS df FROM bygroup GROUP BY 1),
          |scored AS (
          |  SELECT b.doc_id,
          |         sum(ln(1 + (s.n - f2.df + 0.5) / (f2.df + 0.5)) * b.tf * 2.2 /
          |             (b.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl))) AS score,
          |         CAST(sum(b.tf) AS BIGINT) AS tf_total,
          |         CAST(count(*) AS BIGINT) AS n_terms_hit
          |  FROM bygroup b JOIN dfs f2 USING (gid) JOIN dl d USING (doc_id)
          |  CROSS JOIN stats s GROUP BY 1)
          |SELECT rank, doc_id, tf_total, n_terms_hit FROM (
          |  SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
          |         doc_id, tf_total, n_terms_hit FROM scored) t
          |WHERE rank <= 10 ORDER BY rank""".stripMargin,
      "q_retrieval_explain" ->
        """WITH f AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
          |                    x -> len(x) > 0) AS w FROM documents),
          |dl AS (SELECT doc_id, len(w) AS dl FROM f WHERE len(w) > 0),
          |toks AS (SELECT doc_id, unnest(w) AS term FROM f),
          |post AS (SELECT term, doc_id, count(*) AS tf FROM toks
          |         WHERE term IN ('slow', 'merge', 'window') GROUP BY 1, 2),
          |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
          |dfs AS (SELECT term, count(*) AS df FROM post GROUP BY 1)
          |SELECT p.doc_id, p.term, CAST(p.tf AS BIGINT) AS tf,
          |       CAST(f2.df AS BIGINT) AS df, CAST(d.dl AS BIGINT) AS dl,
          |       CAST(round(ln(1 + (s.n - f2.df + 0.5) / (f2.df + 0.5))
          |            * 10000) AS BIGINT) AS idf_4dp,
          |       CAST(round(ln(1 + (s.n - f2.df + 0.5) / (f2.df + 0.5))
          |            * p.tf * 2.2 /
          |            (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl))
          |            * 10000) AS BIGINT) AS weight_4dp
          |FROM post p JOIN dfs f2 USING (term) JOIN dl d USING (doc_id)
          |CROSS JOIN stats s
          |WHERE p.doc_id IN (3, 6, 9)
          |ORDER BY doc_id, term""".stripMargin,
      "q_eval_rankdiff" ->
        """WITH f AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
          |                    x -> len(x) > 0) AS w FROM documents),
          |dl AS (SELECT doc_id, len(w) AS dl FROM f WHERE len(w) > 0),
          |toks AS (SELECT doc_id, unnest(w) AS term FROM f),
          |post AS (SELECT term, doc_id, count(*) AS tf FROM toks
          |         WHERE term IN ('slow', 'merge', 'window') GROUP BY 1, 2),
          |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
          |dfs AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
          |sa AS (SELECT doc_id,
          |         sum(ln(1 + (s.n - f2.df + 0.5) / (f2.df + 0.5)) * p.tf * 2.2 /
          |             (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl))) AS score
          |       FROM post p JOIN dfs f2 USING (term) JOIN dl d USING (doc_id)
          |       CROSS JOIN stats s GROUP BY 1),
          |sb AS (SELECT doc_id,
          |         sum(ln(1 + (s.n - f2.df + 0.5) / (f2.df + 0.5)) * p.tf * 2.2 /
          |             (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl))
          |             + CAST(1 AS DOUBLE) *
          |               ln(1 + (s.n - f2.df + 0.5) / (f2.df + 0.5))) AS score
          |       FROM post p JOIN dfs f2 USING (term) JOIN dl d USING (doc_id)
          |       CROSS JOIN stats s GROUP BY 1),
          |ra AS (SELECT doc_id, rank FROM (
          |  SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id)
          |                      AS BIGINT) AS rank FROM sa) t WHERE rank <= 10),
          |rb AS (SELECT doc_id, rank FROM (
          |  SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id)
          |                      AS BIGINT) AS rank FROM sb) t WHERE rank <= 10)
          |SELECT coalesce(ra.doc_id, rb.doc_id) AS doc_id,
          |       coalesce(ra.rank, 0) AS rank_a,
          |       coalesce(rb.rank, 0) AS rank_b,
          |       CASE WHEN ra.rank IS NOT NULL AND rb.rank IS NOT NULL
          |            THEN ra.rank - rb.rank ELSE 0 END AS delta
          |FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id
          |ORDER BY doc_id""".stripMargin,
      "q_retrieval_boosted" ->
        """WITH f AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
          |                    x -> len(x) > 0) AS w FROM documents),
          |dl AS (SELECT doc_id, len(w) AS dl FROM f WHERE len(w) > 0),
          |toks AS (SELECT doc_id, unnest(w) AS term FROM f),
          |post AS (SELECT term, doc_id, count(*) AS tf FROM toks
          |         WHERE term IN ('slow', 'merge', 'window') GROUP BY 1, 2),
          |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
          |dfs AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
          |scored AS (
          |  SELECT p.doc_id,
          |         sum(ln(1 + (s.n - f2.df + 0.5) / (f2.df + 0.5)) * p.tf * 2.2 /
          |             (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl)))
          |         + (CAST(5 AS DOUBLE) / 100) *
          |           CAST(min(p.doc_id) % 4 AS DOUBLE) AS score,
          |         CAST(sum(p.tf) AS BIGINT) AS tf_total,
          |         CAST(count(*) AS BIGINT) AS n_terms_hit
          |  FROM post p JOIN dfs f2 USING (term) JOIN dl d USING (doc_id)
          |  CROSS JOIN stats s GROUP BY 1)
          |SELECT rank, doc_id, tf_total, n_terms_hit FROM (
          |  SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
          |         doc_id, tf_total, n_terms_hit FROM scored) t
          |WHERE rank <= 10 ORDER BY rank""".stripMargin,
      "q_graph_labelprop" ->
        """WITH nn AS (SELECT count(*) AS n FROM documents),
          |e0 AS (SELECT doc_id AS src, (doc_id + 1) % nn.n AS dst
          |       FROM documents CROSS JOIN nn),
          |und AS (SELECT DISTINCT a, b FROM (
          |          SELECT src AS a, dst AS b FROM e0
          |          UNION ALL SELECT dst, src FROM e0) t WHERE a <> b),
          |seeds AS (SELECT doc_id AS node, doc_id % 3 AS label
          |          FROM documents WHERE doc_id % 25 = 0),
          |nodes AS (SELECT DISTINCT a AS node FROM und
          |          UNION SELECT node FROM seeds),
          |s0 AS (SELECT n.node, s.label FROM nodes n
          |       LEFT JOIN seeds s USING (node)),
          |v1 AS (SELECT u.a AS node, st.label AS cand, count(*) AS votes
          |       FROM und u JOIN s0 st ON st.node = u.b
          |       WHERE st.label IS NOT NULL GROUP BY 1, 2),
          |p1 AS (SELECT node, cand FROM (
          |         SELECT node, cand, row_number() OVER (PARTITION BY node
          |           ORDER BY votes DESC, cand) AS rn FROM v1) t WHERE rn = 1),
          |s1 AS (SELECT s.node,
          |         CASE WHEN sd.node IS NOT NULL THEN s.label
          |              ELSE coalesce(p.cand, s.label) END AS label
          |       FROM s0 s LEFT JOIN p1 p USING (node)
          |       LEFT JOIN seeds sd ON sd.node = s.node),
          |v2 AS (SELECT u.a AS node, st.label AS cand, count(*) AS votes
          |       FROM und u JOIN s1 st ON st.node = u.b
          |       WHERE st.label IS NOT NULL GROUP BY 1, 2),
          |p2 AS (SELECT node, cand FROM (
          |         SELECT node, cand, row_number() OVER (PARTITION BY node
          |           ORDER BY votes DESC, cand) AS rn FROM v2) t WHERE rn = 1),
          |s2 AS (SELECT s.node,
          |         CASE WHEN sd.node IS NOT NULL THEN s.label
          |              ELSE coalesce(p.cand, s.label) END AS label
          |       FROM s1 s LEFT JOIN p2 p USING (node)
          |       LEFT JOIN seeds sd ON sd.node = s.node),
          |v3 AS (SELECT u.a AS node, st.label AS cand, count(*) AS votes
          |       FROM und u JOIN s2 st ON st.node = u.b
          |       WHERE st.label IS NOT NULL GROUP BY 1, 2),
          |p3 AS (SELECT node, cand FROM (
          |         SELECT node, cand, row_number() OVER (PARTITION BY node
          |           ORDER BY votes DESC, cand) AS rn FROM v3) t WHERE rn = 1),
          |s3 AS (SELECT s.node,
          |         CASE WHEN sd.node IS NOT NULL THEN s.label
          |              ELSE coalesce(p.cand, s.label) END AS label
          |       FROM s2 s LEFT JOIN p3 p USING (node)
          |       LEFT JOIN seeds sd ON sd.node = s.node)
          |SELECT node, label FROM s3 WHERE label IS NOT NULL
          |ORDER BY node""".stripMargin,
      "q_pipeline_federated" ->
        """WITH sub AS (SELECT doc_id, text FROM documents
          |             WHERE doc_id % 10 <> 7),
          |f AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
          |                    x -> len(x) > 0) AS w FROM sub),
          |dl AS (SELECT doc_id, len(w) AS dl FROM f WHERE len(w) > 0),
          |toks AS (SELECT doc_id, unnest(w) AS term FROM f),
          |post AS (SELECT term, doc_id, count(*) AS tf FROM toks
          |         WHERE term IN ('slow', 'merge', 'window') GROUP BY 1, 2),
          |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
          |dfs AS (SELECT term, count(*) AS df FROM post GROUP BY 1),
          |scored AS (
          |  SELECT p.doc_id,
          |         sum(ln(1 + (s.n - f2.df + 0.5) / (f2.df + 0.5)) * p.tf * 2.2 /
          |             (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl))) AS score,
          |         CAST(sum(p.tf) AS BIGINT) AS tf_total,
          |         CAST(count(*) AS BIGINT) AS n_terms_hit
          |  FROM post p JOIN dfs f2 USING (term) JOIN dl d USING (doc_id)
          |  CROSS JOIN stats s GROUP BY 1)
          |SELECT rank, doc_id, tf_total, n_terms_hit FROM (
          |  SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
          |         doc_id, tf_total, n_terms_hit FROM scored) t
          |WHERE rank <= 10 ORDER BY rank""".stripMargin,
      "q_graph_triangles" ->
        """WITH n AS (SELECT count(*) AS n FROM documents),
          |e0 AS (SELECT doc_id AS src, (doc_id + 1) % n.n AS dst
          |       FROM documents CROSS JOIN n
          |       UNION
          |       SELECT doc_id, (doc_id + 2) % n.n
          |       FROM documents CROSS JOIN n WHERE doc_id % 2 = 0),
          |und AS (SELECT DISTINCT least(src, dst) AS a,
          |                        greatest(src, dst) AS b
          |        FROM e0 WHERE src <> dst),
          |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
          |        FROM und e1
          |        JOIN und e2 ON e1.b = e2.a
          |        JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
          |mem AS (SELECT x AS node FROM tri
          |        UNION ALL SELECT y FROM tri
          |        UNION ALL SELECT z FROM tri)
          |SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
          |FROM mem GROUP BY node ORDER BY node""".stripMargin,
      "q_text_collocations" ->
        """WITH f AS (SELECT list_filter(string_split_regex(lower(text), '\s+'),
          |                    x -> len(x) > 0) AS w FROM documents),
          |fa AS (SELECT w FROM f WHERE len(w) > 0),
          |uni AS (SELECT unnest(w) AS term FROM fa),
          |uc AS (SELECT term, count(*) AS c FROM uni GROUP BY 1),
          |tt AS (SELECT sum(c) AS t FROM uc),
          |grid AS (SELECT w, unnest(generate_series(1, len(w) - 1)) AS i
          |         FROM fa),
          |bi AS (SELECT w[i] AS x, w[i + 1] AS y FROM grid),
          |bc AS (SELECT x, y, count(*) AS n FROM bi GROUP BY 1, 2),
          |bt AS (SELECT sum(n) AS b FROM bc)
          |SELECT concat(x, ' ', y) AS bigram, CAST(n AS BIGINT) AS n,
          |       CAST(round(ln((CAST(n AS DOUBLE) / bt.b) /
          |            ((CAST(cx.c AS DOUBLE) / tt.t) *
          |             (CAST(cy.c AS DOUBLE) / tt.t))) * 10000) AS BIGINT)
          |         AS pmi_4dp
          |FROM bc JOIN uc cx ON bc.x = cx.term
          |        JOIN uc cy ON bc.y = cy.term
          |CROSS JOIN bt CROSS JOIN tt
          |WHERE n >= 5 ORDER BY bigram""".stripMargin,
      "q_graph_walks" ->
        """WITH n AS (SELECT count(*) AS n FROM documents),
          |e0 AS (SELECT doc_id AS src, (doc_id * 7 + 3) % n.n AS dst
          |       FROM documents CROSS JOIN n
          |       UNION
          |       SELECT doc_id, (doc_id * 13 + 5) % n.n
          |       FROM documents CROSS JOIN n),
          |nbr AS (SELECT src, dst,
          |          row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS idx,
          |          count(*) OVER (PARTITION BY src) AS deg
          |        FROM e0),
          |w AS (SELECT * FROM (VALUES (0), (1)) v(walk)),
          |s0 AS (SELECT src AS start, CAST(walk AS BIGINT) AS walk,
          |              CAST(0 AS BIGINT) AS step, src AS node
          |       FROM (SELECT src FROM e0 UNION SELECT dst FROM e0)
          |       CROSS JOIN w),
          |s1 AS (SELECT s.start, s.walk, CAST(1 AS BIGINT) AS step,
          |              nb.dst AS node
          |       FROM s0 s JOIN nbr nb ON nb.src = s.node AND nb.idx =
          |         CAST(concat('0x', substr(md5('walk14:'
          |           || CAST(s.start AS VARCHAR) || ':'
          |           || CAST(s.walk AS VARCHAR) || ':1'), 1, 8)) AS BIGINT)
          |         % nb.deg),
          |s2 AS (SELECT s.start, s.walk, CAST(2 AS BIGINT) AS step,
          |              nb.dst AS node
          |       FROM s1 s JOIN nbr nb ON nb.src = s.node AND nb.idx =
          |         CAST(concat('0x', substr(md5('walk14:'
          |           || CAST(s.start AS VARCHAR) || ':'
          |           || CAST(s.walk AS VARCHAR) || ':2'), 1, 8)) AS BIGINT)
          |         % nb.deg),
          |s3 AS (SELECT s.start, s.walk, CAST(3 AS BIGINT) AS step,
          |              nb.dst AS node
          |       FROM s2 s JOIN nbr nb ON nb.src = s.node AND nb.idx =
          |         CAST(concat('0x', substr(md5('walk14:'
          |           || CAST(s.start AS VARCHAR) || ':'
          |           || CAST(s.walk AS VARCHAR) || ':3'), 1, 8)) AS BIGINT)
          |         % nb.deg)
          |SELECT start, walk, step, node FROM (
          |  SELECT * FROM s0 UNION ALL SELECT * FROM s1
          |  UNION ALL SELECT * FROM s2 UNION ALL SELECT * FROM s3) t
          |ORDER BY start, walk, step""".stripMargin,
      "q_vocab_coverage" ->
        """WITH f AS (SELECT doc_id, source,
          |             list_filter(string_split_regex(lower(text), '\s+'),
          |                    x -> len(x) > 0) AS w FROM documents),
          |toks AS (SELECT doc_id, source, unnest(w) AS term FROM f),
          |dict AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks
          |         GROUP BY 1),
          |vocab AS (SELECT term FROM (
          |  SELECT term, row_number() OVER (ORDER BY df DESC, term) AS rk
          |  FROM dict) t WHERE rk <= 300)
          |SELECT source AS "group", CAST(count(*) AS BIGINT) AS n_tokens,
          |       CAST(sum(CASE WHEN term IN (SELECT term FROM vocab)
          |                     THEN 0 ELSE 1 END) AS BIGINT) AS n_oov,
          |       CAST(sum(CASE WHEN term IN (SELECT term FROM vocab)
          |                     THEN 0 ELSE 1 END) AS DOUBLE) / count(*)
          |         AS oov_rate
          |FROM toks GROUP BY source ORDER BY source""".stripMargin,
      "q_dedup_autotune" ->
        """WITH pairs AS (SELECT * FROM (VALUES
          |    (1, 128), (2, 64), (4, 32), (8, 16),
          |    (16, 8), (32, 4), (64, 2), (128, 1)) v(b, r)),
          |targets AS (SELECT * FROM (VALUES (50), (70), (90)) v(pct)),
          |grid AS (SELECT t.pct, p.b, p.r,
          |           pow(CAST(1 AS DOUBLE) / p.b, CAST(1 AS DOUBLE) / p.r)
          |             AS th
          |         FROM pairs p CROSS JOIN targets t),
          |ranked AS (SELECT pct, b, r, th,
          |             row_number() OVER (PARTITION BY pct
          |               ORDER BY abs(th - pct / CAST(100 AS DOUBLE)), b)
          |               AS rk
          |           FROM grid)
          |SELECT CAST(pct AS BIGINT) AS target_pct, CAST(b AS BIGINT) AS bands,
          |       CAST(r AS BIGINT) AS rows_per_band,
          |       CAST(round(th * 10000) AS BIGINT) AS threshold_4dp,
          |       rk = 1 AS chosen
          |FROM ranked ORDER BY target_pct, bands""".stripMargin,
      "q_index_prune" ->
        """WITH f AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
          |                    x -> len(x) > 0) AS w FROM documents),
          |toks AS (SELECT doc_id, unnest(w) AS term FROM f),
          |post AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf FROM toks
          |         WHERE term IN ('slow', 'merge') GROUP BY 1, 2),
          |keep AS (SELECT term, doc_id, tf,
          |           row_number() OVER (PARTITION BY term
          |                              ORDER BY tf DESC, doc_id) AS rk
          |         FROM post)
          |SELECT term, doc_id, tf, true AS stats_kept, true AS probe_full
          |FROM keep WHERE rk <= 20 ORDER BY term, doc_id""".stripMargin)
    val m = base ++ extra
    // snapshot-diff sync lands the index a full rebuild would: the
    // probe ranks exactly like q_bm25 over today's corpus (its oracle,
    // shared verbatim — q_bm25 lives in `extra`, so the alias attaches
    // after the merge)
    m + ("q_index_sync" -> m("q_bm25")) +
      ("q_stream_text_index" -> m("q_bm25")) +
      ("q_index_compact" -> m("q_bm25")) +
      // federated probe merges per-shard postings with exact global
      // stats — equals the monolithic probe, oracle shared verbatim
      ("q_retrieval_sharded" -> m("q_bm25")) +
      // routed appends land each shard exactly what a full-corpus
      // rebuild would — probe == monolithic, oracle shared verbatim
      ("q_sharded_append" -> m("q_bm25")) +
      // streamed fan-out lands the same postings/stats as routed batch
      // appends — probe == monolithic, oracle shared verbatim
      ("q_stream_sharded" -> m("q_bm25")) +
      // merged shard indexes carry the union postings + exact summed
      // stats — probe == full rebuild, oracle shared verbatim
      ("q_index_merge" -> m("q_bm25")) +
      // saved index + fresh tail merge with exact stats (federation
      // math on recency) — equals the full-corpus probe
      ("q_retrieval_nrt" -> m("q_bm25")) +
      // the streamed per-batch match union equals batch percolation
      // (stateless conjunctive matches) — oracle shared verbatim
      ("q_stream_percolate" -> m("q_percolate")) +
      // the persisted fielded probe ranks exactly like one-shot BM25F
      // (saved exact avgdl, manifest N) — oracle shared verbatim
      ("q_bm25f_indexed" -> m("q_bm25f")) +
      // streamed RAG answers over a frozen index equal the one-shot
      // batch composition (stateless micro-batches; crash-replay
      // included) — q_pipeline_rag_batch's full-replay oracle with the
      // Spark-computed boolean renamed
      ("q_stream_rag" ->
        m("q_pipeline_rag_batch").replace("per_query_same", "stream_same")) +
      // the streamed fielded index (crash-replay included) equals the
      // one-shot BM25F over the full corpus — oracle shared verbatim
      ("q_stream_bm25f" -> m("q_bm25f")) +
      // the join-based scorer forms are row-equal to their broadcast
      // twins — oracles shared verbatim (post-merge, the alias rule)
      ("q_keywords_joined" -> m("q_keywords")) +
      ("q_lm_joined" -> m("q_lm_score")) +
      ("q_boilerplate_joined" -> m("q_boilerplate")) +
      ("q_stream_cdc_overlap" -> m("q_dedup_cdc_incremental")) +
      ("q_stream_winnow" -> m("q_dedup_cdc_incremental")) +
      // streamed labeling equals the batch form row-for-row (frozen
      // index) — q_knn_label's full-row oracle, shared verbatim
      ("q_stream_knn_label" -> m("q_knn_label")) +
      // streamed novelty probes equal the batch scores (stateless,
      // frozen reference index) — q_novelty's full-row oracle verbatim
      ("q_stream_novelty" -> m("q_novelty")) +
      // streamed conflict probes equal the incremental form (stateless,
      // frozen digest index) — its id-arithmetic oracle verbatim
      ("q_stream_pref_conflicts" -> m("q_pref_conflicts_incremental")) +
      // the nightly-delta audits equal the full recompute on the grown
      // corpus — q_split_leakage's oracle, shared verbatim
      ("q_split_leakage_incremental" -> m("q_split_leakage")) +
      ("q_split_leakage_state" -> m("q_split_leakage")) +
      ("q_leak_compact" -> m("q_split_leakage"))
  }
}
