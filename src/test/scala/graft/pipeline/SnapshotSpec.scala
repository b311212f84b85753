package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

class SnapshotSpec extends SparkTestBase {
  import spark.implicits._

  private def row(k: Long, v: Long, tb: Long, payload: String) = (k, v, tb, payload)

  test("latestByKey keeps exactly the max (version, tiebreak) row per key") {
    val df = Seq(
      row(1L, 10L, 1L, "old"), row(1L, 20L, 2L, "new"),
      row(2L, 5L, 1L, "only"),
      row(3L, 7L, 1L, "a"), row(3L, 7L, 2L, "b") // version tie -> tiebreak
    ).toDF("k", "v", "tb", "payload")
    val out = Snapshot.latestByKey(df, F.col("k"), F.col("v"), F.col("tb"))
      .orderBy("k").collect()
    assert(out.map(_.getString(3)).toSeq == Seq("new", "only", "b"))
    assert(out.map(_.getLong(1)).toSeq == Seq(20L, 5L, 7L))
    // schema passes through unchanged
    assert(out.head.schema.fieldNames.toSeq == Seq("k", "v", "tb", "payload"))
  }

  test("latestByKey is a two-phase aggregate (map-side partial), not a window sort") {
    val df = Seq(row(1L, 1L, 1L, "x"), row(1L, 2L, 2L, "y")).toDF("k", "v", "tb", "p")
    val plan = Snapshot.latestByKey(df, F.col("k"), F.col("v"), F.col("tb"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"expected no window operator:\n$plan")
    // partial max_by below the exchange: local duplicates reduce before shuffle
    assert(plan.contains("partial_max_by"), plan)
    assert(plan.contains("Exchange hashpartitioning"), plan)
  }

  test("mergeSnapshot: newer update wins, older update loses, same-version update wins") {
    val base = Seq(
      row(1L, 10L, 1L, "base1"), row(2L, 10L, 2L, "base2"),
      row(3L, 10L, 3L, "base3")).toDF("k", "v", "tb", "payload")
    val updates = Seq(
      row(1L, 20L, 9L, "upd1"),   // newer -> wins
      row(2L, 5L, 9L, "stale2"),  // older -> loses
      row(3L, 10L, 9L, "corr3"),  // same version -> update side wins
      row(4L, 1L, 9L, "new4")     // new key -> inserted
    ).toDF("k", "v", "tb", "payload")
    val out = Snapshot.mergeSnapshot(base, updates,
        F.col("k"), F.col("v"), F.col("tb"))
      .orderBy("k").collect()
    assert(out.map(_.getString(3)).toSeq == Seq("upd1", "base2", "corr3", "new4"))
    assert(out.head.schema.fieldNames.toSeq == Seq("k", "v", "tb", "payload"))
  }

  test("mergeSnapshotWithDeletes drops tombstoned keys and keeps null flags") {
    val base = Seq(
      (1L, 10L, 1L, "keep", false),
      (2L, 10L, 1L, "dead", false),
      (3L, 10L, 1L, "nullflag", false)).toDF("k", "v", "tb", "payload", "del")
    val updates = Seq(
      (2L, 20L, 9L, "tomb", true)).toDF("k", "v", "tb", "payload", "del")
    val out = Snapshot.mergeSnapshotWithDeletes(base, updates,
        F.col("k"), F.col("v"), F.col("tb"), F.col("del"))
      .orderBy("k").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L))
  }

  test("merge is idempotent: re-merging the same delta changes nothing") {
    val base = sf("sf0.001", "orders")
    val delta = base.filter(F.col("o_orderkey") % 5 === 0)
      .withColumn("o_totalprice", F.col("o_totalprice") * 2)
      .withColumn("o_orderdate",
        F.col("o_orderdate") + F.expr("INTERVAL 1000 DAYS"))
    def merge(b: org.apache.spark.sql.DataFrame) =
      Snapshot.mergeSnapshot(b, delta,
        F.col("o_orderkey"), F.col("o_orderdate"), F.col("o_orderkey"))
    val once = merge(base)
    val twice = merge(once)
    assert(once.count() == base.count())
    assert(twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty)
  }

  test("diffSnapshots classifies added/removed/changed/unchanged") {
    import spark.implicits._
    val old = Seq(
      (1L, "a", 10), (2L, "b", 20), (3L, "c", 30), (4L, null.asInstanceOf[String], 40))
      .toDF("k", "txt", "n")
    val nw = Seq(
      (2L, "b", 20),      // unchanged
      (3L, "c2", 30),     // changed (txt)
      (4L, null.asInstanceOf[String], 41), // changed (n; null txt safe)
      (5L, "e", 50))      // added
      .toDF("k", "txt", "n")
    val out = Snapshot.diffSnapshots(old, nw, "k", Seq("txt", "n"))
      .as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "changed", 5L -> "added"))
    // null vs empty string must differ (sentinel, not coalesce-to-"")
    val o2 = Seq((9L, null.asInstanceOf[String])).toDF("k", "txt")
    val n2 = Seq((9L, "")).toDF("k", "txt")
    val d2 = Snapshot.diffSnapshots(o2, n2, "k", Seq("txt"))
      .as[(Long, String)].collect().toMap
    assert(d2 === Map(9L -> "changed"))
  }

  test("diffSnapshots: separator/sentinel characters in values cannot alias") {
    import spark.implicits._
    // adversarial pairs that collide under naive sep-joined hashing:
    // a value containing the separator vs a genuine column split, and
    // a value equal to the NULL sentinel vs an actual NULL
    val sep = "\u0001"; val nul = "\u0000"
    val old = Seq(
      (1L, s"a${sep}b", "c"),
      (2L, nul, "x"),
      (3L, "p", "q"))
      .toDF("k", "c1", "c2")
    val nw = Seq(
      (1L, "a", s"b${sep}c"),
      (2L, null.asInstanceOf[String], "x"),
      (3L, "p", "q"))
      .toDF("k", "c1", "c2")
    val out = Snapshot.diffSnapshots(old, nw, "k", Seq("c1", "c2"))
      .as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "changed", 2L -> "changed", 3L -> "unchanged"))
  }

  test("manifest: order/partitioning-independent, tamper-sensitive, xor-incremental") {
    import spark.implicits._
    val docs = Seq(
      (1L, "s0", "alpha"), (2L, "s0", "beta"), (3L, "s1", "gamma"),
      (4L, "s1", null.asInstanceOf[String]), (5L, "s2", "delta"))
      .toDF("id", "src", "text")
    def man(df: org.apache.spark.sql.DataFrame) =
      Snapshot.manifest(df, Seq("src"), Seq("id", "text"))
        .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    val base = man(docs)
    assert(base.map(_._2) === Seq(2L, 2L, 1L))
    // layout-independent: repartition/shuffle changes nothing
    assert(man(docs.repartition(7).orderBy(F.rand(42))) === base)
    // tamper: one flipped character flips exactly that group's hash
    val tampered = docs.withColumn("text",
      F.when(F.col("id") === 3L, "gamma!").otherwise(F.col("text")))
    val tm = man(tampered)
    assert(tm.filter(_._1 != "s1") === base.filter(_._1 != "s1"))
    assert(tm.find(_._1 == "s1").get._3 !== base.find(_._1 == "s1").get._3)
    // NULL vs the literal sentinel cannot alias
    val lit = docs.withColumn("text",
      F.when(F.col("id") === 4L, "").otherwise(F.col("text")))
    assert(man(lit).find(_._1 == "s1").get._3 !==
      base.find(_._1 == "s1").get._3)
    // incremental: manifest(a ∪ b).hash == hash(a) xor hash(b) per group
    val a = docs.filter(F.col("id") === 1L)
    val b = docs.filter(F.col("id") === 2L)
    val whole = man(docs.filter(F.col("src") === "s0")).head._3
    val folded = man(a).find(_._1 == "s0").get._3 ^
      man(b).find(_._1 == "s0").get._3
    assert(folded === whole)

    // diffManifests classifies group-level drift
    val shrunk = tampered.filter(F.col("src") =!= "s2")
      .unionByName(Seq((9L, "s3", "new")).toDF("id", "src", "text"))
    val d = Snapshot.diffManifests(
      Snapshot.manifest(docs, Seq("src"), Seq("id", "text")),
      Snapshot.manifest(shrunk, Seq("src"), Seq("id", "text")),
      Seq("src")).as[(String, String)].collect().toMap
    assert(d === Map("s0" -> "unchanged", "s1" -> "changed",
      "s2" -> "removed", "s3" -> "added"))

    // scale shape: one exchange, partial aggregation before it
    val real = sf("sf0.001", "documents")
    val plan = Snapshot.manifest(real, Seq("source"), Seq("doc_id", "text"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length === 1, plan)
    assert(plan.contains("partial"), plan)
  }

  test("streamManifest: micro-batched deltas fold to the batch manifest; replay exact") {
    import spark.implicits._
    val docs = sf("sf0.001", "documents").select("doc_id", "source", "text")
    val expect = Snapshot.manifest(docs, Seq("source"), Seq("doc_id", "text"))
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    val path = java.nio.file.Files.createTempDirectory("graft_man_st").toString
    val src = java.nio.file.Files.createTempDirectory("graft_man_src").toString
    docs.repartition(3).write.mode("overwrite").parquet(src)
    val q = Snapshot.streamManifest(
        spark.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", 1).parquet(src),
        path, Seq("source"), Seq("doc_id", "text"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_man_ck").toString)
      .start()
    q.awaitTermination()
    def folded() = Snapshot.loadManifest(spark, path, Seq("source"))
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(folded() === expect)
    // a replayed micro-batch replaces its own delta: the xor does NOT
    // cancel (an appended duplicate would zero the batch's hash out)
    val extra = docs.limit(7)
    Snapshot.appendManifestBatch(spark, path, extra,
      Seq("source"), Seq("doc_id", "text"), batchId = 100L)
    val once = folded()
    Snapshot.appendManifestBatch(spark, path, extra,
      Seq("source"), Seq("doc_id", "text"), batchId = 100L)
    assert(folded() === once)
  }
}
