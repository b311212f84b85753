package graft.sketch

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

class CmsSpec extends SparkTestBase {
  import spark.implicits._

  test("never undercounts and overcount is bounded across distributed merges") {
    // skewed multiset: value v appears v times, v in 1..100 → N = 5050
    val df = spark.range(1, 101)
      .select(F.explode(F.sequence(F.lit(1), F.col("id"))).as("rep"), F.col("id"))
      .select(F.col("id").as("v"))
      .repartition(8)
    val sk = df.agg(cms.cms_agg(F.col("v"), 0.001, 0.99).as("sk"))
    val checked = spark.range(1, 101).crossJoin(sk)
      .select(F.col("id"),
        cms.cms_estimate(F.col("sk"), F.col("id")).as("est"),
        cms.cms_total(F.col("sk")).as("n"))
      .withColumn("exact", F.col("id"))
      .select(
        (F.col("est") >= F.col("exact")).as("ge"),
        (F.col("est") <= F.col("exact") + F.ceil(F.col("n") * 0.001)).as("bounded"))
      .as[(Boolean, Boolean)].collect()
    assert(checked.forall(_._1), "cms must never undercount")
    assert(checked.forall(_._2), "overcount must stay within eps * totalCount")
  }

  test("merge of split corpora equals one sketch over the union") {
    val a = spark.range(0, 500).repartition(4)
      .agg(cms.cms_agg(F.col("id")).as("sk"))
    val b = spark.range(500, 1000).repartition(4)
      .agg(cms.cms_agg(F.col("id")).as("sk"))
    val whole = spark.range(0, 1000).repartition(4)
      .agg(cms.cms_agg(F.col("id")).as("sk"))
    val merged = a.crossJoin(b.withColumnRenamed("sk", "sk2"))
      .select(cms.cms_merge(F.col("sk"), F.col("sk2")).as("sk"))
    // identical geometry + deterministic hashing → byte-identical tables
    val m = merged.as[Array[Byte]].head()
    val w = whole.as[Array[Byte]].head()
    assert(java.util.Arrays.equals(m, w))
  }

  test("works over strings and skips NULLs") {
    val df = Seq(Some("alpha"), Some("alpha"), Some("beta"), None).toDF("s").repartition(2)
    val sk = df.agg(cms.cms_agg(F.col("s")).as("sk"))
    val (ea, eb, n) = Seq("x").toDF("d").crossJoin(sk)
      .select(
        cms.cms_estimate(F.col("sk"), F.lit("alpha")).as("ea"),
        cms.cms_estimate(F.col("sk"), F.lit("beta")).as("eb"),
        cms.cms_total(F.col("sk")).as("n"))
      .as[(Long, Long, Long)].head()
    assert(n === 3L)   // the NULL contributed nothing
    assert(ea >= 2L && eb >= 1L)
  }

  test("NULL discipline: null sketch, null value, garbage bytes") {
    val sk = spark.range(10).agg(cms.cms_agg(F.col("id")).as("sk"))
    val row = sk.select(
      cms.cms_estimate(F.lit(null).cast("binary"), F.lit(1L)).isNull.as("a"),
      cms.cms_estimate(F.col("sk"), F.lit(null).cast("long")).isNull.as("b"),
      cms.cms_estimate(F.lit(Array[Byte](1, 2, 3)), F.lit(1L)).isNull.as("c"),
      cms.cms_total(F.lit(null).cast("binary")).isNull.as("d"),
      cms.cms_merge(F.col("sk"), F.lit(null).cast("binary")).isNull.as("e"))
      .as[(Boolean, Boolean, Boolean, Boolean, Boolean)].head()
    assert(row === ((true, true, true, true, true)))
  }

  test("SQL surface: cms_agg, cms_estimate, cms_total, cms_merge registered") {
    spark.range(100).createOrReplaceTempView("cms_in")
    val out = spark.sql(
      """SELECT cms_estimate(sk, 5L) AS e5, cms_total(sk) AS n,
        |       cms_estimate(cms_merge(sk, sk), 5L) AS e5x2
        |FROM (SELECT cms_agg(id, 0.001, 0.99) AS sk FROM cms_in)""".stripMargin)
      .as[(Long, Long, Long)].head()
    assert(out._1 >= 1L)
    assert(out._2 === 100L)
    assert(out._3 >= 2L)   // self-merge doubles every cell
  }
}
