package graft

import org.apache.spark.sql.{GraftTestBridge, SparkSession}

class GraftExtensionsSpec extends SparkTestBase {

  test("GraftExtensions injection provides the full SQL surface with no register call") {
    val base = spark   // materialize the shared session/context first
    // spark.sql.extensions is a static conf — it cannot change on the
    // suite's live context, so build the extensions-loaded session the
    // way getOrCreate would at cold start
    val s2 = GraftTestBridge.sessionWithExtensions(
      base.sparkContext, new GraftExtensions()(_))
    val prevActive = SparkSession.getActiveSession
    SparkSession.setActiveSession(s2)
    try {
      assert(s2 ne base)

      // expression-builder functions (native aggregates + scalars)
      val r1 = s2.sql(
        """SELECT ddsketch_count(sk) AS n, ddsketch_quantile(sk, 0.5) AS p50
          |FROM (SELECT ddsketch_agg_values(CAST(id AS DOUBLE)) AS sk
          |      FROM range(1000))""".stripMargin).head()
      assert(r1.getLong(0) === 1000L)
      assert(math.abs(r1.getDouble(1) - 499.0) / 499.0 < 0.03)

      // UDF-backed functions injected through udfExpression
      val r2 = s2.sql(
        """SELECT ddsketch_stats(sk).count AS n, kmv_distinct(kv) AS d
          |FROM (SELECT ddsketch_agg_values(CAST(id AS DOUBLE)) AS sk,
          |             kmv_agg(id) AS kv
          |      FROM range(500))""".stripMargin).head()
      assert(r2.getLong(0) === 500L)
      assert(math.abs(r2.getDouble(1) - 500.0) / 500.0 < 0.05)

      // weighted + vector aggregates from the shared builder list
      val r3 = s2.sql(
        """SELECT ddsketch_count(ddsketch_agg_weighted(CAST(id AS DOUBLE), 2)) AS n,
          |       vec_sum(array(CAST(id AS DOUBLE)))[0] AS s
          |FROM range(10)""".stripMargin).head()
      assert(r3.getLong(0) === 20L)
      assert(r3.getDouble(1) === 45.0)

      // the table function surface: ddsketch_create in a FROM clause,
      // the reference's own shape (1-row table function)
      val r4 = s2.sql(
        """SELECT ddsketch_count(ddsketch_add(sketch, 7.5)) AS n,
          |       octet_length(sketch) AS len
          |FROM ddsketch_create(0.02)""".stripMargin).head()
      assert(r4.getLong(0) === 1L)
      assert(r4.getInt(1) > 0)
      // no-arg form uses the default accuracy and emits exactly one row
      assert(s2.sql("SELECT * FROM ddsketch_create()").count() === 1L)

      // the fusion rule must be injected too: a 3-quantile projection
      // over one sketch collapses to a single multi-quantile call
      val before = graft.sketch.functions.multiQuantileInvocations.get()
      s2.sql(
        """SELECT ddsketch_quantile(sk, 0.5), ddsketch_quantile(sk, 0.9),
          |       ddsketch_quantile(sk, 0.99)
          |FROM (SELECT ddsketch_agg_values(CAST(id AS DOUBLE)) AS sk
          |      FROM range(100))""".stripMargin).collect()
      assert(graft.sketch.functions.multiQuantileInvocations.get() > before)
    } finally {
      prevActive match {
        case Some(s) => SparkSession.setActiveSession(s)
        case None => SparkSession.clearActiveSession()
      }
    }
  }
}
