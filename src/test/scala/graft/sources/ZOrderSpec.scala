package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  test("interleaveBits places dimension d's bit b at position b*ndims+d") {
    val out = Seq((2L, 1L)).toDF("x", "y")
      .select(ZOrder.interleaveBits(Seq(F.col("x"), F.col("y")), 2).as("z"))
      .as[Long].head()
    // x=0b10 -> bit1 at pos 1*2+0=2 (4); y=0b01 -> bit0 at pos 0*2+1=1 (2)
    assert(out === 6L)
  }

  test("z-curve neighbors are close in both dimensions (first 8 cells)") {
    val cells = for (x <- 0L to 1L; y <- 0L to 1L) yield (x, y)
    val z = cells.toDF("x", "y")
      .select(F.col("x"), F.col("y"),
        ZOrder.interleaveBits(Seq(F.col("x"), F.col("y")), 1).as("z"))
      .as[(Long, Long, Long)].collect().sortBy(_._3).map(t => (t._1, t._2))
    assert(z === Array((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L)))
  }

  test("writeZOrdered preserves content and clusters both keys per file") {
    val ev = sf("sf0.001", "events").select("event_id", "user_id", "value")
    val path = java.nio.file.Files.createTempDirectory("zorder").toString + "/t"
    ZOrder.writeZOrdered(ev, Seq("user_id", "value"), path, numFiles = 8)
    val back = spark.read.parquet(path)
    // exact content preservation
    assert(back.count() === ev.count())
    assert(back.agg(F.sum(F.col("event_id"))).as[Long].head() ===
      ev.agg(F.sum(F.col("event_id"))).as[Long].head())
    // locality: each file's min-max span in EACH key dimension must be
    // well under the global span (a random layout would be ~100%)
    val spans = back.groupBy(F.input_file_name())
      .agg((F.max("user_id") - F.min("user_id")).cast("double").as("us"),
           (F.max("value") - F.min("value")).as("vs"))
      .agg(F.avg("us").as("us"), F.avg("vs").as("vs"))
      .as[(Double, Double)].head()
    val global = ev.agg(
        (F.max("user_id") - F.min("user_id")).cast("double"),
        (F.max("value") - F.min("value")))
      .as[(Double, Double)].head()
    assert(spans._1 < global._1 * 0.8, s"user span $spans vs $global")
    assert(spans._2 < global._2 * 0.8, s"value span $spans vs $global")
  }

  test("writeZOrderedScalable clusters like the rank form, no global window") {
    val ev = sf("sf0.001", "events").select("event_id", "user_id", "value")
    val path = java.nio.file.Files.createTempDirectory("zorder_s").toString + "/t"
    ZOrder.writeZOrderedScalable(ev, Seq("user_id", "value"), path, numFiles = 8)
    val back = spark.read.parquet(path)
    assert(back.count() === ev.count())
    assert(back.agg(F.sum(F.col("event_id"))).as[Long].head() ===
      ev.agg(F.sum(F.col("event_id"))).as[Long].head())
    val spans = back.groupBy(F.input_file_name())
      .agg((F.max("user_id") - F.min("user_id")).cast("double").as("us"),
           (F.max("value") - F.min("value")).as("vs"))
      .agg(F.avg("us").as("us"), F.avg("vs").as("vs"))
      .as[(Double, Double)].head()
    val global = ev.agg(
        (F.max("user_id") - F.min("user_id")).cast("double"),
        (F.max("value") - F.min("value")))
      .as[(Double, Double)].head()
    assert(spans._1 < global._1 * 0.8, s"user span $spans vs $global")
    assert(spans._2 < global._2 * 0.8, s"value span $spans vs $global")
  }

  test("writeZOrderedScalable handles NULL keys (bucket 0) and preserves rows") {
    val df = Seq(
      (1L, Some(5.0), Some(1.0)), (2L, None, Some(2.0)),
      (3L, Some(7.0), None), (4L, Some(9.0), Some(3.0)))
      .toDF("id", "a", "b")
    val path = java.nio.file.Files.createTempDirectory("zorder_n").toString + "/t"
    ZOrder.writeZOrderedScalable(df, Seq("a", "b"), path, numFiles = 2, bits = 4)
    val back = spark.read.parquet(path)
    assert(back.count() === 4L)
    assert(back.select(F.sum("id")).as[Long].head() === 10L)
  }
}
