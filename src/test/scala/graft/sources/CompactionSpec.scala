package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

class CompactionSpec extends SparkTestBase {
  import spark.implicits._

  test("compact collapses small files to the byte target, preserving content") {
    val df = spark.range(200000).select($"id",
      F.concat(F.lit("payload_"), $"id").as("s"))
    val path = java.nio.file.Files.createTempDirectory("graft_cs").toString + "/t"
    Compaction.writeFragmented(df, path, 50)
    assert(Compaction.partFileCount(spark, path) === 50)
    val bytes = Compaction.pathBytes(spark, path)

    val after = Compaction.compact(spark, path, math.max(1L, bytes / 3))
    assert(after <= 5, s"expected ~3-4 files, got $after")
    assert(Compaction.partFileCount(spark, path) === after)

    val back = spark.read.parquet(path)
    assert(back.count() === 200000L)
    assert(back.agg(F.sum($"id")).as[Long].head() === df.agg(F.sum($"id")).as[Long].head())
    // parquet reads back nullable; names and types must survive
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      df.schema.map(f => (f.name, f.dataType)))
  }

  test("compact to a huge target yields one file; rejects non-positive targets") {
    val df = spark.range(1000).toDF("id")
    val path = java.nio.file.Files.createTempDirectory("graft_cs1").toString + "/t"
    Compaction.writeFragmented(df, path, 8)
    assert(Compaction.compact(spark, path, Long.MaxValue) === 1)
    assert(spark.read.parquet(path).count() === 1000L)
    intercept[IllegalArgumentException] {
      Compaction.compact(spark, path, 0L)
    }
  }
}
