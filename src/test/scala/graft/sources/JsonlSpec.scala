package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types.{LongType, StringType, StructType}

class JsonlSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = new StructType()
    .add("id", LongType).add("text", StringType)

  private def write(lines: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    lines.toDF("value").repartition(2).write.mode("overwrite").text(dir)
    dir
  }

  test("clean lines parse, malformed lines quarantine with their original text") {
    val dir = write(Seq(
      """{"id": 1, "text": "alpha"}""",
      """{"id": 2, "text": "beta"}""",
      """{"id": 3}""",                        // missing field: valid, text null
      """{"id": 4, "text": "gamma"""",       // truncated string
      """not json at all""",
      """{"id": }"""))
    val (good, bad) = Jsonl.readWithQuarantine(spark, dir, schema)
    val rows = good.as[(Long, Option[String])].collect().toMap
    assert(rows == Map(1L -> Some("alpha"), 2L -> Some("beta"), 3L -> None))
    assert(good.columns.toSeq == Seq("id", "text")) // corrupt col dropped
    val q = bad.as[String].collect().toSet
    assert(q.size == 3 && q.exists(_.contains("not json at all")))
  }

  test("all-clean input has an empty quarantine; schema is enforced not inferred") {
    val dir = write(Seq("""{"id": 7, "text": "x", "extra": 1}"""))
    val (good, bad) = Jsonl.readWithQuarantine(spark, dir, schema)
    assert(bad.count() == 0)
    assert(good.columns.toSeq == Seq("id", "text")) // extra field ignored
    assert(good.as[(Long, String)].head() == ((7L, "x")))
  }

  test("round-trip: to_json corpus lines come back equal, one scan feeds both sides") {
    val docs = sf("sf0.001", "documents").select("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_rt").toString
    docs.select(F.to_json(F.struct(F.col("doc_id"), F.col("text"))).as("v"))
      .write.mode("overwrite").text(dir)
    val s2 = new StructType().add("doc_id", LongType).add("text", StringType)
    val (good, bad) = Jsonl.readWithQuarantine(spark, dir, s2)
    assert(bad.count() == 0)
    val a = docs.agg(F.count(F.lit(1)), F.sum("doc_id"),
      F.sum(F.length(F.col("text")))).head()
    val b = good.agg(F.count(F.lit(1)), F.sum("doc_id"),
      F.sum(F.length(F.col("text")))).head()
    assert(a == b)
  }

  test("schema already containing the corrupt column is rejected") {
    intercept[IllegalArgumentException] {
      Jsonl.readWithQuarantine(spark, "/tmp/nope",
        new StructType().add("_corrupt_record", StringType))
    }
  }
}
