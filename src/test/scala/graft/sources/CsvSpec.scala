package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.types.{LongType, StringType, StructType}

class CsvSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = new StructType()
    .add("id", LongType).add("name", StringType).add("score", LongType)

  private def write(lines: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    lines.toDF("value").repartition(2).write.mode("overwrite").text(dir)
    dir
  }

  test("typed rows parse; type-cast failures quarantine with the raw line") {
    val dir = write(Seq(
      "1,alpha,10",
      "2,beta,20",
      "3,gamma,",          // missing trailing value: NULL, not corrupt
      "4,delta,notanum",   // type failure: corrupt
      "x,epsilon,50"))     // type failure in id: corrupt
    val (good, bad) = Csv.readWithQuarantine(spark, dir, schema)
    val rows = good.as[(Long, String, Option[Long])].collect().toSet
    assert(rows == Set((1L, "alpha", Some(10L)), (2L, "beta", Some(20L)),
      (3L, "gamma", None)))
    val q = bad.as[String].collect().toSet
    assert(q == Set("4,delta,notanum", "x,epsilon,50"))
  }

  test("delimiter and quoting honored; clean file has empty quarantine") {
    val dir = write(Seq("7|\"has, comma\"|70"))
    val (good, bad) = Csv.readWithQuarantine(spark, dir, schema, delimiter = "|")
    assert(bad.count() == 0)
    assert(good.as[(Long, String, Long)].head() == ((7L, "has, comma", 70L)))
  }
}
