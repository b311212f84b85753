package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

/**
 * Curriculum.interleaveStrata: round-robin mixing, difficulty order
 * within stratum, uniqueness, NULL handling.
 */
class CurriculumSpec extends SparkTestBase {
  import spark.implicits._

  test("round-robin across strata, easiest-first within each") {
    val df = Seq(
      ("a", 30, 1L), ("a", 10, 2L), ("a", 20, 3L),
      ("b", 5, 4L), ("b", 50, 5L),
      ("c", 1, 6L)).toDF("src", "diff", "id")
    val out = Curriculum.interleaveStrata(df, "src", "diff", "id")
      .orderBy("ord")
      .select("src", "diff", "ord").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    // strata indexes: a=0, b=1, c=2; S=3
    assert(out.toSeq === Seq(
      ("a", 10, 0L), ("b", 5, 1L), ("c", 1, 2L),
      ("a", 20, 3L), ("b", 50, 4L),
      ("a", 30, 6L)))
  }

  test("ord is unique and deterministic on real documents") {
    val docs = sf("sf0.001", "documents")
    val a = Curriculum.interleaveStrata(docs, "source", "n_chars", "doc_id")
    assert(a.count() === docs.count())
    assert(a.select("ord").distinct().count() === docs.count())
    val first = a.orderBy("ord").select("doc_id").limit(5)
      .collect().map(_.getLong(0)).toSeq
    val again = Curriculum.interleaveStrata(docs, "source", "n_chars", "doc_id")
      .orderBy("ord").select("doc_id").limit(5)
      .collect().map(_.getLong(0)).toSeq
    assert(first === again)
    // the first S rows cover every stratum once
    val s = docs.select("source").distinct().count().toInt
    val firstStrata = a.orderBy("ord").limit(s).select("source")
      .collect().map(_.getString(0)).toSet
    assert(firstStrata.size === s)
  }

  test("NULL stratum forms its own stratum; NULL difficulty sorts first") {
    val df = Seq(
      (Some("a"), Some(2), 1L), (None, Some(1), 2L),
      (Some("a"), None, 3L), (None, Some(9), 4L)
    ).toDF("src", "diff", "id")
    val out = Curriculum.interleaveStrata(df, "src", "diff", "id")
    assert(out.count() === 4)
    assert(out.select("ord").distinct().count() === 4)
    // within stratum a: NULL-diff row (id 3) ranks before id 1
    val aOrd = out.filter(F.col("src") === "a").orderBy("ord")
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(aOrd === Seq(3L, 1L))
  }
}
