package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry hygiene: the driver contract maps are built from literal
  * `"q_name" ->` pairs, and Scala Maps silently keep the LAST entry on
  * a duplicate key — a name collision makes one query vanish without
  * any error (it happened: two operators both claimed q_kmv_overlap).
  * This spec greps the source: every query name must appear exactly
  * twice (once in `queries`, once in `oracleSql`), and the runtime
  * key sets must agree. */
class RegistryHygieneSpec extends AnyFunSuite {

  test("every query name appears exactly twice in SparkEntry (query + oracle)") {
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/SparkEntry.scala")), "UTF-8")
    val arrow = """\"(q_[a-z0-9_]+)\" ->""".r
    val counts = arrow.findAllMatchIn(src).map(_.group(1)).toSeq
      .groupBy(identity).view.mapValues(_.size).toMap
    val bad = counts.filter(_._2 != 2)
    assert(bad.isEmpty,
      s"names not appearing exactly twice (a 3rd arrow = a silent collision): $bad")
  }

  test("queries and oracleSql cover exactly the same names") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted}")
    assert(q.size >= 250)
  }
}
