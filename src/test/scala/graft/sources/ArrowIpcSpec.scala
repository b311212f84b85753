package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

class ArrowIpcSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(name: String) =
    System.getProperty("java.io.tmpdir") + "/graft_arrow_" + name

  private val fullSchema = new StructType()
    .add("id", LongType).add("rank", IntegerType)
    .add("score", DoubleType).add("w", FloatType)
    .add("ok", BooleanType).add("text", StringType)
    .add("blob", BinaryType)
    .add("toks", ArrayType(LongType))
    .add("emb", ArrayType(FloatType))
    .add("words", ArrayType(StringType))

  test("all supported types round-trip exactly, including NULLs") {
    val rows = Seq(
      (1L, 10, 1.5, 2.5f, true, "hello", Array[Byte](1, 2, 3),
        Seq(1L, 2L, 3L), Seq(0.5f, -1.5f), Seq("a", "b")),
      (2L, 20, -0.25, 0f, false, "wörld 🦆", Array.empty[Byte],
        Seq.empty[Long], Seq(Float.MaxValue), Seq.empty[String])
    ).toDF("id", "rank", "score", "w", "ok", "text", "blob", "toks", "emb", "words")
    val withNulls = rows.unionByName(
      Seq(Tuple1(3L)).toDF("id")
        .select($"id", F.lit(null).cast("int").as("rank"),
          F.lit(null).cast("double").as("score"), F.lit(null).cast("float").as("w"),
          F.lit(null).cast("boolean").as("ok"), F.lit(null).cast("string").as("text"),
          F.lit(null).cast("binary").as("blob"),
          F.lit(null).cast("array<bigint>").as("toks"),
          F.lit(null).cast("array<float>").as("emb"),
          F.lit(null).cast("array<string>").as("words")))
    val path = tmp("rt")
    val n = ArrowIpc.write(withNulls.repartition(2), path)
    assert(n == 3L)
    val back = ArrowIpc.read(spark, path, fullSchema)
    assert(back.count() == 3)
    val a = withNulls.orderBy("id").collect()
    val b = back.orderBy("id").collect()
    a.zip(b).foreach { case (x, y) =>
      (0 until x.length).foreach { i =>
        (x.get(i), y.get(i)) match {
          case (p: Array[Byte], q: Array[Byte]) =>
            assert(java.util.Arrays.equals(p, q), s"col $i of row ${x.get(0)}")
          case (p, q) => assert(p == q, s"col $i of row ${x.get(0)}: $p vs $q")
        }
      }
    }
  }

  test("read matches columns by name: missing column -> NULL, subset projection works") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "text")
    val path = tmp("byname")
    ArrowIpc.write(df, path)
    val wider = new StructType()
      .add("text", StringType).add("id", LongType)
      .add("absent", DoubleType)
    val back = ArrowIpc.read(spark, path, wider).orderBy("id").collect()
    assert(back.map(_.getString(0)).toSeq == Seq("x", "y"))
    assert(back.map(_.getLong(1)).toSeq == Seq(1L, 2L))
    assert(back.forall(_.isNullAt(2)))
  }

  test("multi-batch shards: batchRows smaller than the partition") {
    val df = spark.range(10000).toDF("id")
      .withColumn("text", F.concat(F.lit("t"), $"id".cast("string")))
    val path = tmp("batches")
    val n = ArrowIpc.write(df.repartition(3), path, batchRows = 256)
    assert(n == 10000L)
    val schema = new StructType().add("id", LongType).add("text", StringType)
    val back = ArrowIpc.read(spark, path, schema)
    assert(back.count() == 10000L)
    assert(back.agg(F.sum($"id")).collect().head.getLong(0) == 49995000L)
  }

  test("unsupported type fails fast at write, driver-side") {
    val df = Seq((1L, Map("a" -> 1))).toDF("id", "m")
    val ex = intercept[IllegalArgumentException] {
      ArrowIpc.write(df, tmp("unsup"))
    }
    assert(ex.getMessage.contains("unsupported"))
  }

  test("corrupt shard yields zero rows, not an error") {
    val path = tmp("corrupt")
    val dir = new java.io.File(path)
    dir.mkdirs()
    val f = new java.io.FileOutputStream(new java.io.File(dir, "part-00000.arrow"))
    f.write("this is not an arrow file at all".getBytes)
    f.close()
    val schema = new StructType().add("id", LongType)
    assert(ArrowIpc.read(spark, path, schema).count() == 0L)
  }

  test("documents corpus round-trips through arrow with token lists") {
    val docs = sf("sf0.001", "documents")
      .select($"doc_id", $"text", $"lang",
        F.split($"text", "\\s+").as("toks"))
    val path = tmp("docs")
    val n = ArrowIpc.write(docs.repartition(4), path)
    val schema = new StructType()
      .add("doc_id", LongType).add("text", StringType)
      .add("lang", StringType).add("toks", ArrayType(StringType))
    val back = ArrowIpc.read(spark, path, schema)
    assert(back.count() == n)
    val truth = docs.agg(F.sum($"doc_id"), F.sum(F.size($"toks"))).collect().head
    val got = back.agg(F.sum($"doc_id"), F.sum(F.size($"toks"))).collect().head
    assert(truth == got)
  }
}
