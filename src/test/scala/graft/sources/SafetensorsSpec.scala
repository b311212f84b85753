package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}

class SafetensorsSpec extends SparkTestBase {
  import spark.implicits._

  test("round-trips the embeddings table exactly (multiset of id → vector)") {
    val emb = sf("sf0.001", "embeddings").filter(F.col("embedding").isNotNull)
    val dir = java.nio.file.Files.createTempDirectory("graft_st").toString + "/t"
    val n = Safetensors.write(
      emb.repartition(4), F.col("vec_id"), F.col("embedding"), dir)
    assert(n === emb.count())
    val back = Safetensors.read(spark, dir)
    assert(back.count() === n)
    val joined = back.join(
        emb.select(F.col("vec_id").as("id"), F.col("embedding").as("orig")), "id")
      .select((F.col("embedding") === F.col("orig")).as("eq"))
      .as[Boolean].collect()
    assert(joined.length.toLong === n && joined.forall(identity))
  }

  test("the on-disk layout is the public safetensors format") {
    val df = Seq((7L, Array(1.0f, -2.5f)), (9L, Array(0.5f, 4.0f)))
      .toDF("id", "v").coalesce(1)
    val dir = java.nio.file.Files.createTempDirectory("graft_st2").toString + "/t"
    Safetensors.write(df, F.col("id"), F.col("v"), dir)
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".safetensors")).head
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val hl = bb.getLong(0)
    val json = new String(bytes, 8, hl.toInt, "UTF-8")
    // header: u64 LE length, then JSON with dtype/shape/data_offsets
    assert(json.trim.startsWith("{") && json.trim.endsWith("}"))
    assert(json.contains(""""dtype":"F32"""") && json.contains(""""shape":[2,2]"""))
    assert(json.contains(""""dtype":"I64"""") && json.contains(""""shape":[2]"""))
    assert((8 + hl) % 8 === 0)   // spec-recommended alignment padding
    // first payload float is 1.0f little-endian at the declared offset
    assert(bb.getInt((8 + hl).toInt) === java.lang.Float.floatToIntBits(1.0f))
    // ids tensor follows the 16 embedding bytes: first id is 7
    assert(bb.getLong((8 + hl + 16).toInt) === 7L)
    assert(bytes.length.toLong === 8 + hl + 16 + 16)
  }

  test("listTensors reads any file's tensor directory from the header alone") {
    val df = Seq((1L, Array(1.0f, 2.0f, 3.0f))).toDF("id", "v").coalesce(1)
    val dir = java.nio.file.Files.createTempDirectory("graft_st4").toString + "/t"
    Safetensors.write(df, F.col("id"), F.col("v"), dir)
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".safetensors")).head.toString
    val ts = Safetensors.listTensors(spark, f)
    assert(ts.map(t => (t.name, t.dtype, t.shape)) === Seq(
      ("embeddings", "F32", Seq(1L, 3L)), ("ids", "I64", Seq(1L))))
    assert(ts.head.end === 12L && ts(1).begin === 12L && ts(1).end === 20L)
  }

  test("externally-produced headers parse regardless of JSON field order") {
    // JSON object key order is unspecified: a writer may emit
    // data_offsets before shape, or interleave tensors — a positional
    // scan would silently read the NEXT tensor's fields
    val dir = java.nio.file.Files.createTempDirectory("graft_st5").toString + "/t"
    new java.io.File(dir).mkdirs()
    val json =
      """{"ids":{"data_offsets":[16,32],"shape":[2],"dtype":"I64"},""" +
      """"embeddings":{"data_offsets":[0,16],"dtype":"F32","shape":[2,2]}}"""
    val pad = (8 - (json.length % 8)) % 8
    val header = (json + " " * pad).getBytes("UTF-8")
    val out = new java.io.DataOutputStream(new java.io.FileOutputStream(
      dir + "/ext.safetensors"))
    var hl = header.length.toLong
    (0 until 8).foreach { _ => out.write((hl & 0xff).toInt); hl >>>= 8 }
    out.write(header)
    val bb = java.nio.ByteBuffer.allocate(32)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putFloat(1.5f).putFloat(-2.0f).putFloat(3.0f).putFloat(4.5f)
    bb.putLong(11L).putLong(22L)
    out.write(bb.array())
    out.close()
    val back = Safetensors.read(spark, dir)
      .select("id", "embedding").as[(Long, Array[Float])].collect()
      .sortBy(_._1)
    assert(back.map(_._1).toSeq === Seq(11L, 22L))
    assert(back(0)._2.toSeq === Seq(1.5f, -2.0f))
    assert(back(1)._2.toSeq === Seq(3.0f, 4.5f))
  }

  test("NULL and ragged vectors are skipped, ids stay aligned") {
    val df = Seq(
      (1L, Some(Array(1.0f, 2.0f))),
      (2L, None),                       // NULL vector
      (3L, Some(Array(9.0f))),          // ragged → skipped
      (4L, Some(Array(3.0f, 4.0f))))
      .toDF("id", "v").coalesce(1)
    val dir = java.nio.file.Files.createTempDirectory("graft_st3").toString + "/t"
    assert(Safetensors.write(df, F.col("id"), F.col("v"), dir) === 2L)
    val back = Safetensors.read(spark, dir)
      .select("id", "embedding").as[(Long, Array[Float])].collect().toMap
    assert(back.keySet === Set(1L, 4L))
    assert(back(4L).toSeq === Seq(3.0f, 4.0f))
  }

  test("BF16: read equals round-to-nearest-even reference exactly; layout declares BF16") {
    import spark.implicits._
    val rows = Seq(
      (1L, Array(1.0f, -2.5f, 3.1415927f, 1e-8f)),
      (2L, Array(0.0f, -0.0f, 65504.0f, 0.100097656f)) // 0.100097656 = a bf16 tie case
    ).toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft_st_bf16").toString
    val n = Safetensors.write(rows, F.col("vec_id"), F.col("embedding"), dir,
      dtype = "BF16")
    assert(n == 2L)
    val got = Safetensors.read(spark, dir)
      .select("id", "embedding").as[(Long, Array[Float])].collect().toMap
    val expect = rows.as[(Long, Array[Float])].collect().toMap
      .map { case (k, v) =>
        k -> v.map(f => Safetensors.bf16ToFloat(Safetensors.bf16Bits(f))) }
    expect.foreach { case (k, v) =>
      assert(got(k).toSeq == v.toSeq, s"id $k")
      // every stored float has zero low mantissa bits
      got(k).foreach(f =>
        assert((java.lang.Float.floatToIntBits(f) & 0xffff) == 0))
    }
    val shard = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".safetensors")).head.toString
    val ts = Safetensors.listTensors(spark, shard)
    assert(ts.exists(t => t.name == "embeddings" && t.dtype == "BF16"))
    // bf16 file is smaller than an f32 one of the same rows
    val f32dir = java.nio.file.Files.createTempDirectory("graft_st_f32").toString
    Safetensors.write(rows, F.col("vec_id"), F.col("embedding"), f32dir)
    val bfBytes = new java.io.File(shard).length()
    val f32Bytes = new java.io.File(f32dir).listFiles()
      .filter(_.getName.endsWith(".safetensors")).map(_.length()).max
    assert(bfBytes < f32Bytes)
  }

  test("BF16: NaN stays NaN through rounding (no Inf carry, no wrap to zero)") {
    // the rounding add alone would carry 0x7F800001 -> 0x7F80 (Inf)
    // and wrap negative-NaN patterns >= 0xFFFF8000 past 2^32 to +0.0
    val nanPatterns = Seq(
      0x7F800001,          // signaling NaN, minimal mantissa (the Inf-carry case)
      0x7FC00000,          // canonical quiet NaN
      0xFFFF8000,          // negative NaN at the 32-bit wrap boundary
      0xFFFFFFFF)          // all-ones negative NaN
    nanPatterns.foreach { p =>
      val bits = Safetensors.bf16Bits(java.lang.Float.intBitsToFloat(p))
      val back = Safetensors.bf16ToFloat(bits)
      // the ONLY contract is NaN -> NaN (sign/payload fidelity depends
      // on the JVM preserving raw NaN bits through a float pass, which
      // the JLS does not guarantee)
      assert(back.isNaN, f"pattern 0x$p%08X became $back (bf16 0x$bits%04X)")
    }
    // Inf itself still passes through as Inf, not NaN
    assert(Safetensors.bf16ToFloat(
      Safetensors.bf16Bits(Float.PositiveInfinity)).isPosInfinity)
    assert(Safetensors.bf16ToFloat(
      Safetensors.bf16Bits(Float.NegativeInfinity)).isNegInfinity)
  }
}
