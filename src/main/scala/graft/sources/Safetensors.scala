package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.{functions => F}

/**
 * Safetensors sink/source for embedding matrices — the HF-ecosystem
 * single-file tensor interchange (public format: an 8-byte
 * little-endian header length, a JSON header mapping tensor name →
 * dtype/shape/data_offsets, then the raw little-endian tensor bytes).
 *
 * Each output shard is one valid `.safetensors` file holding two
 * tensors: `embeddings` (F32, shape [n, d]) and `ids` (I64, shape
 * [n]), row-aligned — loadable by any safetensors reader.
 *
 * Scale shape mirrors the trainer sinks: the WRITE streams each
 * partition's vector bytes to a temp file while only the ids (8
 * bytes/row) buffer, then assembles header + data + ids with a
 * stream copy — no shard-sized allocation. The READ seeks: one shard
 * per task, header parsed from its declared length, rows streamed
 * via positioned reads with one row resident.
 */
object Safetensors {

  /** bf16 round-to-nearest-even of a float32 bit pattern (the
    * convention every ML stack uses): add half-ulp plus the tie bit,
    * keep the top 16 bits. NaN is special-cased BEFORE the rounding
    * add — the add would carry a NaN mantissa into the exponent
    * (0x7F800001 -> Inf) and patterns >= 0xFFFF8000 would wrap the
    * 32-bit add to +0.0; instead a quiet NaN keeping the sign is
    * emitted, matching the standard fp32->bf16 converters. */
  private[graft] def bf16Bits(f: Float): Int = {
    // raw bits: floatToIntBits canonicalizes every NaN to 0x7FC00000,
    // which would drop the sign the converters below preserve
    val b = java.lang.Float.floatToRawIntBits(f)
    if ((b & 0x7fffffff) > 0x7f800000) ((b >>> 16) | 0x40) & 0xffff
    else ((b + 0x7fff + ((b >>> 16) & 1)) >>> 16) & 0xffff
  }

  /** The float32 a stored bf16 pattern decodes to (low 16 bits zero). */
  private[graft] def bf16ToFloat(bits: Int): Float =
    java.lang.Float.intBitsToFloat((bits & 0xffff) << 16)

  /** NULL rows and vectors not matching the first row's width are
    * skipped (a safetensors tensor is rectangular by definition).
    * `dtype` is `"F32"` (default) or `"BF16"` (2 bytes/element,
    * round-to-nearest-even — the checkpoint-interchange width most
    * embedding dumps actually ship). Returns the number of vectors
    * written. */
  def write(
      df: DataFrame,
      idCol: Column,
      vecCol: Column,
      path: String,
      dtype: String = "F32"): Long = {
    val esize = dtype match {
      case "F32" => 4
      case "BF16" => 2
      case other =>
        throw new IllegalArgumentException(s"unsupported dtype $other")
    }
    val spark = df.sparkSession
    val hconf = spark.sparkContext.broadcast(
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
    val base = new org.apache.hadoop.fs.Path(path)
    val fs0 = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs0.mkdirs(base)
    val baseStr = base.toString
    val counts = df
      .select(idCol.cast("long").as("__id"),
        vecCol.cast("array<float>").as("__v"))
      .filter(F.col("__id").isNotNull && F.col("__v").isNotNull &&
        !F.exists(F.col("__v"), e => e.isNull))
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.single(0L)
        else {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val fs = new org.apache.hadoop.fs.Path(baseStr)
            .getFileSystem(hconf.value.conf)
          val tmpP = new org.apache.hadoop.fs.Path(
            baseStr, f"part-$pid%05d.safetensors.tmp")
          val outP = new org.apache.hadoop.fs.Path(
            baseStr, f"part-$pid%05d.safetensors")
          val ids = new scala.collection.mutable.ArrayBuffer[Long]()
          var d = -1
          // pass 1: stream vector bytes; only ids (8 B/row) buffer
          val o1 = new java.io.BufferedOutputStream(fs.create(tmpP, true), 1 << 16)
          try {
            val row4 = new Array[Byte](4)
            it.foreach { row =>
              val v = row.getSeq[Float](1)
              if (d < 0) d = v.length
              if (v.length == d && d > 0) {
                ids += row.getLong(0)
                v.foreach { f =>
                  if (esize == 4) {
                    val b = java.lang.Float.floatToIntBits(f)
                    row4(0) = b.toByte; row4(1) = (b >>> 8).toByte
                    row4(2) = (b >>> 16).toByte; row4(3) = (b >>> 24).toByte
                    o1.write(row4, 0, 4)
                  } else {
                    val b = bf16Bits(f)
                    row4(0) = b.toByte; row4(1) = (b >>> 8).toByte
                    o1.write(row4, 0, 2)
                  }
                }
              }
            }
          } finally o1.close()
          val n = ids.length
          if (n == 0) { fs.delete(tmpP, false); Iterator.single(0L) }
          else {
            val embBytes = n.toLong * d * esize
            val idBytes = n.toLong * 8L
            val json =
              s"""{"embeddings":{"dtype":"$dtype","shape":[$n,$d],""" +
              s""""data_offsets":[0,$embBytes]},""" +
              s""""ids":{"dtype":"I64","shape":[$n],""" +
              s""""data_offsets":[$embBytes,${embBytes + idBytes}]}}"""
            val pad = (8 - (json.length % 8)) % 8
            val header = (json + " " * pad).getBytes("UTF-8")
            val o2 = new java.io.BufferedOutputStream(fs.create(outP, true), 1 << 16)
            try {
              var hl = header.length.toLong
              (0 until 8).foreach { _ =>
                o2.write((hl & 0xff).toInt); hl >>>= 8
              }
              o2.write(header)
              val in = fs.open(tmpP)
              try {
                val buf = new Array[Byte](1 << 16)
                var r = in.read(buf)
                while (r > 0) { o2.write(buf, 0, r); r = in.read(buf) }
              } finally in.close()
              ids.foreach { id =>
                var x = id
                (0 until 8).foreach { _ => o2.write((x & 0xff).toInt); x >>>= 8 }
              }
            } finally o2.close()
            fs.delete(tmpP, false)
            Iterator.single(n.toLong)
          }
        }
      }(Encoders.scalaLong)
    counts.collect().sum
  }

  /** One tensor's header entry, for [[listTensors]]. */
  final case class TensorInfo(
      name: String, dtype: String, shape: Seq[Long],
      begin: Long, end: Long)

  /** Inspect ANY safetensors file's tensor directory (driver-side:
    * reads only the header, never tensor bytes) — interop check
    * before handing shards to a trainer, and the general-file
    * counterpart of the two-tensor fast read path. */
  def listTensors(spark: SparkSession, file: String): Seq[TensorInfo] = {
    val p = new org.apache.hadoop.fs.Path(file)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try {
      val l8 = new Array[Byte](8)
      in.readFully(0L, l8)
      var hl = 0L
      (7 to 0 by -1).foreach { i => hl = (hl << 8) | (l8(i) & 0xffL) }
      require(hl > 0 && hl <= (100L << 20), s"implausible header size $hl")
      val hb = new Array[Byte](hl.toInt)
      in.readFully(8L, hb)
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = om.readTree(new String(hb, "UTF-8"))
      val out = scala.collection.mutable.ArrayBuffer.empty[TensorInfo]
      val names = root.fieldNames()
      while (names.hasNext) {
        val name = names.next()
        if (name != "__metadata__") {
          val t = root.get(name)
          val shape = (0 until t.get("shape").size())
            .map(i => t.get("shape").get(i).asLong())
          val offs = t.get("data_offsets")
          out += TensorInfo(name, t.get("dtype").asText(), shape,
            offs.get(0).asLong(), offs.get(1).asLong())
        }
      }
      out.sortBy(_.begin).toSeq
    } finally in.close()
  }

  private final case class Header(
      n: Int, d: Int, embOff: Long, idsOff: Long, esize: Int)

  /** Header parse for the two-tensor layout this sink writes, via a
    * real JSON parse (the header is tiny): an externally-produced
    * file may order a tensor's fields arbitrarily — positional
    * scanning would silently pick up the NEXT tensor's fields. */
  private def parseHeader(json: String): Header = {
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    def tensor(name: String, wantDtypes: Set[String]): (Seq[Long], Long, String) = {
      val t = root.get(name)
      require(t != null, s"tensor '$name' missing in safetensors header")
      val dt = if (t.get("dtype") == null) null else t.get("dtype").asText()
      require(dt != null && wantDtypes.contains(dt),
        s"tensor '$name' must be one of $wantDtypes, got $dt")
      val shape = (0 until t.get("shape").size())
        .map(i => t.get("shape").get(i).asLong())
      (shape, t.get("data_offsets").get(0).asLong(), dt)
    }
    val (eShape, eOff, eDt) = tensor("embeddings", Set("F32", "BF16"))
    val (iShape, iOff, _) = tensor("ids", Set("I64"))
    require(eShape.length == 2 && iShape.length == 1 &&
      eShape.head == iShape.head,
      s"expected embeddings [n,d] + ids [n], got $eShape / $iShape")
    Header(eShape.head.toInt, eShape(1).toInt, eOff, iOff,
      if (eDt == "F32") 4 else 2)
  }

  /** Read shards written by [[write]] back as (shard, id, embedding).
    * Parallelism = shard count; seek-based, one row resident. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val hconf = spark.sparkContext.broadcast(
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
    val base = new org.apache.hadoop.fs.Path(path)
    val fs0 = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val shards = fs0
      .globStatus(new org.apache.hadoop.fs.Path(base, "*.safetensors"))
      .map(_.getPath.toString).sorted.toSeq
    val session = spark
    import session.implicits._
    spark.createDataset(shards)
      .repartition(math.max(1, shards.length))
      .flatMap { shard =>
        val p = new org.apache.hadoop.fs.Path(shard)
        val fs = p.getFileSystem(hconf.value.conf)
        val in = fs.open(p)
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit](_ => in.close())
        val l8 = new Array[Byte](8)
        in.readFully(0L, l8)
        var hl = 0L
        (7 to 0 by -1).foreach { i => hl = (hl << 8) | (l8(i) & 0xffL) }
        require(hl > 0 && hl <= (100L << 20), s"implausible header size $hl")
        val hb = new Array[Byte](hl.toInt)
        in.readFully(8L, hb)
        val h = parseHeader(new String(hb, "UTF-8"))
        val dataStart = 8L + hl
        val idsBytes = new Array[Byte](h.n * 8)
        in.readFully(dataStart + h.idsOff, idsBytes)
        new Iterator[(String, Long, Array[Float])] {
          private var i = 0
          private val rowBuf = new Array[Byte](h.d * h.esize)
          def hasNext: Boolean = {
            val more = i < h.n
            if (!more && tc == null) in.close()
            more
          }
          def next(): (String, Long, Array[Float]) = {
            in.readFully(dataStart + h.embOff + i.toLong * h.d * h.esize, rowBuf)
            val vec = Array.tabulate(h.d) { j =>
              val o = j * h.esize
              if (h.esize == 4)
                java.lang.Float.intBitsToFloat(
                  (rowBuf(o) & 0xff) | ((rowBuf(o + 1) & 0xff) << 8) |
                  ((rowBuf(o + 2) & 0xff) << 16) | ((rowBuf(o + 3) & 0xff) << 24))
              else
                bf16ToFloat((rowBuf(o) & 0xff) | ((rowBuf(o + 1) & 0xff) << 8))
            }
            var id = 0L
            val io = i * 8
            (7 to 0 by -1).foreach { k => id = (id << 8) | (idsBytes(io + k) & 0xffL) }
            val out = (shard, id, vec)
            i += 1
            out
          }
        }
      }
      .toDF("shard", "id", "embedding")
  }
}
