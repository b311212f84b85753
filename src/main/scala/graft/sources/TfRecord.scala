package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

/**
 * TFRecord ingestion and egress — the framed-record container used by
 * training pipelines (TensorFlow's record format, public spec), with
 * a minimal `tf.train.Example` protobuf codec (public wire format).
 * Everything is pure JVM: no protobuf or TensorFlow dependency.
 *
 *  - Framing: each record is `uint64 LE length` + `uint32 LE masked
 *    CRC32C(length bytes)` + payload + `uint32 LE masked
 *    CRC32C(payload)`, mask(c) = ((c >>> 15) | (c << 17)) + 0xa282ead8.
 *    `java.util.zip.CRC32C` supplies the checksum.
 *  - Example: `Features` map of name → BytesList / FloatList /
 *    Int64List, encoded with hand-rolled proto varint/length-delimited
 *    framing; the decoder accepts both packed and unpacked repeated
 *    numeric fields and skips unknown fields by wire type.
 *
 * Scale shape: TFRecord files are NOT splittable — read parallelism
 * is the file count, so the writer emits one shard per partition and
 * callers control shard size with `repartition(n)` upstream. Writes
 * name shards by partition id and overwrite on create, so task
 * retries are idempotent. Malformed input follows the repo NULL
 * discipline: a CRC or length error truncates that file's parse to
 * the records before it; an undecodable Example row is dropped, and a
 * missing/mistyped feature reads as NULL, never an error.
 *
 * Float features are IEEE float32 on the wire (the Example schema's
 * own limit): writing a DoubleType column is lossy — round-trip
 * equality holds after `.cast("float")`.
 */
/** Hadoop `Configuration` is not `java.io.Serializable`; ship it to
  * tasks via its own Writable form (the standard wrapper trick). */
private[sources] final class SerializableHadoopConf(
    @transient private var c: org.apache.hadoop.conf.Configuration)
  extends Serializable {
  def conf: org.apache.hadoop.conf.Configuration = c
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject(); c.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    c = new org.apache.hadoop.conf.Configuration(false)
    c.readFields(in)
  }
}

object TfRecord {

  // ---------------------------------------------------------------- //
  // Framing                                                           //
  // ---------------------------------------------------------------- //

  private val MaskDelta = 0xa282ead8

  /** TFRecord's masked CRC32C of `bytes[from until to)`. */
  private[sources] def maskedCrc(bytes: Array[Byte], from: Int, to: Int): Int = {
    val c = new java.util.zip.CRC32C()
    c.update(bytes, from, to - from)
    val crc = c.getValue.toInt
    ((crc >>> 15) | (crc << 17)) + MaskDelta
  }

  private def putIntLE(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
    out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
  }

  /** Frame one payload as a TFRecord record. */
  def frame(payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(payload.length + 16)
    val len = new Array[Byte](8)
    var v = payload.length.toLong
    var i = 0
    while (i < 8) { len(i) = (v & 0xff).toByte; v >>>= 8; i += 1 }
    out.write(len, 0, 8)
    putIntLE(out, maskedCrc(len, 0, 8))
    out.write(payload, 0, payload.length)
    putIntLE(out, maskedCrc(payload, 0, payload.length))
    out.toByteArray
  }

  private def intLE(b: Array[Byte], at: Int): Int =
    (b(at) & 0xff) | ((b(at + 1) & 0xff) << 8) |
      ((b(at + 2) & 0xff) << 16) | ((b(at + 3) & 0xff) << 24)

  /**
   * Parse a TFRecord file's bytes into payloads. A length or CRC
   * mismatch truncates the parse to the records before it (the
   * [[Warc.parseWarc]] contract) — never an error.
   */
  def readFramed(bin: Array[Byte]): Seq[Array[Byte]] = {
    if (bin == null) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var at = 0
    while (at + 12 <= bin.length) {
      var len = 0L
      var i = 7
      while (i >= 0) { len = (len << 8) | (bin(at + i) & 0xffL); i -= 1 }
      if (intLE(bin, at + 8) != maskedCrc(bin, at, at + 8)) return out.toSeq
      if (len < 0 || len > Int.MaxValue - 16 ||
        at + 12 + len + 4 > bin.length) return out.toSeq
      val n = len.toInt
      if (intLE(bin, at + 12 + n) != maskedCrc(bin, at + 12, at + 12 + n))
        return out.toSeq
      out += java.util.Arrays.copyOfRange(bin, at + 12, at + 12 + n)
      at += 12 + n + 4
    }
    out.toSeq
  }

  // ---------------------------------------------------------------- //
  // tf.train.Example wire codec                                       //
  // ---------------------------------------------------------------- //

  /** One Example feature value (the proto `oneof kind`). */
  sealed trait Feature
  final case class BytesFeature(values: Seq[Array[Byte]]) extends Feature
  final case class FloatFeature(values: Seq[Float]) extends Feature
  final case class Int64Feature(values: Seq[Long]) extends Feature

  private def writeVarint(out: java.io.ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  private def lenDelim(out: java.io.ByteArrayOutputStream, field: Int,
      body: Array[Byte]): Unit = {
    writeVarint(out, (field << 3) | 2)
    writeVarint(out, body.length.toLong)
    out.write(body, 0, body.length)
  }

  private def encodeFeature(f: Feature): Array[Byte] = {
    val list = new java.io.ByteArrayOutputStream()
    val (fieldInFeature, bodyBytes) = f match {
      case BytesFeature(vs) =>
        vs.foreach(b => lenDelim(list, 1, b))
        (1, list.toByteArray)
      case FloatFeature(vs) => // packed: field 1, 4*n LE bytes
        val bb = java.nio.ByteBuffer.allocate(4 * vs.size)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        vs.foreach(bb.putFloat)
        lenDelim(list, 1, bb.array())
        (2, list.toByteArray)
      case Int64Feature(vs) => // packed varints
        val body = new java.io.ByteArrayOutputStream()
        vs.foreach(writeVarint(body, _))
        lenDelim(list, 1, body.toByteArray)
        (3, list.toByteArray)
    }
    val out = new java.io.ByteArrayOutputStream()
    lenDelim(out, fieldInFeature, bodyBytes)
    out.toByteArray
  }

  /** Encode (name, feature) pairs as a serialized `tf.train.Example`. */
  def encodeExample(features: Seq[(String, Feature)]): Array[Byte] = {
    val fm = new java.io.ByteArrayOutputStream()
    features.foreach { case (name, f) =>
      val entry = new java.io.ByteArrayOutputStream()
      lenDelim(entry, 1, name.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      lenDelim(entry, 2, encodeFeature(f))
      lenDelim(fm, 1, entry.toByteArray)
    }
    val out = new java.io.ByteArrayOutputStream()
    lenDelim(out, 1, fm.toByteArray)
    out.toByteArray
  }

  private final class Reader(b: Array[Byte], var at: Int, val end: Int) {
    def hasMore: Boolean = at < end
    def varint(): Long = {
      var shift = 0; var v = 0L
      while (at < end) {
        val x = b(at); at += 1
        v |= (x & 0x7fL) << shift
        if ((x & 0x80) == 0) return v
        shift += 7
        if (shift > 63) throw new IllegalArgumentException("varint overflow")
      }
      throw new IllegalArgumentException("varint EOF")
    }
    def slice(): Reader = {
      val len = varint()
      if (len < 0 || at + len > end) throw new IllegalArgumentException("len")
      val r = new Reader(b, at, at + len.toInt); at += len.toInt; r
    }
    def bytes(): Array[Byte] = {
      val r = slice(); java.util.Arrays.copyOfRange(b, r.at, r.end)
    }
    def fixed32(): Int = {
      if (at + 4 > end) throw new IllegalArgumentException("f32 EOF")
      val v = intLE(b, at); at += 4; v
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint()
      case 1 => if (at + 8 > end) throw new IllegalArgumentException("f64"); at += 8
      case 2 => slice()
      case 5 => if (at + 4 > end) throw new IllegalArgumentException("f32"); at += 4
      case _ => throw new IllegalArgumentException(s"wire type $wireType")
    }
  }

  private def decodeFeature(r: Reader): Feature = {
    var out: Feature = null
    while (r.hasMore) {
      val tag = r.varint()
      val (field, wire) = ((tag >>> 3).toInt, (tag & 7).toInt)
      (field, wire) match {
        case (1, 2) => // BytesList
          val l = r.slice()
          val vs = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
          while (l.hasMore) {
            val t = l.varint()
            if ((t >>> 3).toInt == 1 && (t & 7) == 2) vs += l.bytes()
            else l.skip((t & 7).toInt)
          }
          out = BytesFeature(vs.toSeq)
        case (2, 2) => // FloatList
          val l = r.slice()
          val vs = scala.collection.mutable.ArrayBuffer.empty[Float]
          while (l.hasMore) {
            val t = l.varint()
            ((t >>> 3).toInt, (t & 7).toInt) match {
              case (1, 2) => // packed
                val p = l.slice()
                while (p.hasMore) vs += java.lang.Float.intBitsToFloat(p.fixed32())
              case (1, 5) => vs += java.lang.Float.intBitsToFloat(l.fixed32())
              case (_, w) => l.skip(w)
            }
          }
          out = FloatFeature(vs.toSeq)
        case (3, 2) => // Int64List
          val l = r.slice()
          val vs = scala.collection.mutable.ArrayBuffer.empty[Long]
          while (l.hasMore) {
            val t = l.varint()
            ((t >>> 3).toInt, (t & 7).toInt) match {
              case (1, 2) => // packed
                val p = l.slice()
                while (p.hasMore) vs += p.varint()
              case (1, 0) => vs += l.varint()
              case (_, w) => l.skip(w)
            }
          }
          out = Int64Feature(vs.toSeq)
        case (_, w) => r.skip(w)
      }
    }
    if (out == null) BytesFeature(Seq.empty) else out
  }

  /** Decode a serialized Example → name → feature map; malformed →
    * None (NULL discipline). Later duplicate names win (proto map
    * semantics). */
  def decodeExample(bytes: Array[Byte]): Option[Map[String, Feature]] = {
    if (bytes == null) return None
    try {
      val out = scala.collection.mutable.LinkedHashMap.empty[String, Feature]
      val r = new Reader(bytes, 0, bytes.length)
      while (r.hasMore) {
        val tag = r.varint()
        if ((tag >>> 3).toInt == 1 && (tag & 7) == 2) {
          val feats = r.slice()
          while (feats.hasMore) {
            val ft = feats.varint()
            if ((ft >>> 3).toInt == 1 && (ft & 7) == 2) {
              val entry = feats.slice()
              var key: String = null
              var value: Feature = null
              while (entry.hasMore) {
                val et = entry.varint()
                ((et >>> 3).toInt, (et & 7).toInt) match {
                  case (1, 2) => key = new String(entry.bytes(),
                    java.nio.charset.StandardCharsets.UTF_8)
                  case (2, 2) => value = decodeFeature(entry.slice())
                  case (_, w) => entry.skip(w)
                }
              }
              if (key != null && value != null) out(key) = value
            } else feats.skip((ft & 7).toInt)
          }
        } else r.skip((tag & 7).toInt)
      }
      Some(out.toMap)
    } catch { case _: IllegalArgumentException | _: ArrayIndexOutOfBoundsException => None }
  }

  // ---------------------------------------------------------------- //
  // Spark surface                                                     //
  // ---------------------------------------------------------------- //

  private def rowFeature(dt: DataType, v: Any): Option[Feature] = {
    if (v == null) return None
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    dt match {
      case LongType => Some(Int64Feature(Seq(v.asInstanceOf[Long])))
      case IntegerType => Some(Int64Feature(Seq(v.asInstanceOf[Int].toLong)))
      case BooleanType =>
        Some(Int64Feature(Seq(if (v.asInstanceOf[Boolean]) 1L else 0L)))
      case FloatType => Some(FloatFeature(Seq(v.asInstanceOf[Float])))
      case DoubleType => Some(FloatFeature(Seq(v.asInstanceOf[Double].toFloat)))
      case StringType => Some(BytesFeature(Seq(v.asInstanceOf[String].getBytes(utf8))))
      case BinaryType => Some(BytesFeature(Seq(v.asInstanceOf[Array[Byte]])))
      case ArrayType(et, _) =>
        val xs = v.asInstanceOf[scala.collection.Seq[Any]].filter(_ != null)
        et match {
          case LongType => Some(Int64Feature(xs.map(_.asInstanceOf[Long]).toSeq))
          case IntegerType =>
            Some(Int64Feature(xs.map(_.asInstanceOf[Int].toLong).toSeq))
          case FloatType => Some(FloatFeature(xs.map(_.asInstanceOf[Float]).toSeq))
          case DoubleType =>
            Some(FloatFeature(xs.map(_.asInstanceOf[Double].toFloat).toSeq))
          case StringType =>
            Some(BytesFeature(xs.map(_.asInstanceOf[String].getBytes(utf8)).toSeq))
          case BinaryType =>
            Some(BytesFeature(xs.map(_.asInstanceOf[Array[Byte]]).toSeq))
          case other =>
            throw new IllegalArgumentException(s"unsupported element type $other")
        }
      case other => throw new IllegalArgumentException(s"unsupported type $other")
    }
  }

  /** One DataFrame row → serialized Example (schema-driven). */
  private[sources] def rowToExample(schema: StructType)(row: Row): Array[Byte] =
    encodeExample(schema.fields.toSeq.zipWithIndex.flatMap { case (f, i) =>
      rowFeature(f.dataType, row.get(i)).map(f.name -> _)
    })

  /**
   * Write `df` as TFRecord shards `part-NNNNN.tfrecord` under `path`
   * (one shard per partition — `repartition(n)` upstream sizes
   * shards). Eager; returns the record count. Retries overwrite their
   * own shard, so the job is idempotent; pair with
   * [[Compaction.compact]]-style maintenance windows for concurrent
   * readers.
   */
  def write(df: DataFrame, path: String): Long = {
    val schema = df.schema
    val spark = df.sparkSession
    val hconf = spark.sparkContext.broadcast(
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
    val base = new org.apache.hadoop.fs.Path(path)
    val fs0 = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs0.mkdirs(base)
    val baseStr = base.toString
    val counts = df.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val file = new org.apache.hadoop.fs.Path(baseStr,
        f"part-$pid%05d.tfrecord")
      val fs = file.getFileSystem(hconf.value.conf)
      val out = fs.create(file, true)
      var n = 0L
      try {
        it.foreach { row =>
          val rec = frame(rowToExample(schema)(row))
          out.write(rec, 0, rec.length)
          n += 1
        }
      } finally out.close()
      Iterator.single(n)
    }(Encoders.scalaLong)
    counts.collect().sum // one tiny row per partition
  }

  /**
   * Read TFRecord files under `path` into `schema`'s columns. Scalar
   * fields take the feature's first value, array fields all values;
   * missing or mistyped features are NULL. Parallelism = file count
   * (the format is not splittable).
   */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.tfrecord") // skip checksum/_SUCCESS droppings
      .load(path)
      .select(F.col("content"))
    def field(f: StructField, m: Map[String, Feature]): Any = {
      val utf8 = java.nio.charset.StandardCharsets.UTF_8
      val feat = m.get(f.name).orNull
      (f.dataType, feat) match {
        case (_, null) => null
        case (LongType, Int64Feature(vs)) => vs.headOption.orNull
        case (IntegerType, Int64Feature(vs)) =>
          vs.headOption.map(_.toInt).orNull
        case (BooleanType, Int64Feature(vs)) =>
          vs.headOption.map(_ != 0L).orNull
        case (FloatType, FloatFeature(vs)) => vs.headOption.orNull
        case (DoubleType, FloatFeature(vs)) =>
          vs.headOption.map(_.toDouble).orNull
        case (StringType, BytesFeature(vs)) =>
          vs.headOption.map(new String(_, utf8)).orNull
        case (BinaryType, BytesFeature(vs)) => vs.headOption.orNull
        case (ArrayType(LongType, _), Int64Feature(vs)) => vs
        case (ArrayType(IntegerType, _), Int64Feature(vs)) => vs.map(_.toInt)
        case (ArrayType(FloatType, _), FloatFeature(vs)) => vs
        case (ArrayType(DoubleType, _), FloatFeature(vs)) => vs.map(_.toDouble)
        case (ArrayType(StringType, _), BytesFeature(vs)) =>
          vs.map(new String(_, utf8))
        case (ArrayType(BinaryType, _), BytesFeature(vs)) => vs
        case _ => null // type mismatch -> NULL discipline
      }
    }
    files.as(Encoders.BINARY).mapPartitions { it =>
      it.flatMap { bin =>
        readFramed(bin).iterator.flatMap(decodeExample).map { m =>
          Row.fromSeq(schema.fields.toSeq.map(field(_, m)))
        }
      }
    }(Encoders.row(schema))
  }
}
