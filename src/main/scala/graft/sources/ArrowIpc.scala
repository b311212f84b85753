package graft.sources

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.complex.ListVector
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter}
import org.apache.arrow.vector.types.FloatingPointPrecision
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/**
 * Arrow IPC file (Feather v2) source/sink — the zero-copy interchange
 * format between JVM/Python/Rust/C++ data tools. Built on the
 * `arrow-vector` classes Spark itself ships (the same library backing
 * its pandas-UDF exchange), no extra dependency.
 *
 * Supported columns: long/int/double/float/boolean/string/binary and
 * array<long|int|double|float|string> — the training-corpus surface
 * (ids, scores, text, token lists, embeddings). Unsupported types are
 * a loud error at WRITE (the caller owns the schema); at READ a
 * file whose schema disagrees with the requested one yields NULL for
 * the mismatched columns, per the repo NULL discipline.
 *
 * Scale shape: one `.arrow` shard per partition (`repartition(n)`
 * upstream controls shard size/count), rows buffered into record
 * batches of `batchRows` so per-task memory is one batch, not one
 * shard. Arrow IPC files ARE internally chunked but Spark reads each
 * whole file as one split here (parallelism = shard count, the
 * TFRecord contract); the writer's batching keeps re-read memory
 * bounded batch-by-batch.
 */
object ArrowIpc {

  private val DefaultBatchRows = 4096

  // ------------------------------------------------------------ schema

  private def arrowField(f: StructField): Field = {
    def prim(dt: DataType): ArrowType = dt match {
      case LongType => new ArrowType.Int(64, true)
      case IntegerType => new ArrowType.Int(32, true)
      case DoubleType => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
      case FloatType => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
      case BooleanType => ArrowType.Bool.INSTANCE
      case StringType => ArrowType.Utf8.INSTANCE
      case BinaryType => ArrowType.Binary.INSTANCE
      case other => throw new IllegalArgumentException(
        s"ArrowIpc: unsupported type $other for column ${f.name}")
    }
    f.dataType match {
      case ArrayType(et, _) =>
        et match {
          case LongType | IntegerType | DoubleType | FloatType | StringType => ()
          case other => throw new IllegalArgumentException(
            s"ArrowIpc: unsupported array element $other for column ${f.name}")
        }
        new Field(f.name, FieldType.nullable(ArrowType.List.INSTANCE),
          Seq(new Field("item", FieldType.nullable(prim(et)), null)).asJava)
      case dt =>
        new Field(f.name, FieldType.nullable(prim(dt)), null)
    }
  }

  private[sources] def toArrowSchema(schema: StructType): ArrowSchema =
    new ArrowSchema(schema.fields.map(arrowField).toSeq.asJava)

  // ------------------------------------------------------------- write

  private def setScalar(v: FieldVector, i: Int, value: Any): Unit = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    (v, value) match {
      case (x: BigIntVector, a: java.lang.Long) => x.setSafe(i, a.longValue())
      case (x: IntVector, a: java.lang.Integer) => x.setSafe(i, a.intValue())
      case (x: Float8Vector, a: java.lang.Double) => x.setSafe(i, a.doubleValue())
      case (x: Float4Vector, a: java.lang.Float) => x.setSafe(i, a.floatValue())
      case (x: BitVector, a: java.lang.Boolean) =>
        x.setSafe(i, if (a.booleanValue()) 1 else 0)
      case (x: VarCharVector, a: String) => x.setSafe(i, a.getBytes(utf8))
      case (x: VarBinaryVector, a: Array[Byte]) => x.setSafe(i, a)
      case _ => throw new IllegalArgumentException(
        s"ArrowIpc: cannot write ${value.getClass} into ${v.getClass.getSimpleName}")
    }
  }

  private def fillVector(v: FieldVector, rows: Seq[Row], col: Int): Unit = {
    v match {
      case lv: ListVector =>
        val child = lv.getDataVector
        var childAt = 0
        rows.zipWithIndex.foreach { case (row, i) =>
          if (row.isNullAt(col)) lv.setNull(i)
          else {
            val xs = row.getSeq[Any](col)
            lv.startNewValue(i)
            xs.foreach { x =>
              if (x == null) child.setNull(childAt)
              else setScalar(child, childAt, x)
              childAt += 1
            }
            lv.endValue(i, xs.length)
          }
        }
        child.setValueCount(childAt)
      case _ =>
        rows.zipWithIndex.foreach { case (row, i) =>
          if (row.isNullAt(col)) v.setNull(i)
          else setScalar(v, i, row.get(col))
        }
    }
    v.setValueCount(rows.length)
  }

  /**
   * Write `df` as Arrow IPC shards `part-NNNNN.arrow` under `path`.
   * Eager; returns the row count. Task retries overwrite their own
   * shard (idempotent).
   */
  def write(df: DataFrame, path: String, batchRows: Int = DefaultBatchRows): Long = {
    require(batchRows > 0, s"batchRows must be positive, got $batchRows")
    val schema = df.schema
    toArrowSchema(schema) // validate the schema driver-side, fail fast
    val spark = df.sparkSession
    val hconf = spark.sparkContext.broadcast(
      new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
    val base = new org.apache.hadoop.fs.Path(path)
    val fs0 = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs0.mkdirs(base)
    val baseStr = base.toString
    val counts = df.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val file = new org.apache.hadoop.fs.Path(baseStr, f"part-$pid%05d.arrow")
      val fs = file.getFileSystem(hconf.value.conf)
      val out = fs.create(file, true)
      val allocator = new RootAllocator(Long.MaxValue)
      val root = VectorSchemaRoot.create(toArrowSchema(schema), allocator)
      val writer = new ArrowFileWriter(root, null,
        java.nio.channels.Channels.newChannel(out))
      var n = 0L
      try {
        writer.start()
        it.grouped(batchRows).foreach { rows =>
          root.allocateNew()
          schema.fields.indices.foreach { c =>
            fillVector(root.getVector(c), rows, c)
          }
          root.setRowCount(rows.length)
          writer.writeBatch()
          n += rows.length
        }
        writer.end()
      } finally {
        writer.close(); root.close(); allocator.close(); out.close()
      }
      Iterator.single(n)
    }(Encoders.scalaLong)
    counts.collect().sum // one tiny row per partition
  }

  // -------------------------------------------------------------- read

  /** Arrow object → Spark external value for `dt`; NULL on mismatch. */
  private def convert(dt: DataType, v: Any): Any = {
    if (v == null) return null
    (dt, v) match {
      case (LongType, x: java.lang.Long) => x
      case (IntegerType, x: java.lang.Integer) => x
      case (DoubleType, x: java.lang.Double) => x
      case (FloatType, x: java.lang.Float) => x
      case (BooleanType, x: java.lang.Boolean) => x
      case (StringType, x: org.apache.arrow.vector.util.Text) => x.toString
      case (BinaryType, x: Array[Byte]) => x
      case (ArrayType(et, _), xs: java.util.List[_]) =>
        xs.asScala.map(convert(et, _)).toSeq
      case _ => null // schema mismatch -> NULL discipline
    }
  }

  /**
   * Read `.arrow` shards under `path` into `schema`'s columns,
   * matching file columns to requested ones BY NAME; a requested
   * column absent (or type-mismatched) in a file reads as NULL.
   */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.arrow")
      .load(path)
      .select(F.col("content"))
    files.as(Encoders.BINARY).mapPartitions { it =>
      it.flatMap { bin =>
        val allocator = new RootAllocator(Long.MaxValue)
        val reader = new ArrowFileReader(
          new org.apache.arrow.vector.ipc.SeekableReadChannel(
            new org.apache.arrow.vector.util.ByteArrayReadableSeekableByteChannel(bin)),
          allocator)
        val rows = try {
          val root = reader.getVectorSchemaRoot
          val out = scala.collection.mutable.ArrayBuffer.empty[Row]
          while (reader.loadNextBatch()) {
            val vectors = schema.fields.map(f => Option(root.getVector(f.name)))
            var i = 0
            val m = root.getRowCount
            while (i < m) {
              out += Row.fromSeq(schema.fields.toSeq.zip(vectors).map {
                case (f, Some(v)) => convert(f.dataType, v.getObject(i))
                case (_, None) => null
              })
              i += 1
            }
          }
          out.toSeq
        } catch {
          // truncated/corrupt shard: surface the rows before it, never error
          case _: java.io.IOException | _: IllegalArgumentException |
               _: IndexOutOfBoundsException |
               _: org.apache.arrow.vector.ipc.InvalidArrowFileException =>
            Seq.empty[Row]
        } finally {
          reader.close(); allocator.close()
        }
        rows.iterator
      }
    }(Encoders.row(schema))
  }
}
