package graft.sources

import java.io.{File, FileInputStream, FileOutputStream}
import scala.collection.JavaConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.complex.ListVector
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter}
import org.apache.arrow.vector.types.{DateUnit, FloatingPointPrecision}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Arrow IPC *file*-format source — the reference registers `.arrow` files
  * as tables (`ballista/client/tests/context_checks.rs:1319`, DataFusion
  * `ListingTable` with Arrow format); Spark has no native reader, so this
  * is the survey's "small custom" (§7).
  *
  * Scale shape: schema is read from one footer on the driver; the file
  * list parallelizes across the cluster and each task streams record
  * batches from its files (one allocator per task, closed on completion).
  * The write side mirrors the reference's file-per-partition shuffle
  * writer (`core/src/execution_plans/mod.rs:93-126`): every task streams
  * its own partition to `part-NNNNN.arrow` in bounded record batches.
  * Supported logical types: Int32/Int64, Float32/64, Utf8, Bool, plus
  * the non-primitive core the reference's Arrow surface carries
  * (`context_checks.rs:1319`, datafusion-proto's type matrix):
  * Date32↔DateType, Decimal128↔DecimalType, List↔ArrayType (of any
  * supported element type, recursively).
  */
object ArrowIpcSource {

  private def toSparkType(f: Field): DataType = f.getType match {
    case i: ArrowType.Int if i.getBitWidth == 64 => LongType
    case i: ArrowType.Int if i.getBitWidth == 32 => IntegerType
    case fp: ArrowType.FloatingPoint
        if fp.getPrecision == FloatingPointPrecision.DOUBLE => DoubleType
    case fp: ArrowType.FloatingPoint
        if fp.getPrecision == FloatingPointPrecision.SINGLE => FloatType
    case _: ArrowType.Utf8 => StringType
    case _: ArrowType.Bool => BooleanType
    case d: ArrowType.Date if d.getUnit == DateUnit.DAY => DateType
    case d: ArrowType.Decimal if d.getBitWidth == 128 =>
      DecimalType(d.getPrecision, d.getScale)
    case _: ArrowType.List =>
      val elem = f.getChildren.get(0)
      ArrayType(toSparkType(elem), elem.isNullable)
    case other => throw new UnsupportedOperationException(
      s"arrow type not supported by ArrowIpcSource: $other")
  }

  private def readSchema(file: String): StructType = {
    val alloc = new RootAllocator()
    val in = new FileInputStream(file)
    try {
      val reader = new ArrowFileReader(in.getChannel, alloc)
      val fields = reader.getVectorSchemaRoot.getSchema.getFields.asScala
      StructType(fields.map(f =>
        StructField(f.getName, toSparkType(f), f.isNullable)).toSeq)
    } finally { in.close(); alloc.close() }
  }

  private def cell(v: FieldVector, i: Int): Any =
    if (v.isNull(i)) null
    else v match {
      case x: BigIntVector  => x.get(i)
      case x: IntVector     => x.get(i)
      case x: Float8Vector  => x.get(i)
      case x: Float4Vector  => x.get(i)
      case x: VarCharVector => new String(x.get(i), "UTF-8")
      case x: BitVector     => x.get(i) == 1
      case x: DateDayVector =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(x.get(i).toLong))
      case x: DecimalVector => x.getObject(i) // java.math.BigDecimal
      case x: ListVector =>
        val dv = x.getDataVector.asInstanceOf[FieldVector]
        (x.getElementStartIndex(i) until x.getElementEndIndex(i))
          .map(j => cell(dv, j))
      case other => throw new UnsupportedOperationException(
        s"vector not supported: ${other.getClass.getSimpleName}")
    }

  /** Read one `.arrow` file or a directory of them as a DataFrame. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val f = new File(path)
    val files =
      if (f.isDirectory)
        f.listFiles().filter(_.getName.endsWith(".arrow")).map(_.getPath)
          .sorted.toSeq
      else Seq(path)
    require(files.nonEmpty, s"no .arrow files under $path")
    val schema = readSchema(files.head)

    val rows = spark.sparkContext
      .parallelize(files, math.min(files.size, 32))
      .mapPartitions { paths =>
        paths.flatMap { p =>
          val alloc = new RootAllocator()
          val in = new FileInputStream(p)
          val reader = new ArrowFileReader(in.getChannel, alloc)
          val root = reader.getVectorSchemaRoot
          val out = scala.collection.mutable.ArrayBuffer.empty[Row]
          while (reader.loadNextBatch()) {
            val vs = root.getFieldVectors.asScala
            var i = 0
            while (i < root.getRowCount) {
              out += Row.fromSeq(vs.map(v => cell(v, i)).toSeq)
              i += 1
            }
          }
          reader.close(); in.close(); alloc.close()
          out
        }
      }
    spark.createDataFrame(rows, schema)
  }

  private def toArrowField(name: String, dt: DataType,
                           nullable: Boolean): Field = dt match {
    case ArrayType(et, elemNullable) =>
      // List carries its element type as a child field (Arrow's "item").
      new Field(name, new FieldType(nullable, new ArrowType.List(), null),
        List(toArrowField("item", et, elemNullable)).asJava)
    case scalar =>
      val at: ArrowType = scalar match {
        case LongType    => new ArrowType.Int(64, true)
        case IntegerType => new ArrowType.Int(32, true)
        case DoubleType  => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
        case FloatType   => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
        case StringType  => new ArrowType.Utf8()
        case BooleanType => new ArrowType.Bool()
        case DateType    => new ArrowType.Date(DateUnit.DAY)
        case d: DecimalType => new ArrowType.Decimal(d.precision, d.scale, 128)
        case other => throw new UnsupportedOperationException(s"$other")
      }
      new Field(name, new FieldType(nullable, at, null), null)
  }

  private def arrowFields(sparkSchema: StructType): Seq[Field] =
    sparkSchema.fields.toSeq.map(sf =>
      toArrowField(sf.name, sf.dataType, sf.nullable))

  /** Value-typed setter so list elements route through the same code as
    * top-level cells (the recursion mirrors `cell`'s read side). */
  private def setValue(v: FieldVector, i: Int, value: Any): Unit =
    if (value == null) v match {
      case x: BaseFixedWidthVector    => x.setNull(i)
      case x: BaseVariableWidthVector => x.setNull(i)
      case x: ListVector              => x.setNull(i)
      case other => throw new UnsupportedOperationException(other.toString)
    }
    else (v, value) match {
      case (x: BigIntVector, n: java.lang.Long)     => x.setSafe(i, n)
      case (x: IntVector, n: java.lang.Integer)     => x.setSafe(i, n)
      case (x: Float8Vector, n: java.lang.Double)   => x.setSafe(i, n)
      case (x: Float4Vector, n: java.lang.Float)    => x.setSafe(i, n)
      case (x: VarCharVector, s: String)            => x.setSafe(i, s.getBytes("UTF-8"))
      case (x: BitVector, b: java.lang.Boolean)     => x.setSafe(i, if (b) 1 else 0)
      case (x: DateDayVector, d: java.sql.Date)     =>
        x.setSafe(i, d.toLocalDate.toEpochDay.toInt)
      case (x: DateDayVector, d: java.time.LocalDate) =>
        x.setSafe(i, d.toEpochDay.toInt)
      case (x: DecimalVector, d: java.math.BigDecimal) =>
        x.setSafe(i, d.setScale(x.getScale))
      case (x: ListVector, s: scala.collection.Seq[_]) =>
        val start = x.startNewValue(i)
        val dv = x.getDataVector.asInstanceOf[FieldVector]
        var j = 0
        s.foreach { e => setValue(dv, start + j, e); j += 1 }
        x.endValue(i, j)
      case (other, vl) => throw new UnsupportedOperationException(
        s"${other.getClass.getSimpleName} <- ${vl.getClass.getSimpleName}")
    }

  private def setCell(v: FieldVector, i: Int, r: Row, c: Int): Unit =
    setValue(v, i, r.get(c))

  /** Stream `rows` into one IPC file in bounded record batches — runs
    * inside a task: one allocator per file, O(batchSize) memory, never
    * the whole partition. */
  private def writeFile(schema: StructType, path: String,
                        rows: Iterator[Row], batchSize: Int): Long = {
    val alloc = new RootAllocator()
    val root = VectorSchemaRoot.create(
      new ArrowSchema(arrowFields(schema).toList.asJava), alloc)
    val out = new FileOutputStream(path)
    val w = new ArrowFileWriter(root, null, out.getChannel)
    var n = 0L
    try {
      w.start()
      while (rows.hasNext) {
        root.allocateNew()
        val vs = root.getFieldVectors.asScala
        var i = 0
        while (i < batchSize && rows.hasNext) {
          val r = rows.next()
          var c = 0
          while (c < vs.size) { setCell(vs(c), i, r, c); c += 1 }
          i += 1
        }
        root.setRowCount(i); n += i
        w.writeBatch()
      }
      w.end()
    } finally { w.close(); out.close(); root.close(); alloc.close() }
    n
  }

  /** Distributed writer: one IPC file per partition under `dir` — the
    * Spark-side mirror of the reference's file-per-partition shuffle
    * write (`core/src/execution_plans/mod.rs:93-126`). Each task streams
    * its partition in `batchSize` record batches with its own allocator;
    * nothing is materialized on the driver. Local/shared-FS path
    * semantics, matching the read side. */
  def writeDir(df: DataFrame, dir: String, batchSize: Int = 4096): Unit = {
    val schema = df.schema
    new File(dir).mkdirs()
    df.rdd.mapPartitionsWithIndex { (idx, it) =>
      if (it.hasNext)
        Iterator.single(
          writeFile(schema, f"$dir/part-$idx%05d.arrow", it, batchSize))
      else Iterator.empty
    }.count()
  }

  /** Single-file writer (test/roundtrip surface): funnels through the
    * same task-side batch writer via coalesce(1) — no driver collect. */
  def write(df: DataFrame, path: String): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-arrow-w")
    writeDir(df.coalesce(1), tmp.toString)
    val part = tmp.resolve("part-00000.arrow")
    // An empty DataFrame writes no part file; emit a schema-only file so
    // the roundtrip still carries the schema.
    if (!java.nio.file.Files.exists(part))
      writeFile(df.schema, part.toString, Iterator.empty, 1)
    java.nio.file.Files.move(part, java.nio.file.Paths.get(path),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    java.nio.file.Files.deleteIfExists(tmp)
  }
}
