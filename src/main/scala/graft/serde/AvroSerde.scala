package graft.serde

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema => AvroSchema}
import org.apache.avro.file.{DataFileReader, DataFileWriter, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.avro.util.Utf8
import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.api.java.UDF1
import org.apache.spark.sql.functions.{col, udf}
import org.apache.spark.sql.types._

/** Avro wire-format serde, byte-compatible with the reference's
  * AvroSerializer (kaflow `serializers.py:74-108`):
  *
  *  - default: **schemaless** binary encoding (fastavro
  *    `schemaless_writer/reader` == Avro binary encoding without header);
  *  - `includeSchema=true`: Avro object-container-file framing
  *    (`serializers.py:90-95`);
  *  - `seekOffset=n`: skip an n-byte prefix before decoding — the
  *    reference's escape hatch for schema-registry magic bytes
  *    (`serializers.py:97-99`).
  *
  * Implemented directly on avro-1.12 (this container has no spark-avro
  * module). BOTH directions are native Catalyst expressions
  * ([[graft.functions.expressions.AvroDecode]] /
  * [[graft.functions.expressions.AvroEncode]] — codegen-resident,
  * codec-object reuse, no external-Row conversion); the original UDF
  * codecs remain as [[deserializeUdf]] / [[serializeUdf]], the parity
  * references.
  *
  * Supported Avro types: record (nested), string, int, long, float,
  * double, boolean, bytes, array, map<string,_>, and 2-branch null unions
  * (nullable fields).
  */
final case class AvroSerde(avroSchemaJson: String,
                           includeSchema: Boolean = false,
                           seekOffset: Int = 0) extends Serde {

  @transient private lazy val avroSchema = new AvroSchema.Parser().parse(avroSchemaJson)

  val dataType: DataType = AvroSerde.toSparkType(
    new AvroSchema.Parser().parse(avroSchemaJson))

  private def structType: StructType = dataType.asInstanceOf[StructType]

  /** PRODUCTION decode path: the native Catalyst expression
    * ([[graft.functions.expressions.AvroDecode]]) — stays inside
    * whole-stage codegen, reuses the Avro decoder across records, and
    * skips the external-Row round trip a UDF pays per record. Same
    * null-on-failure DLQ contract; byte-for-byte parity with the UDF
    * reference codec is pinned in AvroSerdeSpec on the reference's own
    * golden fixtures.
    */
  def deserialize(bytes: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.AvroDecode(
      ColumnBridge.expression(bytes), avroSchemaJson, includeSchema, seekOffset))
  }

  /** UDF-backed REFERENCE codec (the original decode path, retained as
    * the parity twin of the native expression — the house pattern:
    * every native kernel keeps its interpreted reference form as a
    * cross-check).
    */
  def deserializeUdf(bytes: Column): Column = {
    val schemaJson = avroSchemaJson
    val incl = includeSchema
    val seek = seekOffset
    val fn = new UDF1[Array[Byte], Row] {
      @transient private lazy val schema = new AvroSchema.Parser().parse(schemaJson)
      @transient private lazy val reader = new GenericDatumReader[GenericRecord](schema)
      override def call(raw: Array[Byte]): Row = {
        if (raw == null) return null
        try {
          val payload = if (seek > 0) raw.drop(seek) else raw
          val rec: GenericRecord =
            if (incl) {
              val r = new DataFileReader[GenericRecord](
                new SeekableByteArrayInput(payload), new GenericDatumReader[GenericRecord]())
              try { if (r.hasNext) r.next() else null } finally r.close()
            } else {
              val dec = DecoderFactory.get().binaryDecoder(payload, null)
              reader.read(null, dec)
            }
          if (rec == null) null else AvroSerde.toRow(rec, schema)
        } catch { case _: Exception => null } // null → DLQ routing upstream
      }
    }
    udf(fn, dataType).apply(bytes)
  }

  /** PRODUCTION encode path: the native Catalyst expression
    * ([[graft.functions.expressions.AvroEncode]]) — codegen-resident,
    * writer/encoder/buffer reuse, no external-Row conversion. Same wire
    * bytes as the UDF reference codec (SerdeSpec pins golden bytes and
    * native==UDF parity).
    */
  def serialize(value: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.AvroEncode(
      ColumnBridge.expression(value), avroSchemaJson, includeSchema))
  }

  /** UDF-backed REFERENCE encoder (the parity twin of the native
    * expression — the house pattern, as [[deserializeUdf]]).
    */
  def serializeUdf(value: Column): Column = {
    val schemaJson = avroSchemaJson
    val incl = includeSchema
    val st = structType
    val fn = new UDF1[Row, Array[Byte]] {
      @transient private lazy val schema = new AvroSchema.Parser().parse(schemaJson)
      @transient private lazy val writer = new GenericDatumWriter[GenericRecord](schema)
      override def call(row: Row): Array[Byte] = {
        if (row == null) return null
        val rec = AvroSerde.toAvro(row, st, schema).asInstanceOf[GenericRecord]
        val out = new ByteArrayOutputStream()
        if (incl) {
          val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
          w.create(schema, out); w.append(rec); w.close()
        } else {
          val enc = EncoderFactory.get().directBinaryEncoder(out, null)
          writer.write(rec, enc)
          enc.flush()
        }
        out.toByteArray
      }
    }
    udf(fn, BinaryType).apply(value)
  }
}

object AvroSerde {

  /** Spark struct type for a declared Avro schema JSON. */
  def sparkTypeOf(avroSchemaJson: String): StructType =
    toSparkType(new AvroSchema.Parser().parse(avroSchemaJson))
      .asInstanceOf[StructType]

  /** All records of an Avro object-container FILE as Rows under the
    * declared READER schema — the file's embedded writer schema is
    * resolved against it (standard Avro schema evolution: renamed-away
    * fields drop, defaulted additions fill). Backs
    * [[graft.sources.Readers.avroContainer]]; the reader closes with
    * the iterator.
    */
  def containerRecords(bytes: Array[Byte], readerSchemaJson: String): Iterator[Row] = {
    val readerSchema = new AvroSchema.Parser().parse(readerSchemaJson)
    val r = new DataFileReader[GenericRecord](
      new SeekableByteArrayInput(bytes),
      new GenericDatumReader[GenericRecord](null, readerSchema))
    // hasNext closes on a fully-drained iterator, but a limit/take in
    // the consuming flatMap terminates early and never reaches it —
    // close on task completion too. The listener holds the reader
    // through an AtomicReference CLEARED on close: a partition that
    // flatMaps thousands of container blobs must not pin every blob's
    // byte array until task end (the listener closure would otherwise
    // keep reader -> input -> bytes reachable after a clean drain).
    // Double-close is a no-op; the driver-side/test path with no
    // TaskContext still closes via the drained-iterator branch.
    val ref = new java.util.concurrent.atomic.AtomicReference(r)
    def closeOnce(): Unit = {
      val h = ref.getAndSet(null)
      if (h != null) h.close()
    }
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))
    new Iterator[Row] {
      override def hasNext: Boolean = {
        val h = ref.get() != null && r.hasNext
        if (!h) closeOnce()
        h
      }
      override def next(): Row = toRow(r.next(), readerSchema)
    }
  }

  /** Avro schema → Spark type (the subset kaflow payloads use). */
  def toSparkType(s: AvroSchema): DataType = s.getType match {
    case AvroSchema.Type.RECORD =>
      StructType(s.getFields.asScala.map { f =>
        val (t, nullable) = unwrapUnion(f.schema())
        StructField(f.name(), toSparkType(t), nullable)
      }.toSeq)
    case AvroSchema.Type.STRING => StringType
    case AvroSchema.Type.INT => IntegerType
    case AvroSchema.Type.LONG => LongType
    case AvroSchema.Type.FLOAT => FloatType
    case AvroSchema.Type.DOUBLE => DoubleType
    case AvroSchema.Type.BOOLEAN => BooleanType
    case AvroSchema.Type.BYTES | AvroSchema.Type.FIXED => BinaryType
    case AvroSchema.Type.ENUM => StringType
    case AvroSchema.Type.ARRAY =>
      val (t, nullable) = unwrapUnion(s.getElementType)
      ArrayType(toSparkType(t), nullable)
    case AvroSchema.Type.MAP =>
      val (t, nullable) = unwrapUnion(s.getValueType)
      MapType(StringType, toSparkType(t), nullable)
    case AvroSchema.Type.UNION =>
      toSparkType(unwrapUnion(s)._1)
    case other => throw new IllegalArgumentException(s"unsupported Avro type: $other")
  }

  private def unwrapUnion(s: AvroSchema): (AvroSchema, Boolean) =
    if (s.getType == AvroSchema.Type.UNION) {
      val branches = s.getTypes.asScala
      val nonNull = branches.filter(_.getType != AvroSchema.Type.NULL)
      require(nonNull.size == 1, s"only null-unions supported, got: $s")
      (nonNull.head, branches.size > nonNull.size)
    } else (s, false)

  /** Avro runtime value → Spark external row value. */
  private[serde] def toRow(rec: GenericRecord, schema: AvroSchema): Row =
    Row.fromSeq(schema.getFields.asScala.map { f =>
      fromAvroValue(rec.get(f.pos()), unwrapUnion(f.schema())._1)
    }.toSeq)

  private def fromAvroValue(v: Any, s: AvroSchema): Any = v match {
    case null => null
    case u: Utf8 => u.toString
    case bb: ByteBuffer =>
      val arr = new Array[Byte](bb.remaining()); bb.duplicate().get(arr); arr
    case r: GenericRecord => toRow(r, s)
    case l: java.util.List[_] =>
      l.asScala.map(x => fromAvroValue(x, unwrapNonNull(s.getElementType))).toSeq
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, x) =>
        k.toString -> fromAvroValue(x, unwrapNonNull(s.getValueType))
      }.toMap
    case e: org.apache.avro.generic.GenericEnumSymbol[_] => e.toString
    case fx: org.apache.avro.generic.GenericFixed => fx.bytes()
    case other => other // int/long/float/double/boolean/String
  }

  private def unwrapNonNull(s: AvroSchema): AvroSchema = unwrapUnion(s)._1

  /** Spark external row value → Avro runtime value. */
  private[serde] def toAvro(v: Any, t: DataType, s: AvroSchema): Any = {
    if (v == null) return null
    val target = unwrapNonNull(s)
    (v, t) match {
      case (row: Row, st: StructType) =>
        val rec = new GenericData.Record(target)
        st.fields.zipWithIndex.foreach { case (f, i) =>
          rec.put(f.name, toAvro(row.get(i), f.dataType, target.getField(f.name).schema()))
        }
        rec
      case (seq: scala.collection.Seq[_], ArrayType(et, _)) =>
        seq.map(x => toAvro(x, et, target.getElementType)).asJava
      case (m: scala.collection.Map[_, _], MapType(_, vt, _)) =>
        m.map { case (k, x) => k.toString -> toAvro(x, vt, target.getValueType) }.asJava
      case (bytes: Array[Byte], BinaryType) => ByteBuffer.wrap(bytes)
      case (other, _) => other
    }
  }
}
