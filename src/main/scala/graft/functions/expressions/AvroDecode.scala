package graft.functions.expressions

import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema => AvroSchema}
import org.apache.avro.file.{DataFileReader, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.io.DecoderFactory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Executor-side Avro wire decoder producing Catalyst INTERNAL rows —
  * the engine half of [[AvroDecode]]. Versus the UDF codec
  * ([[graft.serde.AvroSerde.deserializeUdf]], kept as the parity
  * reference) this skips the external-Row materialization + catalyst
  * re-conversion per record and REUSES the Avro binary decoder and
  * datum across records (the two dominant allocation sources on a hot
  * Kafka ingest path). Decode failures return null — the DLQ routing
  * contract, identical to the UDF codec.
  *
  * Supported Avro types mirror `AvroSerde.toSparkType` exactly: record
  * (nested), string, int, long, float, double, boolean, bytes/fixed,
  * enum (as string), array, map<string,_>, 2-branch null unions.
  */
final class AvroWireDecoder(schemaJson: String, includeSchema: Boolean,
                            seekOffset: Int) extends Serializable {

  @transient private lazy val schema = new AvroSchema.Parser().parse(schemaJson)
  @transient private lazy val reader = new GenericDatumReader[GenericRecord](schema)
  // per-task reuse: binaryDecoder re-inits over the new payload, the
  // datum recycles its field containers (safe — conversion to internal
  // values below copies everything out before the next decode)
  @transient private var reuseDecoder: org.apache.avro.io.BinaryDecoder = _
  @transient private var reuseRecord: GenericRecord = _

  def decode(raw: Array[Byte]): InternalRow = {
    if (raw == null) return null
    try {
      val payload =
        if (seekOffset > 0) {
          if (seekOffset >= raw.length) return null
          java.util.Arrays.copyOfRange(raw, seekOffset, raw.length)
        } else raw
      val rec: GenericRecord =
        if (includeSchema) {
          val r = new DataFileReader[GenericRecord](
            new SeekableByteArrayInput(payload),
            new GenericDatumReader[GenericRecord](null, schema))
          try { if (r.hasNext) r.next() else null } finally r.close()
        } else {
          reuseDecoder = DecoderFactory.get().binaryDecoder(payload, reuseDecoder)
          reuseRecord = reader.read(reuseRecord, reuseDecoder)
          reuseRecord
        }
      if (rec == null) null else toInternal(rec, schema)
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  private def unwrap(s: AvroSchema): AvroSchema =
    if (s.getType == AvroSchema.Type.UNION)
      s.getTypes.asScala.find(_.getType != AvroSchema.Type.NULL).getOrElse(s)
    else s

  private def toInternal(rec: GenericRecord, s: AvroSchema): InternalRow = {
    val fields = s.getFields
    val out = new Array[Any](fields.size())
    var i = 0
    while (i < fields.size()) {
      out(i) = fromAvro(rec.get(i), unwrap(fields.get(i).schema()))
      i += 1
    }
    new GenericInternalRow(out)
  }

  private def fromAvro(v: Any, s: AvroSchema): Any = v match {
    case null => null
    case r: GenericRecord => toInternal(r, s)
    case cs: CharSequence => UTF8String.fromString(cs.toString)
    case e: org.apache.avro.generic.GenericEnumSymbol[_] =>
      UTF8String.fromString(e.toString)
    case bb: ByteBuffer =>
      val arr = new Array[Byte](bb.remaining()); bb.duplicate().get(arr); arr
    case fx: org.apache.avro.generic.GenericFixed => fx.bytes().clone()
    case l: java.util.List[_] =>
      val et = unwrap(s.getElementType)
      val arr = new Array[Any](l.size())
      var i = 0
      while (i < l.size()) { arr(i) = fromAvro(l.get(i), et); i += 1 }
      new GenericArrayData(arr)
    case m: java.util.Map[_, _] =>
      val vt = unwrap(s.getValueType)
      val n = m.size()
      val keys = new Array[Any](n)
      val vals = new Array[Any](n)
      var i = 0
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        keys(i) = UTF8String.fromString(e.getKey.toString)
        vals(i) = fromAvro(e.getValue, vt)
        i += 1
      }
      ArrayBasedMapData(keys, vals)
    case other => other // int/long/float/double/boolean
  }
}

/** `avro_decode(binary)` — schemaless Avro wire format (fastavro
  * `schemaless_reader` compatible, the reference's default mode —
  * kaflow `serializers.py:74-108`) decoded to a typed struct as a
  * native Catalyst expression: the hot Kafka ingest path stays inside
  * whole-stage codegen with zero per-record UDF dispatch or external
  * Row conversion. `includeSchema` switches to Avro object-container
  * framing; `seekOffset` skips a schema-registry magic-byte prefix —
  * both exactly as the UDF codec (which remains the golden-bytes
  * parity reference in AvroSerdeSpec). Undecodable payloads yield
  * NULL (DLQ routing upstream).
  */
case class AvroDecode(child: Expression, schemaJson: String,
                      includeSchema: Boolean = false,
                      seekOffset: Int = 0) extends UnaryExpression {

  @transient private lazy val sparkType: DataType =
    graft.serde.AvroSerde.sparkTypeOf(schemaJson)
  @transient private lazy val decoder =
    new AvroWireDecoder(schemaJson, includeSchema, seekOffset)

  override def dataType: DataType = sparkType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"avro_decode expects binary, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    decoder.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dec = ctx.addReferenceObj("avroWireDecoder", decoder,
      classOf[AvroWireDecoder].getName)
    val r = ctx.freshName("avroRow")
    nullSafeCodeGen(ctx, ev, c => s"""
      org.apache.spark.sql.catalyst.InternalRow $r = $dec.decode($c);
      if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): AvroDecode =
    copy(child = newChild)

  override def prettyName: String = "avro_decode"
}
