package graft.functions.expressions

import graft.serde.{PbField, PbType, ProtobufSerde}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Executor-side proto3 wire decoder producing Catalyst INTERNAL rows —
  * the engine half of [[PbDecode]], mirroring
  * [[graft.serde.ProtobufSerde.decodeMessage]] (which remains the
  * interpreted parity reference) but emitting UTF8String /
  * GenericArrayData / GenericInternalRow directly: strings never pass
  * through java.lang.String, rows never pass through the external Row
  * converter. Same wire subset (varint/fixed64/length-delimited/fixed32,
  * packed repeated scalars, unknown-field skip, proto3 defaults) and
  * the same null-on-failure DLQ contract.
  */
final class PbWireDecoder(val fields: Seq[PbField]) extends Serializable {
  import PbType._

  def decode(raw: Array[Byte]): InternalRow =
    if (raw == null) null
    else try decodeInternal(raw, 0, raw.length, fields)
    catch { case scala.util.control.NonFatal(_) => null }

  private def decodeInternal(buf: Array[Byte], from: Int, to: Int,
                             fs: Seq[PbField]): InternalRow = {
    // bounds-checked against the enclosing message limit `to`, exactly
    // as the reference Cursor: truncated fields FAIL (-> null -> DLQ)
    // instead of zero-padding, nested messages never read parent bytes
    var pos = from
    def readVarint(): Long = {
      var shift = 0; var acc = 0L
      while (true) {
        require(pos < to, "truncated varint")
        val b = buf(pos); pos += 1
        acc |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return acc
        shift += 7
        require(shift < 64, "malformed varint")
      }
      acc
    }
    def readFixed64(): Long = {
      require(pos + 8 <= to, "truncated fixed64")
      var v = 0L; var i = 0
      while (i < 8) { v |= (buf(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8; v
    }
    def readFixed32(): Int = {
      require(pos + 4 <= to, "truncated fixed32")
      var v = 0; var i = 0
      while (i < 4) { v |= (buf(pos + i) & 0xff) << (8 * i); i += 1 }
      pos += 4; v
    }
    def readBytes(n: Int): Array[Byte] = {
      require(n >= 0 && pos + n <= to, "truncated length-delimited field")
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; out
    }
    val byNumber = fs.map(f => f.number -> f).toMap
    val values = scala.collection.mutable.Map[Int, Any]()
    val repeated = scala.collection.mutable.Map[Int, Vector[Any]]()
    while (pos < to) {
      val tag = readVarint()
      val num = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      byNumber.get(num) match {
        case Some(f) =>
          val v: Any = (f.ptype, wire) match {
            case (PbString, 2) =>
              UTF8String.fromBytes(readBytes(readVarint().toInt))
            case (PbBytes, 2) => readBytes(readVarint().toInt)
            case (PbMessage(sub), 2) =>
              val len = readVarint().toInt
              require(len >= 0 && pos + len <= to, "truncated submessage")
              val r = decodeInternal(buf, pos, pos + len, sub); pos += len; r
            case (PbInt64, 0) => readVarint()
            case (PbInt32, 0) => readVarint().toInt
            case (PbBool, 0) => readVarint() != 0
            case (PbDouble, 1) => java.lang.Double.longBitsToDouble(readFixed64())
            case (PbFloat, 5) => java.lang.Float.intBitsToFloat(readFixed32())
            case (PbInt64 | PbInt32 | PbBool, 2) if f.repeated =>
              val len = readVarint().toInt
              val limit = pos + len
              val acc = Vector.newBuilder[Any]
              while (pos < limit) acc += (f.ptype match {
                case PbInt64 => readVarint()
                case PbInt32 => readVarint().toInt
                case _ => readVarint() != 0
              })
              acc.result()
            case _ => throw new IllegalArgumentException(
              s"field ${f.name}: unexpected wire type $wire")
          }
          if (f.repeated) {
            val items = v match { case vec: Vector[_] => vec; case x => Vector(x) }
            repeated(num) = repeated.getOrElse(num, Vector.empty) ++ items
          } else values(num) = v
        case None =>
          wire match {
            case 0 => readVarint()
            case 1 => readFixed64()
            case 2 =>
              val n = readVarint().toInt
              require(n >= 0 && pos + n <= to, "truncated unknown field")
              pos += n
            case 5 => readFixed32()
            case other => throw new IllegalArgumentException(s"bad wire type $other")
          }
      }
    }
    new GenericInternalRow(fs.map { f =>
      if (f.repeated)
        new GenericArrayData(repeated.getOrElse(f.number, Vector.empty).toArray)
      else values.getOrElse(f.number, defaultOf(f.ptype))
    }.toArray[Any])
  }

  /** proto3 defaults for absent scalars, in INTERNAL representation. */
  private def defaultOf(t: PbType): Any = t match {
    case PbString => UTF8String.EMPTY_UTF8
    case PbBytes => Array.emptyByteArray
    case PbInt64 => 0L
    case PbInt32 => 0
    case PbBool => false
    case PbDouble => 0.0
    case PbFloat => 0.0f
    case PbMessage(_) => null
  }
}

/** `pb_decode(binary)` — proto3 wire format decoded to a typed struct as
  * a native Catalyst expression (the Avro path's [[AvroDecode]] twin for
  * Protobuf): the Kafka ingest hot path stays inside whole-stage codegen
  * with no per-record UDF dispatch. The UDF codec
  * ([[graft.serde.ProtobufSerde.deserializeUdf]]) remains the
  * golden-bytes parity reference. Undecodable payloads yield NULL (DLQ
  * routing upstream).
  */
case class PbDecode(child: Expression, fields: Seq[PbField])
    extends UnaryExpression {

  @transient private lazy val sparkType: DataType =
    ProtobufSerde.toSparkType(PbType.PbMessage(fields))
  @transient private lazy val decoder = new PbWireDecoder(fields)

  override def dataType: DataType = sparkType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pb_decode expects binary, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    decoder.decode(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dec = ctx.addReferenceObj("pbWireDecoder", decoder,
      classOf[PbWireDecoder].getName)
    val r = ctx.freshName("pbRow")
    nullSafeCodeGen(ctx, ev, c => s"""
      org.apache.spark.sql.catalyst.InternalRow $r = $dec.decode($c);
      if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): PbDecode =
    copy(child = newChild)

  override def prettyName: String = "pb_decode"
}
