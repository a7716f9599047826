package graft.serde

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.api.java.UDF1
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.types._

/** Minimal proto3 wire-format serde (reference ProtobufSerializer,
  * kaflow `serializers.py:110-131`).
  *
  * This container ships no protobuf-java, so the codec implements the
  * public protobuf wire format directly (varint keys `field<<3|wiretype`;
  * wiretypes 0=varint, 1=fixed64, 2=length-delimited, 5=fixed32). Messages
  * are declared as [[PbField]] lists — the runtime equivalent of a
  * compiled descriptor for the flat-message payloads the reference
  * round-trips in its tests (`tests/key_value.proto`).
  *
  * proto3 canonical encoding: default values (0, "", false, empty) are
  * omitted on serialize; unknown fields are skipped on deserialize.
  * Field-name convention (SURVEY.md §7.4): we keep proto-declared names
  * (snake_case), not the reference's MessageToDict camelCase.
  */
sealed trait PbType
object PbType {
  case object PbString extends PbType
  case object PbBytes extends PbType
  case object PbInt64 extends PbType  // varint, two's complement
  case object PbInt32 extends PbType
  case object PbBool extends PbType
  case object PbDouble extends PbType // fixed64
  case object PbFloat extends PbType  // fixed32
  final case class PbMessage(fields: Seq[PbField]) extends PbType
}

final case class PbField(number: Int, name: String, ptype: PbType,
                         repeated: Boolean = false)

final case class ProtobufSerde(fields: Seq[PbField]) extends Serde {
  import PbType._

  val dataType: DataType = ProtobufSerde.toSparkType(PbMessage(fields))

  /** PRODUCTION decode path: the native Catalyst expression
    * ([[graft.functions.expressions.PbDecode]]) — codegen-resident,
    * zero per-record UDF dispatch. Parity with the UDF reference codec
    * below is pinned in SerdeSpec on the reference's golden fixtures.
    */
  def deserialize(bytes: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.PbDecode(
      ColumnBridge.expression(bytes), fields))
  }

  /** UDF-backed REFERENCE codec (the parity twin of the native
    * expression — the house pattern).
    */
  def deserializeUdf(bytes: Column): Column = {
    val fs = fields
    val dt = dataType
    val fn = new UDF1[Array[Byte], Row] {
      override def call(raw: Array[Byte]): Row =
        if (raw == null) null
        else try ProtobufSerde.decodeMessage(raw, 0, raw.length, fs)
        catch { case _: Exception => null }
    }
    udf(fn, dt).apply(bytes)
  }

  def serialize(value: Column): Column = {
    val fs = fields
    val fn = new UDF1[Row, Array[Byte]] {
      override def call(row: Row): Array[Byte] =
        if (row == null) null else ProtobufSerde.encodeMessage(row, fs)
    }
    udf(fn, BinaryType).apply(value)
  }
}

object ProtobufSerde {
  import PbType._

  def toSparkType(t: PbType): DataType = t match {
    case PbString => StringType
    case PbBytes => BinaryType
    case PbInt64 => LongType
    case PbInt32 => IntegerType
    case PbBool => BooleanType
    case PbDouble => DoubleType
    case PbFloat => FloatType
    case PbMessage(fs) =>
      StructType(fs.map { f =>
        val base = toSparkType(f.ptype)
        StructField(f.name, if (f.repeated) ArrayType(base) else base)
      })
  }

  // ---- decoding ----

  // Every read is bounds-checked against `end` (the enclosing message
  // limit, not just the buffer): a truncated length-delimited field must
  // FAIL (-> null -> DLQ), not zero-pad via copyOfRange's padding
  // semantics, and a nested message must never read its parent's
  // trailing bytes.
  private final class Cursor(val buf: Array[Byte], var pos: Int, val end: Int) {
    def hasNext: Boolean = pos < end
    def readVarint(): Long = {
      var shift = 0; var acc = 0L
      while (true) {
        require(pos < end, "truncated varint")
        val b = buf(pos); pos += 1
        acc |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return acc
        shift += 7
        require(shift < 64, "malformed varint")
      }
      acc
    }
    def readFixed64(): Long = {
      require(pos + 8 <= end, "truncated fixed64")
      var v = 0L
      var i = 0
      while (i < 8) { v |= (buf(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8; v
    }
    def readFixed32(): Int = {
      require(pos + 4 <= end, "truncated fixed32")
      var v = 0
      var i = 0
      while (i < 4) { v |= (buf(pos + i) & 0xff) << (8 * i); i += 1 }
      pos += 4; v
    }
    def readBytes(n: Int): Array[Byte] = {
      require(n >= 0 && pos + n <= end, "truncated length-delimited field")
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; out
    }
  }

  private[serde] def decodeMessage(buf: Array[Byte], from: Int, to: Int,
                                   fields: Seq[PbField]): Row = {
    val c = new Cursor(buf, from, to)
    val byNumber = fields.map(f => f.number -> f).toMap
    val values = scala.collection.mutable.Map[Int, Any]()
    val repeated = scala.collection.mutable.Map[Int, Vector[Any]]()
    while (c.hasNext) {
      val tag = c.readVarint()
      val num = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      byNumber.get(num) match {
        case Some(f) =>
          val v: Any = (f.ptype, wire) match {
            case (PbString, 2) => new String(c.readBytes(c.readVarint().toInt), "UTF-8")
            case (PbBytes, 2) => c.readBytes(c.readVarint().toInt)
            case (PbMessage(sub), 2) =>
              val len = c.readVarint().toInt
              require(len >= 0 && c.pos + len <= c.end, "truncated submessage")
              val r = decodeMessage(buf, c.pos, c.pos + len, sub); c.pos += len; r
            case (PbInt64, 0) => c.readVarint()
            case (PbInt32, 0) => c.readVarint().toInt
            case (PbBool, 0) => c.readVarint() != 0
            case (PbDouble, 1) => java.lang.Double.longBitsToDouble(c.readFixed64())
            case (PbFloat, 5) => java.lang.Float.intBitsToFloat(c.readFixed32())
            // packed repeated scalars: the declared length is validated
            // up front and must be consumed exactly — a packed run may
            // neither swallow the next field's bytes nor stop short
            case (PbInt64 | PbInt32 | PbBool, 2) if f.repeated =>
              val len = c.readVarint().toInt
              require(len >= 0 && c.pos + len <= c.end, "truncated packed field")
              val limit = c.pos + len
              val acc = Vector.newBuilder[Any]
              while (c.pos < limit) acc += (f.ptype match {
                case PbInt64 => c.readVarint()
                case PbInt32 => c.readVarint().toInt
                case _ => c.readVarint() != 0
              })
              require(c.pos == limit, "malformed packed field")
              acc.result()
            case _ => throw new IllegalArgumentException(
              s"field ${f.name}: unexpected wire type $wire")
          }
          if (f.repeated) {
            val items = v match { case vec: Vector[_] => vec; case x => Vector(x) }
            repeated(num) = repeated.getOrElse(num, Vector.empty) ++ items
          } else values(num) = v
        case None => // unknown field: skip per wire type
          wire match {
            case 0 => c.readVarint()
            case 1 => c.readFixed64()
            case 2 =>
              val n = c.readVarint().toInt
              require(n >= 0 && c.pos + n <= c.end, "truncated unknown field")
              c.pos += n
            case 5 => c.readFixed32()
            case other => throw new IllegalArgumentException(s"bad wire type $other")
          }
      }
    }
    Row.fromSeq(fields.map { f =>
      if (f.repeated) repeated.getOrElse(f.number, Vector.empty)
      else values.getOrElse(f.number, defaultOf(f.ptype))
    })
  }

  /** proto3 defaults for absent scalar fields. */
  private def defaultOf(t: PbType): Any = t match {
    case PbString => ""
    case PbBytes => Array.emptyByteArray
    case PbInt64 => 0L
    case PbInt32 => 0
    case PbBool => false
    case PbDouble => 0.0
    case PbFloat => 0.0f
    case PbMessage(_) => null
  }

  // ---- encoding ----

  private def writeVarint(out: ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  private def writeTag(out: ByteArrayOutputStream, number: Int, wire: Int): Unit =
    writeVarint(out, (number.toLong << 3) | wire)

  private[serde] def encodeMessage(row: Row, fields: Seq[PbField]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    fields.zipWithIndex.foreach { case (f, i) =>
      val v = row.get(i)
      if (f.repeated) {
        val items = v match {
          case null => Seq.empty
          case s: scala.collection.Seq[_] => s
          case other => Seq(other)
        }
        items.foreach(x => encodeValue(out, f, x))
      } else if (v != null && v != defaultOf(f.ptype)) {
        (v, f.ptype) match { // empty bytes also omitted (proto3 canonical)
          case (b: Array[Byte], PbBytes) if b.isEmpty => ()
          case _ => encodeValue(out, f, v)
        }
      }
    }
    out.toByteArray
  }

  private def encodeValue(out: ByteArrayOutputStream, f: PbField, v: Any): Unit =
    (f.ptype, v) match {
      case (PbString, s: String) =>
        val b = s.getBytes("UTF-8")
        writeTag(out, f.number, 2); writeVarint(out, b.length); out.write(b)
      case (PbBytes, b: Array[Byte]) =>
        writeTag(out, f.number, 2); writeVarint(out, b.length); out.write(b)
      case (PbMessage(sub), r: Row) =>
        val b = encodeMessage(r, sub)
        writeTag(out, f.number, 2); writeVarint(out, b.length); out.write(b)
      case (PbInt64, n: Long) => writeTag(out, f.number, 0); writeVarint(out, n)
      case (PbInt32, n: Int) => writeTag(out, f.number, 0); writeVarint(out, n.toLong)
      case (PbBool, b: Boolean) =>
        writeTag(out, f.number, 0); writeVarint(out, if (b) 1 else 0)
      case (PbDouble, d: Double) =>
        writeTag(out, f.number, 1)
        val bits = java.lang.Double.doubleToLongBits(d)
        (0 until 8).foreach(i => out.write(((bits >>> (8 * i)) & 0xff).toInt))
      case (PbFloat, fl: Float) =>
        writeTag(out, f.number, 5)
        val bits = java.lang.Float.floatToIntBits(fl)
        (0 until 4).foreach(i => out.write((bits >>> (8 * i)) & 0xff))
      case (t, other) => throw new IllegalArgumentException(
        s"field ${f.name}: cannot encode $other as $t")
    }
}
