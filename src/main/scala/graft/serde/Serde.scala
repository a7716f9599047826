package graft.serde

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}

/** Wire-format serde as Column transformations (the Spark-native analog of
  * the reference's Serializer ABC, kaflow `serializers.py:32-43`).
  *
  * `deserialize` maps a BINARY column to a typed column (struct for
  * schema'd formats); `serialize` maps a typed column back to BINARY.
  * JSON/String are pure Catalyst expressions (codegen'd, pushdown-safe).
  * Avro/Protobuf implement the public wire formats directly (this
  * container ships no spark-avro/spark-protobuf modules): DECODE is a
  * native Catalyst expression per format (AvroDecode/PbDecode —
  * codegen-resident hot path) with the original UDF codecs retained as
  * `deserializeUdf` parity references; SERIALIZE stays UDF-backed (it
  * feeds sink writes, not the analytic hot path).
  */
trait Serde extends Serializable {
  /** Spark type produced by deserialize. */
  def dataType: DataType
  def deserialize(bytes: Column): Column
  def serialize(value: Column): Column

  /** True for records whose payload fails to deserialize — the condition
    * the pipeline uses for DLQ routing. Default: non-null input decoded to
    * null (the UDF codecs return null on any codec exception).
    */
  def failureIndicator(raw: Column): Column =
    failureFromDecoded(raw, deserialize(raw))

  /** Failure indicator derived from an ALREADY-decoded column, so the hot
    * ingestion path decodes each record once and reuses the result — for
    * UDF-backed codecs (Avro/Protobuf) re-invoking `deserialize` per filter
    * would multiply decode CPU. Formats whose decode cannot signal failure
    * through null (e.g. PERMISSIVE JSON's all-null struct) override this
    * with a raw-based check instead.
    */
  def failureFromDecoded(raw: Column, decoded: Column): Column =
    raw.isNotNull && decoded.isNull

  /** Decode once, returning (typedValue, failureIndicator) as expressions
    * over ONE decode evaluation. The default derives both from the same
    * `deserialize` tree (deterministic expressions — Catalyst's
    * subexpression elimination evaluates it once per row); formats whose
    * failure signal needs a different parse (JSON's corrupt-record column)
    * override this so the hot path still parses each record exactly once.
    */
  def decodeWithFailure(raw: Column): (Column, Column) = {
    val d = deserialize(raw)
    (d, failureFromDecoded(raw, d))
  }
}

/** UTF-8 string passthrough (reference StringSerializer,
  * `serializers.py:46-57`).
  */
object StringSerde extends Serde {
  val dataType: DataType = StringType
  def deserialize(bytes: Column): Column = bytes.cast("string")
  def serialize(value: Column): Column = value.cast("string").cast("binary")
}

/** Raw bytes passthrough (reference's un-serded `bytes` params,
  * `parameters.py:51-56`).
  */
object BytesSerde extends Serde {
  val dataType: DataType = org.apache.spark.sql.types.BinaryType
  def deserialize(bytes: Column): Column = bytes
  def serialize(value: Column): Column = value
}

/** JSON with a declared schema (reference JsonSerializer + pydantic
  * validation, `serializers.py:60-71` + `_consumer.py:23-37`).
  *
  * Declared-schema, fail-per-record semantics: malformed or
  * schema-violating payloads deserialize to null (PERMISSIVE), which the
  * pipeline routes to the DLQ — the Spark-native form of the reference's
  * deserialization_error_handler path (`_consumer.py:129-190`).
  */
final case class JsonSerde(schema: StructType) extends Serde {
  val dataType: DataType = schema
  /** Null-on-failure (PERMISSIVE): malformed payloads become null structs,
    * which the pipeline routes to the DLQ. `deserializeStrict` is the
    * fail-the-job variant for pipelines that prefer crashing to skipping.
    */
  def deserialize(bytes: Column): Column =
    from_json(bytes.cast("string"), schema)
  def deserializeStrict(bytes: Column): Column =
    from_json(bytes.cast("string"), schema, Map("mode" -> "FAILFAST"))
  def serialize(value: Column): Column = to_json(value).cast("binary")

  /** PERMISSIVE `from_json` yields an all-null struct (not null) for
    * malformed input, so failure detection uses a corrupt-record column:
    * populated iff the payload failed to parse as the declared schema.
    */
  override def failureIndicator(raw: Column): Column = {
    val withCorrupt = StructType(schema.fields :+ StructField("__corrupt", StringType))
    raw.isNotNull &&
      from_json(raw.cast("string"), withCorrupt,
        Map("columnNameOfCorruptRecord" -> "__corrupt"))
        .getField("__corrupt").isNotNull
  }

  /** The decoded struct can't distinguish malformed input (all-null struct)
    * from a legitimate all-null payload, so the corrupt-record parse of the
    * raw bytes stays the failure source. `from_json` is a codegen'd Catalyst
    * expression — cheap relative to a UDF round-trip — and subexpression
    * elimination dedupes it within a projection.
    */
  override def failureFromDecoded(raw: Column, decoded: Column): Column =
    failureIndicator(raw)

  /** Single-parse decode: ONE corrupt-record-augmented `from_json` serves
    * both outputs — the typed value is the parsed struct minus the corrupt
    * field, the failure indicator is that field's non-nullness. Without
    * this, value decode and failure detection are two different parses of
    * every record (different schemas, so subexpression elimination can't
    * merge them) — measurable on the ingest hot path.
    */
  override def decodeWithFailure(raw: Column): (Column, Column) = {
    val withCorrupt = StructType(schema.fields :+ StructField("__corrupt", StringType))
    val parsed = from_json(raw.cast("string"), withCorrupt,
      Map("columnNameOfCorruptRecord" -> "__corrupt"))
    val value = when(parsed.isNull, lit(null).cast(schema))
      .otherwise(struct(schema.fieldNames.toSeq.map(n => parsed.getField(n).as(n)): _*))
    val failed = raw.isNotNull && parsed.getField("__corrupt").isNotNull
    (value, failed)
  }
}

/** Schemaless JSON via Spark 4's VARIANT type (the reference JsonSerializer's
  * no-model path, kaflow `serializers.py:60-71` with a plain-`dict` handler
  * param): payloads keep their full structure without a declared StructType,
  * fields are extracted lazily with `variant_get(col, "$.path", type)`.
  *
  * Variant stores a parsed binary form (typed values + a field dictionary),
  * so repeated path extraction does NOT re-parse the JSON text the way
  * repeated `get_json_object` calls do — the right default for pipelines
  * whose consumers each read a few fields of a wide, evolving payload.
  *
  * `try_parse_json` yields null on malformed input, so the default
  * null-on-failure DLQ indicator applies unchanged.
  */
object VariantSerde extends Serde {
  val dataType: DataType = org.apache.spark.sql.types.VariantType
  def deserialize(bytes: Column): Column = try_parse_json(bytes.cast("string"))
  /** Fail-the-job variant (`parse_json` throws on malformed input). */
  def deserializeStrict(bytes: Column): Column = parse_json(bytes.cast("string"))
  def serialize(value: Column): Column = to_json(value).cast("binary")
}
