package graft.dsl

import org.apache.spark.sql.types.{ArrayType, BinaryType, BooleanType, DataType, DoubleType, FloatType, IntegerType, LongType, MapType, StringType, StructType}

/** AsyncAPI-style document emission from registered consumers — the
  * reference ships this builder disabled (`Kaflow.asyncapi()` raises
  * NotImplementedError, kaflow `applications.py:446-460`; models in
  * `asyncapi/models.py`); here it works: channels from the topic
  * registrations, message payload schemas derived from each consumer's
  * declared value serde (StructType → JSON Schema).
  */
object AsyncApiDoc {

  def render(app: GraftApp, title: String, version: String): String = {
    val channels = app.topics.map { t =>
      val spec = app.spec(t)
      val pub = q(t) + ": {\"subscribe\": {\"message\": {\"payload\": " +
        jsonSchema(spec.valueSerde.dataType) + "}}}"
      val sinks = spec.sinkTopics.map { st =>
        q(st) + ": {\"publish\": {\"message\": {\"payload\": " +
          spec.outValueSerde.map(s => jsonSchema(s.dataType))
            .getOrElse("{\"type\": \"string\", \"format\": \"binary\"}") + "}}}"
      }
      (pub +: sinks).mkString(", ")
    }
    s"""{"asyncapi": "2.6.0", "info": {"title": ${q(title)}, "version": ${q(version)}}, """ +
      s""""channels": {${channels.mkString(", ")}}}"""
  }

  /** AsyncAPI 3.0 document: channels + operations split (the 3.0 shape),
    * with payload schemas deduplicated into components/schemas — every
    * channel's message payload is a `$ref`, and structurally identical
    * serde schemas (a fan-out re-publishing its input type, two topics
    * sharing one model) are emitted exactly once.
    */
  def renderV3(app: GraftApp, title: String, version: String): String = {
    // Structural dedup: rendered-schema string -> component name. Names
    // derive from the topic, so two DIFFERENT schemas can want the same
    // name (a topic that is sink-with-one-schema then source-with-another,
    // or sanitized collisions like "a.b"/"a_b") — disambiguate with a
    // counter so every $ref resolves to its own schema.
    val schemaNames = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val usedNames = scala.collection.mutable.HashSet.empty[String]
    def refFor(topic: String, schema: String): String = {
      val name = schemaNames.getOrElseUpdate(schema, {
        val base = s"${sanitize(topic)}Payload"
        var candidate = base
        var i = 2
        while (usedNames.contains(candidate)) { candidate = s"$base$i"; i += 1 }
        candidate
      })
      usedNames += name
      s"""{"$$ref": "#/components/schemas/$name"}"""
    }
    val BinarySchema = """{"type": "string", "format": "binary"}"""

    // One channel per topic; a topic that is both someone's sink and
    // someone's source keeps the source's (authoritative) payload schema.
    val channels = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val operations = scala.collection.mutable.ListBuffer.empty[String]
    app.topics.foreach { t =>
      val spec = app.spec(t)
      channels.update(t, refFor(t, jsonSchema(spec.valueSerde.dataType)))
      operations += s"""${q(s"recv_$t")}: {"action": "receive", "channel": {"$$ref": ${q(s"#/channels/$t")}}}"""
      spec.sinkTopics.foreach { st =>
        val payload = spec.outValueSerde.map(s => jsonSchema(s.dataType))
          .getOrElse(BinarySchema)
        if (!channels.contains(st)) channels.update(st, refFor(st, payload))
        operations += s"""${q(s"send_$st")}: {"action": "send", "channel": {"$$ref": ${q(s"#/channels/$st")}}}"""
      }
    }

    val channelJson = channels.map { case (t, ref) =>
      s"""${q(t)}: {"address": ${q(t)}, "messages": {"message": {"payload": $ref}}}"""
    }.mkString(", ")
    val componentJson = schemaNames.map { case (schema, name) =>
      s"${q(name)}: $schema"
    }.mkString(", ")

    s"""{"asyncapi": "3.0.0", "info": {"title": ${q(title)}, "version": ${q(version)}}, """ +
      s""""channels": {$channelJson}, """ +
      s""""operations": {${operations.mkString(", ")}}, """ +
      s""""components": {"schemas": {$componentJson}}}"""
  }

  /** Self-contained HTML docs page: the AsyncAPI JSON embedded in the
    * standard `<asyncapi-component>` web component (the same page shape
    * the reference's docs renderer emits — kaflow `asyncapi/docs.py:9-37`
    * — but actually reachable: the reference's entry point raises
    * NotImplementedError). Component/CSS URLs are parameters so an
    * air-gapped deployment can point at a vendored copy.
    */
  def renderHtml(app: GraftApp, title: String, version: String,
      componentJsUrl: String =
        "https://unpkg.com/@asyncapi/web-component@1.0.0-next.47/lib/asyncapi-web-component.js",
      componentCssUrl: String =
        "https://unpkg.com/@asyncapi/react-component@1.0.0-next.12/styles/default.min.css"): String = {
    val schema = render(app, title, version)
    // The schema sits in a single-quoted HTML attribute: escape the
    // attribute delimiter and ampersands (JSON string escapes handle the
    // rest — q() never emits raw control characters).
    val attr = schema.replace("&", "&amp;").replace("'", "&#39;")
    s"""<!DOCTYPE html>
       |<html>
       |<head>
       |  <meta charset="utf-8"/>
       |  <link rel="stylesheet" href="$componentCssUrl"/>
       |  <title>${attr2(title)}</title>
       |</head>
       |<body>
       |  <script src="$componentJsUrl" defer></script>
       |  <asyncapi-component schema='$attr' cssImportPath="$componentCssUrl">
       |  </asyncapi-component>
       |</body>
       |</html>
       |""".stripMargin
  }

  private def attr2(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def sanitize(s: String): String =
    s.map(c => if (c.isLetterOrDigit) c else '_')

  /** Spark type → JSON Schema fragment. */
  def jsonSchema(t: DataType): String = t match {
    case StringType => """{"type": "string"}"""
    case LongType | IntegerType => """{"type": "integer"}"""
    case DoubleType | FloatType => """{"type": "number"}"""
    case BooleanType => """{"type": "boolean"}"""
    case BinaryType => """{"type": "string", "format": "binary"}"""
    case ArrayType(et, _) => s"""{"type": "array", "items": ${jsonSchema(et)}}"""
    case MapType(_, vt, _) =>
      s"""{"type": "object", "additionalProperties": ${jsonSchema(vt)}}"""
    case st: StructType =>
      val props = st.fields.map(f => s"${q(f.name)}: ${jsonSchema(f.dataType)}")
        .mkString(", ")
      val required = st.fields.filterNot(_.nullable).map(f => q(f.name))
        .mkString(", ")
      s"""{"type": "object", "properties": {$props}, "required": [$required]}"""
    case other => s"""{"type": "string", "description": ${q(other.catalogString)}}"""
  }

  private def q(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
