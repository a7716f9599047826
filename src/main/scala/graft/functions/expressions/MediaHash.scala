package graft.functions.expressions

import graft.functions.MediaCodecs
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `encode_bmp_gray8(array<int>)` — 64 gray values (row-major top-down)
  * to a real 8x8 24-bpp BMP payload ([[MediaCodecs.encodeBmpGray8]]).
  * The point of staging ACTUAL format bytes in the plan (rather than
  * hashing the pixel array directly) is that downstream consumers
  * exercise the production decode path — a decoder regression breaks
  * the q142 oracle hash, not just a unit test. NULL on a wrong-sized
  * array.
  */
case class EncodeBmpGray8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"encode_bmp_gray8 expects array<int>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    MediaCodecs.encodeBmpGray8(input.asInstanceOf[ArrayData].toIntArray())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.freshName("bmpBytes")
    nullSafeCodeGen(ctx, ev, c => s"""
      byte[] $r = graft.functions.MediaCodecs.encodeBmpGray8($c.toIntArray());
      if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): EncodeBmpGray8 =
    copy(child = newChild)

  override def prettyName: String = "encode_bmp_gray8"
}

/** `encode_wav_pcm8(array<int>)` — raw samples to a real mono 8-bit PCM
  * RIFF/WAVE payload at 8 kHz ([[MediaCodecs.encodeWavPcm8]]). Same
  * rationale as [[EncodeBmpGray8]]: staging ACTUAL format bytes makes
  * downstream consumers exercise the production decode path, so a
  * decoder regression breaks the q194 oracle hash. NULL on an empty
  * array.
  */
case class EncodeWavPcm8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"encode_wav_pcm8 expects array<int>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    MediaCodecs.encodeWavPcm8(input.asInstanceOf[ArrayData].toIntArray(), 8000)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.freshName("wavBytes")
    nullSafeCodeGen(ctx, ev, c => s"""
      byte[] $r = graft.functions.MediaCodecs.encodeWavPcm8($c.toIntArray(), 8000);
      if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): EncodeWavPcm8 =
    copy(child = newChild)

  override def prettyName: String = "encode_wav_pcm8"
}

/** `wav_energy_hash(binary)` — 64-bit frame-energy fingerprint of a PCM
  * WAV payload ([[MediaCodecs.energyHash64]]: real decode + 64 equal
  * frames + integer mean threshold on Σv² per frame). NULL for
  * non-WAV bytes or clips shorter than 64 samples. Decode work stays
  * inside whole-stage codegen via a static call.
  */
case class WavEnergyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"wav_energy_hash expects binary, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val r = MediaCodecs.energyHash64(input.asInstanceOf[Array[Byte]])
    if (r == null) null else r.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.freshName("eHash")
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long $r = graft.functions.MediaCodecs.energyHash64($c);
      if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): WavEnergyHash =
    copy(child = newChild)

  override def prettyName: String = "wav_energy_hash"
}

/** `encode_png_gray8(array<int>)` — 64 gray values (row-major top-down)
  * to a real zlib-deflated 8x8 grayscale PNG payload
  * ([[MediaCodecs.encodePngGray8]]). Same rationale as
  * [[EncodeBmpGray8]], now for a COMPRESSED format: downstream
  * consumers exercise the JDK `javax.imageio` decode path, so a codec
  * regression breaks the q200 oracle hash. NULL on a wrong-sized array.
  */
case class EncodePngGray8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"encode_png_gray8 expects array<int>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    MediaCodecs.encodePngGray8(input.asInstanceOf[ArrayData].toIntArray())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.freshName("pngBytes")
    nullSafeCodeGen(ctx, ev, c => s"""
      byte[] $r = graft.functions.MediaCodecs.encodePngGray8($c.toIntArray());
      if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): EncodePngGray8 =
    copy(child = newChild)

  override def prettyName: String = "encode_png_gray8"
}

/** `img_ahash(binary)` — average-hash of a COMPRESSED image payload
  * (JPEG/PNG through the JDK codec, raw raster samples — see
  * [[MediaCodecs.imgAHash64]]) as a 64-bit fingerprint. NULL for
  * non-JPEG/PNG bytes, corrupt streams, or sub-8x8 images. Decode work
  * stays inside whole-stage codegen via a static call.
  */
case class ImgAHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"img_ahash expects binary, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val r = MediaCodecs.imgAHash64(input.asInstanceOf[Array[Byte]])
    if (r == null) null else r.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.freshName("imgHash")
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long $r = graft.functions.MediaCodecs.imgAHash64($c);
      if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): ImgAHash =
    copy(child = newChild)

  override def prettyName: String = "img_ahash"
}

/** `bmp_ahash(binary)` — average-hash of a BMP payload as a 64-bit
  * fingerprint ([[MediaCodecs.aHash64]]: real decode + 8x8 thumbnail +
  * integer mean threshold). NULL for non-BMP bytes or sub-8x8 images.
  * Decode work stays inside whole-stage codegen via a static call.
  */
case class BmpAHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bmp_ahash expects binary, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val r = MediaCodecs.aHash64(input.asInstanceOf[Array[Byte]])
    if (r == null) null else r.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.freshName("aHash")
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long $r = graft.functions.MediaCodecs.aHash64($c);
      if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): BmpAHash =
    copy(child = newChild)

  override def prettyName: String = "bmp_ahash"
}
