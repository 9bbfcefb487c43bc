package org.apache.spark.sql.graftnative

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{CanonicalJson, TextHashes}

/** Native Catalyst expressions for the engine's hot scalar functions.
  *
  * A Scala UDF already runs the same compiled math, but it sits outside
  * whole-stage codegen: Spark wraps it in null tracking, converter calls,
  * and a closure invocation per row, and the optimizer treats it as an
  * opaque black box. These expressions generate a direct static call in
  * the produced Java, so the surrounding project/filter stays in one
  * codegen stage (SURVEY.md §2.11: custom-Expression candidates T17 +
  * fingerprints).
  *
  * Lives under `org.apache.spark.sql` because the expression SPI
  * (`AbstractDataType`, `ExpressionUtils.column`) is `private[sql]` —
  * the standard packaging for third-party native expressions.
  */
object NativeExpressions {

  /** Static entry points referenced from generated code. */
  def simhash32(s: UTF8String): Long = TextHashes.simhash32(s.toString)
  def simhash60(s: UTF8String): Long = TextHashes.simhash60(s.toString)
  def canonicalChecksum(s: UTF8String): UTF8String =
    UTF8String.fromString(CanonicalJson.checksumOf(graft.transform.SolrTransform.parse(s.toString)))
  def dotArrays(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Double =
    graft.functions.VectorOps.dot(a.toDoubleArray(), b.toDoubleArray())

  private val Helper = "org.apache.spark.sql.graftnative.NativeExpressions"

  /** 32-bit simhash of a text column — codegen calls the static helper. */
  case class SimHash32Expression(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      NativeExpressions.simhash32(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Helper.simhash32($c)")
    override protected def withNewChildInternal(newChild: Expression): SimHash32Expression =
      copy(child = newChild)
    override def prettyName: String = "graft_simhash32"
  }

  /** 60-bit simhash (4×15-bit LSH bands; sign-safe BIGINT in both engines). */
  case class SimHash60Expression(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any =
      NativeExpressions.simhash60(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Helper.simhash60($c)")
    override protected def withNewChildInternal(newChild: Expression): SimHash60Expression =
      copy(child = newChild)
    override def prettyName: String = "graft_simhash60"
  }

  /** T17 canonical checksum of a JSON-document column: volatile keys
    * dropped, sorted-key CPython-parity serialization, CRC32 hex. */
  case class CanonicalChecksumExpression(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
    override def dataType: DataType = StringType
    override def nullSafeEval(input: Any): Any =
      NativeExpressions.canonicalChecksum(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Helper.canonicalChecksum($c)")
    override protected def withNewChildInternal(newChild: Expression): CanonicalChecksumExpression =
      copy(child = newChild)
    override def prettyName: String = "graft_canonical_checksum"
  }

  /** Dot product of two double-array columns. The UDF form runs the same
    * compiled loop but breaks whole-stage codegen at every pair-join probe
    * (closure call + null-tracking wrapper per row); this stays a single
    * static call inside the generated stage — the hot path of every
    * embedding pair operator (dd_embedding_neardup, dd_semdedup,
    * sim_ann_*, sim_kmeans_step). Summation order is the same
    * left-to-right fold the DuckDB oracle's list_sum uses. */
  case class DotProductExpression(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[AbstractDataType] =
      Seq(ArrayType(DoubleType), ArrayType(DoubleType))
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      NativeExpressions.dotArrays(
        a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
        b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"$Helper.dotArrays($a, $b)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotProductExpression =
      copy(left = newLeft, right = newRight)
    override def prettyName: String = "graft_dot"
  }

  def simhash32Col(c: Column): Column =
    ExpressionUtils.column(SimHash32Expression(ExpressionUtils.expression(c)))

  def simhash60Col(c: Column): Column =
    ExpressionUtils.column(SimHash60Expression(ExpressionUtils.expression(c)))

  def canonicalChecksumCol(c: Column): Column =
    ExpressionUtils.column(CanonicalChecksumExpression(ExpressionUtils.expression(c)))

  def dotCol(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProductExpression(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  private[graftnative] val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_simhash32"),
      new ExpressionInfo(classOf[SimHash32Expression].getName, "graft_simhash32"),
      (exprs: Seq[Expression]) => SimHash32Expression(exprs.head)),
    (FunctionIdentifier("graft_simhash60"),
      new ExpressionInfo(classOf[SimHash60Expression].getName, "graft_simhash60"),
      (exprs: Seq[Expression]) => SimHash60Expression(exprs.head)),
    (FunctionIdentifier("graft_canonical_checksum"),
      new ExpressionInfo(classOf[CanonicalChecksumExpression].getName, "graft_canonical_checksum"),
      (exprs: Seq[Expression]) => CanonicalChecksumExpression(exprs.head)),
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductExpression].getName, "graft_dot"),
      (exprs: Seq[Expression]) => DotProductExpression(exprs(0), exprs(1))))

  /** Register the native functions on an existing session, so they are
    * callable from SQL: `SELECT graft_simhash32(text) FROM docs`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}

/** SparkSessionExtensions hook — enables
  * `--conf spark.sql.extensions=org.apache.spark.sql.graftnative.GraftExtensions`
  * so every session on a cluster gets the engine's native SQL functions. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    NativeExpressions.functions.foreach(ext.injectFunction)
}
