package graft.spark

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot kernel functions (§2.8 "promote
  * hot ones to Expression"): unlike a Scala UDF, these participate in
  * whole-stage codegen — no closure dispatch, no Row boxing — while still
  * delegating the semantics to the one shared kernel object so engine ==
  * oracle stays true by construction.
  */
object Expressions {

  /** `ro_ratio(a, b)` — CPython difflib SequenceMatcher.ratio (F4,
    * search.py:58-68), the fuzzy-VIN metric. Null-safe: null in -> null out.
    */
  case class RoRatio(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "ro_ratio"

    override def nullSafeEval(a: Any, b: Any): Any =
      graft.kernel.Difflib.ratio(
        a.asInstanceOf[UTF8String].toString, b.asInstanceOf[UTF8String].toString)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.kernel.Difflib.ratio($a.toString(), $b.toString())")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): RoRatio =
      copy(left = newLeft, right = newRight)
  }

  /** `graft_fingerprint(text)` — the P12 rolling document fingerprint, hashing
    * the string's UTF-8 bytes DIRECTLY off the UnsafeRow (zero String
    * allocation, zero re-encode): at a 100 TB text sweep the UDF form's
    * UTF8String->String->getBytes round trip is pure overhead.
    */
  case class Fingerprint(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_fingerprint"

    override def nullSafeEval(input: Any): Any =
      Expressions.fingerprintUtf8(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.spark.Expressions.fingerprintUtf8($c)")

    override protected def withNewChildInternal(newChild: Expression): Fingerprint =
      copy(child = newChild)
  }

  /** UTF8String bridge for [[Fingerprint]] — the kernel stays Spark-free
    * (it IS the oracle), so the byte extraction lives here. getBytes is
    * zero-copy when the UTF8String spans a whole array (the common case).
    */
  def fingerprintUtf8(u: UTF8String): Long = {
    val b = u.getBytes
    graft.kernel.TextStats.fingerprintBytes(b, 0, b.length)
  }

  /** Column form; requires [[register]] on the session (Spark 4 Columns wrap
    * ColumnNodes, so the registry is the portable way to splice a custom
    * Expression into the DataFrame API).
    */
  def roRatio(a: Column, b: Column): Column = call_function("ro_ratio", a, b)

  def fingerprint(c: Column): Column = call_function("graft_fingerprint", c)

  /** Register SQL-callable forms (spark.sql("... ro_ratio(a, b) ...")). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ro_ratio", exprs => RoRatio(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_fingerprint", exprs => Fingerprint(exprs(0)), "scala_udf")
  }
}
