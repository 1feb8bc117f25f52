package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.{Column, SparkSession}

/** Native dot product over two `array<double>` columns.
  *
  * Spark's built-in route — `aggregate(zip_with(a, b, _*_), 0d, _+_)` —
  * evaluates the lambda interpreted, allocating an intermediate array and
  * boxing every element; profiling the embedding operators at sf0.1
  * showed it dominating. This expression generates a tight primitive
  * loop inside whole-stage codegen (and mirrors it in `nullSafeEval` for
  * the interpreted fallback).
  *
  * Accumulation is sequential left-to-right in double, bit-identical to
  * the built-in composition AND to DuckDB's `list_dot_product` — the
  * oracle-match property the similarity queries rely on.
  *
  * Semantics: result length = min(|a|, |b|); null input → null; null
  * *elements* are not supported (embedding vectors are dense).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, array<double>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val arrA = a.asInstanceOf[ArrayData]
    val arrB = b.asInstanceOf[ArrayData]
    val n = math.min(arrA.numElements(), arrB.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) {
      sum += arrA.getDouble(i) * arrB.getDouble(i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Registration + Column-API surface for graft's native functions. */
object GraftFunctions {

  val dotProductDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getCanonicalName, "graft_dot"),
    (children: Seq[Expression]) => DotProduct(children.head, children(1)),
  )

  val bloomContainsDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_bloom_contains"),
    new ExpressionInfo(classOf[BloomContains].getCanonicalName, "graft_bloom_contains"),
    (children: Seq[Expression]) => BloomContains(children.head, children(1)),
  )

  /** Idempotently register graft functions on an existing session (the
    * extension-less path; [[graft.plans.GraftExtensions]] is the
    * `spark.sql.extensions` path for sessions built with it).
    */
  def register(spark: SparkSession): Unit = {
    Seq(dotProductDescriptor, bloomContainsDescriptor,
        TopKAgg.descriptor, SimhashAgg.descriptor)
      .foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
  }

  /** `array<double> x array<double> -> double`, codegen'd. Requires
    * [[register]] (cheap, idempotent) on the session.
    */
  def dotNative(a: Column, b: Column): Column = call_function("graft_dot", a, b)
}
