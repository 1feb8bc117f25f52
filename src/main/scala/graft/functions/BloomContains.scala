package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `graft_bloom_contains(key: long, bloom: binary) -> boolean` — native
  * membership probe against a serialized `org.apache.spark.util.sketch
  * .BloomFilter`.
  *
  * The filter bytes arrive as a foldable literal: the plan (and with it
  * the literal) ships to executors once per stage via the task-binary
  * broadcast, and each expression instance deserializes the sketch
  * lazily on first row — never per row. `doGenCode` emits a single
  * virtual call on the referenced expression object, keeping the probe
  * inside whole-stage codegen (no boxing, no UDF bridge).
  *
  * This is the row-level pruning primitive behind
  * [[graft.ops.BloomPrune]]: filter a 100 TB fact down to ~the matching
  * fraction BEFORE the shuffle of an exact join. False positives are
  * possible by construction (the exact join downstream removes them);
  * false negatives are not.
  */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, BinaryType) if right.foldable => TypeCheckResult.TypeCheckSuccess
      case (LongType, BinaryType) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires the bloom-filter bytes to be a literal")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, binary), got (${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = BooleanType

  override def prettyName: String = "graft_bloom_contains"

  // deserialized once per (de)serialized expression instance — i.e. once
  // per executor per stage, not per row
  @transient private lazy val bloom: BloomFilter = {
    val bytes = right.eval(null).asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  def mightContain(v: Long): Boolean = bloom.mightContainLong(v)

  override protected def nullSafeEval(v: Any, bytes: Any): Any =
    mightContain(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomContains", this, classOf[BloomContains].getName)
    nullSafeCodeGen(ctx, ev, (v, _) => s"${ev.value} = $ref.mightContain($v);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}
