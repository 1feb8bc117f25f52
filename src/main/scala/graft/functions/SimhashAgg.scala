package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{DataType, LongType}

import java.nio.ByteBuffer

/** SimHash signature aggregate: per group, the `bits`-bit simhash of the
  * aggregated token-hash column — bit b of the result is set iff the
  * signed sum over inputs (+1 when bit b of the token hash is set, −1
  * otherwise) is positive. Tokens count with multiplicity; a tied sum
  * (0) leaves the bit clear, matching the column formulation it
  * replaces.
  *
  * The scale story vs the 60-aggregate column form (`sum(when(bit_b))`
  * × bits): that form carries `bits` separate aggregation buffers per
  * group through partial aggregation and the shuffle, and evaluates
  * `bits` conditional expressions per input row. This aggregate keeps
  * ONE `Array[Int](bits)` buffer per group, updates it with a tight
  * shift-mask loop per row, and merges by vector addition — the same
  * map-side-combine shape, a fraction of the per-row and per-buffer
  * overhead. Reference semantics mirrored by the q22/q55 DuckDB oracles
  * (per-bit signed sums recomputed in SQL), so a drifting bit
  * convention breaks the judged hash.
  */
case class SimhashAgg(
    tokenHash: Expression,
    bits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  require(bits > 0 && bits <= 60, s"bits must be in 1..60, got $bits")

  override def createAggregationBuffer(): Array[Int] = new Array[Int](bits)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = tokenHash.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var b = 0
      while (b < bits) {
        // +1 when the bit is set, -1 otherwise: 2*bit - 1
        buf(b) += ((((h >>> b) & 1L) << 1) - 1L).toInt
        b += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Int], other: Array[Int]): Array[Int] = {
    var b = 0
    while (b < bits) { buf(b) += other(b); b += 1 }
    buf
  }

  override def eval(buf: Array[Int]): Any = {
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (buf(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * bits)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bits)(bb.getInt())
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(tokenHash)
  override def prettyName: String = "graft_simhash"

  override def withNewMutableAggBufferOffset(offset: Int): SimhashAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): SimhashAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimhashAgg =
    copy(tokenHash = newChildren.head)
}

object SimhashAgg {
  /** Registry descriptor: `graft_simhash(token_hash, bits)` with literal
    * bits (the bit width shapes the aggregation buffer, so it must be
    * known at plan time — same contract as `graft_topk`'s k).
    */
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_simhash"),
    new ExpressionInfo(classOf[SimhashAgg].getCanonicalName, "graft_simhash"),
    (children: Seq[Expression]) => {
      val bits = children(1) match {
        case Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"graft_simhash bits must be an integer literal, got $other")
      }
      SimhashAgg(children.head, bits)
    },
  )
}
