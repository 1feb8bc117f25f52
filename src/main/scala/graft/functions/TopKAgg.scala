package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/** Bounded top-k aggregate: per group, the ids of the k rows with the
  * highest sort value (ties broken by smaller id), as `array<bigint>`
  * best-first.
  *
  * The scale story vs the window-function formulation
  * (`row_number() OVER (... ORDER BY v DESC) <= k`): a window must
  * shuffle AND SORT every row of every group; this aggregate keeps a
  * k-element heap per group, does map-side partial aggregation (each
  * partition contributes at most k candidates per group to the shuffle),
  * and never materializes a full sort. At 100 TB with millions of rows
  * per group that is the difference between a bounded-memory single pass
  * and a top-sized sort.
  *
  * TypedImperativeAggregate: the internal mutable-buffer aggregate API —
  * the same machinery behind collect_list/percentile — with explicit
  * buffer serialization for shuffle exchange.
  */
case class TopKAgg(
    sortValue: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, "k must be positive")

  // worst-first ordering so dequeue() evicts the current worst:
  // lower value is worse; on equal values the LARGER id is worse.
  private val worstFirst: Ordering[(Double, Long)] =
    Ordering.fromLessThan { (a, b) =>
      if (a._1 != b._1) a._1 < b._1 else a._2 > b._2
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst.reverse) // dequeue = worst

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val v = sortValue.eval(input)
    val i = id.eval(input)
    if (v != null && i != null) {
      buf.enqueue((v.asInstanceOf[Double], i.asInstanceOf[Long]))
      if (buf.size > k) buf.dequeue()
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach { e =>
      buf.enqueue(e)
      if (buf.size > k) buf.dequeue()
    }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val bestFirst = buf.toSeq.sorted(worstFirst.reverse) // best -> worst
    new GenericArrayData(bestFirst.map(_._2))
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (v, i) => out.writeDouble(v); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach(_ => buf.enqueue((in.readDouble(), in.readLong())))
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(sortValue, id)
  override def prettyName: String = "graft_topk"

  override def withNewMutableAggBufferOffset(offset: Int): TopKAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(sortValue = newChildren(0), id = newChildren(1))
}

object TopKAgg {
  /** Registry descriptor: `graft_topk(sort_value, id, k)` with literal k. */
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_topk"),
    new ExpressionInfo(classOf[TopKAgg].getCanonicalName, "graft_topk"),
    (children: Seq[Expression]) => {
      val k = children(2) match {
        case Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"graft_topk k must be an integer literal, got $other")
      }
      TopKAgg(children(0), children(1), k)
    },
  )
}
