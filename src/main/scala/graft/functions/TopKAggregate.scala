package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** Per-group top-k by (score desc, id asc) as a typed imperative
  * aggregate with a bounded heap.
  *
  * The declarative alternative — `row_number()` over
  * `(partition by g order by score desc, id)` then `rank <= k` — must
  * SORT every group's full candidate list (all-pairs ANN: n·(n−1) rows)
  * before the group-limit kicks in; the measured q20 profile spent ~10s
  * of 10.9s in those sorts. This aggregate keeps k entries per group in
  * a min-heap: O(n log k) with no full sort, partial aggregation
  * (map-side top-k) before the shuffle, and only k rows per group ever
  * cross the wire.
  *
  * Output: array<struct<id, score, rank>> ordered by rank — `inline` it
  * to rows. Ordering ties break on id asc, matching the window variant
  * exactly, so oracle results are unchanged.
  *
  * NaN scores: the Ordering negation ranks NaN WORST (it falls out of
  * any contested top-k), where a SQL `ORDER BY score DESC` window ranks
  * NaN FIRST — the one ordering this aggregate does not mirror. Callers
  * must not feed NaN: the engine's score chains guarantee it (cosine
  * defines zero-norm as 0.0, distances quantize to longs before
  * negation), so the divergence is unreachable from gated operators. */
case class TopKAggregate(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]]
  with ImplicitCastInputTypes {

  require(k > 0, "k must be positive")

  // analysis-time contract: int scores/ids get cast in, anything
  // non-numeric is rejected with a proper AnalysisException instead of a
  // mid-execution ClassCastException
  override def inputTypes: Seq[DataType] = Seq(DoubleType, LongType)

  // min-heap: head = the WORST kept entry (lowest score, then highest id)
  private val worstFirst: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, i) => (-s, i) }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)], input: InternalRow):
      mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      add(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    }
    buf
  }

  private def add(
      buf: mutable.PriorityQueue[(Double, Long)], e: (Double, Long)): Unit = {
    if (buf.size < k) buf.enqueue(e)
    else if (worstFirst.compare(e, buf.head) < 0) { buf.dequeue(); buf.enqueue(e) }
  }

  override def merge(
      a: mutable.PriorityQueue[(Double, Long)],
      b: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b.foreach(add(a, _))
    a
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toArray.sortBy { case (s, i) => (-s, i) }
    new GenericArrayData(sorted.zipWithIndex.map { case ((s, i), r) =>
      InternalRow(i, s, r + 1)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    (0 until n).foreach { _ =>
      val s = in.readDouble(); val i = in.readLong(); buf.enqueue((s, i))
    }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false),
    StructField("rank", IntegerType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(score, id)
  override def prettyName: String = "top_k"

  override def withNewMutableAggBufferOffset(offset: Int): TopKAggregate =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKAggregate =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKAggregate {
  /** Column API: `top_k(score, id, k)` → array<struct<id,score,rank>>. */
  def top_k(score: Column, id: Column, k: Int): Column =
    ColumnShim.column(
      TopKAggregate(ColumnShim.expression(score), ColumnShim.expression(id), k)
        .toAggregateExpression())
}
