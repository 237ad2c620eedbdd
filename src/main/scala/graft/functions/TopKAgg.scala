package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Bounded top-k accumulator: a worst-first heap of (score, id) capped at
  * k entries. Order: higher score wins; ties break by smaller id (the
  * deterministic tiebreak every ranking query in this engine uses —
  * reference `total_cmp` keeps original doc order,
  * /root/reference/src/similarity.rs:31-40). */
final class TopKBuffer(val k: Int) {
  // head = the WORST kept entry (lowest score, then largest id) so a
  // better candidate evicts it in O(log k)
  val heap = new java.util.PriorityQueue[TopKBuffer.Entry](k + 1,
    (a: TopKBuffer.Entry, b: TopKBuffer.Entry) =>
      if (a.score < b.score) -1
      else if (a.score > b.score) 1
      else java.lang.Long.compare(b.id, a.id))

  def add(score: Double, id: Long): Unit = {
    if (heap.size < k) heap.add(new TopKBuffer.Entry(score, id))
    else {
      val worst = heap.peek()
      if (score > worst.score || (score == worst.score && id < worst.id)) {
        heap.poll()
        heap.add(new TopKBuffer.Entry(score, id))
      }
    }
  }

  /** Entries best-first: score desc, id asc. */
  def sorted: Array[TopKBuffer.Entry] = {
    val arr = heap.toArray(new Array[TopKBuffer.Entry](heap.size))
    java.util.Arrays.sort(arr, (a: TopKBuffer.Entry, b: TopKBuffer.Entry) =>
      if (a.score > b.score) -1
      else if (a.score < b.score) 1
      else java.lang.Long.compare(a.id, b.id))
    arr
  }
}
object TopKBuffer {
  final class Entry(val score: Double, val id: Long)
}

/** Partial top-k aggregate — the scale-safe replacement for
  * `row_number() OVER (PARTITION BY qid) <= k`, which shuffles the whole
  * scored corpus×queries product and funnels each query's entire scored
  * corpus through one reducer. As a TypedImperativeAggregate, map-side
  * partial aggregation keeps a k-bounded heap per group, so each map task
  * emits at most k entries per query BEFORE the exchange: the shuffle
  * carries ≤ k·numPartitions rows per query instead of the full corpus.
  * (The optional-polish aggregate SURVEY.md §2.8 names.)
  *
  * Returns `array<struct<id bigint, score double>>` sorted best-first
  * (score desc, id asc — the engine-wide deterministic tiebreak). */
case class TopKAgg(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    val it = other.heap.iterator()
    while (it.hasNext) { val e = it.next(); buf.add(e.score, e.id) }
    buf
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(
      buf.sorted.map(e => InternalRow(e.id, e.score)).asInstanceOf[Array[Any]])

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val arr = buf.sorted
    val bb = ByteBuffer.allocate(8 + 16 * arr.length)
    bb.putInt(buf.k)
    bb.putInt(arr.length)
    arr.foreach { e => bb.putDouble(e.score); bb.putLong(e.id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { buf.add(bb.getDouble(), bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}

object TopKAgg {
  /** `top_k(score, id, k)` as an aggregate Column. */
  def topK(score: Column, id: Column, k: Int): Column =
    Bridge.column(
      TopKAgg(Bridge.expression(score), Bridge.expression(id), k)
        .toAggregateExpression())
}
