package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/**
 * Bounded max-heap of the k SMALLEST longs seen so far — the state of
 * [[TopKMinLongs]]. Memory is k longs regardless of input size; insert
 * is O(log k) and a no-op once the heap is full and the candidate is
 * not smaller than the current worst survivor.
 */
final class LongTopKHeap(val k: Int) {
  private[functions] val a = new Array[Long](k)
  private[functions] var n = 0

  /** Largest retained value (the eviction bar), only valid when full. */
  private def worst: Long = a(0)

  def insert(v: Long): Unit = {
    if (n < k) {
      a(n) = v; n += 1
      // sift up
      var i = n - 1
      while (i > 0 && a((i - 1) / 2) < a(i)) {
        val p = (i - 1) / 2
        val t = a(p); a(p) = a(i); a(i) = t
        i = p
      }
    } else if (v < worst) {
      a(0) = v
      // sift down
      var i = 0
      var cont = true
      while (cont) {
        val l = 2 * i + 1; val r = 2 * i + 2
        var m = i
        if (l < n && a(l) > a(m)) m = l
        if (r < n && a(r) > a(m)) m = r
        if (m == i) cont = false
        else { val t = a(m); a(m) = a(i); a(i) = t; i = m }
      }
    }
  }

  /** Retained values, ascending. */
  def sortedAsc: Array[Long] = {
    val out = java.util.Arrays.copyOf(a, n)
    java.util.Arrays.sort(out)
    out
  }
}

/**
 * Bounded-heap top-k aggregate: the k SMALLEST long values per group,
 * returned as an ascending array<long>. The scale property windows
 * cannot give: partial aggregation (ObjectHashAggregate) keeps at most
 * k longs per (task, group) map-side, so the shuffle carries
 * k × tasks rows per group instead of the whole corpus into one
 * group's partition — the bounded-heap shortlist a per-group
 * `row_number()` rank window materialises the entire group to compute.
 *
 * Callers encode a composite sort key into the long (e.g. the BQ
 * coarse pass packs `hamming << 40 | vec_id`, exactly the
 * (ham asc, vec_id asc) tie order) so one primitive comparison orders
 * the pair. Reference analogue: the shortlist-sized probe discipline
 * of the sstable index/cache split (reference index.rs, cache.rs) —
 * per-query work ∝ shortlist, never ∝ corpus.
 */
case class TopKMinLongs(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongTopKHeap] with UnaryLike[Expression] {

  require(k > 0, "k must be positive")

  override def prettyName: String = "graft_topk_min"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): LongTopKHeap = new LongTopKHeap(k)

  override def update(h: LongTopKHeap, row: InternalRow): LongTopKHeap = {
    val v = child.eval(row)
    if (v != null) h.insert(v.asInstanceOf[Long])
    h
  }

  override def merge(h: LongTopKHeap, o: LongTopKHeap): LongTopKHeap = {
    var i = 0
    while (i < o.n) { h.insert(o.a(i)); i += 1 }
    h
  }

  override def eval(h: LongTopKHeap): Any = new GenericArrayData(h.sortedAsc)

  override def serialize(h: LongTopKHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * h.n)
    bb.putInt(h.n)
    var i = 0
    while (i < h.n) { bb.putLong(h.a(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): LongTopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new LongTopKHeap(k)
    var i = 0
    while (i < n) { h.insert(bb.getLong); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKMinLongs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKMinLongs =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(newChild: Expression): TopKMinLongs =
    copy(child = newChild)
}

object TopKAgg {
  /** Column API for [[TopKMinLongs]]: ascending array of the k
    * smallest values of `c` per group. */
  def topkMinLongs(c: Column, k: Int): Column =
    ColumnBridge.column(
      TopKMinLongs(ColumnBridge.expression(c), k).toAggregateExpression())
}
