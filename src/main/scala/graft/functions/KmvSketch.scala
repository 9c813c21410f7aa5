package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-count sketch as a native Catalyst
  * aggregate — the mergeable sketch shape (`TypedImperativeAggregate`:
  * partial sketches build map-side, merge associatively in the exchange,
  * exactly like any built-in agg).
  *
  * Why KMV and not HLL here: fed an engine-portable hash (the md5-prefix
  * 32-bit family every operator shares), the k smallest DISTINCT hash
  * values are a deterministic SET — so the estimate is bit-identical on
  * any engine, giving an approximate algorithm an EXACT cross-engine
  * oracle (DuckDB recomputes the same k-minimums with list_sort). Spark's
  * own approx_count_distinct is an HLL whose buckets are
  * engine/implementation-specific and can't be oracle-gated.
  *
  * Estimator (Bar-Yossef et al., the standard KMV form): with U(k) =
  * h_k / 2^32 the k-th smallest normalized hash, E = (k-1) / U(k) —
  * computed in exact integer arithmetic `(k-1)·2^32 div h_k`. When fewer
  * than k distinct hashes exist the sketch IS the distinct set and the
  * exact count is returned.
  *
  * State is O(k) longs per group (a capped sorted set); update is a
  * membership probe + possible insert/evict-max; merge inserts the other
  * side's members. Serialization is the raw long array.
  */
case class GraftKmv(child: Expression, k: Int,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2, s"graft_kmv: k must be >= 2, got $k")

  private val HashSpace = 1L << 32

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last()) { if (buf.add(h)) { buf.pollLast(); () } }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      require(h >= 0 && h < HashSpace,
        s"graft_kmv expects 32-bit-range hashes, got $h")
      insert(buf, h)
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toLong
    else (k - 1).toLong * HashSpace / buf.last()

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val buf = createAggregationBuffer()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 8) buf.add(bb.getLong())
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): GraftKmv =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): GraftKmv =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): GraftKmv =
    copy(child = newChild)
}
