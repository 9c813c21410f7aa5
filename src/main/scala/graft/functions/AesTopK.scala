package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** A-ES weighted top-k reservoir as a native Catalyst aggregate — the
  * mergeable form of p46's weighted sample (Efraimidis–Spirakis: keep the
  * k smallest exponential race keys -ln(u)/w; see
  * pipeline/PipelineOps.scala p46).
  *
  * Why an aggregate and not a window: a `TypedImperativeAggregate` buffer
  * builds partial top-k reservoirs MAP-SIDE and merges them associatively
  * in the exchange — one shuffle, no per-stratum sort at all, which beats
  * even p46's salted two-stage window at scale; and the SAME merge is what
  * a streaming groupBy aggregation applies to its state store, so the
  * operator runs unchanged on an unbounded stream with O(k) state per
  * group forever (the [[GraftKmv]] state contract — bounded by SKETCH
  * SIZE, not time). Top-k(merge of partial top-ks) = top-k(all), so the
  * result is identical to the window formulation — asserted against the
  * oracle-gated p46 in StreamingWeightedReservoirSpec.
  *
  * State is a capped sorted set ordered by (key, doc_id) — the exact p46
  * tiebreak; identical (key, id, weight) triples dedup on insert, so
  * re-feeding a row is idempotent (re-ingest-safe). Serialization is the
  * raw (double, long, long) array.
  *
  * Output: array of (doc_id, weight, key_u) structs in rank order, key_u
  * floor-rounded at 1e-6 exactly as p46 emits it.
  */
case class GraftAesTopK(first: Expression, second: Expression, third: Expression,
                        k: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[GraftAesTopK.Pick]]
  with TernaryLike[Expression] {

  import GraftAesTopK.Pick

  require(k >= 1, s"graft_aes_topk: k must be >= 1, got $k")

  // analysis-time contract (the injected SQL surface makes this user-facing):
  // a wrong-typed argument fails analysis with a named error, never an
  // executor ClassCastException inside update() — the sibling kernels' rule
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (DoubleType, LongType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (a, b, c) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_aes_topk expects (double, bigint, bigint), got " +
            s"(${a.simpleString}, ${b.simpleString}, ${c.simpleString})")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("weight", LongType, nullable = false),
    StructField("key_u", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_aes_topk"

  override def createAggregationBuffer(): java.util.TreeSet[Pick] =
    new java.util.TreeSet[Pick](GraftAesTopK.order)

  private def insert(buf: java.util.TreeSet[Pick], p: Pick): Unit = {
    if (buf.size < k) { buf.add(p); () }
    else if (GraftAesTopK.order.compare(p, buf.last()) < 0) {
      if (buf.add(p)) { buf.pollLast(); () }
    }
  }

  override def update(buf: java.util.TreeSet[Pick],
                      input: InternalRow): java.util.TreeSet[Pick] = {
    val key = first.eval(input); val id = second.eval(input); val w = third.eval(input)
    if (key != null && id != null && w != null)
      insert(buf, Pick(key.asInstanceOf[Double],
        id.asInstanceOf[Long], w.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: java.util.TreeSet[Pick],
                     other: java.util.TreeSet[Pick]): java.util.TreeSet[Pick] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[Pick]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) {
      val p = it.next()
      out(i) = InternalRow(p.docId, p.weight,
        math.floor(p.key * 1e6 + 0.5).toLong)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[Pick]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(24 * buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val p = it.next()
      bb.putDouble(p.key); bb.putLong(p.docId); bb.putLong(p.weight)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Pick] = {
    val buf = createAggregationBuffer()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 24)
      buf.add(Pick(bb.getDouble(), bb.getLong(), bb.getLong()))
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): GraftAesTopK =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): GraftAesTopK =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): GraftAesTopK =
    copy(first = f, second = s, third = t)
}

object GraftAesTopK {
  final case class Pick(key: Double, docId: Long, weight: Long)

  /** (key, doc_id) ascending — p46's exact selection order and tiebreak. */
  val order: java.util.Comparator[Pick] = new java.util.Comparator[Pick] {
    override def compare(a: Pick, b: Pick): Int = {
      val c = java.lang.Double.compare(a.key, b.key)
      if (c != 0) c else java.lang.Long.compare(a.docId, b.docId)
    }
  }
}
