package graft

import graft.streaming.ParagraphDedupStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

/** Streaming paragraph keep-first dedup: the batch path must equal a JVM
  * keep-first reference (p63's mark law), the stream must agree with the
  * batch path when arrival order matches id order and nothing evicts,
  * every hash must keep EXACTLY one occurrence under shuffled batch
  * boundaries, and watermark-driven marker eviction must be real. */
class StreamingParagraphDedupSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Multi-paragraph corpus: unique lead, a shared block on every 3rd doc,
    * a per-doc ref paragraph. */
  private def corpusText(i: Long): String = {
    val shared = if (i % 3 == 0) "\n\nshared syndicated block" else ""
    s"lead paragraph $i$shared\n\nref $i"
  }

  private def jvmReference(ids: Seq[Long]): Map[(Long, Int), Boolean] = {
    val occ = ids.flatMap(i =>
      corpusText(i).split("\n\n").zipWithIndex.map { case (p, pos) => (i, pos, p) })
    val firstPk = occ.groupBy(_._3).map { case (p, os) =>
      p -> os.map(o => o._1 * 4294967296L + o._2).min
    }
    occ.map(o => (o._1, o._2) -> (o._1 * 4294967296L + o._2 == firstPk(o._3))).toMap
  }

  test("batch degradation equals the JVM keep-first reference; reassembly inverts the split") {
    import spark.implicits._
    val ids = (1L to 12L)
    val docs = ids.map(i => (i, corpusText(i),
      java.sql.Timestamp.valueOf("2022-01-01 00:00:00"))).toDF("doc_id", "text", "ts")
    val dec = ParagraphDedupStream.dedupParagraphs(docs, "doc_id", "text", "ts", "1 minute")
    val got = dec.collect().map(d => (d.doc_id, d.pos) -> d.keep).toMap
    assert(got == jvmReference(ids))
    // exactly one keeper per distinct paragraph
    val kept = dec.filter(_.keep).collect()
    assert(kept.map(_.para).distinct.length == kept.length)
    assert(kept.map(_.para).toSet ==
      ids.flatMap(i => corpusText(i).split("\n\n")).toSet)
    // reassembly: doc 3's shared block survives (first sighting), doc 6/9/12's drop
    val re = ParagraphDedupStream.reassemble(dec)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(re(3L) == ((3L, 0L, corpusText(3L))))
    assert(re(6L) == ((3L, 1L, "lead paragraph 6\n\nref 6")))
    assert(re(1L) == ((2L, 0L, corpusText(1L))))
  }

  test("input validation: missing columns are named errors") {
    import spark.implicits._
    val df = Seq((1L, "a", java.sql.Timestamp.valueOf("2022-01-01 00:00:00")))
      .toDF("doc_id", "text", "ts")
    val e = intercept[IllegalArgumentException](
      ParagraphDedupStream.dedupParagraphs(df.drop("ts"), "doc_id", "text", "ts", "1 minute"))
    assert(e.getMessage.contains("missing column 'ts'"))
  }

  import StreamingParagraphDedupSpec.D

  test("streamed in id order == batch decisions; shuffled batches keep exactly one per hash") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val m = 60L * 1000000 // one minute in µs
    val B = 1000 * m
    val ids = (1L to 12L)
    def drive(batches: Seq[Seq[Long]], name: String): Map[(Long, Int), Boolean] = {
      val in = MemoryStream[D]
      val docs = in.toDS()
        .select($"doc_id", $"text", F.timestamp_micros($"tus").as("ts"))
      val q = ParagraphDedupStream
        .dedupParagraphs(docs, "doc_id", "text", "ts", "10 hours")
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        batches.foreach { b =>
          in.addData(b.map(i => D(i, corpusText(i), B + i * m)))
          q.processAllAvailable()
        }
      } finally q.stop()
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getInt(1)) -> r.getBoolean(3)).toMap
    }
    // id-ordered batches, horizon >> spread: decisions equal the batch law
    val ordered = drive(Seq(Seq(1L, 2L, 3L), Seq(4L, 5L, 6L, 7L), Seq(8L), (9L to 12L)), "pd_ord")
    assert(ordered == jvmReference(ids))
    // shuffled batch boundaries: keeper may differ (arrival order wins) but
    // the LAW holds — every occurrence decided, exactly one keeper per hash
    val shuffled = drive(Seq(Seq(9L, 2L), Seq(12L, 3L, 6L), Seq(1L, 11L), Seq(4L, 5L, 7L, 8L, 10L)), "pd_shuf")
    val occCount = ids.map(i => corpusText(i).split("\n\n").length).sum
    assert(shuffled.size == occCount, "every occurrence must be decided")
    val keptByPara = ids.flatMap(i =>
      corpusText(i).split("\n\n").zipWithIndex.map { case (p, pos) => (p, shuffled((i, pos))) })
      .groupBy(_._1).map { case (p, xs) => p -> xs.count(_._2) }
    assert(keptByPara.values.forall(_ == 1),
      s"exactly one keeper per distinct paragraph: $keptByPara")
  }

  test("marker eviction is real: a duplicate beyond the horizon re-admits, inside it drops") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val m = 60L * 1000000
    val B = 1000 * m
    val in = MemoryStream[D]
    val docs = in.toDS()
      .select($"doc_id", $"text", F.timestamp_micros($"tus").as("ts"))
    val q = ParagraphDedupStream
      .dedupParagraphs(docs, "doc_id", "text", "ts", "5 minutes")
      .writeStream.format("memory").queryName("pd_evict").outputMode("append").start()
    try {
      def keeps = spark.table("pd_evict").collect()
        .map(r => (r.getLong(0), r.getInt(1)) -> r.getBoolean(3)).toMap
      in.addData(D(1, "same block\n\nref 1", B))
      q.processAllAvailable()
      assert(keeps((1L, 0)) && keeps((1L, 1)))
      // in-horizon duplicate: dropped
      in.addData(D(2, "same block\n\nref 2", B + 2 * m))
      q.processAllAvailable()
      assert(!keeps((2L, 0)) && keeps((2L, 1)))
      // advance the watermark far past the marker, then re-feed: re-admitted
      in.addData(D(3, "unrelated\n\nref 3", B + 200 * m))
      q.processAllAvailable()
      in.addData(D(4, "same block\n\nref 4", B + 201 * m))
      q.processAllAvailable()
      assert(keeps((4L, 0)),
        "post-eviction duplicate must re-admit (bounded state actually ages out)")
    } finally q.stop()
  }
}

object StreamingParagraphDedupSpec {
  final case class D(doc_id: Long, text: String, tus: Long)
}
