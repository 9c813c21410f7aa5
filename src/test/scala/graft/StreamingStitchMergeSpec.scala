package graft

import graft.streaming.StitchMergeStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.{DataFrame, functions => F}
import org.scalatest.funsuite.AnyFunSuite

/** Streaming stitch-merge (VERDICT r10 #4): the batch degradation must be
  * row-identical to batch p76 (plant off) on the same relation; the
  * streamed merges must carry p76's exact signature/word arithmetic;
  * within a micro-batch the tie gate is p76's simultaneous double-rank;
  * across batches FIRST-SEEN WINS within the claim horizon (the
  * documented DedupStream trade), and claims EXPIRE past it. */
class StreamingStitchMergeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def ws(tag: String, a: Int, b: Int) =
    (a to b).map(i => s"$tag$i").mkString(" ")

  private val textA = ws("a", 1, 12)          // suffix = a5..a12
  private val sfxA = ws("a", 5, 12)
  private val textB = sfxA + " " + ws("b", 1, 3) // continues A

  private def md5hex(s: String) = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }
  /** p76's merge arithmetic in JVM form: a + (b minus its K-word prefix). */
  private def mergedOf(a: String, b: String): (String, Long) = {
    val k = graft.pipeline.PipelineOps.BoundaryK
    val bw = b.trim.split("\\s+")
    val m = if (bw.length > k) a + " " + bw.drop(k).mkString(" ") else a
    (md5hex(m), a.trim.split("\\s+").length.toLong + bw.length - k)
  }

  test("batch degradation equals batch p76 (plant off) on the same relation") {
    import spark.implicits._
    val docs = Seq((1L, textA), (2L, textB), (3L, ws("c", 1, 12)))
      .toDF("doc_id", "text")
    val got = StitchMergeStream.mergedBatch(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
    docs.createOrReplaceTempView("documents")
    spark.conf.set("spark.graft.plantFixtures", "false")
    try {
      val p76 = pipeline.PipelineOps.queries("p76_stitch_merge")(spark, "unused")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
      assert(got == p76 && got.nonEmpty, s"mergedBatch $got != batch p76 $p76")
      val (sig, mw) = mergedOf(textA, textB)
      assert(got == Set((1L, 2L, sig, mw)), s"merge arithmetic drifted: $got")
    } finally spark.conf.unset("spark.graft.plantFixtures")
  }

  test("streamed merges: p76 gate within a batch, first-seen claims across, horizon re-admit") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val m = 60L * 1000000 // one minute in µs
    val B = 1000 * m
    val in = MemoryStream[StreamingStitchMergeSpec.D]
    val docs = in.toDS()
      .select($"doc_id", $"text", F.timestamp_micros($"tus").as("ts"))
    // the doc store grows as the spec "ingests" (the pipeline's sink role)
    val store = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    def feed(rows: (Long, String, Long)*): Unit = {
      rows.foreach { case (id, t, _) => store += (id -> t) }
      in.addData(rows.map { case (id, t, tus) =>
        StreamingStitchMergeSpec.D(id, t, tus) }: _*)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String, Long)]
    val q = StitchMergeStream.start(docs, "text", "doc_id", "ts",
      watermarkDelay = "5 minutes", docStore = () => {
        import spark.implicits._
        store.toSeq.toDF("doc_id", "text")
      },
      claimHorizonMs = 5L * 60 * 1000,
      sink = df => out ++= df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))))
    try {
      // two continuations of A arrive in the SAME batch: the p76 gate must
      // pick the MINIMUM continuation id (3, not 5), not arrival order
      feed((1L, textA, B))
      q.processAllAvailable()
      feed((5L, sfxA + " later continuation words", B + m),
           (3L, textB, B + m))
      q.processAllAvailable()
      val (sig13, mw13) = mergedOf(textA, textB)
      assert(out.toSet == Set((1L, 3L, sig13, mw13)),
        s"within-batch gate must pick min continuation: ${out.toSet}")
      // a later, SMALLER continuation cannot steal a claimed suffix:
      // first-seen wins within the horizon (documented batch divergence —
      // batch p76 would have re-picked the global min 2)
      feed((2L, sfxA + " even earlier id", B + 2 * m))
      q.processAllAvailable()
      assert(out.size == 1, s"claimed a_id must not re-merge in horizon: $out")
      // past the claim horizon the claim expires: a re-crawl of doc 1
      // re-admits (the BoundaryOverlapStream eviction trade) and stitches
      // to a fresh continuation
      feed((99L, ws("z", 1, 12), B + 120 * m)) // advances the watermark
      q.processAllAvailable()
      feed((1L, textA, B + 121 * m))
      q.processAllAvailable()
      feed((7L, sfxA + " post horizon continuation", B + 122 * m))
      q.processAllAvailable()
      val (sig17, mw17) = mergedOf(textA, sfxA + " post horizon continuation")
      assert(out.toSet == Set((1L, 3L, sig13, mw13), (1L, 7L, sig17, mw17)),
        s"claim must expire past the horizon: ${out.toSet}")
    } finally q.stop()
  }

  test("a store-lag pair is retried, not silently dropped; a duplicate store doc_id emits one winner") {
    // r11 ADVICE: p76MergeOn's inner joins to the store dropped a completed
    // stitch pair whose doc text had not yet landed (consumed, never
    // retried); and a re-crawled duplicate doc_id fanned out duplicate
    // winner rows. The pair must wait for the store; the store must dedup.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val m = 60L * 1000000
    val B = 1000 * m
    val in = MemoryStream[StreamingStitchMergeSpec.D]
    val docs = in.toDS()
      .select($"doc_id", $"text", F.timestamp_micros($"tus").as("ts"))
    val store = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String, Long)]
    val q = StitchMergeStream.start(docs, "text", "doc_id", "ts",
      watermarkDelay = "5 minutes", docStore = () => {
        import spark.implicits._
        store.toSeq.toDF("doc_id", "text")
      },
      claimHorizonMs = 60L * 60 * 1000,
      sink = df => out ++= df.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))))
    try {
      // the pair (1,3) completes in the STREAM, but the store only has doc 1
      // (ingest lag) — the merge cannot run yet and must not be lost.
      // Doc 1 is stored TWICE (re-crawl, same text): still one winner row.
      store += (1L -> textA); store += (1L -> textA)
      in.addData(StreamingStitchMergeSpec.D(1L, textA, B),
        StreamingStitchMergeSpec.D(3L, textB, B + m))
      q.processAllAvailable()
      assert(out.isEmpty, s"merge must wait for the store, got $out")
      // the store catches up; an unrelated doc triggers the next batch
      store += (3L -> textB)
      in.addData(StreamingStitchMergeSpec.D(50L, ws("q", 1, 12), B + 2 * m))
      q.processAllAvailable()
      val (sig13, mw13) = mergedOf(textA, textB)
      assert(out.toSeq == Seq((1L, 3L, sig13, mw13)),
        s"retried pair must merge exactly once (no dup-store fanout): $out")
    } finally q.stop()
  }

  test("input validation: batch input to start and streaming misuse are named errors") {
    import spark.implicits._
    val static = Seq((1L, textA)).toDF("doc_id", "text")
      .withColumn("ts", F.timestamp_micros(F.lit(0L)))
    val e = intercept[IllegalArgumentException](
      StitchMergeStream.start(static, "text", "doc_id", "ts", "5 minutes",
        () => static, 1000L, _ => ()))
    assert(e.getMessage.contains("streaming input"))
  }
}

object StreamingStitchMergeSpec {
  final case class D(doc_id: Long, text: String, tus: Long)
}
