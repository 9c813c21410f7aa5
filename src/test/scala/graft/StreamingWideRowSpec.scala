package graft

import graft.streaming.{CdcChunkStream, LshPairsStream, ParagraphDedupStream}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.funsuite.AnyFunSuite

/** The streaming wide-row law (VERDICT r13 #6) — WideRowSpec's monsters
  * arriving MID-STREAM. The batch spec proves the explode family holds its
  * linear tiling laws on a 10^6-token document; this spec proves the state
  * stores do: one pathological document must grow each operator's state by
  * its DOCUMENTED per-key unit, never by token count.
  *
  *  - LshPairsStream: a document is 8 band-bucket entries (16 minhashes,
  *    2 rows per band), whatever its length — the monster's state delta
  *    is <= 8 rows, identical to a 10-token doc's.
  *  - CdcChunkStream: state is one row per DISTINCT chunk signature. The
  *    varied monster's token stream is periodic (vocab 37 x salt 997 =
  *    36,889), so its ~125k chunk OCCURRENCES (divisor 8) collapse to
  *    ~4.6k distinct chunks — state must sit at the distinct count, not
  *    the occurrence count, and the spam twins add at most 2 rows between
  *    them (one hot chunk signature).
  *  - ParagraphDedupStream: one marker per distinct paragraph hash — the
  *    varied monster plants exactly its blank-line paragraph count
  *    (~2,500), and the spam TWIN adds zero new markers while its
  *    paragraph is marked keep=false.
  *
  * State is read from StreamingQueryProgress.stateOperators.numRowsTotal
  * (the store's own row count after the batch), so these are executable
  * bounds, not code-reading claims.
  */
class StreamingWideRowSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val NTok = 1000000

  // WideRowSpec's varied monster verbatim: mostly-distinct tokens (period
  // lcm(37, 997) = 36,889), a newline every 20 tokens, a blank line every
  // 400 — and the same .trim so the tiling laws stay exact
  private lazy val varied: String = {
    val sb = new StringBuilder(NTok * 8)
    var i = 0
    while (i < NTok) {
      sb.append('w').append(i % 37).append('s').append(i % 997)
      i += 1
      if (i % 400 == 0) sb.append("\n\n")
      else if (i % 20 == 0) sb.append('\n')
      else sb.append(' ')
    }
    sb.toString.trim
  }
  private lazy val spam: String = ("spam " * NTok).trim

  private def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000L)

  /** State rows after the most recent batch that reported any. */
  private def stateRows(q: StreamingQuery): Long = {
    q.processAllAvailable()
    q.recentProgress.reverse.collectFirst {
      case p if p.stateOperators.nonEmpty && p.stateOperators.exists(_.numRowsTotal >= 0) =>
        p.stateOperators.map(_.numRowsTotal).sum
    }.getOrElse(-1L)
  }

  test("LshPairsStream: a 10^6-token monster adds at most 8 band-bucket rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, java.sql.Timestamp)]
    val docs = in.toDS().toDF("doc_id", "text", "ts")
    val q = LshPairsStream.pairs(docs, "text", "doc_id", "ts",
        watermarkDelay = "365 days")
      .writeStream.format("memory").queryName("widerow_lsh")
      .outputMode("append").start()
    try {
      // five ordinary docs first: state = at most 8 buckets each (16
      // minhashes at 2 rows per band = 8 band keys per document)
      val ordinary = (1L to 5L).map(i =>
        (i, s"ordinary document number $i with its own words entirely w$i", ts(i)))
      in.addData(ordinary)
      val afterOrdinary = stateRows(q)
      assert(afterOrdinary > 0 && afterOrdinary <= 8L * 5,
        s"5 docs hold at most 40 band buckets, got $afterOrdinary")
      // the monster: 10^6 tokens, ONE document — its sig is 16 minhashes,
      // so its state footprint is the same <= 8 buckets as any doc's
      in.addData(Seq((9001L, varied, ts(10))))
      val afterMonster = stateRows(q)
      assert(afterMonster - afterOrdinary <= 8L,
        s"monster added ${afterMonster - afterOrdinary} bucket rows — " +
          "state must grow per band, never per token")
      // spam twins share every band: the twin lands in EXISTING buckets
      // (resident append), adding at most 8 rows for the pair of them
      in.addData(Seq((9002L, spam, ts(11)))); q.processAllAvailable()
      val afterSpam = stateRows(q)
      in.addData(Seq((9003L, spam, ts(12))))
      val afterTwin = stateRows(q)
      assert(afterSpam - afterMonster <= 8L, "first spam doc: <= 8 new buckets")
      assert(afterTwin == afterSpam,
        s"identical twin must land in existing buckets, state $afterSpam -> $afterTwin")
      // and the twin actually paired — the hot key rolled into ONE pair
      // per band (full 16/16 minhash agreement), not a within-bucket
      // explosion
      val pairs = spark.table("widerow_lsh")
        .where("ida = 9002 AND idb = 9003").collect()
      assert(pairs.length == 8, s"spam twins pair on all 8 bands, got ${pairs.length}")
      assert(pairs.forall(_.getInt(3) == 16), "twins agree on all 16 minhashes")
    } finally q.stop()
  }

  test("CdcChunkStream: monster state sits at DISTINCT chunks, spam twins add <= 2 rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, java.sql.Timestamp)]
    val docs = in.toDS().toDF("doc_id", "text", "ts")
    val q = CdcChunkStream.novelChunks(docs, "text", "ts", watermarkDelay = "365 days")
      .writeStream.format("memory").queryName("widerow_cdc")
      .outputMode("append").start()
    try {
      in.addData(Seq((9001L, varied, ts(1))))
      val afterMonster = stateRows(q)
      // ~125k chunk occurrences (divisor 8) from a periodic token stream:
      // distinct chunks = one period's boundary count (~36,889 / 8) plus
      // edges. The executable law: state is an order of magnitude below
      // the occurrence count and five below the token count.
      assert(afterMonster >= 2000 && afterMonster <= 9000,
        s"varied monster distinct-chunk state $afterMonster outside the periodic-law band " +
          "(~4.6k expected; ~125k would mean per-occurrence state, 10^6 per-token)")
      val novelMonster = spark.table("widerow_cdc").count()
      assert(novelMonster == afterMonster,
        s"novel-chunk output ($novelMonster) must equal distinct-state rows ($afterMonster)")
      // spam: every token identical, so whatever the boundary rule does it
      // yields ONE distinct chunk text — the twins add at most 2 state
      // rows between them (1 signature + watermark bookkeeping slack)
      in.addData(Seq((9002L, spam, ts(2)))); q.processAllAvailable()
      in.addData(Seq((9003L, spam, ts(3))))
      val afterTwins = stateRows(q)
      assert(afterTwins - afterMonster <= 2L,
        s"spam twins added ${afterTwins - afterMonster} chunk-state rows — " +
          "a hot chunk signature must roll up, never multiply")
      val novelSpam = spark.table("widerow_cdc").where("doc_id >= 9002").count()
      assert(novelSpam <= 2L, s"spam contributed $novelSpam novel chunks, expected <= 2")
    } finally q.stop()
  }

  test("ParagraphDedupStream: one marker per distinct paragraph; the twin adds none") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the exact oracle for the monster's marker count comes from the
    // string itself — the same blank-line split the operator uses
    val expectedParas = varied.split("\n\n").distinct.length.toLong
    assert(expectedParas >= 2000 && expectedParas <= 3000, s"fixture drifted: $expectedParas")
    val in = MemoryStream[(Long, String, java.sql.Timestamp)]
    val docs = in.toDS().toDF("doc_id", "text", "ts")
    val q = ParagraphDedupStream.dedupParagraphs(docs, "doc_id", "text", "ts",
        watermarkDelay = "365 days")
      .writeStream.format("memory").queryName("widerow_para")
      .outputMode("append").start()
    try {
      in.addData(Seq((9001L, varied, ts(1))))
      val afterMonster = stateRows(q)
      assert(afterMonster == expectedParas,
        s"state must hold exactly one marker per distinct paragraph: " +
          s"expected $expectedParas, got $afterMonster")
      in.addData(Seq((9002L, spam, ts(2)))); q.processAllAvailable()
      val afterSpam = stateRows(q)
      assert(afterSpam == expectedParas + 1, s"spam adds its one paragraph marker, got $afterSpam")
      // the twin's single giant paragraph re-sights the existing marker:
      // ZERO state growth, and the occurrence is decided keep=false
      in.addData(Seq((9003L, spam, ts(3))))
      val afterTwin = stateRows(q)
      assert(afterTwin == afterSpam,
        s"twin paragraph must refresh, not duplicate, its marker: $afterSpam -> $afterTwin")
      val twinDecisions = spark.table("widerow_para")
        .where("doc_id = 9003").collect()
      assert(twinDecisions.length == 1 && !twinDecisions(0).getAs[Boolean]("keep"),
        "the twin's paragraph is one occurrence, marked keep=false")
    } finally q.stop()
  }
}
