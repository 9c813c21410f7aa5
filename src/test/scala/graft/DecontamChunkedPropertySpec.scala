package graft

import graft.pipeline.PipelineOps
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property test (VERDICT r6 stretch #10): for random bucket counts
  * B ∈ [2, 64] over generated adversarial-overlap corpora, the chunked
  * p21 path (including its salt sub-split when B < shuffle partitions)
  * is row-identical to the fast single-array path and to a Scala
  * brute-force ground truth. A tiny vocabulary forces repeated grams
  * within documents (array_distinct stress) and every corpus embeds
  * verbatim eval slices into training docs (guaranteed contamination);
  * fixed seeds, like PrinterPropertySpec (no scalatestplus bridge in the
  * offline deps). */
class DecontamChunkedPropertySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val vocab = Vector("va", "vb", "vc", "vd", "ve")

  private case class Corpus(docs: Seq[(Long, Seq[String])], buckets: Int)

  private val wordsGen: Gen[Seq[String]] =
    Gen.choose(8, 40).flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab)))

  private val corpusGen: Gen[Corpus] = for {
    buckets <- Gen.choose(2, 64)
    nEval <- Gen.choose(2, 5)
    nTrain <- Gen.choose(6, 14)
    evalDocs <- Gen.listOfN(nEval, wordsGen)
    trainBase <- Gen.listOfN(nTrain, wordsGen)
    // each training doc may embed a verbatim eval slice (>= 8 words → at
    // least one shared 8-gram); the first always does, so every corpus has
    // real contamination to find
    embeds <- Gen.listOfN(nTrain, Gen.option(Gen.choose(0, nEval - 1)))
    sliceLen <- Gen.choose(8, 20)
  } yield {
    val eval = evalDocs.zipWithIndex.map { case (ws, i) => (i.toLong, ws) }
    val train = trainBase.zipWithIndex.map { case (ws, i) =>
      val embed = if (i == 0) Some(0) else embeds(i)
      val withSlice = embed match {
        case Some(e) =>
          val src = evalDocs(e)
          val slice = src.take(math.min(sliceLen, src.length))
          ws.take(ws.length / 2) ++ slice ++ ws.drop(ws.length / 2)
        case None => ws
      }
      ((20 + i).toLong, withSlice)
    }
    Corpus(eval ++ train, buckets)
  }

  private def bruteForce(docs: Seq[(Long, Seq[String])]): Map[Long, Long] = {
    def grams(ws: Seq[String]) =
      ws.sliding(8).filter(_.length == 8).map(_.mkString(" ")).toSet
    val evalGrams = docs.filter(_._1 < 20).flatMap(d => grams(d._2)).toSet
    docs.filter(_._1 >= 20)
      .map { case (id, ws) => id -> grams(ws).count(evalGrams).toLong }
      .filter(_._2 > 0).toMap
  }

  for (seedVal <- Seq(11L, 22L, 33L, 44L, 55L)) {
    test(s"chunked path == fast path == brute force (seed $seedVal)") {
      import spark.implicits._
      val Corpus(docs, b) = corpusGen.pureApply(Gen.Parameters.default, Seed(seedVal))
      val expected = bruteForce(docs)
      assert(expected.nonEmpty, "generator must plant contamination")
      docs.map { case (id, ws) => (id, ws.mkString(" ")) }
        .toDF("doc_id", "text").createOrReplaceTempView("documents")
      def runWith(buckets: Int): Map[Long, Long] = {
        spark.conf.set("spark.graft.decontamBuckets", buckets.toString)
        try PipelineOps.p21RunOnView(spark).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        finally spark.conf.unset("spark.graft.decontamBuckets")
      }
      val fast = runWith(1)
      assert(fast == expected, s"fast path diverged (seed $seedVal): $fast vs $expected")
      val chunked = runWith(b)
      assert(chunked == expected,
        s"chunked path diverged (seed $seedVal, B=$b, salt=${PipelineOps.decontamSalt(spark, b)}): $chunked vs $expected")
    }
  }
}
