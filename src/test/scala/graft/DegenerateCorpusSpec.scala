package graft

import graft.pipeline.PipelineOps
import org.scalatest.funsuite.AnyFunSuite

/** The degenerate-corpus law (VERDICT r11 #3): every pipeline operator, fed
  * a 0-row and a 1-row corpus, either returns a WELL-FORMED result (the
  * schema it always has — possibly empty) or raises a NAMED require — never
  * a raw Spark internal (AnalysisException from a missing view, NPE, divide
  * by zero, empty-collection head, …).
  *
  * Real pipelines hit this constantly: an empty ingest day, a partition
  * with one surviving document after an aggressive filter, a fresh tenant.
  * At 1000 executors a raw internal exception from deep inside a stage is
  * an hours-long debugging session; a named require is a one-line fix.
  *
  * The corpora are the REAL gate tables truncated with limit(n), so every
  * column an operator touches exists with the production schema.
  */
class DegenerateCorpusSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val srcDir = "/root/testdata/sf0.001"
  private val tables = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  private def buildDir(n: Int, tag: String): String = {
    val out = s"/tmp/graft-degenerate/$tag"
    for (t <- tables) {
      val src = s"$srcDir/$t.parquet"
      if (new java.io.File(src).exists)
        spark.read.parquet(src).limit(n)
          .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    out
  }

  private lazy val emptyDir = buildDir(0, "empty")
  private lazy val oneDir = buildDir(1, "one")

  /** A named, intentional refusal: require/IllegalState with a real message.
    * Everything else — raw Spark exceptions, NPEs, empty-head, arithmetic —
    * is the failure class this spec exists to eliminate. */
  private def isNamedRefusal(e: Throwable): Boolean = e match {
    case _: IllegalArgumentException | _: IllegalStateException |
         _: UnsupportedOperationException =>
      e.getMessage != null && e.getMessage.trim.nonEmpty
    case _ => false
  }

  private val keys = PipelineOps.queries.keys.toSeq.sorted

  for ((tag, dirOf) <- Seq[(String, () => String)](
         "0-row" -> (() => emptyDir), "1-row" -> (() => oneDir));
       key <- keys) {
    test(s"$key on a $tag corpus: well-formed result or a named require") {
      val d = dirOf()
      try {
        val df = PipelineOps.queries(key)(spark, d)
        df.collect() // force execution — planning alone proves nothing
        assert(df.schema.fields.nonEmpty, s"$key returned a zero-column frame")
      } catch {
        case e: Throwable if isNamedRefusal(e) => // acceptable: loud and named
        case e: Throwable =>
          fail(s"$key on a $tag corpus died with a raw ${e.getClass.getName}: " +
            s"${Option(e.getMessage).getOrElse("").linesIterator.take(3).mkString(" | ")}")
      }
    }
  }
}
