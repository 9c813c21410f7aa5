package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.{functions => F}

/** Measurement tool (optimization r16, VERDICT r15 #8): the streaming
  * operators had never been through a perf A/B. Feed the sf corpus through
  * MemoryStream in fixed-size micro-batches (one processAllAvailable per
  * batch — the ingest cadence a real feed pays) and time the whole drain,
  * A/B'ing the state-store partition count: for a stateful streaming query
  * `spark.sql.shuffle.partitions` AT QUERY START fixes the number of state
  * store instances (it is pinned into the checkpoint thereafter), so it is
  * THE sizing lever guide §5 names for stream state.
  *
  * Usage: runMain graft.StreamProbe <runs> <parts,...> <op,...>
  *   ops: lsh (LshPairsStream band-bucket state, flatMapGroupsWithState)
  *        cdc (CdcChunkStream dropDuplicatesWithinWatermark state)
  */
object StreamProbe {
  final case class Doc(doc_id: Long, text: String, ts: java.sql.Timestamp)

  def main(args: Array[String]): Unit = {
    val runs = args(0).toInt
    val partArms = args(1).split(",").toSeq
    val ops = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val batches = sys.env.getOrElse("SPARK_GRAFT_STREAM_BATCHES", "10").toInt
    val spark = Graft.localSession(cpus)
    import spark.implicits._

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(F.col("doc_id"), F.col("text"))
      .withColumn("ts", F.expr("timestamp_seconds(1700000000 + doc_id)"))
      .as[Doc].collect().sortBy(_.doc_id)
    val chunks = docs.grouped(math.max(1, docs.length / batches)).toSeq
    System.err.println(s"[stream-probe] ${docs.length} docs, ${chunks.size} micro-batches")

    def timeOnce(op: String, parts: String): Double = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      val in = MemoryStream[Doc](spark)
      val out = op match {
        case "lsh" =>
          graft.streaming.LshPairsStream
            .pairs(in.toDF(), "text", "doc_id", "ts").toDF()
        case "cdc" =>
          graft.streaming.CdcChunkStream
            .novelChunks(in.toDF(), "text", "ts", "1 hour")
        case other => throw new IllegalArgumentException(s"unknown op $other")
      }
      val q = out.writeStream.format("noop").outputMode("append").start()
      val t0 = System.nanoTime()
      try {
        chunks.foreach { c => in.addData(c.toSeq); q.processAllAvailable() }
        (System.nanoTime() - t0) / 1e9
      } finally q.stop()
    }

    // warm each (op, arm) once
    for (op <- ops; p <- partArms)
      try timeOnce(op, p)
      catch { case e: Throwable =>
        System.err.println(s"[stream-probe] warm $op@$p failed: ${e.getMessage}") }
    val acc = scala.collection.mutable.Map.empty[(String, String), Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (r <- 1 to runs; op <- ops; p <- partArms) {
      val d = timeOnce(op, p)
      acc((op, p)) = acc((op, p)) :+ d
      System.err.println(f"[stream-probe] run=$r $op%-4s parts=$p%-4s $d%7.3f s")
    }
    println("op,parts,median,min,max,n")
    for (op <- ops; p <- partArms) {
      val v = acc((op, p)).sorted
      if (v.nonEmpty)
        println(f"$op,$p,${v(v.size / 2)}%.3f,${v.head}%.3f,${v.last}%.3f,${v.size}")
    }
    spark.stop()
  }
}
