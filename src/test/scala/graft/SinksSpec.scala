package graft

import graft.pipeline.Sinks
import org.scalatest.funsuite.AnyFunSuite

/** Output-side scale properties on real data: bucketed tables join with
  * no exchange (the write-once/join-many amortization), and partitioned
  * shard writes prune on read. */
class SinksSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"
  private lazy val spark = TestSpark.spark

  test("bucketed tables join with NO shuffle exchange (co-located join)") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    Sinks.writeBucketed(docs.select(col("doc_id"), col("lang")), "graft_bkt_a", "doc_id", 4)
    Sinks.writeBucketed(docs.select(col("doc_id"), col("source")), "graft_bkt_b", "doc_id", 4)
    // force a non-broadcast join so the exchange question is real
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_bkt_a")
        .join(spark.table("graft_bkt_b"), "doc_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(joined.count() == docs.count(), "join result must cover every doc")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    }
  }

  test("sharded write prunes partitions on read (the epoch-writer layout)") {
    import org.apache.spark.sql.functions._
    val out = "/tmp/graft-test-shards"
    // p27-style deterministic shard assignment feeding the actual writer
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("shard",
        pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10).cast("long"), lit(8)))
    Sinks.writeSharded(docs.select(col("doc_id"), col("lang"), col("shard")), out, "shard")
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count(), "read-back must cover every row")
    // reading one shard must scan ONE partition directory, not all eight
    val one = back.filter(col("shard") === 3)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("shard"),
      s"shard filter must reach the scan as a partition filter:\n$plan")
    val expect = docs.filter(col("shard") === 3).count()
    assert(one.count() == expect)
  }

  test("compact merges a splintered directory, preserves rows, sizes to the target") {
    import org.apache.spark.sql.functions._
    val out = "/tmp/graft-test-compact"
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "lang", "n_chars")
    docs.repartition(64).write.mode("overwrite").parquet(out)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def files = fs.listStatus(new org.apache.hadoop.fs.Path(out))
      .filter(_.getPath.getName.endsWith(".parquet"))
    val before = files
    assert(before.length == 64, "fixture must actually be splintered")
    val totalBytes = before.map(_.getLen).sum
    val target = totalBytes / 3 // expect ceil(total/target) ∈ {3, 4}
    val expectN = math.ceil(totalBytes.toDouble / target).toInt
    val checksumBefore = docs.agg(sum(col("doc_id") * col("n_chars"))).head.getLong(0)
    val n = Sinks.compact(spark, out, target)
    assert(n == expectN, s"expected $expectN outputs for target $target, got $n")
    assert(files.length == n, "directory must hold exactly the compacted files")
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count(), "compaction must not lose rows")
    assert(back.agg(sum(col("doc_id") * col("n_chars"))).head.getLong(0) == checksumBefore,
      "content checksum must survive the rewrite")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(out + ".compacting")),
      "the temp dir must be swapped away")
  }

  test("sink input validation fails loudly on a missing column") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val e1 = intercept[IllegalArgumentException](
      Sinks.writeSharded(docs, "/tmp/never", "no_such_col"))
    assert(e1.getMessage.contains("no_such_col"))
    val e2 = intercept[IllegalArgumentException](
      Sinks.writeBucketed(docs, "never", "no_such_col", 4))
    assert(e2.getMessage.contains("no_such_col"))
  }
}
