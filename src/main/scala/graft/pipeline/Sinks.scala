package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Output-side scale utilities — the write paths a 100 TB pipeline pairs
  * with the operators here.
  *
  * Two shapes matter at cluster scale:
  *
  *  1. '''Bucketed tables''' ([[writeBucketed]]): both sides of a recurring
  *     equi-join written with `bucketBy(n, key)` + `sortBy(key)` join with
  *     NO exchange and NO sort — the shuffle is paid once at write time and
  *     amortized over every subsequent join (SinksSpec asserts the
  *     exchange-free plan). This is the standing answer to "this join
  *     shuffles 100 TB every night": bucket the fact table once.
  *  2. '''Partitioned shard writes''' ([[writeSharded]]): the epoch-writer
  *     layout — `partitionBy(shardCol)` lays each shard in its own
  *     directory so a dataloader (or a downstream job) reads one shard
  *     with PARTITION PRUNING, never scanning the rest (asserted on the
  *     read-back plan). Pairs with p27's deterministic shard assignment.
  *
  * Both write through the normal committer (atomic rename per task,
  * job-level commit protocol), so executor loss during a write never
  * yields partial files — the property that actually matters for a
  * multi-hour 1000-executor write.
  */
object Sinks {

  /** Write `df` as a bucketed, per-bucket-sorted managed table. The bucket
    * count is the deployment knob: pick it so one bucket of the LARGER
    * table fits an executor's memory (the subsequent joins run
    * bucket-per-task with no exchange). Requires a session with a
    * warehouse dir (any real deployment has one). */
  def writeBucketed(df: DataFrame, table: String, keyCol: String, buckets: Int): Unit = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    require(df.columns.contains(keyCol), s"bucket key '$keyCol' not in ${df.columns.mkString(",")}")
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keyCol).sortBy(keyCol)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Write `df` partitioned by `shardCol` (one directory per shard value).
    * The shard column must already exist — p27-style deterministic
    * assignment, a date column, whatever the read pattern prunes on. */
  def writeSharded(df: DataFrame, path: String, shardCol: String): Unit = {
    require(df.columns.contains(shardCol), s"shard column '$shardCol' not in ${df.columns.mkString(",")}")
    df.write.mode(SaveMode.Overwrite).partitionBy(shardCol).parquet(path)
  }

  /** Compact a flat parquet directory's small files into
    * ceil(total_bytes / targetBytes) outputs — the operational fix for
    * the small-files problem every incremental pipeline accumulates
    * (thousands of tiny files → NameNode/listing pressure and
    * per-file scan overhead dwarfing the data read).
    *
    * Uses `repartition(n)`: one shuffle buys evenly-sized outputs
    * (`coalesce` would be shuffle-free but merges ADJACENT partitions,
    * inheriting whatever skew the producer left). The rewrite goes to a
    * sibling temp dir through the normal committer, is row-count-verified
    * against the source, and only then swapped in — the directory never
    * holds a partial mix of old and new files. Returns the output file
    * count. */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              targetBytes: Long): Int = {
    require(targetBytes >= 1, s"targetBytes must be >= 1, got $targetBytes")
    val hconf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hconf)
    require(fs.exists(p), s"compact: no such directory $path")
    val parts = fs.listStatus(p).filter(_.getPath.getName.endsWith(".parquet"))
    require(parts.nonEmpty, s"compact: no parquet files in $path")
    val totalBytes = parts.map(_.getLen).sum
    val n = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val src = spark.read.parquet(path)
    val srcCount = src.count()
    val tmp = new org.apache.hadoop.fs.Path(path.stripSuffix("/") + ".compacting")
    fs.delete(tmp, true)
    src.repartition(n).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val outCount = spark.read.parquet(tmp.toString).count()
    require(outCount == srcCount,
      s"compact: rewrite row count $outCount != source $srcCount; aborting, source untouched")
    fs.delete(p, true)
    require(fs.rename(tmp, p), s"compact: rename $tmp -> $p failed")
    n
  }
}
