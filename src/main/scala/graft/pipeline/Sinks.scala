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
}
