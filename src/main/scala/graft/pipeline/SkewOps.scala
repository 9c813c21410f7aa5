package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/** Skew-mitigation utilities. First line of defense at scale is AQE
  * (`spark.sql.adaptive.skewJoin.enabled`, on in Graft.localSession): it
  * splits oversized shuffle partitions at runtime. Hand-salting remains the
  * tool for the cases AQE cannot fix — a single key so hot that even a
  * split partition is dominated by it (AQE splits a partition, but every
  * row of one key still meets every matching row), or streaming joins
  * (no runtime re-plan). These helpers keep results IDENTICAL to the plain
  * operation; only the key space, and therefore the shuffle layout,
  * changes.
  */
object SkewOps {

  private val SaltCol = "_salt_graft"

  /** Equi-join resilient to heavy LEFT-side key skew: every left row gets a
    * salt in [0, factor) and the (smaller) right side is replicated once
    * per salt value, so the join key becomes (key, salt) and one hot key
    * spreads over `factor` tasks instead of one.
    *
    * The salt is a deterministic xxhash64 of the whole left row modulo
    * `factor` — any value in range is correct (the right side covers every
    * salt), and determinism keeps task retries and plan re-execution
    * byte-stable. A hot KEY spreads as long as the other columns vary;
    * fully identical duplicate rows share a salt by construction (they are
    * the p01 exact-dedup case, not a join-skew case).
    *
    * Cost model: right side is shuffled `factor`× — use for dimension-sized
    * right sides (the skewed-fact ⋈ dimension shape where broadcast is too
    * big but replication×factor is fine). Supports inner and left joins
    * (right/full would need the salt on the preserved side instead). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 factor: Int, joinType: String = "inner"): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    require(joinType == "inner" || joinType == "left",
      s"saltedJoin supports inner/left, got $joinType")
    val saltedLeft = left.withColumn(SaltCol,
      F.pmod(F.xxhash64(left.columns.map(F.col).toIndexedSeq: _*), F.lit(factor.toLong)))
    val replicatedRight = right.withColumn(SaltCol,
      F.explode(F.sequence(F.lit(0L), F.lit(factor.toLong - 1))))
    saltedLeft.join(replicatedRight, Seq(key, SaltCol), joinType).drop(SaltCol)
  }
}
