package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}
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

  /** Pick a salt column name no input column shadows: a fixed name would
    * silently clobber (withColumn replaces) and then drop a pre-existing
    * user column of the same name, breaking the result-identity contract. */
  private def freshSaltCol(left: DataFrame, right: DataFrame): String =
    Iterator.from(0).map(i => if (i == 0) "_salt_graft" else s"_salt_graft$i")
      .find(n => !left.columns.contains(n) && !right.columns.contains(n)).get

  private def containsMap(dt: DataType): Boolean = dt match {
    case _: MapType => true
    case ArrayType(et, _) => containsMap(et)
    case StructType(fs) => fs.exists(f => containsMap(f.dataType))
    case _ => false
  }

  /** Deterministic salt in [0, factor): xxhash64 over the row's hashable
    * columns. Map-typed columns are excluded — xxhash64 rejects them at
    * analysis (map equality/ordering is undefined), and any value in range
    * is a correct salt, so narrowing the hashed column set only affects
    * spread, not correctness. A hot KEY still spreads as long as some
    * non-map column varies; fully identical duplicate rows share a salt by
    * construction (they are the p01 exact-dedup case, not a join-skew
    * case). */
  private def saltExpr(df: DataFrame, factor: Int) = {
    val hashable = df.schema.fields.filterNot(f => containsMap(f.dataType)).map(f => F.col(f.name))
    require(hashable.nonEmpty, "saltedJoin: no hashable (non-map) columns to derive a salt from")
    F.pmod(F.xxhash64(hashable.toIndexedSeq: _*), F.lit(factor.toLong))
  }

  /** Equi-join resilient to heavy skew on the PRESERVED side's key
    * distribution: every row of the skewed side gets a deterministic salt
    * in [0, factor) and the other side is replicated once per salt value,
    * so the join key becomes (key, salt) and one hot key spreads over
    * `factor` tasks instead of one.
    *
    * Which side is salted follows the join type — the replicated side must
    * not be a preserved side, or its unmatched rows would surface `factor`
    * times:
    *  - `inner`/`left`: salt left, replicate right (skewed-fact ⋈ dimension);
    *  - `right`: mirror — salt right, replicate left;
    *  - `full`: both sides are preserved, so neither may be replicated
    *    naively. Composed as salted RIGHT join (covers all matches + all
    *    right rows) UNION ALL the left rows with no key match,
    *    null-extended — the anti probe joins against the DISTINCT key set,
    *    in which a hot key is one row, so it reintroduces no skew.
    *
    * Cost model: the replicated side is shuffled `factor`× — use for
    * dimension-sized sides (the skewed-fact ⋈ dimension shape where
    * broadcast is too big but replication×factor is fine). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 factor: Int, joinType: String = "inner"): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    val saltCol = freshSaltCol(left, right)
    def salted(df: DataFrame) = df.withColumn(saltCol, saltExpr(df, factor))
    def replicated(df: DataFrame) = df.withColumn(saltCol,
      F.explode(F.sequence(F.lit(0L), F.lit(factor.toLong - 1))))
    joinType match {
      case "inner" | "left" =>
        salted(left).join(replicated(right), Seq(key, saltCol), joinType).drop(saltCol)
      case "right" =>
        replicated(left).join(salted(right), Seq(key, saltCol), "right").drop(saltCol)
      case "full" =>
        val matchedAndRight =
          replicated(left).join(salted(right), Seq(key, saltCol), "right").drop(saltCol)
        // left rows with no right key-match, null-extended to the USING-join
        // schema (key, left non-key cols, right non-key cols)
        val rightKeys = right.select(F.col(key)).distinct()
        val leftOnly = left.join(rightKeys, Seq(key), "left_anti")
        val rightNulls = right.schema.fields.filter(_.name != key)
          .map(f => F.lit(null).cast(f.dataType).as(f.name))
        val leftOnlyExtended = leftOnly.select(
          (F.col(key) +: left.columns.filter(_ != key).map(F.col).toSeq) ++ rightNulls: _*)
        matchedAndRight.unionByName(leftOnlyExtended)
      case other =>
        throw new IllegalArgumentException(
          s"saltedJoin supports inner/left/right/full, got $other")
    }
  }
}
