package graft

import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

/** The ×K corpus construction's decorrelation laws (VERDICT r11 #1: the
  * second-decade probe needs K=100, past the 64-pattern Walsh family).
  * The extension multiplies the high replica group (h = r div 64) by the
  * 6-bit inner-product bent function g(i) = (-1)^(i0·i1 ⊕ i2·i3 ⊕ i4·i5),
  * whose Walsh spectrum is flat at |8| of 64 — so any cross-group relative
  * pattern has bias ≤ 8/64 while same-group pairs stay exactly balanced.
  * Tested twice: the pure sign-pattern algebra (exhaustive over all
  * replica pairs), and the materialized corpus on real gate embeddings. */
class ScaleCorpusSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** JVM mirror of buildScaledDir's sign expression. */
  private def sign(r: Int, i: Int): Int = {
    val w = r % 64
    val h = r / 64
    val bent = (if ((i & 3) == 3) 1 else 0) + (if ((i & 12) == 12) 1 else 0) +
      (if ((i & 48) == 48) 1 else 0)
    if ((Integer.bitCount(i & w) + h * bent) % 2 == 0) 1 else -1
  }

  test("all 128 replica sign patterns are pairwise low-bias (exact 0 in-group, <= 8/64 cross-group)") {
    // relative pattern between replicas r and r': its SUM is the worst-case
    // cross-replica dot for a flat vector (|x_i| all equal); the clique
    // artifact the Walsh family exists to kill is |sum| == 64 (identical
    // patterns). Exhaustive: 128*127/2 pairs.
    var worstInGroup = 0
    var worstCross = 0
    for (r <- 0 until 128; r2 <- (r + 1) until 128) {
      val s = (0 until 64).map(i => sign(r, i) * sign(r2, i)).sum
      if (r / 64 == r2 / 64) worstInGroup = math.max(worstInGroup, math.abs(s))
      else worstCross = math.max(worstCross, math.abs(s))
    }
    assert(worstInGroup == 0, s"same-group Walsh pairs must be exactly balanced, got $worstInGroup")
    assert(worstCross == 8, s"cross-group bent bias must be exactly 8/64, got $worstCross")
  }

  test("x100 corpus: same-vector replica pairs are noise-class, never a clique") {
    // What the replication must kill is the EXACT-duplicate clique
    // (cos ≈ 1: a naive copy makes every vector's K replicas one giant
    // near-dup cluster and pair counts grow ×K² — the fake-superlinearity
    // artifact). What it CANNOT do — fundamentally, for any diagonal ±1
    // family at 64 dims — is push same-vector replica cosines below the
    // energy-fluctuation floor: |Σ q_i y_i²|/Σ y_i² has mean ≈ cv/8 ≈
    // 0.16 for Gaussian-like coordinates (y_i² is χ²₁, cv = √2). That is
    // the CORRECT target anyway: organic unrelated pairs in this corpus
    // sit at mean |cos| ≈ 0.10 with a tail past 0.5, and a genuinely
    // ×100-bigger corpus grows every vector's noise-threshold neighbor
    // degree ×100 too — replica pairs that look like organic noise pairs
    // are structure-faithful, replicas that look like each other are not.
    val dir = Bench.buildScaledDir(spark, "/root/testdata/sf0.001", 100,
      "/tmp/graft-scale-spec")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id DIV 100 AS orig", "vec_id % 100 AS r",
        "embedding",
        "aggregate(embedding, CAST(0.0 AS DOUBLE), (a, x) -> a + x * x) AS n2")
    val pairs = e.as("a").join(e.as("b"),
        F.expr("a.orig = b.orig AND a.r < b.r"))
      .selectExpr(
        "abs(aggregate(zip_with(a.embedding, b.embedding, (x, y) -> CAST(x * y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) / sqrt(a.n2 * b.n2)) AS c")
      .agg(F.max("c").as("mx"), F.avg("c").as("av"),
        F.avg(F.expr("CAST(c >= 0.3 AS DOUBLE)")).as("tail")).head()
    val (mx, av, tail) = (pairs.getDouble(0), pairs.getDouble(1), pairs.getDouble(2))
    assert(mx < 0.9, s"a replica pair correlates at $mx — clique artifact")
    assert(av < 0.25, s"mean cross-replica |cos| must stay noise-class, got $av")
    assert(tail < 0.2, s"replica-pair tail past the 0.3 noise threshold is $tail — " +
      "replicas resemble each other more than organic pairs do")
  }

  test("x100 corpus: each replica is an ISOMETRIC image (pairwise cosines preserved)") {
    // Q_r = D_r·H·D_s is orthogonal, so within-replica geometry — the
    // thing every embedding operator consumes — must match the original
    // corpus exactly (up to float32 rounding of the spread).
    val dir = "/tmp/graft-scale-spec" // built by the previous test
    def pairCos(df: org.apache.spark.sql.DataFrame, idExpr: String): Map[(Long, Long), Double] = {
      val e = df.selectExpr(s"$idExpr AS id",
        "embedding",
        "aggregate(embedding, CAST(0.0 AS DOUBLE), (a, x) -> a + x * x) AS n2")
        .filter("id < 20") // 190 pairs is plenty
      e.as("a").join(e.as("b"), F.expr("a.id < b.id"))
        .selectExpr("a.id AS i", "b.id AS j",
          "aggregate(zip_with(a.embedding, b.embedding, (x, y) -> CAST(x * y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) / sqrt(a.n2 * b.n2) AS c")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    }
    val orig = pairCos(spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"), "vec_id")
    val rep7 = pairCos(spark.read.parquet(s"$dir/embeddings.parquet")
      .filter("vec_id % 100 = 7"), "vec_id DIV 100")
    assert(orig.keySet == rep7.keySet)
    val worst = orig.keys.map(k => math.abs(orig(k) - rep7(k))).max
    assert(worst < 1e-5, s"replica geometry drifted by $worst — transform not orthogonal")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val n = docs.count()
    assert(docs.select("doc_id").distinct().count() == n, "doc_id remap must be injective")
    assert(n == 100 * spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count())
  }
}
