package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzzing of NULL semantics: random pipelines over a table
  * with a nullable column, checked against a pure-Scala interpreter that
  * models SQL's three-valued logic, null propagation through arithmetic,
  * Spark's null ordering (ASC: nulls first, DESC: nulls last), null group
  * keys, and null-skipping aggregates. */
class NullSemanticsFuzzSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  // 40 rows: a unique 1..40, n nullable (null on every 4th row), m cyclic
  private val rowsIn: Seq[(Long, Option[Long], Long)] =
    (1L to 40L).map(i => (i, if (i % 4 == 0) None else Some((i % 9) - 3), i % 5))

  private lazy val ready: Unit = {
    import spark.implicits._
    rowsIn.map { case (a, n, m) => (a, n.map(java.lang.Long.valueOf).orNull, m) }
      .toDF("a", "n", "m").createOrReplaceTempView("nfuzz")
  }

  private type NRow = Map[String, Option[Long]]
  private case class Stage(prql: String, eval: Seq[NRow] => Seq[NRow])

  // three-valued comparison: None operand -> unknown (filter drops row)
  private def cmp3(op: String, l: Option[Long], r: Option[Long]): Option[Boolean] =
    for { a <- l; b <- r } yield op match {
      case "==" => a == b
      case "!=" => a != b
      case ">" => a > b
      case "<" => a < b
      case ">=" => a >= b
      case "<=" => a <= b
    }

  private def arith3(op: String, l: Option[Long], r: Option[Long]): Option[Long] =
    for { a <- l; b <- r } yield op match {
      case "+" => a + b
      case "-" => a - b
      case "*" => a * b
    }

  /** Spark sort-key ordering for Option[Long]: ASC nulls first, DESC nulls
    * last; tiebreak handled by the caller. Encode as a (rank, value) pair. */
  private def sortKey(v: Option[Long], desc: Boolean): (Int, Long) = v match {
    case None => if (desc) (1, 0L) else (-1, 0L)
    case Some(x) => (0, if (desc) -x else x)
  }

  private def colGen(cols: Seq[String]): Gen[String] = Gen.oneOf(cols)

  private def stageGen(cols: Vector[String], fresh: Int,
                       sorted: Boolean): Gen[(Stage, Vector[String], Boolean)] = {
    val base: Seq[(Int, Gen[(Stage, Vector[String], Boolean)])] = Seq(
      3 -> (for {
        col <- colGen(cols)
        op <- Gen.oneOf("==", "!=", ">", "<", ">=", "<=")
        k <- Gen.choose(-4L, 6L)
      } yield (Stage(s"filter $col $op $k",
        rs => rs.filter(r => cmp3(op, r(col), Some(k)).contains(true))), cols, sorted)),
      2 -> colGen(cols).map { col =>
        (Stage(s"filter $col != null", rs => rs.filter(_(col).isDefined)), cols, sorted)
      },
      1 -> colGen(cols).map { col =>
        (Stage(s"filter $col == null", rs => rs.filter(_(col).isEmpty)), cols, sorted)
      },
      3 -> (for {
        l <- colGen(cols); r <- colGen(cols)
        op <- Gen.oneOf("+", "-", "*")
      } yield {
        val name = s"d$fresh"
        (Stage(s"derive $name = $l $op $r",
          rs => rs.map(row => row + (name -> arith3(op, row(l), row(r))))),
          cols :+ name, sorted)
      }),
      2 -> (for {
        col <- colGen(cols)
        dflt <- Gen.choose(-99L, 99L)
      } yield {
        val name = s"c$fresh"
        (Stage(s"derive $name = $col ?? $dflt",
          rs => rs.map(row => row + (name -> Some(row(col).getOrElse(dflt))))),
          cols :+ name, sorted)
      }),
      2 -> (for {
        col <- colGen(cols)
        desc <- Gen.oneOf(true, false)
      } yield {
        val dir = if (desc) "-" else "+"
        val head = cols.head
        (Stage(s"sort [$dir$col, $head]",
          rs => rs.sortBy(r => (sortKey(r(col), desc), r(head).getOrElse(Long.MinValue)))),
          cols, true)
      }),
      1 -> (for {
        key <- colGen(cols)
        agg <- colGen(cols)
      } yield {
        val sn = s"s$fresh"; val cn = s"n$fresh"
        // SUM skips nulls; all-null (or empty) group -> NULL sum. COUNT(*)
        // counts rows. A null key forms its own group on both engines.
        (Stage(s"group $key (aggregate [$sn = sum $agg, $cn = count])",
          rs => rs.groupBy(_(key)).toSeq.map { case (k, grp) =>
            val vals = grp.flatMap(_(agg))
            Map(key -> k, sn -> (if (vals.isEmpty) None else Some(vals.sum)),
              cn -> Some(grp.size.toLong))
          }),
          Vector(key, sn, cn), false)
      }),
    )
    val takes =
      if (!sorted) Nil
      else Seq(2 -> Gen.choose(1, 25).map(n =>
        (Stage(s"take $n", (rs: Seq[NRow]) => rs.take(n)), cols, sorted)))
    Gen.frequency(base ++ takes: _*)
  }

  private def pipelineGen: Gen[(List[Stage], Vector[String])] = {
    def loop(n: Int, cols: Vector[String], fresh: Int, sorted: Boolean,
             acc: List[Stage]): Gen[(List[Stage], Vector[String])] =
      if (n == 0) Gen.const((acc.reverse, cols))
      else stageGen(cols, fresh, sorted).flatMap { case (s, c2, s2) =>
        loop(n - 1, c2, fresh + 1, s2, s :: acc)
      }
    Gen.choose(1, 6).flatMap(n => loop(n, Vector("a", "n", "m"), 0, sorted = false, Nil))
  }

  test("null semantics agree with a 3VL interpreter (120 seeds; GRAFT_FUZZ_N/_OFFSET extend)") {
    // CI runs the fixed 120; deep local passes extend (the r10 bug-hunt
    // lever, same knobs as DifferentialFuzzSpec/SqlBackendPropertySpec)
    val fuzzN = sys.env.getOrElse("GRAFT_FUZZ_N", "120").toInt
    val fuzzOff = sys.env.getOrElse("GRAFT_FUZZ_OFFSET", "0").toInt
    ready
    (1 + fuzzOff to fuzzN + fuzzOff).foreach { i =>
      val (stages, cols) = pipelineGen(Gen.Parameters.default, Seed(1000L + i))
        .getOrElse(fail(s"no pipeline for seed $i"))
      val key = cols.head
      val prql = ("from nfuzz" :: stages.map(_.prql)).mkString("\n") + s"\nsort $key"
      val expected = stages.foldLeft(
        rowsIn.map { case (a, n, m) =>
          Map("a" -> Some(a), "n" -> n, "m" -> Some(m)): NRow }: Seq[NRow]
      )((rs, s) => s.eval(rs))
        .sortBy(r => sortKey(r(key), desc = false))

      val got =
        try Graft.compileSession(prql, spark).collect()
        catch { case e: Throwable => fail(s"seed=$i failed: ${e.getMessage}\n$prql") }
      val gotRows = got.map(r => cols.map { c =>
        val ix = r.fieldIndex(c)
        c -> (if (r.isNullAt(ix)) None else Some(r.getLong(ix)))
      }.toMap).toSeq.sortBy(r => sortKey(r(key), desc = false))
      val expProj = expected.map(r => cols.map(c => c -> r(c)).toMap)
      assert(gotRows == expProj,
        s"seed=$i divergence\n--- prql:\n$prql\n--- got ${gotRows.take(6)}\n--- exp ${expProj.take(6)}")
    }
  }
}
