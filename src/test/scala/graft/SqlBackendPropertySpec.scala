package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** VERDICT r8 #6: the SQL-text backend's equivalence to the DataFrame
  * backend was corpus-driven only (SqlBackendSpec / SqlBackendCorpusSpec);
  * this drives it over RANDOM executable pipelines. A seeded generator
  * emits semantically-valid, SQL-expressible PRQL over a fixture table —
  * filter/derive (with shadowing)/select/sort/take/group-aggregate/having
  * with typed expression trees (arithmetic, comparisons, boolean logic,
  * null checks, coalesce, f-strings, nullable columns) — and every
  * pipeline must compile through BOTH backends and row-equal as a
  * multiset. `take` is only ever generated after a sort ending in a
  * unique key, so row selection is total-order-deterministic and any
  * mismatch is a real backend divergence, not tie-breaking.
  */
class SqlBackendPropertySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val View = "fuzz_base"

  private lazy val fixture: Unit = {
    // 48 rows; v is null every 7th row (null-semantics coverage); f spans
    // negatives; s/grp give string/group coverage
    spark.sql(
      s"""SELECT id, CAST(element_at(array('a','b','c','d'), CAST(pmod(id, 4) AS INT) + 1) AS STRING) AS grp,
            CASE WHEN id % 7 = 0 THEN CAST(NULL AS BIGINT) ELSE (id * 13) % 29 END AS v,
            CAST(id AS DOUBLE) / 4.0 - 3.5 AS f,
            concat('s', CAST(id % 5 AS STRING)) AS s,
            date_add(DATE'2022-01-01', CAST((id * 11) % 90 AS INT)) AS d
          FROM (SELECT explode(sequence(1, 48)) AS id)""")
      .createOrReplaceTempView(View)
    // join dimension: unique per grp (joins never fan out, so the unique
    // key survives) and deliberately MISSING 'd' — left joins carry nulls,
    // inner joins drop rows
    spark.sql(
      """SELECT * FROM VALUES ('a', 10L, 'alpha'), ('b', 20L, 'beta'),
           ('c', CAST(NULL AS BIGINT), 'gamma') AS t(grp, w, label)""")
      .createOrReplaceTempView("fuzz_dim")
  }

  /** Column-typed generator state: name -> type ('n bigint, 'd double,
    * 's string). `uniqueKey` is a column that totally orders the current
    * relation (for take-determinism); None when lost by select. `joined`
    * caps the pipeline at one dim join (a second would collide w/label).
    * `sortedTotal` (fuzzer round 9) records that an AMBIENT sort ending in
    * the unique key is in force — a later bare `take` must honor it even
    * across interposing selects (dropped/rebound sort names ride hidden
    * carries) and order-destroying joins (take re-establishes the sort). */
  private case class St(cols: Vector[(String, Char)], uniqueKey: Option[String],
                        grouped: Boolean, joined: Boolean = false,
                        sortedTotal: Boolean = false)

  private def colsOf(st: St, t: Char): Vector[String] =
    st.cols.collect { case (n, `t`) => n }

  private def numExpr(r: Random, st: St, depth: Int): String = {
    val numCols = colsOf(st, 'n')
    if (depth <= 0 || numCols.isEmpty || r.nextInt(3) == 0)
      if (numCols.nonEmpty && r.nextBoolean()) numCols(r.nextInt(numCols.size))
      else (r.nextInt(199) - 99).toString
    else r.nextInt(9) match {
      case 0 => s"(${numExpr(r, st, depth - 1)} + ${numExpr(r, st, depth - 1)})"
      case 1 => s"(${numExpr(r, st, depth - 1)} - ${numExpr(r, st, depth - 1)})"
      case 2 => s"(${numExpr(r, st, depth - 1)} * ${(r.nextInt(5) + 1).toString})"
      case 3 => s"(coalesce ${numCols(r.nextInt(numCols.size))} ${r.nextInt(50).toString})"
      case 4 => s"(${numCols(r.nextInt(numCols.size))} ?? ${(r.nextInt(40) - 20).toString})"
      // user-function calls through pipe currying (the prelude defines
      // fz1/fz2; fz2 exercises the named-default path)
      case 5 => s"(${numExpr(r, st, depth - 1)} | fz1)"
      case 6 =>
        if (r.nextBoolean()) s"(${numCols(r.nextInt(numCols.size))} | fz2)"
        else s"(${numCols(r.nextInt(numCols.size))} | fz2 k:${r.nextInt(9)})"
      // fuzzer round 6: s-string pass-through (both backends hand the
      // interpolated text to Spark SQL) and double->bigint truncating cast
      case 7 =>
        val c = numCols(r.nextInt(numCols.size))
        if (r.nextBoolean()) s"""s"abs({$c})""""
        else s"""s"greatest({$c}, {${numExpr(r, st, 0)}})""""
      case 8 => s"(${dblExpr(r, st, 0)} | as bigint)"
    }
  }

  private def dateLit(r: Random): String =
    f"@2022-0${1 + r.nextInt(3)}%d-${10 + r.nextInt(18)}%d"

  private def dblExpr(r: Random, st: St, depth: Int): String = {
    val dblCols = colsOf(st, 'd')
    if (depth <= 0 || dblCols.isEmpty)
      if (dblCols.nonEmpty) dblCols(r.nextInt(dblCols.size))
      else s"${r.nextInt(20)}.${r.nextInt(9)}"
    else r.nextInt(5) match {
      case 0 => s"(${dblExpr(r, st, depth - 1)} + ${dblExpr(r, st, depth - 1)})"
      case 1 => s"(${dblExpr(r, st, depth - 1)} * 2)"
      // round-to-digits and bigint->double cast (fuzzer round 6): both are
      // exact on this fixture (f is a multiple of 0.25), so canon-safe
      case 2 => s"(round ${dblExpr(r, st, depth - 1)} ${r.nextInt(3) + 1})"
      case 3 => s"(${numExpr(r, st, 0)} | as double)"
      case 4 => dblCols(r.nextInt(dblCols.size))
    }
  }

  private def strExpr(r: Random, st: St): String = {
    val strCols = colsOf(st, 's')
    if (strCols.isEmpty) "\"k\""
    else r.nextInt(3) match {
      case 0 => strCols(r.nextInt(strCols.size))
      case 1 => s""""lit${r.nextInt(5)}""""
      case 2 =>
        val c = strCols(r.nextInt(strCols.size))
        val n = numExpr(r, st, 0)
        s"""f"{$c}-{$n}""""
    }
  }

  private def boolExpr(r: Random, st: St, depth: Int): String = {
    val cmp = Seq("==", "!=", ">", "<", ">=", "<=")
    if (depth <= 0) {
      val numCols = colsOf(st, 'n')
      val dateCols = colsOf(st, 't')
      r.nextInt(5) match {
        case 0 if numCols.nonEmpty && r.nextBoolean() =>
          val c = numCols(r.nextInt(numCols.size))
          s"($c ${if (r.nextBoolean()) "==" else "!="} null)"
        case 1 => s"(${strExpr(r, st)} ${cmp(r.nextInt(2))} ${strExpr(r, st)})"
        case 3 if dateCols.nonEmpty =>
          val c = dateCols(r.nextInt(dateCols.size))
          if (r.nextBoolean()) s"($c ${cmp(2 + r.nextInt(4))} ${dateLit(r)})"
          else {
            val (a, b) = (dateLit(r), dateLit(r))
            val (lo, hi) = if (a <= b) (a, b) else (b, a)
            s"($c | in $lo..$hi)"
          }
        // numeric in-range (fuzzer round 7): BETWEEN over ints
        case 4 if numCols.nonEmpty =>
          val c = numCols(r.nextInt(numCols.size))
          val lo = r.nextInt(20); val hi = lo + r.nextInt(25)
          s"($c | in $lo..$hi)"
        case _ => s"(${numExpr(r, st, 1)} ${cmp(r.nextInt(cmp.size))} ${numExpr(r, st, 1)})"
      }
    } else r.nextInt(3) match {
      case 0 => s"(${boolExpr(r, st, depth - 1)} and ${boolExpr(r, st, depth - 1)})"
      case 1 => s"(${boolExpr(r, st, depth - 1)} or ${boolExpr(r, st, depth - 1)})"
      case 2 => s"!${boolExpr(r, st, depth - 1)}"
    }
  }

  /** One row-phase stage; returns (stage text, next state). */
  private def rowStage(r: Random, st: St, fresh: () => String): (String, St) = {
    val canJoin = !st.joined && st.cols.exists(_._1 == "grp") &&
      !st.cols.exists(c => c._1 == "w" || c._1 == "label")
    // sort/take stages need the total-order key; a right/full join loses it
    // (an earlier filter can empty a grp, so an unmatched dim row carries a
    // NULL key — ≤1 per grp, but cross-grp they tie globally), so after one
    // the choice set shrinks to filter/derive/select
    val choices = Vector(0, 1, 2) ++
      (if (st.uniqueKey.isDefined) Vector(3, 4) else Vector.empty) ++
      (if (canJoin) Vector(5) else Vector.empty) ++
      (if (st.sortedTotal && st.uniqueKey.isDefined) Vector(6) else Vector.empty)
    val n = choices(r.nextInt(choices.size))
    if (n == 5) {
      // USING join on grp against the unique-per-grp dim: no fanout (the
      // unique key survives), 'd' rows exercise left-null vs inner-drop.
      // right/full (fuzzer round 6): every dim grp exists in the base, so
      // they only diverge from inner/left when a filter emptied a grp, but
      // they exercise the USING provenance-coalesce rendering either way.
      // left/inner keep the ambient sort meaningful (fuzzer round 9: the
      // sort-merge join re-clusters rows, so a later bare take exercises
      // the re-established ambient sort); right/full lose the unique key,
      // and with it total order
      val side = Seq("left", "inner", "right", "full")(r.nextInt(4))
      val key = if (side == "right" || side == "full") None else st.uniqueKey
      (s"join side:$side fuzz_dim [grp]",
        st.copy(cols = st.cols ++ Vector("w" -> 'n', "label" -> 's'),
          uniqueKey = key, joined = true,
          sortedTotal = st.sortedTotal && key.isDefined))
    } else n match {
      case 0 => (s"filter ${boolExpr(r, st, r.nextInt(2))}", st)
      case 1 =>
        // derive 1-2 columns; occasionally shadow an earlier derived col.
        // State FOLDS through the assigns: the planner lets a later item
        // see an earlier item's value, so a type-changing shadow in
        // assign 1 must be visible when assign 2's expression is
        // generated (found by a seed shadowing x1 to a string and then
        // building x1 + 5 — valid analysis via implicit cast, runtime
        // malformed-cast error on both backends)
        val nA = r.nextInt(2) + 1
        var cur = st
        val texts = (1 to nA).map { _ =>
          val derived = cur.cols.map(_._1).filter(_.startsWith("x"))
          val name =
            if (derived.nonEmpty && r.nextInt(4) == 0) derived(r.nextInt(derived.size))
            else fresh()
          val (body, t) = r.nextInt(3) match {
            case 0 => (numExpr(r, cur, 2), 'n')
            case 1 => (dblExpr(r, cur, 1), 'd')
            case 2 => (strExpr(r, cur), 's')
          }
          cur = cur.copy(cols = cur.cols.filterNot(_._1 == name) :+ (name -> t))
          s"$name = $body"
        }
        (s"derive [${texts.mkString(", ")}]", cur)
      case 2 =>
        // select a subset that always keeps the unique key (take-safety)
        val keep = st.uniqueKey.toSeq ++
          r.shuffle(st.cols.map(_._1).filterNot(st.uniqueKey.contains)).take(r.nextInt(3) + 1)
        val kept = st.cols.filter(c => keep.contains(c._1))
        // occasionally REBIND one kept column to a fresh expression
        // (fuzzer round 8, review finding): a pending sort on the rebound
        // name must keep ordering by the OLD value — the timing class the
        // __gsort_ mangling in SqlGen exists for. key/d stay stable
        // (join/take determinism rides on them); grp stays stable only
        // UNTIL the dim join has happened (fuzzer round 14, VERDICT r13
        // #5): after it, rebinding grp shadows the USING-join's
        // COALESCE(l.grp, r.grp) output — q48's provenance class under
        // rebinds, including right/full joins where the coalesce is
        // load-bearing. The rebind stays string-typed so the group stages'
        // type model holds.
        val rebindable = kept.map(_._1)
          .filterNot(n => st.uniqueKey.contains(n) || (n == "grp" && !st.joined) || n == "d")
        if (r.nextInt(3) == 0 && rebindable.nonEmpty) {
          val target = rebindable(r.nextInt(rebindable.size))
          val (body, t) =
            if (target == "grp") (strExpr(r, st), 's')
            else if (r.nextBoolean()) (numExpr(r, st, 1), 'n') else (strExpr(r, st), 's')
          val itemsTxt = kept.map { case (n, _) => if (n == target) s"$n = $body" else n }
          (s"select [${itemsTxt.mkString(", ")}]",
            st.copy(cols = kept.map { case (n, tp) => if (n == target) (n, t) else (n, tp) }))
        } else
          (s"select [${kept.map(_._1).mkString(", ")}]", st.copy(cols = kept))
      case 3 =>
        // always ends in the unique key — establishes a TOTAL ambient order
        val key = st.uniqueKey.get
        val extra = r.shuffle(st.cols.map(_._1).filterNot(_ == key)).take(r.nextInt(2))
        val keys = extra.map(c => if (r.nextBoolean()) s"-$c" else c) :+
          (if (r.nextBoolean()) s"-$key" else key)
        (s"sort [${keys.mkString(", ")}]", st.copy(sortedTotal = true))
      case 4 =>
        // sort-ending-in-unique-key + take: deterministic row selection
        val key = st.uniqueKey.get
        // closed take n, closed range a..b, or (fuzzer round 7) the open
        // range a.. — drop the first a-1 rows, keep the rest
        val take = r.nextInt(3) match {
          case 0 => s"take ${r.nextInt(30) + 5}"
          case 1 => val a = r.nextInt(10) + 1; s"take $a..${a + r.nextInt(20) + 1}"
          case 2 => s"take ${r.nextInt(12) + 1}.."
        }
        (s"sort [${if (r.nextBoolean()) s"-$key" else key}]\n$take",
          st.copy(sortedTotal = true))
      case 6 =>
        // bare take under the AMBIENT sort (fuzzer round 9, the 158b117
        // semantics): the establishing sort happened stages ago — possibly
        // with its column since dropped or rebound by a select (hidden
        // carry) or with an order-destroying join in between (take must
        // re-establish the sort) — and the slice must still honor it
        val take = r.nextInt(3) match {
          case 0 => s"take ${r.nextInt(30) + 5}"
          case 1 => val a = r.nextInt(10) + 1; s"take $a..${a + r.nextInt(20) + 1}"
          case 2 => s"take ${r.nextInt(12) + 1}.."
        }
        (take, st)
    }
  }

  private def genPipeline(seed: Int): String = {
    val r = new Random(seed)
    var counter = 0
    val fresh = () => { counter += 1; s"x$counter" }
    var st = St(Vector("id" -> 'n', "grp" -> 's', "v" -> 'n', "f" -> 'd',
      "s" -> 's', "d" -> 't'), Some("id"), grouped = false)
    val sb = new StringBuilder(
      "func fz1 x -> (x * 2 + 1)\nfunc fz2 k:3 x -> (x + k)\n\n")
    // half the pipelines route through a `table` CTE carrying 1-2 random
    // stages — exercises WITH rendering and CTE reference on both backends;
    // a third of those chain a SECOND CTE referencing the first (fuzzer
    // round 7: topological WITH ordering + known-output-name propagation
    // across CTE hops)
    if (r.nextBoolean()) {
      sb.append(s"table tsrc = (\n  from $View\n")
      (1 to r.nextInt(2) + 1).foreach { _ =>
        val (stage, next) = rowStage(r, st, fresh)
        sb.append("  ").append(stage.replace("\n", "\n  ")).append('\n'); st = next
      }
      sb.append(")\n\n")
      // an ambient sort does NOT escape a table def (carries drop at
      // pipeline edges), so the consumer starts order-free
      st = st.copy(sortedTotal = false)
      if (r.nextInt(3) == 0) {
        sb.append("table tmid = (\n  from tsrc\n")
        val (stage, next) = rowStage(r, st, fresh)
        sb.append("  ").append(stage.replace("\n", "\n  ")).append('\n'); st = next
        sb.append(")\n\nfrom tmid\n")
        st = st.copy(sortedTotal = false)
      } else sb.append("from tsrc\n")
    } else sb.append(s"from $View\n")
    (1 to r.nextInt(4) + 1).foreach { _ =>
      val (stage, next) = rowStage(r, st, fresh)
      sb.append(stage).append('\n'); st = next
    }
    // optional TOP-LEVEL window derive (fuzzer round 7): an aggregate or
    // ranking function in a plain derive under an ambient sort — no group
    // block, so the partition is the whole relation and the ambient-sort
    // full-frame rule decides the frame (the q46/q47 shape). The ambient
    // sort ends in the unique key, so offsets/ranks are deterministic.
    if (r.nextInt(5) == 0 && st.uniqueKey.isDefined) {
      val key = st.uniqueKey.get
      sb.append(s"sort [${if (r.nextBoolean()) s"-$key" else key}]\n")
      val numCols = colsOf(st, 'n')
      val opts = Vector(("(row_number | as bigint)", 'n')) ++
        (if (numCols.nonEmpty) {
          val c = numCols(r.nextInt(numCols.size))
          Vector((s"(sum $c)", 'n'), (s"(min $c)", 'n'),
            (s"(lag 1 $c)", 'n'), (s"(first $c)", 'n'))
        } else Vector.empty)
      val assigns = r.shuffle(opts).take(r.nextInt(2) + 1).map { case (body, t) =>
        val nm = fresh(); (s"$nm = $body", nm, t)
      }
      sb.append(s"derive [${assigns.map(_._1).mkString(", ")}]\n")
      st = st.copy(cols = st.cols ++ assigns.map(a => a._2 -> a._3))
    }
    // optional group top-k stage (fuzzer round 6): `group ks (sort | take)`
    // exercises the row_number rewrite; the inner sort ends in the unique
    // key, so the kept rows are a deterministic set
    if (r.nextInt(4) == 0 && st.cols.exists(_._1 == "grp") && st.uniqueKey.isDefined) {
      val key = st.uniqueKey.get
      val numCols = colsOf(st, 'n').filterNot(_ == key)
      val lead = if (numCols.nonEmpty && r.nextBoolean())
        Seq(s"${if (r.nextBoolean()) "-" else ""}${numCols(r.nextInt(numCols.size))}")
      else Seq.empty
      val keys = (lead :+ (if (r.nextBoolean()) s"-$key" else key)).mkString(", ")
      sb.append(s"group [grp] (\n  sort [$keys]\n  take ${r.nextInt(4) + 1}\n)\n")
    }
    // optional window block: running aggregates / ranking / offsets under
    // the ambient-sort frame rules, per key partition. The sort inside the
    // group ends in the unique key, so lag/row_number are deterministic;
    // outputs are per-row values keyed by that key, so the multiset canon
    // stays sound. Half the blocks (fuzzer round 6) carry an explicit frame
    // (rows:a..b / rows:.. / rolling:n / expanding:true / range:a..0) with
    // frame-sensitive functions only — every frame over the total inner
    // sort selects a deterministic row set, so sum/min/max/count/first/last
    // stay canon-safe (empty frames yield NULL on both backends).
    if (r.nextInt(3) == 0 && st.cols.exists(_._1 == "grp") && st.uniqueKey.isDefined) {
      val key = st.uniqueKey.get
      val numCols = colsOf(st, 'n')
      val sortDir = if (r.nextBoolean()) s"-$key" else key
      if (r.nextBoolean() && numCols.nonEmpty) {
        val frame = r.nextInt(5) match {
          case 0 =>
            val lo = -r.nextInt(4); val hi = lo + r.nextInt(3)
            s"rows:$lo..$hi"
          case 1 => "rows:.."
          case 2 => s"rolling:${r.nextInt(5) + 1}"
          case 3 => "expanding:true"
          case 4 => s"range:${-(r.nextInt(30) + 1)}..0"
        }
        val c = numCols(r.nextInt(numCols.size))
        val opts = Vector(s"sum $c", s"min $c", s"max $c", "count",
          s"first $c", s"last 1 $c")
        val assigns = r.shuffle(opts).take(r.nextInt(2) + 1).map { e =>
          val nm = fresh(); (s"$nm = ($e)", nm)
        }
        sb.append(s"group [grp] (\n  sort [$sortDir]\n  window $frame (\n    derive [${assigns.map(_._1).mkString(", ")}]\n  )\n)\n")
        st = st.copy(cols = st.cols ++ assigns.map(a => a._2 -> 'n'))
        // filter over a window output (fuzzer round 8): SQL can't put a
        // window alias in the same SELECT's WHERE, so the backend must
        // flush the window block into a subquery first
        if (r.nextBoolean())
          sb.append(s"filter (${assigns.head._2} ${if (r.nextBoolean()) "!=" else "=="} null)\n")
      } else {
        val picks = scala.collection.mutable.ArrayBuffer.empty[(String, String, Char)]
        picks += (("row_number", "(row_number | as bigint)", 'n'))
        if (numCols.nonEmpty) {
          val c = numCols(r.nextInt(numCols.size))
          val opts = Vector(
            (s"sum $c", 'n'), (s"min $c", 'n'), (s"max $c", 'n'),
            (s"lag 1 $c", 'n'), (s"lead 1 $c", 'n'),
            (s"first $c", 'n'), (s"last 1 $c", 'n'), ("rank", 'n'))
          r.shuffle(opts).take(r.nextInt(2) + 1).foreach { case (e, t) =>
            picks += ((e, s"($e)", t))
          }
        }
        val assigns = picks.toVector.map { case (_, body, t) =>
          val nm = fresh(); (s"$nm = $body", nm, t)
        }
        sb.append(s"group [grp] (\n  sort [$sortDir]\n  derive [${assigns.map(_._1).mkString(", ")}]\n)\n")
        st = st.copy(cols = st.cols ++ assigns.map(a => a._2 -> a._3))
      }
    }
    val terminal = r.nextInt(9)
    if (terminal < 4 && st.cols.exists(_._1 == "grp")) {
      // multi-key grouping (fuzzer round 8): (grp, s) pairs are non-unique
      // rows but a total-order key set for the aggregated relation
      val gkeys = if (st.cols.exists(_._1 == "s") && r.nextInt(3) == 0)
        Seq("grp", "s") else Seq("grp")
      val numCols = colsOf(st, 'n')
      val aggs = Vector("n = count") ++
        (if (numCols.nonEmpty) {
          val c = numCols(r.nextInt(numCols.size))
          // stddev/count_distinct/round-average (fuzzer round 6); both
          // backends aggregate through the same hash-shuffled Spark plan,
          // so stddev's merge order — hence its double — is stable
          // count-with-arg and aggregate-over-expression (fuzzer round 7)
          r.shuffle(Vector(s"sv = (sum $c)", s"mn = (min $c)", s"mx = (max $c)",
            s"av = (average $c)", s"cd = (count_distinct $c)",
            s"sd = (round (stddev $c) 6)",
            s"ra = (round (average $c) 2)",
            s"ct = (count $c)",
            s"se = (sum ($c + ${r.nextInt(9) + 1}))")).take(r.nextInt(3) + 1)
        } else Vector.empty)
      sb.append(s"group [${gkeys.mkString(", ")}] (aggregate [${aggs.mkString(", ")}])\n")
      st = St(gkeys.map(_ -> 's').toVector ++ Vector("n" -> 'n') ++
        aggs.collect {
          case a if a.startsWith("sv") || a.startsWith("mn") || a.startsWith("mx") =>
            a.take(2) -> 'n'
          case a if a.startsWith("cd") => "cd" -> 'n'
          case a if a.startsWith("ct") => "ct" -> 'n'
          case a if a.startsWith("se") => "se" -> 'n'
          case a if a.startsWith("av") => "av" -> 'd'
          case a if a.startsWith("sd") => "sd" -> 'd'
          case a if a.startsWith("ra") => "ra" -> 'd'
        }, if (gkeys.size == 1) Some("grp") else None, grouped = true)
      // post-aggregate derive over the agg outputs (fuzzer round 8)
      if (r.nextInt(3) == 0) {
        sb.append(s"derive [xg = (n * ${r.nextInt(5) + 1} + ${r.nextInt(20)})]\n")
        st = st.copy(cols = st.cols :+ ("xg" -> 'n'))
      }
      // optional HAVING + deterministic post-group sort/take (the key set
      // totally orders the aggregated relation, composite or not)
      if (r.nextBoolean()) sb.append(s"filter ${boolExpr(r, st, 0)}\n")
      if (r.nextBoolean()) {
        val ks = if (r.nextBoolean()) "-n" +: gkeys else gkeys
        sb.append(s"sort [${ks.mkString(", ")}]\n")
        if (r.nextBoolean()) sb.append(s"take ${r.nextInt(3) + 1}\n")
      }
    } else if (terminal == 8) {
      // global aggregate terminal (fuzzer round 8): no group — one row
      val numCols = colsOf(st, 'n')
      val aggs = Vector("n = count") ++
        (if (numCols.nonEmpty) {
          val c = numCols(r.nextInt(numCols.size))
          r.shuffle(Vector(s"sv = (sum $c)", s"mn = (min $c)",
            s"cd = (count_distinct $c)")).take(r.nextInt(2) + 1)
        } else Vector.empty)
      sb.append(s"aggregate [${aggs.mkString(", ")}]\n")
    } else if (terminal < 6) {
      // DISTINCT terminal (fuzzer round 6): select down to the key set,
      // `group ks (take 1)`; sorting by ALL remaining columns totally
      // orders a distinct relation, so a trailing take is deterministic
      val dcols = r.shuffle(st.cols.map(_._1)).take(r.nextInt(2) + 1).sorted
      sb.append(s"select [${dcols.mkString(", ")}]\n")
      sb.append(s"group [${dcols.mkString(", ")}] (take 1)\n")
      if (r.nextBoolean()) {
        sb.append(s"sort [${dcols.mkString(", ")}]\n")
        if (r.nextBoolean()) sb.append(s"take ${r.nextInt(8) + 1}\n")
      }
    }
    sb.result()
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect()
      .map(_.toSeq.map {
        case null => "NULL"
        case d: Double => f"$d%.9f"
        case x => x.toString
      }.mkString("|"))
      .sorted
      .toSeq
  }

  test("pending sort on a name the select REBINDS keeps ordering by the old value") {
    // review finding (r9): `sort x | select [x = <other>] | take k` — the
    // sort happened at its pipeline position over the OLD derived x; a
    // plain outer ORDER BY x would bind to the rebound alias instead
    fixture
    val prql =
      s"""from $View
         |derive x = (v ?? 0) + 1
         |sort [-x, id]
         |select [x = f, id]
         |take 3""".stripMargin
    val a = canon(Graft.compileSession(prql, spark))
    val b = canon(spark.sql(Graft.toSparkSql(prql)))
    assert(a == b, s"rebound-sort divergence:\n${Graft.toSparkSql(prql)}\n$a\nvs\n$b")
  }

  test("group-body select dropping or rebinding the sorted name still ranks by it (r9 review)") {
    fixture
    // dropped: the body select loses x9; the rank must still order by it
    val dropped =
      s"""from $View
         |derive x9 = (v ?? 0) * 3 + id
         |group [grp] (
         |  sort [-x9, id]
         |  select [grp = grp, id = id]
         |  take 2
         |)
         |sort [grp, id]""".stripMargin
    // rebound: the body select REBINDS x9 to f; rank orders by the OLD x9
    val rebound =
      s"""from $View
         |derive x9 = (v ?? 0) * 3 + id
         |group [grp] (
         |  sort [-x9, id]
         |  select [grp = grp, id = id, x9 = f]
         |  take 2
         |)
         |sort [grp, id]""".stripMargin
    for (prql <- Seq(dropped, rebound)) {
      val a = canon(Graft.compileSession(prql, spark))
      val b = canon(spark.sql(Graft.toSparkSql(prql)))
      assert(a == b, s"grouped-take carry divergence:\n$prql\n${Graft.toSparkSql(prql)}\n$a\nvs\n$b")
      assert(a.nonEmpty)
    }
  }

  test("wildcard select rebinding a sorted name is a named SQL-backend refusal (r9 review)") {
    fixture
    val prql =
      s"""from t = $View
         |sort [v, id]
         |select [t.*, v = f]
         |take 3""".stripMargin
    val e = intercept[Exception](Graft.toSparkSql(prql))
    assert(e.getMessage.contains("wildcard select rebinds"), e.getMessage)
  }

  test("qualified sort ident dropped by a select survives an interposing join flush (r9 review)") {
    fixture
    val prql =
      s"""from t = $View
         |sort [-t.id]
         |select [grp, v]
         |join side:inner fuzz_dim [grp]
         |take 5""".stripMargin
    val a = canon(Graft.compileSession(prql, spark))
    val b = canon(spark.sql(Graft.toSparkSql(prql)))
    assert(a == b, s"qualified-sort carry divergence:\n${Graft.toSparkSql(prql)}\n$a\nvs\n$b")
    assert(a.nonEmpty)
  }

  test("sql backend row-equals the DataFrame path on 250 random pipelines (GRAFT_FUZZ_N/_OFFSET extend)") {
    fixture
    var nonEmpty = 0
    val fuzzN = sys.env.getOrElse("GRAFT_FUZZ_N", "250").toInt
    val fuzzOff = sys.env.getOrElse("GRAFT_FUZZ_OFFSET", "0").toInt
    (1 + fuzzOff to fuzzN + fuzzOff).foreach { seed =>
      val prql = genPipeline(seed)
      val dfPath =
        try Graft.compileSession(prql, spark)
        catch { case e: Throwable =>
          fail(s"seed=$seed DataFrame compile failed: ${e.getMessage.take(300)}\n--- prql:\n$prql")
        }
      val sql = Graft.toSparkSql(prql)
      val sqlPath =
        try spark.sql(sql)
        catch { case e: Throwable =>
          fail(s"seed=$seed generated SQL failed:\n$sql\n${e.getMessage.take(300)}\n--- prql:\n$prql")
        }
      val (a, b) =
        try (canon(dfPath), canon(sqlPath))
        catch { case e: Throwable =>
          fail(s"seed=$seed runtime failure: ${e.getMessage.take(300)}\n--- prql:\n$prql\n--- sql:\n$sql")
        }
      assert(a == b,
        s"seed=$seed row mismatch (${a.length} vs ${b.length} rows)\n--- prql:\n$prql\n--- sql:\n$sql\n" +
          s"first diff: ${a.zip(b).find(p => p._1 != p._2).orElse(Some(("<len>", "<len>")))}")
      if (a.nonEmpty) nonEmpty += 1
    }
    // the property is vacuous if filters empty everything out
    assert(nonEmpty >= fuzzN / 2,
      s"only $nonEmpty/$fuzzN pipelines returned rows — generator too restrictive")
  }
}
