package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native (codegen) vector kernels for the similarity operators.
  *
  * The SQL-HOF forms (`aggregate(zip_with(a, b, …))`) are semantically
  * right and oracle-portable, but Spark evaluates lambda functions
  * interpreted — no whole-stage codegen, no CSE — which made the hyperplane
  * sign bits and the candidate-verify cosine the dominant cost of p08
  * (~5 µs per 64-dim dot). These expressions generate the same arithmetic
  * (same left-to-right accumulation order ⇒ bit-identical doubles, so the
  * DuckDB oracle SQL is unchanged) as a tight Java loop inside whole-stage
  * codegen. This is the design-doc preference order at work: compose
  * built-ins where they're efficient, drop to a custom Catalyst
  * `Expression` with `doGenCode` where they're not.
  *
  * Registered per-session by [[GraftFunctions.ensureRegistered]] as
  * `graft_dot(a, b)` and `graft_srp_keys(embedding)`.
  */

/** Σ a(i)·b(i) over two float arrays, accumulated left-to-right in double —
  * exactly `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0.0d,
  * (acc,v) -> acc+v)`. Null if either side is null; null ELEMENTS are not
  * expected (embeddings are dense) and read as 0. Mismatched lengths yield
  * NULL — the HOF form's zip_with null-pads the shorter side and the null
  * propagates through the sum, so a truncated embedding row must surface
  * as missing, not as a silently-partial dot product. */
case class GraftDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  // may return null on length mismatch even over non-null inputs
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $acc = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
          }
          ${ev.value} = $acc;
        }
      """
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): GraftDot =
    copy(left = l, right = r)
}

/** All `bands` SRP band keys of one embedding in a single pass:
  * key(j) = j·2^r + Σ_k bit(j·r+k)·2^(r-1-k), where bit(p) = 1 iff the
  * plane-p Rademacher dot product is > 0 — value-identical to the HOF form
  * (`transform(sequence…, aggregate(zip_with(…)))` then per-band
  * `aggregate(slice(bits…))`), which accumulates the same products in the
  * same order. The ±1 plane matrix rides along as a codegen reference
  * object instead of a b·r·64-element SQL literal. An embedding whose
  * length differs from the plane width yields NULL (the HOF form's
  * zip_with null-pads and the null propagates through every band key) —
  * never keys computed from a truncated product. */
case class GraftSrpKeys(child: Expression, planes: Array[Array[Int]],
                        srpBits: Int, srpBands: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  // may return null on plane/embedding width mismatch over non-null input
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_srp_keys expects array<float>, got ${t.simpleString}")
    }
  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val dims = x.numElements()
    if (dims != planes(0).length) return null
    val keys = new Array[Int](srpBands)
    var j = 0
    while (j < srpBands) {
      var packed = 0
      var k = 0
      while (k < srpBits) {
        val plane = planes(j * srpBits + k)
        var acc = 0.0
        var d = 0
        val n = dims
        while (d < n) {
          acc += x.getFloat(d).toDouble * plane(d).toDouble
          d += 1
        }
        packed = packed * 2 + (if (acc > 0) 1 else 0)
        k += 1
      }
      keys(j) = (j << srpBits) + packed
      j += 1
    }
    new GenericArrayData(keys)
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "int[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val d = ctx.freshName("d")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val key = ctx.freshName("key")
      val keys = ctx.freshName("keys")
      val plane = ctx.freshName("plane")
      s"""
        if ($a.numElements() != $planesRef[0].length) {
          ${ev.isNull} = true;
        } else {
          int[] $keys = new int[$srpBands];
          for (int $j = 0; $j < $srpBands; $j++) {
            int $key = 0;
            for (int $k = 0; $k < $srpBits; $k++) {
              int[] $plane = $planesRef[$j * $srpBits + $k];
              double $acc = 0.0;
              int $n = $a.numElements();
              for (int $d = 0; $d < $n; $d++) {
                $acc += (double) $a.getFloat($d) * (double) $plane[$d];
              }
              $key = $key * 2 + ($acc > 0 ? 1 : 0);
            }
            $keys[$j] = ($j << $srpBits) + $key;
          }
          ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
        }
      """
    })
  }
  override protected def withNewChildInternal(c: Expression): GraftSrpKeys =
    copy(child = c)
}

/** All k minhash signature values of one shingle-hash array in a single
  * pass: sig(i) = min over h in hs of (a_i·h + b_i) mod p, initialized at
  * p — value-identical to the HOF fold
  * `aggregate(hs, array_repeat(p, k), (acc, h) -> zip_with(acc, seq,
  * (m, i) -> least(m, pmod(a_i*h + b_i, p))))`: pure integer arithmetic
  * (for the documented domain a_i, h < p < 2^31, a_i·h + b_i < 2^62 —
  * exact in long; for inputs outside it, a pmod-style sign adjustment
  * keeps results in [0, p) matching the SQL fold's pmod, though |h| ≥ p
  * values that overflow the long product are outside the exactness
  * contract), min is order-free. The HOF form walks
  * the array k times through interpreted lambdas allocating a k-array per
  * element; this is one k×n Java loop inside whole-stage codegen. NULL
  * elements are skipped (Spark's `least` ignores nulls — same fold
  * result); a NULL array yields NULL. */
case class GraftMinhash(child: Expression, hashA: Array[Long],
                        hashB: Array[Long], p: Long) extends UnaryExpression {
  private val k = hashA.length
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_minhash expects array<bigint>, got ${t.simpleString}")
    }
  override def nullSafeEval(a: Any): Any = {
    val hs = a.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val sig = Array.fill(k)(p)
    var j = 0
    while (j < n) {
      if (!hs.isNullAt(j)) {
        val h = hs.getLong(j)
        var i = 0
        while (i < k) {
          var v = (hashA(i) * h + hashB(i)) % p
          if (v < 0) v += p // pmod: graft_minhash is session-registered, so
          // negative caller inputs must not yield negative signature values
          if (v < sig(i)) sig(i) = v
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(sig)
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("hashA", hashA, "long[]")
    val bRef = ctx.addReferenceObj("hashB", hashB, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val sig = ctx.freshName("sig")
      s"""
        int $n = $a.numElements();
        long[] $sig = new long[$k];
        java.util.Arrays.fill($sig, ${p}L);
        for (int $j = 0; $j < $n; $j++) {
          if (!$a.isNullAt($j)) {
            long $h = $a.getLong($j);
            for (int $i = 0; $i < $k; $i++) {
              long $v = ($aRef[$i] * $h + $bRef[$i]) % ${p}L;
              if ($v < 0) $v += ${p}L;
              if ($v < $sig[$i]) $sig[$i] = $v;
            }
          }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
      """
    })
  }
  override protected def withNewChildInternal(c: Expression): GraftMinhash =
    copy(child = c)
}

/** The p14 top-k-terms fold in one native pass: sort the token array
  * (binary UTF8 order — UTF8String.compareTo IS array_sort's StringType
  * ordering), count runs, and keep the k smallest rank keys
  * `lpad(99999 - min(cnt, 99999), 5, '0') || term` — byte-identical to the
  * interpreted `aggregate(array_sort(words), …)` accumulator fold it
  * replaces (same clamp, same key bytes, same ascending order), which paid
  * an interpreted lambda + a ≤(k+1)-array sort per DISTINCT term. Null
  * tokens cannot occur (the tokenizer splits non-null text) and are
  * skipped defensively; a NULL array yields NULL; an empty array yields an
  * empty key array (upstream filters size(words) > 0). */
case class GraftTopTerms(child: Expression, k: Int) extends UnaryExpression {
  import org.apache.spark.unsafe.types.UTF8String
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_top_terms expects array<string>, got ${t.simpleString}")
    }
  override def nullSafeEval(a: Any): Any = {
    val in = a.asInstanceOf[ArrayData]
    val n = in.numElements()
    val words = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      if (!in.isNullAt(i)) words.add(in.getUTF8String(i))
      i += 1
    }
    java.util.Collections.sort(words) // binary order, = array_sort(StringType)
    val top = new java.util.ArrayList[UTF8String](k + 1)
    def insert(term: UTF8String, cnt: Int): Unit = {
      val rank = 99999 - math.min(cnt, 99999)
      val key = UTF8String.concat(UTF8String.fromString(f"$rank%05d"), term)
      var pos = 0
      while (pos < top.size() && top.get(pos).compareTo(key) <= 0) pos += 1
      if (pos < k) {
        top.add(pos, key)
        if (top.size() > k) top.remove(k)
      }
    }
    var cur: UTF8String = null
    var cnt = 0
    val m = words.size()
    i = 0
    while (i < m) {
      val w = words.get(i)
      if (cur == null) { cur = w; cnt = 1 }
      else if (w.equals(cur)) cnt += 1
      else { insert(cur, cnt); cur = w; cnt = 1 }
      i += 1
    }
    if (cur != null) insert(cur, cnt)
    new GenericArrayData(top.toArray.asInstanceOf[Array[AnyRef]])
  }
  // interpreted-eval only: the per-row work is a sort + object-array run
  // fold — codegen would re-emit the identical JVM calls with no lambda to
  // eliminate (unlike the arithmetic kernels above), so the split-out
  // method form buys nothing. Marked CodegenFallback keeps the surrounding
  // projection inside whole-stage codegen.
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("topTerms", this,
      "graft.functions.GraftTopTerms")
    nullSafeCodeGen(ctx, ev, a => {
      s"""
        ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
          $self.nullSafeEval($a);
      """
    })
  }
  override protected def withNewChildInternal(c: Expression): GraftTopTerms =
    copy(child = c)
}

/** Session registration for the native kernels (idempotent — the pipeline
  * run functions call this on every invocation; re-registering only when
  * something changed keeps the registry's replaced-function WARN quiet). */
object GraftFunctions {
  // Every memo is keyed on the BOUND PARAMETERS (ADVICE r5: a boolean memo
  // silently ignored a later registration with different constants, leaving
  // a stale function in the session — unlike srpRegistered, which already
  // re-registered on geometry change).
  private val dotRegistered = java.util.Collections.newSetFromMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())
  private val srpRegistered = new java.util.WeakHashMap[SparkSession, (Int, Int)]()
  private val topTermsRegistered = new java.util.WeakHashMap[SparkSession, Int]()
  private val minhashRegistered =
    new java.util.WeakHashMap[SparkSession, (Seq[Long], Seq[Long], Long)]()

  def registerDot(spark: SparkSession): Unit = synchronized {
    if (dotRegistered.add(spark))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction("graft_dot",
        exprs => GraftDot(exprs(0), exprs(1)), "built-in")
  }

  private val nfcRegistered = java.util.Collections.newSetFromMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** `graft_nfc(string)` — parameterless, so a boolean memo suffices. */
  def registerNfc(spark: SparkSession): Unit = synchronized {
    if (nfcRegistered.add(spark))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction("graft_nfc",
        exprs => GraftNfc(exprs.head), "built-in")
  }

  private val md5Registered = java.util.Collections.newSetFromMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** `graft_md5h32` / `graft_md5h60` — parameterless, boolean memo. */
  def registerMd5(spark: SparkSession): Unit = synchronized {
    if (md5Registered.add(spark)) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction("graft_md5h32",
        exprs => GraftMd5H32(exprs.head), "built-in")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction("graft_md5h60",
        exprs => GraftMd5H60(exprs.head), "built-in")
    }
  }

  private val kmvRegistered = new java.util.WeakHashMap[SparkSession, Int]()

  /** `graft_kmv(hash)` aggregate with k bound at registration; re-registers
    * when k changes. */
  def registerKmv(spark: SparkSession, k: Int): Unit = synchronized {
    if (!kmvRegistered.containsKey(spark) || kmvRegistered.get(spark) != k) {
      kmvRegistered.put(spark, k)
      spark.sessionState.functionRegistry.createOrReplaceTempFunction("graft_kmv",
        exprs => GraftKmv(exprs.head, k), "built-in")
    }
  }

  /** `graft_top_terms(words)` with k bound at registration; re-registers
    * when k changes. */
  def registerTopTerms(spark: SparkSession, k: Int): Unit = synchronized {
    if (!topTermsRegistered.containsKey(spark) || topTermsRegistered.get(spark) != k) {
      topTermsRegistered.put(spark, k)
      spark.sessionState.functionRegistry.createOrReplaceTempFunction("graft_top_terms",
        exprs => GraftTopTerms(exprs.head, k), "built-in")
    }
  }

  /** `graft_minhash(hs)` with the permutation coefficients and modulus
    * bound at registration; re-registers when any of them change. */
  def registerMinhash(spark: SparkSession, hashA: Array[Long],
                      hashB: Array[Long], p: Long): Unit = synchronized {
    val key = (hashA.toSeq, hashB.toSeq, p)
    if (minhashRegistered.get(spark) != key) {
      minhashRegistered.put(spark, key)
      spark.sessionState.functionRegistry.createOrReplaceTempFunction("graft_minhash",
        exprs => GraftMinhash(exprs.head, hashA, hashB, p), "built-in")
    }
  }

  private val aesTopKRegistered = new java.util.WeakHashMap[SparkSession, Int]()

  /** `graft_aes_topk(aes_key, doc_id, weight [, k])` aggregate with the
    * default k bound at registration; an explicit trailing literal k wins
    * (matching the [[GraftExtensions]] injected form, so the two
    * registration paths cannot disagree). Re-registers when the bound
    * default changes. */
  def registerAesTopK(spark: SparkSession, k: Int): Unit = synchronized {
    if (!aesTopKRegistered.containsKey(spark) || aesTopKRegistered.get(spark) != k) {
      aesTopKRegistered.put(spark, k)
      spark.sessionState.functionRegistry.createOrReplaceTempFunction("graft_aes_topk",
        exprs => {
          val kk = if (exprs.length >= 4) {
            require(exprs(3).foldable, "graft_aes_topk k must be a foldable literal")
            val v = exprs(3).eval()
            require(v != null, "graft_aes_topk k must not be NULL")
            v.asInstanceOf[Number].intValue
          } else k
          GraftAesTopK(exprs(0), exprs(1), exprs(2), kk)
        }, "built-in")
    }
  }

  private val bloomRegistered = java.util.Collections.newSetFromMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** `graft_bloom_agg(longCol, estItems, numBits)` and
    * `graft_bloom_contains(bloomBytes, longCol)` — Spark's OWN runtime
    * bloom-filter expressions (`BloomFilterAggregate` /
    * `BloomFilterMightContain`, the machinery behind
    * InjectRuntimeFilter's join pruning), surfaced as SQL functions so a
    * pipeline can build an EXPLICIT membership prefilter over a corpus.
    * Spark keeps them out of the public registry because the optimizer
    * normally injects them itself; here the pipeline IS the optimizer.
    * `graft_bloom_contains`'s first argument must be a scalar subquery or
    * literal (the expression's own foldability contract — the sketch is
    * built once and shipped to every task, never joined row-wise). */
  def registerBloom(spark: SparkSession): Unit = synchronized {
    if (bloomRegistered.add(spark)) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction("graft_bloom_agg",
        exprs => new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          exprs(0), exprs(1), exprs(2)), "built-in")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction("graft_bloom_contains",
        exprs => org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          exprs(0), exprs(1)), "built-in")
    }
  }

  /** `graft_srp_keys(embedding)` with the plane matrix and band geometry
    * bound at registration (they derive from the corpus count — p08Run). */
  def registerSrpKeys(spark: SparkSession, srpPlanes: Array[Array[Int]],
                      srpBits: Int, srpBands: Int): Unit = synchronized {
    if (srpRegistered.get(spark) != ((srpBits, srpBands))) {
      srpRegistered.put(spark, (srpBits, srpBands))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction("graft_srp_keys",
        exprs => GraftSrpKeys(exprs.head, srpPlanes, srpBits, srpBands), "built-in")
    }
  }
}
