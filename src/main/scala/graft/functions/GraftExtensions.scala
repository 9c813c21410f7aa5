package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Deployment-grade registration of the graft kernels: a standard
  * `SparkSessionExtensions` injector (`spark.sql.extensions=
  * graft.functions.GraftExtensions`, or `builder.withExtensions`) that
  * puts every corpus-independent kernel into the session's built-in
  * function registry at SESSION BUILD — a cluster user gets `graft_dot`,
  * `graft_nfc`, the bloom pair, and the sketch aggregates in plain SQL
  * with no driver-side `GraftFunctions.register*` call, and
  * `spark.newSession()` isolation keeps them (unlike temp functions).
  *
  * Parameterized sketches take their parameter as an OPTIONAL TRAILING
  * LITERAL instead of a registration-bound constant: `graft_kmv(h)` /
  * `graft_kmv(h, 256)`, `graft_aes_topk(key, id, w)` /
  * `graft_aes_topk(key, id, w, 32)`, `graft_top_terms(words, 10)`. The
  * per-call `GraftFunctions.register*` path stays for the operators (a
  * temp function shadows the injected one, so a bound-k registration
  * still wins in its session). The corpus-geometry kernels
  * (`graft_minhash`, `graft_srp_keys`) are deliberately NOT injectable:
  * their coefficients derive from a corpus count at run time
  * (p04Run/p08Run), so registration is part of those operators' action
  * sequence.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def litInt(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a foldable literal")
    val v = e.eval()
    require(v != null, s"$what must not be NULL")
    v.asInstanceOf[Number].intValue
  }

  // wrong arity must be a NAMED error with the expected signature, not a
  // raw IndexOutOfBoundsException — the repo's located-error contract
  private def arity(e: Seq[Expression], sig: String, ok: Int*): Unit =
    require(ok.contains(e.length),
      s"$sig expects ${ok.mkString(" or ")} argument(s), got ${e.length}")

  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String)(builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        (exprs: Seq[Expression]) => builder(exprs)))

    inject("graft_dot") { e =>
      arity(e, "graft_dot(a, b)", 2); GraftDot(e(0), e(1))
    }
    inject("graft_nfc") { e =>
      arity(e, "graft_nfc(s)", 1); GraftNfc(e.head)
    }
    inject("graft_md5h32") { e =>
      arity(e, "graft_md5h32(s)", 1); GraftMd5H32(e.head)
    }
    inject("graft_md5h60") { e =>
      arity(e, "graft_md5h60(s)", 1); GraftMd5H60(e.head)
    }
    inject("graft_bloom_agg") { e =>
      arity(e, "graft_bloom_agg(longCol, estItems, numBits)", 3)
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        e(0), e(1), e(2))
    }
    inject("graft_bloom_contains") { e =>
      arity(e, "graft_bloom_contains(bloomBytes, longCol)", 2)
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(e(0), e(1))
    }
    inject("graft_kmv") { e =>
      arity(e, "graft_kmv(hash[, k])", 1, 2)
      val k = if (e.length >= 2) litInt(e(1), "graft_kmv k") else 64
      GraftKmv(e.head, k)
    }
    inject("graft_aes_topk") { e =>
      arity(e, "graft_aes_topk(key, id, weight[, k])", 3, 4)
      val k = if (e.length >= 4) litInt(e(3), "graft_aes_topk k") else 8
      GraftAesTopK(e(0), e(1), e(2), k)
    }
    inject("graft_top_terms") { e =>
      arity(e, "graft_top_terms(words[, k])", 1, 2)
      val k = if (e.length >= 2) litInt(e(1), "graft_top_terms k") else 5
      GraftTopTerms(e.head, k)
    }
  }
}
