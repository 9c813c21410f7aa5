package graft

import graft.ast.PrqlPrinter
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Formatter property: parse(print(parse(src))) == parse(src) for every
  * golden corpus query (the reference CLI's `fmt` mode, cli.rs:20-36). */
class PrqlPrinterSpec extends AnyFunSuite {

  private val corpusRoot = Paths.get("/root/reference/book/tests/prql")

  private val files =
    Files.walk(corpusRoot).iterator().asScala
      .filter(_.toString.endsWith(".prql")).toSeq.sortBy(_.toString)

  for (f <- files) {
    val name = corpusRoot.relativize(f).toString
    test(s"fmt round-trip: $name") {
      val q = Graft.parse(new String(Files.readAllBytes(f), "UTF-8"))
      val printed = PrqlPrinter.print(q)
      val q2 =
        try Graft.parse(printed)
        catch {
          case e: Throwable =>
            fail(s"re-parse of printed output failed: ${e.getMessage}\n--- printed:\n$printed")
        }
      assert(q2 == q, s"--- printed:\n$printed")
    }
  }

  test("string literals with consecutive spaces survive fmt") {
    val q = Graft.parse("func f x -> x + \"a  b\"\n\nfrom t\nderive y = (f z)")
    assert(Graft.parse(PrqlPrinter.print(q)) == q)
  }

  test("printed output is stable (printing twice is identical)") {
    val src = "from employees\nfilter a > 1 and b < 2\nderive [x = a + b * 2, y = f\"{a}_{b}\"]\ntake 1..20\n"
    val q = Graft.parse(src)
    val p1 = PrqlPrinter.print(q)
    val p2 = PrqlPrinter.print(Graft.parse(p1))
    assert(p1 == p2)
  }
}
