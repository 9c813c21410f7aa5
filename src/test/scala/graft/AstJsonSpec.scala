package graft

import graft.ast.AstJson
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** JSON AST round-trip (the reference's to_json/from_json public IR,
  * lib.rs:38-46): fromJson(toJson(q)) == q for every golden corpus query. */
class AstJsonSpec extends AnyFunSuite {

  private val corpusRoot = Paths.get("/root/reference/book/tests/prql")

  private val files =
    Files.walk(corpusRoot).iterator().asScala
      .filter(_.toString.endsWith(".prql")).toSeq.sortBy(_.toString)

  test("json round-trip is exact for all corpus queries") {
    files.foreach { f =>
      val q = Graft.parse(new String(Files.readAllBytes(f), "UTF-8"))
      val back = AstJson.fromJson(AstJson.toJson(q))
      assert(back == q, s"round-trip mismatch for $f")
    }
  }

  test("json escapes control chars and quotes") {
    // PRQL strings have no escape sequences; a triple-quoted string can hold
    // quotes, tabs and newlines — which the JSON layer must escape
    val q = Graft.parse("from t\nderive x = \"\"\"a\"b\tc\nd\"\"\"")
    assert(AstJson.fromJson(AstJson.toJson(q)) == q)
  }
}
