package graft.ast

import graft.ast.Expr._

/** JSON serialization of the AST — the reference's public IR surface
  * (prql-compiler/src/lib.rs:38-46 `to_json`/`from_json`; used by dbt-prql
  * and the language bindings). Hand-rolled (offline build: no JSON libs);
  * round-trip is exact: `fromJson(toJson(q)) == q` for every corpus query.
  */
object AstJson {

  // ---------------- writer ----------------

  def toJson(q: Query): String = {
    val sb = new StringBuilder
    wQuery(sb, q)
    sb.toString
  }

  private def wStr(sb: StringBuilder, s: String): Unit = {
    sb += '"'
    s.foreach {
      case '"' => sb ++= "\\\""
      case '\\' => sb ++= "\\\\"
      case '\n' => sb ++= "\\n"
      case '\r' => sb ++= "\\r"
      case '\t' => sb ++= "\\t"
      case c if c < ' ' => sb ++= f"\\u${c.toInt}%04x"
      case c => sb += c
    }
    sb += '"'
  }

  private def wArr[A](sb: StringBuilder, xs: Seq[A])(f: A => Unit): Unit = {
    sb += '['
    var first = true
    xs.foreach { x => if (!first) sb += ','; first = false; f(x) }
    sb += ']'
  }

  private def wQuery(sb: StringBuilder, q: Query): Unit = {
    sb ++= "{\"funcs\":"
    wArr(sb, q.funcs)(wFunc(sb, _))
    sb ++= ",\"tables\":"
    wArr(sb, q.tables) { t =>
      sb ++= "{\"name\":"; wStr(sb, t.name)
      sb ++= ",\"pipeline\":"; wExpr(sb, t.pipeline); sb += '}'
    }
    sb ++= ",\"main\":"
    q.main match {
      case Some(p) => wExpr(sb, p)
      case None => sb ++= "null"
    }
    sb += '}'
  }

  private def wFunc(sb: StringBuilder, f: FuncDef): Unit = {
    sb ++= "{\"name\":"; wStr(sb, f.name)
    sb ++= ",\"params\":"
    wArr(sb, f.params) { p =>
      sb ++= "{\"name\":"; wStr(sb, p.name)
      p.default.foreach { d => sb ++= ",\"default\":"; wExpr(sb, d) }
      sb += '}'
    }
    sb ++= ",\"body\":"; wExpr(sb, f.body); sb += '}'
  }

  private def tag(sb: StringBuilder, t: String): Unit = {
    sb ++= "{\"t\":"; wStr(sb, t)
  }

  private def wExpr(sb: StringBuilder, e: Expr): Unit = e match {
    case Ident(parts) =>
      tag(sb, "Ident"); sb ++= ",\"parts\":"; wArr(sb, parts)(wStr(sb, _)); sb += '}'
    case NullLit => tag(sb, "Null"); sb += '}'
    case IntLit(v) => tag(sb, "Int"); sb ++= s",\"v\":$v}"
    case FloatLit(v) => tag(sb, "Float"); sb ++= s",\"v\":$v}"
    case BoolLit(v) => tag(sb, "Bool"); sb ++= s",\"v\":$v}"
    case StrLit(v) => tag(sb, "Str"); sb ++= ",\"v\":"; wStr(sb, v); sb += '}'
    case DateLit(s) => tag(sb, "Date"); sb ++= ",\"v\":"; wStr(sb, s); sb += '}'
    case TimeLit(s) => tag(sb, "Time"); sb ++= ",\"v\":"; wStr(sb, s); sb += '}'
    case TimestampLit(s) => tag(sb, "Timestamp"); sb ++= ",\"v\":"; wStr(sb, s); sb += '}'
    case IntervalLit(n, u) =>
      tag(sb, "Interval"); sb ++= s",\"n\":$n,\"unit\":"; wStr(sb, u); sb += '}'
    case JinjaLit(s) => tag(sb, "Jinja"); sb ++= ",\"v\":"; wStr(sb, s); sb += '}'
    case RangeLit(a, b) =>
      tag(sb, "Range")
      a.foreach { x => sb ++= ",\"start\":"; wExpr(sb, x) }
      b.foreach { x => sb ++= ",\"end\":"; wExpr(sb, x) }
      sb += '}'
    case Binary(op, l, r) =>
      tag(sb, "Binary"); sb ++= ",\"op\":"; wStr(sb, op)
      sb ++= ",\"l\":"; wExpr(sb, l); sb ++= ",\"r\":"; wExpr(sb, r); sb += '}'
    case Unary(op, x) =>
      tag(sb, "Unary"); sb ++= ",\"op\":"; wStr(sb, op)
      sb ++= ",\"e\":"; wExpr(sb, x); sb += '}'
    case FuncCall(n, args, named) =>
      tag(sb, "Call"); sb ++= ",\"name\":"; wStr(sb, n)
      sb ++= ",\"args\":"; wArr(sb, args)(wExpr(sb, _))
      sb ++= ",\"named\":"
      wArr(sb, named) { case (k, v) =>
        sb ++= "{\"name\":"; wStr(sb, k); sb ++= ",\"e\":"; wExpr(sb, v); sb += '}'
      }
      sb += '}'
    case Assign(n, x) =>
      tag(sb, "Assign"); sb ++= ",\"name\":"; wStr(sb, n)
      sb ++= ",\"e\":"; wExpr(sb, x); sb += '}'
    case EList(items) =>
      tag(sb, "List"); sb ++= ",\"items\":"; wArr(sb, items)(wExpr(sb, _)); sb += '}'
    case SStr(parts) =>
      tag(sb, "SString"); sb ++= ",\"parts\":"; wParts(sb, parts); sb += '}'
    case FStr(parts) =>
      tag(sb, "FString"); sb ++= ",\"parts\":"; wParts(sb, parts); sb += '}'
    case Pipeline(stages) =>
      tag(sb, "Pipeline"); sb ++= ",\"stages\":"; wArr(sb, stages)(wExpr(sb, _)); sb += '}'
  }

  private def wParts(sb: StringBuilder, ps: List[InterpPart]): Unit =
    wArr(sb, ps) {
      case IText(s) => sb ++= "{\"text\":"; wStr(sb, s); sb += '}'
      case IExpr(e) => sb ++= "{\"expr\":"; wExpr(sb, e); sb += '}'
    }

  // ---------------- reader ----------------

  def fromJson(json: String): Query = {
    val v = new JsonParser(json).parse()
    rQuery(v)
  }

  // minimal JSON value model
  private sealed trait JV
  private case class JObj(fields: Map[String, JV]) extends JV
  private case class JArr(items: List[JV]) extends JV
  private case class JStr(v: String) extends JV
  private case class JNum(v: String) extends JV
  private case class JBool(v: Boolean) extends JV
  private case object JNull extends JV

  private final class JsonParser(s: String) {
    private var i = 0
    private def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"bad AST json at $i: $msg")

    def parse(): JV = { ws(); val v = value(); ws(); v }

    private def value(): JV = {
      ws()
      s.charAt(i) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => JStr(str())
        case 't' => expect("true"); JBool(true)
        case 'f' => expect("false"); JBool(false)
        case 'n' => expect("null"); JNull
        case _ => num()
      }
    }

    private def expect(lit: String): Unit =
      if (s.startsWith(lit, i)) i += lit.length else fail(s"expected $lit")

    private def obj(): JObj = {
      i += 1; ws()
      val m = Map.newBuilder[String, JV]
      if (s.charAt(i) == '}') { i += 1; return JObj(m.result()) }
      var going = true
      while (going) {
        ws(); val k = str(); ws()
        if (s.charAt(i) != ':') fail("expected ':'")
        i += 1
        m += (k -> value()); ws()
        s.charAt(i) match {
          case ',' => i += 1
          case '}' => i += 1; going = false
          case c => fail(s"expected ',' or '}', got $c")
        }
      }
      JObj(m.result())
    }

    private def arr(): JArr = {
      i += 1; ws()
      val b = List.newBuilder[JV]
      if (s.charAt(i) == ']') { i += 1; return JArr(b.result()) }
      var going = true
      while (going) {
        b += value(); ws()
        s.charAt(i) match {
          case ',' => i += 1
          case ']' => i += 1; going = false
          case c => fail(s"expected ',' or ']', got $c")
        }
      }
      JArr(b.result())
    }

    private def str(): String = {
      if (s.charAt(i) != '"') fail("expected string")
      i += 1
      val sb = new StringBuilder
      while (s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          i += 1
          s.charAt(i) match {
            case '"' => sb += '"'
            case '\\' => sb += '\\'
            case '/' => sb += '/'
            case 'n' => sb += '\n'
            case 'r' => sb += '\r'
            case 't' => sb += '\t'
            case 'b' => sb += '\b'
            case 'f' => sb += '\f'
            case 'u' =>
              sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar
              i += 4
            case c2 => fail(s"bad escape \\$c2")
          }
        } else sb += c
        i += 1
      }
      i += 1
      sb.toString
    }

    private def num(): JNum = {
      val start = i
      while (i < s.length && (s.charAt(i).isDigit || "+-.eE".contains(s.charAt(i)))) i += 1
      if (i == start) fail("expected value")
      JNum(s.substring(start, i))
    }
  }

  private def jObj(v: JV): Map[String, JV] = v match {
    case JObj(f) => f
    case other => throw new IllegalArgumentException(s"expected object, got $other")
  }
  private def jArr(v: JV): List[JV] = v match {
    case JArr(xs) => xs
    case other => throw new IllegalArgumentException(s"expected array, got $other")
  }
  private def jStr(v: JV): String = v match {
    case JStr(x) => x
    case other => throw new IllegalArgumentException(s"expected string, got $other")
  }

  private def rQuery(v: JV): Query = {
    val f = jObj(v)
    Query(
      funcs = jArr(f("funcs")).map(rFunc),
      tables = jArr(f("tables")).map { t =>
        val tf = jObj(t)
        TableDef(jStr(tf("name")), rExpr(tf("pipeline")).asInstanceOf[Pipeline])
      },
      main = f("main") match {
        case JNull => None
        case p => Some(rExpr(p).asInstanceOf[Pipeline])
      })
  }

  private def rFunc(v: JV): FuncDef = {
    val f = jObj(v)
    FuncDef(jStr(f("name")),
      jArr(f("params")).map { p =>
        val pf = jObj(p)
        FuncDef.Param(jStr(pf("name")), pf.get("default").map(rExpr))
      },
      rExpr(f("body")))
  }

  private def rExpr(v: JV): Expr = {
    val f = jObj(v)
    jStr(f("t")) match {
      case "Ident" => Ident(jArr(f("parts")).map(jStr))
      case "Null" => NullLit
      case "Int" => IntLit(f("v").asInstanceOf[JNum].v.toLong)
      case "Float" => FloatLit(f("v").asInstanceOf[JNum].v.toDouble)
      case "Bool" => BoolLit(f("v").asInstanceOf[JBool].v)
      case "Str" => StrLit(jStr(f("v")))
      case "Date" => DateLit(jStr(f("v")))
      case "Time" => TimeLit(jStr(f("v")))
      case "Timestamp" => TimestampLit(jStr(f("v")))
      case "Interval" => IntervalLit(f("n").asInstanceOf[JNum].v.toLong, jStr(f("unit")))
      case "Jinja" => JinjaLit(jStr(f("v")))
      case "Range" => RangeLit(f.get("start").map(rExpr), f.get("end").map(rExpr))
      case "Binary" => Binary(jStr(f("op")), rExpr(f("l")), rExpr(f("r")))
      case "Unary" => Unary(jStr(f("op")), rExpr(f("e")))
      case "Call" => FuncCall(jStr(f("name")), jArr(f("args")).map(rExpr),
        jArr(f("named")).map { n =>
          val nf = jObj(n); (jStr(nf("name")), rExpr(nf("e")))
        })
      case "Assign" => Assign(jStr(f("name")), rExpr(f("e")))
      case "List" => EList(jArr(f("items")).map(rExpr))
      case "SString" => SStr(rParts(f("parts")))
      case "FString" => FStr(rParts(f("parts")))
      case "Pipeline" => Pipeline(jArr(f("stages")).map(rExpr))
      case other => throw new IllegalArgumentException(s"unknown AST tag $other")
    }
  }

  private def rParts(v: JV): List[InterpPart] =
    jArr(v).map { p =>
      val pf = jObj(p)
      pf.get("text") match {
        case Some(t) => IText(jStr(t))
        case None => IExpr(rExpr(pf("expr")))
      }
    }
}
