package graft.search

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Solr function-query compiler — the `defType=func` / `sort=` /
 * boost-function surface: a function-query string compiles to a
 * Catalyst Column over the frame's schema, so `sort=div(x,y) desc`,
 * `boost=recip(age,1,1000,1000)` and bf/boost edismax parameters all
 * become ordinary projections the optimizer can see through
 * (codegen'd scalar math — never a per-row interpreter).
 *
 * Supported functions (the commonly-used Solr set):
 *   sum, sub, product, div, min, max, abs, sqrt, log (base 10),
 *   ln, pow, recip(x,m,a,b) = a/(m·x+b), linear(x,m,c) = m·x+c,
 *   if(test,then,else), field references, numeric literals.
 *
 * Floating-point parity: +,-,*,/ and sqrt are IEEE correctly-rounded
 * — expressions built from those hash-match a DuckDB oracle (q164).
 * log/ln/pow route through libm (no cross-engine bit guarantee;
 * round before comparing).
 *
 * Grammar: `expr := func '(' expr (',' expr)* ')' | field | number`.
 */
object FunctionQuery {

  def compile(fq: String, schema: StructType): Column = {
    val p = new Parser(fq, schema)
    val c = p.parseExpr()
    p.skipWs()
    require(p.eof, s"trailing input in function query '$fq'")
    c
  }

  private final class Parser(s: String, schema: StructType) {
    private var pos = 0
    def eof: Boolean = pos >= s.length
    def skipWs(): Unit = while (!eof && s(pos).isWhitespace) pos += 1
    private def peek: Char = s(pos)

    private def token(): String = {
      skipWs()
      val start = pos
      while (!eof && (s(pos).isLetterOrDigit || "._-+".contains(s(pos))))
        pos += 1
      require(pos > start, s"expected token at $start in '$s'")
      s.substring(start, pos)
    }

    def parseExpr(): Column = {
      skipWs()
      // string literal (strdist's comparison argument)
      if (!eof && (peek == '"' || peek == '\'')) {
        val q = peek; pos += 1
        val start = pos
        while (!eof && peek != q) pos += 1
        require(!eof, s"unterminated string at $start in '$s'")
        val v = s.substring(start, pos); pos += 1
        return lit(v)
      }
      val t = token()
      skipWs()
      if (!eof && peek == '(') {
        pos += 1
        val args = scala.collection.mutable.ArrayBuffer[Column]()
        skipWs()
        if (!eof && peek != ')') {
          args += parseExpr()
          skipWs()
          while (!eof && peek == ',') { pos += 1; args += parseExpr(); skipWs() }
        }
        require(!eof && peek == ')', s"expected ) at $pos in '$s'")
        pos += 1
        apply(t, args.toSeq)
      } else if (t.head.isDigit || t.head == '-' || t.head == '+' || t.head == '.') {
        lit(t.toDouble)
      } else {
        require(schema.fieldNames.contains(t),
          s"unknown field '$t' in function query '$s' " +
            s"(have ${schema.fieldNames.mkString(",")})")
        // string fields stay strings (strdist operands); everything
        // else enters the numeric function space as double
        schema(t).dataType match {
          case org.apache.spark.sql.types.StringType => col(t)
          case _ => col(t).cast("double")
        }
      }
    }

    private def nary(args: Seq[Column], n: Int, fn: String): Unit =
      require(args.length == n, s"$fn() takes $n arguments in '$s'")

    private def apply(fn: String, args: Seq[Column]): Column = fn match {
      case "sum" => require(args.nonEmpty, "sum() needs arguments"); args.reduce(_ + _)
      case "sub" => nary(args, 2, fn); args(0) - args(1)
      case "product" => require(args.nonEmpty, "product() needs arguments"); args.reduce(_ * _)
      case "div" => nary(args, 2, fn); args(0) / args(1)
      case "min" => require(args.nonEmpty, "min() needs arguments"); least(args: _*)
      case "max" => require(args.nonEmpty, "max() needs arguments"); greatest(args: _*)
      case "abs" => nary(args, 1, fn); abs(args(0))
      case "sqrt" => nary(args, 1, fn); sqrt(args(0))
      case "log" => nary(args, 1, fn); log10(args(0))
      case "ln" => nary(args, 1, fn); log(args(0))
      case "pow" => nary(args, 2, fn); pow(args(0), args(1))
      // Solr recip(x,m,a,b) = a / (m*x + b)
      case "recip" => nary(args, 4, fn); args(2) / (args(1) * args(0) + args(3))
      // Solr linear(x,m,c) = m*x + c
      case "linear" => nary(args, 3, fn); args(1) * args(0) + args(2)
      case "if" => nary(args, 3, fn); when(args(0) =!= 0.0, args(1)).otherwise(args(2))
      case "map" => // map(x,min,max,target[,default]) — Solr ValueSource map
        require(args.length == 4 || args.length == 5, s"map() needs 4 or 5 args")
        val fallback = if (args.length == 5) args(4) else args(0)
        when(args(0) >= args(1) && args(0) <= args(2), args(3)).otherwise(fallback)
      case "termfreq" =>
        // Solr termfreq(field, 'term'): the term's frequency among the
        // field's ANALYZED tokens (plain lowercase alphanumerics — the
        // corpus-scan ranking tokenizer). Stays in codegen: one split
        // + filter count per row.
        nary(args, 2, fn)
        size(filter(split(lower(args(0)), "[^a-z0-9]+"), t => t === args(1)))
          .cast("double")
      case "exists" =>
        nary(args, 1, fn)
        when(args(0).isNotNull, lit(1.0)).otherwise(lit(0.0))
      case "strdist" =>
        // Solr strdist(s1, s2[, edit]) with the edit measure:
        // 1 - levenshtein/maxLen, equal strings → 1.0, one exact IEEE
        // division (cross-engine stable); the 2-arg form is the
        // default-measure form
        nary(args, 2, fn)
        when(length(args(0)) === 0 && length(args(1)) === 0, lit(1.0))
          .otherwise(lit(1.0) - levenshtein(args(0), args(1)).cast("double") /
            greatest(length(args(0)), length(args(1))).cast("double"))
      case other => sys.error(s"unsupported function query function '$other'")
    }
  }

  /**
   * Solr `{!frange}` query parser: filter by a function query's
   * VALUE range — `{!frange l=0 u=2 incl=true incu=false}recip(x,1,
   * 1000,1000)`. Bounds are optional (absent = unbounded); incl/incu
   * default true, as in Solr's FunctionRangeQParserPlugin. Compiles
   * to a plain boolean Column over the compiled function — scan-local
   * codegen, pushdown-eligible when the function is.
   */
  def frange(q: String, schema: StructType): Column = {
    val m = """\{!frange\s+([^}]*)\}(.*)""".r
    q.trim match {
      case m(params, body) =>
        val kv = params.trim.split("\\s+").filter(_.nonEmpty).map { p =>
          val i = p.indexOf('=')
          require(i > 0, s"malformed local param '$p' in: $q")
          p.substring(0, i) -> p.substring(i + 1)
        }.toMap
        val v = compile(body.trim, schema)
        val incl = kv.get("incl").forall(_.toBoolean)
        val incu = kv.get("incu").forall(_.toBoolean)
        val loC = kv.get("l").map(_.toDouble)
          .map(b => if (incl) v >= b else v > b).getOrElse(lit(true))
        val hiC = kv.get("u").map(_.toDouble)
          .map(b => if (incu) v <= b else v < b).getOrElse(lit(true))
        loC && hiC
      case _ => sys.error(s"not a {!frange} query: $q")
    }
  }
}
