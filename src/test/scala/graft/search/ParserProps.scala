package graft.search

import graft.etl.MorphlineConfig
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Adversarial-input properties for the two hand-rolled parsers: on
  * ARBITRARY byte soup they must terminate promptly and fail only with
  * the declared exception type — never hang, never throw raw
  * IndexOutOfBounds/StackOverflow (the RTF-scanner fuzz discipline,
  * applied to the query-string and HOCON readers). */
object ParserProps extends Properties("parsers") {

  private val schema = StructType(Seq(
    StructField("text", StringType), StructField("lang", StringType),
    StructField("n", LongType)))

  private def terminates(block: => Any): Boolean =
    try { block; true }
    catch {
      case _: IllegalArgumentException => true // the declared failure mode
      case _: Throwable => false
    }

  property("SolrQueryString: any unicode garbage terminates with the declared error") =
    forAll { (s: String) =>
      terminates(SolrQueryString.compile(s, schema, "text", Set("text")))
    }

  property("SolrQueryString: any ascii-printable soup terminates") =
    forAll(Gen.listOf(Gen.asciiPrintableChar).map(_.mkString)) { s =>
      terminates(SolrQueryString.compile(s, schema, "text", Set("text")))
    }

  property("SolrQueryString: structural-char soup terminates") =
    forAll(Gen.listOf(Gen.oneOf('(', ')', '[', ']', '{', '}', ':', '"', '*', '?',
      '-', '+', ' ', 'a', 'O', 'R', 'A', 'N', 'D', 'T')).map(_.mkString)) { s =>
      terminates(SolrQueryString.compile(s, schema, "text", Set("text")))
    }

  property("Hocon/MorphlineConfig: any unicode garbage terminates with the declared error") =
    forAll { (s: String) =>
      terminates(MorphlineConfig.compile(s, strict = false))
    }

  property("Hocon/MorphlineConfig: brace/quote soup terminates") =
    forAll(Gen.listOf(Gen.oneOf('{', '}', '[', ']', ':', '=', ',', '"', '#', '/',
      '$', '\n', ' ', 'a', 'b')).map(_.mkString)) { s =>
      terminates(MorphlineConfig.compile(s, strict = false))
    }
}
