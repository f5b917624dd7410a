package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Conversation assembly: rendered transcript + loss-mask char spans. */
class SftAssemblySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("transcript order, mask spans, and span/text agreement") {
    val df = Seq(
      (1L, 2L, "assistant", "hello there"),
      (1L, 1L, "user", "hi"),
      (1L, 3L, "user", "bye"),
      (2L, 1L, "assistant", "solo")
    ).toDF("conv", "seq", "role", "txt")
    val got = SftAssembly.assembleConversations(df, col("conv"),
        Seq(col("seq")), col("role"), col("txt"), maskRoles = Seq("assistant"))
      .orderBy("grp")
      .as[(Long, Long, String, String)].collect().toSeq

    assert(got(0)._2 === 3L)
    assert(got(0)._3 === "[user] hi\n[assistant] hello there\n[user] bye")
    // "[user] hi" = 9 chars, newline -> assistant line spans [10, 33)
    assert(got(0)._4 === "10:33")
    assert(got(0)._3.substring(10, 33) === "[assistant] hello there")

    assert(got(1)._3 === "[assistant] solo")
    assert(got(1)._4 === "0:16")

    // no masked roles -> empty span list
    val none = SftAssembly.assembleConversations(df, col("conv"),
        Seq(col("seq")), col("role"), col("txt"), maskRoles = Seq("system"))
      .select("mask_spans").as[String].collect().toSeq
    assert(none === Seq("", ""))
  }

  test("multiple masked turns join spans in turn order") {
    val df = Seq(
      (1L, 1L, "a", "x"),
      (1L, 2L, "b", "yy"),
      (1L, 3L, "a", "z")
    ).toDF("conv", "seq", "role", "txt")
    val got = SftAssembly.assembleConversations(df, col("conv"),
        Seq(col("seq")), col("role"), col("txt"), maskRoles = Seq("a"))
      .select("transcript", "mask_spans").as[(String, String)].collect().head
    // lines: "[a] x"(5) "\n" "[b] yy"(6) "\n" "[a] z"(5)
    assert(got._1 === "[a] x\n[b] yy\n[a] z")
    assert(got._2 === "0:5|13:18")
    assert(got._1.substring(13, 18) === "[a] z")
  }
}
