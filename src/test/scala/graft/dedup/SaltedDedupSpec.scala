package graft.dedup

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SaltedDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("salted two-phase dedup == window dedup (total ordering per key)") {
    val ev = Tables.events(spark, TestSpark.sf)
    val window = Dedup.retainMostRecent(ev, Seq(col("user_id")), col("ts"), col("event_id"))
      .select("user_id", "event_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val salted = Dedup.retainMostRecentSalted(ev, Seq("user_id"), Seq("ts", "event_id"))
      .select("user_id", "event_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(salted === window)
  }

  test("salted dedup plan has NO single-key exchange before partial reduction") {
    val ev = Tables.events(spark, TestSpark.sf)
    val plan = Dedup.retainMostRecentSalted(ev, Seq("user_id"), Seq("ts", "event_id"))
      .queryExecution.executedPlan.toString
    // two-phase: a (key, salt) aggregate must appear before the
    // key-only aggregate; the hot key is split across salt buckets
    // (Catalyst renames the salt alias to _groupingexpression, so we
    // look for the salt expression and the two-key exchange instead)
    assert(plan.contains("pmod(hash("), plan.take(2000))
    assert(plan.contains("hashpartitioning(user_id"), plan.take(2000))
  }
}
