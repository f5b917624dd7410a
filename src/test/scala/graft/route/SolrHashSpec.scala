package graft.route

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class SolrHashSpec extends AnyFunSuite {

  private def h(s: String, seed: Int = 0): Int = {
    val b = s.getBytes("UTF-8")
    SolrHash.murmur3(b, 0, b.length, seed)
  }

  test("murmur3_x86_32 published test vectors") {
    // canonical vectors (MurmurHash3 reference/smhasher, as published
    // in the MurmurHash article + multiple independent test suites)
    assert(h("") === 0)
    assert(h("", 1) === 0x514e28b7)
    assert(h("", 0xffffffff) === 0x81f16f39)
    assert(h("a", 0x9747b28c) === 0x7fa09ea6)
    assert(h("aa", 0x9747b28c) === 0x5d211726)
    assert(h("aaa", 0x9747b28c) === 0x283e0130)
    assert(h("aaaa", 0x9747b28c) === 0x5a97808a)
    assert(h("abc", 0x9747b28c) === 0xc84a62dd)
    assert(h("abcd", 0x9747b28c) === 0xf0478627)
    assert(h("Hello, world!", 0x9747b28c) === 0x24884cba)
    // byte-wise vectors
    val ff = Array.fill[Byte](4)(0xff.toByte)
    assert(SolrHash.murmur3(ff, 0, 4, 0) === 0x76293b50)
    val zz = Array.fill[Byte](4)(0)
    assert(SolrHash.murmur3(zz, 0, 4, 0) === 0x2362f9de)
  }

  test("UTF-8 multibyte: hashes encoded bytes (Solr CharSequence parity)") {
    // Solr's Hash.murmurhash3_x86_32(CharSequence) == murmur3 over
    // UTF-8 encoding; non-ASCII must go through the same bytes
    assert(h("ππππππππ", 0x9747b28c) === 0xd58063c1)
    assert(SolrHash.hashString("ππππππππ") === h("ππππππππ"))
  }

  test("hashUtf8 and compositeHashUtf8 agree with String paths") {
    for (s <- Seq("", "a", "doc-1", "order#42", "shard!doc", "π!x", "a/8!b")) {
      val u = UTF8String.fromString(s)
      assert(SolrHash.hashUtf8(u) === SolrHash.hashString(s), s)
      assert(SolrHash.compositeHashUtf8(u) === SolrHash.compositeHash(s), s)
    }
  }

  test("composite ids: top bits from prefix, bottom bits from rest") {
    val hp = SolrHash.hashString("tenant")
    val hr = SolrHash.hashString("doc1")
    val combined = SolrHash.compositeHash("tenant!doc1")
    assert(combined === ((hp & 0xffff0000) | (hr & 0x0000ffff)))
    // explicit bits spec
    val c8 = SolrHash.compositeHash("tenant/8!doc1")
    assert(c8 === ((hp & 0xff000000) | (hr & 0x00ffffff)))
    // degenerate bit specs
    assert(SolrHash.compositeHash("tenant/0!doc1") === SolrHash.hashString("doc1"))
    assert(SolrHash.compositeHash("tenant/32!doc1") === SolrHash.hashString("tenant"))
    // plain id untouched
    assert(SolrHash.compositeHash("plain") === SolrHash.hashString("plain"))
  }

  test("tri-level ids: 8/8/16 split (CompositeIdRouter KeyParser)") {
    val ha = SolrHash.hashString("app")
    val hb = SolrHash.hashString("user")
    val hc = SolrHash.hashString("doc9")
    assert(SolrHash.compositeHash("app!user!doc9") ===
      ((ha & 0xff000000) | (hb & 0x00ff0000) | (hc & 0x0000ffff)))
    // explicit bit allocations on both routing parts: 4 top bits, then
    // 12 middle bits [27..16], bottom 16 from the leaf
    assert(SolrHash.compositeHash("app/4!user/12!doc9") ===
      ((ha & 0xf0000000) | (hb & 0x0fff0000) | (hc & 0x0000ffff)))
    // zero-bit parts contribute nothing
    assert(SolrHash.compositeHash("app/0!user!doc9") ===
      ((hb & 0xff000000) | (hc & 0x00ffffff)))
    // utf8 path agrees
    import org.apache.spark.unsafe.types.UTF8String
    for (s <- Seq("app!user!doc9", "a/4!b/12!c", "x!y!", "x!!", "x!"))
      assert(SolrHash.compositeHashUtf8(UTF8String.fromString(s)) ===
        SolrHash.compositeHash(s), s)
  }

  test("trailing-separator rules (SOLR-6257 back-compat)") {
    val ha = SolrHash.hashString("a")
    val hb = SolrHash.hashString("b")
    // "a!" routes by the top 16 bits of hash(a) alone
    assert(SolrHash.compositeHash("a!") === (ha & 0xffff0000))
    // "a!b!" collapses to bi-level a!b
    assert(SolrHash.compositeHash("a!b!") ===
      ((ha & 0xffff0000) | (hb & 0x0000ffff)))
    // "a!!" collapses to "a!"
    assert(SolrHash.compositeHash("a!!") === (ha & 0xffff0000))
    // "a!!c" is tri-level with an empty middle part
    val hEmpty = SolrHash.hashString("")
    val hc = SolrHash.hashString("c")
    assert(SolrHash.compositeHash("a!!c") ===
      ((ha & 0xff000000) | (hEmpty & 0x00ff0000) | (hc & 0x0000ffff)))
  }
}
