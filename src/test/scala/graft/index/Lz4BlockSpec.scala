package graft.index

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** LZ4 block codec: format-vector decodes + roundtrip fuzz. */
class Lz4BlockSpec extends AnyFunSuite {

  private def roundtrip(raw: Array[Byte]): Unit = {
    val comp = Lz4Block.compress(raw, raw.length)
    val back = Lz4Block.decompress(comp, comp.length, raw.length)
    assert(back === raw)
  }

  test("hand-built format vectors decode (spec compliance, not just self-consistency)") {
    // literals-only block: token 0x30, "abc"
    assert(Lz4Block.decompress(Array[Byte](0x30, 'a', 'b', 'c'), 4, 3)
      === "abc".getBytes)
    // one match: 4 literals "abab", then match offset 2 len 4 -> "abababab"
    // token = litLen 4 << 4 | (matchLen-4 = 0) = 0x40
    val v2 = Array[Byte](0x40, 'a', 'b', 'a', 'b', 0x02, 0x00, 0x10, 'z')
    // trailing sequence: token 0x10 = 1 literal 'z'
    assert(Lz4Block.decompress(v2, v2.length, 9) === "abababab".getBytes :+ 'z'.toByte)
    // RLE via offset 1: literal 'x', match off 1 len 19 (nibble 15 + ext 0)
    val v3 = Array[Byte](0x1F, 'x', 0x01, 0x00, 0x00, 0x10, 'y')
    assert(Lz4Block.decompress(v3, v3.length, 21)
      === (("x" * 20) + "y").getBytes)
  }

  test("roundtrip: empty, tiny, and boundary sizes") {
    roundtrip(Array.emptyByteArray)
    roundtrip("a".getBytes)
    roundtrip("abcdefghijklmno".getBytes) // below MfLimit+MinMatch: literals-only path
    roundtrip("abcdefghijklmnop".getBytes) // exactly at the match-search threshold
    (14 to 20).foreach(n => roundtrip(Array.fill(n)('q'.toByte)))
  }

  test("roundtrip: long literal runs (>=15 extension) and long matches") {
    val rnd = new Random(7)
    val incompressible = Array.fill(5000)(rnd.nextInt(256).toByte)
    roundtrip(incompressible) // forces a >255-byte literal extension chain
    roundtrip(Array.fill(100000)('A'.toByte)) // one RLE match, long match extension
    val repeated = ("the quick brown fox " * 800).getBytes
    val comp = Lz4Block.compress(repeated, repeated.length)
    assert(comp.length < repeated.length / 5, s"repetitive text must compress >5x, got ${comp.length}/${repeated.length}")
    roundtrip(repeated)
  }

  test("roundtrip fuzz: 200 random mixes of text, runs, and binary") {
    val rnd = new Random(42)
    (1 to 200).foreach { _ =>
      val out = new java.io.ByteArrayOutputStream()
      (0 until rnd.nextInt(8)).foreach { _ =>
        rnd.nextInt(3) match {
          case 0 => out.write(Array.fill(rnd.nextInt(2000))(rnd.nextInt(256).toByte))
          case 1 => out.write(Array.fill(rnd.nextInt(3000))(('a' + rnd.nextInt(4)).toByte))
          case 2 => out.write(("field" + rnd.nextInt(10) + "=value" + rnd.nextInt(100)).getBytes)
        }
      }
      roundtrip(out.toByteArray)
    }
  }

  test("offsets beyond 64K window are never emitted (far repeats recompress as literals or near matches)") {
    // two identical 100-byte chunks separated by 70000 random bytes:
    // the second chunk's match candidate is out of window
    val rnd = new Random(3)
    val chunk = Array.fill(100)(rnd.nextInt(256).toByte)
    val mid = Array.fill(70000)(rnd.nextInt(256).toByte)
    roundtrip(chunk ++ mid ++ chunk)
  }

  test("corrupt blocks throw, never overrun") {
    // literal run claims more bytes than present
    intercept[java.io.IOException] {
      Lz4Block.decompress(Array[Byte](0x50, 'a'), 2, 5)
    }
    // match offset beyond written prefix
    intercept[java.io.IOException] {
      Lz4Block.decompress(Array[Byte](0x10, 'a', 0x05, 0x00, 0x10, 'z'), 6, 10)
    }
    // declared raw length not met
    intercept[java.io.IOException] {
      Lz4Block.decompress(Array[Byte](0x10, 'a'), 2, 9)
    }
    // truncated mid literal-length extension (token nibble 15, no ext byte)
    intercept[java.io.IOException] {
      Lz4Block.decompress(Array[Byte](0xF0.toByte), 1, 400)
    }
    // truncated mid match-offset (literal consumed, 1 of 2 offset bytes)
    intercept[java.io.IOException] {
      Lz4Block.decompress(Array[Byte](0x10, 'a', 0x01), 3, 10)
    }
    // truncated mid match-length extension (match nibble 15, offset ok, no ext)
    intercept[java.io.IOException] {
      Lz4Block.decompress(Array[Byte](0x1F, 'x', 0x01, 0x00), 4, 400)
    }
  }
}
