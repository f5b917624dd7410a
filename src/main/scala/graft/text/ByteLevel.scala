package graft.text

/**
 * Byte-level pretokenization — the production tokenizer form (GPT-2,
 * and via byte-fallback the LLaMA family): text splits into
 * merge-scoped chunks under the GPT-2 regex, each chunk's UTF-8 bytes
 * map into the printable byte-level alphabet
 * ([[graft.functions.ByteLevelKernel]]), and BPE merges run over
 * those mapped chars — so the learned vocabulary covers ARBITRARY
 * bytes (no unk at encode time) and decode is exact.
 *
 * The pretokenizer is GPT-2's published pattern — contractions,
 * optionally-space-prefixed letter runs / digit runs / punctuation
 * runs, then whitespace (with the `\s+(?!\S)` lookahead that keeps
 * the last space of a run attached to the following word). Its
 * matches PARTITION the input: concatenating the chunks reproduces
 * the text byte-for-byte, which is what makes
 * `decode(encode(x)) == x` hold for any unicode input (spec-fuzzed).
 */
object ByteLevel {

  /** GPT-2's pretokenizer pattern (Java regex — Spark's regexp
    * functions run Java regex, so the lookahead works distributed). */
  val Gpt2Pattern: String =
    """'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""

  private val compiled = java.util.regex.Pattern.compile(Gpt2Pattern)

  /** Pretokenize one string — a partition of the input. */
  def pretokenize(s: String): Seq[String] = {
    val m = compiled.matcher(s)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (m.find()) out += m.group()
    out.toSeq
  }

  /** Map a string's UTF-8 bytes into the byte-level alphabet. */
  def encode(s: String): String =
    graft.functions.ByteLevelKernel.encode(
      org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString

  /** Exact inverse of [[encode]]. */
  def decode(s: String): String =
    graft.functions.ByteLevelKernel.decode(
      org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString
}
