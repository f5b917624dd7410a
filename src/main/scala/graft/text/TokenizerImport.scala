package graft.text

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/**
 * Tokenizer interop, the IMPORT half: load a HuggingFace
 * `tokenizer.json` (the public fast-tokenizer serialization —
 * tokenizers library docs) back into the engine's model tables, so a
 * vocabulary trained ANYWHERE — here ([[TokenizerExport]]'s output
 * round-trips bit-for-bit, spec-locked) or by an external stack (the
 * common production case: the training team ships tokenizer.json, the
 * data pipeline must count/encode with exactly that vocabulary) —
 * drives the engine's encode kernels ([[Bpe.encode]],
 * [[Unigram.encode]]).
 *
 * Accepted shapes, per model type:
 *  - a bare model object (`{"type":"BPE",...}` — what
 *    [[TokenizerExport]] writes), or a full tokenizer.json whose
 *    `model` key holds it;
 *  - BPE merges as `"left right"` strings (classic) or `[left,
 *    right]` two-element arrays (tokenizers >= 0.20 serialization);
 *  - Unigram vocab as `[["piece", logprob], ...]`; log-probs map back
 *    to the engine's integer-milli scores by round(lp*1000) — exact
 *    for every score [[TokenizerExport]] emits (those are milli
 *    integers rendered as decimals).
 *
 * Counts the HF format does not carry (merge pair counts, piece
 * counts) import as 0 — no encode path reads them.
 */
object TokenizerImport {

  private def mapper = new ObjectMapper()

  /** The model node: unwrap a full tokenizer.json's `model` key, or
    * take the node itself when it already carries `type`. */
  private def modelNode(json: String): JsonNode = {
    val root = mapper.readTree(json)
    val m = if (root.has("model")) root.get("model") else root
    require(m.has("type"), "not a tokenizer.json model object (no type)")
    m
  }

  /** Import a BPE merge table. Ranks follow merge order (the HF
    * contract: the merges list IS rank order), numbered from 1 — the
    * engine's [[Bpe.learn]] convention, so an imported table is
    * indistinguishable from a locally-trained one. */
  def bpeMerges(json: String): Seq[Bpe.Merge] = {
    val m = modelNode(json)
    require(m.get("type").asText == "BPE",
      s"expected a BPE model, got ${m.get("type").asText}")
    val merges = Option(m.get("merges")).getOrElse(
      throw new IllegalArgumentException("BPE model has no merges"))
    merges.elements().asScala.zipWithIndex.map { case (node, i) =>
      val (l, r) =
        if (node.isArray) {
          require(node.size == 2, s"merge #$i is not a pair")
          (node.get(0).asText, node.get(1).asText)
        } else {
          val s = node.asText
          val cut = s.indexOf(' ')
          require(cut > 0 && s.indexOf(' ', cut + 1) < 0,
            s"merge #$i is not 'left right': '$s'")
          (s.substring(0, cut), s.substring(cut + 1))
        }
      Bpe.Merge(i + 1, l, r, 0L)
    }.toSeq
  }

  /** Import a unigram vocabulary (piece order preserved; the unk row
    * — `unk_id`, conventionally 0 — is dropped: the engine treats
    * out-of-vocabulary as the whole-word fallback, not a scored
    * piece). */
  def unigramVocab(json: String): Seq[Unigram.Entry] = {
    val m = modelNode(json)
    require(m.get("type").asText == "Unigram",
      s"expected a Unigram model, got ${m.get("type").asText}")
    // tokenizers serializes "no unk token" as an explicit JSON null —
    // Jackson returns a NullNode (asInt would read 0 and silently drop
    // the real piece at index 0), so filter it out
    val unkId = Option(m.get("unk_id")).filter(!_.isNull)
      .map(_.asInt).getOrElse(-1)
    val vocab = Option(m.get("vocab")).getOrElse(
      throw new IllegalArgumentException("Unigram model has no vocab"))
    vocab.elements().asScala.zipWithIndex.flatMap { case (row, i) =>
      require(row.isArray && row.size == 2, s"vocab row #$i is not a pair")
      if (i == unkId) None
      else Some(Unigram.Entry(row.get(0).asText, 0L,
        Math.round(row.get(1).asDouble * 1000.0)))
    }.toSeq
  }

  /** Does the Unigram model promise byte-fallback encode (round 17 —
    * the HF `byte_fallback` field)? True tells the caller to encode
    * with [[Unigram.encodeByteFallback]] / decode with
    * [[Unigram.decodeByteFallback]]; the vocab then carries the
    * complete `<0x00>`..`<0xFF>` tail ([[Unigram.hasByteFallback]]). */
  def byteFallback(json: String): Boolean = {
    val m = modelNode(json)
    Option(m.get("byte_fallback")).filter(!_.isNull)
      .exists(_.asBoolean(false))
  }

  /** The file's ADDED TOKENS (round 17 — `added_tokens[].content`, in
    * file order): the protected strings [[AddedTokens.encode]] must
    * never split. Empty when the file carries none. */
  def addedTokens(json: String): Seq[String] = {
    val root = mapper.readTree(json)
    Option(root.get("added_tokens")).filter(!_.isNull).toSeq
      .flatMap(_.elements().asScala)
      .flatMap(n => Option(n.get("content")).map(_.asText))
  }

  /** The tokenizer's `pre_tokenizer` type, when the file carries one
    * (round 16) — `Some("ByteLevel")` tells the caller to encode with
    * [[Bpe.encodeByteLevel]] / decode with [[Bpe.decodeByteLevel]]
    * instead of the word-boundary kernels; a bare model object (what
    * the whitespace-era export writes) has none. */
  def preTokenizer(json: String): Option[String] = {
    val root = mapper.readTree(json)
    Option(root.get("pre_tokenizer")).filter(!_.isNull)
      .flatMap(p => Option(p.get("type")).map(_.asText))
  }

  /** Read a tokenizer file off any Hadoop FS (single small file —
    * tokenizer.json is KBs, never corpus-shaped). */
  def read(spark: SparkSession, path: String): String =
    graft.util.FsIo.readSmallFile(
      spark.sparkContext.hadoopConfiguration, path)
}
