package graft.text

import org.apache.spark.sql.SparkSession

/**
 * Tokenizer interop: serialize a trained [[Bpe]] merge table or
 * [[Unigram]] vocabulary as the `model` object of a HuggingFace
 * `tokenizer.json` — the public format (tokenizers library docs) the
 * training stack downstream of a data pipeline actually loads, so a
 * vocabulary trained here hands off without a conversion step.
 *
 * Shapes emitted (the documented HF fast-tokenizer serialization):
 *  - BPE:     {"type":"BPE","unk_token":"<unk>","vocab":{token:id,…},
 *              "merges":["left right",…]}
 *    vocab ids follow the HF training convention: specials first,
 *    then the base alphabet (sorted), then each merge's joined symbol
 *    in merge-rank order — the id order a from-scratch HF train of
 *    the same merges would produce.
 *  - Unigram: {"type":"Unigram","unk_id":0,
 *              "vocab":[["<unk>",0.0],["piece",logprob],…]}
 *    log-probs are the engine's integer-milli scores divided by 1000
 *    (exact decimal rendering, so a re-import reproduces ordering
 *    bit-for-bit).
 *
 * Writing is driver-side (a tokenizer file is KBs — never
 * corpus-shaped); both methods return the JSON string and optionally
 * persist it via the Hadoop FS (works on HDFS/object stores too).
 */
object TokenizerExport {

  private def esc(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** The base alphabet of a merge table: every single-character
    * symbol that appears on either side of a merge, split down to
    * characters (merges reference joined symbols; characters are the
    * leaves). Sorted for deterministic ids. */
  private[text] def bpeAlphabet(merges: Seq[Bpe.Merge]): Seq[String] =
    merges.iterator
      .flatMap(m => (m.left + m.right).iterator)
      .map(_.toString).toSeq.distinct.sorted

  /** HF `tokenizer.json` model object for a BPE merge table. */
  def bpeModelJson(merges: Seq[Bpe.Merge],
                   unk: String = "<unk>"): String = {
    val ordered = merges.sortBy(_.rank)
    val symbols =
      Seq(unk) ++ bpeAlphabet(ordered) ++ ordered.map(m => m.left + m.right)
    val vocab = symbols.distinct.zipWithIndex
      .map { case (t, i) => s""""${esc(t)}":$i""" }.mkString(",")
    val ms = ordered
      .map(m => s""""${esc(m.left)} ${esc(m.right)}"""").mkString(",")
    s"""{"type":"BPE","unk_token":"${esc(unk)}","vocab":{$vocab},""" +
      s""""merges":[$ms]}"""
  }

  /** HF `tokenizer.json` model object for a unigram vocabulary.
    * Pieces keep the trainer's (cnt desc, piece asc) order, ids
    * starting after unk_id 0. The unk score follows the SentencePiece/
    * HF convention — strongly NEGATIVE (min piece score minus a
    * penalty), never 0.0: a zero unk would be the vocabulary's MAXIMUM
    * score, and a downstream HF load would weight unknowns above every
    * trained piece. */
  def unigramModelJson(vocab: Seq[Unigram.Entry],
                       unk: String = "<unk>",
                       byteFallback: Boolean = false): String = {
    val unkScore =
      if (vocab.isEmpty) -10.0
      else vocab.iterator.map(_.scoreMilli).min / 1000.0 - 10.0
    val rows = (s"""["${esc(unk)}",$unkScore]""" +: vocab.map { e =>
      val lp = e.scoreMilli / 1000.0
      s"""["${esc(e.piece)}",$lp]"""
    }).mkString(",")
    // byte_fallback (round 17, the HF Unigram field): true promises
    // the vocab carries the complete <0x00>..<0xFF> tail and encode
    // is the no-unk byte-fallback lattice — the caller passes a
    // Unigram.withByteFallback vocabulary
    val bf = if (byteFallback) ""","byte_fallback":true""" else ""
    s"""{"type":"Unigram","unk_id":0$bf,"vocab":[$rows]}"""
  }

  /** Wrap a model object into a FULL `tokenizer.json` (round 16): the
    * HF fast-tokenizer file shape with the `pre_tokenizer` and
    * `decoder` objects a byte-level model needs — a downstream
    * `tokenizers` load of this file pretokenizes with the same GPT-2
    * regex and byte alphabet the engine encoded with, so token
    * streams agree end to end. `byteLevel = false` emits the bare
    * whitespace-era wrapper (model only). */
  def tokenizerJson(modelJson: String, byteLevel: Boolean): String =
    tokenizerJson(modelJson, byteLevel, Nil, 0)

  /** As above with ADDED TOKENS (round 17 — the HF `added_tokens`
    * array: BOS/EOS/control tokens that must never split; a
    * downstream `tokenizers` load protects them exactly like
    * [[AddedTokens.encode]] does here). Ids are sequential from
    * `addedIdBase` — pass the model's vocab size for the HF
    * convention (added tokens append after the vocabulary). */
  def tokenizerJson(modelJson: String, byteLevel: Boolean,
                    addedTokens: Seq[String], addedIdBase: Int): String = {
    val added =
      if (addedTokens.isEmpty) ""
      else addedTokens.zipWithIndex.map { case (t, i) =>
        s"""{"id":${addedIdBase + i},"content":"${esc(t)}",""" +
          s""""single_word":false,"lstrip":false,"rstrip":false,""" +
          s""""normalized":false,"special":true}"""
      }.mkString(""""added_tokens":[""", ",", "],")
    if (!byteLevel) s"""{"version":"1.0",$added"model":$modelJson}"""
    else s"""{"version":"1.0",$added""" +
      s""""pre_tokenizer":{"type":"ByteLevel","add_prefix_space":false,""" +
      s""""trim_offsets":true,"use_regex":true},""" +
      s""""decoder":{"type":"ByteLevel","add_prefix_space":false,""" +
      s""""trim_offsets":true,"use_regex":true},""" +
      s""""model":$modelJson}"""
  }

  /** Persist a model JSON at `path` (single small file, any Hadoop
    * FS). */
  def write(spark: SparkSession, path: String, json: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val os = fs.create(p, true)
    try os.write(json.getBytes("UTF-8")) finally os.close()
  }
}
