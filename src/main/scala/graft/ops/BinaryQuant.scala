package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * 1-BIT (sign) embedding quantization — FAISS `IndexBinaryFlat` /
 * the binary-embedding serving tier modern vector stores ship
 * (32× memory cut vs float32): pack each dimension's sign into a
 * long-array code, rank by HAMMING distance (popcount of XOR — the
 * cheapest distance there is), then re-rank a bounded candidate set
 * with exact cosine over the raw vectors. Completes the quantization
 * ladder next to [[Similarity.int8Scale]] (8-bit) and [[IvfPqIndex]]
 * (product codes).
 *
 * Everything is column expressions (whole-stage codegen; packing is
 * integer arithmetic, so the DuckDB oracle replays it EXACTLY —
 * q317), and the shape honors the family's two-stage discipline:
 * Hamming ranking touches codes only, raw vectors are fetched for
 * the ≤ |Q|·rerank candidate rows alone.
 *
 * Determinism: bit b = 1 iff v(b) > 0 (strict — an exact 0.0
 * compares identically on both engines); Hamming ties break by
 * corpus id, the rerank by (cosine desc, id).
 */
object BinaryQuant {

  /** Pack `vec`'s sign bits into ceil(dim/32) longs of 32 bits each:
    * word w accumulates bits b = 0..31 as `acc*2 + (v[w*32+b] > 0)` —
    * shift-free integer arithmetic that can't overflow under ANSI
    * (max 2³²−1) and replays EXACTLY as a DuckDB list_reduce. Pure
    * column expressions, whole-stage codegen. */
  def packSigns(vec: Column, dim: Int): Column = {
    val words = (dim + 31) / 32
    transform(sequence(lit(0), lit(words - 1)), w =>
      aggregate(sequence(lit(0), lit(31)), lit(0L), (acc, b) => {
        val idx = w * lit(32) + b
        val bit = when(idx < lit(dim),
            when(element_at(vec, (idx + lit(1)).cast("int")) > lit(0d),
              lit(1L)).otherwise(lit(0L)))
          .otherwise(lit(0L))
        acc * lit(2L) + bit
      }))
  }

  /** Hamming distance between two packed codes: Σ popcount(a⊕b). */
  def hamming(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y))),
      lit(0), (acc, x) => acc + x)

  /** Two-stage binary ANN: Hamming top-`rerank` candidates per query
    * over the packed codes, exact-cosine top-`k` re-rank over only
    * those rows. Output (query_id, rank, corpus_id) — the family
    * shape. */
  def binaryTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                 rerank: Int, dim: Int, idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = corpus.select(col(idCol).cast("long").as("corpus_id"),
      col(vecCol).cast("array<double>").as("cvec"))
    val codes = c.select(col("corpus_id"),
      packSigns(col("cvec"), dim).as("code"))
    val q = queries.select(col(idCol).cast("long").as("query_id"),
        col(vecCol).cast("array<double>").as("qvec"))
      .withColumn("qcode", packSigns(col("qvec"), dim))
    // stage 1: codes only — 1 long per 64 dims scanned, nothing else
    val scored = codes.crossJoin(broadcast(q.select("query_id", "qcode")))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("hamming", hamming(col("qcode"), col("code")))
    val w1 = Window.partitionBy(col("query_id"))
      .orderBy(col("hamming").asc, col("corpus_id").asc)
    val cand = scored.withColumn("hrank", row_number().over(w1))
      .filter(col("hrank") <= rerank)
      .select("query_id", "corpus_id")
    // stage 2: raw vectors for the candidate rows alone
    val rer = cand.join(c, Seq("corpus_id"))
      .join(broadcast(q.select("query_id", "qvec")), Seq("query_id"))
      .withColumn("cosine",
        Similarity.dot(col("qvec"), col("cvec")) /
          (Similarity.norm(col("qvec")) * Similarity.norm(col("cvec"))))
    val w2 = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    rer.withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"))
  }
}
