package graft.operators

import graft.functions.Functions.cosine_sim
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over an embedding column
  * (`array<float>`).
  *
  * Two paths:
  *  - [[bruteForceTopK]] — exact baseline: broadcast the (small) query set,
  *    score every corpus vector with the codegen'd [[graft.functions.CosineSimilarity]]
  *    kernel, per-query rank window. Linear in corpus size; the right answer
  *    whenever the query set is small enough to broadcast (it usually is).
  *  - [[lshTopK]] — scale path: sign-random-projection (hyperplane) codes,
  *    candidate join on code chunks (multi-band), exact re-scoring of
  *    candidates only. Sub-linear candidate volume; recall tunable via
  *    bits/bands.
  *
  * Ranking is by similarity rounded to 6dp with vec_id tie-break, making the
  * result set reproducible across engines and runs.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query vector. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = corpus.as("c")
      .crossJoin(broadcast(queries.select(
        col("vec_id").as("query_id"), col("embedding").as("q_emb"))))
      .filter(col("c.vec_id") =!= col("query_id"))
      .select(col("query_id"), col("c.vec_id").as("neighbor_id"),
        round(cosine_sim(col("c.embedding"), col("q_emb")), 6).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** Hyperplane LSH code of every embedding (bits-wide sign code). */
  def withLshCode(df: DataFrame, bits: Int, seed: Long): DataFrame =
    df.withColumn("lsh_code",
      call_function("lsh_code", col("embedding"), lit(bits), lit(seed)))

  /** ANN top-k: candidates = corpus vectors sharing >= 1 of `bands` code
    * chunks with the query, re-scored exactly, per-query rank window.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              bits: Int = 32, bands: Int = 8, seed: Long = 7L): DataFrame = {
    val chunkBits = bits / bands
    val mask = (1L << chunkBits) - 1
    def chunked(df: DataFrame, idAs: String, embAs: String) = {
      val coded = withLshCode(df, bits, seed)
      val chunks = (0 until bands).map { c =>
        struct(lit(c).as("ci"),
          shiftright(col("lsh_code"), c * chunkBits).bitwiseAND(lit(mask)).as("cv"))
      }
      coded.select(col("vec_id").as(idAs), col("embedding").as(embAs),
          explode(array(chunks: _*)).as("ch"))
        .select(col(idAs), col(embAs), col("ch.ci").as("ci"), col("ch.cv").as("cv"))
    }
    val cands = chunked(corpus, "neighbor_id", "n_emb").as("c")
      .join(broadcast(chunked(queries, "query_id", "q_emb")).as("q"), Seq("ci", "cv"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), col("q_emb"), col("n_emb"))
      .distinct()
    val scored = cands.select(col("query_id"), col("neighbor_id"),
      round(cosine_sim(col("n_emb"), col("q_emb")), 6).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** Embedding near-duplicate pairs: cosine >= threshold, LSH-bucketed
    * candidate generation (same chunk trick as [[lshTopK]], corpus vs
    * corpus), exact verification. Output (a, b, sim), a < b.
    */
  def embeddingNearDupPairs(corpus: DataFrame, threshold: Double,
                            bits: Int = 32, bands: Int = 8, seed: Long = 7L): DataFrame = {
    val chunkBits = bits / bands
    val mask = (1L << chunkBits) - 1
    val coded = withLshCode(corpus, bits, seed)
    val chunks = (0 until bands).map { c =>
      struct(lit(c).as("ci"),
        shiftright(col("lsh_code"), c * chunkBits).bitwiseAND(lit(mask)).as("cv"))
    }
    val chunked = coded.select(col("vec_id"), col("embedding"),
        explode(array(chunks: _*)).as("ch"))
      .select(col("vec_id"), col("embedding"), col("ch.ci").as("ci"), col("ch.cv").as("cv"))
    chunked.as("x").join(chunked.as("y"),
        col("x.ci") === col("y.ci") && col("x.cv") === col("y.cv") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"),
        col("x.embedding").as("ea"), col("y.embedding").as("eb"))
      .distinct()
      .select(col("a"), col("b"), round(cosine_sim(col("ea"), col("eb")), 6).as("sim"))
      .filter(col("sim") >= threshold)
  }
}
