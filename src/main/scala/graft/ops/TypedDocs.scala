package graft.ops

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed (`Dataset[T]`) facade over the documents corpus — for callers
  * who want compile-time row types; the operators delegate to the same
  * Column-expression kernels, so the plans (and codegen) are identical
  * to the DataFrame API. Plain DataFrames stay the primary surface
  * (SURVEY.md §1.3: the index schema evolves by union, which fights
  * case-class typing), but fixed-schema corpora like `documents` are
  * where typing helps.
  */
object TypedDocs {
  case class Document(doc_id: Long, text: String, lang: String,
      source: String, n_chars: Long)

  case class ScoredDocument(doc_id: Long, lang: String, n_words: Long,
      n_stopwords: Long, avg_word_len: Double, stopword_ratio: Double)

  def load(spark: SparkSession, dir: String): Dataset[Document] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet").as[Document]
  }

  /** Quality features, typed end to end. */
  def score(ds: Dataset[Document]): Dataset[ScoredDocument] = {
    import ds.sparkSession.implicits._
    TextOps.qualityFeatures(ds.toDF(), "text")
      .select(col("doc_id"), col("lang"), col("n_words"), col("n_stopwords"),
        col("avg_word_len"), col("stopword_ratio"))
      .as[ScoredDocument]
  }

  /** The composite quality gate, preserving the document type. */
  def keepQuality(ds: Dataset[Document]): Dataset[Document] = {
    import ds.sparkSession.implicits._
    TextOps.qualityFilter(ds.toDF(), "text")
      .select("doc_id", "text", "lang", "source", "n_chars")
      .as[Document]
  }

  case class Chunk(doc_id: Long, chunk_idx: Long, chunk_text: String,
      n_tokens: Long)

  /** Token-window chunking, typed — the gate→chunk tail of a curation
    * pipeline as `Dataset` stages (`keepQuality andThen chunk`). */
  def chunk(ds: Dataset[Document], chunkTokens: Int,
      overlap: Int = 0): Dataset[Chunk] = {
    import ds.sparkSession.implicits._
    TextOps.chunkDocuments(ds.toDF(), "doc_id", "text", chunkTokens, overlap)
      .as[Chunk]
  }
}
