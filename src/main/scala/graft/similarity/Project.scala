package graft.similarity

import graft.{QueryDef, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** D81 — Johnson–Lindenstrauss random projection (Achlioptas ±1
  * variant, JCSS 2003): dimensionality reduction 64 → 16 that
  * preserves pairwise distances within (1±ε) with high probability —
  * the cheap pre-pass in front of clustering / ANN when the encoder
  * dimension is larger than the geometry needs (D33 truncation keeps
  * the FIRST dims and only works for Matryoshka-trained encoders;
  * JL works for any embedding because the projection is oblivious).
  *
  * The projection matrix is a plan-time constant: sign(i,j) ∈ {−1,+1}
  * derived from md5("jl|i|j") parity — deterministic, seedless, and
  * identical in the oracle, which re-verifies the full arithmetic.
  * Per row the projection is Σᵢ s(i,j)·xqᵢ over floor-quantized
  * BIGINT components: exact integer arithmetic end to end, so every
  * projected component is hash-gateable (a float dot product would be
  * fp-noise off between engines). Map-side only — zero shuffles, zero
  * driver data; the matrix is 64×16 signs baked into the codegen'd
  * expression. The 1/√k JL scale factor is left symbolic (it cancels
  * in any distance comparison; consumers divide once if they need
  * calibrated magnitudes).
  */
object Project {

  val InDim = 64
  val OutDim = 16

  /** ±1 from the parity of the first hex nibble of md5("jl|i|j") —
    * any fixed unbiased bit source works (Achlioptas §2); md5 keeps
    * it reproducible in any engine without an RNG stream. */
  private[similarity] def sign(i: Int, j: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(s"jl|$i|$j".getBytes("UTF-8"))
    if (((h(0) >> 4) & 1) == 0) 1 else -1
  }

  private def signMatrix: Array[Array[Int]] =
    Array.tabulate(OutDim, InDim)((j, i) => sign(i, j))

  val embProjectJl: QueryDef = {
    val m = signMatrix
    def projCol(j: Int): Column =
      (0 until InDim).map { i =>
        val t = element_at(col("xq"), i + 1)
        if (m(j)(i) > 0) t else -t
      }.reduce(_ + _)
    def projSql(j: Int): String =
      (0 until InDim).map { i =>
        val s = if (m(j)(i) > 0) "+" else "-"
        s"$s xq[${i + 1}]"
      }.mkString("0 ", " ", "")
    QueryDef(
      "emb_project_jl",
      (s, d) => {
        val base = Tables.embeddings(s, d)
          .select(col("vec_id"),
            transform(col("embedding"),
              x => floor(x.cast("double") * 1e6).cast("long")).as("xq"))
        base.select(
          col("vec_id") +:
            (0 until OutDim).map(j => projCol(j).as(s"p$j")): _*)
          .orderBy("vec_id")
      },
      Some(s"""WITH base AS (
                SELECT vec_id,
                       list_transform(embedding,
                         x -> CAST(floor(CAST(x AS DOUBLE) * 1e6)
                           AS BIGINT)) AS xq
                FROM embeddings)
              SELECT vec_id,
                     ${(0 until OutDim).map(j =>
                       s"CAST(${projSql(j)} AS BIGINT) AS p$j")
                       .mkString(",\n                     ")}
              FROM base ORDER BY vec_id"""))
  }

  val all: Seq[QueryDef] = Seq(embProjectJl)
}
