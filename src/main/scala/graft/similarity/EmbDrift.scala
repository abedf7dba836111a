package graft.similarity

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** D76 — embedding-space drift: per-label centroid direction vs the
  * corpus centroid. A label (source, model version, time slice) whose
  * centroid swings away from the corpus is the embedding-side analog
  * of R68's PSI — the first thing to check when retrieval quality
  * sags after a re-embed.
  *
  * Exactness design: cosine is SCALE-INVARIANT, so centroids never
  * need the division by n at all — the per-(label, dim) integer SUM
  * vectors (values quantized to 1e-6 units first) stand in for the
  * means, accumulate as DECIMAL(38,0) ↔ HUGEINT (order-free, exact at
  * any parallelism), and one fixed double sequence at the end forms
  * the cosine. No float accumulation anywhere — unlike a naive
  * avg-of-floats centroid, whose merge order can fork a full-precision
  * hash (q_vector_centroid's oracle survives only because it rounds
  * the mean to 6dp, far above the ulp noise; this entry's UNROUNDED
  * cosine could not, hence the integer path).
  *
  * Scale: posexplode keys on (label, dim) — O(labels × dim)
  * aggregate rows; everything after the first shuffle is bounded. */
object EmbDrift {

  val qEmbDrift = QueryDef(
    "emb_drift",
    (s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("label"), posexplode(col("embedding"))
          .as(Seq("pos", "v")))
        .select(col("label"), col("pos"),
          floor(col("v").cast("double") * 1e6 + 0.5).cast("long").as("vq"))
      val perLab = e.groupBy("label", "pos")
        .agg(sum(col("vq").cast("decimal(38,0)")).as("sl"),
          count(lit(1)).as("n"))
      val glob = perLab.groupBy("pos")
        .agg(sum("sl").as("sg"))
      val joined = perLab.join(glob, "pos")
      joined.groupBy("label")
        .agg(max("n").as("n_vectors"),
          sum(col("sl") * col("sg")).as("dot"),
          sum(col("sl") * col("sl")).as("ll"),
          sum(col("sg") * col("sg")).as("gg"))
        .select(col("label"), col("n_vectors"),
          floor(col("dot").cast("double")
            / (sqrt(col("ll").cast("double"))
              * sqrt(col("gg").cast("double"))) * 1e6)
            .cast("long").as("cos_to_global_q"))
        .orderBy("label")
    },
    Some("""WITH e AS (SELECT label, i.i AS pos,
                         CAST(floor(CAST(embedding[i.i + 1] AS DOUBLE)
                           * 1e6 + 0.5) AS BIGINT) AS vq
                       FROM embeddings,
                         UNNEST(generate_series(0, len(embedding) - 1))
                           AS i(i)),
             pl AS (SELECT label, pos, SUM(vq) AS sl,
                      CAST(count(*) AS BIGINT) AS n
                    FROM e GROUP BY 1, 2),
             g AS (SELECT pos, SUM(sl) AS sg FROM pl GROUP BY 1),
             j AS (SELECT pl.label, pl.n, pl.sl, g.sg
                   FROM pl JOIN g ON pl.pos = g.pos),
             a AS (SELECT label, MAX(n) AS n_vectors,
                     SUM(sl * sg) AS dot,
                     SUM(sl * sl) AS ll,
                     SUM(sg * sg) AS gg
                   FROM j GROUP BY 1)
             SELECT CAST(label AS INT) AS label,
                    CAST(n_vectors AS BIGINT) AS n_vectors,
                    CAST(floor(CAST(dot AS DOUBLE)
                      / (sqrt(CAST(ll AS DOUBLE))
                        * sqrt(CAST(gg AS DOUBLE))) * 1e6) AS BIGINT)
                      AS cos_to_global_q
             FROM a ORDER BY label"""))

  def all: Seq[QueryDef] = Seq(qEmbDrift)
}
