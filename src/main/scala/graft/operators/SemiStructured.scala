package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** R149 — the Spark 4 VARIANT semi-structured path: nested JSON
  * documents parsed ONCE into the binary variant encoding, then typed
  * path extraction (`variant_get`) — the open-schema analogue of S5's
  * fixed-schema `from_json`, and the engine surface a log/API-payload
  * lake runs on (variant keeps the parse tree in a columnar binary
  * form, so repeated path reads don't re-parse strings the way
  * get_json_object chains do).
  *
  * Non-vacuity: the events table's props is a flat single-field
  * object, so the entry CONSTRUCTS genuinely nested documents — each
  * order serialized with its line-item ARRAY (deterministically
  * ordered) — and reads back a nested-array path, a typed double leaf
  * and an array length through variant. The gate is deliberately
  * CROSS-FORMULATION: the oracle computes the same answers straight
  * from the relational rows (a total-order first-row window — the
  * synthetic line numbers are NOT unique within an order, so the sort
  * key is the full (ln, part, qty) lexicographic tuple, exactly
  * sort_array's struct order), never touching JSON — the variant
  * round-trip must preserve the relational truth bit for bit (doubles
  * survive via shortest-decimal round-trip).
  *
  * Scale shape: one keyed aggregation builds the documents; parse +
  * extraction are map-side expressions; nothing shuffles twice. */
object SemiStructured {

  val qVariantExtract = QueryDef(
    "q_variant_extract",
    (s, d) => {
      val docs = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey").as("orderkey"))
        .agg(sort_array(collect_list(struct(
          col("l_linenumber").as("ln"), col("l_partkey").as("p"),
          col("l_quantity").as("q")))).as("items"))
        .select(col("orderkey"),
          to_json(struct(col("orderkey"), col("items"))).as("doc"))
      docs
        .select(col("orderkey"), expr("parse_json(doc)").as("v"))
        .select(col("orderkey"),
          expr("variant_get(v, '$.items[0].p', 'bigint')").as("first_part"),
          expr("CAST(floor(variant_get(v, '$.items[0].q', 'double') * 100) " +
            "AS BIGINT)").as("first_qty_c"),
          expr("CAST(array_size(variant_get(v, '$.items', 'array<variant>')) " +
            "AS BIGINT)").as("n_items"))
        .orderBy("orderkey")
    },
    Some("""WITH r AS (SELECT l_orderkey, l_partkey, l_quantity,
                     row_number() OVER (PARTITION BY l_orderkey
                       ORDER BY l_linenumber, l_partkey, l_quantity) AS rn,
                     count(*) OVER (PARTITION BY l_orderkey) AS n_items
                   FROM lineitem)
            SELECT l_orderkey AS orderkey,
                   CAST(l_partkey AS BIGINT) AS first_part,
                   CAST(floor(l_quantity * 100) AS BIGINT) AS first_qty_c,
                   CAST(n_items AS BIGINT) AS n_items
            FROM r WHERE rn = 1 ORDER BY orderkey"""))

  val all: Seq[QueryDef] = Seq(qVariantExtract)
}
