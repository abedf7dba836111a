package graft.etl

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** E33 — deterministic pseudonymization (keyed tokenization of PII
  * columns): the governance transform a pipeline runs BEFORE data
  * leaves the trust boundary. The reference loads raw geo records
  * with no redaction layer (Net7EtlBus.Service/Workers/
  * DataflowProcessor.cs:222-247 bulk-writes the records as-is); at
  * 100 TB the redaction must be a map-side expression, not an
  * external tokenization service call per row.
  *
  * Properties the entry proves, not just claims:
  *   - DETERMINISTIC: token = sha2(domain-tag ‖ secret ‖ value) — the
  *     same value always maps to the same token, so equality joins,
  *     group-bys and dedup keep working on the pseudonym exactly as
  *     they did on the clear value (the oracle aggregates orders per
  *     pseudonymized customer and must match Spark bit-for-bit);
  *   - DOMAIN-SEPARATED: the same clear value tokenized for a
  *     different column carries a different domain tag and therefore a
  *     different token — cross-column correlation of pseudonyms leaks
  *     nothing;
  *   - IRREVERSIBLE WITHOUT THE KEY: the token is a keyed hash, and
  *     the clear value appears nowhere in the output (the spec greps
  *     the output schema + rows).
  *
  * Scale: pure codegen'd hash expressions riding the one aggregation
  * shuffle the query needed anyway — zero extra shuffles, zero
  * driver state, no UDF. Key rotation = re-running with a new secret
  * (tokens are versioned by the key, which is the standard trade-off
  * of deterministic tokenization vs format-preserving encryption).
  */
object Pseudonymize {

  /** Keyed, domain-separated token: first 16 hex chars of
    * SHA-256(domain ‖ '|' ‖ secret ‖ '|' ‖ value). 64 bits keeps the
    * demo output readable; production keeps all 64 hex chars. */
  private def token(domain: String, secret: String,
      c: org.apache.spark.sql.Column) =
    substring(sha2(concat(lit(domain), lit("|"), lit(secret), lit("|"), c),
      256), 1, 16)

  val etlPseudonymize = QueryDef(
    "etl_pseudonymize",
    (s, d) => {
      val secret = "demo-secret-k1"
      val c = Tables.customer(s, d)
        .select(col("c_custkey"),
          token("cust_name", secret, col("c_name")).as("name_token"),
          token("cust_key", secret, col("c_custkey").cast("string"))
            .as("key_token"),
          col("c_mktsegment"))
      val o = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
            .as("total_c"))
      c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .select(col("name_token"), col("key_token"), col("c_mktsegment"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("total_c"), lit(0L)).as("total_c"))
        .orderBy("name_token", "key_token")
    },
    Some("""WITH c AS (
              SELECT c_custkey,
                     substr(sha256('cust_name' || '|' || 'demo-secret-k1'
                       || '|' || c_name), 1, 16) AS name_token,
                     substr(sha256('cust_key' || '|' || 'demo-secret-k1'
                       || '|' || CAST(c_custkey AS VARCHAR)), 1, 16)
                       AS key_token,
                     c_mktsegment
              FROM customer),
            o AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
                    CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5)
                      AS BIGINT)) AS BIGINT) AS total_c
                  FROM orders GROUP BY 1)
            SELECT name_token, key_token, c_mktsegment,
                   COALESCE(n_orders, 0) AS n_orders,
                   COALESCE(total_c, 0) AS total_c
            FROM c LEFT JOIN o ON c_custkey = o_custkey
            ORDER BY name_token, key_token"""))

  val all: Seq[QueryDef] = Seq(etlPseudonymize)
}
