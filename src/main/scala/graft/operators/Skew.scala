package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md §5). AQE's skew-join split
  * handles sort-merge joins at runtime; explicit salting is the static
  * fallback for keys so hot that one reducer would still drown — the
  * standard shape on 100 TB joins against power-law keys.
  */
object Skew {

  /** Salted inner equi-join: the skewed (big) side scatters each key
    * across `factor` salt buckets; the small side is replicated
    * `factor` times (explode of a literal range — cheap relative to the
    * skew it removes). Result equals `big.join(small, key)` exactly;
    * the shuffle key becomes (key, salt) so a hot key occupies `factor`
    * reducers instead of one.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      factor: Int = 16): DataFrame = {
    require(factor > 0)
    // NOTE: monotonically_increasing_id() differs across task retries,
    // so a row's salt value is NOT retry-stable. That is result-invariant
    // here (every salt matches the replicated small side identically in
    // an inner equi-join) — do not reuse this idiom anywhere a row's
    // routing must be deterministic across attempts.
    val salted = big.withColumn("__salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(factor)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
