package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** R31: bloom-filter runtime join pruning — the explicit form of the
  * semi-join reduction every warehouse engine applies at scale (Spark's
  * own `InjectRuntimeFilter` does this transparently when it can; this
  * operator makes the primitive available to any plan, e.g. ahead of a
  * stateful streaming join or a multi-stage pipeline where the
  * optimizer can't see the dim side).
  *
  * Shape: one pass over the DIM side builds a bloom filter of its join
  * keys (driver-held sketch, sized by the dim-side count — the dim side
  * is small by contract, the sketch is O(expectedItems·log(1/fpp)) BITS
  * and independent of fact size); the serialized filter travels to
  * executors as a plan constant and prunes the FACT side map-side
  * BEFORE its join shuffle. False positives (≤ fpp of probed rows)
  * survive the probe but are removed by the exact semi join that
  * follows, so the result is EXACTLY the plain semi join — which is
  * what the SQL oracle checks. At 100 TB the shuffle writes ~selectivity
  * + fpp of the fact table instead of all of it.
  */
object Bloom {

  /** Max dim-side keys we will sketch: the bloom stays ~1.1 MB at 1M
    * keys / 1% fpp — comfortably a broadcast-sized plan constant. A
    * bigger "dim" side is not a dim side; fail loudly rather than ship
    * a multi-MB literal in every task binary. */
  val MaxDimKeys = 10000000L

  /** Serialized bloom filter of `dim`'s distinct `key` values. Exact
    * sizing via the dim-side count (one cheap agg job on the SMALL
    * side — the same bounded-driver-materialization budget as the IVF
    * codebook); `fpp` trades sketch size for wasted shuffle. */
  def keyFilterBytes(dim: DataFrame, key: String, fpp: Double = 0.01): Array[Byte] = {
    val n = dim.select(key).na.drop().distinct().count()
    require(n <= MaxDimKeys,
      s"Bloom.keyFilterBytes: $n dim keys > MaxDimKeys=$MaxDimKeys — " +
        "this side is too big to sketch as a plan constant; use a plain join")
    val bf = dim.stat.bloomFilter(col(key).cast("long"), math.max(n, 1L), fpp)
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** Exact semi join, bloom-pruned: fact rows probe the dim-key filter
    * map-side (codegen'd, below the shuffle) and only survivors enter
    * the exact `left_semi` join. Result ≡ `fact SEMI JOIN dim`. */
  def prunedSemiJoin(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String, fpp: Double = 0.01): DataFrame = {
    val bytes = keyFilterBytes(dim, dimKey, fpp)
    fact
      .filter(call_function("graft_might_contain",
        col(factKey).cast("long"), lit(bytes)))
      .join(dim.select(col(dimKey)), col(factKey) === col(dimKey), "left_semi")
  }
}
