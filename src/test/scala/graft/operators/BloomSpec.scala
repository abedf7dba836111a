package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** R31 bloom-pruned semi join: exactness (pruned ≡ plain semi join —
  * also oracle-gated via q_bloom_join's plain-semi-join SQL), plan
  * shape (the probe must sit below the join, i.e. prune BEFORE the
  * shuffle), and the loud dim-side size guard. */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("pruned semi join equals the plain semi join (random keys)") {
    val rnd = new scala.util.Random(7)
    // fact keys over a wide domain; dim keys a sparse subset — plenty
    // of fact rows outside the dim key set so the probe actually prunes
    val fact = (1 to 5000).map(i => (rnd.nextInt(2000).toLong, i)).toDF("k", "payload")
    val dim = (1 to 60).map(_ => rnd.nextInt(2000).toLong).distinct.toDF("dk")
    val pruned = Bloom.prunedSemiJoin(fact, dim, "k", "dk")
      .select("k", "payload").orderBy("k", "payload").collect()
    val plain = fact.join(dim, $"k" === $"dk", "left_semi")
      .select("k", "payload").orderBy("k", "payload").collect()
    assert(pruned.nonEmpty && pruned.sameElements(plain))
  }

  test("null fact keys are dropped, matching semi-join semantics") {
    val fact = Seq((Some(1L), "a"), (None, "b"), (Some(9L), "c"))
      .toDF("k", "payload")
    val dim = Seq(1L, 2L).toDF("dk")
    val out = Bloom.prunedSemiJoin(fact, dim, "k", "dk")
      .select("payload").as[String].collect().toSet
    assert(out === Set("a"))
  }

  test("q_bloom_join probes the bloom below the join, codegen'd") {
    val df = graft.SparkEntry.queries("q_bloom_join")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("graft_might_contain"), "bloom probe missing from the plan")
    // the probe is a Filter on the fact scan side, not a post-join step:
    // no join output column can feed it, so it must appear in the plan
    // BELOW (after, in toString order) the join node
    val joinAt = math.max(p.indexOf("SortMergeJoin"), p.indexOf("BroadcastHashJoin"))
    val probeAt = p.indexOf("graft_might_contain")
    assert(joinAt >= 0 && probeAt > joinAt,
      "probe must be on the fact input of the join (below it in the plan)")
  }

  test("a too-large dim side fails loudly instead of shipping a huge literal") {
    val big = spark.range(0, Bloom.MaxDimKeys + 1).toDF("dk")
    val fact = Seq((1L, "a")).toDF("k", "payload")
    val e = intercept[IllegalArgumentException] {
      Bloom.prunedSemiJoin(fact, big, "k", "dk")
    }
    assert(e.getMessage.contains("MaxDimKeys"))
  }
}
