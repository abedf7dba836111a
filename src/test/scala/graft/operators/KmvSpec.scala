package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** R82 — KMV sketch intersection vs a full driver-side replay (the
  * sketch is md5-deterministic, so the replay is exact, not
  * statistical). */
class KmvSpec extends SparkSpec {

  test("R82: KMV Jaccard replays exactly and saturated sketches are exact") {
    val users = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id")).distinct()
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def md5hex(s: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString.substring(0, 15)
    }
    val byType = users.groupBy(_._1).map { case (t, us) =>
      t -> us.map(u => md5hex(u._2.toString)).toSet
    }
    val setsByType = users.groupBy(_._1).map { case (t, us) =>
      t -> us.map(_._2).toSet
    }
    val types = byType.keys.toSeq.sorted
    val ref = (for {
      i <- types.indices; j <- i + 1 until types.length
    } yield {
      val (t1, t2) = (types(i), types(j))
      val skA = byType(t1).toSeq.sorted.take(Kmv.K).toSet
      val skB = byType(t2).toSeq.sorted.take(Kmv.K).toSet
      val kmin = (skA ++ skB).toSeq.sorted.take(Kmv.K)
      val kUsed = kmin.length.toLong
      val matches = kmin.count(h => skA(h) && skB(h)).toLong
      val inter = (setsByType(t1) intersect setsByType(t2)).size.toLong
      val union = (setsByType(t1) union setsByType(t2)).size.toLong
      (t1, t2) -> (kUsed, matches, matches * 1000000L / kUsed,
        inter, union, inter * 1000000L / union)
    }).toMap
    val got = Kmv.qKmvJaccard.fn(spark, sf).collect()
      .map(r => (r.getAs[String]("t1"), r.getAs[String]("t2")) ->
        (r.getAs[Long]("k_used"), r.getAs[Long]("matches"),
          r.getAs[Long]("est_q"), r.getAs[Long]("exact_inter"),
          r.getAs[Long]("exact_union"), r.getAs[Long]("exact_q"))).toMap
    assert(got === ref)
    // when the merged sketch is unsaturated (k_used < K the union is
    // fully represented) the estimator is EXACT — the KMV property
    got.foreach { case (pair, (kUsed, _, estQ, _, _, exactQ)) =>
      if (kUsed < Kmv.K)
        assert(estQ === exactQ, s"$pair: unsaturated sketch must be exact")
    }
  }
}
