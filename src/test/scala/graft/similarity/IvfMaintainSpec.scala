package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** D89 — IVF maintenance laws: conservation, split-trigger
  * correctness, per-parent child conservation, determinism. */
class IvfMaintainSpec extends SparkSpec {

  private lazy val rows = IvfMaintain.maintain(spark, sf).collect()

  test("D89: occupancy is conserved through ingest and splits") {
    val (base, delta) = IvfMaintain.corpusParts(spark, sf)
    assert(rows.map(_.getAs[Long]("n_total")).sum === base.count() + delta.count())
    assert(rows.map(_.getAs[Long]("n_delta")).sum === delta.count())
    assert(delta.count() > 0, "the delta batch must be non-empty")
  }

  test("D89: a cell splits exactly when its occupancy exceeds the cap") {
    rows.foreach { r =>
      val split = r.getAs[Boolean]("was_split")
      val over = r.getAs[Long]("parent_total") > r.getAs[Long]("cap")
      assert(split === over,
        s"cell ${r.getAs[String]("cell_key")}: split=$split over=$over")
      if (!split)
        assert(r.getAs[Long]("n_total") === r.getAs[Long]("parent_total"))
    }
    assert(rows.exists(_.getAs[Boolean]("was_split")),
      "the quantile cap guarantees the split path exercises")
  }

  test("D89: split children partition their parent exactly") {
    val byParent = rows.filter(_.getAs[Boolean]("was_split"))
      .groupBy(_.getAs[Int]("parent_cell"))
    assert(byParent.nonEmpty)
    byParent.foreach { case (p, children) =>
      assert(children.length >= 1 && children.length <= 2)
      assert(children.map(_.getAs[Long]("n_total")).sum ===
        children.head.getAs[Long]("parent_total"),
        s"parent $p: children must hold exactly the parent's vectors")
    }
    assert(byParent.exists(_._2.length === 2),
      "at least one split must genuinely bisect")
  }

  test("D89: maintenance is deterministic") {
    val again = IvfMaintain.maintain(spark, sf).collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }
}
