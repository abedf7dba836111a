package graft.dedup

import graft.SparkSpec

/** D90 — phrase-search laws beyond the oracle: the two formulations
  * (positional adjacency vs substring containment) agree row by row,
  * and the counts obey the containment hierarchy. */
class PhraseSearchSpec extends SparkSpec {

  private lazy val rows =
    InvertedIndex.textPhraseSearch.fn(spark, sf).collect()

  test("D90: index path and scan path agree on every phrase") {
    assert(rows.nonEmpty && rows.length <= 4)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") === r.getAs[Long]("n_docs_scan"),
        s"${r.getAs[String]("phrase")}: token adjacency must equal " +
          "space-bounded substring containment")
    }
  }

  test("D90: occurrence and document counts obey containment") {
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") >= 1L,
        "data-derived queries always have at least one hit")
      assert(r.getAs[Long]("n_occ") >= r.getAs[Long]("n_docs"),
        "a matching doc contributes at least one occurrence")
    }
    // the top-3 frequent phrases must out-hit the least frequent one
    val occ = rows.map(_.getAs[Long]("n_occ")).sorted
    assert(occ.last > occ.head || rows.length === 1)
  }
}
