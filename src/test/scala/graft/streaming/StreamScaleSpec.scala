package graft.streaming

import graft.{SparkSpec, StreamScaleBench, Tables}

/** Gate for the stream-scale harness (L10): the staged time-ordered
  * replay must consume EVERY input row (nothing dropped as late — the
  * staging exists precisely so the watermark trails the replay), and
  * watermarked state must be RELEASED as windows close (bounded-state
  * claim at harness level; the committed bench/stream_scale_r9*.json
  * artifacts carry the at-scale measurements). */
class StreamScaleSpec extends SparkSpec {

  private val Provider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  test("staged replay consumes every event; session state is released " +
      "as the watermark advances; MG summaries evict on window close") {
    val s = spark.newSession()
    s.conf.set(ProviderKey, Provider)
    val work = "/tmp/graft_stream_scale_spec_" + ProcessHandle.current().pid()
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    rm(new java.io.File(work))
    try {
      val events = Tables.events(s, sf)
      val n = events.count()
      StreamScaleBench.stage(s, events, "ts", s"$work/staged", 4)

      val sess = StreamScaleBench.sessionWindows(s, s"$work/staged", 1, s"$work/ck_s")
      assert(sess.rows === n, "session replay dropped rows as late")
      assert(sess.batches === 4)
      // the last batch's open-session state must be far below the peak
      // (the watermark closed earlier sessions); peak far below inputs
      assert(sess.stateRowsLast < sess.stateRowsMax,
        s"state never released: last=${sess.stateRowsLast} max=${sess.stateRowsMax}")
      assert(sess.stateRowsMax < n,
        "open-session state should never approach total input rows")

      val hh = StreamScaleBench.heavyHitters(s, s"$work/staged", 1, s"$work/ck_h")
      assert(hh.rows === n)
      // MG state is capacity-bounded per (window, shard): 5 event
      // types, 8 shards, <= ~720 open hour-windows — and close-time
      // eviction must leave the tail below the peak
      assert(hh.stateRowsLast <= hh.stateRowsMax)
      assert(hh.stateRowsMax < n)

      val tot = StreamScaleBench.runningTotals(s, s"$work/staged", 1, s"$work/ck_t")
      assert(tot.rows === n)
      // TimeMode.None totals: state == |users seen|, exactly
      val users = events.select("user_id").distinct().count()
      assert(tot.stateRowsLast === users)
    } finally rm(new java.io.File(work))
  }

  test("the r11 stateful family holds its designed state bounds: " +
      "per-user singletons for fill/CEP/rate-limit, fixed shard/key " +
      "counts for bottom-k and quantiles") {
    val s = spark.newSession()
    s.conf.set(ProviderKey, Provider)
    val work = "/tmp/graft_stream_scale_spec2_" + ProcessHandle.current().pid()
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    rm(new java.io.File(work))
    try {
      val events = Tables.events(s, sf)
      val n = events.count()
      val users = events.select("user_id").distinct().count()
      StreamScaleBench.stage(s, events, "ts", s"$work/staged", 4)

      val ff = StreamScaleBench.forwardFill(s, s"$work/staged", 1, s"$work/c1")
      assert(ff.rows === n)
      assert(ff.stateRowsLast === users,
        s"forward-fill state must be exactly |users|: ${ff.stateRowsLast}")

      val cep = StreamScaleBench.sequencePatterns(s, s"$work/staged", 1, s"$work/c2")
      assert(cep.rows === n && cep.stateRowsLast === users)

      val bk = StreamScaleBench.bottomKSample(s, s"$work/staged", 1, s"$work/c3")
      assert(bk.rows === n)
      assert(bk.stateRowsMax <= 64,
        s"bottom-k state is one reservoir row per shard: ${bk.stateRowsMax}")

      val qm = StreamScaleBench.quantileMonitor(s, s"$work/staged", 1, s"$work/c4")
      assert(qm.rows === n)
      assert(qm.stateRowsMax <= 64,
        s"quantile state is one sketch row per key: ${qm.stateRowsMax}")

      val rl = StreamScaleBench.rateLimit(s, s"$work/staged", 1, s"$work/c5")
      assert(rl.rows === n && rl.stateRowsLast === users)
    } finally rm(new java.io.File(work))
  }
}
