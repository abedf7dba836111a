package graft

import org.apache.spark.sql.functions._

/** The measured witness for D111's past-the-cap claim (r8 verdict
  * item 3): at N vectors beyond [[graft.similarity.Ivf]]'s 4096-cell
  * cap, compare the capped single-level quantizer against the IMI
  * product quantizer on the costs that actually bind at scale —
  * codebook TRAINING (one Lloyd step = a full assignment pass),
  * corpus ASSIGNMENT throughput (every ingested vector pays it), cell
  * balance (max/mean population — the within-cell work bound), and a
  * bounded-query PROBE.
  *
  * Cost model being verified: single-level assignment scores `cells`
  * full centroids per row (O(√N·d) flops/row at the design point, so
  * the cap exists); IMI scores 2·K half-centroids per row with
  * K = N^(1/4) (O(N^(1/4)·d)) — at N = 20M that is 4096 full
  * centroids vs 2×67 half-centroids, a ~61× flop cut at EQUAL
  * effective cell counts, growing as √N/(2·N^(1/4)) without bound.
  *
  * Usage: runMain graft.ImiCapBench <outJson> [--n N] (default 20M;
  * the vectors-only corpus generates into data/scale/embN, reused).
  */
object ImiCapBench {

  def main(args: Array[String]): Unit = {
    val outJson = args(0)
    def opt(flag: String): Option[String] =
      args.sliding(2).collectFirst { case Array(`flag`, v) => v }
    val n = opt("--n").map(_.toLong).getOrElse(20000000L)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")

    val dir = s"data/scale/emb$n"
    if (!new java.io.File(s"$dir/_SUCCESS").exists())
      GenScale.embeddingsFrame(spark, n)
        .write.mode("overwrite").parquet(dir)
    val corpus = spark.read.parquet(dir)

    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // materialize an assignment pass and read back cell balance
    def assignStats(assigned: org.apache.spark.sql.DataFrame): (Long, Long, Double) = {
      val pops = assigned.groupBy("cell").count()
        .agg(count(lit(1)).as("cells"), max("count").as("mx"),
          avg("count").as("mean")).collect()(0)
      (pops.getLong(0), pops.getLong(1), pops.getDouble(2))
    }

    val queries = corpus.filter(col("vec_id") % (n / 32) === 0)

    // ---- single-level IVF at its cap (skippable: the IVF leg is the
    // ~30-min side and its r9 numbers stand; --skip-ivf refreshes only
    // the IMI legs, emitting "ivf":null)
    val skipIvf = args.contains("--skip-ivf")
    val ivfCells = 4096 // what resolveCells returns for any N >= 16.7M
    val (tTrainIvf, tAssignIvf, tProbeIvf, ivfNc, ivfMax, ivfMean) =
      if (skipIvf) (0.0, 0.0, 0.0, 0L, 0L, 0.0)
      else {
        val (cbIvf, tTrain) = timed(graft.similarity.Ivf.trainCodebook(corpus, ivfCells))
        val ((nc, mx, mean), tAssign) =
          timed(assignStats(graft.similarity.Ivf.assignCells(corpus, cbIvf)
            .select("vec_id", "cell")))
        val (_, tProbe) = timed {
          graft.similarity.Ivf.topK(corpus, queries, 10,
              cells = ivfCells, cacheKey = dir)
            .write.format("noop").mode("overwrite").save()
        }
        (tTrain, tAssign, tProbe, nc, mx, mean)
      }

    // ---- IMI at the same-or-more effective cells, uncapped
    val kHalf = graft.similarity.Imi.autoCellsPerHalf(corpus, dir)
    val ((cb1, cb2), tTrainImi) =
      timed(graft.similarity.Imi.codebooks(corpus, kHalf, dir))
    val dim = 64
    val ((imiNc, imiMax, imiMean), tAssignImi) =
      timed(assignStats(graft.similarity.Imi.assignCells(corpus, cb1, cb2, dim)
        .select("vec_id", "cell")))
    val (_, tProbeImi) = timed {
      graft.similarity.Imi.topK(corpus, queries, 10,
          cellsPerHalf = kHalf, cacheKey = dir)
        .write.format("noop").mode("overwrite").save()
    }

    // ---- STORED IMI index (r10 verdict item 2): write the corpus
    // partitioned by combined cell once, then probe through the
    // directory layout — the deployment shape where the probe's scan
    // PRUNES to the probed cells' directories instead of re-reading
    // and re-assigning the whole corpus per query batch.
    // sibling of the corpus dir, NEVER inside it: a partitioned
    // subtree under the corpus path makes later plain reads fail with
    // CONFLICTING_DIRECTORY_STRUCTURES. Keyed on the corpus _SUCCESS
    // mtime so a regenerated corpus can never silently reuse a stale
    // index (r11 ADVICE item 1) — probe timings must measure the index
    // of THIS corpus, not a previous generation's.
    val corpusStamp = new java.io.File(s"$dir/_SUCCESS").lastModified()
    // a missing _SUCCESS marker stamps 0 — every unmarked corpus would
    // alias to the same ..._0 index and silently share a stale one,
    // exactly the reuse the stamp exists to prevent (r12 ADVICE item 4)
    require(corpusStamp > 0L,
      s"$dir/_SUCCESS missing or unreadable: refusing to key the stored " +
        "index on stamp 0 (stale-index aliasing hazard)")
    val idxDir = s"${dir}_imi_index_${kHalf}_$corpusStamp"
    // retire previous generations' index trees: each regeneration would
    // otherwise leave its full corpus-sized index on disk forever
    val idxParent = new java.io.File(idxDir).getAbsoluteFile.getParentFile
    val idxPrefix = new java.io.File(s"${dir}_imi_index_${kHalf}_").getName
    Option(idxParent.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(idxPrefix) &&
        f.getName != new java.io.File(idxDir).getName)
      .foreach { stale =>
        println(s"[imi-cap] deleting stale index generation: $stale")
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(stale)
      }
    val needBuild = !new java.io.File(s"$idxDir/_SUCCESS").exists()
    val (_, tWriteIdx) = timed {
      if (needBuild)
        graft.similarity.Imi.writeIndex(corpus, idxDir,
          cellsPerHalf = kHalf, cacheKey = dir)
    }
    val probedSet =
      graft.similarity.Imi.probedCellIds(queries, cb1, cb2).toSet
    val fromIndex = graft.similarity.Imi.topKFromIndex(
      spark, idxDir, cb1, cb2, queries, 10)
    // measured pruning: the scan's selected partitions, read from the
    // physical plan BEFORE execution, must be bounded by the probed
    // cell set — the at-scale form of ImiSpec's directory assert
    val cellsRead = fromIndex.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.output.exists(_.name == "cell") => f
    }.head.selectedPartitions.partitionCount
    require(cellsRead <= probedSet.size && cellsRead < imiNc,
      s"stored probe must prune: read $cellsRead, probed ${probedSet.size}, " +
        s"nonempty $imiNc")
    val (_, tProbeStored) = timed {
      fromIndex.write.format("noop").mode("overwrite").save()
    }

    // --skip-ivf leaves the IVF leg unmeasured: emit null (the r9
    // artifact's IVF numbers stand), never zeros that read as measured
    val ivfJson =
      if (skipIvf) """"ivf":null,"""
      else s""""ivf":{"cells_config":$ivfCells,"cells_nonempty":$ivfNc,""" +
        f""""train_secs":$tTrainIvf%.1f,"assign_secs":$tAssignIvf%.1f,""" +
        f""""probe_secs":$tProbeIvf%.1f,"max_cell":$ivfMax,"mean_cell":$ivfMean%.0f},"""
    val speedups =
      if (skipIvf) """"train_speedup":null,"assign_speedup":null,"""
      else f""""train_speedup":${tTrainIvf / tTrainImi}%.1f,""" +
        f""""assign_speedup":${tAssignIvf / tAssignImi}%.1f,"""
    val json =
      s"""{"n_vectors":$n,"dim":$dim,""" + ivfJson +
        s""""imi":{"cells_per_half":$kHalf,"cells_config":${kHalf.toLong * kHalf},""" +
        s""""cells_nonempty":$imiNc,""" +
        f""""train_secs":$tTrainImi%.1f,"assign_secs":$tAssignImi%.1f,""" +
        f""""probe_secs":$tProbeImi%.1f,"max_cell":$imiMax,"mean_cell":$imiMean%.0f},""" +
        // a reused index has NO measured write: null (the --skip-ivf
        // convention), never a ~0.0 that reads as a measurement
        s""""imi_stored":{"write_secs":${
          if (needBuild) f"$tWriteIdx%.1f" else "null"},""" +
        s""""probe_secs":${f"$tProbeStored%.1f"},"cells_read":$cellsRead,""" +
        s""""cells_probed":${probedSet.size},"cells_nonempty":$imiNc,""" +
        f""""prune_fraction":${cellsRead.toDouble / imiNc}%.4f},""" + speedups +
        f""""stored_probe_speedup":${tProbeImi / tProbeStored}%.1f}"""
    val w = new java.io.PrintWriter(outJson)
    try w.println(json) finally w.close()
    println(json)
    spark.stop()
  }
}
