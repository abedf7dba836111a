package graft.etl

/** Child process for the IO23 two-process CAS race proof
  * (SnapshotCasSpec): reads the table's current snapshot id as its
  * base, then attempts a conditional commit with a WIDENED
  * check-to-swap window. Two children started together must both read
  * the same base; the OS file lock serializes them, so exactly one
  * WINs and the other observes the winner's manifest and LOSEs with
  * the conflict refusal. Prints `WIN <id>` or `LOSE` as its last line.
  *
  * Usage: graft.etl.SnapshotRaceChild <tableRoot> <holdMs> <tag>
  */
object SnapshotRaceChild {
  def main(args: Array[String]): Unit = {
    val (root, holdMs, tag) = (args(0), args(1).toLong, args(2))
    val spark = graft.Sessions.withMaster("local[2]", "2")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = Seq((tag, System.nanoTime())).toDF("writer", "nanos")
    val base = Snapshots.currentId(root)
    Snapshots.raceHoldMs = holdMs
    try {
      val id = Snapshots.commitIf(df, root, base)
      println(s"WIN $id")
    } catch {
      case _: java.util.ConcurrentModificationException => println("LOSE")
    }
    spark.stop()
  }
}
