package graft.streaming

/** Cross-process test harness (round 13, VERDICT r12 item 5): a second
  * JVM that takes a table's writer lock through the PRODUCTION
  * [[StreamMerge.acquireWriterLock]]/[[StreamMerge.releaseWriterLock]]
  * path — not a hand-written lock file — holds it for `holdMs` (the
  * "slow final batch"), releases cooperatively, then stays alive so the
  * spec can prove the other writer acquired via RELEASE, not death.
  *
  * Usage: `java -cp <classes:spark-jars> graft.streaming.LockHolder
  * <tableDir> <holdMs> [stayAliveMs]` — prints `HELD` once the lock is
  * taken and `RELEASED` after the cooperative release.
  */
object LockHolder {
  def main(args: Array[String]): Unit = {
    val dir = java.nio.file.Paths.get(args(0))
    val holdMs = args(1).toLong
    val stayAliveMs = if (args.length > 2) args(2).toLong else 60000L
    StreamMerge.acquireWriterLock(dir)
    println("HELD")
    Console.flush()
    Thread.sleep(holdMs)
    StreamMerge.releaseWriterLock(dir)
    println("RELEASED")
    Console.flush()
    Thread.sleep(stayAliveMs)
  }
}
