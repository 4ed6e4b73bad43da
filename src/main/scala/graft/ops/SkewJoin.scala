package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit key-salting for skewed shuffles — the manual fallback the
  * brief calls for alongside AQE.
  *
  * AQE's skew-join (on by default) splits oversized shuffle blocks of
  * the probe side at runtime and is the FIRST answer to moderate skew.
  * Explicit salting remains necessary when (a) a single key's build
  * rows must be replicated because even one key's probe rows exceed a
  * task, and (b) the join feeds a same-key aggregation, where AQE's
  * block splitting cannot help the downstream exchange. At 100 TB a
  * power-law key (one customer, one document shingle) otherwise pins
  * the whole stage on one reducer.
  *
  * Mechanics: the probe side gets a DETERMINISTIC per-row salt
  * (xxhash64 over all its columns mod `nSalts` — no rand(), so plans
  * stay replayable and oracle-comparable); the build side is
  * replicated across all `nSalts` values with `explode`. Joining on
  * (key, salt) splits every hot key across `nSalts` reducers at the
  * cost of an nSalts× build-side replication — which is why the build
  * side should be the smaller input and `nSalts` modest (8–32).
  */
object SkewJoin {

  /** Equi-join `probe.probeKey == build.buildKey`, salted `nSalts`
    * ways. Output columns = probe's ++ build's (minus the salt
    * plumbing), exactly like a plain inner equi-join. */
  def saltedJoin(probe: DataFrame, probeKey: String,
                 build: DataFrame, buildKey: String,
                 nSalts: Int): DataFrame = {
    require(nSalts >= 1, s"nSalts must be positive, got $nSalts")
    val saltOf: Column = pmod(xxhash64(probe.columns.toIndexedSeq.map(col): _*), lit(nSalts))
    val saltedProbe = probe.withColumn("__salt", saltOf)
    val replicatedBuild = build
      .withColumn("__salt", explode(sequence(lit(0L), lit(nSalts - 1L))))
    saltedProbe.join(replicatedBuild,
        saltedProbe(probeKey) === replicatedBuild(buildKey) &&
          saltedProbe("__salt") === replicatedBuild("__salt"))
      .drop("__salt")
  }
}
