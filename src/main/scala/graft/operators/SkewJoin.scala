package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`,
  * on by default) is the first line of defense — it splits oversized
  * shuffle partitions at runtime. Salting is the explicit fallback for
  * the pathological case AQE can't fix: ONE join key holding more rows
  * than any partition split can balance (power-law fact keys at 100 TB).
  *
  * The probe side is salted deterministically by hashing its whole row
  * into `nSalts` buckets; the build side is replicated `nSalts` times.
  * The join then shuffles on (key, salt): a hot key spreads over
  * `nSalts` reducers instead of melting one. Result set is provably
  * identical to the unsalted join (every probe row still meets every
  * matching build row exactly once — in exactly one salt bucket).
  */
object SkewJoin {

  /** Inner-join `probe` (large, possibly skewed) with `build` (smaller,
    * replicated) on equi-key columns, spreading each probe key over
    * `nSalts` reducers.
    */
  def saltedInnerJoin(
      probe: DataFrame,
      build: DataFrame,
      joinKeys: Seq[(String, String)],
      nSalts: Int = 8
  ): DataFrame = {
    // nSalts=0 would make pmod NULL (never-matching join) and a
    // negative count would drop every build row — both silently empty
    require(nSalts > 0, s"nSalts must be positive, got $nSalts")
    // a real '_salt' input column would be hashed into the salt, then
    // silently replaced and dropped from the output
    require(
      !probe.columns.contains("_salt") && !build.columns.contains("_salt"),
      "column '_salt' collides with SkewJoin's scratch name — rename upstream"
    )
    // Deterministic per-row salt: hash of all probe columns. Any
    // assignment is correct; a hash keeps re-runs identical.
    val saltExpr = pmod(
      xxhash64(probe.columns.map(col).toSeq: _*),
      lit(nSalts)
    ).cast("int")
    val salted = probe.withColumn("_salt", saltExpr)
    val replicated = build.withColumn(
      "_salt",
      explode(array((0 until nSalts).map(lit): _*))
    )
    val cond = joinKeys
      .map { case (pk, bk) => salted(pk) === replicated(bk) }
      .reduce(_ && _) && salted("_salt") === replicated("_salt")
    salted
      .join(replicated, cond)
      .drop(replicated("_salt"))
      .drop(salted("_salt"))
  }
}
