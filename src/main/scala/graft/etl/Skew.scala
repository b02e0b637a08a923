package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY §2 scale notes): salt the
  * skewed (large) side with a random-ish factor derived from a stable row
  * attribute, replicate the small side across all salt values, and join on
  * (key, salt). AQE's skew-join split handles sort-merge cases at runtime;
  * explicit salting is for the planned-ahead variant (e.g. a hot NULL or
  * a mega-subscriber key in a rating pipeline).
  */
object Skew {

  /** Deterministic salt in [0, factor): hash of a stable column keeps the
    * result reproducible (pure rand() would break retries/oracles). */
  def salt(stable: Column, factor: Int): Column =
    pmod(hash(stable), lit(factor))

  /** Join types where replicating the small side across salt values cannot
    * duplicate output rows: the small side only ever contributes matched
    * rows (or none). Right/full outer would emit each unmatched small-side
    * row `factor` times — silently wrong, so they're rejected. */
  private val safeJoinTypes =
    Set("inner", "left", "leftouter", "leftsemi", "semi", "leftanti", "anti", "cross")

  /** Salted equi-join: `big` ⋈ `small` on `key`, with `big` salted by the
    * stable column and `small` exploded across the factor. One shuffle on
    * (key, salt); the hot key now spreads over `factor` reducers. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      stable: Column, factor: Int, joinType: String = "inner"): DataFrame = {
    require(safeJoinTypes.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left/left_semi/left_anti/cross; '$joinType' would " +
        "replicate unmatched small-side rows across salt values")
    val salted = big.withColumn("_salt", salt(stable, factor))
    val replicated = small
      .withColumn("_salt", explode(array((0 until factor).map(lit): _*)))
    salted.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
