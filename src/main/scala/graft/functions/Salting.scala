package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins: explode one hot key into `salts`
  * sub-keys. The big (skewed) side tags each row with a pseudo-random salt
  * in [0, salts); the small side replicates every row once per salt. The
  * join key becomes (key, salt), so a hot key's rows spread over `salts`
  * reducers instead of one.
  *
  * This is the manual fallback for when AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default in
  * [[graft.Sessions]]) can't help — e.g. a skewed *aggregation* upstream,
  * or a broadcast-ineligible small side. At 100 TB prefer AQE first; reach
  * for explicit salting only on measured residual skew.
  */
object Salting {

  /** Inner equi-join `big ⋈ small` on `key`, salted `salts` ways.
    * Result is bag-equal to the unsalted join (salt columns are dropped).
    */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts > 0)
    val b = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    b.join(s, Seq(key, "__salt")).drop("__salt")
  }
}
