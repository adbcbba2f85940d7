package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-proof exact per-key top-k.
  *
  * A single `row_number() OVER (PARTITION BY key ...)` funnels every row
  * of a key into one task — the classic hot-key wall: at 100 TB one
  * pathological key (a bot user, an empty-string group, a default id)
  * can hold a billion rows while the other 10^6 keys hold thousands.
  *
  * [[saltedTopK]] runs the textbook two-phase form instead:
  *
  *  1. rank within `(key, salt)` — the hot key's rows spread over
  *     `salts` tasks, each emitting at most k survivors;
  *  2. rank the ≤ `salts * k` survivors per key.
  *
  * With a TOTAL ordering (deterministic tie-break) the output is
  * byte-identical to the single-window form for EVERY salt assignment —
  * each (key,salt) slice's local top-k is a superset of that slice's
  * contribution to the global top-k — which is what lets the salted
  * query share the plain query's oracle SQL verbatim.
  */
object TopK {

  /** Exact top-k rows per `keys`, ranked by `ordering` (must be total —
    * include a unique tie-break column), with phase-1 salting on
    * `pmod(hash(saltFrom), salts)`. `saltFrom` only balances work — any
    * column works; a high-cardinality one (a row id) balances best.
    * Emits the input columns plus `rnk` (1-based). */
  def saltedTopK(
      df: DataFrame,
      keys: Seq[String],
      ordering: Seq[Column],
      k: Int,
      saltFrom: Column,
      salts: Int = 16
  ): DataFrame = {
    require(k > 0 && salts > 0, s"k=$k and salts=$salts must be positive")
    val w1 = Window
      .partitionBy(keys.map(col) :+ col("__salt"): _*)
      .orderBy(ordering: _*)
    val w2 = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    df.withColumn("__salt", pmod(hash(saltFrom), lit(salts)))
      .withColumn("__r1", row_number().over(w1))
      .filter(col("__r1") <= k)
      .drop("__r1")
      .withColumn("rnk", row_number().over(w2).cast("long"))
      .filter(col("rnk") <= k)
      .drop("__salt")
  }
}
