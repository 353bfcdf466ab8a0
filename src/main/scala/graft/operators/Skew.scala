package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for large equi-joins (SURVEY.md §2.11 scale posture).
  *
  * AQE's skew-join handles most cases at runtime; explicit salting remains
  * the tool when one side has pathological hot keys AND the other side is
  * too large to broadcast: replicate the small side `salt` times and
  * scatter the big side's hot keys uniformly across the replicas, turning
  * one oversized shuffle partition into `salt` even ones.
  */
object Skew {

  /** Salted inner equi-join: `big ⋈ small` on `bigKey = smallKey`.
    * `big` rows get a uniform pseudo-random salt derived from the row id;
    * `small` is exploded into all `salt` replicas — exact same result set
    * as the plain join, `salt`× smaller max-partition. */
  def saltedJoin(big: DataFrame, small: DataFrame,
                 bigKey: String, smallKey: String, salt: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salt)).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedBig.join(saltedSmall,
        saltedBig(bigKey) === saltedSmall(smallKey) &&
          saltedBig("__salt") === saltedSmall("__salt"))
      .drop("__salt")
  }
}
