package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Skew mitigation for shuffle joins: salt the skewed (big) side into
  * `saltBuckets` sub-keys and replicate the other side once per salt, so a
  * hot key's rows spread over `saltBuckets` reducers instead of one.
  *
  * Use when the dim side is too big to broadcast AND the fact side's key
  * distribution is heavy-tailed (AQE's skew-join handles sort-merge skew
  * after the fact; salting prevents the hot partition from forming at all,
  * and is the only option for aggregations keyed on the hot key).
  *
  * The salt is derived deterministically from `saltSource` (no rand() — the
  * result must be stable across retries and speculative tasks).
  */
object SkewJoin {

  def saltedEquiJoin(big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
                     saltBuckets: Int, saltSource: Column): DataFrame = {
    val bigS = big.withColumn("_salt",
      pmod(xxhash64(saltSource), lit(saltBuckets.toLong)).cast(IntegerType))
    val smallS = small.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    bigS.join(smallS, bigS(bigKey) === smallS(smallKey) && bigS("_salt") === smallS("_salt"))
      .drop("_salt")
  }
}
