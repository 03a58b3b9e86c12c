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

  /** VARIABLE-factor salted join — the measured end of the skew pipeline
    * (skew_profile → salt_advisor → here): `factors` is the advisor's
    * (key, salt_factor) output, so each hot key fans its dim row out
    * exactly ⌈n/median⌉ ways while every other key keeps factor 1 — NO
    * replication at all on the cold tail, where the fixed-bucket
    * [[saltedEquiJoin]] multiplies the whole dim side by saltBuckets.
    * The factor table is advisor-sized (hot keys only) and broadcasts to
    * both sides; result is provably identical to the unsalted equi-join
    * (ScaleOpsSpec asserts it row-for-row, and the join_salted_auto oracle
    * is the UNSALTED join). */
  def adaptiveSaltedEquiJoin(big: DataFrame, small: DataFrame, bigKey: String,
                             smallKey: String, factors: DataFrame, factorKey: String,
                             saltSource: Column): DataFrame = {
    // clamp: a zero/negative factor from a buggy advisor must degrade to
    // "unsalted" (factor 1), never to sequence(0, -1) = [0, -1] dim
    // duplication on the small side + pmod-by-zero on the big side
    val f = factors.select(col(factorKey).as("_fk"),
      greatest(col("salt_factor").cast(IntegerType), lit(1)).as("_sf"))
    val bigS = big.join(broadcast(f), big(bigKey) === col("_fk"), "left")
      .withColumn("_salt",
        pmod(xxhash64(saltSource), coalesce(col("_sf"), lit(1)).cast(LongType))
          .cast(IntegerType))
      .drop("_fk", "_sf")
    val smallS = small.join(broadcast(f), small(smallKey) === col("_fk"), "left")
      .withColumn("_salt", explode(sequence(lit(0), coalesce(col("_sf"), lit(1)) - 1)))
      .drop("_fk", "_sf")
    bigS.join(smallS, bigS(bigKey) === smallS(smallKey) && bigS("_salt") === smallS("_salt"))
      .drop("_salt")
  }
}
