package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting (builder mandate: "salting for skew";
  * complements AQE's runtime skew-join splitting).
  *
  * Two-phase aggregation: group once on (key, salt) — spreading a hot key
  * over `buckets` reducers — then re-aggregate on key. Works for any
  * algebraic aggregate; helpers below cover count/sum. Result equality
  * with direct aggregation is asserted in SaltingSpec (sums in decimal,
  * so merge order cannot change results). */
object Salting {

  /** Deterministic-ish salt column: uniform in [0, buckets). Salt choice
    * does not affect results, only distribution — `rand` is fine, but a
    * hash of a high-cardinality column keeps runs reproducible. */
  def saltFrom(c: Column, buckets: Int): Column = pmod(xxhash64(c), lit(buckets))

  /** Salted count+sum aggregation: groupBy(keys :+ salt) partial, then
    * groupBy(keys) final. `sumCol` is summed exactly in decimal. */
  def saltedCountSum(df: DataFrame, keys: Seq[String], saltSource: String,
                     sumCol: String, buckets: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt", saltFrom(col(saltSource), buckets))
    val partial = salted
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(count(lit(1)).as("_cnt"),
        sum(col(sumCol).cast(org.apache.spark.sql.types.DecimalType(30, 6))).as("_sum"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_cnt")).as("n"), sum(col("_sum")).cast("double").as("total"))
  }

  /** Salted join for a skewed LEFT side against a small-ish right side:
    * left gets a random salt in [0,buckets), right is replicated across
    * all buckets (explode), join on (key, salt). Equality with the plain
    * join is asserted in SaltingSpec. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 buckets: Int = 8): DataFrame = {
    val l = left.withColumn("_salt", pmod(xxhash64(monotonically_increasing_id()), lit(buckets)))
    val r = right.withColumn("_salt", explode(sequence(lit(0), lit(buckets - 1))))
      .withColumn("_salt", col("_salt").cast("bigint"))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }
}
