package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys.
  *
  * At 100 TB a handful of hot keys (one tenant with half the corpus, one
  * ubiquitous shingle) can pin an entire shuffle behind one straggler
  * task. AQE's skew-join split handles sort-merge cases adaptively; this
  * utility is the explicit form for when the skew is known and extreme:
  *
  *  - the LEFT (large, skewed) side gets a random-but-deterministic salt
  *    in [0, buckets) derived from md5 of a row id (no RNG — results stay
  *    reproducible);
  *  - the RIGHT side is replicated `buckets` times (explode over the salt
  *    range), so every (key, salt) partition joins locally.
  *
  * Cost: right side × buckets; use for dimension-sized right sides.
  */
object SkewJoin {

  /** Deterministic salt in [0, buckets) from an id column. */
  def salt(idCol: Column, buckets: Int): Column =
    pmod(conv(substring(md5(idCol.cast("string")), 1, 4), 16, 10).cast("int"), lit(buckets))

  /** Inner-join `big` (skewed on `key`) with `small`, spreading each hot
    * key over `buckets` partitions. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, saltSource: String,
                 buckets: Int): DataFrame = {
    require(buckets > 0)
    val saltedBig = big.withColumn("_salt", salt(col(saltSource), buckets))
    val replicatedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "_salt")).drop("_salt")
  }
}
