package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions.stableRound

/** Deduplication operators for training-data pipelines (north-star
  * surface): exact, n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale posture:
  *  - Exact dedup is a hash-aggregate on a fingerprint (one shuffle of
  *    (fingerprint, id) pairs, never of full texts).
  *  - MinHash signatures and SimHash values are per-row expressions
  *    (map-only). Candidate generation is LSH banding: explode to
  *    (band, bucket) keys and self-join inside buckets — the shuffle is
  *    on short hash strings, and the quadratic blow-up is confined to
  *    same-bucket collisions. This is the 100 TB path; the pairwise
  *    Jaccard join is only ever run inside a blocking key.
  *  - All hashes are md5-hex-derived (portable → DuckDB oracle).
  */
object Dedup {

  /** Exact dedup: keep the lowest id per distinct (cleaned) text.
    * Shuffles (fingerprint, id, ...) not raw text when `byFingerprint`. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .groupBy(md5(cleanText(col(textCol))).as("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** MinHash signature entry k for a shingle set: min over shingles of
    * md5(k || '|' || shingle). Lexicographic min over hex strings is a
    * uniform permutation-min — the classic MinHash estimator. */
  def minhashSig(shingleSetCol: Column, k: Int): Column =
    array_min(transform(shingleSetCol, s => md5(concat(lit(k.toString), lit("|"), s))))

  /** docs → (id, sig_0..sig_{numHashes-1}) MinHash signatures. */
  def withMinhashSignature(docs: DataFrame, idCol: String, textCol: String,
                           shingleN: Int = 3, numHashes: Int = 8): DataFrame = {
    val sh = shingleSet(tokens(lower(cleanText(col(textCol)))), shingleN)
    val withSh = docs.withColumn("_sh", sh).filter(size(col("_sh")) > 0)
    (0 until numHashes).foldLeft(withSh) { (df, k) =>
      df.withColumn(s"sig_$k", minhashSig(col("_sh"), k))
    }.drop("_sh")
  }

  /** LSH banding: (id, band_id, bucket) where bucket = md5 of the band's
    * concatenated signature rows. Docs sharing any (band_id, bucket) are
    * near-dup candidates. */
  def lshBands(sigs: DataFrame, idCol: String, numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val bandCols = (0 until bands).map { b =>
      val sigCols = (0 until rows).map(r => col(s"sig_${b * rows + r}"))
      struct(lit(b).as("band_id"), md5(concat_ws("#", sigCols: _*)).as("bucket"))
    }
    sigs
      .select(col(idCol), explode(array(bandCols: _*)).as("band"))
      .select(col(idCol), col("band.band_id"), col("band.bucket"))
  }

  /** Candidate near-dup pairs via MinHash LSH (distinct (a,b), a<b). */
  def minhashCandidates(docs: DataFrame, idCol: String, textCol: String,
                        shingleN: Int = 3, numHashes: Int = 8, bands: Int = 4): DataFrame = {
    val sigs = withMinhashSignature(docs, idCol, textCol, shingleN, numHashes)
    val b = lshBands(sigs, idCol, numHashes, bands)
    val l = b.select(col("band_id"), col("bucket"), col(idCol).as("id_a"))
    val r = b.select(col("band_id"), col("bucket"), col(idCol).as("id_b"))
    l.join(r, Seq("band_id", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** Pairwise n-gram Jaccard within a blocking key. Built-in set algebra
    * (`array_intersect`/`array_union` are distinct-set ops) keeps this
    * codegen'd; the block key bounds the quadratic term. */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String, blockCol: String,
                   shingleN: Int = 3, threshold: Double = 0.0): DataFrame = {
    val withSh = docs
      .withColumn("_sh", shingleSet(tokens(lower(cleanText(col(textCol)))), shingleN))
      .filter(size(col("_sh")) > 0)
    val a = withSh.select(col(blockCol).as("_blk"), col(idCol).as("id_a"), col("_sh").as("_sa"))
    val b = withSh.select(col(blockCol).as("_blk"), col(idCol).as("id_b"), col("_sh").as("_sb"))
    a.join(b, Seq("_blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("jaccard",
        size(array_intersect(col("_sa"), col("_sb"))).cast("double") /
          size(array_union(col("_sa"), col("_sb"))))
      .filter(col("jaccard") >= threshold)
      .select(col("_blk").as(blockCol), col("id_a"), col("id_b"), stableRound(col("jaccard")).as("jaccard"))
  }

  /** SimHash over tokens: bit j is set iff the majority of tokens have md5
    * bit j set (strictly positive vote sum). `bits` ≤ 32 (one hex digit
    * carries 4 bits; bit j reads digit j/4, weight 2^(3-j%4)). */
  def simhash(text: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 32, "bits in [1,32]")
    val toks = tokens(lower(cleanText(text)))
    // vote_j = sum over tokens of (2*bit_j - 1); simhash bit_j = vote_j > 0.
    // bit_j of a token reads hex digit j/4 of its md5, weight 2^(3 - j%4).
    val votes = transform(sequence(lit(0), lit(bits - 1)), j => {
      val digitPos = floor(j.cast("double") / 4.0).cast("int") + 1
      val weight = pow(lit(2.0), lit(3) - pmod(j, lit(4)))
      aggregate(toks, lit(0), (s, t) => {
        val digit = hexCharVal(md5(t).substr(digitPos, lit(1)))
        val bit = pmod(floor(digit.cast("double") / weight).cast("int"), lit(2))
        s + (bit * 2 - 1)
      })
    })
    aggregate(
      zip_with(votes, sequence(lit(0), lit(bits - 1)), (v, j) =>
        when(v > 0, pow(lit(2.0), j).cast("long")).otherwise(lit(0L))),
      lit(0L), (s, x) => s + x)
  }
}
