package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.TextFunctions._

/** Mergeable one-pass sketches for corpus-scale statistics — the
  * bounded-memory path for questions that are exact-groupBy-sized at
  * test SF but vocabulary- or corpus-sized at 100 TB:
  *
  *  - count-min ([[cmSketch]]): frequency estimates for heavy hitters
  *    without materializing the full term dictionary — the shuffle is
  *    bounded at depth×width counters per map task (partial aggregation
  *    combines map-side), never at |vocab|;
  *  - KMV / bottom-k ([[kmvPerGroup]]): distinct-count estimates from
  *    the k smallest hash values — the only full-width stage is the
  *    per-group distinct over HASHES (vocabulary-bounded, never
  *    corpus-bounded), and the sketch itself is k rows per group;
  *  - Bloom membership ([[bloomBits]]/[[bloomContamination]]): the
  *    broadcast, map-only form of benchmark decontamination — the bench
  *    set is folded once into an mBits-wide bit set, and the 100 TB
  *    corpus side is a pure scan + filter with NO join against bench
  *    n-grams (compare [[Dedup.contamination]], whose shuffle carries
  *    corpus×bench shared shingles; here false positives are possible
  *    but deterministic, both engines compute identical bits).
  *
  * All hashes are md5-hex-derived (portable → the DuckDB oracle replays
  * every estimate bit-for-bit; sketch error is deterministic, not
  * sampled). Sketches merge by construction: count-min grids add
  * elementwise, KMV unions re-take the k minimum, Bloom bit sets OR —
  * so per-partition partials combine associatively, which is exactly
  * what Catalyst's partial aggregation already does for the groupBy
  * forms below.
  *
  * Reference scope: the reference computes corpus stats exactly at its
  * single-node scale (app/embedding_gen.py's full-dictionary passes);
  * these are the forms of the same statistics that survive 1000
  * executors.
  */
object Sketch {

  /** 60-bit md5-prefix hash of a salted item — the shared bucket
    * primitive (mirrors GraphIndex.uidFor; DuckDB: fold of 15 hex
    * chars). */
  private def md5Long(c: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), c)), 1, 15), 16, 10).cast("long")

  // ------------------------------------------------------------------ //
  // Count-min                                                          //
  // ------------------------------------------------------------------ //

  /** Count-min bucket of `item` in hash row `row`: md5("row|item") folded
    * to 60 bits, mod width. */
  def cmBucket(item: Column, row: Int, width: Int): Column =
    pmod(md5Long(item, s"$row|"), lit(width.toLong))

  /** Build a depth×width count-min grid over one item per input row:
    * (row, bucket, cnt). Map-only explode of `depth` (row, bucket)
    * cells per item, then a partial-aggregated groupBy — each map task
    * ships at most depth×width counters regardless of input size.
    * Estimates are upward-biased only (cnt collisions add, never
    * subtract). */
  def cmSketch(items: DataFrame, itemCol: String, depth: Int, width: Int): DataFrame = {
    require(depth > 0 && width > 0, s"cmSketch: bad grid ${depth}x$width")
    val cells = (0 until depth).map(r =>
      struct(lit(r).as("row"), cmBucket(col(itemCol), r, width).as("bucket")))
    items
      .select(explode(array(cells: _*)).as("_rb"))
      .groupBy(col("_rb.row").as("row"), col("_rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for `probes` against a built grid: min over the
    * depth rows of the probed cells (0 for a never-seen cell). The grid
    * is ≤ depth×width rows by construction → broadcast; the probe side
    * never shuffles more than depth rows per probe item. */
  def cmEstimates(sketch: DataFrame, probes: DataFrame, itemCol: String,
                  depth: Int, width: Int): DataFrame = {
    val cells = (0 until depth).map(r =>
      struct(lit(r).as("row"), cmBucket(col(itemCol), r, width).as("bucket")))
    probes
      .select(col(itemCol), explode(array(cells: _*)).as("_rb"))
      .select(col(itemCol), col("_rb.row").as("row"), col("_rb.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy(itemCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cm_est"))
  }

  // ------------------------------------------------------------------ //
  // KMV (bottom-k) distinct sketch                                     //
  // ------------------------------------------------------------------ //

  /** 52-bit md5-prefix hash for KMV — 13 hex chars so the value (and
    * every ratio derived from it) is exactly representable in a double
    * on both engines. */
  def kmvHash(c: Column): Column =
    conv(substring(md5(c), 1, 13), 16, 10).cast("long")

  /** Per-group bottom-k sketch: the k smallest DISTINCT item hashes,
    * (groupCol, h, rk). The distinct is over (group, hash) — vocabulary-
    * bounded with map-side partial aggregation; the rank window then
    * runs over hashes only, never raw items. */
  def kmvPerGroup(items: DataFrame, groupCol: String, itemCol: String, k: Int): DataFrame = {
    require(k > 1, s"kmvPerGroup: k must be > 1, got $k")
    val w = Window.partitionBy(groupCol).orderBy("h")
    items
      .select(col(groupCol), kmvHash(col(itemCol)).as("h"))
      .distinct()
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  /** Distinct-count estimate from a bottom-k sketch: (k-1)/frac(kth min)
    * where frac normalizes the 52-bit hash to [0,1); a sketch holding
    * fewer than k hashes saw the whole domain and IS the exact count.
    * Output: (groupCol, n_kept, est_distinct) — est unrounded (callers
    * round at the emission edge). */
  def kmvEstimate(sketch: DataFrame, groupCol: String, k: Int): DataFrame = {
    val full = lit(4503599627370496.0) // 2^52, exact in double
    sketch
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("_maxh"))
      .select(col(groupCol), col("n_kept"),
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble) / (col("_maxh").cast("double") / full))
          .as("est_distinct"))
  }

  // ------------------------------------------------------------------ //
  // Bloom membership (broadcast decontamination)                       //
  // ------------------------------------------------------------------ //

  /** The numHashes bit positions of one n-gram: md5("j|gram") folded to
    * 60 bits, mod mBits, for j in [0, numHashes). */
  def bloomPositions(gram: Column, numHashes: Int, mBits: Int): Column =
    array((0 until numHashes).map(j =>
      pmod(md5Long(gram, s"$j|"), lit(mBits.toLong)).cast("int")): _*)

  /** Distinct bit positions set by the bench corpus's shingle sets:
    * (pos). Bounded by mBits rows regardless of bench size. */
  def bloomBits(bench: DataFrame, textCol: String,
                shingleN: Int, numHashes: Int, mBits: Int): DataFrame =
    bench
      .select(explode(shingleSet(tokens(lower(cleanText(col(textCol)))), shingleN)).as("_s"))
      .select(explode(bloomPositions(col("_s"), numHashes, mBits)).as("pos"))
      .distinct()

  /** Collect a bit-position frame into a dense membership array. The
    * collect is bounded by mBits (a filter-size constant the caller
    * chose to fit on the driver — same contract as a codebook), not by
    * any corpus. */
  def bloomArray(bits: DataFrame, mBits: Int): Array[Boolean] = {
    val out = new Array[Boolean](mBits)
    bits.select(col("pos").cast("int")).collect().foreach { r =>
      val p = r.getInt(0)
      require(p >= 0 && p < mBits, s"bloomArray: position $p outside [0,$mBits)")
      out(p) = true
    }
    out
  }

  /** Map-only contamination probe: per corpus doc, how many of its
    * distinct shingles have ALL numHashes positions set in the bench
    * filter; docs with fewer than minHits drop. The filter rides as one
    * array literal (mBits booleans — Bloom-sized, e.g. 2 KiB at 2^14
    * bits; this is the ORACLE-replayable form — at production filter
    * sizes use the `Broadcast[Array[Boolean]]` overload below), so the
    * corpus side is scan → explode → filter → per-doc count: no join
    * against bench data at all. False-positive grams can inflate
    * n_hit — deterministically, both engines compute identical bits. */
  def bloomContamination(corpus: DataFrame, idCol: String, textCol: String,
                         bits: Array[Boolean], shingleN: Int, numHashes: Int,
                         minHits: Long): DataFrame = {
    val bitsLit = typedLit(bits.toSeq)
    val hit = forall(bloomPositions(col("_s"), numHashes, bits.length),
      p => element_at(bitsLit, p + 1))
    contaminationByHit(corpus, idCol, textCol, shingleN, hit, minHits)
  }

  /** Collect a bit-position frame into a WORD-PACKED bitset (64 bits
    * per long) for the broadcast [[bloomContamination]] overload. At
    * the production sizes that overload exists for, packing matters: a
    * JVM boolean[] is one BYTE per bit, so a 2^30-bit filter is 1 GiB
    * as boolean[] but 128 MiB packed — 8x less executor heap and
    * broadcast traffic. mBits must be a multiple of 64 so the word
    * count round-trips the filter size exactly. */
  def bloomBitset(bits: DataFrame, mBits: Int): Array[Long] = {
    require(mBits % 64 == 0, s"bloomBitset: mBits=$mBits must be a multiple of 64")
    val out = new Array[Long](mBits >>> 6)
    bits.select(col("pos").cast("int")).collect().foreach { r =>
      val p = r.getInt(0)
      require(p >= 0 && p < mBits, s"bloomBitset: position $p outside [0,$mBits)")
      out(p >>> 6) |= 1L << (p & 63)
    }
    out
  }

  /** [[bloomContamination]] at PRODUCTION filter sizes: the bit set
    * ships as a `SparkContext.broadcast` of a word-packed long[] (see
    * [[bloomBitset]] — 64 bits/long, 8x smaller than boolean[]) once
    * per executor over the torrent protocol, instead of as a plan
    * literal (re-serialized into every task of every stage) — at 2^30
    * bits that's 128 MiB that must not live in the plan. The probe
    * itself is the codegen'd [[graft.functions.BloomAllSet]]
    * expression, which carries only the broadcast handle and
    * dereferences it once per task; results are bit-identical to the
    * literal form (SketchSpec pins equality at 2^20 bits), so callers
    * switch forms by filter size alone. The filter size is derived
    * from the word count (words*64), so build with the same mBits. */
  def bloomContamination(corpus: DataFrame, idCol: String, textCol: String,
                         bits: Broadcast[Array[Long]], shingleN: Int,
                         numHashes: Int, minHits: Long): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge._
    val mBits = bits.value.length << 6
    val positions = bloomPositions(col("_s"), numHashes, mBits)
    val hit = column(graft.functions.BloomAllSet(expression(positions), bits))
    contaminationByHit(corpus, idCol, textCol, shingleN, hit, minHits)
  }

  /** Shared corpus side of both contamination forms: scan → explode
    * distinct shingles → filter by the (form-specific) hit predicate →
    * per-doc count — map-only up to the final doc-keyed aggregate. */
  private def contaminationByHit(corpus: DataFrame, idCol: String,
                                 textCol: String, shingleN: Int,
                                 hit: Column, minHits: Long): DataFrame =
    corpus
      .select(col(idCol),
        explode(shingleSet(tokens(lower(cleanText(col(textCol)))), shingleN)).as("_s"))
      .filter(hit)
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_hit"))
      .filter(col("n_hit") >= minHits)
}
