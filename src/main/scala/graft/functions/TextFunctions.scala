package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives shared by ingest, dedup, and analysis operators.
  *
  * Hash derivations are built on `md5` hex strings rather than engine-native
  * hash functions: md5 produces identical lowercase hex in every engine
  * (Spark, DuckDB, Postgres, ...), which keeps these operators
  * oracle-checkable and portable, while still being codegen'd expressions.
  */
object TextFunctions {

  /** replace("\n"," ").strip() — reference `basic_cleaning` app/main.py:379-380. */
  def cleanText(text: Column): Column = trim(regexp_replace(text, "\n", " "))

  /** Whitespace tokenization; empty/blank text yields an empty array
    * (Spark's split("") returns [""], which we drop — matches the
    * reference's zero-chunks-for-empty-doc behavior app/embedding_gen.py:390-394). */
  def tokens(text: Column): Column = {
    val t = cleanText(text)
    when(length(t) === 0, array().cast("array<string>")).otherwise(split(t, "\\s+"))
  }

  /** Lowercased tokens stripped to [a-z0-9], empties dropped — the
    * punctuation-robust token stream for lexical matching (a trailing
    * '?' must not make "ghrelin?" a different term than "ghrelin").
    * Shared by TF-IDF embedding and BM25. */
  def alnumTokens(text: Column): Column =
    filter(transform(tokens(lower(text)), t => regexp_replace(t, "[^a-z0-9]", "")),
      t => length(t) > 0)

  /** Value of a single lowercase-hex character as an int (0-15). The
    * DuckDB oracle mirrors this with strpos('0123456789abcdef', c) - 1. */
  def hexCharVal(c: Column): Column = conv(c, 16, 10).cast("int")

  /** First two hex digits of md5(s) as an int in [0, 256). */
  def md5Byte(s: Column): Column = conv(substring(md5(s), 1, 2), 16, 10).cast("int")

  /** Hash bucket in [0, nBuckets) from md5 — portable across engines.
    * One md5 byte (256 values) — enough for the oracle-pinned dim-64
    * embedder; use [[md5Bucket16]] for larger spaces. */
  def md5Bucket(s: Column, nBuckets: Int): Column = pmod(md5Byte(s), lit(nBuckets))

  /** 16-bit md5 bucket (first 4 hex chars) for dims up to 65536. */
  def md5Bucket16(s: Column, nBuckets: Int): Column = {
    require(nBuckets <= 65536, "md5Bucket16 supports up to 65536 buckets")
    pmod(conv(substring(md5(s), 1, 4), 16, 10).cast("int"), lit(nBuckets))
  }

  /** Sign (+1/-1) derived from md5 — the hashing-trick sign bit. */
  def md5Sign(s: Column): Column =
    when(pmod(hexCharVal(substring(md5(s), 3, 1)), lit(2)) === 0, lit(1.0)).otherwise(lit(-1.0))

  /** Word n-gram shingles: ["a b c", "b c d", ...] over the token array.
    * Shorter-than-n documents shingle to the whole document. Backed by
    * the codegen'd [[WordShingles]] fused loop (bitwise identical to the
    * transform/slice/array_join composable form, ~4× faster). */
  /** Diacritic strip (codegen'd [[StripAccents]]; DuckDB-parity). */
  def stripAccents(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    column(StripAccents(expression(text)))
  }

  /** Full normalization pass for curation pipelines: strip accents →
    * lowercase → collapse whitespace runs → trim. One map-only
    * projection; every stage is codegen'd. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(lower(stripAccents(text)), "\\s+", " "))

  def shingles(toks: Column, n: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    column(WordShingles(expression(toks), n, distinct = false))
  }

  /** Distinct shingle set (for Jaccard / MinHash). */
  def shingleSet(toks: Column, n: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    column(WordShingles(expression(toks), n, distinct = true))
  }
}
