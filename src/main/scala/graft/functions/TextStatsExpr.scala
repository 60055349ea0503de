package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** All per-document text-quality counters in ONE fused pass over the raw
  * string, as a codegen'd expression returning a struct:
  *
  *   (clean_len, n_tokens, punct_chars, nonws_chars,
  *    hits_<lang>... per stopword profile, hits_all)
  *
  * The composable forms each re-scan the document with a separate regex
  * (`cleanText` + `split` + two `regexp_replace` + one `StopwordHits`
  * per profile ≈ 10 passes per row for the langId/quality block); this
  * computes the identical integers in two character scans (one over the
  * raw text, one over its lowercase for stopword matching — lowercasing
  * can change char counts, e.g. U+0130, so the counts scan must run on
  * the original). Every downstream ratio (`punctRatio`, `meanTokenLen`,
  * `stopwordRatio`, `qualityScore`, `langId`) is then cheap integer/
  * double arithmetic over one shared struct — subexpression elimination
  * collapses repeated TextStats instances in a projection to a single
  * evaluation.
  *
  * Field semantics are pinned BITWISE-EQUAL to the composable forms
  * (TextStatsSpec asserts it), which is what keeps the DuckDB oracles
  * unchanged:
  *  - clean text = `trim(replace(text, '\n', ' '))` — trim strips
  *    0x20 spaces only (Spark `StringTrim` semantics);
  *  - `clean_len` counts CODE POINTS of the cleaned text (Spark
  *    `length`);
  *  - `n_tokens` = `size(split(clean, "\\s+"))` with Java split
  *    limit=-1 semantics: a leading or trailing non-space whitespace
  *    char (e.g. '\t', which trim does not strip) contributes an empty
  *    token — for non-empty clean text the count is (whitespace runs)+1,
  *    for empty text 0;
  *  - `punct_chars` = chars of the cleaned text outside
  *    `[a-zA-Z0-9\s]` with Java's ASCII `\s` = [ \t\n\x0B\f\r];
  *  - `nonws_chars` = chars outside `\s` (= sum of token lengths);
  *  - `hits_*` = tokens of `lower(text)` exactly equal to a profile
  *    word (`hits_all` = the distinct union of all profiles).
  */
case class TextStats(child: Expression, profiles: Seq[(String, Seq[String])])
    extends UnaryExpression {

  require(profiles.nonEmpty, "empty profile list")

  @transient private lazy val sets: Array[java.util.HashSet[UTF8String]] =
    TextStats.buildSets(profiles)

  override def dataType: DataType = TextStats.structType(profiles.map(_._1))

  override def prettyName: String = "graft_text_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_text_stats requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    TextStats.compute(input.asInstanceOf[UTF8String], sets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("textStats", this, classOf[TextStats].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.evalStats($c);")
  }

  /** Entry point for generated code. */
  def evalStats(input: UTF8String): InternalRow = TextStats.compute(input, sets)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextStats {

  def structType(langs: Seq[String]): StructType = StructType(
    Seq(StructField("clean_len", IntegerType, nullable = false),
      StructField("n_tokens", IntegerType, nullable = false),
      StructField("punct_chars", IntegerType, nullable = false),
      StructField("nonws_chars", IntegerType, nullable = false)) ++
      langs.map(l => StructField(s"hits_$l", IntegerType, nullable = false)) :+
      StructField("hits_all", IntegerType, nullable = false))

  /** One set per profile, plus the distinct union as the last element. */
  def buildSets(profiles: Seq[(String, Seq[String])]): Array[java.util.HashSet[UTF8String]] = {
    val per = profiles.map { case (_, words) => StopwordHits.buildSet(words) }
    val all = StopwordHits.buildSet(profiles.flatMap(_._2).distinct)
    (per :+ all).toArray
  }

  /** Java regex ASCII \s = [ \t\n\x0B\f\r]; '\n' is pre-replaced by ' '
    * before this runs, so 0x0A never actually appears. */
  @inline private def isWs(cp: Int): Boolean =
    cp == 0x20 || (cp >= 0x09 && cp <= 0x0D)

  @inline private def isAlnum(cp: Int): Boolean =
    (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z') || (cp >= '0' && cp <= '9')

  /** Char-index bounds [from, until) of `trim(replace(s,'\n',' '))`
    * within s — leading/trailing 0x20 (incl. replaced '\n') stripped. */
  private def trimBounds(s: String): (Int, Int) = {
    var from = 0
    val n = s.length
    while (from < n && { val c = s.charAt(from); c == ' ' || c == '\n' }) from += 1
    var until = n
    while (until > from && { val c = s.charAt(until - 1); c == ' ' || c == '\n' }) until -= 1
    (from, until)
  }

  /** n_tokens of a trimmed region: Java `split("\\s+", -1)` element
    * count = whitespace runs + 1 (leading AND trailing non-space ws
    * both yield an empty element); empty region → 0. */
  private def countTokens(s: String, from: Int, until: Int): Int = {
    if (from >= until) return 0
    var runs = 0
    var inWs = false
    var i = from
    while (i < until) {
      val cp = s.codePointAt(i)
      val c = if (cp == '\n') ' ' else cp
      if (isWs(c)) { if (!inWs) { runs += 1; inWs = true } }
      else inWs = false
      i += Character.charCount(cp)
    }
    runs + 1
  }

  def compute(raw: UTF8String, sets: Array[java.util.HashSet[UTF8String]]): InternalRow = {
    val s = raw.toString
    val nProfiles = sets.length
    val out = new Array[Any](4 + nProfiles)

    // ---- scan 1: original text — clean_len / n_tokens / punct / nonws
    val (from, until) = trimBounds(s)
    var cleanLen = 0
    var punct = 0
    var nonWs = 0
    var i = from
    while (i < until) {
      val cp0 = s.codePointAt(i)
      val cp = if (cp0 == '\n') ' ' else cp0
      cleanLen += 1
      if (!isWs(cp)) {
        nonWs += 1
        if (!isAlnum(cp)) punct += 1
      }
      i += Character.charCount(cp0)
    }
    out(0) = cleanLen
    out(1) = countTokens(s, from, until)
    out(2) = punct
    out(3) = nonWs

    // ---- scan 2: lowercase text — stopword hits per profile + union.
    // lower() BEFORE cleaning, exactly as tokens(lower(text)): Spark's
    // lower is UTF8String.toLowerCase; whitespace structure is
    // case-invariant so token boundaries agree with scan 1.
    val hits = new Array[Int](nProfiles)
    val ls = raw.toLowerCase.toString
    val (lfrom, luntil) = trimBounds(ls)
    var tokStart = -1
    var j = lfrom
    while (j <= luntil) {
      val atEnd = j == luntil
      val cp0 = if (atEnd) ' ' else ls.codePointAt(j)
      val cp = if (cp0 == '\n') ' ' else cp0
      if (isWs(cp) || atEnd) {
        if (tokStart >= 0) {
          val tok = UTF8String.fromString(ls.substring(tokStart, j))
          var p = 0
          while (p < nProfiles) {
            if (sets(p).contains(tok)) hits(p) += 1
            p += 1
          }
          tokStart = -1
        }
      } else if (tokStart < 0) tokStart = j
      j += (if (atEnd) 1 else Character.charCount(cp0))
    }
    var p = 0
    while (p < nProfiles) { out(4 + p) = hits(p); p += 1 }

    new GenericInternalRow(out)
  }
}
