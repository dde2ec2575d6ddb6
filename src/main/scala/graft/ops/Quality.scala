package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE engine-wide document quality score, defined once.
  *
  * `score = min(n_words, 100)/100 · 0.5 + n_stop/n_words · 0.5` — a
  * length component saturating at 100 words plus a stopword-ratio
  * component, the standard cheap heuristic pair. q38 (standalone score),
  * q60 (curation funnel), q78 (threshold sweep) and q81 (canonical
  * keeper) all reference THIS definition and its oracle mirror, so the
  * funnel/keeper/sweep can never drift from the standalone score.
  *
  * Both sides evaluate the identical IEEE double expression sequence;
  * callers on the oracle-rounding grid wrap the result in
  * `round(..., 4)` themselves (q60 consumes it unrounded).
  */
object Quality {

  /** Stopword alternation shared by every quality-scoring query. */
  val StopwordRegex = "\\b(the|and|of|to|in|is|a)\\b"

  def nWords(text: Column): Column = size(split(text, " +"))

  def nStop(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(StopwordRegex), lit(0)))

  /** Score from pre-computed word/stopword counts (callers that also
    * output the counts reuse their columns instead of re-running the
    * regex). */
  def scoreFrom(nWords: Column, nStop: Column): Column =
    least(nWords * lit(1.0), lit(100.0)) / 100.0 * 0.5 +
      nStop * lit(1.0) / nWords * 0.5

  def score(text: Column): Column = scoreFrom(nWords(text), nStop(text))

  // ---- DuckDB oracle mirrors ----

  def duckNWords(text: String): String =
    s"len(string_split_regex($text, ' +'))"

  // NB the s-interpolator processes escapes even in triple quotes, so
  // \\b here emits a single backslash-b (the regex word boundary) — a
  // bare \b would emit a literal backspace character into the SQL
  def duckNStop(text: String): String =
    s"""len(regexp_extract_all(lower($text), '\\b(the|and|of|to|in|is|a)\\b'))"""

  def duckScoreFrom(nWords: String, nStop: String): String =
    s"least($nWords * 1.0, 100.0) / 100.0 * 0.5 + $nStop * 1.0 / $nWords * 0.5"

  def duckScore(text: String): String =
    duckScoreFrom(duckNWords(text), duckNStop(text))
}
