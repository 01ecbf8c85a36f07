package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rule-based clinical-notes tagging (SURVEY.md §2.9; reference
  * `notes_preproc.py:108-224`): section splitting plus ConText-style
  * modifier detection — a cue term within a bounded token window before a
  * target term marks the target as negated / historical / severity-scored
  * (the public ConText/NegEx algorithm family, rules-only, no model).
  *
  * Everything is a Catalyst expression tree (`regexp` + `when` ladders):
  * no UDF, fully codegen-compatible, and each rule set compiles to ONE
  * regex evaluated per section — at corpus scale the tagger is a map-only
  * stage that pipelines with the scan.
  */
object NotesNlp {

  /** One row per (doc, section): the reference's section splitter
    * (`notes_preproc.py:142-163`), delimiter-configurable.
    */
  def splitSections(docs: DataFrame, id: String, text: String, delim: String): DataFrame =
    docs.select(col(id), posexplode(split(col(text), delim)))
      .select(col(id), col("pos").as("sec_no"), col("col").as("section"))

  /** Regex matching `cue (word){0,gap} target` at word boundaries — the
    * ConText forward window. Alternations are plain literals; both Java
    * regex (Spark) and RE2 (common SQL oracles) evaluate it identically.
    */
  def cueWindowRegex(cues: Seq[String], targets: Seq[String], gap: Int): String =
    s"(^|\\s)(${cues.mkString("|")})(\\s+\\w+){0,$gap}\\s+(${targets.mkString("|")})(\\s|$$)"

  /** 1 iff any target in `text` has a cue within `gap` tokens before it. */
  def cueFlag(text: Column, cues: Seq[String], targets: Seq[String], gap: Int): Column =
    when(text.rlike(cueWindowRegex(cues, targets, gap)), 1).otherwise(0)

  /** The first (leftmost) cue that modifies a target in `text`; empty
    * string when nothing matches — the ConText "which modifier applies"
    * step, capture group 2 of the window regex.
    */
  def nearestCue(text: Column, cues: Seq[String], targets: Seq[String], gap: Int): Column =
    regexp_extract(text, cueWindowRegex(cues, targets, gap), 2)

  /** Regex matching `target (word){0,gap} cue` — the ConText BACKWARD
    * window for post-position cues ("infection was denied").
    */
  def targetWindowRegex(targets: Seq[String], cues: Seq[String], gap: Int): String =
    s"(^|\\s)(${targets.mkString("|")})(\\s+\\w+){0,$gap}\\s+(${cues.mkString("|")})(\\s|$$)"

  /** 1 iff any target is followed by a cue within `gap` tokens. */
  def postCueFlag(text: Column, cues: Seq[String], targets: Seq[String], gap: Int): Column =
    when(text.rlike(targetWindowRegex(targets, cues, gap)), 1).otherwise(0)

  /** Full ConText scope: cue before OR after the target within the window. */
  def scopedFlag(text: Column, cues: Seq[String], targets: Seq[String], gap: Int): Column =
    when(text.rlike(cueWindowRegex(cues, targets, gap)) ||
      text.rlike(targetWindowRegex(targets, cues, gap)), 1).otherwise(0)

  /** Map a cue term to a severity score with a `when` ladder; unmatched
    * cues (or no cue) score `default`. Reference severity tagging,
    * `notes_preproc.py:203-224`.
    */
  def severityScore(cue: Column, scores: Seq[(String, Int)], default: Int = 0): Column =
    scores.foldRight(lit(default): Column) { case ((term, s), acc) =>
      when(cue === term, s).otherwise(acc)
    }

  /** Light rule-based stemmer: strip one common inflectional suffix,
    * keeping a ≥3-char stem — the relational stand-in for the reference's
    * lemmatization pass (`notes_preproc.py:108-140`, which uses a model
    * lemmatizer; rule-based stemming is the classic public approximation).
    * One anchored regex, identical semantics under Java regex and RE2.
    */
  def lightStem(token: Column): Column =
    regexp_replace(token, "(\\w{3,}?)(ing|edly|ied|ies|ier|ed|er|es|s)$", "$1")
}
