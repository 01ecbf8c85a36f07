package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** ConText-style rule tagging (reference `notes_preproc.py:163-224`):
  * cue-window semantics, leftmost-cue extraction, severity ladder.
  */
class NotesNlpSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cues = Seq("no", "denies", "without")
  private val targets = Seq("infection", "fever")

  private def flags(texts: (Long, String)*): Map[Long, Int] =
    texts.toList.toDF("id", "t")
      .select($"id", NotesNlp.cueFlag($"t", cues, targets, 2).as("f"))
      .as[(Long, Int)].collect().toMap

  test("cueFlag: cue within the token window marks the target") {
    val got = flags(
      1L -> "patient denies fever today",             // adjacent → 1
      2L -> "no evidence of infection",               // 2 intervening → 1
      3L -> "no sign at all of infection",            // 4 intervening → 0
      4L -> "fever without chills",                   // cue AFTER target → 0
      5L -> "high fever since morning",               // no cue → 0
      6L -> "denies pain but reports fever")          // 3 intervening → 0
    assert(got === Map(1L -> 1, 2L -> 1, 3L -> 0, 4L -> 0, 5L -> 0, 6L -> 0))
  }

  test("cueFlag matches only whole words") {
    val got = flags(
      1L -> "nothing suggests infection",  // "no" inside "nothing" → 0
      2L -> "no reinfection risk")         // "infection" inside "reinfection" → 0
    assert(got === Map(1L -> 0, 2L -> 0))
  }

  test("nearestCue extracts the leftmost applicable cue; empty when none") {
    val got = Seq(
      (1L, "denies fever and no infection"),
      (2L, "afebrile and comfortable"))
      .toDF("id", "t")
      .select($"id", NotesNlp.nearestCue($"t", cues, targets, 2).as("c"))
      .as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "denies", 2L -> ""))
  }

  test("severityScore ladder maps cue terms, defaults otherwise") {
    val got = Seq("severe", "mild", "unknown", "")
      .map(Tuple1(_)).toDF("c")
      .select(NotesNlp.severityScore($"c", Seq("severe" -> 3, "mild" -> 1)).as("s"))
      .as[Int].collect().toSeq
    assert(got === Seq(3, 1, 0, 0))
  }

  test("splitSections: one row per delimiter-separated section, position kept") {
    val got = NotesNlp.splitSections(
        Seq((7L, "s0 HEADER s1 HEADER s2")).toDF("doc_id", "text"),
        "doc_id", "text", " HEADER ")
      .as[(Long, Int, String)].collect().toSet
    assert(got === Set((7L, 0, "s0"), (7L, 1, "s1"), (7L, 2, "s2")))
  }

  test("postCueFlag and scopedFlag: backward window semantics") {
    val full = Seq(
      (1L, "fever the patient denies"),    // post: target + 2 gap + cue → 1
      (2L, "denies fever"),                // pre-position only
      (3L, "fever persisting for days"))   // no cue anywhere
      .toDF("id", "t")
      .select($"id",
        NotesNlp.postCueFlag($"t", cues, targets, 2).as("post"),
        NotesNlp.scopedFlag($"t", cues, targets, 2).as("scoped"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(full === Map(1L -> ((1, 1)), 2L -> ((0, 1)), 3L -> ((0, 0))))
  }

  test("lemmatize: irregular forms hit the dictionary, regular forms fall back") {
    val toks = Seq("went", "children", "diagnoses", "lying", "was",
      "running", "tested", "fevers", "emboli", "vertebrae")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val got = NotesNlp.lemmatize(toks.toDF("id", "tok"), "tok", "lemma")
      .as[(Long, String, String)].collect()
      .map { case (_, t, l) => t -> l }.toMap
    // dictionary wins where the suffix rule is wrong…
    assert(got("went") === "go")
    assert(got("children") === "child")
    assert(got("diagnoses") === "diagnosis")
    assert(got("lying") === "lie")
    assert(got("was") === "be")
    assert(got("emboli") === "embolus")
    assert(got("vertebrae") === "vertebra")
    // …and regular inflection still routes through lightStem
    assert(got("running") === "runn")
    assert(got("tested") === "test")
    assert(got("fevers") === "fever")
  }

  test("lemmatize keeps row count and leaves unknown tokens stem-stripped only") {
    val df = Seq((1L, "xyzzy"), (2L, "held")).toDF("id", "tok")
    val out = NotesNlp.lemmatize(df, "tok", "lemma").collect()
    assert(out.length === 2)
    assert(out.map(r => r.getString(1) -> r.getString(2)).toMap ===
      Map("xyzzy" -> "xyzzy", "held" -> "hold"))
  }
}
