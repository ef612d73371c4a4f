package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.{TextFunctions => T}

/** Repetition signals (Gopher-style top/dup n-gram fractions) and the PII
  * scrub pass: hand-computed fixtures, degenerate inputs, a randomized
  * brute-force twin, and the count-vs-scrub consistency contract.
  */
class TextSignalsSpec extends SparkSpec {
  import spark.implicits._

  private def rep(text: String, n: Int): (Option[Double], Option[Double]) = {
    val r = Seq(Option(text)).toDF("t")
      .select(T.ngramRepetition(col("t"), n).as("r"))
      .select(col("r.top_fraction"), col("r.dup_fraction")).head()
    (if (r.isNullAt(0)) None else Some(r.getDouble(0)),
      if (r.isNullAt(1)) None else Some(r.getDouble(1)))
  }

  test("ngramRepetition hand-computed: 'a b a b c' bigrams") {
    // grams: [a b, b a, a b, b c] → total 4, top count 2, dup mass 2
    assert(rep("a b a b c", 2) == (Some(0.5), Some(0.5)))
  }

  test("ngramRepetition all-identical tokens → both fractions 1.0") {
    assert(rep("x x x x x", 2) == (Some(1.0), Some(1.0)))
  }

  test("ngramRepetition degenerate inputs → null") {
    assert(rep("hello", 2) == (None, None)) // shorter than n
    assert(rep("", 2) == (None, None)) // empty text
    assert(rep(null, 2) == (None, None)) // null text
    assert(rep("a b c d", 5) == (None, None)) // n > token count
  }

  test("ngramRepetition ≡ brute-force model on random docs") {
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c", "ab", "xy")
    val docs = (0 until 60).map { _ =>
      Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    for (n <- Seq(1, 2, 3)) {
      val got = docs.toDF("t")
        .select(T.ngramRepetition(col("t"), n).as("r"))
        .select(col("r.top_fraction"), col("r.dup_fraction")).collect()
      docs.zip(got).foreach { case (d, row) =>
        val toks = d.split(" ").filter(_.nonEmpty)
        val grams = toks.sliding(n).filter(_.length == n)
          .map(_.mkString(" ")).toSeq
        if (grams.isEmpty) {
          assert(row.isNullAt(0) && row.isNullAt(1), s"doc='$d' n=$n")
        } else {
          val counts = grams.groupBy(identity).map(_._2.size)
          val top = counts.max.toDouble / grams.size
          val dup = counts.filter(_ > 1).sum.toDouble / grams.size
          assert(row.getDouble(0) == top, s"top doc='$d' n=$n")
          assert(row.getDouble(1) == dup, s"dup doc='$d' n=$n")
        }
      }
    }
  }

  test("piiScrub: specific patterns redact before digitRun; counts match") {
    // the ADVICE regression: an email with digits must be scrubbed as ONE
    // email hit, not have digitRun shred it into unredacted fragments
    val text =
      "john123@example.com call 555-867-5309 ssn 123-45-6789 id 9999"
    val (scrubbed, counts) = T.piiScrub(lit(text), T.piiPatterns)
    val r = Seq(1).toDF("x").select(scrubbed.as("s"), counts.as("c")).head()
    assert(r.getString(0) == "<PII> call <PII> ssn <PII> id <PII>")
    val m = r.getMap[String, Int](1)
    assert(m("email") == 1 && m("phone") == 1 && m("ssn") == 1)
    // digitRun audits the ORIGINAL text: 123|555|867|5309|123|45|6789|9999
    assert(m("digitRun") == 8)
  }

  test("piiScrub: every counted specific hit is actually redacted") {
    // overlapping-pattern consistency: scrub output must contain no
    // substring still matching a counted pattern
    val texts = Seq(
      "a1b2@x.io and 999-123-4567",
      "plain text no pii",
      "123-45-6789 123-45-6789",
      "x 12-34 567.890.1234 y")
    val (scrubbed, _) = T.piiScrub(col("t"), T.piiPatterns)
    texts.toDF("t").select(scrubbed.as("s")).collect().foreach { row =>
      val out = row.getString(0)
      T.piiPatterns.values.foreach { p =>
        assert(!p.r.findFirstIn(out.replace("<PII>", "#")).isDefined,
          s"unredacted match of '$p' in '$out'")
      }
    }
  }
}
