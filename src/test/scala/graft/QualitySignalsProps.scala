package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
import graft.functions.{GraftFunctions, QualitySignalsExpr}
import graft.operators.TextAnalysis

/** `QualitySignalsExpr` replaced three separate passes in qualityScore —
  * `size(tokens(t))`, `size(array_distinct(tokens(t)))`, and the
  * interpreted `size(filter(tokens(lower(t)), stopword))` — with one
  * native pass over the raw `split`. TextAnalysisSpec and the
  * quality_score oracle lock the composite outputs on fixture data; this
  * property locks the kernel against the replaced HOF formulation for
  * ARBITRARY texts: unicode (incl. astral-plane), whitespace runs, tabs
  * and newlines (the `\s+` split boundary cases), empty and
  * whitespace-only strings, uppercase stopwords (the lower() commute
  * argument), and null texts.
  */
object QualitySignalsProps extends Properties("QualitySignals") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withWorkers(1)

  private lazy val spark = SparkSpec.session

  private val word: Gen[String] = Gen.oneOf(
    Gen.oneOf(TextAnalysis.stopwords),                  // exact stopwords
    Gen.oneOf(TextAnalysis.stopwords).map(_.toUpperCase), // lower() must find these
    Gen.oneOf("The", "THIS", "iT", "As"),               // mixed-case stopwords
    Gen.stringOfN(3, Gen.alphaNumChar),
    Gen.oneOf("中文", "été", "ß", "🙂🙂", "a.b,c!", "x_1"))

  private val sep: Gen[String] =
    Gen.oneOf(" ", "  ", "\t", "\n", " \t ", "\r\n")

  private val text: Gen[Option[String]] = Gen.frequency(
    8 -> (for {
      n     <- Gen.choose(0, 25)
      words <- Gen.listOfN(n, word)
      seps  <- Gen.listOfN(math.max(n - 1, 0), sep)
      lead  <- Gen.oneOf("", " ", "\t")
      trail <- Gen.oneOf("", " ", "\n")
    } yield Some(lead + words.zipAll(seps, "", "").map { case (w, s) => w + s }.mkString + trail)),
    1 -> Gen.oneOf(Some(""), Some("   "), Some("\t\n")),
    1 -> Gen.const(None))

  property("kernel signals == the replaced HOF formulation on arbitrary texts") =
    forAllNoShrink(Gen.listOfN(30, text)) { texts =>
      val s = spark
      import s.implicits._
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t.orNull) }
        .toDF("id", "text")
      val t = col("text")
      val toks = GraftFunctions.tokens(t)
      val stopArr = array(TextAnalysis.stopwords.map(lit): _*)
      val sig = toCol(QualitySignalsExpr(toExpr(split(t, "\\s+")), TextAnalysis.stopwords))
      val rows = df.select(
        sig.as("k"),
        size(toks).cast("long").as("h_tokens"),
        size(array_distinct(toks)).cast("long").as("h_distinct"),
        size(filter(GraftFunctions.tokens(lower(t)), tk => array_contains(stopArr, tk)))
          .cast("long").as("h_stops"),
        t.isNull.as("was_null")).collect()
      rows.forall { r =>
        if (r.getBoolean(4)) r.isNullAt(0) // null text -> null struct (and null HOF sizes)
        else {
          val k = r.getStruct(0)
          k.getLong(0) == r.getLong(1) &&
            k.getLong(1) == r.getLong(2) &&
            k.getLong(2) == r.getLong(3)
        }
      }
    }
}
