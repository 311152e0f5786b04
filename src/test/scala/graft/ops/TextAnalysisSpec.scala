package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokens, shingles and counts") {
    val df = Seq("The quick  brown fox").toDF("text")
    assert(df.select(TextAnalysis.tokenCount(col("text"))).head().getLong(0)
      == 4L)
    val sh = df.select(TextAnalysis.shingles(col("text"), 3))
      .head().getSeq[String](0)
    assert(sh.toSet == Set("the quick brown", "quick brown fox"))
  }

  test("shingles on texts shorter than n degrade to one whole-text shingle") {
    val df = Seq("hello world").toDF("text")
    val sh = df.select(TextAnalysis.shingles(col("text"), 3))
      .head().getSeq[String](0)
    assert(sh.toSeq == Seq("hello world"))
  }

  test("fingerprint is whitespace/case-canonical") {
    val df = Seq(("a  B\tc", "a b c"), ("x", "y")).toDF("t1", "t2")
    val eq = df.select(
      (TextAnalysis.fingerprint(col("t1")) ===
        TextAnalysis.fingerprint(col("t2"))).as("e")).collect()
    assert(eq.map(_.getBoolean(0)).toSeq == Seq(true, false))
  }

  test("langId picks the profile with most stopword hits") {
    val df = Seq(
      "the cat and the dog of the house",
      "der hund und die katze ist nicht da",
      "el perro y la casa es de los gatos"
    ).toDF("text")
    val (_, predicted) = TextAnalysis.langId(col("text"))
    val got = df.select(predicted).collect().map(_.getString(0))
    assert(got.toSeq == Seq("en", "de", "es"))
  }

  test("quality metrics on a crafted string") {
    val df = Seq((1L, "ab cd, ef 12!")).toDF("doc_id", "text")
    val m = TextAnalysis.qualityMetrics(df).head()
    assert(m.getAs[Long]("n_chars_c") == 13L)
    assert(m.getAs[Long]("n_tokens") == 4L)
    assert(m.getAs[Double]("punct_ratio") == math.rint(2.0 / 13 * 1e4) / 1e4)
    assert(m.getAs[Double]("digit_ratio") == math.rint(2.0 / 13 * 1e4) / 1e4)
  }

  test("scrubPii masks emails and phone-like runs, leaves prose alone") {
    val cases = Seq(
      ("mail me at jo.doe+spam@corp.example.co now",
        "mail me at <EMAIL> now"),
      ("call +1-202-555-0134 or 0049-30-1234567 today",
        "call <PHONE> or <PHONE> today"),
      ("short digits 12345 stay; year 2026 stays",
        "short digits 12345 stay; year 2026 stays"),
      ("a@b.io and 555-123-4567", "<EMAIL> and <PHONE>"))
    val out = cases.map(_._1).toDF("text")
      .select(TextAnalysis.scrubPii(col("text")))
      .as[String].collect().toSeq
    assert(out == cases.map(_._2))
  }

  test("hashingFeatures: counts conserve tokens, buckets bounded, " +
      "same token -> same bucket") {
    val docs = Seq((1L, "spark spark table row"), (2L, "spark table"))
      .toDF("doc_id", "text")
    val feats = TextAnalysis.hashingFeatures(docs, 64).collect()
    assert(feats.forall { r =>
      val b = r.getLong(1); b >= 0 && b < 64
    })
    // per-doc feature counts sum to the doc's token count
    val sums = feats.groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(sums == Map(1L -> 4L, 2L -> 2L))
    // "spark" lands in one bucket: doc 1 has a count-2 bucket shared
    // with doc 2's "spark" bucket
    val d1 = feats.filter(r => r.getLong(0) == 1L && r.getLong(2) == 2L)
    assert(d1.length == 1)
    val sparkBucket = d1.head.getLong(1)
    assert(feats.exists(r => r.getLong(0) == 2L &&
      r.getLong(1) == sparkBucket))
  }

  test("linearScore: exact hand case, missing buckets weigh zero") {
    val docs = Seq(
      (1L, "aa bb aa"),   // 3 tokens
      (2L, "cc"),         // 1 token, bucket without a weight row
      (3L, "aa")          // 1 token
    ).toDF("doc_id", "text")
    // Recover each token's bucket with the SAME expression the op uses,
    // then hand-build a weight table hitting aa and bb only.
    val b = docs.select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .distinct()
      .select(col("tok"),
        (conv(substring(md5(col("tok")), 1, 15), 16, 10)
          .cast("long") % 64).as("bucket"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val weights = Seq((b("aa"), 500L), (b("bb"), -250L))
      .toDF("bucket", "w_int")
    val out = TextAnalysis.linearScore(docs, weights, 64)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 1: (500 + -250 + 500) / 3 tokens = 250 milli -> 2500 e4
    assert(out(1L) == ((3L, 2500L)))
    // doc 2: no weight row -> 0
    assert(out(2L) == ((1L, 0L)))
    // doc 3: 500 milli -> 5000 e4
    assert(out(3L) == ((1L, 5000L)))
  }
}
