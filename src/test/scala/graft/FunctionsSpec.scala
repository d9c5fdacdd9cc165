package graft

import graft.functions.{SimilarityFunctions => SF, TextFunctions => TF, UrlFunctions}
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("TextFunctions.wordHits counts standalone tokens only") {
    val df = Seq("the theme of the day", "nothing here", "the the the")
      .toDF("text")
      .select(TF.wordHits(col("text"), "the").as("h"))
    // "the the the": non-overlapping " the " scan finds 2 (middle space shared)
    assert(df.as[Long].collect().toSeq == Seq(2L, 0L, 2L))
  }

  test("TextFunctions.tokenCount splits on whitespace runs") {
    val df = Seq("a  b\tc", " x ", "").toDF("text")
      .select(TF.tokenCount(col("text")).as("n"))
    assert(df.as[Long].collect().toSeq == Seq(3L, 1L, 1L))
  }

  test("TextFunctions.fingerprint is whitespace/case insensitive") {
    val df = Seq("Hello   World", "hello world").toDF("text")
      .select(TF.fingerprint(col("text")).as("fp"))
    val fps = df.as[String].collect()
    assert(fps(0) == fps(1))
  }

  test("TextFunctions.argMaxLang breaks ties toward first-listed") {
    val df = Seq((1L, 1L), (0L, 2L)).toDF("en", "es")
      .select(TF.argMaxLang(Seq("en" -> col("en"), "es" -> col("es"))).as("l"))
    assert(df.as[String].collect().toSeq == Seq("en", "es"))
  }

  test("SimilarityFunctions.cosine on known vectors") {
    val df = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(1.0f, 1.0f), Array(1.0f, 1.0f)))
      .toDF("a", "b").select(SF.cosine(col("a"), col("b")).as("c"))
    val got = df.as[Double].collect()
    assert(math.abs(got(0)) < 1e-12)
    assert(math.abs(got(1) - 1.0) < 1e-12)
  }

  test("SimilarityFunctions.tokenShingles builds n-grams") {
    val df = Seq("a b c d").toDF("text")
      .select(SF.tokenShingles(col("text"), 2).as("s"))
    assert(df.as[Seq[String]].head() == Seq("a b", "b c", "c d"))
  }

  test("SimilarityFunctions.minHashSignature equal sets -> equal signatures") {
    val df = Seq("x y z x", "z y x").toDF("text")
      .select(SF.minHashSignature(SF.tokenShingles(col("text"), 1), 8).as("sig"))
    val sigs = df.as[Seq[Long]].collect()
    assert(sigs(0) == sigs(1)) // same token set, order-independent
    assert(sigs(0).length == 8)
  }

  test("SimilarityFunctions.jaccard exact set similarity") {
    val df = Seq((Seq("a", "b"), Seq("b", "c"))).toDF("a", "b")
      .select(SF.jaccard(col("a"), col("b")).as("j"))
    assert(math.abs(df.as[Double].head() - 1.0 / 3.0) < 1e-12)
  }

  test("SimilarityFunctions.simHash identical text -> hamming 0, disjoint text differs") {
    val df = Seq(("same words here", "same words here"),
      ("same words here", "totally different tokens"))
      .toDF("a", "b")
      .select(SF.hammingDistance(SF.simHash(col("a")), SF.simHash(col("b"))).as("h"))
    val got = df.as[Int].collect()
    assert(got(0) == 0)
    assert(got(1) > 0)
  }

  test("UrlFunctions.normalizeUrl: reference semantics (url_utils.py)") {
    assert(UrlFunctions.normalizeUrlImpl(
      "HTTPS://WWW.Example.com//a//b?utm_source=x&b=2&a=1#frag") ==
      "https://example.com/a/b?a=1&b=2")
    assert(UrlFunctions.normalizeUrlImpl("  ") == "")
    assert(UrlFunctions.normalizeUrlImpl(null) == "")
    // tracking params incl. prefixes utm_* / gaa_* dropped
    assert(UrlFunctions.normalizeUrlImpl(
      "http://site.com/p?gclid=1&utm_whatever=2&gaa_x=3&keep=4") ==
      "http://site.com/p?keep=4")
  }

  test("UrlFunctions.urlHash is sha256 hex of normalized form") {
    val h = UrlFunctions.urlHashImpl("https://www.example.com/x")
    assert(h.length == 64)
    assert(h == UrlFunctions.urlHashImpl("https://example.com/x"))
    assert(UrlFunctions.urlHashImpl("") == "")
  }

  test("UrlFunctions.hostname strips www. everywhere (reference quirk)") {
    assert(UrlFunctions.hostnameImpl("https://www.example.com/x") == "example.com")
    assert(UrlFunctions.hostnameImpl("not a url") == "")
  }

  test("TextFunctions.rollingTokenHash is order-sensitive") {
    val df = Seq("a b c", "c b a").toDF("text")
      .select(TF.rollingTokenHash(col("text")).as("h"))
    val hs = df.as[Long].collect()
    assert(hs(0) != hs(1))
  }

  test("PortableHash.md5Hash60 matches DuckDB hex-substring parse") {
    import graft.functions.PortableHash
    // goldens computed with DuckDB v1.0.0:
    //   select ('0x' || substring(md5(s), 2, 15))::BIGINT
    val goldens = Seq(
      "abc" -> 370089762377648L,
      "hello world" -> 1060100440397377232L,
      "" -> 296548016511300100L,
      "a b c d" -> 89888562366379890L,
      "the quick brown fox" -> 68619688644668907L)
    val got = goldens.map(_._1).toDF("s")
      .select(PortableHash.md5Hash60(col("s")).as("h")).as[Long].collect()
    assert(got.toSeq == goldens.map(_._2))
  }

  test("bounded top-k aggregator == sort_array(collect_list)[1:k], O(k) buffers") {
    import graft.functions.BoundedTopKStrings
    val rnd = new scala.util.Random(21)
    // hot group 0 (2000 values), sparse groups, a group with zero matches
    val rows = (1 to 2000).map(i => (0L, s"v${rnd.nextInt(500)}%03d", true)) ++
      (1 to 50).map(i => (1L + rnd.nextInt(5), s"w${rnd.nextInt(30)}", rnd.nextBoolean())) ++
      Seq((9L, "zzz", false))
    val df = rows.toDF("g", "v", "p")
    val bounded = df.groupBy("g")
      .agg(graft.operators.Rollups.topKStringsAgg(col("v"), col("p"), 3).as("t"))
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    val composed = df.groupBy("g")
      .agg(array_join(
        slice(sort_array(collect_list(when(col("p"), col("v")))), 1, 3), " | ").as("t"))
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(bounded == composed)
    // direct buffer-bound check: reduce/merge never exceed k entries
    val agg = BoundedTopKStrings(3)
    val b = ('m' to 'z').map(_.toString).foldLeft(agg.zero)(agg.reduce _)
    assert(b.size == 3 && b == Seq("m", "n", "o"))
    assert(agg.merge(b, Seq("a", "b", "c")) == Seq("a", "b", "c"))
  }

  test("PortableHash.affine31 stays in [0, p) and matches the SQL fragment") {
    import graft.functions.PortableHash
    val hs = Seq(0L, 1L, PortableHash.Mod60 - 1, 987654321098765L)
    val got = hs.toDF("h")
      .select(PortableHash.affine31(3, col("h")).as("m")).as[Long].collect()
    got.foreach(m => assert(m >= 0 && m < PortableHash.P31))
    // mirror of affine31Sql evaluated in Scala
    val (a, b) = PortableHash.affineCoeffs(3)
    val exp = hs.map(h => (a * (h & 0x7FFFFFFFL) + b) % PortableHash.P31)
    assert(got.toSeq == exp)
  }

  test("BoundedTopKPairs == the row_number window top-k, rows and ranks") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // deterministic scores with deliberate ties across many groups
    val rows = for (g <- 1L to 40L; i <- 1L to 60L) yield
      (g, i, ((g * 31 + i * 17) % 13).toDouble / 13.0)
    val df = rows.toDF("g", "id", "score")
    val tk = udaf(graft.functions.BoundedTopKPairs(5),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[graft.functions.ScoredId]())
    val viaAgg = df.groupBy("g").agg(tk(col("score"), col("id")).as("t"))
      .select(col("g"), posexplode(col("t")).as(Seq("pos", "s")))
      .select(col("g"), col("s.id").as("id"), (col("pos") + 1).as("rank"))
      .as[(Long, Long, Int)].collect().toSet
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id").asc)
    val viaWindow = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5).select("g", "id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(viaAgg == viaWindow && viaWindow.size == 200)
  }
}
