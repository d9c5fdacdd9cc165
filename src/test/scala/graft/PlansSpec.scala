package graft

import graft.functions.{SimilarityFunctions => SF}
import graft.plans.GraftExtensions
import org.apache.spark.sql.functions._

class PlansSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = (1L to 200L).map { i =>
    (i, Array.tabulate(16)(j => math.sin(i * 31 + j).toFloat))
  }.toDF("vec_id", "embedding")

  test("multi-session: columns built under one session resolve in a newSession") {
    import org.apache.spark.sql.SparkSession
    // the PortableHash caveat scenario: the Column is BUILT while the
    // parent session is active (temp-function path registers against it),
    // then analyzed under an isolated child session — resolution must come
    // from the child's own registry, populated by the config-based
    // GraftExtensions installation the profiles default to
    val child = spark.newSession()
    assert(child ne spark)
    SparkSession.setActiveSession(spark)
    val hashCol = graft.functions.PortableHash.md5Hash60(col("s"))
    val cosCol = GraftExtensions.cosine(spark, col("a"), col("b"))
    try {
      val hashed = child.createDataFrame(Seq(Tuple1("abc"))).toDF("s")
        .select(hashCol.as("h")).collect().head.getLong(0)
      // DuckDB-equivalent md5 prefix value for "abc"
      assert(hashed == java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest("abc".getBytes("UTF-8")).map("%02x".format(_)).mkString
          .substring(1, 16), 16))
      val cos = child.createDataFrame(
        Seq((Array(1.0f, 0.0f), Array(1.0f, 0.0f)))).toDF("a", "b")
        .select(cosCol.as("c")).collect().head.getDouble(0)
      assert(math.abs(cos - 1.0) < 1e-12)
    } finally SparkSession.setActiveSession(spark)
  }

  test("native graft_cosine matches the HOF formulation within float tolerance") {
    // not bit-identical by design: zip_with multiplies in FLOAT, the native
    // expression promotes to double per element (strictly more precise)
    val paired = vecs.select(col("vec_id"), col("embedding").as("a"))
      .crossJoin(vecs.select(col("embedding").as("b")).limit(5))
    val both = paired.select(
      GraftExtensions.cosine(spark, col("a"), col("b")).as("native"),
      SF.cosine(col("a"), col("b")).as("hof"))
    val maxDiff = both.select(max(abs(col("native") - col("hof")))).collect()(0).getDouble(0)
    assert(maxDiff < 1e-6)
  }

  test("native cosine handles zero vectors and null arrays") {
    val df = Seq(
      (Array(0.0f, 0.0f), Array(1.0f, 2.0f)),
      (Array(1.0f, 1.0f), Array(1.0f, 1.0f))
    ).toDF("a", "b")
      .select(GraftExtensions.cosine(spark, col("a"), col("b")).as("c"))
    val got = df.as[Double].collect()
    assert(got(0) == 0.0)
    assert(math.abs(got(1) - 1.0) < 1e-12)
    val withNull = Seq((Some(Array(1.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
      .select(GraftExtensions.cosine(spark, col("a"), col("b")).as("c"))
    assert(withNull.collect()(0).isNullAt(0))
  }

  test("cosine scan stays inside WholeStageCodegen") {
    // a parquet-backed scan (local relations collapse to LocalTableScan)
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val plan = emb.select(GraftExtensions.cosine(spark, col("embedding"), col("embedding")))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks a WholeStageCodegen stage; a CodegenFallback
    // expression would strip it from the Project
    assert(plan.contains("*(1) Project"))
  }

  test("native graft_dot_long == the HOF fold exactly; overflow throws") {
    val df = Seq(
      (Array(1L, 2L, 3L), Array(4L, -5L, 6L)),   // 4 - 10 + 18 = 12
      (Array(127L, -127L), Array(127L, 127L)),   // 127^2 - 127^2 = 0
      (Array.empty[Long], Array.empty[Long])
    ).toDF("a", "b")
    val got = df.select(
      GraftExtensions.dotLong(spark, col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0L), (acc, x) => acc + x).as("hof"))
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((12L, 12L), (0L, 0L), (0L, 0L)))
    val withNull = Seq((Some(Array(1L)), Option.empty[Array[Long]])).toDF("a", "b")
      .select(GraftExtensions.dotLong(spark, col("a"), col("b")))
    assert(withNull.collect()(0).isNullAt(0))
    // ANSI posture: a dot that exceeds Long range throws, never wraps
    val big = Seq((Array(Long.MaxValue, Long.MaxValue), Array(2L, 2L))).toDF("a", "b")
    intercept[Exception] {
      big.select(GraftExtensions.dotLong(spark, col("a"), col("b"))).collect()
    }
  }

  test("dot-long scan stays inside WholeStageCodegen") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(transform(col("embedding"),
        x => (x * 100).cast("long")).as("q"))
    val plan = emb.select(GraftExtensions.dotLong(spark, col("q"), col("q")))
      .queryExecution.executedPlan.toString
    // the quantize `transform` HOF above splits stages; the dot's own
    // Project must still carry the WholeStageCodegen star
    assert("\\*\\(\\d+\\) Project \\[graft_dot_long".r.findFirstIn(plan).isDefined,
      "graft_dot_long must not strip whole-stage codegen:\n" + plan.take(1500))
  }

  test("native graft_sorted_intersect == size(array_intersect) on sorted arrays") {
    val df = Seq(
      (Array(1, 3, 5, 7), Array(2, 3, 5, 9)),
      (Array(1, 2, 3), Array(4, 5, 6)),
      (Array.empty[Int], Array(1, 2)),
      (Array(-5, 0, 4), Array(-5, 0, 4))
    ).toDF("a", "b")
    val both = df.select(
      GraftExtensions.sortedIntersect(spark, col("a"), col("b")).as("native"),
      size(array_intersect(col("a"), col("b"))).as("builtin"))
    assert(both.as[(Int, Int)].collect().forall { case (n, b) => n == b })
    val withNull = Seq((Some(Array(1)), Option.empty[Array[Int]])).toDF("a", "b")
      .select(GraftExtensions.sortedIntersect(spark, col("a"), col("b")))
    assert(withNull.collect()(0).isNullAt(0))
  }

  test("sorted-intersect screen stays inside WholeStageCodegen") {
    // parquet-backed plain array<int> attributes (local relations collapse
    // to LocalTableScan; HOF-built arrays would themselves be
    // CodegenFallback and mask the property under test — q113's screen
    // runs the expression over join-attached plain attributes)
    val dir = java.nio.file.Files.createTempDirectory("graft-si").toString
    Seq((Array(1, 3, 5), Array(3, 5, 7)), (Array(2, 4), Array(4, 8)))
      .toDF("a", "b").write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    val plan = back
      .select(GraftExtensions.sortedIntersect(spark, col("a"), col("b")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"))
  }

  test("native md5h60 == conv(substring(md5)) formulation, and stays codegen'd") {
    val rnd = new scala.util.Random(7)
    val samples = Seq("", "a", "hello world", "héllo ünïcode ✓",
      "x" * 500, "0", "\t\n") ++
      (1 to 200).map(_ => rnd.alphanumeric.take(rnd.nextInt(40)).mkString)
    val df = samples.toDF("s")
    val both = df.select(
      graft.functions.PortableHash.md5Hash60(col("s")).as("native"),
      conv(substring(md5(col("s").cast("binary")), 2, 15), 16, 10)
        .cast("long").as("builtin"))
    assert(both.filter(col("native") =!= col("builtin")).count() == 0)
    assert(both.filter(col("native") < 0).count() == 0, "60-bit => positive")
    // parquet-backed scan stays inside one WholeStageCodegen span
    val doc = Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = doc.select(graft.functions.PortableHash.md5Hash60(col("text")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"))
  }

  test("nearest-centroid argmax == greatest-of-cosine-structs fold, bit for bit") {
    // the composed fold this expression replaced — kept here as the parity
    // reference (greatest on (cos, -cid): max cos, ties to smallest cid)
    def folded(vec: org.apache.spark.sql.Column,
        cents: Seq[(Int, Seq[Float])]): org.apache.spark.sql.Column = {
      val scored = cents.map { case (cid, cvec) =>
        struct(
          GraftExtensions.cosine(spark, vec, array(cvec.map(lit): _*)).as("c"),
          lit(-cid).as("ni"))
      }
      -greatest(scored: _*).getField("ni")
    }
    val cents = (0 until 24).map(c =>
      (c, Seq.tabulate(16)(j => math.cos(c * 7 + j * 3).toFloat)))
    val matrix = array(cents.map { case (_, cv) => array(cv.map(lit): _*) }: _*)
    val both = vecs.select(
      GraftExtensions.nearestCentroid(spark, col("embedding"), matrix).as("native"),
      folded(col("embedding"), cents).as("fold"))
    assert(both.filter(col("native") =!= col("fold")).count() == 0)
    // exact-tie + zero-norm edge: duplicate centroid -> smallest id wins;
    // zero row vector -> all cosines 0.0 -> centroid 0
    val dup = Seq((0, Seq(1f, 0f)), (1, Seq(1f, 0f)), (2, Seq(0f, 1f)))
    val dmx = array(dup.map { case (_, cv) => array(cv.map(lit): _*) }: _*)
    val edge = Seq(Tuple1(Array(1f, 0f)), Tuple1(Array(0f, 0f))).toDF("v")
    val got = edge.select(
      GraftExtensions.nearestCentroid(spark, col("v"), dmx).as("n"))
      .as[Int].collect().toSeq
    assert(got == Seq(0, 0))
    // and the assignment projection stays inside whole-stage codegen
    // (a parquet-backed scan — a local relation would eagerly collapse)
    val pq = java.nio.file.Files.createTempDirectory("nc").toString + "/v"
    vecs.write.mode("overwrite").parquet(pq)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = spark.read.parquet(pq).select(
        GraftExtensions.nearestCentroid(spark, col("embedding"), matrix))
        .queryExecution.executedPlan.toString
      assert(p.contains("*(1) Project"), p.take(800))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("SparkSessionExtensions route registers graft_cosine") {
    val s2 = spark.newSession()
    new graft.plans.GraftExtensions().apply(
      new org.apache.spark.sql.SparkSessionExtensions) // constructs cleanly
    GraftExtensions.ensureRegistered(s2)
    val r = s2.sql("SELECT graft_cosine(array(cast(1.0 as float)), array(cast(1.0 as float)))")
      .collect()(0).getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }
}
