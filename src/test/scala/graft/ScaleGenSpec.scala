package graft

import org.scalatest.funsuite.AnyFunSuite

/** The replica generator's per-copy TEXT decorrelation: shuffle +
  * vocabulary carve. The carve is what makes token-frequency-driven
  * harvests (q113 sum(df²), q18 shingle DF) measure real scaling on the
  * replica — one vocabulary slice per copy, the text twin of the media
  * key-space block carve ([[graft.multimodal.Multimodal.mediaBlock]]). */
class ScaleGenSpec extends AnyFunSuite {

  test("carveToken: copy 0 is the identity") {
    for (t <- Seq("hello", "World99", "a", "", "—", "mix3d.Tok!"))
      assert(ScaleGen.carveToken(t, 0) == t)
  }

  test("carveToken preserves length, case pattern, and punctuation") {
    val toks = Seq("hello", "World", "a1b2", "end.", "who's", "UPPER", "x")
    for (t <- toks; c <- Seq(1, 7, 25, 26, 53, 99)) {
      val out = ScaleGen.carveToken(t, c)
      assert(out.length == t.length, s"$t copy $c")
      // the multiset of character classes is preserved (rotation moves
      // positions, substitution stays within the class)
      def classes(s: String) = s.map {
        case ch if ch.isLower => 'l'
        case ch if ch.isUpper => 'u'
        case ch if ch.isDigit => 'd'
        case ch => ch
      }.sorted
      assert(classes(out) == classes(t), s"$t -> $out copy $c")
    }
  }

  test("carveToken is a within-copy bijection: equal iff equal") {
    val vocab = Seq("alpha", "beta", "gamma", "delta", "beta", "alpha")
    for (c <- Seq(1, 30, 77)) {
      val carved = vocab.map(ScaleGen.carveToken(_, c))
      assert(carved.distinct.size == vocab.distinct.size)
      assert(vocab.zip(carved).toMap.size == vocab.distinct.size)
    }
  }

  test("carveToken: copies' vocabulary slices are disjoint for real tokens") {
    // a token of length L has 26·L distinct transforms (shift mod 26 ×
    // rotation mod L): tokens of length >= 4 are fully disjoint across a
    // 100-copy (sf10) replica; 2–3-char tokens collide only between
    // copies >= 52 apart — at most 2 of 100 copies share a surface form,
    // so shared-df mass stays bounded by ~2x a single copy's
    for (t <- Seq("hello", "risk", "dashboard", "a1b2c3", "word")) {
      val forms = (0 until 100).map(c => ScaleGen.carveToken(t, c))
      assert(forms.distinct.size == 100, s"'$t' collides: $forms")
    }
    for (t <- Seq("of", "the", "a")) {
      val byForm = (0 until 100).groupBy(c => ScaleGen.carveToken(t, c))
      val worst = byForm.values.map(_.size).max
      val bound = math.max(1, math.ceil(100.0 / (26 * t.length)).toInt)
      assert(worst <= bound, s"'$t': $worst copies share a form (bound $bound)")
    }
    // the 10-copy (sf1) replica is fully disjoint even for 2-char tokens
    for (t <- Seq("of", "the", "hello")) {
      val forms = (0 until 10).map(c => ScaleGen.carveToken(t, c))
      assert(forms.distinct.size == 10, s"'$t' collides within 10 copies")
    }
  }

  test("decorrelateText keeps within-copy shingle equality and token stats") {
    val a = "the quick brown fox jumps over the lazy dog"
    val b = "the quick brown fox jumps over the lazy dog"
    val c = "a different sentence with its own words here now"
    for (copy <- Seq(1, 12, 40)) {
      val da = ScaleGen.decorrelateText(a, copy)
      // identical docs stay identical (near-dup structure survives)
      assert(da == ScaleGen.decorrelateText(b, copy))
      // token count and per-token lengths are preserved (as a multiset)
      assert(da.split(" ").map(_.length).sorted.toSeq
        == a.split(" ").map(_.length).sorted.toSeq)
      // cross-copy token overlap is destroyed
      val tokensA = da.split(" ").toSet
      val tokensC = ScaleGen.decorrelateText(c, copy + 1).split(" ").toSet
      val base = a.split(" ").toSet
      assert(tokensA.intersect(base).isEmpty)
      assert(ScaleGen.decorrelateText(a, copy + 1).split(" ").toSet
        .intersect(tokensA).isEmpty)
      assert(tokensC.intersect(ScaleGen.decorrelateText(c, copy).split(" ").toSet).isEmpty)
    }
    assert(ScaleGen.decorrelateText(null, 3) == null)
    assert(ScaleGen.decorrelateText(a, 0) == a)
  }
}
