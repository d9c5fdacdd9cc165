package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-reproducible hashing for the dedup/LSH operator family.
  *
  * Spark's `xxhash64` has no equivalent in other SQL engines, which makes
  * queries built on it impossible to verify differentially. This family is
  * built on md5 — available and bit-identical everywhere — so the SAME
  * signature/bucket pipeline can be replayed in DuckDB (the correctness
  * oracle) or any warehouse:
  *
  *  - [[md5Hash60]] == DuckDB `('0x' || substring(md5(s), 2, 15))::BIGINT`
  *    — hex digest chars 2..16, i.e. 60 bits of the digest, parsed as an
  *    integer. 60 (not 64) keeps the value positive in a signed BIGINT in
  *    every engine, with no byte-order or unsigned-modulo gymnastics.
  *  - [[affine31]] is the classic universal-hash permutation family
  *    `(a*h + b) mod p` over the 31-bit residue of the base hash, entirely
  *    in Long arithmetic (products < 2^62 — ANSI-overflow-safe with no
  *    decimal widening; see SPARK ANSI notes in the repo memory).
  *
  * Throughput note: md5 over short shingle strings is ~2x the cost of
  * xxhash64 tuple hashing, which is why [[Dedup]] keeps the xxhash64 family
  * as an option; the portable family is the default for anything that needs
  * cross-engine verification, and the banding/harvest topology (the part
  * that matters at 100 TB) is identical for both.
  */
object PortableHash {

  /** 2^60 — the mask modulus keeping hashes positive in signed 64-bit. */
  val Mod60: Long = 1152921504606846976L

  /** Mersenne prime 2^31 - 1 for the affine permutation family. */
  val P31: Long = 2147483647L

  /** 60-bit positive hash of a string column, equal to DuckDB's
    * `('0x' || substring(md5(s), 2, 15))::BIGINT`. Uses the native
    * [[graft.plans.Md5Hash60]] codegen expression (digest bytes masked
    * straight into a long — no hex string, substring, or radix parse per
    * row; an earlier little-endian-uint64 formulation was ~30% of q18's
    * runtime, and the conv(substring(md5)) formulation kept three
    * allocations per shingle). Falls back to the built-in formulation if
    * no active session exists to register the function against.
    *
    * Session resolution: `ensureRegistered` registers a temp function
    * against the session active when the Column is BUILT — on a vanilla
    * session, analyzing that Column under a different SparkSession
    * (`newSession()`, multi-session drivers) would fail to resolve it.
    * Both `Sessions.local` and the documented cluster profile therefore
    * install [[graft.plans.GraftExtensions]] config-based
    * (`spark.sql.extensions=graft.plans.GraftExtensions`), which puts the
    * functions in EVERY session's own registry — under a profile session
    * the caveat never applies (multi-session resolution is pinned in
    * PlansSpec); the imperative path remains only as the vanilla-session
    * fallback. */
  def md5Hash60(c: Column): Column =
    org.apache.spark.sql.SparkSession.getActiveSession match {
      case Some(s) =>
        graft.plans.GraftExtensions.ensureRegistered(s)
        call_function("graft_md5h60", c.cast("string").cast("binary"))
      case None =>
        conv(substring(md5(c.cast("string").cast("binary")), 2, 15), 16, 10).cast("long")
    }

  /** The same computation as a DuckDB SQL fragment (for generated oracles).
    * The VARCHAR cast mirrors the Spark side's `.cast("string")` (and
    * DuckDB's md5 only accepts VARCHAR) — identical digits for integer
    * ids, no-op for string inputs. */
  def md5Hash60Sql(expr: String): String =
    s"(('0x' || substring(md5(CAST($expr AS VARCHAR)), 2, 15))::BIGINT)"

  /** The same 60-bit md5 computation as plain driver/executor-side Scala
    * (for fixture laws and tests that need the portable stream outside a
    * Column context): hex digits 2..16 of md5(utf8(s)), base 16 —
    * identical to [[md5Hash60]] / [[md5Hash60Sql]] on the same string. */
  def md5Hash60Local(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val sb = new StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    java.lang.Long.parseLong(sb.substring(1, 16), 16)
  }

  /** Deterministic splitmix64 step — the coefficient source for permutation
    * families and hyperplane literals (same stream every run/engine). */
  def splitmix(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Coefficients (a, b) of the i-th affine permutation: a in [1, p-1],
    * b in [0, p-1], fixed for all time (they are part of any persisted
    * signature's format). */
  def affineCoeffs(i: Int): (Long, Long) = {
    val a = java.lang.Math.floorMod(splitmix(0x5EEDL + 2L * i), P31 - 1) + 1
    val b = java.lang.Math.floorMod(splitmix(0xB0B5L + 2L * i + 1), P31)
    (a, b)
  }

  /** i-th permutation of a base hash column: `(a_i * (h & 0x7FFFFFFF) + b_i)
    * mod p31`. Long-only arithmetic: products < 2^62. */
  def affine31(i: Int, h: Column): Column = {
    val (a, b) = affineCoeffs(i)
    (lit(a) * h.bitwiseAND(lit(0x7FFFFFFFL)) + lit(b)) % lit(P31)
  }

  /** DuckDB fragment for [[affine31]] over a fragment computing the base
    * hash. */
  def affine31Sql(i: Int, hExpr: String): String = {
    val (a, b) = affineCoeffs(i)
    s"(($a * ($hExpr & 2147483647) + $b) % $P31)"
  }
}
