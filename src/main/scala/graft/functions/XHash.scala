package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic hashing: the SAME 60-bit integer hash is
  * computable in Spark (`conv(substr(md5(x),1,15),16,10)`) and in DuckDB
  * (`('0x'||substr(md5(x),1,15))::BIGINT`), so sketch operators built on it
  * (MinHash, SimHash, LSH) are exactly reproducible by the SQL oracle —
  * no "approximately equal" hand-waving in the correctness gate.
  *
  * 15 hex chars = 60 bits keeps every value and every affine transform
  * `(h % P) * a + b` inside non-negative int64 range in both engines
  * (DuckDB errors on int64 overflow rather than wrapping).
  */
object XHash {
  /** Mersenne prime 2^31-1: modulus for affine MinHash permutations. */
  val P: Long = 2147483647L

  /** Deterministic affine coefficients (a_i odd in [1,P), b_i in [0,P))
    * from a fixed LCG — both the Column builders and the SQL generators
    * read THIS sequence, so the two engines always agree. */
  def coeffs(k: Int): Seq[(Long, Long)] = {
    var state = 88172645463325252L
    def next(): Long = { // xorshift64
      state ^= state << 13; state ^= state >>> 7; state ^= state << 17
      java.lang.Long.remainderUnsigned(state, P)
    }
    Seq.fill(k)(((next() | 1L) % P, next()))
  }

  // ---- Spark side --------------------------------------------------------
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** JVM-side evaluation of the SAME hash, for plan-time constants (e.g.
    * LSH hyperplane weights folded into literal arrays — the oracle still
    * recomputes them via [[hash60Sql]] and always agrees). */
  def hash60Local(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** h mod P, for affine minhash input. */
  def hashP(c: Column): Column = hash60(c) % P

  // ---- oracle (DuckDB SQL) side ------------------------------------------
  def hash60Sql(e: String): String =
    s"(('0x'||substr(md5($e),1,15))::BIGINT)"
  def hashPSql(e: String): String = s"(${hash60Sql(e)} % $P)"
}
