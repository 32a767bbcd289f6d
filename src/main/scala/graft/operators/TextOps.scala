package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.XHash

/** Column-level text primitives for the dedup / text-analysis operators.
  * Everything here is built from codegen'd `org.apache.spark.sql.functions`
  * higher-order functions — no UDFs, no explode until an operator actually
  * needs row expansion — and each has an exact SQL twin for the oracle
  * (the `*Sql` generators), sharing constants via [[XHash]].
  */
object TextOps {

  /** Whitespace tokens of the raw text (single-space corpus). */
  def tokens(text: Column): Column = split(lower(text), " ")
  def tokensSql(e: String): String = s"string_split(lower($e), ' ')"

  /** Distinct word n-gram shingles; empty array for docs shorter than n.
    * Native codegen'd expression ([[graft.functions.WordShingles]]) —
    * semantics equal to the declarative
    * `array_distinct(transform(sequence(...), concat_ws(...)))` chain,
    * which is interpreted (CodegenFallback) and ~10× slower. */
  def shingles(text: Column, n: Int = 3): Column =
    graft.functions.WordShingles(text, n)
  def shinglesSql(e: String, n: Int = 3): String = {
    val elems = (1 to n).map(j => s"t[i+$j]").mkString(" || ' ' || ")
    s"list_distinct(list_transform(range(len(${tokensSql(e)}) - ${n - 1}), " +
      s"i -> $elems))".replace("t[", s"(${tokensSql(e)})[")
  }

  /** k MinHash signatures over a (distinct) token/shingle array — one
    * `array_min(transform(...))` per signature, no shuffle, no explode.
    * Feed `hashed = transform(items, XHash.hashP)` so the md5 runs ONCE
    * per element instead of once per (element, signature): 16× less hash
    * work for k=16. */
  def minhashSigsFromHashes(hashed: Column, k: Int): Seq[Column] =
    XHash.coeffs(k).map { case (a, b) =>
      array_min(transform(hashed, h => (h * a + b) % XHash.P))
    }

  /** 60-bit SimHash over the token multiset: per bit j, majority vote of
    * token-hash bits (+1/−1), assembled into one int64 fingerprint. */
  val SimHashBits = 60

  /** Content fingerprint of whitespace-normalized text (60-bit). */
  def fingerprint(text: Column): Column =
    XHash.hash60(regexp_replace(lower(text), "\\s+", " "))
  def fingerprintSql(e: String): String =
    XHash.hash60Sql(s"regexp_replace(lower($e), '\\s+', ' ', 'g')")

  /** Quantize a float embedding to exact int64s (1e-6 resolution): integer
    * dot products and norms are then order-independent and bit-identical
    * across engines; cosine from them is single-rounded IEEE arithmetic. */
  def quantize(vec: Column): Column =
    transform(vec, v => round(v.cast("double") * 1000000.0).cast("long"))
  def quantizeSql(e: String): String =
    s"list_transform($e, v -> CAST(round(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT))"

  /** Exact int64 dot product of two quantized vectors — native codegen'd
    * expression (see [[graft.functions.LongArrayDot]]); same sequential
    * multiply-add semantics as the aggregate/zip_with formulation. */
  def qdot(a: Column, b: Column): Column =
    graft.functions.LongArrayDot(a, b)

  /** Deterministic cosine over quantized vectors:
    * dot / (sqrt(na) * sqrt(nb)) — exact ints into IEEE ops. */
  def qcosine(a: Column, b: Column): Column =
    qdot(a, b).cast("double") /
      (sqrt(qdot(a, a).cast("double")) * sqrt(qdot(b, b).cast("double")))
}
