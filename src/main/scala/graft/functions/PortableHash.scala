package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hashing primitives that produce bit-identical results in Spark and in the
  * DuckDB oracle (which lacks `crc32`/`xxhash64` shared with Spark).
  *
  * The common denominator is MD5 over UTF-8: both engines render identical
  * lowercase hex, so a 60-bit integer hash is derived by parsing the first 15
  * hex chars. Everything downstream (minhash, simhash, fingerprints, LSH
  * bands) is built from this plus overflow-safe modular arithmetic, so every
  * dedup/similarity operator in the catalog is oracle-checkable value-for-
  * value, not just row-count.
  *
  * Scale note: md5 is not the cheapest hash, but it runs inside whole-stage
  * codegen (built-in expression), is branch-free per row, and the dedup
  * pipelines hash *shingles*, whose cost is dominated by the string traffic
  * itself. On a real cluster swap `hash64` for `xxhash64` (same call shape).
  */
object PortableHash {

  /** 60-bit non-negative hash. DuckDB mirror: ('0x'||substr(md5(x),1,15))::BIGINT */
  def hash64(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** SQL fragment computing the same value in DuckDB. */
  def hash64Sql(expr: String): String =
    s"('0x' || substr(md5($expr), 1, 15))::BIGINT"

  /** 31-bit hash, safe to multiply by a 31-bit coefficient in signed 64-bit
    * arithmetic (DuckDB errors on BIGINT overflow instead of wrapping, so the
    * minhash family must stay under 2^62). */
  val Mersenne31 = 2147483647L // 2^31 - 1, prime

  def hash31(c: Column): Column = hash64(c) % Mersenne31

  def hash31Sql(expr: String): String =
    s"(${hash64Sql(expr)} % ${Mersenne31})"

  /** Fixed, public coefficients for the universal-hash family
    * h_i(x) = (a_i * x + b_i) mod (2^31-1). Chosen once; any odd a works. */
  val MinhashA: Seq[Long] = Seq(
    1103515245L, 1234567891L, 166455L, 362437L, 2027382L, 1664525L,
    22695477L, 69069L, 1013904223L, 1181783497L, 458793L, 6364136L,
    905633L, 278906L, 1299709L, 15485863L)
  val MinhashB: Seq[Long] = Seq(
    12345L, 987654321L, 777L, 4321L, 55555L, 1013904223L,
    1L, 362437L, 8191L, 131071L, 524287L, 6700417L,
    43L, 977L, 3511L, 65537L)

  /** One minhash value: min over `hashes31` (array<long> column) of
    * (a*h+b) mod p. */
  def minhash(hashes31: Column, a: Long, b: Long): Column =
    array_min(transform(hashes31, h => (h * a + b) % Mersenne31))

  def minhashSql(hashesExpr: String, a: Long, b: Long): String =
    s"list_min(list_transform($hashesExpr, h -> (h * ${a}::BIGINT + ${b}::BIGINT) % ${Mersenne31}))"

  /** Universal-hash coefficient pairs for the simhash bit family
    * bit_j(h) = ((a_j*h + b_j) mod p) mod 2. Derived from the Knuth
    * multiplicative constant; odd, < 2^31, so a*h stays under 2^62.
    * 60 planes: the 32-bit fingerprint uses the first 32, the wide 60-bit
    * fingerprint (4 LSH bands × 15 bits, sign-safe as BIGINT in both
    * engines) uses all 60. */
  val SimhashA: Seq[Long] = (1 to 60).map(j => ((2654435761L * j) % Mersenne31) | 1L)
  val SimhashB: Seq[Long] = (1 to 60).map(j => ((40503L * j * j + 7L) % Mersenne31))

  /** DuckDB list literal for a coefficient table. */
  def sqlList(xs: Seq[Long]): String = xs.mkString("[", "::BIGINT,", "::BIGINT]")
}
