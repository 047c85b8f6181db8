package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector kernels over `array<float>` embedding columns, written as
  * higher-order built-in functions (`zip_with` + `aggregate`) so they stay
  * inside Catalyst/codegen — no Scala UDF boxing per element — and remain
  * expressible in the DuckDB oracle (list_dot_product / unnest forms).
  *
  * Part of the similarity-search surface (SURVEY.md §2b); no reference
  * counterpart (the reference's only kernels are byte/line scans,
  * usr_functions.c:39-44, 153-186).
  */
object VectorFunctions {

  /** Sum of elementwise products; both sides cast to double first for a
    * deterministic left-to-right fold order (matches DuckDB's list fold).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0.0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = norm(a) * norm(b)
    when(n > 0, d / n).otherwise(lit(0.0))
  }

  /** Squared L2 distance. */
  def l2sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val diff = x.cast("double") - y.cast("double")
        diff * diff
      }),
      lit(0.0),
      (acc, v) => acc + v)

  /** Pseudo-random hyperplane component in [-1, 1): derived from the md5
    * of "planeId_j", so it is deterministic, seedless and BIT-IDENTICAL
    * across engines (md5 + integer ops + one exact double division) —
    * unlike sin/cos, whose libm vs fdlibm results can differ by 1 ulp and
    * flip a sign bit near zero.
    */
  def planeComponent(planeId: Int, j: Column): Column = {
    val h = conv(substring(md5(concat(lit(planeId + "_"), j.cast("string"))), 1, 7), 16, 10)
      .cast("long")
    (pmod(h, lit(2001L)) - lit(1000L)).cast("double") / lit(1000.0)
  }

  /** Sign bit of the projection of `v` onto the fixed pseudo-random
    * hyperplane `planeId` — random-hyperplane LSH (Charikar, STOC'02).
    */
  def hyperplaneBit(v: Column, planeId: Int): Column = {
    val proj = aggregate(
      transform(v, (x, j) => x.cast("double") * planeComponent(planeId, j)),
      lit(0.0),
      (acc, x) => acc + x)
    when(proj >= 0, lit(1)).otherwise(lit(0))
  }

  /** nBits-bit LSH bucket signature for a vector (concatenated hyperplane
    * sign bits packed into a long). Vectors in the same bucket are
    * near-duplicate candidates; at scale the bucket id is the shuffle key,
    * so candidate generation is a single hash-partitioned exchange instead
    * of a cross join.
    */
  def lshBucket(v: Column, nBits: Int): Column =
    (0 until nBits).map { p =>
      hyperplaneBit(v, p).cast("long") * lit(1L << p)
    }.reduce(_ + _)
}
