package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector similarity primitives over `Array[Float]` embedding columns
  * (BASELINE.json mandate; the reference's VECTOR type F10 feeds these).
  *
  * Cross-engine determinism design: floats are quantized to 1e-6 integer
  * units (exact in double arithmetic because float mantissas are 24-bit),
  * so dot products and norms are EXACT 64-bit integers — order-independent
  * and identical in any engine. Cosine is then a single IEEE division of
  * exact operands. This also makes results invariant to partitioning —
  * critical when verifying a 1000-executor run against a single-node
  * oracle.
  */
object VectorFunctions {

  /** Float vector → exact integer vector (units of 1e-6); native codegen
    * pass (the HOF version allocated per element).
    */
  def quantize(vec: Column): Column = VectorNative.quantize_native(vec)

  /** Exact integer dot product of two quantized vectors (native). */
  def dotQ(a: Column, b: Column): Column = VectorNative.dotq_native(a, b)

  /** Squared L2 norm of a quantized vector (exact). */
  def normQ2(a: Column): Column = dotQ(a, a)

  /** Cosine similarity from exact integer dot/norms (one IEEE division). */
  def cosineFromQ(dot: Column, n2a: Column, n2b: Column): Column =
    dot.cast("double") / (sqrt(n2a.cast("double")) * sqrt(n2b.cast("double")))

  def cosine(a: Column, b: Column): Column = {
    val qa = quantize(a)
    val qb = quantize(b)
    cosineFromQ(dotQ(qa, qb), normQ2(qa), normQ2(qb))
  }

  /** SQ8 decode of a quantized vector against per-dim (mn, step) bounds
    * arrays — the integer grid value each 8-bit code represents (native).
    */
  def sq8Decode(q: Column, mns: Column, steps: Column): Column =
    VectorNative.sq8_decode_native(q, mns, steps)

  /** Random-hyperplane LSH bucket (16-bit signature). Plane p component i
    * is the deterministic pseudo-random integer ((p·131 + i·7919 + 17)
    * mod 1000) − 500, so executors and oracles regenerate identical
    * planes with no broadcast of randomness.
    */
  def lshBucket(qvec: Column, planes: Int = 16): Column =
    VectorNative.lsh_bucket_native(qvec, planes)
}
