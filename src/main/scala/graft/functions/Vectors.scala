package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `Array[Float]` embedding columns as pure
  * expressions: dot product, norm, cosine — plus the deterministic
  * random-hyperplane signature used by the LSH ANN path.
  *
  * Elements are cast to double before arithmetic so Spark and the
  * DuckDB oracle fold the same left-to-right summation and produce
  * bit-identical doubles.
  */
object Vectors {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Hyperplane component sign for (bit j, dim d): ±1 from the parity
    * of the md5-prefix 60-bit hash of "j-d" — the same value DuckDB
    * computes as `CAST('0x'||substr(md5(j||'-'||d),1,15) AS BIGINT)&1`,
    * so the signature has an exact oracle twin. Precomputed here into
    * literal arrays: the executor does no hashing at all. */
  def hyperplaneSign(j: Int, d: Int): Double = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s"$j-$d".getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.substring(0, 15)
    if ((java.lang.Long.parseLong(hex, 16) & 1L) == 0L) 1.0 else -1.0
  }

  /** nBits-bit random-hyperplane signature: bit j = [⟨v, r_j⟩ > 0]
    * with r_j's ±1 components from [[hyperplaneSign]]. Cosine-similar
    * vectors agree on most bits. `dims` must match the embedding
    * length (64 in the testdata). */
  def hyperplaneSignature(v: Column, nBits: Int = 16, dims: Int = 64): Column =
    (0 until nBits).map { j =>
      val signs = array((0 until dims).map(d => lit(hyperplaneSign(j, d))): _*)
      val proj = aggregate(zip_with(v, signs, (x, s) => x.cast("double") * s),
        lit(0.0), (acc, x) => acc + x)
      // sign test on the ROUNDED projection: a last-ulp summation
      // difference between engines must not flip a bit near zero
      when(round(proj, 6) > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
}
