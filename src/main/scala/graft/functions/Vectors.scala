package graft.functions

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

  /** nBits-bit random-hyperplane signature: bit j = sign of ⟨v, r_j⟩
    * where r_j's components are deterministic ±1 derived from
    * xxhash64(j, dim). Cosine-similar vectors agree on most bits. */
  def hyperplaneSignature(v: Column, nBits: Int = 16): Column =
    aggregate(
      transform(sequence(lit(0), lit(nBits - 1)), j => {
        val proj = aggregate(
          zip_with(v, sequence(lit(0), size(v) - 1), (x, d) =>
            when(pmod(xxhash64(j * lit(10007) + d), lit(2)) === 0, x.cast("double"))
              .otherwise(-x.cast("double"))),
          lit(0.0), (acc, x) => acc + x)
        when(proj > 0, call_function("shiftleft", lit(1L), j)).otherwise(lit(0L))
      }),
      lit(0L), (acc, bit) => acc.bitwiseOR(bit))
}
