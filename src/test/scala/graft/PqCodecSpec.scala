package graft

import org.apache.spark.sql.functions._

import graft.functions.{PqCodec, Vectors}
import graft.operators.Similarity

/** Pins the native PQ kernels to the composable Column formulation
  * they replaced (slice ∘ zip_with ∘ aggregate + struct-argmax): same
  * codes, same rounded ADC sums, bit-for-bit. If a kernel ever drifts
  * — fold order, rounding mode, tie-break — this fails before the
  * driver's oracle does. */
class PqCodecSpec extends SparkSpec {

  private val subspaces = Similarity.PqSubspaces
  private val codebook = Similarity.PqCodebook
  private val dims = 64
  private val sub = dims / subspaces

  private lazy val emb = Tables(spark, sf, "embeddings")
  private lazy val cents: Array[Array[Array[Float]]] =
    emb.filter(col("vec_id") < codebook)
      .select("vec_id", "embedding").collect().sortBy(_.getLong(0))
      .map(_.getSeq[Float](1).toArray.grouped(sub).toArray)
  private lazy val cbArr = cents.flatMap(_.flatten)

  // the pre-kernel composable encode, verbatim
  private def subDot(v: org.apache.spark.sql.Column, s: Int, j: Int) =
    round(Vectors.dot(slice(v, s * sub + 1, sub),
      array(cents(j)(s).map(lit).toIndexedSeq: _*)), 6)
  private def codeFor(v: org.apache.spark.sql.Column, s: Int) =
    -array_max(array((0 until codebook).map(j =>
      struct(subDot(v, s, j).as("sim"), lit(-j).as("negid"))): _*))
      .getField("negid")

  test("pq_encode matches the composable struct-argmax encode exactly") {
    val kernel = emb.select(col("vec_id"),
      PqCodec.encode(col("embedding"), lit(cbArr), subspaces).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val composable = emb.select(col("vec_id"),
      array((0 until subspaces).map(s => codeFor(col("embedding"), s)): _*).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(kernel.size == composable.size && kernel.nonEmpty)
    kernel.foreach { case (id, codes) =>
      assert(codes == composable(id), s"codes diverge for vec $id")
    }
  }

  test("pq_adc_score matches the composable element_at sum, and the driver-side tables") {
    val qRows = emb.filter(col("vec_id") < 10)
      .select("vec_id", "embedding").collect().sortBy(_.getLong(0))
    val tbls = qRows.flatMap(r =>
      PqCodec.adcTableFlat(r.getSeq[Float](1).toArray, cbArr, subspaces))
    // composable per-query table column (the pre-kernel form)
    val tblCol = array((for (s <- 0 until subspaces; j <- 0 until codebook)
      yield subDot(col("embedding"), s, j)): _*)
    val columnTbls = emb.filter(col("vec_id") < 10)
      .select(col("vec_id"), tblCol.as("tbl")).collect().sortBy(_.getLong(0))
      .flatMap(_.getSeq[Double](1))
    assert(tbls.toSeq == columnTbls.toSeq, "driver-side ADC tables diverge from the Column form")

    val codes = emb.limit(20).select(col("vec_id"),
      PqCodec.encode(col("embedding"), lit(cbArr), subspaces).as("codes"))
    val kernel = codes
      .select(col("vec_id"), posexplode(PqCodec.adcScore(col("codes"), lit(tbls), codebook)))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    // composable ADC sum: element_at chain reduced left-to-right
    val composable = (for {
      r <- codes.collect()
      id = r.getLong(0); cs = r.getSeq[Int](1)
      t <- qRows.indices
    } yield {
      val base = t * subspaces * codebook
      var acc = tbls(base + cs(0))
      for (s <- 1 until subspaces) acc += tbls(base + s * codebook + cs(s))
      (id, t) -> PqCodec.round6(acc)
    }).toMap
    assert(kernel.size == composable.size && kernel.nonEmpty)
    composable.foreach { case (k, v) =>
      assert(kernel(k) == v, s"adc_sim diverges at $k")
    }
  }
}
