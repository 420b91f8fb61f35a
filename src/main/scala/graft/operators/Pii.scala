package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}

import graft.Tables
import graft.functions.Security
import graft.model.FieldSecurity

/** PII-transform query shapes (reference pkg/syncer/security/security.go),
  * driven through the same column library the CDC pipeline uses.
  */
object Pii {

  /** F1 masked projection: string masks to '*'×len (length leak is
    * by design, security.go:95), non-string masks to "****". */
  def maskedProjection(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "customer").select(
      col("c_custkey"),
      Security.mask(col("c_name"), StringType).as("name_masked"),
      Security.mask(col("c_acctbal"), DoubleType).as("acctbal_masked"))

  /** F2 AES-GCM round trip: encrypt is nonce-randomized (like the
    * reference, security.go:37-44) so the oracle checks
    * decrypt(encrypt(x)) == x. */
  def encryptRoundtrip(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "customer").select(
      col("c_custkey"),
      Security.decrypt(Security.encrypt(col("c_name"))).as("name_rt"))

  /** F3 nested dot-path masking: build a document-shaped struct and
    * mask `name` and `profile.seg` in place (security.go:133-287),
    * then flatten for the oracle compare. */
  def nestedMask(spark: SparkSession, dir: String): DataFrame = {
    val doc = Tables(spark, dir, "customer").select(
      col("c_custkey"),
      struct(
        col("c_name").as("name"),
        struct(col("c_acctbal").as("bal"), col("c_mktsegment").as("seg")).as("profile")).as("doc"))
    val secured = Security.applyFieldSecurity(doc, Seq(
      FieldSecurity("doc.name", "mask"),
      FieldSecurity("doc.profile.seg", "mask")))
    secured.select(
      col("c_custkey"),
      col("doc.name").as("name_masked"),
      col("doc.profile.seg").as("seg_masked"),
      col("doc.profile.bal").as("bal"))
  }
}
