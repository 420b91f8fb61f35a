package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, MapType, StringType}

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

  /** q41 — F3 over schemaless documents: build a JSON doc per row (the
    * stand-in for a dynamic `bson.M`), mask the nested `meta.source`
    * path inside the JSON text via [[Security.maskJsonDoc]], and read
    * the leaves back out to prove the rewrite touched exactly the
    * target path (security.go:133-287). */
  def jsonDocMask(spark: SparkSession, dir: String): DataFrame = {
    val doc = Tables(spark, dir, "documents").select(
      col("doc_id"),
      to_json(struct(
        col("doc_id").as("id"),
        struct(col("source").as("source"), col("lang").as("lang")).as("meta"))).as("doc"))
    doc.select(
      col("doc_id"),
      Security.maskJsonDoc(col("doc"), Seq(FieldSecurity("meta.source", "mask"))).as("masked"))
      .select(
        col("doc_id"),
        get_json_object(col("masked"), "$.meta.source").as("source_masked"),
        get_json_object(col("masked"), "$.meta.lang").as("lang_rt"))
  }

  /** q42 — F3 over MapType: parse the events `props` JSON into a
    * runtime map and mask key `k` through the `transform_values` path
    * (the typed face of dynamic-doc masking; key selection happens
    * per row, not in the schema). */
  def mapMask(spark: SparkSession, dir: String): DataFrame = {
    val m = Tables(spark, dir, "events").select(
      col("event_id"),
      from_json(col("props"), MapType(StringType, StringType)).as("m"))
    Security.applyFieldSecurity(m, Seq(FieldSecurity("m.k", "mask")))
      .select(col("event_id"), element_at(col("m"), "k").as("k_masked"))
  }
}
