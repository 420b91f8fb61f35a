package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.FieldSecurity

/** PII security transforms (reference pkg/syncer/security/security.go).
  *
  * All transforms are pure `Column` expressions — whole-stage-codegen
  * friendly, no UDFs — so they can sit in the hot path of the CDC
  * stream or a 100 TB snapshot scan without breaking codegen.
  *
  * Faithfully preserved reference semantics:
  *  - mask length == input length, i.e. length is deliberately leaked
  *    (security.go:92-98); non-string inputs mask to the fixed "****".
  *  - encrypt = AES-GCM, random nonce, base64 output (security.go:33-56).
  *    Spark's `aes_encrypt(..., "GCM")` emits nonce||ciphertext||tag,
  *    the same wire layout the reference writes.
  *  - nested dot-path targeting recurses into structs (security.go:133-287);
  *    arrays of structs are handled via `transform`, which the reference
  *    (row-at-a-time Go) could not express.
  */
object Security {

  /** Reference default key (security.go:30: hardcoded 32-byte key).
    * Configurable per deployment; kept only as the test default. */
  val DefaultKey = "0123456789abcdef0123456789abcdef"

  /** F1: mask a string column to '*' × len; non-strings to "****". */
  def mask(c: Column, dt: DataType): Column = dt match {
    case StringType => when(c.isNull, lit(null).cast(StringType))
      .otherwise(repeat(lit("*"), length(c).cast(IntegerType)))
    case _ => when(c.isNull, lit(null).cast(StringType)).otherwise(lit("****"))
  }

  /** F2: AES-256-GCM encrypt to base64 (random nonce ⇒ nondeterministic,
    * like the reference). */
  def encrypt(c: Column, key: String = DefaultKey): Column =
    base64(aes_encrypt(c.cast(StringType), lit(key), lit("GCM")))

  def decrypt(c: Column, key: String = DefaultKey): Column =
    aes_decrypt(unbase64(c), lit(key), lit("GCM")).cast(StringType)

  /** Apply one rule to a (possibly nested) column of type `dt`. */
  private def applyRule(c: Column, dt: DataType, securityType: String): Column =
    securityType match {
      case "encrypt" => encrypt(c)
      case _         => mask(c, dt)
    }

  /** F3: rewrite `df` so every dot-path in `rules` is masked/encrypted
    * in place, recursing through StructType and ArrayType(StructType)
    * (reference security.go:59-287, ≤10 levels — Spark's recursion is
    * bounded by the schema depth instead).
    */
  def applyFieldSecurity(df: DataFrame, rules: Seq[FieldSecurity]): DataFrame = {
    def rewrite(c: Column, dt: DataType, path: Seq[String], securityType: String): Column =
      (dt, path) match {
        case (_, Nil) => applyRule(c, dt, securityType)
        case (st: StructType, head +: rest) =>
          st.fields.find(_.name == head) match {
            case Some(f) => c.withField(head, rewrite(c.getField(head), f.dataType, rest, securityType))
            case None    => c
          }
        case (ArrayType(et: StructType, _), _) =>
          transform(c, x => rewrite(x, et, path, securityType))
        case _ => c // path into a non-struct: no-op, like the reference's safe fallback
      }

    rules.foldLeft(df) { (d, rule) =>
      val parts = rule.field.split('.').toSeq
      d.schema.fields.find(_.name == parts.head) match {
        case Some(f) =>
          d.withColumn(f.name, rewrite(col(f.name), f.dataType, parts.tail, rule.securityType))
        case None => d
      }
    }
  }
}
