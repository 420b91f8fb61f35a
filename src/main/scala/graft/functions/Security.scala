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

  // ---- schemaless documents (the one sanctioned UDF, SURVEY §7.4) ----

  /** Module-level mapper: initialized once per executor JVM (an object
    * member is not closure-captured), thread-safe for read/write. */
  private lazy val jsonMapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** JVM-side AES-256-GCM matching Spark's `aes_encrypt(..., "GCM")`
    * wire layout — 12-byte random nonce || ciphertext || tag, base64 —
    * so UDF-encrypted values decrypt with [[decrypt]]. Same layout the
    * reference writes (security.go:37-50, gcm.Seal with nonce prefix). */
  private lazy val rng = new java.security.SecureRandom()

  private def encryptString(s: String, key: String): String = {
    val nonce = new Array[Byte](12)
    rng.nextBytes(nonce)
    val cipher = javax.crypto.Cipher.getInstance("AES/GCM/NoPadding")
    cipher.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key.getBytes("UTF-8"), "AES"),
      new javax.crypto.spec.GCMParameterSpec(128, nonce))
    java.util.Base64.getEncoder.encodeToString(
      nonce ++ cipher.doFinal(s.getBytes("UTF-8")))
  }

  /** Walk `path` through a parsed JSON tree and rewrite the leaf in
    * place — the reference's processNestedObjectValue over `bson.M`
    * (security.go:210-287): absent keys are left untouched, string
    * leaves mask by length, non-string leaves mask to "****". An array
    * on the path applies the remaining path to every element (the
    * dynamic twin of the typed ArrayType(Struct) case above). */
  private def rewriteJson(node: com.fasterxml.jackson.databind.JsonNode,
      path: Seq[String], securityType: String, key: String): Unit = node match {
    case obj: com.fasterxml.jackson.databind.node.ObjectNode => path match {
      case Seq(leaf) =>
        val v = obj.get(leaf)
        if (v != null && !v.isNull) {
          val out = securityType match {
            case "encrypt" => encryptString(v.asText(), key)
            case _ => if (v.isTextual) "*" * v.asText().length else "****"
          }
          obj.put(leaf, out); ()
        }
      case head +: rest =>
        val child = obj.get(head)
        if (child != null) rewriteJson(child, rest, securityType, key)
      case _ => ()
    }
    case arr: com.fasterxml.jackson.databind.node.ArrayNode =>
      arr.forEach(e => rewriteJson(e, path, securityType, key))
    case _ => () // path into a scalar: no-op (reference's safe fallback)
  }

  /** F3 for dynamic documents: mask/encrypt dot-paths inside a
    * schemaless JSON-string column — the Spark stand-in for the
    * reference's `bson.M` masking (security.go:133-287). This is the
    * one sanctioned UDF in the library (SURVEY §7.4): a schemaless doc
    * has no Catalyst type to recurse on, so the rewrite happens on the
    * parsed tree. Malformed JSON passes through unchanged. */
  def maskJsonDoc(c: Column, rules: Seq[FieldSecurity], key: String = DefaultKey): Column = {
    val compiled = rules.map(r => (r.field.split('.').toSeq, r.securityType))
    val f = udf { (json: String) =>
      if (json == null) null
      else try {
        val root = jsonMapper.readTree(json)
        compiled.foreach { case (path, st) => rewriteJson(root, path, st, key) }
        jsonMapper.writeValueAsString(root)
      } catch {
        case _: com.fasterxml.jackson.core.JacksonException => json
      }
    }
    f(c)
  }

  /** F3: rewrite `df` so every dot-path in `rules` is masked/encrypted
    * in place, recursing through StructType, ArrayType(StructType), and
    * MapType (reference security.go:59-287, ≤10 levels — Spark's
    * recursion is bounded by the schema depth instead).
    *
    * MapType is the typed face of the reference's dynamic `bson.M`
    * documents: a path step into a map selects the matching KEY at
    * runtime (`transform_values`), so the rewrite stays a pure Column
    * expression even though key presence is per-row. A key absent in a
    * row is simply untouched — the reference's `if value, exists`
    * check (security.go:157). */
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
        case (MapType(_, vt, _), head +: rest) =>
          transform_values(c, (k, v) =>
            when(k === head, rewrite(v, vt, rest, securityType)).otherwise(v))
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
