package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.functions.Security
import graft.model.FieldSecurity
import graft.operators.Pii

class SecuritySpec extends SparkSpec {
  import spark.implicits._

  test("mask preserves length for strings, **** for non-strings, null for null") {
    val df = Seq(("abc"), (""), (null: String)).toDF("v")
      .select(Security.mask(col("v"), StringType).as("m"))
    assert(df.collect().map(_.getAs[String]("m")).toSeq == Seq("***", "", null))
  }

  test("encrypt is randomized but decrypt round-trips") {
    val df = Seq("hello", "世界", "").toDF("v")
    // two separate executions: random nonce => different ciphertexts
    // (inside ONE plan Catalyst CSE would collapse identical calls)
    val run1 = df.select(Security.encrypt(col("v")).as("e")).collect().map(_.getString(0))
    val run2 = df.select(Security.encrypt(col("v")).as("e")).collect().map(_.getString(0))
    assert(run1.zip(run2).forall { case (a, b) => a != b })
    val rt = df.select(col("v"),
      Security.decrypt(Security.encrypt(col("v"))).as("d")).collect()
    assert(rt.forall(r => r.getAs[String]("v") == r.getAs[String]("d")))
  }

  test("nested dot-path masking rewrites only the targeted fields") {
    val df = Seq((1, ("alice", (100.0, "SEG")))).toDF("id", "doc")
      .select(col("id"), struct(
        col("doc._1").as("name"),
        struct(col("doc._2._1").as("bal"), col("doc._2._2").as("seg")).as("profile")).as("doc"))
    val out = Security.applyFieldSecurity(df, Seq(
      FieldSecurity("doc.name", "mask"), FieldSecurity("doc.profile.seg", "mask")))
      .select($"doc.name", $"doc.profile.seg", $"doc.profile.bal").head()
    assert(out.getString(0) == "*****")
    assert(out.getString(1) == "***")
    assert(out.getDouble(2) == 100.0)
  }

  test("masking inside arrays of structs") {
    val df = spark.sql("SELECT array(named_struct('email', 'a@b.c', 'n', 1)," +
      " named_struct('email', 'xy@z', 'n', 2)) AS contacts")
    val out = Security.applyFieldSecurity(df, Seq(FieldSecurity("contacts.email", "mask")))
      .select(expr("transform(contacts, c -> c.email)").as("emails"),
        expr("transform(contacts, c -> c.n)").as("ns"))
      .head()
    assert(out.getSeq[String](0) == Seq("*****", "****"))
    assert(out.getSeq[Int](1) == Seq(1, 2))
  }

  test("missing dot-path is a safe no-op") {
    val df = Seq((1, "x")).toDF("id", "v")
    val out = Security.applyFieldSecurity(df, Seq(FieldSecurity("nope.deep", "mask")))
    assert(out.collect().toSeq == df.collect().toSeq)
  }

  test("masked projection query has star-lengths matching source") {
    val rows = Pii.maskedProjection(spark, sf).limit(10).collect()
    assert(rows.forall(r => r.getAs[String]("name_masked").forall(_ == '*')))
    assert(rows.forall(r => r.getAs[String]("acctbal_masked") == "****"))
  }

  test("map-typed documents mask the targeted key per row, others untouched") {
    val df = spark.sql(
      "SELECT map('email', 'a@b.c', 'city', 'Tokyo') AS m UNION ALL SELECT map('city', 'Kyoto')")
    val out = Security.applyFieldSecurity(df, Seq(FieldSecurity("m.email", "mask")))
      .select(expr("m['email']").as("e"), expr("m['city']").as("c"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("*****", "Tokyo"), (null, "Kyoto"))) // absent key: no-op
  }

  test("json-doc mask rewrites only the dot-path leaf, by length for strings") {
    val df = Seq(
      """{"name":"alice","meta":{"source":"webcrawl","n":7}}""",
      """{"meta":{"n":1}}""",           // path absent: untouched
      """not json at all""").toDF("doc") // malformed: passes through
    val out = df.select(Security.maskJsonDoc(col("doc"), Seq(
      FieldSecurity("meta.source", "mask"), FieldSecurity("meta.n", "mask"))).as("m"))
      .collect().map(_.getString(0))
    assert(out(0).contains("\"source\":\"********\"")) // len("webcrawl") = 8
    assert(out(0).contains("\"n\":\"****\""))          // non-string leaf
    assert(out(0).contains("\"name\":\"alice\""))      // untouched sibling
    assert(out(1) == """{"meta":{"n":"****"}}""")
    assert(out(2) == "not json at all")
  }

  test("json-doc mask applies through arrays on the path") {
    val df = Seq("""{"contacts":[{"email":"a@b.c","n":1},{"email":"xy@z","n":2}]}""").toDF("doc")
    val out = df.select(Security.maskJsonDoc(col("doc"),
      Seq(FieldSecurity("contacts.email", "mask"))).as("m")).head().getString(0)
    assert(out == """{"contacts":[{"email":"*****","n":1},{"email":"****","n":2}]}""")
  }

  test("json-doc encrypt is decryptable by the column-level decrypt") {
    val df = Seq("""{"secret":"top secret value","keep":"x"}""").toDF("doc")
    val out = df.select(
      get_json_object(Security.maskJsonDoc(col("doc"),
        Seq(FieldSecurity("secret", "encrypt"))), "$.secret").as("enc"))
      .select(Security.decrypt(col("enc")).as("dec")).head().getString(0)
    assert(out == "top secret value")
  }
}
