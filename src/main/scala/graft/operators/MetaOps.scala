package graft.operators

import java.time.{Instant, LocalDate}
import java.time.temporal.ChronoUnit

/** Metadata/ops utilities batch — the small driver-side helpers every
  * real deployment of the reference touches (SURVEY §2: F4, F11, P7,
  * O4, SET3, O6, F15). These run on the driver over config/metadata,
  * never over data, so they are plain Scala (no Column plumbing).
  */
object MetaOps {

  // ---- F4: date placeholder substitution (time_utils.go:31-51) -------

  /** Replace `{YYYY}`/`{MM}`/`{DD}` (and lowercase, and brace-less)
    * placeholders with the target date, in the reference's exact
    * replacement order — braces first, then bare tokens, so `{YYYY}`
    * never leaves a dangling brace and bare `MM` in a table name still
    * substitutes (time_utils.go:36-49). */
  def replaceDatePlaceholders(pattern: String, date: LocalDate): String = {
    val yyyy = f"${date.getYear}%04d"
    val mm = f"${date.getMonthValue}%02d"
    val dd = f"${date.getDayOfMonth}%02d"
    Seq("{YYYY}" -> yyyy, "{MM}" -> mm, "{DD}" -> dd,
      "{yyyy}" -> yyyy, "{mm}" -> mm, "{dd}" -> dd,
      "YYYY" -> yyyy, "MM" -> mm, "DD" -> dd,
      "yyyy" -> yyyy, "mm" -> mm, "dd" -> dd)
      .foldLeft(pattern) { case (s, (from, to)) => s.replace(from, to) }
  }

  // ---- F11: credential redaction (external_simple.go:496-526,
  //           mysql.go maskMySQLPassword) ------------------------------

  // Mask credentials in a command-arg list for logging: the value after
  // `--uri` has its user:pass section replaced by ***:*** (only when
  // credentials are actually present), and any -pPASSWORD arg becomes
  // -p***. Returns the args joined for the log line, like the reference.
  def maskSensitiveArgs(args: Seq[String]): String = {
    val masked = args.zipWithIndex.map { case (arg, i) =>
      if (arg.startsWith("-p") && arg.length > 2) "-p***"
      else if (i > 0 && args(i - 1) == "--uri") maskUriCredentials(arg)
      else arg
    }
    masked.mkString(" ")
  }

  // user:pass before the @ becomes ***:***; URIs without a credential
  // section pass through unchanged.
  def maskUriCredentials(uri: String): String =
    uri.split("://", 2) match {
      case Array(scheme, rest) if rest.contains("@") =>
        val at = rest.indexOf('@')
        val cred = rest.substring(0, at)
        if (cred.contains(":")) s"$scheme://***:***${rest.substring(at)}"
        else uri
      case _ => uri
    }

  // ---- P7: query-string cleaning (external_simple.go:599-628) --------

  /** Strip one layer of surrounding double then single quotes from
    * every string value in a JSON query object, recursing into nested
    * objects (the reference repairs over-escaped UI-built queries).
    * Non-object JSON and malformed input pass through unchanged. */
  def cleanQueryJson(json: String): String = {
    import com.fasterxml.jackson.databind.JsonNode
    import com.fasterxml.jackson.databind.node.ObjectNode
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    def strip(s: String): String = {
      val d = if (s.length >= 2 && s.startsWith("\"") && s.endsWith("\""))
        s.substring(1, s.length - 1) else s
      if (d.length >= 2 && d.startsWith("'") && d.endsWith("'"))
        d.substring(1, d.length - 1) else d
    }
    def clean(node: JsonNode): Unit = node match {
      case obj: ObjectNode =>
        val names = obj.fieldNames()
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        while (names.hasNext) buf += names.next()
        buf.foreach { name =>
          val v = obj.get(name)
          if (v.isTextual) { obj.put(name, strip(v.asText())); () }
          else if (v.isObject) clean(v)
        }
      case _ => ()
    }
    try {
      val root = mapper.readTree(json)
      if (!root.isObject) json
      else { clean(root); mapper.writeValueAsString(root) }
    } catch { case _: com.fasterxml.jackson.core.JacksonException => json }
  }

  // ---- O4: PK-first field ordering (schema_handler.go:104-117) -------

  /** Order schema fields primary-keys-first, then alphabetically —
    * the reference's comparator (PK wins, then name) made total: PKs
    * are themselves name-sorted so composite keys order
    * deterministically. */
  def pkFirstFieldOrder(fields: Seq[(String, Boolean)]): Seq[String] = {
    val (pk, rest) = fields.partition(_._2)
    pk.map(_._1).sorted ++ rest.map(_._1).sorted
  }

  // ---- SET3: index diff (mongodb.go:368-430) -------------------------

  final case class IndexSpec(name: String, keys: Seq[(String, Int)], unique: Boolean = false)

  /** Diff source indexes against the target's existing index names:
    * the implicit `_id_` index never syncs, existing names are
    * skipped, everything else is created (mongodb.go:368-397). Returns
    * (toCreate, skippedCount). */
  def indexDiff(source: Seq[IndexSpec], targetNames: Set[String]): (Seq[IndexSpec], Int) = {
    val candidates = source.filterNot(_.name == "_id_")
    val (existing, toCreate) = candidates.partition(i => targetNames.contains(i.name))
    (toCreate, existing.size)
  }

  // ---- SET3 apply half: DDL replay -----------------------------------

  /** Render CREATE INDEX DDL for [[indexDiff]]'s toCreate set — the
    * apply half of index sync (copyIndexes, postgresql.go:377-457; the
    * Mongo createIndexes replay, mongodb.go:399-430). Key direction
    * follows the Mongo convention: 1 → ASC, -1 → DESC. Identifiers are
    * double-quoted, so callers pass them in the target engine's stored
    * case. Applied through any JDBC connection (JdbcSpec runs them
    * against embedded Derby). */
  def createIndexDdl(table: String, toCreate: Seq[IndexSpec]): Seq[String] =
    toCreate.map { ix =>
      val unique = if (ix.unique) "UNIQUE " else ""
      val cols = ix.keys.map { case (c, dir) =>
        s""""$c" ${if (dir < 0) "DESC" else "ASC"}""" }.mkString(", ")
      s"""CREATE ${unique}INDEX "${ix.name}" ON "$table" ($cols)"""
    }

  /** PG sequence replay (postgresql.go:344-365): the sequence behind a
    * `nextval('…'::regclass)` column default. */
  def extractSequenceName(defaultVal: String): Option[String] =
    "nextval\\('([^']+)'(?:::regclass)?\\)".r
      .findFirstMatchIn(defaultVal).map(_.group(1))

  /** CREATE statements for the distinct sequences of a table's column
    * defaults (postgresql.go:350-356). */
  def createSequenceDdl(names: Seq[String]): Seq[String] =
    names.distinct.map(n => s"""CREATE SEQUENCE IF NOT EXISTS "$n"""")

  // ---- O6: "since" range bucketing (monitor_handler.go:335-363) ------

  /** Map a UI range token to its since-instant: the fixed buckets the
    * reference accepts (1h…12h, 1d/2d/7d), `None` for empty (= no
    * lower bound), and the reference's 10-hour default for anything
    * unrecognized. */
  def parseRangeToSince(range: String, now: Instant): Option[Instant] =
    range.trim.toLowerCase match {
      case ""    => None
      case "1h"  => Some(now.minus(1, ChronoUnit.HOURS))
      case "2h"  => Some(now.minus(2, ChronoUnit.HOURS))
      case "3h"  => Some(now.minus(3, ChronoUnit.HOURS))
      case "6h"  => Some(now.minus(6, ChronoUnit.HOURS))
      case "12h" => Some(now.minus(12, ChronoUnit.HOURS))
      case "1d"  => Some(now.minus(1, ChronoUnit.DAYS))
      case "2d"  => Some(now.minus(2, ChronoUnit.DAYS))
      case "7d"  => Some(now.minus(7, ChronoUnit.DAYS))
      case _     => Some(now.minus(10, ChronoUnit.HOURS))
    }

  // ---- F14: DSN build/parse (pkg/config connection strings) ----------

  final case class Dsn(scheme: String, user: Option[String], password: Option[String],
      host: String, port: Option[Int], database: Option[String],
      params: Map[String, String] = Map.empty)

  // Parse scheme://[user[:pass]@]host[:port][/db][?k=v&...] — the
  // connection-string shape every reference engine config carries.
  // Returns None when the string has no scheme separator.
  def parseDsn(s: String): Option[Dsn] =
    s.split("://", 2) match {
      case Array(scheme, rest) if scheme.nonEmpty =>
        val (credPart, hostPart) = rest.lastIndexOf('@') match {
          case -1 => (None, rest)
          case i  => (Some(rest.substring(0, i)), rest.substring(i + 1))
        }
        val (user, pass) = credPart match {
          case None => (None, None)
          case Some(c) => c.split(":", 2) match {
            case Array(u)    => (Some(u), None)
            case Array(u, p) => (Some(u), Some(p))
          }
        }
        val (hp, dbq) = hostPart.indexOf('/') match {
          case -1 => (hostPart, "")
          case i  => (hostPart.substring(0, i), hostPart.substring(i + 1))
        }
        val (host, port) = hp.lastIndexOf(':') match {
          case -1 => (hp, None)
          case i  => (hp.substring(0, i), hp.substring(i + 1).toIntOption)
        }
        val (db, query) = dbq.indexOf('?') match {
          case -1 => (if (dbq.isEmpty) None else Some(dbq), "")
          case i  => (if (i == 0) None else Some(dbq.substring(0, i)), dbq.substring(i + 1))
        }
        val params = query.split("&").filter(_.contains("=")).map { kv =>
          val Array(k, v) = kv.split("=", 2); k -> v
        }.toMap
        Some(Dsn(scheme, user, pass, host, port, db, params))
      case _ => None
    }

  /** Rebuild the connection string; parse ∘ build is identity for
    * well-formed DSNs. */
  def buildDsn(d: Dsn): String = {
    val cred = d.user.map(u => u + d.password.map(":" + _).getOrElse("") + "@").getOrElse("")
    val port = d.port.map(":" + _).getOrElse("")
    val db = d.database.map("/" + _).getOrElse("")
    val q = if (d.params.isEmpty) ""
      else "?" + d.params.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString("&")
    s"${d.scheme}://$cred${d.host}$port$db$q"
  }

  // ---- F15: size formatting (executor.go/external_simple.go logs) ----

  /** Human-readable byte size with two decimals, 1024 base — the
    * format the reference's backup logs print (`%.2f MB`). */
  def formatSize(bytes: Long): String = {
    val units = Seq("B", "KB", "MB", "GB", "TB", "PB")
    var v = bytes.toDouble
    var i = 0
    while (v >= 1024.0 && i < units.length - 1) { v /= 1024.0; i += 1 }
    if (i == 0) s"$bytes B" else f"$v%.2f ${units(i)}"
  }
}
