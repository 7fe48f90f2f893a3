package graft

import org.json4s._
import org.json4s.jackson.JsonMethods

/** The reference's OWN documentation examples replayed end to end —
  * the docs/general/builtins rst `cr>` doctest blocks (the reference
  * runs these as its acceptance suite). tools/extract_doctests.py
  * extracts every SELF-CONTAINED example (no fixture tables) with its
  * expected result table into src/test/resources/doctests_builtins
  * .json; this spec runs each statement through Engine.sql (the full
  * Dialect + registry path) and compares the rendered cells.
  *
  * Rendering follows the crash shell the docs were captured with:
  * top-level NULL uppercase, booleans TRUE/FALSE, timestamps/dates as
  * epoch millis (reference timestamps ARE millis longs), arrays and
  * objects JSON-ish with `", "` separators and lowercase null inside.
  * A `...` cell in the docs is a wildcard. Examples that cannot
  * replay are SKIPPED with the reason string below — the skip-list is
  * part of the claim surface (every skip is a documented divergence
  * or a nondeterministic output, not a silent drop). */
class ScalarDocCorpusSpec extends SparkTestBase {

  private val corpusPath = "src/test/resources/doctests_builtins.json"

  /** file:line → reason. Keep reasons one line; the test prints them. */
  private val skip: Map[String, String] = ScalarDocCorpus.skip

  private def render(v: Any): String = v match {
    case null                 => "NULL"
    case s: String            => s
    case b: Boolean           => if (b) "TRUE" else "FALSE"
    case t: java.sql.Timestamp => t.toInstant.toEpochMilli.toString
    case t: java.time.Instant => t.toEpochMilli.toString
    case t: java.time.LocalDateTime =>
      t.toInstant(java.time.ZoneOffset.UTC).toEpochMilli.toString
    case d: java.sql.Date =>
      (d.toLocalDate.toEpochDay * 86400000L).toString
    case d: java.time.LocalDate => (d.toEpochDay * 86400000L).toString
    case d: java.math.BigDecimal => d.toPlainString
    case d: BigDecimal        => d.underlying.toPlainString
    case b: Array[Byte] => // crash renders bytea PG-style: \x<hex>
      "\\x" + b.map(x => f"${x & 0xff}%02x").mkString
    case ci: org.apache.spark.unsafe.types.CalendarInterval =>
      renderInterval(ci.months, ci.days, ci.microseconds)
    case d: java.time.Duration =>
      renderInterval(0, 0, d.toNanos / 1000L)
    case p: java.time.Period =>
      renderInterval(p.getYears * 12 + p.getMonths, p.getDays, 0L)
    case a: scala.collection.Seq[_] =>
      a.map(inner).mkString("[", ", ", "]")
    case a: Array[_]          => a.toSeq.map(inner).mkString("[", ", ", "]")
    case m: scala.collection.Map[_, _] =>
      // crash renders object keys SORTED (json.dumps(sort_keys=True))
      m.toSeq.map { case (k, x) => (String.valueOf(k), x) }.sortBy(_._1)
        .map { case (k, x) => "\"" + k + "\": " + inner(x) }
        .mkString("{", ", ", "}")
    case r: org.apache.spark.sql.Row =>
      r.schema.fieldNames.zip(r.toSeq).sortBy(_._1).map { case (k, x) =>
        "\"" + k + "\": " + inner(x)
      }.mkString("{", ", ", "}")
    case other => other.toString
  }

  /** crate renders intervals PG-style: "1 year 2 mons 3 days 04:05:06",
    * degenerate zero shows just "00:00:00" (docs age() examples). */
  private def renderInterval(months: Int, days0: Int, micros0: Long): String = {
    var days = days0.toLong
    var micros = micros0
    days += micros / 86400000000L
    micros %= 86400000000L
    val years = months / 12
    val mons = months % 12
    val h = micros / 3600000000L
    val m = (micros % 3600000000L) / 60000000L
    val sec = (micros % 60000000L) / 1000000L
    val sb = new StringBuilder
    if (years != 0) sb.append(s"$years year${if (math.abs(years) != 1) "s" else ""} ")
    if (mons != 0) sb.append(s"$mons mon${if (math.abs(mons) != 1) "s" else ""} ")
    if (days != 0) sb.append(s"$days day${if (math.abs(days) != 1) "s" else ""} ")
    sb.append(f"$h%02d:$m%02d:$sec%02d")
    sb.toString
  }

  private def inner(v: Any): String = v match {
    case null      => "null"
    case s: String => "\"" + s + "\""
    case b: Boolean => if (b) "true" else "false"
    case _         => render(v)
  }

  private def cellMatches(expected: String, actual: String): Boolean =
    expected == "..." || expected == actual ||
      // mid-cell `...` wildcards ("CrateDB ...")
      (expected.contains("...") && {
        val rx = expected.split("\\.\\.\\.", -1)
          .map(java.util.regex.Pattern.quote).mkString(".*")
        actual.matches(rx)
      }) ||
      // numeric equivalence: "2.0" vs "2", trailing-zero drift; for
      // non-integer values allow 1e-9 RELATIVE error (the reference's
      // SloppyMath polynomial approximations differ from plain double
      // math in the final ulps — e.g. distance() agrees to 4e-12)
      (try {
        val e = BigDecimal(expected); val a = BigDecimal(actual)
        e == a || (e.scale > 0 && e != 0 &&
          ((a - e).abs / e.abs) < BigDecimal("1e-9"))
      } catch { case _: Exception => false })

  test("builtins doctest corpus replays (reference docs/general/builtins)") {
    graft.functions.GraftFunctions.registerAll(spark)
    val json = JsonMethods.parse(
      new java.io.File(corpusPath).toURI.toURL.openStream())
    val cases = (json: @unchecked) match {
      case JArray(items) => items.map { it =>
        def s(f: String) = (it \ f).asInstanceOf[JString].s
        val line = (it \ "line").asInstanceOf[JInt].num.toInt
        val cols = (it \ "cols").asInstanceOf[JArray].arr
          .map(_.asInstanceOf[JString].s)
        val rows = (it \ "rows").asInstanceOf[JArray].arr.map(r =>
          r.asInstanceOf[JArray].arr.map(_.asInstanceOf[JString].s))
        ScalarDocCorpus.Case(s("file"), line, s("sql"), cols, rows)
      }
    }
    assert(cases.nonEmpty, s"empty corpus at $corpusPath")

    var ran = 0
    var skipped = 0
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    for (c <- cases) {
      val key = s"${c.file}:${c.line}"
      if (skip.contains(key)) skipped += 1
      else {
        ran += 1
        try {
          val df = Engine.sql(spark, c.sql)
          val gotCols = df.columns.toList
          val got = df.collect().toList.map(r =>
            r.toSeq.map(render).toList)
          val colsOk = gotCols.map(_.toLowerCase) ==
            c.cols.map(_.toLowerCase)
          val rowsOk = got.length == c.rows.length &&
            got.zip(c.rows).forall { case (g, e) =>
              g.length == e.length &&
                g.zip(e).forall { case (a, x) => cellMatches(x, a) }
            }
          if (!colsOk || !rowsOk)
            failures += s"$key: ${c.sql.take(90)}\n  expected ${c.cols} ${c.rows}\n  got      $gotCols $got"
        } catch {
          case e: Exception =>
            failures += s"$key: ${c.sql.take(90)}\n  threw ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).takeWhile(_ != '\n').take(160)}"
        }
      }
    }
    info(s"doctest corpus: $ran replayed, $skipped skipped (documented), ${failures.length} failed")
    assert(failures.isEmpty,
      s"${failures.length} doctest mismatches:\n" + failures.mkString("\n"))
  }
}

/** Skip-list lives in an object so the count is greppable/claimable. */
object ScalarDocCorpus {
  final case class Case(file: String, line: Int, sql: String,
                        cols: List[String], rows: List[List[String]])
  val skip: Map[String, String] = Map(
    "scalar-functions.rst:1588" ->
      ("date_format %D (ordinal day suffix) is not expressible in the " +
        "codegen'd java-pattern path; PG to_char's DDth covers ordinals"),
    "scalar-functions.rst:4233" ->
      "built-in superuser is the PROCESS user, not literally 'crate' (RolesDocCorpusSpec adaptation)",
    "scalar-functions.rst:4257" ->
      "built-in superuser is the process user (current_role)",
    "scalar-functions.rst:4280" ->
      "built-in superuser is the process user (user)",
    "scalar-functions.rst:4305" ->
      "built-in superuser is the process user (session_user)",
    "scalar-functions.rst:4749" ->
      ("the doc pins the reference's internal OidHash value for 'crate'; " +
        "our oid scheme hashes differently (joins stay consistent)"),
    "scalar-functions.rst:4856" ->
      ("pg_get_function_result renders signature return types from the " +
        "reference's typed registry; Spark's FunctionRegistry is untyped " +
        "(documented NULL shim)"),
    "arithmetic.rst:50" ->
      ("numeric literal/division typing: crate int/int is integer division " +
        "and float literals are DOUBLE; Spark divides to fractional and " +
        "types 2.0 as DECIMAL — documented divergence, needs an " +
        "analyzer-rule approach (round-16 candidate)"),
    "bit-operators.rst:32" ->
      "xor over BIT-string values (BIT is the q251-gated fringe type); integer # works",
    "table-functions.rst:407" ->
      ("table function in SELECT position with a single alias wraps the " +
        "row RECORD; the FROM-position form (next example) is supported")
  )
}
