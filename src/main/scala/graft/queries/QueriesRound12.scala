package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-12 catalog (q253-): the reference INTERVAL string grammar
  * (io.crate.interval.IntervalParser cascade — numeric-seconds /
  * ISO-8601 / SQL-standard / PG-verbose), modeled by
  * plans.IntervalExpressions and routed from `'…'::interval`.
  *
  * q253 drives one literal arm per format leg over documents.doc_id
  * (the q236/q244 golden-arm pattern): the normalized
  * (months, days, micros) triple AND timestamp arithmetic with the
  * parsed value, all re-derived by DuckDB from closed-form constants
  * and its own interval arithmetic — no parser shared. */
object QueriesRound12 {

  /** One vector per grammar leg; components below are the reference's
    * own expected values (IntervalParserTest). */
  private val ivArms: Seq[String] = Seq(
    "120-1 1 15:30",                         // SQL standard, full
    "@ 1 year -23 hours -3 mins -3.30 secs", // PG verbose, mixed signs
    "6 years 5 mons 4 days 03:02:01",        // PG compact
    "1 week",                                // unit fold (week → days)
    "P1Y2M3DT4H5M6S",                        // ISO-8601
    "-15:30",                                // SQL standard, negative H:M
    "42.5")                                  // bare numeric = seconds

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q253_interval_parse" -> ((s, dir) => {
      graft.functions.GraftFunctions.registerAll(s)
      val docs = graft.Tables.load(s, dir, "documents").select(col("doc_id"))
      val inp = element_at(array(ivArms.map(lit): _*),
        (col("doc_id") % 7 + 1).cast("int"))
      docs
        .withColumn("p", call_function("graft_interval_parts", inp))
        .withColumn("t",
          lit(java.sql.Timestamp.valueOf("2000-01-01 00:00:00")) +
            call_function("graft_interval", inp))
        .select((col("doc_id") % 7).cast("int").as("arm"),
          col("p.months").as("months"), col("p.days").as("days"),
          col("p.micros").as("micros"),
          date_format(col("t"), "yyyy-MM-dd HH:mm:ss.SSS").as("t_plus"),
          call_function("graft_interval_format", inp).as("fmt"))
        .groupBy(col("arm"), col("months"), col("days"), col("micros"),
          col("t_plus"), col("fmt"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("arm"))
    }),

    // The reference's TEXT-cast semantics (StringTypeTest /
    // CharacterTypeTest), hash-gated: PG boolean rendering ('t'/'f'),
    // varchar(n) explicit-cast truncation (Spark's own VARCHAR cast
    // ERRORS on overflow), char(n) truncate+blank-pad. One arm per
    // vector over documents.doc_id; the oracle replays the golden
    // strings (DuckDB renders booleans 'true'/'false', so the goldens
    // pin the DIVERGENCE from stock engines, which is the point).
    "q254_text_casts" -> ((s, dir) => {
      graft.functions.GraftFunctions.registerAll(s)
      graft.Tables.registerAll(s, dir)
      graft.Engine.sql(s,
        """SELECT CAST(doc_id % 4 AS INT) AS arm,
          |       (doc_id % 2 = 0)::text AS b_text,
          |       (doc_id % 4)::varchar(1) AS v1,
          |       ('w' || (doc_id % 4))::char(4) AS c4,
          |       (doc_id % 2 = 0)::char(1) AS bc
          |FROM documents""".stripMargin)
        .groupBy(col("arm"), col("b_text"), col("v1"), col("c4"), col("bc"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("arm"))
    })
  )

  val oracles: Map[String, String] = Map(
    // the expected components are the reference test suite's own
    // numbers; DuckDB re-derives the timestamp arithmetic with its
    // native to_months/to_days/to_microseconds — months first, then
    // days, then micros, the same order Spark applies CalendarInterval.
    // `fmt` goldens follow the reference PERIOD_FORMATTER (data-types
    // .rst pins arms 2/4-style renderings; arms 1/5 pin the per-field
    // signed printing of mixed/negative values)
    "q253_interval_parse" ->
      """WITH d AS (SELECT CAST(doc_id % 7 AS INT) AS arm FROM documents),
        |g(arm, months, days, micros, fmt) AS (VALUES
        |  (0, 1441, 1, 55800000000, '120 years 1 mon 1 day 15:30:00'),
        |  (1, 12, 0, -82983300000, '1 year -23:-03:-03.300'),
        |  (2, 77, 4, 10921000000, '6 years 5 mons 4 days 03:02:01'),
        |  (3, 0, 7, 0, '7 days 00:00:00'),
        |  (4, 14, 3, 14706000000, '1 year 2 mons 3 days 04:05:06'),
        |  (5, 0, 0, -55800000000, '-15:-30:00'),
        |  (6, 0, 0, 42500000, '00:00:42.500')),
        |w AS (
        |  SELECT arm, CAST(months AS INT) AS months, CAST(days AS INT) AS days,
        |         CAST(micros AS BIGINT) AS micros, fmt,
        |         strftime(TIMESTAMP '2000-01-01 00:00:00'
        |                  + to_months(CAST(months AS INT))
        |                  + to_days(CAST(days AS INT))
        |                  + to_microseconds(CAST(micros AS BIGINT)),
        |                  '%Y-%m-%d %H:%M:%S.%g') AS t_plus
        |  FROM g)
        |SELECT d.arm, w.months, w.days, w.micros, w.t_plus, w.fmt, count(*) AS n
        |FROM d JOIN w ON d.arm = w.arm
        |GROUP BY d.arm, w.months, w.days, w.micros, w.t_plus, w.fmt
        |ORDER BY d.arm""".stripMargin,

    // golden replay: arm = doc_id % 4; b_text/bc pin the PG boolean
    // rendering, v1 the varchar(1) truncation, c4 the char(4) pad
    "q254_text_casts" ->
      """WITH d AS (SELECT CAST(doc_id % 4 AS INT) AS arm FROM documents),
        |g(arm, b_text, v1, c4, bc) AS (VALUES
        |  (0, 't', '0', 'w0  ', 't'),
        |  (1, 'f', '1', 'w1  ', 'f'),
        |  (2, 't', '2', 'w2  ', 't'),
        |  (3, 'f', '3', 'w3  ', 'f'))
        |SELECT d.arm, g.b_text, g.v1, g.c4, g.bc, count(*) AS n
        |FROM d JOIN g ON d.arm = g.arm
        |GROUP BY d.arm, g.b_text, g.v1, g.c4, g.bc
        |ORDER BY d.arm""".stripMargin
  )
}
