package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 catalog (q255-): the round's ADVICE/verdict semantics,
  * driver-gated.
  *
  *  - q255: the reference's interval ORDERING (io.crate.types
  *    .IntervalType.compare → toStandardDuration: 30-day months,
  *    365-DAY years — the code's formula, not the javadoc's 12-month
  *    line (IntervalType.java:183) — exact integer arithmetic) over
  *    per-row derived
  *    interval strings with MIXED-SIGN day/time parts — so the joda
  *    normalizedStandard fold (days into the time total before the
  *    re-split; ADVICE r12's normalization fix) is hash-gated per row,
  *    and the global rank certifies the total order the key defines.
  *    DuckDB re-derives components, fold, key, and rank arithmetically
  *    (HUGEINT) — no parser shared.
  *  - q256: the reference's IP rendering (Guava toAddrString = RFC 5952
  *    compressed IPv6, strict IPv4; ADVICE r12's cast fixes) as golden
  *    arms replayed by DuckDB VALUES.
  */
object QueriesRound13 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q255_interval_order" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      graft.functions.GraftFunctions.registerAll(s)
      val k = col("c_custkey")
      val base = graft.Tables.load(s, dir, "customer")
        .select(k,
          (k % 5).cast("int").as("y"),
          ((k * 3) % 17).cast("int").as("mo"),
          ((k * 7) % 40).cast("int").as("d"),
          ((k * 11) % 30).cast("int").as("h"),
          ((k * 13) % 60).cast("int").as("mi"),
          ((k * 17) % 60).cast("int").as("sec"),
          // every other row negates the TIME group → the mixed-sign
          // day/time fold is exercised on half the rows
          when(k % 2 === 0, lit(1)).otherwise(lit(-1)).as("tsign"))
      val ivStr = format_string("%d years %d mons %d days %s%02d:%02d:%02d",
        col("y"), col("mo"), col("d"),
        when(col("tsign") < 0, lit("-")).otherwise(lit("")),
        col("h"), col("mi"), col("sec"))
      val withIv = base.withColumn("iv", ivStr)
        .withColumn("p", call_function("graft_interval_parts", col("iv")))
        .withColumn("okey_dec",
          call_function("graft_interval_order", col("iv")))
      // the global row_number is correctness plumbing (it pins the total
      // order the key defines); a 100 TB sort would ORDER BY okey via
      // Spark's native range partitioning, which is what this certifies
      withIv.select(col("c_custkey"),
          col("p.months").as("months"),
          col("p.days").as("days"),
          col("p.micros").as("micros"),
          col("okey_dec").cast("string").as("okey"),
          row_number().over(Window.orderBy(col("okey_dec"), col("c_custkey")))
            .as("rnk"))
        .orderBy(col("c_custkey"))
    }),

    // The reference's interval arithmetic (IntervalArithmeticFunctions
    // / SubtractTimestampScalar), per-row over derived operands:
    // ± is FIELD-WISE (joda Period::plus — '20h'+'20h' stays 40:00:00),
    // × is per-field multiply THEN normalizedStandard (micros scale
    // linearly, so the fold replays as total-micros arithmetic), and
    // ts−ts is a pure days+time duration. DuckDB re-derives every
    // component from the same modular forms — no parser, no shared
    // code. All products/sums stay far inside int ranges by
    // construction (the overflow edges are spec-gated).
    "q257_interval_arith" -> ((s, dir) => {
      graft.functions.GraftFunctions.registerAll(s)
      val k = col("c_custkey")
      val base = graft.Tables.load(s, dir, "customer")
        .select(k,
          (k % 4).cast("int").as("y1"), ((k * 3) % 14).cast("int").as("mo1"),
          ((k * 7) % 28).cast("int").as("d1"),
          ((k * 11) % 24).cast("int").as("h1"),
          ((k * 13) % 60).cast("int").as("mi1"),
          ((k * 5) % 11).cast("int").as("mo2"),
          ((k * 17) % 20).cast("int").as("d2"),
          ((k * 19) % 24).cast("int").as("h2"),
          ((k * 23) % 60).cast("int").as("se2"),
          ((k % 7) - 3).cast("int").as("fac"))
      val ivA = format_string("%d years %d mons %d days %02d:%02d:00",
        col("y1"), col("mo1"), col("d1"), col("h1"), col("mi1"))
      val ivB = format_string("%d mons %d days %02d:00:%02d",
        col("mo2"), col("d2"), col("h2"), col("se2"))
      val withOps = base
        .withColumn("a", call_function("graft_interval", ivA))
        .withColumn("b", call_function("graft_interval", ivB))
        .withColumn("sum_p", call_function("graft_interval_parts",
          call_function("graft_interval_add", col("a"), col("b"))))
        .withColumn("dif_p", call_function("graft_interval_parts",
          call_function("graft_interval_sub", col("a"), col("b"))))
        .withColumn("mul_p", call_function("graft_interval_parts",
          call_function("graft_interval_mul", col("b"), col("fac"))))
        .withColumn("tsd_p", call_function("graft_interval_parts",
          call_function("graft_ts_diff",
            timestamp_millis(k * 7919123L), timestamp_millis(k * 13L))))
      withOps.select(col("c_custkey"),
          col("sum_p.months").as("s_months"), col("sum_p.days").as("s_days"),
          col("sum_p.micros").as("s_micros"),
          col("dif_p.months").as("d_months"), col("dif_p.days").as("d_days"),
          col("dif_p.micros").as("d_micros"),
          col("mul_p.months").as("m_months"), col("mul_p.days").as("m_days"),
          col("mul_p.micros").as("m_micros"),
          col("tsd_p.days").as("t_days"), col("tsd_p.micros").as("t_micros"))
        .orderBy(col("c_custkey"))
    }),

    // Interval PERCENTILE (reference PercentileAggregation's interval
    // overload: values → standard-duration total, percentile, back via
    // Period(millis).normalizedStandard): composed from existing
    // Spark-native pieces — graft_interval_order (the standard-duration
    // key), exact `percentile`, graft_interval_from_micros (the fold
    // back) — so the aggregation itself is Spark's codegen'd percentile
    // over a numeric column: partial-aggregates merge map-side, nothing
    // about the interval wrapper adds shuffle. Exact interpolation
    // where the reference's TDigest approximates (the q37 discipline,
    // divergence documented in IntervalArithmeticConformanceSpec); all
    // derived durations are whole even micros, so p50 midpoints stay
    // integral and double-exact for both engines.
    "q258_interval_percentile" -> ((s, dir) => {
      graft.functions.GraftFunctions.registerAll(s)
      val k = col("c_custkey")
      val base = graft.Tables.load(s, dir, "customer")
        .select(col("c_nationkey"), k,
          (k % 15).cast("int").as("dd"),
          ((k * 17) % 86400).cast("long").as("sec"))
        .withColumn("iv", format_string("%d days %d seconds",
          col("dd"), col("sec")))
        .withColumn("key",
          call_function("graft_interval_order", col("iv")).cast("double"))
      base.groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n"),
          expr("percentile(key, 0.5)").as("q50"),
          expr("percentile(key, 1.0)").as("q100"))
        .select(col("c_nationkey"), col("n"),
          call_function("graft_interval_parts",
            call_function("graft_interval_from_micros", col("q50")))
            .as("p50"),
          call_function("graft_interval_parts",
            call_function("graft_interval_from_micros", col("q100")))
            .as("p100"))
        .select(col("c_nationkey"), col("n"),
          col("p50.days").as("p50_days"), col("p50.micros").as("p50_micros"),
          col("p100.days").as("p100_days"),
          col("p100.micros").as("p100_micros"))
        .orderBy(col("c_nationkey"))
    }),

    // The reference's CIDR containment operator `<<`
    // (CIDROperator.containedWithin), driver-gated through the SQL
    // spelling the Dialect now rewrites: IPv4 and IPv6 arms, masked
    // cidr addresses (the address need not be the network base),
    // non-byte-aligned prefixes, and a mixed-family probe. Golden
    // replay — DuckDB re-derives each verdict from VALUES.
    "q259_cidr_op" -> ((s, dir) => {
      graft.functions.GraftFunctions.registerAll(s)
      graft.Tables.registerAll(s, dir)
      graft.Engine.sql(s,
        """SELECT CAST(doc_id % 8 AS INT) AS arm,
          |       (CASE CAST(doc_id % 8 AS INT)
          |          WHEN 0 THEN '192.168.0.0'   << '192.168.0.1/24'
          |          WHEN 1 THEN '192.168.0.255' << '192.168.0.1/24'
          |          WHEN 2 THEN '192.168.1.0'   << '192.168.0.1/24'
          |          WHEN 3 THEN '2001:db8::c7'  << '2001:db8::1/120'
          |          WHEN 4 THEN '2001:db8::1:0' << '2001:db8::1/120'
          |          WHEN 5 THEN '192.168.0.63'  << '192.168.0.0/26'
          |          WHEN 6 THEN '192.168.0.64'  << '192.168.0.0/26'
          |          ELSE '192.168.0.1' << '2001:db8::1/120' END) AS contained
          |FROM documents""".stripMargin)
        .groupBy(col("arm"), col("contained"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("arm"))
    }),

    // The reference's IP total order (IpType.compare =
    // Arrays.compareUnsigned over parsed address bytes) across a MIXED
    // IPv4/IPv6 column: v4 values interleave with v6 by leading bytes
    // ('::1' < '0.0.0.1' < mapped '1.2.3.4' < '9.x' < '10.x' <
    // '2001:db8::1' < '192.168.x' < 'ff02::1'). The golden ranks are
    // hand-derived from the byte arrays; DuckDB replays them as VALUES.
    "q260_ip_sort" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      graft.functions.GraftFunctions.registerAll(s)
      val arms = Seq("::1", "9.0.0.1", "10.0.0.1", "192.168.0.1",
        "2001:db8::1", "::ffff:1.2.3.4", "ff02::1", "0.0.0.1")
      val docs = graft.Tables.load(s, dir, "documents")
        .select((col("doc_id") % 8).cast("int").as("arm"))
      val withIp = docs.groupBy(col("arm")).agg(count(lit(1)).as("n"))
        .withColumn("ip", element_at(array(arms.map(lit): _*),
          col("arm") + 1))
      withIp.select(col("arm"), col("ip"), col("n"),
          row_number().over(
            Window.orderBy(call_function("graft_ip_sortkey", col("ip"))))
            .as("rk"))
        .orderBy(col("arm"))
    }),

    // The reference's TIMESTAMP cast (TimestampType.implicitCast +
    // TIMESTAMP_PARSER), driver-gated through the Dialect's rewritten
    // `::timestamp`/`::timestamptz`: bare-integer strings are epoch
    // MILLIS, doubles are seconds, offsets apply under timestamptz and
    // are IGNORED under timestamp, sub-milli fraction digits truncate.
    // Golden replay via DuckDB VALUES.
    "q261_ts_cast" -> ((s, dir) => {
      graft.functions.GraftFunctions.registerAll(s)
      graft.Tables.registerAll(s, dir)
      graft.Engine.sql(s,
        """SELECT CAST(doc_id % 7 AS INT) AS arm,
          |       CAST(CASE CAST(doc_id % 7 AS INT)
          |          WHEN 0 THEN '86400000'::timestamp
          |          WHEN 1 THEN 86400000::timestamp
          |          WHEN 2 THEN 1.5::timestamp
          |          WHEN 3 THEN '1999-01-08T04:00:00+03:00'::timestamptz
          |          WHEN 4 THEN '1999-01-08T04:00:00+03:00'::timestamp
          |          WHEN 5 THEN '2021-01-13 14:37:17.25988'::timestamp
          |          ELSE '1999-01-08'::timestamp END AS STRING) AS ts_str
          |FROM documents""".stripMargin)
        .groupBy(col("arm"), col("ts_str"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("arm"))
    }),

    // The reference's BOOLEAN and DATE casts (BooleanType/DateType
    // implicitCast), driver-gated via the Dialect's rewritten
    // `::boolean`/`::date`: on/off in the boolean map, numbers true iff
    // STRICTLY positive (-1 is false), grammar-first dates with the
    // epoch-millis fallback and truncation to the day. Golden replay.
    "q262_bool_date_cast" -> ((s, dir) => {
      graft.functions.GraftFunctions.registerAll(s)
      graft.Tables.registerAll(s, dir)
      graft.Engine.sql(s,
        """SELECT CAST(doc_id % 6 AS INT) AS arm,
          |       (CASE CAST(doc_id % 6 AS INT)
          |          WHEN 0 THEN 'on'::boolean
          |          WHEN 1 THEN 'OFF'::boolean
          |          WHEN 2 THEN (0 - 1)::boolean
          |          WHEN 3 THEN 2::boolean
          |          WHEN 4 THEN 'yes'::boolean
          |          ELSE '0'::boolean END) AS b,
          |       CAST(CASE CAST(doc_id % 6 AS INT)
          |          WHEN 0 THEN '1999-01-08T04:00:00'::date
          |          WHEN 1 THEN '86400000'::date
          |          WHEN 2 THEN 86400000::date
          |          WHEN 3 THEN 86400.5::date
          |          WHEN 4 THEN '2021-01-13'::date
          |          ELSE '1969-12-31T23:59:59.999'::date END AS STRING) AS d
          |FROM documents""".stripMargin)
        .groupBy(col("arm"), col("b"), col("d"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("arm"))
    }),

    // The reference's substr/substring (SubstrFunction.java):
    // CLAMP semantics — begin ≤ 1 clamps to the string start (NOT
    // Spark's from-the-end negatives), '' past the end, the length
    // window counted from the clamped start — plus the (string,string)
    // REGEX-EXTRACT overload incl. the FROM-pattern sugar. Golden
    // replay (DuckDB's own substr has PG window semantics, so goldens,
    // not shared evaluation).
    "q263_substr" -> ((s, dir) => {
      graft.functions.GraftFunctions.registerAll(s)
      graft.Tables.registerAll(s, dir)
      graft.Engine.sql(s,
        """SELECT CAST(doc_id % 7 AS INT) AS arm,
          |       (CASE CAST(doc_id % 7 AS INT)
          |          WHEN 0 THEN substr('cratedata', 6, 2)
          |          WHEN 1 THEN substr('hello', 0 - 3)
          |          WHEN 2 THEN substr('hello', 0 - 2, 4)
          |          WHEN 3 THEN substr('hello', 6)
          |          WHEN 4 THEN substring('foobar' FROM 'o.b')
          |          WHEN 5 THEN substring('foobar', '(.)oo([a-z])')
          |          ELSE coalesce(substring('foobar', 'nomatch'), '<null>')
          |        END) AS v
          |FROM documents""".stripMargin)
        .groupBy(col("arm"), col("v"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("arm"))
    }),

    // The reference's null-SKIPPING concat() with strict-null `||`
    // (ConcatFunction.java GenericConcatFunction vs the operator
    // branch) and the boolean→text implicit cast inside. Golden replay.
    "q264_concat_nulls" -> ((s, dir) => {
      graft.functions.GraftFunctions.registerAll(s)
      graft.Tables.registerAll(s, dir)
      graft.Engine.sql(s,
        """SELECT CAST(doc_id % 5 AS INT) AS arm,
          |       (CASE CAST(doc_id % 5 AS INT)
          |          WHEN 0 THEN concat(CAST(NULL AS STRING), 'x')
          |          WHEN 1 THEN concat('a', CAST(NULL AS STRING), 'b')
          |          WHEN 2 THEN concat(CAST(NULL AS STRING),
          |                             CAST(NULL AS STRING))
          |          WHEN 3 THEN coalesce('a' || CAST(NULL AS STRING),
          |                               '<null>')
          |          ELSE concat('v=', doc_id >= 0) END) AS v
          |FROM documents""".stripMargin)
        .groupBy(col("arm"), col("v"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("arm"))
    }),

    // The reference's math-function edges (arithmetic/ package):
    // base-10 log with value-first two-arg form, loud domains, and
    // Math.round's ties-toward-+INF on float/double with integral
    // returns (round(-2.5) = -2 where HALF_UP says -3). Golden replay.
    "q265_math_edges" -> ((s, dir) => {
      graft.functions.GraftFunctions.registerAll(s)
      graft.Tables.registerAll(s, dir)
      graft.Engine.sql(s,
        """SELECT CAST(doc_id % 6 AS INT) AS arm,
          |       (CASE CAST(doc_id % 6 AS INT)
          |          WHEN 0 THEN log(100)
          |          WHEN 1 THEN log(8.0, 2.0)
          |          WHEN 2 THEN ln(1.0)
          |          WHEN 3 THEN CAST(round(CAST(0.0 - 2.5 AS DOUBLE))
          |                           AS DOUBLE)
          |          WHEN 4 THEN CAST(round(CAST(2.5 AS DOUBLE)) AS DOUBLE)
          |          ELSE sqrt(16) END) AS v
          |FROM documents""".stripMargin)
        .groupBy(col("arm"), col("v"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("arm"))
    }),

    "q256_ip_render" -> ((s, dir) => {
      graft.functions.GraftFunctions.registerAll(s)
      graft.Tables.registerAll(s, dir)
      graft.Engine.sql(s,
        """SELECT CAST(doc_id % 6 AS INT) AS arm,
          |       (CASE CAST(doc_id % 6 AS INT)
          |          WHEN 0 THEN '0:0:0:0:0:0:0:1'
          |          WHEN 1 THEN '2001:0DB8:0:0:0:0:0:1'
          |          WHEN 2 THEN '2001:0:0:1:0:0:0:1'
          |          WHEN 3 THEN '2001:db8:0:0:1:0:0:1'
          |          WHEN 4 THEN '::ffff:10.1.2.3'
          |          ELSE '255.255.255.255' END)::ip AS ip_norm
          |FROM documents""".stripMargin)
        .groupBy(col("arm"), col("ip_norm"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("arm"))
    })
  )

  val oracles: Map[String, String] = Map(

    // full arithmetic replay: components from the same modular forms,
    // the normalizedStandard fold (days into the signed time total,
    // re-split truncating toward zero), the toStandardDuration key
    // (365-DAY years + 30-day months — the reference code's formula,
    // IntervalType.java:183; ADVICE r13 high — over the re-derived
    // normalized split y=m//12, m%12) in HUGEINT rendered as text, and
    // the (key, custkey) rank
    "q255_interval_order" ->
      """WITH b AS (
        |  SELECT c_custkey,
        |         CAST(c_custkey % 5 AS BIGINT) AS y,
        |         CAST((c_custkey * 3) % 17 AS BIGINT) AS mo,
        |         CAST((c_custkey * 7) % 40 AS BIGINT) AS d,
        |         CAST((c_custkey * 11) % 30 AS BIGINT) AS h,
        |         CAST((c_custkey * 13) % 60 AS BIGINT) AS mi,
        |         CAST((c_custkey * 17) % 60 AS BIGINT) AS sec,
        |         CASE WHEN c_custkey % 2 = 0 THEN 1 ELSE -1 END AS tsign
        |  FROM customer),
        |t AS (
        |  SELECT c_custkey, y, mo, d,
        |         d * 86400000000 + tsign * (h * 3600 + mi * 60 + sec)
        |           * 1000000 AS total
        |  FROM b),
        |n AS (
        |  SELECT c_custkey, y, mo, total,
        |         CASE WHEN total >= 0 THEN total // 86400000000
        |              ELSE -((-total) // 86400000000) END AS days
        |  FROM t),
        |f AS (
        |  SELECT c_custkey,
        |         CAST(y * 12 + mo AS INT) AS months,
        |         CAST(days AS INT) AS days,
        |         total - days * 86400000000 AS micros,
        |         CAST(CAST((y * 12 + mo) // 12 AS HUGEINT) * 31536000000000
        |              + CAST((y * 12 + mo) % 12 AS HUGEINT) * 2592000000000
        |              + CAST(days AS HUGEINT) * 86400000000
        |              + (total - days * 86400000000) AS VARCHAR) AS okey,
        |         CAST((y * 12 + mo) // 12 AS HUGEINT) * 31536000000000
        |           + CAST((y * 12 + mo) % 12 AS HUGEINT) * 2592000000000
        |           + CAST(days AS HUGEINT) * 86400000000
        |           + (total - days * 86400000000) AS okey_num
        |  FROM n)
        |SELECT c_custkey, months, days, micros, okey,
        |       row_number() OVER (ORDER BY okey_num, c_custkey) AS rnk
        |FROM f ORDER BY c_custkey""".stripMargin,

    // component-wise replay of the arithmetic: ± stays field-wise (no
    // fold — that is the POINT of the joda Period::plus semantics), ×
    // scales months and the (days, micros) total linearly then re-folds
    // truncating toward zero, ts−ts folds the millis difference
    "q257_interval_arith" ->
      """WITH b AS (
        |  SELECT c_custkey,
        |         CAST(c_custkey % 4 AS BIGINT) AS y1,
        |         CAST((c_custkey * 3) % 14 AS BIGINT) AS mo1,
        |         CAST((c_custkey * 7) % 28 AS BIGINT) AS d1,
        |         CAST((c_custkey * 11) % 24 AS BIGINT) AS h1,
        |         CAST((c_custkey * 13) % 60 AS BIGINT) AS mi1,
        |         CAST((c_custkey * 5) % 11 AS BIGINT) AS mo2,
        |         CAST((c_custkey * 17) % 20 AS BIGINT) AS d2,
        |         CAST((c_custkey * 19) % 24 AS BIGINT) AS h2,
        |         CAST((c_custkey * 23) % 60 AS BIGINT) AS se2,
        |         CAST(c_custkey % 7 AS BIGINT) - 3 AS fac
        |  FROM customer),
        |c AS (
        |  SELECT c_custkey, fac,
        |         y1 * 12 + mo1 AS am, d1 AS ad,
        |         (h1 * 3600 + mi1 * 60) * 1000000 AS aus,
        |         mo2 AS bm, d2 AS bd,
        |         (h2 * 3600 + se2) * 1000000 AS bus,
        |         (c_custkey * 7919123 - c_custkey * 13) * 1000 AS tus
        |  FROM b),
        |m AS (
        |  SELECT c_custkey, am, ad, aus, bm, bd, bus, fac, tus,
        |         bd * fac * 86400000000 + bus * fac AS mtotal
        |  FROM c),
        |f AS (
        |  SELECT c_custkey, am, ad, aus, bm, bd, bus, fac, tus, mtotal,
        |         CASE WHEN mtotal >= 0 THEN mtotal // 86400000000
        |              ELSE -((-mtotal) // 86400000000) END AS mdays,
        |         tus // 86400000000 AS tdays
        |  FROM m)
        |SELECT c_custkey,
        |       CAST(am + bm AS INT) AS s_months,
        |       CAST(ad + bd AS INT) AS s_days,
        |       aus + bus AS s_micros,
        |       CAST(am - bm AS INT) AS d_months,
        |       CAST(ad - bd AS INT) AS d_days,
        |       aus - bus AS d_micros,
        |       CAST(bm * fac AS INT) AS m_months,
        |       CAST(mdays AS INT) AS m_days,
        |       mtotal - mdays * 86400000000 AS m_micros,
        |       CAST(tdays AS INT) AS t_days,
        |       tus - tdays * 86400000000 AS t_micros
        |FROM f ORDER BY c_custkey""".stripMargin,

    // exact-interpolation replay: quantile_cont over the identical
    // standard-duration key, folded back with // and % — every derived
    // duration is whole even micros, so the p50 midpoint is integral
    // and double-exact in both engines
    "q258_interval_percentile" ->
      """WITH b AS (
        |  SELECT c_nationkey,
        |         CAST(c_custkey % 15 AS BIGINT) * 86400000000
        |           + CAST((c_custkey * 17) % 86400 AS BIGINT) * 1000000
        |           AS key
        |  FROM customer),
        |q AS (
        |  SELECT c_nationkey, count(*) AS n,
        |         CAST(quantile_cont(key, 0.5) AS BIGINT) AS q50,
        |         CAST(quantile_cont(key, 1.0) AS BIGINT) AS q100
        |  FROM b GROUP BY c_nationkey)
        |SELECT c_nationkey, n,
        |       CAST(q50 // 86400000000 AS INT) AS p50_days,
        |       q50 % 86400000000 AS p50_micros,
        |       CAST(q100 // 86400000000 AS INT) AS p100_days,
        |       q100 % 86400000000 AS p100_micros
        |FROM q ORDER BY c_nationkey""".stripMargin,

    // golden replay of the math-edge verdicts (arm 3 pins Math.round's
    // -2.5 → -2, the divergence from HALF_UP)
    "q265_math_edges" ->
      """WITH d AS (SELECT CAST(doc_id % 6 AS INT) AS arm FROM documents),
        |g(arm, v) AS (VALUES
        |  (0, 2.0), (1, 3.0), (2, 0.0), (3, -2.0), (4, 3.0), (5, 4.0))
        |SELECT d.arm, CAST(g.v AS DOUBLE) AS v, count(*) AS n
        |FROM d JOIN g ON d.arm = g.arm
        |GROUP BY d.arm, g.v
        |ORDER BY d.arm""".stripMargin,

    // golden replay of the concat verdicts (arm 4 pins the reference's
    // boolean→text 't', which DuckDB's own concat would render 'true')
    "q264_concat_nulls" ->
      """WITH d AS (SELECT CAST(doc_id % 5 AS INT) AS arm FROM documents),
        |g(arm, v) AS (VALUES
        |  (0, 'x'), (1, 'ab'), (2, ''), (3, '<null>'), (4, 'v=t'))
        |SELECT d.arm, g.v, count(*) AS n
        |FROM d JOIN g ON d.arm = g.arm
        |GROUP BY d.arm, g.v
        |ORDER BY d.arm""".stripMargin,

    // golden replay of the reference-substr verdicts
    "q263_substr" ->
      """WITH d AS (SELECT CAST(doc_id % 7 AS INT) AS arm FROM documents),
        |g(arm, v) AS (VALUES
        |  (0, 'da'), (1, 'hello'), (2, 'hell'), (3, ''),
        |  (4, 'oob'), (5, 'f'), (6, '<null>'))
        |SELECT d.arm, g.v, count(*) AS n
        |FROM d JOIN g ON d.arm = g.arm
        |GROUP BY d.arm, g.v
        |ORDER BY d.arm""".stripMargin,

    // golden replay of the bool/date verdicts (arm 5's date: a DATE
    // STRING parses through the grammar → its calendar date 1969-12-31,
    // NOT the truncation quirk, which applies only to numeric inputs)
    "q262_bool_date_cast" ->
      """WITH dd AS (SELECT CAST(doc_id % 6 AS INT) AS arm FROM documents),
        |g(arm, b, d) AS (VALUES
        |  (0, TRUE,  '1999-01-08'),
        |  (1, FALSE, '1970-01-02'),
        |  (2, FALSE, '1970-01-02'),
        |  (3, TRUE,  '1970-01-02'),
        |  (4, TRUE,  '2021-01-13'),
        |  (5, FALSE, '1969-12-31'))
        |SELECT dd.arm, g.b, g.d, count(*) AS n
        |FROM dd JOIN g ON dd.arm = g.arm
        |GROUP BY dd.arm, g.b, g.d
        |ORDER BY dd.arm""".stripMargin,

    // golden replay of the reference-cast renderings
    "q261_ts_cast" ->
      """WITH d AS (SELECT CAST(doc_id % 7 AS INT) AS arm FROM documents),
        |g(arm, ts_str) AS (VALUES
        |  (0, '1970-01-02 00:00:00'),
        |  (1, '1970-01-02 00:00:00'),
        |  (2, '1970-01-01 00:00:01.5'),
        |  (3, '1999-01-08 01:00:00'),
        |  (4, '1999-01-08 04:00:00'),
        |  (5, '2021-01-13 14:37:17.259'),
        |  (6, '1999-01-08 00:00:00'))
        |SELECT d.arm, g.ts_str, count(*) AS n
        |FROM d JOIN g ON d.arm = g.arm
        |GROUP BY d.arm, g.ts_str
        |ORDER BY d.arm""".stripMargin,

    // golden replay of the hand-derived byte-order ranks
    "q260_ip_sort" ->
      """WITH d AS (SELECT CAST(doc_id % 8 AS INT) AS arm FROM documents),
        |g(arm, ip, rk) AS (VALUES
        |  (0, '::1', 1), (1, '9.0.0.1', 4), (2, '10.0.0.1', 5),
        |  (3, '192.168.0.1', 7), (4, '2001:db8::1', 6),
        |  (5, '::ffff:1.2.3.4', 3), (6, 'ff02::1', 8), (7, '0.0.0.1', 2))
        |SELECT d.arm, g.ip, count(*) AS n, g.rk
        |FROM d JOIN g ON d.arm = g.arm
        |GROUP BY d.arm, g.ip, g.rk
        |ORDER BY d.arm""".stripMargin,

    // golden replay of the containment verdicts
    "q259_cidr_op" ->
      """WITH d AS (SELECT CAST(doc_id % 8 AS INT) AS arm FROM documents),
        |g(arm, contained) AS (VALUES
        |  (0, TRUE), (1, TRUE), (2, FALSE), (3, TRUE),
        |  (4, FALSE), (5, TRUE), (6, FALSE), (7, FALSE))
        |SELECT d.arm, g.contained, count(*) AS n
        |FROM d JOIN g ON d.arm = g.arm
        |GROUP BY d.arm, g.contained
        |ORDER BY d.arm""".stripMargin,

    // golden replay of the RFC 5952 / strict-IPv4 renderings
    "q256_ip_render" ->
      """WITH d AS (SELECT CAST(doc_id % 6 AS INT) AS arm FROM documents),
        |g(arm, ip_norm) AS (VALUES
        |  (0, '::1'),
        |  (1, '2001:db8::1'),
        |  (2, '2001:0:0:1::1'),
        |  (3, '2001:db8::1:0:0:1'),
        |  (4, '10.1.2.3'),
        |  (5, '255.255.255.255'))
        |SELECT d.arm, g.ip_norm, count(*) AS n
        |FROM d JOIN g ON d.arm = g.arm
        |GROUP BY d.arm, g.ip_norm
        |ORDER BY d.arm""".stripMargin
  )
}
