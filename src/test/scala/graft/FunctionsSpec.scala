package graft

import graft.functions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pure-kernel tests (no Spark needed): hashing, langid, patterns, CIDR. */
class TextKernelSpec extends AnyFunSuite {
  import TextFunctions._

  test("minhash signature is deterministic and length-n") {
    val a = minhashSignature("the quick brown fox", 3, 64)
    val b = minhashSignature("the quick brown fox", 3, 64)
    assert(a.toSeq == b.toSeq && a.length == 64)
  }

  test("minhash similarity tracks jaccard") {
    val s1 = minhashSignature("the quick brown fox jumps over the lazy dog", 3, 256)
    val s2 = minhashSignature("the quick brown fox jumps over the lazy cat", 3, 256)
    val s3 = minhashSignature("completely different text about spark engines", 3, 256)
    val sim12 = s1.zip(s2).count { case (x, y) => x == y } / 256.0
    val sim13 = s1.zip(s3).count { case (x, y) => x == y } / 256.0
    assert(sim12 > 0.6 && sim13 < 0.3)
  }

  test("shingleJaccard: identical=1, disjoint=0") {
    assert(shingleJaccard("abcdef", "abcdef", 3) == 1.0)
    assert(shingleJaccard("aaaa", "zzzz", 3) == 0.0)
  }

  test("simhash: identical texts hamming 0; similar texts close") {
    val h1 = simhash64("spark query engine with hash join and window agg")
    val h2 = simhash64("spark query engine with hash join and window agg")
    val h3 = simhash64("spark query engine with hash join and window sum")
    assert(hamming64(h1, h2) == 0)
    assert(hamming64(h1, h3) <= 16)
  }

  test("bandKeys: equal signatures share all bands") {
    val sig = minhashSignature("hello world", 4, 64)
    assert(bandKeys(sig, 16).toSeq == bandKeys(sig.clone(), 16).toSeq)
  }

  test("langId picks stopword-matching language") {
    assert(langId("the cat and the dog in the house") == "en")
    assert(langId("der hund und die katze ist nicht da") == "de")
    assert(langId("xyzzy plugh") == "und")
  }

  test("fingerprint is normalization-stable") {
    assert(fingerprint64("A  b\tC") == fingerprint64("a b c"))
  }
}

class TimePatternSpec extends AnyFunSuite {
  import TimeFunctions._

  test("mysql pattern translation") {
    assert(translateMySqlPattern("%Y-%m-%d") == "yyyy-MM-dd")
    assert(translateMySqlPattern("%H:%i:%s") == "HH:mm:ss")
  }

  test("pg template translation") {
    assert(translatePgTemplate("YYYY-MM-DD") == "yyyy-MM-dd")
    assert(translatePgTemplate("HH24:MI:SS") == "HH:mm:ss")
  }
}

class GeoNetKernelSpec extends AnyFunSuite {
  import GeoNetFunctions._

  test("ipv4 parse + CIDR membership (r13: reference-strict, loud)") {
    assert(ipv4ToLong("10.0.0.1").contains(0x0a000001L))
    assert(ipv4ToLong("300.0.0.1").isEmpty)
    assert(ipInCidr("10.1.2.3", "10.0.0.0/8"))
    assert(!ipInCidr("11.1.2.3", "10.0.0.0/8"))
    assert(ipInCidr("10.5.2.3", "10.5.0.0/16"))
    // malformed operands are LOUD like the reference's containedWithin,
    // not silently null
    val e = intercept[IllegalArgumentException](ipInCidr("bogus", "10.0.0.0/8"))
    assert(e.getMessage.contains("Failed to validate ip"))
  }

  test("geohash matches known value") {
    // classic example: (lat 42.605, lon -5.603) → ezs42 (public geohash spec)
    assert(geohashString(-5.603, 42.605, 5) == "ezs42")
  }
}

/** Table-driven corpus of representative CrateDB statements (shapes from the
  * reference docs `docs/general/dql/` + `blackbox/` doctests) that the
  * dialect front-end must translate correctly — including the literal-safety
  * cases the round-1 regex shim corrupted. */
class DialectSpec extends AnyFunSuite {
  private val corpus: Seq[(String, String)] = Seq(
    // function renames
    "SELECT arbitrary(x) FROM t" -> "SELECT any_value(x) AS arbitrary FROM t",
    "SELECT hyperloglog_distinct(x) FROM t" -> "SELECT approx_count_distinct(x) AS hyperloglog_distinct FROM t",
    "SELECT curdate()" -> "SELECT current_date() AS curdate",
    "SELECT strpos(name, 'a') FROM t" -> "SELECT instr(name, 'a') AS strpos FROM t",
    "SELECT array_cat(a, b), array_unique(a), array_difference(a, b) FROM t" ->
      "SELECT graft_array_cat(a, b) AS array_cat, graft_array_unique(a) AS array_unique, graft_array_difference(a, b) AS array_difference FROM t",
    // :: casts — simple, literal, parenthesized, call, array type
    "SELECT a::bigint FROM t" -> "SELECT CAST(a AS BIGINT) FROM t",
    "SELECT '1'::decimal(10,2)" -> "SELECT CAST('1' AS DECIMAL(10,2))",
    "SELECT (a + b)::double FROM t" -> "SELECT CAST((a + b) AS DOUBLE) FROM t",
    "SELECT (price * 1.1)::integer FROM orders" -> "SELECT CAST((price * 1.1) AS INT) FROM orders",
    // ::text routes through graft_to_text (PG boolean 't'/'f' rendering)
    "SELECT abs(x)::text FROM t" -> "SELECT graft_to_text(abs(x)) FROM t",
    "SELECT x::int[] FROM t" -> "SELECT CAST(x AS ARRAY<INT>) FROM t",
    // ::timestamp routes to the reference cast (bare-integer strings =
    // epoch millis, loud grammar); bare `timestamp` is WITHOUT tz
    "SELECT ts::timestamp with time zone FROM t" -> "SELECT graft_ts_cast(ts, true) FROM t",
    "SELECT ts::timestamp FROM t" -> "SELECT graft_ts_cast(ts, false) FROM t",
    "SELECT ts::timestamptz FROM t" -> "SELECT graft_ts_cast(ts, true) FROM t",
    // ::ip validates+normalizes (IpType.implicitCast)
    "SELECT o.col::ip FROM t" -> "SELECT graft_ip_cast(o.col) FROM t",
    // regex-match operators (r14: full-string reference semantics, not
    // rlike's substring find) and PG bitwise XOR
    "SELECT * FROM t WHERE name ~ '^ab.*'" ->
      "SELECT * FROM t WHERE (graft_regexp_match(name, '^ab.*'))",
    "SELECT * FROM t WHERE name ~* '^ab'" ->
      "SELECT * FROM t WHERE (graft_regexp_match_ci(name, '^ab'))",
    "SELECT * FROM t WHERE name !~ 'x$'" ->
      "SELECT * FROM t WHERE NOT (graft_regexp_match(name, 'x$'))",
    "SELECT * FROM t WHERE name !~* 'x$'" ->
      "SELECT * FROM t WHERE NOT (graft_regexp_match_ci(name, 'x$'))",
    "SELECT a # b FROM t" -> "SELECT graft_bitxor(a, b) FROM t",
    "SELECT 2 ^ 3" -> "SELECT power(2, 3) AS power",
    "SELECT ~flags FROM t" -> "SELECT ~flags FROM t",
    "SELECT 'a ~ b' FROM t" -> "SELECT 'a ~ b' FROM t",
    // array-overlap operator and PG-argument-order swaps
    "SELECT tags && ['a', 'b'] FROM t" ->
      "SELECT graft_array_overlap(tags, array('a', 'b')) FROM t",
    "SELECT a.tags && other_tags FROM t WHERE x = 1" ->
      "SELECT graft_array_overlap(a.tags, other_tags) FROM t WHERE x = 1",
    "SELECT array_prepend(0, arr) FROM t" ->
      "SELECT graft_array_prepend(0, arr) AS array_prepend FROM t",
    "SELECT array_overlap(a, b) FROM t" -> "SELECT graft_array_overlap(a, b) AS array_overlap FROM t",
    "SELECT gen_random_text_uuid() FROM t" -> "SELECT uuid() AS gen_random_text_uuid FROM t",
    "SELECT 'a && b' FROM t" -> "SELECT 'a && b' FROM t",
    // system-schema qualifiers → flat registered view names
    "SELECT * FROM sys.shards" -> "SELECT * FROM sys_shards",
    "SELECT table_name FROM information_schema.tables" ->
      "SELECT table_name FROM information_schema_tables",
    "SELECT 'sys.shards' FROM t" -> "SELECT 'sys.shards' FROM t",
    // literal safety: rewrite-pattern text inside strings must survive
    "SELECT 'a::int'" -> "SELECT 'a::int'",
    "SELECT 'arr[1]' FROM t" -> "SELECT 'arr[1]' FROM t",
    "SELECT 'curdate(' FROM t" -> "SELECT 'curdate(' FROM t",
    "SELECT x FROM t -- y::int comment" -> "SELECT x FROM t -- y::int comment",
    // subscripts (1-based, out-of-range/non-positive → NULL like CrateDB's
    // SubscriptFunction under Spark ANSI mode) and object access (native [])
    "SELECT toks[1] FROM t" ->
      "SELECT if((1) <= 0, null, try_element_at(toks, 1)) FROM t",
    "SELECT arr[i + 1] FROM t" ->
      "SELECT if((i + 1) <= 0, null, try_element_at(arr, i + 1)) FROM t",
    "SELECT matrix[1][2] FROM t" ->
      "SELECT if((2) <= 0, null, try_element_at(if((1) <= 0, null, try_element_at(matrix, 1)), 2)) FROM t",
    "SELECT obj['k'] FROM t" -> "SELECT obj['k'] FROM t",
    "SELECT f(x)[2] FROM t" ->
      "SELECT if((2) <= 0, null, try_element_at(f(x), 2)) FROM t",
    // slices: 1-based inclusive ends, both optional, to clamped to length
    "SELECT a[2:3] FROM t" -> "SELECT slice(a, 2, greatest((3) - (2) + 1, 0)) AS slice FROM t",
    "SELECT a[2:] FROM t" -> "SELECT slice(a, 2, greatest(size(a) - (2) + 1, 0)) AS slice FROM t",
    "SELECT a[:3] FROM t" -> "SELECT slice(a, 1, greatest(3, 0)) AS slice FROM t",
    // array + object literals
    "SELECT [1, 2, 3]" -> "SELECT array(1, 2, 3)",
    "SELECT ARRAY[1, 2]" -> "SELECT array(1, 2)",
    "SELECT [[1, 2], [3]]" -> "SELECT array(array(1, 2), array(3))",
    "SELECT {name = 'x', age = 3}" -> "SELECT named_struct('name', 'x', 'age', 3)",
    "SELECT {\"a b\" = 1}" -> "SELECT named_struct('a b', 1)",
    "INSERT INTO t (o) VALUES ({inner = {k = 1}})" ->
      "INSERT INTO t (o) VALUES (named_struct('inner', named_struct('k', 1)))",
    // OBJECT literal edge corpus from the reference doctests
    // (docs/general/builtins/scalar-functions.rst, dql/selects.rst)
    "SELECT null_or_empty({}) x, null_or_empty({x=10}) z" ->
      "SELECT null_or_empty(map()) x, null_or_empty(named_struct('x', 10)) z",
    "SELECT {'k2' = 5} AS o" -> "SELECT named_struct('k2', 5) AS o",
    "SELECT {a = [1, 2], b = {c = 'x'}} AS nested" ->
      "SELECT named_struct('a', array(1, 2), 'b', named_struct('c', 'x')) AS nested",
    "SELECT {ts = curdate(), n = abs(-1)} AS v" ->
      "SELECT named_struct('ts', current_date(), 'n', abs(-1)) AS v",
    // subscripts on literals, function results, and chains
    "SELECT {inner = {k = 1}}['inner']['k'] AS v" ->
      "SELECT named_struct('inner', named_struct('k', 1))['inner']['k'] AS v",
    "SELECT parse_uri(u)['hostname'] FROM t" ->
      "SELECT parse_uri(u)['hostname'] FROM t",
    "SELECT information[1]['population'] FROM locations" ->
      "SELECT if((1) <= 0, null, try_element_at(information, 1))['population'] FROM locations",
    "SELECT inhabitants['interests'][1] FROM locations" ->
      "SELECT if((1) <= 0, null, try_element_at(inhabitants['interests'], 1)) FROM locations",
    "SELECT 1 = ANY([[1, 2], [3, 4]]) AS m" ->
      "SELECT exists(graft_dim_match(1, array(array(1, 2), array(3, 4))), __t -> 1 = __t) AS m",
    // quantified comparisons over arrays (graft_dim_match auto-unnests to
    // the lhs's dimension; identity when dimensions already line up)
    "SELECT 5 = ANY(tags) FROM t" ->
      "SELECT exists(graft_dim_match(5, tags), __t -> 5 = __t) FROM t",
    "SELECT price > ANY(costs) FROM t" ->
      "SELECT exists(graft_dim_match(price, costs), __t -> price > __t) FROM t",
    "SELECT x != ALL(ys) FROM t" ->
      "SELECT forall(graft_dim_match(x, ys), __t -> x != __t) FROM t",
    "SELECT name LIKE ANY(patterns) FROM t" ->
      "SELECT exists(graft_dim_match(name, patterns), __t -> name LIKE __t) FROM t",
    // AnyNotLikeOperator.java: the NOT negates PER ELEMENT — "fails to
    // match at least one pattern" — not the whole quantifier
    "SELECT name NOT LIKE ANY(patterns) FROM t" ->
      "SELECT exists(graft_dim_match(name, patterns), __t -> NOT (name LIKE __t)) FROM t",
    "SELECT name NOT ILIKE ANY(patterns) FROM t" ->
      "SELECT exists(graft_dim_match(name, patterns), __t -> NOT (name ILIKE __t)) FROM t",
    // ANY over subqueries is left for the Column-API rewrites (q101+)
    "SELECT x FROM t WHERE x > ANY (SELECT y FROM u)" ->
      ("SELECT x FROM t WHERE CASE WHEN (SELECT count(*) AS count FROM u) = 0 THEN FALSE " +
        "WHEN (x) > (SELECT min(y) AS min FROM u) THEN TRUE " +
        "WHEN (SELECT count(CASE WHEN (y) IS NULL THEN 1 END) AS count FROM u) > 0 " +
        "OR (x) IS NULL THEN CAST(NULL AS BOOLEAN) ELSE FALSE END"),
    // unsupported subquery shapes stay untouched (Spark reports the original)
    "SELECT x FROM t WHERE x > ANY (SELECT y FROM u LIMIT 3)" ->
      "SELECT x FROM t WHERE x > ANY (SELECT y FROM u LIMIT 3)",
    // ARRAY(subquery) constructor
    "SELECT ARRAY(SELECT y FROM u) AS arr" ->
      "SELECT (SELECT coalesce(collect_list(y), array()) AS coalesce FROM u) AS arr",
    "SELECT array(1, 2) FROM t" -> "SELECT array(1, 2) FROM t",
    // UNION ALL / SELECT ALL must NOT trip the ALL rewrite
    "SELECT a FROM t UNION ALL SELECT b FROM u" -> "SELECT a FROM t UNION ALL SELECT b FROM u",
    // aggregate FILTER clause
    "SELECT count(*) FILTER (WHERE x > 3) FROM t" ->
      "SELECT count(CASE WHEN x > 3 THEN 1 END) AS count FROM t",
    "SELECT sum(v) FILTER (WHERE k = 'a') AS s FROM t" ->
      "SELECT sum(CASE WHEN k = 'a' THEN v END) AS s FROM t",
    "SELECT count(DISTINCT v) FILTER (WHERE ok) FROM t" ->
      "SELECT count(DISTINCT CASE WHEN ok THEN v END) AS count FROM t",
    // SQL-standard FETCH/OFFSET forms
    "SELECT a FROM t OFFSET 5 ROWS FETCH FIRST 10 ROWS ONLY" ->
      "SELECT a FROM t OFFSET 5 LIMIT 10",
    "SELECT a FROM t FETCH NEXT ROW ONLY" -> "SELECT a FROM t LIMIT 1",
    // double-quoted identifiers → backticks (Spark reads "x" as a string)
    "SELECT \"my col\" FROM \"weird table\"" -> "SELECT `my col` FROM `weird table`",
    "SELECT \"a\"\"b\" FROM t" -> "SELECT `a\"b` FROM t",
    // MATCH: single col, multi-col with boosts, phrase
    "SELECT * FROM d WHERE MATCH(text, 'spark join')" ->
      "SELECT * FROM d WHERE (match_text(text, 'spark join'))",
    "SELECT * FROM d WHERE MATCH((title, body), 'q')" ->
      "SELECT * FROM d WHERE (match_text(title, 'q') OR match_text(body, 'q'))",
    "SELECT * FROM d WHERE MATCH((title 2.0, body), 'q') USING best_fields" ->
      "SELECT * FROM d WHERE (match_text(title, 'q') OR match_text(body, 'q'))",
    "SELECT * FROM d WHERE MATCH(content, 'exact phrase') USING phrase" ->
      "SELECT * FROM d WHERE (contains(lower(content), lower('exact phrase')))"
  )

  test("corpus translates exactly") {
    for ((in, want) <- corpus) {
      val got = Dialect.translate(in)
      assert(got == want, s"\ninput: $in\n  got: $got\n want: $want")
    }
  }

  test("idempotent on already-translated output") {
    for ((in, _) <- corpus) {
      val once = Dialect.translate(in)
      assert(Dialect.translate(once) == once, s"not idempotent for: $in")
    }
  }
}

/** Property test: string literals survive translation byte-for-byte even
  * when they contain rewrite-pattern text — the exact failure mode of the
  * round-1 regex shim. */
class DialectPropertySpec extends AnyFunSuite {
  import org.scalacheck.{Gen, Prop}
  import org.scalacheck.Prop.forAll

  private val trapFragments = Gen.oneOf(
    "a::int", "arr[1]", "curdate(", "MATCH(x, 'q')", "{k = 1}", "[1,2,3]",
    "5 = ANY(t)", "x FILTER (WHERE y)", "\"quoted\"", "FETCH FIRST 3 ROWS ONLY",
    "plain text", "100%", "semi;colon", "a -- comment", "/* block */")

  private val literalGen: Gen[String] = for {
    n <- Gen.choose(1, 3)
    parts <- Gen.listOfN(n, trapFragments)
  } yield parts.mkString(" ")

  test("literals containing rewrite patterns are preserved verbatim") {
    val prop = forAll(literalGen) { lit =>
      val sqlLit = "'" + lit.replace("'", "''") + "'"
      val stmt = s"SELECT $sqlLit AS s, x::int FROM t WHERE y = $sqlLit"
      val out = Dialect.translate(stmt)
      Prop(out.contains(sqlLit) &&
        out.indexOf(sqlLit) != out.lastIndexOf(sqlLit) && // both occurrences
        out.contains("CAST(x AS INT)"))
    }
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }
}

/** SQL `knn_match` predicate (reference KnnMatch.java:48,
  * docs/general/dql/vector-search.rst) through the dialect's exact top-k
  * lowering. */
class KnnMatchSqlSpec extends SparkTestBase {
  import spark.implicits._

  private def setup(): Unit = {
    graft.functions.GraftFunctions.registerAll(spark)
    Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)),
        (3L, Seq(0.0f, 1.0f)), (4L, Seq(0.5f, 0.5f)))
      .toDF("id", "vec").createOrReplaceTempView("kvecs")
  }

  test("knn_match predicate selects the k nearest; _score = 1/(1+l2²)") {
    setup()
    val rows = spark.sql(Dialect.translate(
      "SELECT id, _score FROM kvecs WHERE knn_match(vec, [1.0, 0.0], 2) " +
        "ORDER BY _score DESC")).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(math.abs(rows(0).getDouble(1) - 1.0) < 1e-9)
    assert(math.abs(rows(1).getDouble(1) - 1.0 / 1.02) < 1e-6)
  }

  test("other WHERE conjuncts pre-filter, so k rows still come back") {
    setup()
    val rows = spark.sql(Dialect.translate(
      "SELECT id FROM kvecs WHERE id > 1 AND knn_match(vec, [1.0, 0.0], 2) " +
        "ORDER BY _score DESC")).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L, 4L))
  }

  test("SELECT * hides the helper score column; alias form resolves") {
    setup()
    val df = spark.sql(Dialect.translate(
      "SELECT * FROM kvecs v WHERE knn_match(v.vec, [0.0, 1.0], 1)"))
    assert(df.columns.toSeq == Seq("id", "vec"))
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("qualified star (alias.*) also hides the helper score column") {
    setup()
    val df = spark.sql(Dialect.translate(
      "SELECT v.* FROM kvecs v WHERE knn_match(v.vec, [0.0, 1.0], 1)"))
    assert(df.columns.toSeq == Seq("id", "vec"))
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("BETWEEN's AND is not a conjunct boundary in the WHERE split") {
    setup()
    val rows = spark.sql(Dialect.translate(
      "SELECT id FROM kvecs WHERE knn_match(vec, [1.0, 0.0], 2) " +
        "AND id BETWEEN 2 AND 10 ORDER BY _score DESC")).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L, 4L))
  }

  test("non-literal query vectors: scalar subquery and column expressions") {
    setup()
    // the reference takes a literal float_vector; accepting any
    // vector-valued expression (here: a scalar subquery picking another
    // row's vector) is a free superset of the exact lowering — the
    // rendered expression lands inside vector_similarity unchanged
    val rows = spark.sql(Dialect.translate(
      "SELECT id FROM kvecs WHERE knn_match(vec, " +
        "(SELECT v.vec FROM kvecs v WHERE v.id = 3), 2) ORDER BY _score DESC"))
      .collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(3L, 4L),
      "nearest to id 3's vector are itself and the diagonal id 4")
  }

  test("plan shape: exact fallback is TakeOrderedAndProject, not global sort") {
    setup()
    val plan = spark.sql(Dialect.translate(
      "SELECT id FROM kvecs WHERE knn_match(vec, [1.0, 0.0], 2)"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}

/** Spark-evaluated function tests. */
class SparkFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  test("string_to_array PG edge cases: null/empty input, null/empty separator") {
    graft.functions.GraftFunctions.registerAll(spark)
    val r = spark.sql(
      """SELECT string_to_array('a b c', ' ') AS s1,
        |       string_to_array('', ' ') AS s2,
        |       string_to_array('ab', NULL) AS s3,
        |       string_to_array('ab', '') AS s4,
        |       string_to_array(NULL, ' ') AS s5""".stripMargin).head()
    assert(r.getSeq[String](0) == Seq("a", "b", "c"))
    assert(r.getSeq[String](1) == Seq.empty)
    assert(r.getSeq[String](2) == Seq("a", "b"))
    assert(r.getSeq[String](3) == Seq("ab"))
    assert(r.isNullAt(4))
  }

  test("null_or_empty covers arrays AND maps; array bounds dimension-1 only") {
    graft.functions.GraftFunctions.registerAll(spark)
    val r = spark.sql(
      """SELECT null_or_empty(array()) AS e1,
        |       null_or_empty(array(1)) AS e2,
        |       null_or_empty(map()) AS e3,
        |       null_or_empty(map('k', 1)) AS e4,
        |       null_or_empty(CAST(NULL AS ARRAY<INT>)) AS e5,
        |       array_lower(array(7, 8), 1) AS lo,
        |       array_upper(array(7, 8), 1) AS hi,
        |       array_lower(array(7, 8), 2) AS lo2,
        |       array_lower(array(), 1) AS loe""".stripMargin).head()
    assert(r.getBoolean(0) && !r.getBoolean(1) && r.getBoolean(2) && !r.getBoolean(3) && r.getBoolean(4))
    assert(r.getInt(5) == 1 && r.getInt(6) == 2)
    assert(r.isNullAt(7) && r.isNullAt(8))
  }

  test("graft_array_prepend uses CrateDB (value, array) order") {
    graft.functions.GraftFunctions.registerAll(spark)
    val r = spark.sql("SELECT graft_array_prepend(0, array(1, 2)) AS p").head()
    assert(r.getSeq[Int](0) == Seq(0, 1, 2))
  }

  test("vector cosine: identical=1, orthogonal=0") {
    val df = Seq((Array(1.0f, 0.0f), Array(1.0f, 0.0f), Array(0.0f, 1.0f)))
      .toDF("a", "b", "c")
    val r = df.select(
      VectorFunctions.cosineSimilarity($"a", $"b").as("same"),
      VectorFunctions.cosineSimilarity($"a", $"c").as("orth"),
      VectorFunctions.l2Distance($"a", $"c").as("l2")).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1)) < 1e-12)
    assert(math.abs(r.getDouble(2) - math.sqrt(2)) < 1e-12)
  }

  test("date_bin floors to aligned buckets") {
    val df = Seq("2024-01-01 00:37:11").toDF("s")
      .select(to_timestamp($"s").as("ts"))
    val r = df.select(TimeFunctions.dateBin(15L * 60 * 1000 * 1000, $"ts")).head()
    assert(r.getTimestamp(0).toString == "2024-01-01 00:30:00.0")
  }

  test("haversine distance London-Paris ~343km") {
    val df = Seq(1).toDF("x")
    val d = df.select(GeoNetFunctions.haversineDistance(
      array(lit(-0.1278), lit(51.5074)), array(lit(2.3522), lit(48.8566)))).head().getDouble(0)
    assert(d > 330000 && d < 350000)
  }

  test("to_char / mysql date_format / parse_url through the engine") {
    val r = spark.sql(
      """SELECT to_char(TIMESTAMP '2024-03-05 14:07:09', 'YYYY-MM-DD HH24:MI') AS pg,
                date_format_mysql('%Y/%m/%d %H:%i', TIMESTAMP '2024-03-05 14:07:09') AS my,
                parse_url('https://example.com:8080/a/b?q=1', 'HOST') AS host,
                quote_ident('weird col') AS qi""").head()
    assert(r.getString(0) == "2024-03-05 14:07")
    assert(r.getString(1) == "2024/03/05 14:07")
    assert(r.getString(2) == "example.com:8080" || r.getString(2) == "example.com")
    assert(r.getString(3) == "\"weird col\"")
  }

  test("sql-registered functions work through spark.sql") {
    val r = spark.sql(
      """SELECT simhash('a b c') AS sh, lang_id('the cat and the dog') AS l,
                ip_in_cidr('10.1.1.1', '10.0.0.0/8') AS cidr,
                ignore3vl(NULL) AS i3vl""").head()
    assert(r.getString(1) == "en" && r.getBoolean(2) && !r.getBoolean(3))
  }
}

/** Native codegen'd vector expressions vs the HOF formulation. */
class VectorExprSpec extends SparkTestBase {
  import graft.functions.VectorFunctions

  test("native cosine is bit-identical to the HOF cosine on real embeddings") {
    val emb = Tables.load(spark, sfDir, "embeddings").limit(50)
    val a = emb.select(org.apache.spark.sql.functions.col("embedding").as("v1"))
      .crossJoin(emb.select(org.apache.spark.sql.functions.col("embedding").as("v2")).limit(5))
    val cmp = a.select(
      VectorFunctions.cosineSimilarity(org.apache.spark.sql.functions.col("v1"),
        org.apache.spark.sql.functions.col("v2")).as("hof"),
      VectorFunctions.cosineNative(org.apache.spark.sql.functions.col("v1"),
        org.apache.spark.sql.functions.col("v2")).as("native"))
    assert(cmp.filter("hof <> native").count() == 0)
  }

  test("native cosine stays inside whole-stage codegen") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val df = emb.select(VectorFunctions.cosineNative(
      org.apache.spark.sql.functions.col("embedding"),
      org.apache.spark.sql.functions.col("embedding")).as("s"))
    val plan = df.queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators fused into a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [graft_cosine"))
  }

  test("native expressions null out on length mismatch and SQL-resolve") {
    val r = spark.sql(
      """SELECT graft_cosine(array(CAST(1.0 AS FLOAT)), array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS mismatch,
                graft_dot(array(CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT))) AS dot""").head()
    assert(r.isNullAt(0) && r.getDouble(1) == 6.0)
  }
}

/** Engine.sql end-to-end over the CrateDB dialect shim. */
class EngineSqlSpec extends SparkTestBase {
  test("subscript semantics match CrateDB: out-of-range and non-positive → NULL, slices clamp") {
    graft.functions.GraftFunctions.registerAll(spark)
    val r = Engine.sql(spark,
      """SELECT [10, 20, 30][2] AS ok, [10, 20, 30][9] AS oob,
        |       [10, 20, 30][0] AS zero, [10, 20, 30][-1] AS neg,
        |       [10, 20, 30][2:3] AS sl, [10, 20, 30][2:] AS sl_open,
        |       [10, 20, 30][:2] AS sl_to, [10, 20, 30][2:99] AS sl_clamp""".stripMargin).head()
    assert(r.getInt(0) == 20)
    assert(r.isNullAt(1), "out-of-range must be NULL, not an ANSI error")
    assert(r.isNullAt(2) && r.isNullAt(3), "CrateDB has no negative indexing")
    assert(r.getSeq[Int](4) == Seq(20, 30))
    assert(r.getSeq[Int](5) == Seq(20, 30))
    assert(r.getSeq[Int](6) == Seq(10, 20))
    assert(r.getSeq[Int](7) == Seq(20, 30), "to beyond length clamps")
  }

  test("reference doctest OBJECT statements execute end-to-end") {
    graft.functions.GraftFunctions.registerAll(spark)
    // docs/general/builtins/scalar-functions.rst:3873
    val ne = Engine.sql(spark,
      "SELECT null_or_empty({}) x, null_or_empty(NULL) y, null_or_empty({x=10}) z").head()
    assert(ne.getBoolean(0) && ne.getBoolean(1) && !ne.getBoolean(2))
    assert(Engine.sql(spark, "SELECT null_or_empty([]) e").head().getBoolean(0),
      "empty array literal is empty")
    // nested literal + chained subscripts on the literal itself
    val v = Engine.sql(spark,
      "SELECT {inner = {k = 41 + 1}}['inner']['k'] AS v").head()
    assert(v.getInt(0) == 42)
    // subscript chain rooted at a column: string key then 1-based index
    val chain = Engine.sql(spark,
      """SELECT o['xs'][2] AS second, o['xs'][9] AS oob
        |FROM (SELECT {xs = [7, 8, 9]} AS o)""".stripMargin).head()
    assert(chain.getInt(0) == 8 && chain.isNullAt(1))
    // subscript on a function result (scalar-functions.rst:1030)
    val host = Engine.sql(spark,
      "SELECT parse_uri('crate://my_user@cluster.crate.io:5432')['hostname'] AS h").head()
    assert(host.getString(0) == "cluster.crate.io")
    // ANY over an array-of-arrays literal (selects.rst:693): a scalar lhs
    // auto-unnests to the required dimension; an array lhs compares whole
    // inner arrays without unnesting
    val m = Engine.sql(spark,
      """SELECT 1 = ANY([[1, 2], [3, 4]]) AS scalar_unnest,
        |       9 = ANY([[1, 2], [3, 4]]) AS scalar_miss,
        |       [1, 2] = ANY([[1, 2], [3, 4]]) AS whole_array,
        |       5 > ALL([[1, 2], [3, 4]]) AS all_unnest""".stripMargin).head()
    assert(m.getBoolean(0) && !m.getBoolean(1) && m.getBoolean(2) && m.getBoolean(3))
  }

  test("string-key subscript over array-of-objects yields the value array (SubscriptFunctions parity)") {
    // CrateDB: array(object)['field'] → array of the field values
    // (SubscriptFunctions.java); Spark resolves the same spelling through
    // GetArrayStructFields, so the dialect passes string keys through.
    val r = Engine.sql(spark,
      """SELECT objs['name'] AS names, objs[1]['name'] AS first_name
        |FROM (SELECT array(named_struct('name', 'a', 'rank', 1),
        |                   named_struct('name', 'b', 'rank', 2)) AS objs)""".stripMargin).head()
    assert(r.getSeq[String](0) == Seq("a", "b"))
    assert(r.getString(1) == "a", "numeric then string subscript chains")
  }

  test("quantified subquery comparisons: full 3VL matrix (AnyOperator/AllOperator parity)") {
    graft.functions.GraftFunctions.registerAll(spark)
    spark.sql("SELECT * FROM VALUES (1), (5), (9) AS t(y)").createOrReplaceTempView("qsub")
    spark.sql("SELECT * FROM VALUES (1), (5), (CAST(NULL AS INT)) AS t(y)")
      .createOrReplaceTempView("qsub_null")
    spark.sql("SELECT * FROM VALUES (1) AS t(y) WHERE y < 0").createOrReplaceTempView("qsub_empty")
    def run(expr: String): Any = {
      val r = Engine.sql(spark, s"SELECT $expr AS v").head()
      if (r.isNullAt(0)) null else r.getBoolean(0)
    }
    // ordering ANY
    assert(run("3 > ANY (SELECT y FROM qsub)") == true)
    assert(run("0 > ANY (SELECT y FROM qsub)") == false)
    assert(run("10 <= ANY (SELECT y FROM qsub)") == false)
    assert(run("9 <= ANY (SELECT y FROM qsub)") == true)
    assert(run("3 > ANY (SELECT y FROM qsub_empty)") == false, "empty -> FALSE")
    assert(run("3 > ANY (SELECT y FROM qsub_null)") == true, "TRUE beats null row")
    assert(run("0 > ANY (SELECT y FROM qsub_null)") == null, "undecidable -> NULL")
    assert(run("CAST(NULL AS INT) > ANY (SELECT y FROM qsub)") == null)
    assert(run("CAST(NULL AS INT) > ANY (SELECT y FROM qsub_empty)") == false)
    // ordering ALL
    assert(run("10 > ALL (SELECT y FROM qsub)") == true)
    assert(run("5 > ALL (SELECT y FROM qsub)") == false)
    assert(run("3 > ALL (SELECT y FROM qsub_empty)") == true, "empty -> TRUE")
    assert(run("0 > ALL (SELECT y FROM qsub_null)") == false, "FALSE dominates null")
    assert(run("10 > ALL (SELECT y FROM qsub_null)") == null, "no FALSE + null -> NULL")
    assert(run("CAST(NULL AS INT) > ALL (SELECT y FROM qsub_empty)") == true)
    // equality quantifiers
    assert(run("5 = ANY (SELECT y FROM qsub)") == true)
    assert(run("4 = ANY (SELECT y FROM qsub)") == false)
    assert(run("4 = ANY (SELECT y FROM qsub_null)") == null, "IN 3VL")
    assert(run("4 <> ALL (SELECT y FROM qsub)") == true)
    assert(run("5 <> ALL (SELECT y FROM qsub)") == false)
    assert(run("4 <> ALL (SELECT y FROM qsub_null)") == null, "NOT IN 3VL")
    assert(run("7 = ALL (SELECT y FROM qsub)") == false)
    assert(run("7 = ALL (SELECT y FROM qsub WHERE y = 7)") == true)
    assert(run("5 = ALL (SELECT y FROM qsub_null WHERE y = 5)") == true)
    assert(run("5 = ALL (SELECT y FROM qsub_null)") == false)
    assert(run("9 <> ANY (SELECT y FROM qsub)") == true)
    assert(run("5 <> ANY (SELECT y FROM qsub WHERE y = 5)") == false)
    // SOME is a synonym for ANY
    assert(run("3 > SOME (SELECT y FROM qsub)") == true)
    // same-named columns must NOT capture the outer operand: outer y vs
    // qsub.y ∈ {1,5,9}
    val cap = Engine.sql(spark,
      """SELECT o.y, o.y = ANY (SELECT y FROM qsub) AS m,
        |       o.y = ALL (SELECT y FROM qsub WHERE y = 5) AS a,
        |       o.y <> ANY (SELECT y FROM qsub WHERE y = 5) AS d,
        |       o.y <> ALL (SELECT y FROM qsub) AS n
        |FROM (SELECT 4 AS y UNION ALL SELECT 5 AS y) o ORDER BY o.y""".stripMargin)
      .collect()
    assert(cap(0).getBoolean(1) == false && cap(1).getBoolean(1) == true,
      "= ANY captured the inner column")
    assert(cap(0).getBoolean(2) == false && cap(1).getBoolean(2) == true)
    assert(cap(0).getBoolean(3) == true && cap(1).getBoolean(3) == false)
    assert(cap(0).getBoolean(4) == true && cap(1).getBoolean(4) == false)
    // correlated inner queries translate and decorrelate (the aggregate
    // subqueries keep the correlation predicate verbatim)
    spark.sql("SELECT * FROM VALUES (1, 10), (1, 20), (2, 5) AS t(k, v)")
      .createOrReplaceTempView("qcorr")
    val corr = Engine.sql(spark,
      """SELECT t.k, t.x > ANY (SELECT v FROM qcorr WHERE qcorr.k = t.k) AS gt,
        |       t.x = ALL (SELECT v FROM qcorr WHERE qcorr.k = t.k) AS eq,
        |       t.x = ANY (SELECT v - 5 FROM qcorr WHERE qcorr.k = t.k) AS m
        |FROM (SELECT * FROM VALUES (1, 15), (2, 5), (3, 0) AS v(k, x)) t
        |ORDER BY t.k""".stripMargin).collect()
    assert(corr(0).getBoolean(3) == true && corr(1).getBoolean(3) == false &&
      corr(2).getBoolean(3) == false, "correlated = ANY (IN path)")
    assert(corr(0).getBoolean(1) == true && corr(0).getBoolean(2) == false)
    assert(corr(1).getBoolean(1) == false && corr(1).getBoolean(2) == true)
    assert(corr(2).getBoolean(1) == false, "empty correlated set -> FALSE for ANY")
    assert(corr(2).getBoolean(2) == true, "empty correlated set -> TRUE for ALL")
    // ARRAY(subquery) constructor executes; empty subquery → empty array
    val arr = Engine.sql(spark,
      "SELECT sort_array(ARRAY(SELECT y FROM qsub)) AS a").head().getSeq[Int](0)
    assert(arr == Seq(1, 5, 9))
    assert(Engine.sql(spark,
      "SELECT ARRAY(SELECT y FROM qsub_empty) AS a").head().getSeq[Int](0).isEmpty)
  }

  test("CrateDB-dialect statement runs end-to-end through Engine.sql") {
    Tables.registerAll(spark, sfDir)
    graft.functions.GraftFunctions.registerAll(spark)
    val df = Engine.sql(spark,
      """SELECT doc_id, arbitrary(lang) AS lang
         FROM documents WHERE MATCH(text, 'spark')
         GROUP BY doc_id ORDER BY doc_id LIMIT 5""")
    assert(df.count() == 5)
  }

  test("translated constructs EXECUTE, not just parse: casts, subscripts, literals, ANY") {
    Tables.registerAll(spark, sfDir)
    graft.functions.GraftFunctions.registerAll(spark)
    // :: casts on expressions + literals
    val casts = Engine.sql(spark,
      "SELECT (c_acctbal * 2)::bigint AS b, '42'::int AS i FROM customer LIMIT 1").head()
    assert(casts.getInt(1) == 42)
    // array literal, 1-based subscript, ANY over the array
    val arr = Engine.sql(spark,
      "SELECT [10, 20, 30][1] AS first_el, 20 = ANY([10, 20, 30]) AS has20").head()
    assert(arr.getInt(0) == 10 && arr.getBoolean(1))
    // OBJECT literal + field access through native bracket syntax
    val obj = Engine.sql(spark,
      "SELECT {name = 'x', rank = 3}['rank'] AS r").head()
    assert(obj.getInt(0) == 3)
    // multi-column MATCH over two text-ish columns
    val m = Engine.sql(spark,
      """SELECT count(*) AS n FROM documents
         WHERE MATCH((text, lang), 'spark') AND lang = 'en'""").head()
    assert(m.getLong(0) > 0)
    // quantified ALL over array with a comparison operator
    val all = Engine.sql(spark,
      "SELECT 5 > ALL([1, 2, 3]) AS gt_all, 2 > ALL([1, 2, 3]) AS not_all").head()
    assert(all.getBoolean(0) && !all.getBoolean(1))
  }
}

/** §2.8 long-tail: parse_ident, escape encode/decode, array_set, session
  * info functions, btrim char-trim, negative subscripts. */
class MiscFunctionsSpec extends SparkTestBase {

  test("parse_ident honors quoted segments") {
    assert(GeoNetFunctions.parseIdent("a.\"b.c\".d").toSeq == Seq("a", "b.c", "d"))
    val r = spark.sql("""SELECT parse_ident('schema."we.ird".col') AS p""").head()
    assert(r.getSeq[String](0) == Seq("schema", "we.ird", "col"))
  }

  test("escape-format encode/decode round-trips binary") {
    graft.functions.GraftFunctions.registerAll(spark) // + raw literals
    val r = spark.sql(
      """SELECT decode_escape(encode_escape(CAST('h\i' AS BINARY))) AS rt,
                encode_escape(CAST(x'00ff41' AS BINARY)) AS esc""").head()
    assert(new String(r.getAs[Array[Byte]](0)) == "h\\i")
    assert(r.getString(1) == "\\000\\377A")
  }

  test("array_set replaces 1-based element") {
    val r = spark.sql("SELECT array_set(array(10L, 20L, 30L), 2, 99L) AS a").head()
    assert(r.getSeq[Long](0) == Seq(10L, 99L, 30L))
  }

  test("pg table functions: _pg_expandarray + pg_get_keywords (r14)") {
    graft.functions.GraftFunctions.registerAll(spark)
    graft.sources.PgCatalog.registerAll(spark)
    // PgExpandArrayTest: (x, n) rows, 1-based; null array -> NO rows
    val rows = Engine.sql(spark,
      "SELECT x, n FROM (SELECT information_schema._pg_expandarray(" +
        "array('a', 'b')) ) ORDER BY n").collect()
    assert(rows.map(r => (r.getString(0), r.getInt(1))).toSeq ==
      Seq(("a", 1), ("b", 2)))
    assert(Engine.sql(spark,
      "SELECT x FROM (SELECT information_schema._pg_expandarray(" +
        "CAST(NULL AS ARRAY<STRING>)))").collect().isEmpty)
    // pg_get_keywords(): the call parens drop to the view; reserved
    // words carry 'R'/'reserved' (PgGetKeywordsFunction.java:80)
    val kw = Engine.sql(spark,
      "SELECT catcode, catdesc FROM pg_get_keywords() " +
        "WHERE word = 'select'").collect()(0)
    assert(kw.getString(0) == "R" && kw.getString(1) == "reserved")
    val n = Engine.sql(spark,
      "SELECT count(*) FROM pg_catalog.pg_get_keywords()").collect()(0)
      .getLong(0)
    assert(n > 250, s"keyword vocabulary unexpectedly small: $n")
    // all lowercase, catcodes only R/U
    assert(Engine.sql(spark, "SELECT count(*) FROM pg_get_keywords() " +
      "WHERE word != lower(word) OR catcode NOT IN ('R', 'U')")
      .collect()(0).getLong(0) == 0)
    // Identifiers.reserved() classification edges (ADVICE r15): bare
    // current_schema parses to FunctionCall and is NOT in
    // RESERVED_FUNCTIONS -> 'U'; current_date parses to a CurrentTime
    // node -> 'R'; user is in RESERVED_FUNCTIONS -> 'R'. Vocabulary
    // pinned 291 words / 96 reserved.
    val edges = Engine.sql(spark,
      "SELECT word, catcode FROM pg_get_keywords() " +
        "WHERE word IN ('current_schema', 'current_date', 'user') " +
        "ORDER BY word").collect()
    assert(edges.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("current_date", "R"), ("current_schema", "U"), ("user", "R")))
    val counts = Engine.sql(spark,
      "SELECT count(*), sum(CASE WHEN catcode = 'R' THEN 1 ELSE 0 END) " +
        "FROM pg_get_keywords()").collect()(0)
    assert((counts.getLong(0), counts.getLong(1)) == (291L, 96L))
  }

  test("array_set reference overloads (ArraySetFunctionTest ported)") {
    def arr(sql: String): Seq[Any] =
      spark.sql(s"SELECT $sql AS a").head().getSeq[Any](0)
    // vector form: set / append / NULL-pad beyond the end
    assert(arr("array_set(array(1,2,3), array(3), array(-1))") ==
      Seq(1, 2, -1))
    assert(arr("array_set(array(1,2,3), array(4), array(-1))") ==
      Seq(1, 2, 3, -1))
    assert(arr("array_set(array(1,2,3), array(5), array(-1))") ==
      Seq(1, 2, 3, null, -1))
    assert(arr("array_set(array(1,2,3), array(), array())") == Seq(1, 2, 3))
    // both-null indexes/values: the array unchanged (reference
    // test_null_for_target_indexes_and_null_for_target_values)
    assert(arr("array_set(array(1,2,3), NULL, NULL)") == Seq(1, 2, 3))
    // works over non-bigint elements now (the old UDF was Seq[Long])
    assert(arr("array_set(array('a','b'), array(4), array('z'))") ==
      Seq("a", "b", null, "z"))
    // scalar form: strict-null index, null VALUE sets a null element
    assert(spark.sql(
      "SELECT array_set(array(1,2), CAST(NULL AS INT), 9) AS a")
      .head().isNullAt(0))
    assert(arr("array_set(array(1,2), 1, CAST(NULL AS INT))") ==
      Seq(null, 2))
    // null array → null either form
    assert(spark.sql(
      "SELECT array_set(CAST(NULL AS ARRAY<INT>), array(1), array(2)) AS a")
      .head().isNullAt(0))
    // loud edges: index <= 0, size mismatch, one-sided null
    val e1 = intercept[Exception](spark.sql(
      "SELECT array_set(array(1,2,3), array(0, -1), array(0, -1)) AS a")
      .head())
    assert(e1.getMessage.contains(
      "Updating arrays with indexes <= 0 is not supported") ||
      Option(e1.getCause).exists(_.getMessage.contains(
        "Updating arrays with indexes <= 0 is not supported")))
    for (bad <- Seq("array_set(array(1,2,3), array(1), array())",
        "array_set(array(1,2,3), NULL, array(1))",
        "array_set(array(1,2,3), array(1), NULL)")) {
      val e = intercept[Exception](spark.sql(s"SELECT $bad AS a").head())
      val msg = "`array_set(array, indexes, values)`: the size of " +
        "indexes and values must match or both be nulls"
      assert(e.getMessage.contains(msg) ||
        Option(e.getCause).exists(_.getMessage.contains(msg)), bad)
    }
    // q270's bridge serialization contract: Spark's to_json over an
    // ARRAY<BIGINT> renders EXACTLY the compact text DuckDB's
    // to_json(...)::VARCHAR renders ('[1,2,3,null,-1]', nulls as
    // `null`, no spaces) — the hashed rows compare as strings, so a
    // rendering drift in either engine must fail here first
    val js = spark.sql(
      "SELECT to_json(array_set(array(1L,2L,3L), array(5), array(-1L))) " +
        "AS a, to_json(array_set(array(1L,2L), 1, CAST(NULL AS BIGINT))) " +
        "AS b").head()
    assert(js.getString(0) == "[1,2,3,null,-1]")
    assert(js.getString(1) == "[null,2]")
  }

  test("session/system info functions evaluate") {
    val r = spark.sql(
      """SELECT current_database() AS db, current_timestamp() AS now,
                current_date() AS today, version() AS v""").head()
    assert(r.getString(0).nonEmpty && r.getString(3).nonEmpty)
  }

  test("pg systeminformation shim family (reference scalar/postgres, scalar/systeminformation)") {
    graft.functions.GraftFunctions.registerAll(spark)
    val r = spark.sql(
      """SELECT current_schema() AS sch,
               current_schemas(true) AS schs,
               pg_encoding_to_char(6) AS enc,
               pg_encoding_to_char(-1) AS enc_neg,
               format_type(25, NULL) AS t_text,
               format_type(1022, NULL) AS t_f8arr,
               format_type(9, NULL) AS t_unk,
               pg_get_userbyid(12345) AS unknown_user,
               pg_table_is_visible(CAST(NULL AS INT)) AS vis_null,
               pg_function_is_visible(10) AS fvis,
               pg_postmaster_start_time() <= current_timestamp() AS started,
               pg_sleep(0.0) AS slept""").head()
    assert(r.getString(0) == "doc")
    assert(r.getSeq[String](1) == Seq("pg_catalog", "doc"))
    assert(r.getString(2) == "UTF8" && r.isNullAt(3))
    assert(r.getString(4) == "text" && r.getString(5) == "float8[]" &&
      r.getString(6) == "???")
    assert(r.getString(7) == "unknown (OID=12345)")
    assert(r.isNullAt(8) && r.getBoolean(9) && r.getBoolean(10) && r.isNullAt(11))
    // the session user's own pseudo-OID resolves to the user name
    val u = spark.sparkContext.sparkUser
    val byId = spark.sql(
      s"SELECT pg_get_userbyid(${graft.sources.PgCatalog.oid(u)}) AS n").head()
    assert(byId.getString(0) == u)
    // renames flow through the dialect: array_to_string / starts_with
    val d = graft.Engine.sql(spark,
      "SELECT array_to_string(['a', null, 'b'], ',', '?') AS j, " +
        "starts_with('hello', 'he') AS sw")
    val dr = d.head()
    assert(dr.getString(0) == "a,?,b" && dr.getBoolean(1))
    // the single database/catalog is 'crate'
    // (CurrentDatabaseFunctionTest: current_database() and the bare
    // CURRENT_CATALOG keyword both resolve to it)
    val db = graft.Engine.sql(spark,
      "SELECT current_database() AS a, current_catalog AS b").head()
    assert(db.getString(0) == "crate" && db.getString(1) == "crate")
    // pg_get_function_result: NULL for null/non-oid inputs
    // (PgGetFunctionResultFunctionTest)
    val fr = spark.sql("SELECT pg_get_function_result(NULL) AS a, " +
      "pg_get_function_result(0) AS b, pg_get_function_result(-14) AS c").head()
    (0 until 3).foreach(i => assert(fr.isNullAt(i)))
  }

  test("btrim with custom chars and negative array subscripts") {
    val r = spark.sql(
      """SELECT trim(BOTH 'x' FROM 'xxhixx') AS t,
                element_at(array(1, 2, 3), -1) AS last""").head()
    assert(r.getString(0) == "hi" && r.getInt(1) == 3)
  }
}

class KnnMatchSpec extends SparkTestBase {
  test("knn_match single-query signature returns k nearest with self first") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val q7 = emb.filter(org.apache.spark.sql.functions.col("vec_id") === 7)
      .head().getSeq[Float](1).toArray
    val res = graft.operators.Similarity.knnMatch(emb, q7, k = 3)
    val ids = res.select("vec_id").collect().map(_.getLong(0))
    assert(ids.length == 3 && ids.head == 7L)
  }
}

class DialectDdlSpec extends SparkTestBase {
  private def t(in: String): String = Dialect.translateDdl(in)

  test("scalar types, arrays, objects, geo, ip map to Spark DDL") {
    assert(t("CREATE TABLE t (id BIGINT PRIMARY KEY, name TEXT NOT NULL, ip_addr IP)") ==
      "CREATE TABLE t (id BIGINT, name STRING NOT NULL, ip_addr STRING) USING parquet")
    assert(t("CREATE TABLE t (tags ARRAY(TEXT), scores ARRAY(DOUBLE))") ==
      "CREATE TABLE t (tags ARRAY<STRING>, scores ARRAY<DOUBLE>) USING parquet")
    assert(t("CREATE TABLE t (meta OBJECT(DYNAMIC) AS (a INT, b TEXT), free OBJECT)") ==
      "CREATE TABLE t (meta STRUCT<a: INT, b: STRING>, free MAP<STRING,STRING>) USING parquet")
    assert(t("CREATE TABLE t (loc GEO_POINT, shape GEO_SHAPE, ts TIMESTAMP WITH TIME ZONE)") ==
      "CREATE TABLE t (loc ARRAY<DOUBLE>, shape STRING, ts TIMESTAMP) USING parquet")
    assert(t("CREATE TABLE t (v DECIMAL(10,2), s VARCHAR(20))") ==
      "CREATE TABLE t (v DECIMAL(10,2), s VARCHAR(20)) USING parquet")
  }

  test("nested objects recurse") {
    assert(t("CREATE TABLE t (o OBJECT AS (inner OBJECT AS (x INT), ys ARRAY(LONG)))") ==
      "CREATE TABLE t (o STRUCT<inner: STRUCT<x: INT>, ys: ARRAY<BIGINT>>) USING parquet")
  }

  test("sharding, partitioning, constraints and settings") {
    assert(t("""CREATE TABLE IF NOT EXISTS doc.metrics (
                  ts TIMESTAMP, host TEXT, val DOUBLE,
                  PRIMARY KEY (ts, host),
                  INDEX host_ft USING FULLTEXT (host) WITH (analyzer = 'english'))
                CLUSTERED BY (host) INTO 6 SHARDS
                PARTITIONED BY (ts)
                WITH (number_of_replicas = 1)""") ==
      "CREATE TABLE doc.metrics (ts TIMESTAMP, host STRING, val DOUBLE) USING parquet " +
        "PARTITIONED BY (ts) CLUSTERED BY (host) INTO 6 BUCKETS")
    // routing without a column: bucket spec dropped
    assert(t("CREATE TABLE t (x INT) CLUSTERED INTO 4 SHARDS") ==
      "CREATE TABLE t (x INT) USING parquet")
  }

  test("translated DDL executes: create, insert, bucketed read back") {
    spark.sql("DROP TABLE IF EXISTS graft_ddl_t")
    val ddl = t("CREATE TABLE graft_ddl_t (id BIGINT PRIMARY KEY, name TEXT, tags ARRAY(TEXT)) " +
      "CLUSTERED BY (id) INTO 2 SHARDS")
    spark.sql(ddl)
    spark.sql("INSERT INTO graft_ddl_t VALUES (1, 'a', array('x','y')), (2, 'b', array())")
    val rows = spark.sql("SELECT id, name, size(tags) AS n FROM graft_ddl_t ORDER BY id").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq ==
      Seq((1L, "a", 2), (2L, "b", 0)))
    // bucket metadata survived the translation
    val desc = spark.sql("DESCRIBE TABLE EXTENDED graft_ddl_t").collect().map(_.mkString("|")).mkString("\n")
    assert(desc.contains("Num Buckets") && desc.contains("2"))
    spark.sql("DROP TABLE graft_ddl_t")
  }
}

/** Reference scalar long tail: array summary/reshaping scalars, pg_typeof,
  * current_setting (reference ArraySumFunction, ArrayAvgFunction,
  * ArrayUnnestFunction, CollectionCountFunction, ArraySliceFunction,
  * systeminformation/PgTypeofFunction, pg CurrentSettingFunction). */
class ScalarTailSpec extends SparkTestBase {

  test("array_sum/array_avg: null-skipping, null on null/empty, native typing") {
    graft.functions.GraftFunctions.registerAll(spark)
    val r = spark.sql(
      """SELECT array_sum(array(1L, NULL, 3L)) AS s1,
        |       array_sum(array(1.5D, 2.5D)) AS s2,
        |       array_sum(CAST(array() AS ARRAY<BIGINT>)) AS s3,
        |       array_sum(CAST(NULL AS ARRAY<BIGINT>)) AS s4,
        |       array_avg(array(1L, NULL, 3L)) AS a1,
        |       collection_avg(array(2.0D, 4.0D)) AS a2,
        |       collection_mean(array(2.0D, 4.0D)) AS a3""".stripMargin).head()
    assert(r.getLong(0) == 4L, "sum skips embedded nulls, stays integral")
    assert(r.getDouble(1) == 4.0)
    assert(r.isNullAt(2) && r.isNullAt(3))
    assert(r.getDouble(4) == 2.0, "avg divides by non-null count")
    assert(r.getDouble(5) == 3.0 && r.getDouble(6) == 3.0)
  }

  test("array_sum of ARRAY<INT> accumulates in BIGINT past Int.MaxValue") {
    // reference ArraySumFunction.java registers every integral element type
    // with a BIGINT return; accumulating in the element type would throw
    // ARITHMETIC_OVERFLOW under ANSI at 2^31
    graft.functions.GraftFunctions.registerAll(spark)
    val r = spark.sql(
      """SELECT array_sum(array(2000000000, 2000000000, 2000000000)) AS s_int,
        |       array_sum(array(CAST(2 AS SMALLINT), CAST(3 AS SMALLINT))) AS s_small,
        |       array_sum(array(CAST(1.5 AS FLOAT), CAST(2.5 AS FLOAT))) AS s_float""".stripMargin).head()
    assert(r.getLong(0) == 6000000000L)
    assert(r.getLong(1) == 5L)
    // FLOAT+BIGINT coerces to DOUBLE in Spark — float arrays sum in double
    // (wider than the reference's REAL return; precision upgrade, not loss)
    assert(math.abs(r.getDouble(2) - 4.0) < 1e-6)
  }

  test("array_unnest flattens one level and skips null inner arrays") {
    val r = spark.sql(
      """SELECT array_unnest(array(array(1, 2), NULL, array(3))) AS u1,
        |       array_unnest(CAST(NULL AS ARRAY<ARRAY<INT>>)) AS u2,
        |       array_unnest(array(array(array(1)), array(array(2)))) AS u3""".stripMargin).head()
    assert(r.getSeq[Int](0) == Seq(1, 2, 3))
    assert(r.isNullAt(1))
    assert(r.getSeq[Seq[Int]](2) == Seq(Seq(1), Seq(2)), "only ONE level removed")
  }

  test("collection_count counts nulls; array_slice 1-based inclusive, clamped") {
    val r = spark.sql(
      """SELECT collection_count(array(1, NULL, 3)) AS c1,
        |       collection_count(CAST(NULL AS ARRAY<INT>)) AS c2,
        |       array_slice(array(10, 20, 30, 40), 2, 3) AS sl1,
        |       array_slice(array(10, 20, 30, 40), 3, 99) AS sl2,
        |       array_slice(array(10, 20, 30, 40), 3, 2) AS sl3""".stripMargin).head()
    assert(r.getLong(0) == 3L, "collection_count includes null elements")
    assert(r.isNullAt(1))
    assert(r.getSeq[Int](2) == Seq(20, 30))
    assert(r.getSeq[Int](3) == Seq(30, 40), "to clamped to array length")
    assert(r.getSeq[Int](4) == Seq.empty, "from > to yields empty, not error")
  }

  test("pg_typeof returns CrateDB type display names as plan-time constants") {
    val r = spark.sql(
      """SELECT pg_typeof(1) AS t1,
        |       pg_typeof(8765134432441) AS t2,
        |       pg_typeof('x') AS t3,
        |       pg_typeof(1.5D) AS t4,
        |       pg_typeof(CAST(NULL AS BIGINT)) AS t5,
        |       pg_typeof(array(1, 2)) AS t6,
        |       pg_typeof(map('k', 1)) AS t7,
        |       pg_typeof(current_timestamp) AS t8""".stripMargin).head()
    assert(r.getString(0) == "integer" && r.getString(1) == "bigint")
    assert(r.getString(2) == "text" && r.getString(3) == "double precision")
    assert(r.getString(4) == "bigint", "type of the BOUND argument, value never read")
    assert(r.getString(5) == "integer_array" && r.getString(6) == "object")
    assert(r.getString(7) == "timestamp with time zone")
  }

  test("current_setting reads the session conf; missing_ok controls the error") {
    val r = spark.sql(
      "SELECT current_setting('spark.sql.shuffle.partitions') AS v, " +
      "current_setting('graft.no_such_setting', true) AS m").head()
    assert(r.getString(0) == "4")
    assert(r.isNullAt(1))
    val err = intercept[Exception](
      spark.sql("SELECT current_setting('graft.no_such_setting')").collect())
    assert(err.getMessage.contains("no_such_setting"))
  }

  test("regexp_instr (Spark-native) matches the PG/CrateDB position contract") {
    val r = spark.sql(
      """SELECT regexp_instr('abc123def', '[0-9]+') AS p1,
        |       regexp_instr('abcdef', '[0-9]+') AS p2""".stripMargin).head()
    assert(r.getInt(0) == 4 && r.getInt(1) == 0)
  }
}

/** BLAKE3 digests pinned to the reference's own test vectors
  * (HashFunctionsTest.java:42-44) — covers empty input, single-block ASCII,
  * and multi-byte UTF-8. Multi-block and multi-chunk tree paths follow the
  * public spec and are exercised structurally below. */
class Blake3Spec extends SparkTestBase {
  import graft.functions.Blake3

  test("reference-pinned vectors") {
    assert(Blake3.hexDigest("") ==
      "af1349b9f5f9a1a6a0404dea36dcc9499bcb25c9adc112b7cc9a93cae41f3262")
    assert(Blake3.hexDigest("crate") ==
      "012efcab3db1a63a5d50510e48f1fbf3ac26dbd28a3cec099457eff5fefa96aa")
    assert(Blake3.hexDigest("©rate") ==
      "7e60e9aec3049dd63fc695ea89fc20ae8abe5ea32388a5a60cf08d97b9e25ff4")
  }

  test("multi-block and multi-chunk inputs are stable, distinct, and boundary-sensitive") {
    // 64 B (exact block), 65 B, 1024 B (exact chunk), 1025 B, 4096 B, 4097 B:
    // every boundary case hashes, all digests differ, trailing-byte change
    // propagates (tree path actually mixes the last chunk in).
    val sizes = Seq(64, 65, 1024, 1025, 4096, 4097)
    val digests = sizes.map(n => Blake3.hexDigest("x" * n))
    assert(digests.distinct.size == sizes.size)
    assert(digests.forall(_.length == 64))
    assert(Blake3.hexDigest("x" * 4096 + "y") != Blake3.hexDigest("x" * 4097))
  }

  test("blake3 is registered in SQL and null-safe") {
    graft.functions.GraftFunctions.registerAll(spark)
    val r = spark.sql(
      "SELECT blake3('crate') AS h, blake3(CAST(NULL AS STRING)) AS n").head()
    assert(r.getString(0) == "012efcab3db1a63a5d50510e48f1fbf3ac26dbd28a3cec099457eff5fefa96aa")
    assert(r.isNullAt(1))
  }
}
