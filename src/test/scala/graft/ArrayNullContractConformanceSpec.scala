package graft

/** Round-15 reference array-family contract vectors, ported from the
  * reference scalar suites that had no counterpart in this tree:
  *
  *  - ArrayAppendFunctionTest / ArrayPrependFunctionTest /
  *    ArrayCatFunctionTest — a NULL array argument is EMPTY, not
  *    strict-null (the reference registers the family NOTNULL and its
  *    evaluate loops skip null inputs), unlike Spark's builtins which
  *    return NULL. `array_append(null, 1)` → [1].
  *  - ArrayUniqueFunctionTest — the 2-array UNION-dedup overload
  *    (first-seen order, null args skipped, convertible inner types
  *    widen), which Spark's 1-arg array_distinct cannot spell.
  *  - ArrayDifferenceFunctionTest / ArrayDifferenceFunction.java —
  *    subtract-set membership per element: KEEPS duplicates and order
  *    (Spark's array_except dedups), strict-null on the FIRST arg
  *    only, null second arg subtracts nothing.
  *  - ArrayOverlapFunctionTest / ArrayOverlapFunction.java:48 —
  *    `!Collections.disjoint`: null ELEMENTS match each other
  *    (Spark's arrays_overlap 3VL returns NULL there); null ARRAY
  *    args stay strict-null; the `&&` operator spelling.
  *  - ArrayMaxFunctionTest / ArrayMinFunctionTest / AsciiFunctionTest /
  *    PiFunctionTest / CollectionAvgFunctionTest /
  *    ConcatWsFunctionTest — Spark's natives already match the
  *    reference arm-for-arm (ascii is CODE-POINT based in Spark 4,
  *    `ascii('💩')` = 128169; concat_ws skips nulls, null separator →
  *    NULL); the vectors pin those equivalences so a regression or an
  *    engine upgrade that breaks them fails here first.
  */
class ArrayNullContractConformanceSpec extends SparkTestBase {

  private def one(sql: String) = {
    graft.functions.GraftFunctions.registerAll(spark)
    Engine.sql(spark, sql).collect()(0)
  }
  private def arr(sql: String): Seq[Any] = {
    val r = one(sql)
    if (r.isNullAt(0)) null else r.getSeq[Any](0)
  }

  test("array_append: null array is empty (ArrayAppendFunctionTest)") {
    assert(arr("SELECT array_append(ARRAY(10,20), 30)") == Seq(10, 20, 30))
    assert(arr("SELECT array_append(NULL, 1)") == Seq(1))
    assert(arr("SELECT array_append(CAST(NULL AS ARRAY<INT>), 1)") == Seq(1))
    assert(arr("SELECT array_append(ARRAY(), 1)") == Seq(1))
    assert(arr("SELECT array_append(ARRAY(NULL, 1), NULL)") == Seq(null, 1, null))
    assert(arr("SELECT array_append(ARRAY(1,2,3), NULL)") == Seq(1, 2, 3, null))
    // convertible inner types widen (testDifferentConvertableInnerTypesLong)
    assert(arr("SELECT array_append(ARRAY(1)::long[], 2::int)") == Seq(1L, 2L))
  }

  test("array_prepend: null array is empty (ArrayPrependFunctionTest)") {
    assert(arr("SELECT array_prepend(1, CAST(NULL AS ARRAY<INT>))") == Seq(1))
    assert(arr("SELECT array_prepend(NULL, NULL)") == Seq(null))
    assert(arr("SELECT array_prepend(NULL, ARRAY(2,3))") == Seq(null, 2, 3))
    assert(arr("SELECT array_prepend(1, ARRAY(2,3))") == Seq(1, 2, 3))
  }

  test("array_cat: null args skipped, 2-arg only (ArrayCatFunctionTest)") {
    assert(arr("SELECT array_cat(ARRAY(10,20), ARRAY(10,30))") == Seq(10, 20, 10, 30))
    assert(arr("SELECT array_cat(ARRAY(1,2,3), CAST(NULL AS ARRAY<INT>))") == Seq(1, 2, 3))
    assert(arr("SELECT array_cat(CAST(NULL AS ARRAY<INT>), ARRAY(1))") == Seq(1))
    // both-null → EMPTY, not NULL (NOTNULL feature; the evaluate loop
    // returns the accumulated list)
    assert(arr("SELECT array_cat(CAST(NULL AS ARRAY<INT>), CAST(NULL AS ARRAY<INT>))") == Seq())
    // null elements survive concatenation (testNullElements)
    assert(arr("SELECT array_cat(ARRAY(1,NULL,3), ARRAY(NULL,2,3))") ==
      Seq(1, null, 3, null, 2, 3))
    // convertible inner types (testDifferentConvertableInnerTypes)
    assert(arr("SELECT array_cat(ARRAY(1)::int[], ARRAY(1L))") == Seq(1L, 1L))
    // exactly two arguments — loud (testThreeArguments/testOneArgument)
    val e = intercept[Exception](one("SELECT array_cat(ARRAY(1), ARRAY(2), ARRAY(3))"))
    assert(e.getMessage.contains("array_cat takes exactly 2 arguments"))
  }

  test("array_unique: 2-array union-dedup overload (ArrayUniqueFunctionTest)") {
    assert(arr("SELECT array_unique(ARRAY(10,20), ARRAY(10,30))") == Seq(10, 20, 30))
    assert(arr("SELECT array_unique(ARRAY(1), CAST(NULL AS ARRAY<INT>))") == Seq(1))
    assert(arr("SELECT array_unique(ARRAY('foo','bar','baz','baz'))") ==
      Seq("foo", "bar", "baz"))
    // convertible inner types widen before dedup
    // (testDifferentButConvertableInnerTypes: [10,20]+[10.1,20.0] →
    // [10.0, 20.0, 10.1])
    assert(arr("SELECT array_unique(ARRAY(10,20), ARRAY(10.1D, 20.0D))") ==
      Seq(10.0, 20.0, 10.1))
    // nested arrays stay comparable (testArrayUniqueOnNestedArray...)
    assert(arr("SELECT array_unique(ARRAY(ARRAY(0,0),ARRAY(1,1)), ARRAY(ARRAY(0,0),ARRAY(1,1)))") ==
      Seq(Seq(0, 0), Seq(1, 1)))
  }

  test("array_difference: keeps duplicates, asymmetric null (ArrayDifferenceFunctionTest)") {
    assert(arr("SELECT array_difference(ARRAY(10,20), ARRAY(10,30))") == Seq(20))
    assert(arr("SELECT array_difference(ARRAY(), ARRAY(10,30))") == Seq())
    // duplicates preserved — the reference filters per-element, it does
    // not dedup like Spark's array_except
    assert(arr("SELECT array_difference(ARRAY(1,1,2), ARRAY(2))") == Seq(1, 1))
    // null second arg subtracts nothing; null FIRST arg is NULL
    assert(arr("SELECT array_difference(ARRAY(1), CAST(NULL AS ARRAY<INT>))") == Seq(1))
    assert(arr("SELECT array_difference(CAST(NULL AS ARRAY<INT>), ARRAY(1))") == null)
    // nested arrays compare structurally
    assert(arr("SELECT array_difference(ARRAY(ARRAY(1,2),ARRAY(1,3)), ARRAY(ARRAY(1,2)))") ==
      Seq(Seq(1, 3)))
    // null elements: null in b removes nulls from a (subtract-set
    // membership via null-safe equality)
    assert(arr("SELECT array_difference(ARRAY(1,NULL,2), ARRAY(CAST(NULL AS INT)))") == Seq(1, 2))
  }

  test("array_overlap: null elements match, strict null arrays, && (ArrayOverlapFunctionTest)") {
    def b(sql: String): Any = { val r = one(sql); if (r.isNullAt(0)) null else r.getBoolean(0) }
    assert(b("SELECT array_overlap(ARRAY(1,2), ARRAY(2,3))") == true)
    assert(b("SELECT array_overlap(ARRAY(1,2), ARRAY(3,4))") == false)
    assert(b("SELECT array_overlap(ARRAY(1,2), CAST(NULL AS ARRAY<INT>))") == null)
    assert(b("SELECT array_overlap(CAST(NULL AS ARRAY<INT>), ARRAY(1,2))") == null)
    // Collections.disjoint: null elements are VALUES that match — not 3VL
    assert(b("SELECT array_overlap(ARRAY(1, NULL), ARRAY(CAST(NULL AS INT)))") == true)
    assert(b("SELECT array_overlap(ARRAY(1, 2), ARRAY(3, NULL))") == false)
    // nested arrays (test_overlap_nested_arrays)
    assert(b("SELECT array_overlap(ARRAY(ARRAY(1,2),ARRAY(2,3)), ARRAY(ARRAY(2,3),ARRAY(4,5)))") == true)
    assert(b("SELECT array_overlap(ARRAY(ARRAY(1,2),ARRAY(2,3)), ARRAY(ARRAY(2,4),ARRAY(4,5)))") == false)
    // the operator spelling (test_overlap_operator)
    assert(b("SELECT ARRAY(1,2) && ARRAY(2,3)") == true)
  }

  test("array_max/array_min skip nulls (ArrayMaxFunctionTest/ArrayMinFunctionTest)") {
    val r = one("SELECT array_max(ARRAY(NULL, 1)) AS a, array_min(ARRAY(NULL, 3, 2)) AS b")
    assert(r.getInt(0) == 1 && r.getInt(1) == 2)
    assert(one("SELECT array_max(CAST(ARRAY(NULL,NULL) AS ARRAY<INT>))").isNullAt(0))
    assert(one("SELECT array_max(CAST(NULL AS ARRAY<INT>))").isNullAt(0))
    assert(one("SELECT array_max(CAST(ARRAY() AS ARRAY<INT>))").isNullAt(0))
    assert(one("SELECT array_min(CAST(NULL AS ARRAY<INT>))").isNullAt(0))
  }

  test("ascii is code-point based (AsciiFunctionTest)") {
    val r = one("SELECT ascii('a') AS a, ascii('ab') AS b, ascii('') AS c, ascii('💩') AS d")
    assert(r.getInt(0) == 97 && r.getInt(1) == 97 && r.getInt(2) == 0)
    assert(r.getInt(3) == 128169)
    assert(one("SELECT ascii(NULL)").isNullAt(0))
  }

  test("concat_ws arms (ConcatWsFunctionTest) and pi") {
    val r = one("SELECT concat_ws(',', '535 Mission St.', '14th floor', 'San Francisco', 'CA', '94105') AS a, " +
      "concat_ws(',', NULL, 'abcde', 2, NULL, 22) AS b, " +
      "concat_ws('|', 'foo', 3) AS c, concat_ws(';', 3, 2, 'foo') AS d, " +
      "concat_ws(',', NULL) AS e, pi() AS f")
    assert(r.getString(0) == "535 Mission St.,14th floor,San Francisco,CA,94105")
    assert(r.getString(1) == "abcde,2,22")
    assert(r.getString(2) == "foo|3")
    assert(r.getString(3) == "3;2;foo")
    assert(r.getString(4) == "")
    assert(r.getDouble(5) == Math.PI)
    // null separator → NULL (testNullSeparatorReturnsNull)
    assert(one("SELECT concat_ws(NULL, 'abcde', '2')").isNullAt(0))
  }

  test("collection_avg (CollectionAvgFunctionTest)") {
    assert(one("SELECT collection_avg(ARRAY(3L, 7L))").getDouble(0) == 5.0)
  }

  test("_map pairwise constructor (arithmetic/MapFunctionTest)") {
    val r = one("SELECT to_json(_map('foo', 10)) AS a, " +
      "to_json(_map(10, 2)) AS b, " +
      "to_json(_map('a', 1, 'b', 2)) AS c")
    assert(r.getString(0) == """{"foo":10}""")
    assert(r.getString(1) == """{"10":2}""")   // keys stringify
    assert(r.getString(2) == """{"a":1,"b":2}""")
    val e = intercept[Exception](one("SELECT _map('foo', 1, 'bar')"))
    assert(e.getMessage.contains("pairs"))
  }

  test("|| operator type dispatch (ConcatFunction.java op_|| family)") {
    // array || array — null-skipping array_cat
    assert(arr("SELECT ARRAY(1,2) || ARRAY(3)") == Seq(1, 2, 3))
    assert(arr("SELECT ARRAY(1,2) || CAST(NULL AS ARRAY<INT>)") == Seq(1, 2))
    assert(arr("SELECT ARRAY(1,2) || NULL") == Seq(1, 2))
    assert(arr("SELECT CAST(NULL AS ARRAY<INT>) || ARRAY(1)") == Seq(1))
    // array || element — append, null ELEMENT ignored (the operator
    // form only: ArrayAppendFunction's calledByOperator branch, where
    // the array_append FUNCTION appends the null)
    assert(arr("SELECT ARRAY(1,2) || 3") == Seq(1, 2, 3))
    assert(arr("SELECT ARRAY(1,2) || CAST(NULL AS INT)") == Seq(1, 2))
    // element || array — prepend
    assert(arr("SELECT 0 || ARRAY(1,2)") == Seq(0, 1, 2))
    assert(arr("SELECT CAST(NULL AS INT) || ARRAY(1,2)") == Seq(1, 2))
    // strings stay STRICT-null, and chaining is left-associative
    val s = one("SELECT 'a' || 'b' || 'c' AS x, 'a' || CAST(NULL AS STRING) AS y")
    assert(s.getString(0) == "abc" && s.isNullAt(1))
    // the concat() FUNCTION on arrays is the null-skipping array_cat
    assert(arr("SELECT concat(ARRAY(1,2,3), CAST(NULL AS ARRAY<INT>))") == Seq(1, 2, 3))
  }
}
