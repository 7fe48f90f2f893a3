package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.UserDefinedFunction

/** Geo + network functions from the reference's scalar inventory
  * (SURVEY.md §2.8): haversine `distance`
  * (`server/src/main/java/io/crate/expression/scalar/geo/DistanceFunction.java:57`),
  * `geohash` (`GeoHashFunction.java:35`), `latitude`/`longitude`
  * (`CoordinateFunction.java:31`), and the IP-in-CIDR `<<` operator
  * (`expression/operator/CIDROperator.java:46`).
  *
  * A geo_point is modeled as `array<double>` [lon, lat], matching the
  * reference's `GEO_POINT` representation.
  */
object GeoNetFunctions {

  /** Haversine distance in meters between [lon,lat] points (native exprs). */
  def haversineDistance(p1: Column, p2: Column): Column = {
    val lon1 = radians(element_at(p1, 1)); val lat1 = radians(element_at(p1, 2))
    val lon2 = radians(element_at(p2, 1)); val lat2 = radians(element_at(p2, 2))
    val a = pow(sin((lat2 - lat1) / 2), 2) +
      cos(lat1) * cos(lat2) * pow(sin((lon2 - lon1) / 2), 2)
    lit(2.0 * 6371008.8) * asin(least(lit(1.0), sqrt(a)))
  }

  def latitude(p: Column): Column = element_at(p, 2)
  def longitude(p: Column): Column = element_at(p, 1)

  private val base32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  def geohashString(lon: Double, lat: Double, precision: Int): String = {
    var (minLat, maxLat, minLon, maxLon) = (-90.0, 90.0, -180.0, 180.0)
    val sb = new StringBuilder
    var bit = 0; var ch = 0; var even = true
    while (sb.length < precision) {
      if (even) {
        val mid = (minLon + maxLon) / 2
        if (lon >= mid) { ch = (ch << 1) | 1; minLon = mid } else { ch = ch << 1; maxLon = mid }
      } else {
        val mid = (minLat + maxLat) / 2
        if (lat >= mid) { ch = (ch << 1) | 1; minLat = mid } else { ch = ch << 1; maxLat = mid }
      }
      even = !even
      bit += 1
      if (bit == 5) { sb.append(base32.charAt(ch)); bit = 0; ch = 0 }
    }
    sb.toString
  }

  val geohashUdf: UserDefinedFunction =
    udf((p: Seq[Double], precision: Int) =>
      if (p == null) null else geohashString(p(0), p(1), precision))

  def geohash(p: Column, precision: Int = 12): Column = geohashUdf(p, lit(precision))

  /** Point-in-bounding-box (the `within(point, shape)` fast path for
    * envelope shapes). */
  def withinBBox(p: Column, minLon: Double, minLat: Double,
                 maxLon: Double, maxLat: Double): Column =
    longitude(p).between(minLon, maxLon) && latitude(p).between(minLat, maxLat)

  // ---- polygon ops (GEO_SHAPE subset: planar ring without holes) ----
  // Reference: within/intersects/area on GEO_SHAPE
  // (`expression/scalar/geo/DistanceFunction.java` siblings :40-59). Planar
  // ray-casting / shoelace on the ring vertices — the Spark-side contract
  // (shape as array<array<double>> of [lon,lat]) is what matters; swap in
  // JTS for geodesic fidelity without touching call sites.

  def pointInPolygon(lon: Double, lat: Double, ring: Seq[Seq[Double]]): Boolean = {
    var inside = false
    var i = 0
    var j = ring.length - 1
    while (i < ring.length) {
      val (xi, yi) = (ring(i)(0), ring(i)(1))
      val (xj, yj) = (ring(j)(0), ring(j)(1))
      if (((yi > lat) != (yj > lat)) &&
        (lon < (xj - xi) * (lat - yi) / (yj - yi) + xi)) inside = !inside
      j = i
      i += 1
    }
    inside
  }

  /** Planar ring area via the shoelace formula (square degrees). */
  def ringArea(ring: Seq[Seq[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < ring.length) {
      val k = (i + 1) % ring.length
      s += ring(i)(0) * ring(k)(1) - ring(k)(0) * ring(i)(1)
      i += 1
    }
    math.abs(s) / 2.0
  }

  val withinPolygonUdf: UserDefinedFunction =
    udf((p: Seq[Double], ring: Seq[Seq[Double]]) =>
      if (p == null || ring == null) null
      else Boolean.box(pointInPolygon(p(0), p(1), ring)))

  val areaUdf: UserDefinedFunction =
    udf((ring: Seq[Seq[Double]]) => if (ring == null) null else Double.box(ringArea(ring)))

  def withinPolygon(p: Column, ring: Column): Column = withinPolygonUdf(p, ring)
  def area(ring: Column): Column = areaUdf(ring)

  /** `intersects(ringA, ringB)` on bare rings — JTS-decided since r4 (the
    * r3 vertex-containment shortcut missed edge-crossing concave pairs
    * whose vertices are all outside each other). Full shapes with holes /
    * WKT / GeoJSON live in [[GeoShapeFunctions]]; this keeps the legacy
    * array<array<double>> ring signature on the corrected predicate. */
  val intersectsUdf: UserDefinedFunction =
    udf((a: Seq[Seq[Double]], b: Seq[Seq[Double]]) =>
      if (a == null || b == null) null
      else Boolean.box(GeoShapeFunctions.ringGeometry(a).intersects(GeoShapeFunctions.ringGeometry(b))))
  def intersects(a: Column, b: Column): Column = intersectsUdf(a, b)

  // ---- IPv4 CIDR ----

  def ipv4ToLong(ip: String): Option[Long] = {
    val parts = ip.split('.')
    if (parts.length != 4) return None
    try {
      val octets = parts.map(_.toInt)
      if (octets.exists(o => o < 0 || o > 255)) None
      else Some(octets.foldLeft(0L)((acc, o) => (acc << 8) | o))
    } catch { case _: NumberFormatException => None }
  }

  /** `ip << cidr` membership test, e.g. `'10.0.1.7' << '10.0.0.0/16'` —
    * the reference CIDROperator.containedWithin semantics (r13: strict
    * IPv4 AND IPv6 with LOUD errors on malformed operands, replacing
    * the IPv4-only silently-null form; see plans.CidrUtil). */
  def ipInCidr(ip: String, cidr: String): Boolean =
    graft.plans.CidrUtil.containedWithin(ip, cidr)

  val ipInCidrUdf: UserDefinedFunction =
    udf((ip: String, cidr: String) =>
      if (ip == null || cidr == null) null
      else Boolean.box(graft.plans.CidrUtil.containedWithin(ip, cidr)))

  def inCidr(ip: Column, cidr: Column): Column = ipInCidrUdf(ip, cidr)

  /** Numeric sort key for an IPv4 string — gives the `IP` type the total
    * order the reference's IpType has (`metadata/IpType.java` orders by
    * numeric value, not lexicographically: '9.x' < '10.x'). Fully native
    * (split + arithmetic), codegen'd; null/malformed → null via cast. */
  def ipOrderKey(ip: Column): Column = {
    val p = split(ip, "\\.")
    element_at(p, 1).cast("long") * 16777216L + element_at(p, 2).cast("long") * 65536L +
      element_at(p, 3).cast("long") * 256L + element_at(p, 4).cast("long")
  }

  /** `quote_ident` (PG semantics: quote unless a safe lowercase ident). */
  val quoteIdentUdf: UserDefinedFunction = udf((s: String) =>
    if (s == null) null
    else if (s.nonEmpty && s.forall(c => c.isLower || c.isDigit || c == '_') && !s.head.isDigit) s
    else "\"" + s.replace("\"", "\"\"") + "\"")

  /** `parse_ident('a."b.c"')` → parts, honoring double-quoted segments
    * (reference `expression/scalar/ParseIdentFunction`-equivalent). */
  def parseIdent(s: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inQuote = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '"') {
        if (inQuote && i + 1 < s.length && s.charAt(i + 1) == '"') { cur.append('"'); i += 1 }
        else inQuote = !inQuote
      } else if (c == '.' && !inQuote) { out += cur.toString; cur.clear() }
      else cur.append(c)
      i += 1
    }
    out += cur.toString
    out.toArray
  }

  val parseIdentUdf: UserDefinedFunction =
    udf((s: String) => if (s == null) null else parseIdent(s))
}
