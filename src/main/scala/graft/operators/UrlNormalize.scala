package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** URL canonicalization + URL-key dedup for web corpora.
  *
  * Training-data pipelines dedup crawls by canonical URL before any
  * content-level pass (the CCNet / RefinedWeb recipe): the same page is
  * fetched as `http://WWW.Site.com/a?utm_source=x#top` and
  * `https://site.com/a`, and content-hash dedup alone pays a full text
  * shuffle to discover what the URL already says. This is the URL-side
  * companion to [[Dedup.exact]] (reference has no twin — the pipeline
  * operators are graft's training-data surface, SURVEY §6).
  *
  * Canonical form: lowercase scheme and host, `www.` prefix stripped,
  * scheme-default ports (80/443) dropped, path percent-decoded, fragment
  * dropped, query parameters percent-decoded, tracking parameters removed
  * (utm_*, gclid-family), remaining parameters sorted by key then value.
  * The output is a DEDUP KEY — decoded for stability, not guaranteed
  * re-fetchable verbatim.
  *
  * Scale shape: `normalizeUrl` is a row-local scalar (map-only); the dedup
  * is one shuffle on the canonical key with a deterministic min-id winner —
  * same discipline as exact text dedup, no skew risk beyond genuinely
  * mega-duplicated URLs (which a `maxDup` cap would catch; web dedup wants
  * them deduped anyway).
  */
object UrlNormalize {

  /** Parameters that identify campaigns/clicks, not content. */
  val trackingParams: Set[String] = Set(
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "utm_id", "gclid", "dclid", "fbclid", "msclkid", "mc_eid", "igshid",
    "ref_src", "cmpid", "s_kwcid")

  def normalize(url: String): String = {
    if (url == null) return null
    val u =
      try new java.net.URI(url.trim)
      catch { case _: java.net.URISyntaxException => return url.trim }
    val scheme = Option(u.getScheme).map(_.toLowerCase).getOrElse("http")
    val host0 = Option(u.getHost).map(_.toLowerCase).getOrElse(return url.trim)
    val host = if (host0.startsWith("www.")) host0.substring(4) else host0
    val port = u.getPort match {
      case -1 => ""
      case 80 if scheme == "http"   => ""
      case 443 if scheme == "https" => ""
      case p => s":$p"
    }
    val path = Option(u.getPath).filter(_.nonEmpty).getOrElse("/")
    def dec(s: String) =
      java.net.URLDecoder.decode(s, java.nio.charset.StandardCharsets.UTF_8)
    val query = Option(u.getRawQuery).filter(_.nonEmpty).map { q =>
      val kept = q.split("&").toSeq
        .filter(_.nonEmpty)
        .map { p =>
          val i = p.indexOf('=')
          if (i < 0) (dec(p), "") else (dec(p.take(i)), dec(p.drop(i + 1)))
        }
        .filterNot { case (k, _) => trackingParams.contains(k.toLowerCase) }
        .sorted
      if (kept.isEmpty) ""
      else "?" + kept.map { case (k, v) => if (v.isEmpty) k else s"$k=$v" }
        .mkString("&")
    }.getOrElse("")
    s"$scheme://$host$port$path$query"
  }

  def registerAll(spark: SparkSession): Unit =
    spark.udf.register("normalize_url", (s: String) => normalize(s))

  def normalizeUrl(c: Column): Column = call_udf("normalize_url", c)

  /** One row per canonical URL: the deterministic winner is the smallest
    * `idCol`. One shuffle on the canonical key. */
  def dedupByUrl(df: DataFrame, urlCol: String, idCol: String): DataFrame = {
    registerAll(df.sparkSession)
    val keyed = df.withColumn("__canon", normalizeUrl(col(urlCol)))
    val winners = keyed.groupBy(col("__canon"))
      .agg(min(col(idCol)).as(idCol))
    keyed.join(winners, Seq("__canon", idCol), "left_semi").drop("__canon")
  }
}
