package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** D62 — URL canonicalization: the normalization pass web-scale
  * corpora run BEFORE URL-keyed dedup/partitioning (CommonCrawl-style
  * pipelines dedupe fetches by canonical URL first; content-level
  * dedup only sees what survives). One logical page hides behind many
  * surface forms — scheme/host case, www prefix, default ports,
  * trailing slashes, tracking parameters, parameter order, fragments —
  * and a key built from the raw string fractures its dedup group.
  *
  * Everything is codegen'd column expressions (regexp_extract +
  * higher-order array ops over the query string) — map-side, zero
  * shuffle; the dedup that follows is D1's keyed aggregation on the
  * canonical key.
  */
object Url {

  private val Pat = "^([A-Za-z]+)://([^/?#]+)([^?#]*)(\\?[^#]*)?(#.*)?$"

  /** Tracking parameters dropped outright (utm_*, click ids). */
  val TrackingParam = "^(utm_[a-z]+|fbclid|gclid|ref)="

  def scheme(url: Column): Column = lower(regexp_extract(url, Pat, 1))

  def host(url: Column): Column =
    regexp_replace(lower(regexp_extract(url, Pat, 2)), "^www\\.", "")

  /** Canonical form: lowercase scheme+host, www. stripped, default
    * port stripped (80 for http, 443 for https), path's trailing
    * slashes stripped, query params minus tracking params sorted
    * byte-wise, fragment dropped. */
  def canonicalize(url: Column): Column = {
    val sch = scheme(url)
    val h0 = host(url)
    val h = when(sch === "http", regexp_replace(h0, ":80$", ""))
      .when(sch === "https", regexp_replace(h0, ":443$", ""))
      .otherwise(h0)
    val path = regexp_replace(regexp_extract(url, Pat, 3), "/+$", "")
    val rawQ = regexp_extract(url, Pat, 4) // "?a=1&b=2" or ""
    val params = filter(
      split(substring(rawQ, 2, 1000000), "&"),
      p => p =!= "" && !p.rlike(TrackingParam))
    val q = when(size(params) > 0,
      concat(lit("?"), array_join(array_sort(params), "&")))
      .otherwise(lit(""))
    concat(sch, lit("://"), h, path, q)
  }
}
