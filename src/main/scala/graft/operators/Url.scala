package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the stage upstream of URL-level dedup, the
  * FIRST dedup of every crawl pipeline (two crawls of the same page
  * almost never carry byte-identical URLs: case drift in the
  * authority, default ports, fragments, tracking parameters, and
  * query-parameter order are all identity-preserving noise).
  *
  * Canonical form, exactly specified (each step is a built-in string
  * function in the Java ∩ RE2 regex dialect — the [[Html]] rule — so
  * the q109 gate replays it verbatim in DuckDB):
  *
  *  1. trim;
  *  2. lowercase the scheme and authority (`scheme://host[:port]`),
  *     leaving path/query/fragment case intact (paths ARE
  *     case-sensitive; hosts are not, RFC 3986 §6.2.2.1);
  *  3. drop the fragment (`#…` — client-side only, RFC 3986 §3.5);
  *  4. drop the DEFAULT port for the scheme (`:80` for http, `:443`
  *     for https — and only for its own scheme);
  *  5. rewrite the query: split on `&`, drop empty params and the
  *     tracking family (`utm_*`, `fbclid`, `gclid`, `msclkid`,
  *     `ref`), sort the survivors bytewise, rejoin — or drop the
  *     `?` entirely if nothing survives.
  *
  * A schemeless string passes through steps 3–5 unchanged in shape
  * (step 2 matches nothing). Scale: one codegen'd projection, no
  * shuffle; URL-level dedup is then [[Dedup.exactDedup]] (or a
  * groupBy) on the canonical column.
  */
object Url {

  /** Query parameters that never affect content identity. The match is
    * CASE-SENSITIVE on purpose: the tracking family is canonically
    * lowercase on the wire, and query-param names are case-sensitive
    * in general (step 2 never folds path/query case), so folding here
    * would conflate `?REF=` — plausibly a content key — with the
    * tracker.
    */
  private val trackingRe = "^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|ref)="

  def canonicalize(c: Column): Column = {
    val u = trim(c)
    val auth = lower(regexp_extract(u,
      "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1))
    val rest = regexp_replace(u,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    val lowered = concat(auth, rest)
    val noFrag = regexp_replace(lowered, "(?s)#.*", "")
    val noPort = regexp_replace(
      regexp_replace(noFrag, "^(http://[^/?#:]*):80([/?#]|$)", "$1$2"),
      "^(https://[^/?#:]*):443([/?#]|$)", "$1$2")
    val base = regexp_replace(noPort, "(?s)\\?.*", "")
    val q = regexp_extract(noPort, "(?s)\\?(.*)", 1)
    val params = array_sort(filter(split(q, "&"),
      p => p =!= "" && !p.rlike(trackingRe)))
    when(size(params) > 0, concat(base, lit("?"), array_join(params, "&")))
      .otherwise(base)
  }
}
