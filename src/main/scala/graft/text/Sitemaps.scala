package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sitemap intake (sitemaps.org protocol — the OTHER public seed channel
  * besides observed anchors): `sitemap.xml` files declare the pages a host
  * WANTS crawled, and `robots.txt` declares where the sitemaps live
  * (`Sitemap:` directives). Parsed expression-only (RE2-safe
  * `regexp_extract_all` + the q93 entity decoder — sitemap locs are
  * XML-escaped, so `&amp;` in a URL must decode before canonicalization),
  * scan-shaped at any crawl size.
  *
  * Composes into the crawl loop: [[graft.sources.Warc.sitemapBodies]]
  * lifts the crawl's own sitemap responses, [[entries]] extracts page
  * URLs (and child-sitemap refs — index files nest), and the s28
  * frontier treats them as zero-citation candidates alongside
  * anchor-cited ones ([[graft.streaming.Streams.sitemapSink]]).
  *
  * Reference lineage: the config-driven ingestion list
  * (2_bronze_ingestion_adf/configs/load_config.csv) — the source system
  * itself declares what to load; a sitemap is that declaration for a web
  * host.
  */
object Sitemaps {

  /** One row per `<loc>` entry of a sitemap body: (`idCol`, kind, url,
    * lastmod) where `kind` is `page` (a `<url>` element of a urlset) or
    * `sitemap` (a `<sitemap>` element of an index file — fetch and parse
    * those too), `url` is the entity-decoded trimmed loc, and `lastmod`
    * the optional element (empty string when absent — sitemaps omit it
    * freely). Tag-attribute tolerant; malformed elements without a loc
    * are dropped.
    */
  def entries(docs: DataFrame, idCol: String, xmlCol: String): DataFrame = {
    def locOf(e: Column): Column =
      HtmlExtract.decodeEntities(
        trim(regexp_extract(e, "(?is)<loc[^>]*>\\s*(.*?)\\s*</loc>", 1)))
    def lastmodOf(e: Column): Column =
      trim(regexp_extract(e, "(?is)<lastmod[^>]*>\\s*(.*?)\\s*</lastmod>", 1))
    // explode_outer (the MinHash.shingleRows dodge): plain explode infers
    // a size()>0 filter re-running the entry regex per document in an
    // interpreted Filter; the existing length filter drops the null row.
    def side(tag: String, kind: String): DataFrame =
      docs.select(col(idCol),
          explode_outer(regexp_extract_all(col(xmlCol),
            lit(s"(?is)<$tag[^>]*>.*?</$tag>"), lit(0))).as("_e"))
        .select(col(idCol), lit(kind).as("kind"),
          locOf(col("_e")).as("url"), lastmodOf(col("_e")).as("lastmod"))
        .filter(length(col("url")) > 0)
    side("url", "page").unionByName(side("sitemap", "sitemap"))
  }

  /** `Sitemap:` directives of robots.txt bodies — (domainCol, sitemap_url)
    * per directive (RFC 9309 §2.3 treats them as opaque non-group lines;
    * case-insensitive key, one URL per line). The discovery channel for
    * hosts whose sitemaps aren't at the default path.
    */
  def fromRobots(robots: DataFrame, domainCol: String,
      txtCol: String): DataFrame =
    robots.select(col(domainCol),
        // explode_outer: the entries() rationale; length filter drops nulls
        explode_outer(regexp_extract_all(col(txtCol),
          lit("(?im)^[ \\t]*sitemap[ \\t]*:[ \\t]*(\\S+)"), lit(1)))
          .as("sitemap_url"))
      .filter(length(col("sitemap_url")) > 0)
}
