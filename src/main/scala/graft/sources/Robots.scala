package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** RFC 9309 robots.txt evaluation — the compliance gate between the i17
  * WARC intake and everything downstream: a curation pipeline re-serving
  * or training on paths the site disallowed is a policy bug, and crawl
  * archives carry the robots.txt bodies to check against (they are
  * fetched records like any other).
  *
  * Semantics per RFC 9309 (public spec):
  *  - groups: one or more `User-agent:` lines followed by rules; rules
  *    before any group are ignored; `#` starts a comment; directive names
  *    are case-insensitive;
  *  - group selection: the group(s) whose user-agent token equals the
  *    crawler's (case-insensitive) — ALL of them merged; only when none
  *    match does the `*` group apply; no match at all → everything
  *    allowed;
  *  - rule matching: byte-prefix with `*` (any run) and a terminal `$`
  *    (end anchor); the rule with the MOST OCTETS in its pattern wins;
  *    on a tie, allow wins; an empty `Disallow:` value matches nothing.
  *
  * Scale: robots tables are DOMAIN-cardinality (dim-sized next to any
  * crawl), so the Spark face broadcast-joins bodies by domain and
  * evaluates per partition with a per-domain parse cache — each
  * partition parses each domain's body once, rows stream through the
  * compiled rules (the multimodal decode-batch shape).
  */
object Robots {

  /** One merged, selection-resolved rule: `allow` + its match pattern.
    * The compiled form is per-instance and lazy — each rule compiles once
    * per JVM however many rows stream through it.
    */
  final case class Rule(allow: Boolean, pattern: String) {
    /** Pattern octet count — RFC 9309's specificity measure. */
    def weight: Int = pattern.length
    @transient lazy val rx: java.util.regex.Pattern = compile(pattern)
  }

  /** One parsed group: user-agent tokens (lowercased), rules, and the
    * group's `Crawl-delay:` seconds if one parsed (de-facto extension —
    * not in RFC 9309, but honored by major crawlers and the politeness
    * number a frontier scheduler wants).
    */
  private final case class Group(
      uaTokens: scala.collection.mutable.ArrayBuffer[String],
      rules: scala.collection.mutable.ArrayBuffer[Rule],
      var delay: Option[Double])

  /** The shared group walk: the RFC grammar, one pass, file order. */
  private def parseGroups(robotsTxt: String): Seq[Group] = {
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    var inUaRun = false // consecutive user-agent lines extend ONE group
    for (raw <- Option(robotsTxt).getOrElse("").linesIterator) {
      val line = raw.indexOf('#') match {
        case -1 => raw
        case i => raw.substring(0, i)
      }
      val sep = line.indexOf(':')
      if (sep > 0) {
        val key = line.substring(0, sep).trim.toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(sep + 1).trim
        key match {
          case "user-agent" =>
            if (!inUaRun) groups += Group(
              scala.collection.mutable.ArrayBuffer.empty[String],
              scala.collection.mutable.ArrayBuffer.empty[Rule], None)
            groups.last.uaTokens += value.toLowerCase(java.util.Locale.ROOT)
            inUaRun = true
          case "allow" | "disallow" =>
            inUaRun = false
            if (groups.nonEmpty && value.nonEmpty)
              groups.last.rules += Rule(key == "allow", value)
            // empty value: matches nothing — RFC drops the rule entirely
          case "crawl-delay" =>
            inUaRun = false
            // positive finite seconds only; malformed values are ignored
            // like any unknown line (lines before any group too)
            if (groups.nonEmpty && groups.last.delay.isEmpty)
              try {
                val d = value.toDouble
                if (d > 0 && java.lang.Double.isFinite(d))
                  groups.last.delay = Some(d)
              } catch { case _: NumberFormatException => () }
          case _ => inUaRun = false // sitemap, unknown: ignored
        }
      }
    }
    groups.toSeq
  }

  /** The groups selected for `agent` — exact-token groups (all of them,
    * merged) when any exists, else the `*` groups.
    */
  private def selectGroups(robotsTxt: String, agent: String): Seq[Group] = {
    val agentLc = agent.toLowerCase(java.util.Locale.ROOT)
    val groups = parseGroups(robotsTxt)
    val exact = groups.filter(_.uaTokens.contains(agentLc))
    if (exact.nonEmpty) exact
    else groups.filter(_.uaTokens.contains("*"))
  }

  /** Parse `robotsTxt` and resolve group selection for `agent` (product
    * token, case-insensitive). Returns the merged rule list — empty means
    * everything is allowed.
    */
  def parse(robotsTxt: String, agent: String): Seq[Rule] =
    selectGroups(robotsTxt, agent).flatMap(_.rules.toSeq)

  /** Crawl-delay seconds the selected group asks of `agent` — None when
    * no selected group declares one (or the value is malformed). When
    * several exact-token groups merge and disagree, the MAXIMUM wins —
    * the conservative reading: the site asked for at least that much
    * restraint in one of the agent's own groups. A crawl scheduler
    * consumes this next to the frontier's per-host cap.
    */
  def crawlDelay(robotsTxt: String, agent: String): Option[Double] = {
    val ds = selectGroups(robotsTxt, agent).flatMap(_.delay)
    if (ds.isEmpty) None else Some(ds.max)
  }

  /** (domain, crawl_delay) frame over a robots-bodies table
    * ([[graft.sources.Warc.robotsBodies]] shape) — null where no delay is
    * declared. Dim-sized; the per-partition parse is the [[verdicts]]
    * shape without the row stream.
    */
  def crawlDelays(spark: SparkSession, robots: DataFrame,
      agent: String): DataFrame = {
    import spark.implicits._
    robots.select(col("domain").cast("string"),
        col("robots_txt").cast("string"))
      .as[(String, String)]
      .mapPartitions(_.map { case (d, txt) => (d, crawlDelay(txt, agent)) })
      .toDF("domain", "crawl_delay")
  }

  /** Compile a rule pattern: byte-prefix match with `*` runs and an
    * optional terminal `$` anchor.
    */
  private def compile(pattern: String): java.util.regex.Pattern = {
    val sb = new StringBuilder("^")
    val anchored = pattern.endsWith("$")
    val body = if (anchored) pattern.dropRight(1) else pattern
    body.foreach {
      case '*' => sb.append(".*")
      case c => sb.append(java.util.regex.Pattern.quote(c.toString))
    }
    if (anchored) sb.append("$")
    java.util.regex.Pattern.compile(sb.toString)
  }

  /** Longest-match verdict for `path` (path + optional query, starting at
    * `/`) under merged `rules`. Empty rules → allowed; tie → allow.
    */
  def allowed(rules: Seq[Rule], path: String): Boolean = {
    val p = if (path.isEmpty) "/" else path
    var bestWeight = -1
    var bestAllow = true
    rules.foreach { r =>
      if (r.weight >= bestWeight && r.rx.matcher(p).lookingAt()) {
        if (r.weight > bestWeight) { bestWeight = r.weight; bestAllow = r.allow }
        else bestAllow = bestAllow || r.allow // tie: allow wins
      }
    }
    bestAllow
  }

  /** The path+query of a URL (everything from the first `/` after the
    * authority; `/` when absent). Fragment is ignored (never sent).
    */
  def pathOf(url: String): String = {
    val noFrag = url.indexOf('#') match {
      case -1 => url
      case i => url.substring(0, i)
    }
    val schemeEnd = noFrag.indexOf("://")
    val start = if (schemeEnd < 0) 0 else schemeEnd + 3
    val slash = noFrag.indexOf('/', start)
    val q = noFrag.indexOf('?', start)
    if (slash >= 0 && (q < 0 || slash < q)) noFrag.substring(slash)
    else if (q >= 0) "/" + noFrag.substring(q) // query with no path
    else "/"
  }

  /** Verdict the `urlCol` of `docs` against per-domain robots bodies:
    * adds `robots_allowed`. `robots` is (domain, robots_txt) —
    * dim-sized, broadcast; a URL whose domain carries no robots row is
    * allowed (RFC: unavailable robots.txt means no restrictions). Bodies
    * parse ONCE per (partition, domain) and rows stream through the
    * compiled rules.
    */
  def verdicts(spark: SparkSession, docs: DataFrame, urlCol: String,
      robots: DataFrame, agent: String): DataFrame = {
    val joined = docs.join(
      broadcast(robots.select(col("domain").as("_r_domain"),
        col("robots_txt").as("_r_txt"))),
      graft.text.Urls.domain(graft.text.Urls.canonicalize(col(urlCol)))
        === col("_r_domain"),
      "left")
    val jCols = joined.columns
    val urlIdx = jCols.indexOf(urlCol)
    val txtIdx = jCols.indexOf("_r_txt")
    val keepIdx = jCols.indices.filterNot(i => jCols(i).startsWith("_r_")).toArray
    val outSchema = org.apache.spark.sql.types.StructType(
      joined.schema.fields.filterNot(_.name.startsWith("_r_")) :+
        org.apache.spark.sql.types.StructField("robots_allowed",
          org.apache.spark.sql.types.BooleanType, nullable = false))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    joined.mapPartitions { it =>
      val cache = scala.collection.mutable.HashMap.empty[String, Seq[Rule]]
      it.map { row =>
        val txt = row.getString(txtIdx)
        val ok = txt == null || {
          val rules = cache.getOrElseUpdate(txt, parse(txt, agent))
          allowed(rules, pathOf(row.getString(urlIdx)))
        }
        org.apache.spark.sql.Row.fromSeq(
          keepIdx.map(row.get).toSeq :+ ok)
      }
    }(enc)
  }
}
