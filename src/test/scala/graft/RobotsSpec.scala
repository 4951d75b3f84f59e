package graft

import org.apache.spark.sql.functions._
import graft.sources.Robots
import graft.sources.Robots.Rule

/** RFC 9309 semantics pinned example by example (group selection,
  * longest-match, wildcards/anchors, tie-to-allow, empty values), plus
  * the broadcast-join Spark face.
  */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  test("group selection: exact agent beats *, groups with the same agent merge") {
    val txt =
      """User-agent: *
        |Disallow: /
        |
        |User-agent: graftbot
        |Allow: /public/
        |
        |# a second graftbot group later in the file merges in
        |User-agent: GRAFTBOT
        |Disallow: /public/private/
        |""".stripMargin
    val rules = Robots.parse(txt, "graftbot")
    assert(rules == Seq(Rule(true, "/public/"), Rule(false, "/public/private/")),
      rules.toString)
    // an unrelated agent falls to the * group
    assert(Robots.parse(txt, "otherbot") == Seq(Rule(false, "/")))
    // Per the RFC grammar, user-agent lines separated only by blank lines
    // CHAIN into one group — so this spelling blocks graftbot too:
    val chained = "User-agent: graftbot\n\nUser-agent: *\nDisallow: /"
    assert(Robots.parse(chained, "graftbot") == Seq(Rule(false, "/")))
    // ...while a rule line (even a dropped empty-value one) closes the
    // group: a MATCHING group with no effective rules means allowed —
    // NOT a fall-through to *.
    val emptyGroup = "User-agent: graftbot\nAllow:\n\nUser-agent: *\nDisallow: /"
    assert(Robots.parse(emptyGroup, "graftbot").isEmpty)
    // consecutive user-agent lines share one group's rules
    val shared = "User-agent: a\nUser-agent: b\nDisallow: /x"
    assert(Robots.parse(shared, "a") == Seq(Rule(false, "/x")))
    assert(Robots.parse(shared, "b") == Seq(Rule(false, "/x")))
  }

  test("longest match wins; ties go to allow; empty rules allow everything") {
    val rules = Seq(Rule(false, "/"), Rule(true, "/page"))
    assert(Robots.allowed(rules, "/page.html"))
    assert(!Robots.allowed(rules, "/other"))
    // equal octets, conflicting verdicts → allow (RFC 9309 §2.2.2)
    val tie = Seq(Rule(false, "/p"), Rule(true, "/p"))
    assert(Robots.allowed(tie, "/p/x"))
    assert(Robots.allowed(Seq.empty, "/anything"))
    // rules before any user-agent line are ignored entirely
    assert(Robots.parse("Disallow: /\nUser-agent: *\nAllow: /a", "bot")
      == Seq(Rule(true, "/a")))
  }

  test("wildcards and end anchors") {
    val rules = Seq(Rule(false, "/*.gif$"), Rule(false, "/tmp/*"), Rule(true, "/tmp/keep"))
    assert(!Robots.allowed(rules, "/images/cat.gif"))
    assert(Robots.allowed(rules, "/images/cat.gif?v=2")) // $ anchors the END
    assert(!Robots.allowed(rules, "/tmp/scratch"))
    assert(Robots.allowed(rules, "/tmp/keep/file")) // longer allow wins
    // $ mid-pattern is literal-ish only at the end; quote everything else
    assert(!Robots.allowed(Seq(Rule(false, "/a.b")), "/a.b"))
    assert(Robots.allowed(Seq(Rule(false, "/a.b")), "/aXb"),
      "the dot must be literal, not a regex any-char")
  }

  test("pathOf: path+query from a URL, / when absent") {
    assert(Robots.pathOf("https://a.com/x/y?q=1#frag") == "/x/y?q=1")
    assert(Robots.pathOf("https://a.com") == "/")
    assert(Robots.pathOf("https://a.com?q=1") == "/?q=1")
    assert(Robots.pathOf("/already/a/path") == "/already/a/path")
  }

  test("verdicts: broadcast per-domain bodies, missing robots allows, columns kept") {
    val robots = Seq(
      ("a.com", "User-agent: *\nDisallow: /private/\nAllow: /private/ok"),
      ("b.com", "User-agent: graftbot\nDisallow: /")).toDF("domain", "robots_txt")
    val docs = Seq(
      (1L, "HTTP://WWW.A.com/private/x"),      // canonicalized domain → a.com, blocked
      (2L, "http://a.com/private/ok.html"),    // longer allow wins
      (3L, "http://a.com/public"),             // no matching rule → allowed
      (4L, "http://b.com/anything"),           // agent-specific full block
      (5L, "http://c.com/whatever"))           // no robots row → allowed
      .toDF("doc_id", "url")
    val got = Robots.verdicts(spark, docs, "url", robots, "graftbot")
      .select(col("doc_id"), col("robots_allowed"))
      .as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> false, 2L -> true, 3L -> true, 4L -> false, 5L -> true),
      got.toString)
    // the join is a broadcast against the dim-sized robots table
    val p = Robots.verdicts(spark, docs, "url", robots, "graftbot")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
  }

  test("robots-gated frontier: q107's discoveries filter through i18 " +
      "before scheduling") {
    // the composition a polite crawler runs: frontier targets (q105/q107
    // machinery) → robots verdicts → only allowed urls schedule
    val docs = Seq(
      (1L, "<html><body><a href=\"https://t.example/open/a\">x</a>" +
        "<a href=\"https://t.example/private/b\">y</a>" +
        "<a href=\"https://u.example/c\">z</a></body></html>",
        "https://src.example/en/doc/1"))
      .toDF("doc_id", "html", "base_url")
    val frontier = graft.text.HtmlExtract
      .links(docs, "doc_id", "html", "base_url")
      .select(col("target_url")).distinct()
    val robots = Seq(
      ("t.example", "User-agent: *\nDisallow: /private/"))
      .toDF("domain", "robots_txt")
    val gated = Robots.verdicts(spark, frontier, "target_url", robots, "graftbot")
      .filter(col("robots_allowed"))
      .select(col("target_url")).as[String].collect().sorted.toSeq
    // /private/b is disallowed; u.example has no robots row → allowed
    assert(gated == Seq("https://t.example/open/a", "https://u.example/c"), gated)
  }

  test("crawlDelay: selected-group semantics, malformed ignored, merged " +
      "groups take the conservative max; frame face nullable (r16)") {
    // exact-agent group's delay beats *'s
    val body = "User-agent: *\nCrawl-delay: 1\nDisallow: /x\n\n" +
      "User-agent: graftbot\nCrawl-delay: 5.5\nAllow: /\n"
    assert(Robots.crawlDelay(body, "graftbot").contains(5.5))
    assert(Robots.crawlDelay(body, "otherbot").contains(1.0))
    // group selection must NOT change: rules still resolve per RFC
    assert(Robots.parse(body, "graftbot").map(_.pattern) == Seq("/"))
    // malformed / non-positive values are ignored; absent → None
    assert(Robots.crawlDelay("User-agent: *\nCrawl-delay: soon\n", "a").isEmpty)
    assert(Robots.crawlDelay("User-agent: *\nCrawl-delay: -3\n", "a").isEmpty)
    assert(Robots.crawlDelay("User-agent: *\nDisallow: /x\n", "a").isEmpty)
    // lines before any group are ignored (the RFC discipline for rules)
    assert(Robots.crawlDelay("Crawl-delay: 9\nUser-agent: *\n", "a").isEmpty)
    // merged same-agent groups: the conservative (max) delay wins
    val merged = "User-agent: graftbot\nCrawl-delay: 2\nDisallow: /a\n\n" +
      "User-agent: graftbot\nCrawl-delay: 7\nDisallow: /b\n"
    assert(Robots.crawlDelay(merged, "graftbot").contains(7.0))
    // only the FIRST delay of one group counts (duplicate lines ignored)
    assert(Robots.crawlDelay(
      "User-agent: *\nCrawl-delay: 3\nCrawl-delay: 99\n", "a").contains(3.0))
    // the frame face: null where undeclared, composes off robotsBodies
    val delays = Robots.crawlDelays(spark, Seq(
        ("a.example", body),
        ("b.example", "User-agent: *\nDisallow: /x\n"))
      .toDF("domain", "robots_txt"), "graftbot")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(delays == Map("a.example" -> Some(5.5), "b.example" -> None),
      delays.toString)
  }
}
