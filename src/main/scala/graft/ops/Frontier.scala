package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Frontier scheduling with a politeness BUDGET (the i18 → q107/s28
  * composition): robots `Crawl-delay` was parsed
  * ([[graft.sources.Robots.crawlDelays]]) but never consumed — the
  * scheduler applied a flat per-host cap `k`. This derives the cap a
  * real crawler runs: a host asking for `delay` seconds between fetches
  * can absorb at most `windowSec / delay` fetches in a scheduling
  * window, so
  * `k_host = min(k, floor(windowSec / delay))` where a delay is
  * declared (undeclared or non-positive delays keep `k` — RFC: absent
  * means no restriction, and a hostile `Crawl-delay: 0` must not divide
  * the budget by zero). A `Crawl-delay` larger than the window yields
  * ZERO scheduled fetches this window — honest: the host asked to be
  * fetched less often than the scheduler wakes up.
  *
  * Scale shape: the ranking is [[Windows.topNPerGroup]] (host count is
  * catalog-bounded, never corpus-skewed) and the delay dim is
  * broadcast-joined (domain-scale). `crawl_delay` is emitted on every
  * surviving candidate so the fetcher downstream can pace within its
  * window without re-reading robots.
  */
object Frontier {

  /** Rank `cand` per `hostCol` by `order` and keep the per-host
    * politeness budget. `delays` is (domain, crawl_delay seconds,
    * null = undeclared) — the [[graft.sources.Robots.crawlDelays]]
    * shape. Output = `cand`'s columns + (rn, crawl_delay).
    */
  def schedule(cand: DataFrame, k: Int, delays: Option[DataFrame],
      windowSec: Long = 60, hostCol: String = "target_host",
      order: Seq[Column] = Seq(col("n_citations").desc,
        col("target_url").asc)): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(windowSec > 0, s"windowSec must be positive, got $windowSec")
    val ranked = Windows.topNPerGroup(cand, Seq(hostCol), order, k)
    delays match {
      case None => ranked.withColumn("crawl_delay", lit(null).cast("double"))
      case Some(dl) =>
        val dim = dl.select(col("domain").as("_cd_domain"),
          col("crawl_delay").cast("double").as("crawl_delay"))
        ranked
          .join(broadcast(dim), col(hostCol) === col("_cd_domain"), "left")
          .drop("_cd_domain")
          .filter(col("rn") <= when(
            col("crawl_delay").isNotNull && col("crawl_delay") > 0,
            least(lit(k.toLong), floor(lit(windowSec.toDouble) / col("crawl_delay"))))
            .otherwise(lit(k.toLong)))
    }
  }
}
