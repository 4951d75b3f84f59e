package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops._

/** A-block query catalog: the reference's relational/ETL semantics
  * re-expressed Spark-first. Each entry has a DuckDB oracle (same parquet
  * inputs) in [[oracle]].
  *
  * Portability contract (SURVEY.md §3): money sums `round(_,2)`, ratios
  * `round(_,4)`, UTC session timezone, deterministic ORDER BY with unique
  * tiebreaks, identical aliases on both sides.
  */
object CoreQueries {
  type Q = (SparkSession, String) => DataFrame

  val defs: Map[String, Q] = Map(
    // ---- q01: grouped aggregation (TPC-H Q1 shape; gold reporting) ----
    "q01_pricing_summary" -> { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // ---- q02: CDM normalize + surrogate key (silver select block) ----
    "q02_cdm_normalize" -> { (s, d) =>
      Tables.customer(s, d)
        .select(
          col("c_custkey").cast("string").as("customer_id"),
          Cdm.sourceKey(col("c_custkey"), lit("bank_a")).as("customer_key"),
          trim(col("c_name")).as("customer_name"),
          Cdm.normUpper(col("c_mktsegment")).as("segment"),
          round(col("c_acctbal"), 2).as("acctbal"),
          col("c_nationkey").cast("int").as("nation_id"))
        .orderBy(col("customer_id"))
    },

    // ---- q03: quarantine DQ flags (silver is_quarantined) ----
    "q03_quarantine" -> { (s, d) =>
      Quality.quarantine(
        Tables.orders(s, d),
        Seq(
          Quality.Rule("null_custkey", col("o_custkey").isNull),
          Quality.Rule("bad_price", col("o_totalprice").isNull || col("o_totalprice") <= 0),
          Quality.Rule("null_orderdate", col("o_orderdate").isNull),
          Quality.Rule("bad_status", !col("o_orderstatus").isin("O", "F", "P"))))
        .select(col("o_orderkey"), col("is_quarantined"), col("quarantine_reason"))
        .orderBy(col("o_orderkey"))
    },

    // ---- q04: keep latest row per business key ----
    "q04_dedup_latest" -> { (s, d) =>
      Dedup.latestPerKey(
        Tables.events(s, d),
        Seq("user_id"),
        Seq(col("ts").desc, col("event_id").desc))
        .select(
          col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_event_type"), col("ts").as("last_ts"),
          round(col("value"), 4).as("last_value"))
        .orderBy(col("user_id"))
    },

    // ---- q05: SCD2 snapshot from history ----
    "q05_scd2_snapshot" -> { (s, d) =>
      Scd2.snapshot(
        Tables.events(s, d).select(col("user_id"), col("event_id"), col("ts")),
        Seq("user_id"),
        Seq(col("ts"), col("event_id")),
        col("ts"))
        .select(col("user_id"), col("event_id"), col("valid_from"), col("valid_to"), col("is_current"))
        .orderBy(col("user_id"), col("valid_from"), col("event_id"))
    },

    // ---- q06: star join over broadcast dims + agg ----
    "q06_star_agg" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      val cust = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
      val nat = Tables.nation(s, d)
      val reg = Tables.region(s, d)
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name").as("region_name"), col("n_name").as("nation_name"))
        .agg(round(sum(col("rev")), 2).as("revenue"), count(lit(1)).as("n_items"))
        .orderBy(col("region_name"), col("nation_name"))
    },

    // ---- q07: fact build w/ left-join FK enrichment ----
    "q07_fact_enrich" -> { (s, d) =>
      val fact = Tables.lineitem(s, d)
        .filter(col("l_quantity") > 0)
        .select(
          concat_ws("-", col("l_orderkey"), col("l_linenumber")).as("transaction_key"),
          col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
          round(col("l_extendedprice"), 2).as("amount"), col("l_shipdate"))
      val ord = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val cust = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))
      val enriched = fact
        .join(ord, col("l_orderkey") === col("o_orderkey"), "left")
      Star.enrich(enriched, cust, col("o_custkey") === col("c_custkey"),
          Seq(col("c_custkey"), col("c_mktsegment")))
        .select(
          col("transaction_key"), col("l_orderkey"), col("l_linenumber"),
          col("l_partkey"), col("l_suppkey"), col("amount"), col("l_shipdate"),
          col("o_custkey").as("fk_customer_id"), col("o_orderdate"),
          col("c_mktsegment").as("customer_segment"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // ---- q08: top-N per group ----
    "q08_topn_per_group" -> { (s, d) =>
      Windows.topNPerGroup(
        Tables.orders(s, d),
        Seq("o_custkey"),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc),
        3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"), round(col("o_totalprice"), 2).as("totalprice"))
        .orderBy(col("o_custkey"), col("rn"))
    },

    // ---- q09: ROLLUP hierarchical totals ----
    "q09_rollup" -> { (s, d) =>
      Tables.orders(s, d)
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("total_price"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n_orders"), col("total_price"))
        .orderBy(col("status"), col("priority"))
    },

    // ---- q10: pivot long → wide (conditional aggregation) ----
    "q10_pivot" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("event_date"))
        .agg(
          count(when(col("event_type") === "click", 1)).as("n_click"),
          count(when(col("event_type") === "view", 1)).as("n_view"),
          count(when(col("event_type") === "purchase", 1)).as("n_purchase"),
          count(when(col("event_type") === "signup", 1)).as("n_signup"),
          count(when(col("event_type") === "error", 1)).as("n_error"),
          round(coalesce(sum(when(col("event_type") === "purchase", col("value"))), lit(0.0)), 2)
            .as("purchase_value"))
        .orderBy(col("event_date"))
    },

    // ---- q11: anti join (orphans / dormant keys) ----
    // Anti-joined against a DATE-WINDOWED order set (every testdata customer
    // has some order, so the unwindowed orphan set is empty and the oracle
    // check would be vacuous): customers with no order since 2000-01-01.
    "q11_anti_join" -> { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d)
            .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
            .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // ---- q12: two-source harmonizing union (bank A/B) ----
    "q12_union_harmonize" -> { (s, d) =>
      val a = Tables.customer(s, d).filter(col("c_custkey") % 2 === 0)
        .select(col("c_custkey"), col("c_name"), round(col("c_acctbal"), 2).as("acctbal"),
          lit("bank_a").as("source_system"))
      val b = Tables.customer(s, d).filter(col("c_custkey") % 2 === 1)
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment").as("segment"),
          lit("bank_b").as("source_system"))
      a.unionByName(b, allowMissingColumns = true)
        .orderBy(col("c_custkey"))
    },

    // ---- q13: incremental watermark window ----
    "q13_incremental_watermark" -> { (s, d) =>
      Incremental.tail(Tables.events(s, d), col("ts"), "7 DAY")
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"),
          round(col("value"), 4).as("value"))
        .orderBy(col("event_id"))
    },

    // ---- q14: latest value per group (FX latest rate) ----
    "q14_latest_rate" -> { (s, d) =>
      Dedup.latestPerKey(
        Tables.events(s, d),
        Seq("event_type"),
        Seq(col("ts").desc, col("event_id").desc))
        .select(col("event_type"), round(col("value"), 4).as("latest_value"), col("ts").as("as_of"))
        .orderBy(col("event_type"))
    },

    // ---- q15: deterministic hash surrogate keys ----
    "q15_surrogate_hash" -> { (s, d) =>
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          Cdm.hashKey(col("o_orderkey"), col("o_custkey")).as("surrogate_key"),
          (Cdm.hash60(concat_ws("|", col("o_orderkey"), col("o_custkey"))) % 32).as("bucket"))
        .orderBy(col("o_orderkey"))
    },

    // ---- q16: tumbling time-window aggregation ----
    "q16_time_bucket" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(Windows.timeBucket(col("ts"), "hour").as("bucket_start"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 2).as("sum_value"),
          round(avg(col("value")), 4).as("avg_value"))
        .orderBy(col("bucket_start"))
    },

    // ---- q17: gap-based sessionization (30 min) ----
    "q17_sessionize" -> { (s, d) =>
      Windows.sessionize(Tables.events(s, d), Seq("user_id"), col("ts"), col("event_id"), "30 MINUTE")
        .groupBy(col("user_id"), col("session_seq"))
        .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
          count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("session_value"))
        .orderBy(col("user_id"), col("session_seq"))
    },

    // ---- q18: running balance per key ----
    "q18_running_balance" -> { (s, d) =>
      Windows.runningTotal(Tables.events(s, d), Seq("user_id"), col("ts"), col("event_id"),
          col("value"), "running_value")
        .select(col("user_id"), col("event_id"), col("ts"), round(col("running_value"), 2).as("balance"))
        .orderBy(col("user_id"), col("ts"), col("event_id"))
    },

    // ---- q31: SCD2 merge of a staged batch into an existing dim ----
    "q31_scd2_merge" -> { (s, d) => scd2MergeQuery(s, d) },

    // ---- q32: quarantine routing stats ----
    "q32_quarantine_split" -> { (s, d) =>
      Quality.quarantine(
        Tables.orders(s, d),
        Seq(
          Quality.Rule("null_custkey", col("o_custkey").isNull),
          Quality.Rule("bad_price", col("o_totalprice").isNull || col("o_totalprice") <= 0),
          Quality.Rule("null_orderdate", col("o_orderdate").isNull),
          Quality.Rule("bad_status", !col("o_orderstatus").isin("O", "F", "P"))))
        .groupBy(col("is_quarantined"), col("quarantine_reason"))
        .agg(count(lit(1)).as("n_rows"))
        .orderBy(col("is_quarantined"), col("quarantine_reason"))
    },

    // ---- q33: JSON payload extraction (API extract shape) ----
    "q33_json_extract" -> { (s, d) =>
      Tables.events(s, d)
        .select(col("event_id"), get_json_object(col("props"), "$.k").cast("int").as("k"))
        .orderBy(col("event_id"))
    },

    // ---- q36: end-to-end medallion (bronze→silver→gold, one plan) ----
    "q36_medallion" -> { (s, d) => medallionQuery(s, d) },

    // ---- q34: rate join + currency conversion (fx_rate_used shape) ----
    "q34_fx_convert" -> { (s, d) =>
      val rates = Tables.nation(s, d)
        .select(col("n_nationkey"), round(lit(1.0) + col("n_nationkey") / 100.0, 2).as("rate"))
      val cust = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
      Tables.orders(s, d)
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(rates), col("c_nationkey") === col("n_nationkey"))
        .select(col("o_orderkey"), col("c_custkey"), col("rate"),
          // round at 4: the product of two 2-decimal values has exactly ≤4
          // decimals, so round(_,4) never lands on a rounding tie (round(_,2)
          // does, and DuckDB/Spark disagree on tie direction).
          round(col("o_totalprice") * col("rate"), 4).as("converted_price"))
        .orderBy(col("o_orderkey"))
    }
  )

  /** q31 helper: deterministic staged batch derived from `customer` —
    * custkey%10==0 rows arrive with acctbal+100 (changed), custkey%10==1
    * arrive unchanged (no-op), everything else is absent from the batch.
    */
  private def scd2MergeQuery(s: SparkSession, d: String): DataFrame = {
    val base = Tables.customer(s, d)
      .select(col("c_custkey"), round(col("c_acctbal"), 2).as("acctbal"),
        col("c_mktsegment").as("segment"))
    val existing = base
      .withColumn("valid_from", lit("2020-01-01").cast("timestamp"))
      .withColumn("valid_to", lit(null).cast("timestamp"))
      .withColumn("is_current", lit(true))
    val staged = base.filter(col("c_custkey") % 10 === 0)
        .withColumn("acctbal", round(col("acctbal") + 100, 2))
      .unionByName(base.filter(col("c_custkey") % 10 === 1))
    Scd2.merge(existing, staged, Seq("c_custkey"), Seq("acctbal", "segment"),
        lit("2024-01-01").cast("timestamp"))
      .orderBy(col("c_custkey"), col("valid_from"), col("is_current"))
  }

  /** q36: the full reference shape in one Catalyst plan — two bronze
    * sources (bank_a carries acctbal, bank_b doesn't) → harmonized silver
    * customers (CDM + quarantine + keyed dedup) → gold fact enriched with
    * the customer dimension.
    */
  private def medallionQuery(s: SparkSession, d: String): DataFrame = {
    import graft.pipeline.Medallion
    val cust = Tables.customer(s, d)
    val bankA = cust.filter(col("c_custkey") % 2 === 0)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_mktsegment"),
        lit("bank_a").as("source_system"))
    val bankB = cust.filter(col("c_custkey") % 2 === 1)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        lit("bank_b").as("source_system"))
    val cdm = (df: DataFrame) => df.select(
      Cdm.sourceKey(col("c_custkey"), col("source_system")).as("customer_key"),
      col("c_custkey"),
      trim(col("c_name")).as("customer_name"),
      Cdm.normUpper(col("c_mktsegment")).as("segment"),
      round(col("c_acctbal"), 2).as("acctbal"),
      col("source_system"))
    val silverCust = Medallion.silver(
      Seq(bankA, bankB), cdm,
      Seq(Quality.Rule("blank_name", Quality.nullOrBlank(col("customer_name")))),
      Seq("customer_key"), Seq(col("c_custkey")))
      .withColumn("is_current", lit(true))
    val dim = Medallion.goldDim(silverCust, lit("2026-01-01").cast("timestamp"))
    val factBase = Quality.quarantine(
      Tables.orders(s, d),
      Seq(Quality.Rule("bad_price", col("o_totalprice").isNull || col("o_totalprice") <= 0)))
    Medallion.goldFact(
      factBase,
      Seq((dim,
        concat_ws("-", col("o_custkey"),
          when(col("o_custkey") % 2 === 0, "bank_a").otherwise("bank_b")) === col("customer_key"),
        Seq(col("customer_key"), col("segment")))),
      lit("2026-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("customer_key"), col("segment"),
        round(col("o_totalprice"), 2).as("totalprice"), col("refreshed_at"))
      .orderBy(col("o_orderkey"))
  }

  val oracle: Map[String, String] = Map(
    "q36_medallion" ->
      """WITH silver AS (
           SELECT cast(c_custkey AS VARCHAR) || '-' ||
               (CASE WHEN c_custkey % 2 = 0 THEN 'bank_a' ELSE 'bank_b' END) AS customer_key,
             upper(trim(c_mktsegment)) AS segment,
             (trim(c_name) IS NULL OR len(trim(c_name)) = 0) AS is_quarantined
           FROM customer)
         SELECT o_orderkey, s.customer_key, s.segment,
           round(o_totalprice, 2) AS totalprice,
           TIMESTAMP '2026-01-01' AS refreshed_at
         FROM orders LEFT JOIN silver s
           ON cast(o_custkey AS VARCHAR) || '-' ||
              (CASE WHEN o_custkey % 2 = 0 THEN 'bank_a' ELSE 'bank_b' END) = s.customer_key
              AND NOT s.is_quarantined
         WHERE o_totalprice IS NOT NULL AND o_totalprice > 0
         ORDER BY o_orderkey""",

    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity),2) AS sum_qty,
         round(sum(l_extendedprice),2) AS sum_base_price,
         round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
         round(avg(l_quantity),4) AS avg_qty,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
         GROUP BY 1,2 ORDER BY 1,2""",

    "q02_cdm_normalize" ->
      """SELECT cast(c_custkey AS VARCHAR) AS customer_id,
         cast(c_custkey AS VARCHAR) || '-bank_a' AS customer_key,
         trim(c_name) AS customer_name,
         upper(trim(c_mktsegment)) AS segment,
         round(c_acctbal,2) AS acctbal,
         cast(c_nationkey AS INT) AS nation_id
         FROM customer ORDER BY customer_id""",

    "q03_quarantine" ->
      """SELECT o_orderkey,
         (o_custkey IS NULL OR o_totalprice IS NULL OR o_totalprice <= 0
          OR o_orderdate IS NULL OR o_orderstatus NOT IN ('O','F','P')) AS is_quarantined,
         nullif(concat_ws(';',
           CASE WHEN o_custkey IS NULL THEN 'null_custkey' END,
           CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0 THEN 'bad_price' END,
           CASE WHEN o_orderdate IS NULL THEN 'null_orderdate' END,
           CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 'bad_status' END), '') AS quarantine_reason
         FROM orders ORDER BY o_orderkey""",

    "q04_dedup_latest" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
         cast(ts AS TIMESTAMP) AS last_ts, round(value,4) AS last_value
         FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
               FROM events) WHERE rn = 1 ORDER BY user_id""",

    "q05_scd2_snapshot" ->
      """SELECT user_id, event_id, cast(ts AS TIMESTAMP) AS valid_from,
         cast(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS TIMESTAMP) AS valid_to,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
         FROM events ORDER BY user_id, valid_from, event_id""",

    "q06_star_agg" ->
      """SELECT r_name AS region_name, n_name AS nation_name,
         round(sum(l_extendedprice*(1-l_discount)),2) AS revenue, count(*) AS n_items
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY 1,2 ORDER BY 1,2""",

    "q07_fact_enrich" ->
      """SELECT cast(l_orderkey AS VARCHAR) || '-' || cast(l_linenumber AS VARCHAR) AS transaction_key,
         l_orderkey, l_linenumber, l_partkey, l_suppkey,
         round(l_extendedprice,2) AS amount, l_shipdate,
         o_custkey AS fk_customer_id, o_orderdate,
         c_mktsegment AS customer_segment
         FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
         LEFT JOIN customer ON o_custkey = c_custkey
         WHERE l_quantity > 0 ORDER BY l_orderkey, l_linenumber""",

    "q08_topn_per_group" ->
      """SELECT o_custkey, rn, o_orderkey, totalprice FROM
         (SELECT o_custkey, o_orderkey, round(o_totalprice,2) AS totalprice,
           row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""",

    "q09_rollup" ->
      """SELECT coalesce(o_orderstatus,'ALL') AS status,
         coalesce(o_orderpriority,'ALL') AS priority,
         count(*) AS n_orders, round(sum(o_totalprice),2) AS total_price
         FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
         ORDER BY status, priority""",

    "q10_pivot" ->
      """SELECT cast(ts AS DATE) AS event_date,
         count(*) FILTER (WHERE event_type='click') AS n_click,
         count(*) FILTER (WHERE event_type='view') AS n_view,
         count(*) FILTER (WHERE event_type='purchase') AS n_purchase,
         count(*) FILTER (WHERE event_type='signup') AS n_signup,
         count(*) FILTER (WHERE event_type='error') AS n_error,
         round(coalesce(sum(value) FILTER (WHERE event_type='purchase'), 0), 2) AS purchase_value
         FROM events GROUP BY 1 ORDER BY 1""",

    "q11_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
           AND o_orderdate >= TIMESTAMP '2000-01-01')
         ORDER BY c_custkey""",

    "q12_union_harmonize" ->
      """SELECT * FROM (
           SELECT c_custkey, c_name, round(c_acctbal,2) AS acctbal, 'bank_a' AS source_system
           FROM customer WHERE c_custkey % 2 = 0
           UNION ALL BY NAME
           SELECT c_custkey, c_name, c_mktsegment AS segment, 'bank_b' AS source_system
           FROM customer WHERE c_custkey % 2 = 1)
         ORDER BY c_custkey""",

    "q13_incremental_watermark" ->
      """SELECT event_id, user_id, event_type, cast(ts AS TIMESTAMP) AS ts, round(value,4) AS value
         FROM events WHERE ts > (SELECT max(ts) - INTERVAL 7 DAY FROM events)
         ORDER BY event_id""",

    "q14_latest_rate" ->
      """SELECT event_type, round(value,4) AS latest_value, cast(ts AS TIMESTAMP) AS as_of
         FROM (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY ts DESC, event_id DESC) rn
               FROM events) WHERE rn = 1 ORDER BY event_type""",

    "q15_surrogate_hash" ->
      """SELECT o_orderkey,
         md5(cast(o_orderkey AS VARCHAR) || '|' || cast(o_custkey AS VARCHAR)) AS surrogate_key,
         ('0x' || substr(md5(cast(o_orderkey AS VARCHAR) || '|' || cast(o_custkey AS VARCHAR)),1,15))::BIGINT % 32 AS bucket
         FROM orders ORDER BY o_orderkey""",

    "q16_time_bucket" ->
      """SELECT cast(date_trunc('hour', ts) AS TIMESTAMP) AS bucket_start, count(*) AS n_events,
         round(sum(value),2) AS sum_value, round(avg(value),4) AS avg_value
         FROM events GROUP BY 1 ORDER BY 1""",

    "q17_sessionize" ->
      """WITH flagged AS (
           SELECT user_id, event_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         sessions AS (
           SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
           FROM flagged)
         SELECT user_id, session_seq::BIGINT AS session_seq, cast(min(ts) AS TIMESTAMP) AS session_start,
           cast(max(ts) AS TIMESTAMP) AS session_end,
           count(*) AS n_events, round(sum(value),2) AS session_value
         FROM sessions GROUP BY 1,2 ORDER BY 1,2""",

    "q18_running_balance" ->
      """SELECT user_id, event_id, cast(ts AS TIMESTAMP) AS ts,
         round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS balance
         FROM events ORDER BY user_id, ts, event_id""",

    "q31_scd2_merge" ->
      """SELECT * FROM (
           SELECT c_custkey, round(c_acctbal,2) AS acctbal, c_mktsegment AS segment,
             TIMESTAMP '2020-01-01' AS valid_from,
             CASE WHEN c_custkey % 10 = 0 THEN TIMESTAMP '2024-01-01' END AS valid_to,
             c_custkey % 10 <> 0 AS is_current
           FROM customer
           UNION ALL
           SELECT c_custkey, round(round(c_acctbal,2)+100,2) AS acctbal, c_mktsegment AS segment,
             TIMESTAMP '2024-01-01' AS valid_from, NULL AS valid_to, true AS is_current
           FROM customer WHERE c_custkey % 10 = 0)
         ORDER BY c_custkey, valid_from, is_current""",

    "q32_quarantine_split" ->
      """SELECT (o_custkey IS NULL OR o_totalprice IS NULL OR o_totalprice <= 0
          OR o_orderdate IS NULL OR o_orderstatus NOT IN ('O','F','P')) AS is_quarantined,
         nullif(concat_ws(';',
           CASE WHEN o_custkey IS NULL THEN 'null_custkey' END,
           CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0 THEN 'bad_price' END,
           CASE WHEN o_orderdate IS NULL THEN 'null_orderdate' END,
           CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 'bad_status' END), '') AS quarantine_reason,
         count(*) AS n_rows
         FROM orders GROUP BY 1,2 ORDER BY 1,2""",

    "q33_json_extract" ->
      """SELECT event_id, cast(props->>'$.k' AS INT) AS k
         FROM events ORDER BY event_id""",

    "q34_fx_convert" ->
      """SELECT o_orderkey, c_custkey, round(1.0 + n_nationkey/100.0, 2) AS rate,
         round(o_totalprice * round(1.0 + n_nationkey/100.0, 2), 4) AS converted_price
         FROM orders JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         ORDER BY o_orderkey"""
  )
}
