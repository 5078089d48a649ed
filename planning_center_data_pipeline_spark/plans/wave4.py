"""Round-4 wave: gaps-and-islands, training-corpus mixing, global
heavy hitters, salted skew aggregation, error-safe arithmetic, and
per-group mode.

The reference pipeline has no analytics beyond per-list counts
(SURVEY.md §2.5; reference dags/tasks/planning_center.py:50); these
extend the engine with patterns a 100 TB training-data pipeline leans
on daily:

- ``win_gaps_islands`` — activity-streak detection (consecutive
  active months per customer) via the row_number-difference trick:
  one shuffle on the partition key, no self-join.  At scale the
  window is partitioned by customer, so every partition sorts a few
  dozen rows — embarrassingly parallel.
- ``corpus_mix_plan`` — dataset-mixing plan for training corpora:
  per-source token counts → corpus share → per-source sampling rate
  to hit a uniform target mix, with a resulting token budget.  The
  totals cross-join is a 1-row broadcast; everything else is one
  partial-aggregated groupBy over the documents scan.
- ``ev_top_users`` — exact global heavy hitters.  orderBy+limit
  compiles to TakeOrderedAndProject: each partition keeps its own
  top-k heap and only k rows per partition reach the driver-side
  merge — the scalable form of "global top k", no full sort.
- ``agg_salted_skew`` — two-level salted aggregation for few-group
  skew: events has a handful of event_type values, so a single-level
  groupBy funnels each giant group through one reducer.  Level 1
  aggregates (event_type, salt) — 16-way fan-out of every hot key —
  then level 2 merges the tiny salted partials.  Value sums use
  cent-integer arithmetic so the result is bit-exact and
  order-independent (hash-checkable against DuckDB).
- ``fn_try_arith`` — error-safe arithmetic/casts (try_divide,
  try_cast): NULL-on-failure semantics instead of job-killing
  exceptions — what you want when one malformed row in 100 TB must
  not fail the whole batch.
- ``agg_mode_segment`` — per-nation modal customer segment with a
  deterministic tie-break (count desc, then segment name).  Built
  from count + row_number rather than mode() so tie behavior is
  explicit and identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from planning_center_data_pipeline_spark.operators import textstats as X
from planning_center_data_pipeline_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- gaps and islands --------------------------------------------------------

def win_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-active-month streaks per customer.

    month_index - row_number is constant within a consecutive run
    (the classic islands trick), so one window pass + two groupBys
    turn the order log into streak stats.  The explicit repartition
    on o_custkey makes the month-dedup aggregate, the window, and
    both downstream groupBys all reuse ONE shuffle: hash(custkey)
    clusters every finer grouping key (custkey, mi)/(custkey, grp),
    so EnsureRequirements inserts no further exchange.  No self-join,
    no range join.
    """
    o = _t(spark, sf_dir, "orders")
    months = (
        o.select(
            "o_custkey",
            (
                F.year("o_orderdate") * F.lit(12) + F.month("o_orderdate")
            ).cast("long").alias("mi"),
        )
        .repartition("o_custkey")
        .dropDuplicates(["o_custkey", "mi"])
    )
    w = Window.partitionBy("o_custkey").orderBy("mi")
    grp = months.withColumn("grp", F.col("mi") - F.row_number().over(w))
    islands = grp.groupBy("o_custkey", "grp").agg(
        F.count("*").alias("run_len")
    )
    return (
        islands.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_islands"),
            F.max("run_len").alias("max_run"),
            F.sum("run_len").cast("bigint").alias("active_months"),
        )
        .orderBy("o_custkey")
    )


WIN_GAPS_ISLANDS_SQL = """
WITH m AS (
  SELECT DISTINCT o_custkey,
         CAST(EXTRACT(year FROM o_orderdate)*12
              + EXTRACT(month FROM o_orderdate) AS BIGINT) AS mi
  FROM orders
), g AS (
  SELECT o_custkey, mi,
         mi - ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY mi) AS grp
  FROM m
), isl AS (
  SELECT o_custkey, grp, COUNT(*) AS run_len
  FROM g GROUP BY o_custkey, grp
)
SELECT o_custkey,
       COUNT(*) AS n_islands,
       MAX(run_len) AS max_run,
       CAST(SUM(run_len) AS BIGINT) AS active_months
FROM isl GROUP BY o_custkey ORDER BY o_custkey
"""


# --- training-corpus mixing plan --------------------------------------------

def corpus_mix_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source sampling plan targeting a uniform source mix.

    share = source tokens / corpus tokens; rate = min(1, target/share)
    (undersample over-represented sources, keep the rest whole);
    budget = round(rate * tokens).  All ratios derive from exact
    integer token counts with the same operation order on both
    engines, so doubles are bit-identical.  The corpus total is a
    1-row cross join — broadcast, never a shuffle.
    """
    d = _t(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(X.token_count(F.col("text"))).cast("bigint").alias("n_tokens"),
    )
    tot = per_src.agg(
        F.sum("n_tokens").cast("bigint").alias("tot_tokens"),
        F.count("*").alias("n_sources"),
    )
    share = F.col("n_tokens").cast("double") / F.col("tot_tokens")
    rate = F.least(
        F.lit(1.0), (F.lit(1.0) / F.col("n_sources")) / share
    )
    return (
        per_src.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            share.alias("share"),
            rate.alias("sample_rate"),
            F.round(rate * F.col("n_tokens")).cast("bigint").alias(
                "budget_tokens"
            ),
        )
        .orderBy("source")
    )


CORPUS_MIX_PLAN_SQL = r"""
WITH t AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT)
           AS n_tokens
  FROM documents GROUP BY source
), tot AS (
  SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens, COUNT(*) AS n_sources
  FROM t
)
SELECT source, n_docs, n_tokens,
  CAST(n_tokens AS DOUBLE)/tot_tokens AS share,
  LEAST(1.0, (1.0/n_sources)/(CAST(n_tokens AS DOUBLE)/tot_tokens))
    AS sample_rate,
  CAST(ROUND(LEAST(1.0, (1.0/n_sources)/(CAST(n_tokens AS DOUBLE)/tot_tokens))
             * n_tokens) AS BIGINT) AS budget_tokens
FROM t, tot ORDER BY source
"""


# --- exact global heavy hitters ---------------------------------------------

def ev_top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 users by event count, ties broken by user_id.

    groupBy count is partially aggregated map-side; orderBy+limit
    compiles to TakeOrderedAndProject (per-partition top-k heaps,
    k rows per partition to the merge) — no global sort at any scale.
    """
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
        .orderBy(F.desc("n_events"), F.asc("user_id"))
        .limit(10)
    )


EV_TOP_USERS_SQL = """
SELECT user_id, COUNT(*) AS n_events
FROM events GROUP BY user_id
ORDER BY n_events DESC, user_id ASC LIMIT 10
"""


# --- two-level salted aggregation for skewed groups -------------------------

def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type totals via (key, salt) partials then merge.

    events has only a handful of event_type values: a plain groupBy
    sends each entire hot group through one reducer task.  Salting on
    xxhash64(event_id) % 16 spreads every hot key over 16 reducers in
    level 1; level 2 merges 16 tiny partial rows per key.  Sums use
    cent integers so the double result is exact and order-free.
    """
    e = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    lvl1 = e.groupBy(
        "event_type",
        F.pmod(F.xxhash64("event_id"), F.lit(16)).alias("salt"),
    ).agg(
        F.count("*").alias("pc"),
        F.sum(cents).alias("pv"),
    )
    return (
        lvl1.groupBy("event_type")
        .agg(
            F.sum("pc").cast("bigint").alias("n_events"),
            (F.sum("pv").cast("double") / F.lit(100.0)).alias("sum_value"),
        )
        .orderBy("event_type")
    )


AGG_SALTED_SKEW_SQL = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS DOUBLE)/100.0
         AS sum_value
FROM events GROUP BY event_type ORDER BY event_type
"""


# --- error-safe arithmetic ---------------------------------------------------

def fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-on-failure arithmetic: try_divide by a sometimes-zero
    denominator and try_cast of non-numeric text.  One malformed row
    must never kill a 100 TB batch; TRY variants keep the failure
    local to the cell.
    """
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.try_divide(
            F.col("o_totalprice"), (F.col("o_orderkey") % 5).cast("double")
        ).alias("safe_ratio"),
        F.regexp_extract(F.col("o_orderpriority"), "[0-9]+", 0)
        .try_cast("bigint")
        .alias("prio_num"),
        F.col("o_orderstatus").try_cast("bigint").alias("status_num"),
    ).orderBy("o_orderkey")


FN_TRY_ARITH_SQL = """
SELECT o_orderkey,
       o_totalprice / NULLIF(CAST(o_orderkey % 5 AS DOUBLE), 0.0)
         AS safe_ratio,
       TRY_CAST(regexp_extract(o_orderpriority, '[0-9]+', 0) AS BIGINT)
         AS prio_num,
       TRY_CAST(o_orderstatus AS BIGINT) AS status_num
FROM orders ORDER BY o_orderkey
"""


# --- per-group mode with explicit tie-break ---------------------------------

def agg_mode_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modal customer market segment per nation.

    count + row_number instead of mode(): the tie-break (count desc,
    then segment asc) is explicit, so results are deterministic and
    identical across engines.  The window partitions by nation over a
    25 x 5 pre-aggregated table — the heavy lifting happened in the
    partial-aggregated count.
    """
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    cnt = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", "c_mktsegment")
        .agg(F.count("*").alias("n_cust"))
    )
    w = Window.partitionBy("n_name").orderBy(
        F.desc("n_cust"), F.asc("c_mktsegment")
    )
    return (
        cnt.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "n_name",
            F.col("c_mktsegment").alias("mode_segment"),
            "n_cust",
        )
        .orderBy("n_name")
    )


AGG_MODE_SEGMENT_SQL = """
WITH cnt AS (
  SELECT n_name, c_mktsegment, COUNT(*) AS n_cust
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name, c_mktsegment
), rk AS (
  SELECT n_name, c_mktsegment, n_cust,
         ROW_NUMBER() OVER (
           PARTITION BY n_name ORDER BY n_cust DESC, c_mktsegment ASC
         ) AS rn
  FROM cnt
)
SELECT n_name, c_mktsegment AS mode_segment, n_cust
FROM rk WHERE rn = 1 ORDER BY n_name
"""


QUERIES = {
    "win_gaps_islands": win_gaps_islands,
    "corpus_mix_plan": corpus_mix_plan,
    "ev_top_users": ev_top_users,
    "agg_salted_skew": agg_salted_skew,
    "fn_try_arith": fn_try_arith,
    "agg_mode_segment": agg_mode_segment,
}

ORACLES = {
    "win_gaps_islands": WIN_GAPS_ISLANDS_SQL,
    "corpus_mix_plan": CORPUS_MIX_PLAN_SQL,
    "ev_top_users": EV_TOP_USERS_SQL,
    "agg_salted_skew": AGG_SALTED_SKEW_SQL,
    "fn_try_arith": FN_TRY_ARITH_SQL,
    "agg_mode_segment": AGG_MODE_SEGMENT_SQL,
}
