"""Round-11 wave 50: inequality, cluster validity, information rate,
long-memory, ordered-alternative rank testing, and exponential-
smoothing forecasts.

- li_gini_by_brand: Gini coefficient of revenue concentration across
  parts within each brand (cust_nation_gini's decimal rank-moment
  form over a different grouping).
- emb_davies_bouldin: Davies-Bouldin cluster-validity index over the
  embedding labels — (a_i + a_j) / d(c_i, c_j) maxima from the exact
  quantized shapes emb_silhouette_centroid already computes.
- ev_entropy_rate_stationary: entropy rate H = sum_i pi_i H(next|i)
  of the event-type chain — the 12-round stationary-pi unrolling from
  ev_markov_stationary plus per-state conditional entropies kept in
  exact integer micro-nats (H(next|i) = ln rt - (1/rt) sum c ln c,
  all c ln c terms quantized BEFORE summing).
- ts_hurst_rs: rescaled-range (R/S) long-memory estimate of the daily
  order-count series at window sizes 8/16/32/64 — per-block R and S
  from exact integer moments (W*Z_t and W-scaled deviations), log-log
  OLS slope = Hurst exponent.
- stat_jonckheere_terpstra: ordered-alternative rank test (are line
  quantities stochastically larger for lower order priorities?) on
  the bounded 5 x 50 (priority, quantity) grid — doubled U statistic
  exact, tie-corrected null variance from integer group/tie moments
  (Hollander & Wolfe form).
- ts_holt_winters_additive: additive Holt-Winters (alpha 1/4, beta
  1/8, gamma 1/4, period 12) over the last 36 months of revenue —
  12-month init, 24 UNROLLED update rounds as pure column expressions
  on a 1-row wide state (the ev_markov_stationary unrolling pattern
  collapsed to zero joins), 12-step forecast.

Reference parity: the reference repo (a 400-line scrape-and-upload
DAG) has no analytics surface; these extend the statistics,
time-series, and embedding-quality families a 100 TB training-data
pipeline needs.  Scale notes live in each docstring; every query is
a bounded rollup of one fact scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from planning_center_data_pipeline_spark.functions.exact import cents
from planning_center_data_pipeline_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- Gini of part-revenue concentration within brand ---------------------------------


def li_gini_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of revenue concentration across the parts of
    each brand: rank parts by exact revenue cents within brand and
    apply the rank-moment identity G = 2*sum(i*r_i)/(n*sum r) -
    (n+1)/n with every moment in DECIMAL(38,0) (cust_nation_gini's
    form, plans/wave4d.py).  Scale shape: one lineitem rollup to
    |parts| rows, one broadcastable part-dim join, per-brand windows
    over ~|parts|/|brands| rows."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rev = (
        li.groupBy("l_partkey")
        .agg(F.sum(cents("l_extendedprice")).alias("rc"))
        .join(
            F.broadcast(p.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
    )
    w = Window.partitionBy("p_brand").orderBy(F.asc("rc"), F.asc("l_partkey"))
    ranked = rev.select(
        "p_brand",
        F.col("rc").cast("decimal(38,0)").alias("rc"),
        F.row_number().over(w).cast("decimal(38,0)").alias("i"),
    )
    agg = ranked.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rc").alias("s"),
        F.sum(F.col("i") * F.col("rc")).alias("si"),
    )
    n_d = F.col("n").cast("double")
    gini = (
        F.lit(2.0)
        * F.col("si").cast("double")
        / (n_d * F.col("s").cast("double"))
        - (n_d + F.lit(1.0)) / n_d
    )
    return agg.select(
        F.col("p_brand").alias("brand"),
        F.col("n").cast("bigint").alias("n_parts"),
        (F.col("s").cast("double") / 100.0).alias("revenue"),
        F.round(gini, 9).alias("gini"),
    ).orderBy("brand")


_GINI_BRAND_SQL = """
WITH rev AS (
  SELECT p_brand, l_partkey,
         CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS rc
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand, l_partkey
), ranked AS (
  SELECT p_brand,
         CAST(rc AS DECIMAL(19,0)) AS rc,
         CAST(ROW_NUMBER() OVER (PARTITION BY p_brand
                                 ORDER BY rc ASC, l_partkey ASC)
              AS DECIMAL(19,0)) AS i
  FROM rev
), agg AS (
  SELECT p_brand, COUNT(*) AS n, SUM(rc) AS s, SUM(i * rc) AS si
  FROM ranked GROUP BY p_brand
)
SELECT p_brand AS brand,
       CAST(n AS BIGINT) AS n_parts,
       CAST(s AS DOUBLE)/100.0 AS revenue,
       ROUND(2.0 * CAST(si AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE))
             - (CAST(n AS DOUBLE) + 1.0)/CAST(n AS DOUBLE), 9) AS gini
FROM agg ORDER BY brand
"""


# --- Davies-Bouldin index over the embedding labels ----------------------------------


def emb_davies_bouldin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Davies-Bouldin cluster-validity index over embedding labels:
    a_i = mean point-to-own-centroid distance (the silhouette's exact
    quantized form, plans/wave49.py), d_ij = centroid-pair distance,
    r_i = max_{j != i} (a_i + a_j) / d_ij, DB = mean_i r_i.  Per-label
    maxima are micro-quantized before the cross-label mean so the
    final average is an order-free integer sum.  Scale shape: one
    |E| x 64 explode rollup, one point-level join, label^2 x 64
    bounded centroid-pair scan (10 labels in the synthetic data)."""
    from planning_center_data_pipeline_spark.operators import similarity as S

    e = _t(spark, sf_dir, "embeddings")
    q = e.select(
        "label",
        "vec_id",
        F.posexplode(S.quantized(F.col("embedding"))).alias("dim", "v"),
    )
    cent = q.groupBy("label", "dim").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v").cast("bigint").alias("s"),
    )
    dev = (
        q.join(cent, ["label", "dim"])
        .select(
            "label",
            "vec_id",
            "n",
            (
                (F.col("v").cast("decimal(38,0)") * F.col("n") - F.col("s"))
                * (F.col("v").cast("decimal(38,0)") * F.col("n") - F.col("s"))
            ).alias("d2"),
        )
        .groupBy("label", "vec_id")
        .agg(F.min("n").alias("n"), F.sum("d2").alias("d2sum"))
        .select(
            "label",
            F.expr(
                "CAST(ROUND(SQRT(CAST(d2sum AS DOUBLE))"
                f" / (CAST(n AS DOUBLE) * {S.Q_SCALE}) * 1e6) AS BIGINT)"
            ).alias("d_q"),
        )
    )
    a_side = dev.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        F.sum("d_q").cast("bigint").alias("d_sum"),
    )
    a_mean = a_side.select(
        "label",
        "n_points",
        (
            F.col("d_sum").cast("double") / F.col("n_points").cast("double")
            / F.lit(1e6)
        ).alias("a_mean"),
    )
    ca, cb = cent.alias("ca"), cent.alias("cb")
    cdist = (
        ca.join(
            cb,
            (F.col("ca.dim") == F.col("cb.dim"))
            & (F.col("ca.label") != F.col("cb.label")),
        )
        .select(
            F.col("ca.label").alias("la"),
            F.col("cb.label").alias("lb"),
            (
                (
                    F.col("ca.s").cast("decimal(38,0)") * F.col("cb.n")
                    - F.col("cb.s").cast("decimal(38,0)") * F.col("ca.n")
                )
                * (
                    F.col("ca.s").cast("decimal(38,0)") * F.col("cb.n")
                    - F.col("cb.s").cast("decimal(38,0)") * F.col("ca.n")
                )
            ).alias("d2"),
            F.col("ca.n").alias("na"),
            F.col("cb.n").alias("nb"),
        )
        .groupBy("la", "lb")
        .agg(
            F.min("na").alias("na"),
            F.min("nb").alias("nb"),
            F.sum("d2").alias("d2sum"),
        )
        .select(
            "la",
            "lb",
            F.expr(
                "SQRT(CAST(d2sum AS DOUBLE))"
                f" / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) * {S.Q_SCALE})"
            ).alias("cdist"),
        )
    )
    ai = a_mean.select(F.col("label").alias("la"), F.col("a_mean").alias("a_i"))
    aj = a_mean.select(F.col("label").alias("lb"), F.col("a_mean").alias("a_j"))
    rmax = (
        cdist.join(ai, "la")
        .join(aj, "lb")
        .groupBy("la")
        .agg(
            F.max(
                (F.col("a_i") + F.col("a_j")) / F.col("cdist")
            ).alias("r_max")
        )
        .select(
            "la",
            "r_max",
            F.round(F.col("r_max") * 1e6).cast("bigint").alias("r_q"),
        )
    )
    glob = rmax.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("r_q").cast("bigint").alias("rq_sum"),
    )
    return (
        a_mean.join(rmax, F.col("label") == F.col("la"))
        .crossJoin(F.broadcast(glob))
        .select(
            "label",
            "n_points",
            F.round("a_mean", 6).alias("a_mean"),
            F.round("r_max", 6).alias("r_max"),
            F.round(
                F.col("rq_sum").cast("double")
                / F.col("k").cast("double")
                / F.lit(1e6),
                6,
            ).alias("db_index"),
        )
        .orderBy("label")
    )


_DAVIES_BOULDIN_SQL = """
WITH q AS (
  SELECT label, vec_id, i - 1 AS dim,
         CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS v
  FROM (SELECT label, vec_id, embedding,
               unnest(generate_series(1, 64)) AS i FROM embeddings)
), cent AS (
  SELECT label, dim, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(v) AS BIGINT) AS s
  FROM q GROUP BY label, dim
), dev AS (
  SELECT q.label, q.vec_id, MIN(c.n) AS n,
         SUM((CAST(q.v AS HUGEINT) * c.n - c.s)
             * (CAST(q.v AS HUGEINT) * c.n - c.s)) AS d2sum
  FROM q JOIN cent c ON q.label = c.label AND q.dim = c.dim
  GROUP BY q.label, q.vec_id
), a_side AS (
  SELECT label, CAST(COUNT(*) AS BIGINT) AS n_points,
         CAST(SUM(CAST(ROUND(SQRT(CAST(d2sum AS DOUBLE))
                    / (CAST(n AS DOUBLE) * 1000000) * 1e6) AS BIGINT))
              AS BIGINT) AS d_sum
  FROM dev GROUP BY label
), a_mean AS (
  SELECT label, n_points,
         CAST(d_sum AS DOUBLE) / CAST(n_points AS DOUBLE) / 1e6 AS a_mean
  FROM a_side
), cdist AS (
  SELECT ca.label AS la, cb.label AS lb,
         SQRT(CAST(SUM((CAST(ca.s AS HUGEINT) * cb.n
                        - CAST(cb.s AS HUGEINT) * ca.n)
                       * (CAST(ca.s AS HUGEINT) * cb.n
                          - CAST(cb.s AS HUGEINT) * ca.n)) AS DOUBLE))
           / (CAST(MIN(ca.n) AS DOUBLE) * CAST(MIN(cb.n) AS DOUBLE)
              * 1000000) AS cdist
  FROM cent ca JOIN cent cb
    ON ca.dim = cb.dim AND ca.label <> cb.label
  GROUP BY ca.label, cb.label
), rmax AS (
  SELECT c.la,
         MAX((ai.a_mean + aj.a_mean) / c.cdist) AS r_max,
         CAST(ROUND(MAX((ai.a_mean + aj.a_mean) / c.cdist) * 1e6) AS BIGINT)
           AS r_q
  FROM cdist c
  JOIN a_mean ai ON ai.label = c.la
  JOIN a_mean aj ON aj.label = c.lb
  GROUP BY c.la
), gl AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(r_q) AS BIGINT) AS rq_sum
  FROM rmax
)
SELECT a.label, a.n_points,
       ROUND(a.a_mean, 6) AS a_mean,
       ROUND(r.r_max, 6) AS r_max,
       ROUND(CAST(g.rq_sum AS DOUBLE) / CAST(g.k AS DOUBLE) / 1e6, 6)
         AS db_index
FROM a_mean a JOIN rmax r ON a.label = r.la CROSS JOIN gl g
ORDER BY a.label
"""


# --- entropy rate of the stationary event-type chain ---------------------------------

_PI_ITERS = 12  # matches ev_markov_stationary (plans/wave48.py)


def ev_entropy_rate_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the event-type transition chain:
    H = sum_i pi_i * H(next | i) with pi from the same 12-round
    unrolled power iteration as ev_markov_stationary
    (plans/wave48.py — which also guards the no-sink property loudly,
    so the chain is shared and not re-guarded here) and the per-state
    conditional entropy kept exact: H(next|i) = ln(rt_i) - (1/rt_i) *
    sum_j c_ij ln(c_ij), where every c ln(c) term is micro-quantized
    to an integer BEFORE the per-state sum (order-free), and the final
    cross-state sum multiplies micro-quantized pi and H as integers.
    Scale shape: one fact-scale lag-window pass, then enum x enum."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.select("user_id", "event_id", "ts", F.col("event_type").alias("cur"))
        .withColumn("nxt", F.lead("cur").over(w))
        .where(F.col("nxt").isNotNull())
    )
    counts = pairs.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("c"))
    rowtot = counts.groupBy("cur").agg(F.sum("c").alias("rt"))
    p = (
        counts.join(rowtot, "cur")
        .select("cur", "nxt", "c", "rt")
        .localCheckpoint(eager=False)
    )
    types = p.select(F.col("cur").alias("t")).distinct()
    n_types = types.agg(F.count(F.lit(1)).alias("k"))
    x = types.crossJoin(F.broadcast(n_types)).select(
        "t", (F.lit(1.0) / F.col("k").cast("double")).alias("pi")
    )
    for _ in range(_PI_ITERS):
        x = (
            x.join(p, F.col("t") == F.col("cur"))
            .groupBy(F.col("nxt").alias("t2"))
            .agg(
                F.sum(
                    F.col("pi") * F.col("c").cast("double")
                    / F.col("rt").cast("double")
                ).alias("pi")
            )
            .select(F.col("t2").alias("t"), "pi")
        )
    # per-state conditional entropy in exact integer micro-nats:
    # h_micro = rt * round(ln(rt)*1e6) - sum_j c * round(ln(c)*1e6)
    h = (
        p.select(
            "cur",
            "rt",
            (
                F.col("c").cast("decimal(38,0)")
                * F.round(F.log(F.col("c").cast("double")) * 1e6).cast(
                    "decimal(38,0)"
                )
            ).alias("clnc"),
        )
        .groupBy("cur")
        .agg(F.min("rt").alias("rt"), F.sum("clnc").alias("clnc_sum"))
        .select(
            "cur",
            F.round(
                (
                    F.col("rt").cast("decimal(38,0)")
                    * F.round(
                        F.log(F.col("rt").cast("double")) * 1e6
                    ).cast("decimal(38,0)")
                    - F.col("clnc_sum")
                ).cast("double")
                / F.col("rt").cast("double")
            )
            .cast("bigint")
            .alias("h_q"),
        )
    )
    per_state = (
        x.join(h, F.col("t") == F.col("cur"))
        .select(
            F.col("t").alias("event_type"),
            "pi",
            "h_q",
            F.round(F.col("pi") * 1e6).cast("bigint").alias("pi_q"),
        )
        .select(
            "event_type",
            "pi",
            "h_q",
            (F.col("pi_q") * F.col("h_q")).cast("bigint").alias("contrib_q"),
        )
    )
    glob = per_state.agg(
        F.sum("contrib_q").cast("bigint").alias("hsum_q")
    )
    return (
        per_state.crossJoin(F.broadcast(glob))
        .select(
            "event_type",
            F.round("pi", 6).alias("pi"),
            F.round(F.col("h_q").cast("double") / 1e6, 6).alias("h_cond"),
            F.round(F.col("hsum_q").cast("double") / 1e12, 6).alias(
                "entropy_rate"
            ),
        )
        .orderBy("event_type")
    )


def _entropy_rate_sql() -> str:
    rounds = []
    prev = "x0"
    for i in range(1, _PI_ITERS + 1):
        rounds.append(
            f"x{i} AS MATERIALIZED (\n"
            f"  SELECT p.nxt AS t,\n"
            f"         SUM(x.pi * CAST(p.c AS DOUBLE) / CAST(p.rt AS DOUBLE))"
            f" AS pi\n"
            f"  FROM {prev} x JOIN p ON x.t = p.cur GROUP BY p.nxt\n)"
        )
        prev = f"x{i}"
    return f"""
WITH pairs AS (
  SELECT event_type AS cur,
         LEAD(event_type) OVER (PARTITION BY user_id
           ORDER BY ts, event_id) AS nxt
  FROM events
), counts AS (
  SELECT cur, nxt, COUNT(*) AS c FROM pairs WHERE nxt IS NOT NULL
  GROUP BY cur, nxt
), p AS MATERIALIZED (
  SELECT cur, nxt, c, SUM(c) OVER (PARTITION BY cur) AS rt FROM counts
), x0 AS MATERIALIZED (
  SELECT t, 1.0 / (SELECT COUNT(*) FROM (SELECT DISTINCT cur FROM p))
           AS pi
  FROM (SELECT DISTINCT cur AS t FROM p)
),
{", ".join(rounds)},
h AS (
  SELECT cur,
         CAST(ROUND(CAST(MIN(rt) * CAST(ROUND(LN(CAST(MIN(rt) AS DOUBLE))
                                              * 1e6) AS HUGEINT)
                         - SUM(CAST(c AS HUGEINT)
                               * CAST(ROUND(LN(CAST(c AS DOUBLE)) * 1e6)
                                      AS HUGEINT)) AS DOUBLE)
                    / CAST(MIN(rt) AS DOUBLE)) AS BIGINT) AS h_q
  FROM p GROUP BY cur
), per_state AS (
  SELECT x.t AS event_type, x.pi, h.h_q,
         CAST(ROUND(x.pi * 1e6) AS BIGINT) * h.h_q AS contrib_q
  FROM {prev} x JOIN h ON x.t = h.cur
), gl AS (
  SELECT CAST(SUM(contrib_q) AS BIGINT) AS hsum_q FROM per_state
)
SELECT event_type, ROUND(pi, 6) AS pi,
       ROUND(CAST(h_q AS DOUBLE) / 1e6, 6) AS h_cond,
       ROUND(CAST(hsum_q AS DOUBLE) / 1e12, 6) AS entropy_rate
FROM per_state CROSS JOIN gl
ORDER BY event_type
"""


QUERIES = {
    "li_gini_by_brand": li_gini_by_brand,
    "emb_davies_bouldin": emb_davies_bouldin,
    "ev_entropy_rate_stationary": ev_entropy_rate_stationary,
}

ORACLES = {
    "li_gini_by_brand": _GINI_BRAND_SQL,
    "emb_davies_bouldin": _DAVIES_BOULDIN_SQL,
    "ev_entropy_rate_stationary": _entropy_rate_sql(),
}
