"""Corpus-curation and behavioral-analytics plans: the operators a
large-scale training-data pipeline runs between raw crawl and training
shards — near-dup graph clustering (the step after pair generation),
sub-document (chunk) dedup, TF-IDF term weighting, Gopher-style
repetition signals — plus event funnel / retention cohorts and an
iterative k-means step over embeddings.

Everything here is engine-portable (md5 hashes, integer-exact ratios,
quantized vector math) and oracle-checked end-to-end, including the
iterative pieces: connected components is mirrored by a recursive-CTE
transitive closure, and the Lloyd step by the same deterministic
assign+average expressed in SQL.

Reference parity note: the reference pipeline has no corpus operators
(SURVEY.md §2.10 — these are the north-star extensions required by
BASELINE.json), so every query below cites only the driver fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from planning_center_data_pipeline_spark.operators import dedup as D
from planning_center_data_pipeline_spark.operators import similarity as S
from planning_center_data_pipeline_spark.operators import textstats as X
from planning_center_data_pipeline_spark.plans.extensions import (
    _SHINGLE_CTE,
    _simhash_portable_sql,
)
from planning_center_data_pipeline_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# The portable-simhash SELECT (md5 family, 60-bit) embedded as a CTE by
# the oracles below — one source of truth with doc_simhash_portable.
_SH_CTE = f"sh AS ({_simhash_portable_sql(60)})"

_CHUNKS_CTE = """
ch AS (
  SELECT doc_id, simhash, c, (simhash >> (c * 15)) & 32767 AS chunk
  FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS c) cs
)"""

_EDGES_CTE = """
cand AS (
  SELECT DISTINCT a.doc_id AS id_1, b.doc_id AS id_2,
         bit_count(xor(a.simhash, b.simhash)) AS hamming
  FROM ch a JOIN ch b
    ON a.c = b.c AND a.chunk = b.chunk AND a.doc_id < b.doc_id
), edges AS (
  SELECT id_1, id_2, hamming FROM cand WHERE hamming <= 5
)"""


# --- near-dup graph: edges then connected components ------------------------

def doc_near_dup_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable-SimHash near-dup pair generation (signature → 15-bit
    chunk blocking → Hamming verify ≤ 5) — the edge list the clustering
    step consumes, hash-checked stage-for-stage against SQL."""
    d = _t(spark, sf_dir, "documents")
    return (
        D.simhash_near_dups_portable(d, "doc_id", "text", max_hamming=5)
        .withColumn("hamming", F.col("hamming").cast("long"))
        .orderBy("id_1", "id_2")
    )


DOC_NEAR_DUP_EDGES_SQL = f"""
WITH {_SH_CTE}, {_CHUNKS_CTE}, {_EDGES_CTE}
SELECT id_1, id_2, CAST(hamming AS BIGINT) AS hamming
FROM edges ORDER BY id_1, id_2
"""


def doc_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster assignment: connected components over the
    near-dup edge graph (iterative min-label propagation with pointer
    jumping — see operators/dedup.connected_components for the 100 TB
    design), every doc labeled with its cluster representative (the
    minimum doc_id reachable) and the cluster size.  The oracle
    replays the same closure with a recursive CTE."""
    d = _t(spark, sf_dir, "documents")
    edges = D.simhash_near_dups_portable(d, "doc_id", "text", max_hamming=5)
    comp = D.connected_components(
        edges.select("id_1", "id_2"), d.select(F.col("doc_id").alias("node"))
    )
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        comp.join(sizes, "component")
        .select(
            F.col("node").alias("doc_id"), "component", "cluster_size"
        )
        .orderBy("doc_id")
    )


DOC_DUP_CLUSTERS_SQL = f"""
WITH RECURSIVE {_SH_CTE}, {_CHUNKS_CTE}, {_EDGES_CTE},
e AS (
  SELECT id_1 AS a, id_2 AS b FROM edges
  UNION ALL
  SELECT id_2, id_1 FROM edges
),
reach(n, m) AS (
  SELECT doc_id, doc_id FROM sh
  UNION
  SELECT r.n, e.b FROM reach r JOIN e ON e.a = r.m
),
comp AS (
  SELECT n AS doc_id, MIN(m) AS component FROM reach GROUP BY n
)
SELECT c.doc_id, c.component, z.cluster_size
FROM comp c
JOIN (SELECT component, COUNT(*) AS cluster_size FROM comp GROUP BY component) z
  USING (component)
ORDER BY doc_id
"""


# --- sub-document (chunk) dedup ---------------------------------------------

def doc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-style dedup at sub-document granularity: split each
    doc into consecutive 4-token chunks, keep only each chunk's global
    first occurrence (ordered by doc_id, then position), and reassemble
    the surviving text.  One shuffle on the chunk key; the reassembly
    is a per-doc sort inside an aggregate, never a driver loop."""
    d = _t(spark, sf_dir, "documents")
    tokd = d.select(
        "doc_id", X.tokens(X.normalize_text(F.col("text"))).alias("tk")
    )
    n_chunks = F.ceil(F.size("tk") / F.lit(4)).cast("int")
    chunk_arr = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(" ", F.slice(F.col("tk"), i * 4 + 1, 4)),
    )
    chunks = tokd.select(
        "doc_id", F.posexplode(chunk_arr).alias("idx", "chunk")
    )
    w = Window.partitionBy("chunk").orderBy("doc_id", "idx")
    flagged = chunks.withColumn("rn", F.row_number().over(w))
    kept_struct = F.when(F.col("rn") == 1, F.struct("idx", "chunk"))
    agg = flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)), lambda s: s["chunk"]
            ),
            " ",
        ).alias("__joined"),
    )
    return agg.select(
        "doc_id",
        "n_chunks",
        "n_kept",
        F.when(F.col("n_kept") > 0, F.col("__joined")).alias("kept_text"),
    ).orderBy("doc_id")


DOC_CHUNK_DEDUP_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+') AS tk
  FROM documents
), ch AS (
  SELECT doc_id, i AS idx,
         array_to_string(tk[i*4+1 : i*4+4], ' ') AS chunk
  FROM (SELECT doc_id, tk,
               unnest(generate_series(0, CAST(ceil(len(tk)/4.0) AS BIGINT) - 1)) AS i
        FROM toks)
), flagged AS (
  SELECT doc_id, idx, chunk,
         ROW_NUMBER() OVER (PARTITION BY chunk ORDER BY doc_id, idx) AS rn
  FROM ch
)
SELECT doc_id,
       COUNT(*) AS n_chunks,
       COUNT(*) FILTER (rn = 1) AS n_kept,
       string_agg(chunk, ' ' ORDER BY idx) FILTER (rn = 1) AS kept_text
FROM flagged
GROUP BY doc_id
ORDER BY doc_id
"""


# --- TF-IDF -----------------------------------------------------------------

def doc_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 terms per document by smoothed TF-IDF
    (tf * (ln((1+N)/(1+df)) + 1), sklearn-style smoothing so ubiquitous
    terms keep a nonzero weight).  Two shuffles: (doc, term) counts,
    then term document-frequencies joined back; N arrives via a
    broadcast 1-row aggregate, never a driver-side collect.

    The score is rounded to 9 decimals BEFORE ranking: ln() differs by
    1 ulp between JVM and DuckDB libm for some inputs, and both the
    emitted value and the rank order must be computed from identical
    numbers for the oracle hash to be stable."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(X.tokens(X.normalize_text(F.col("text")))).alias("term"),
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    ndocs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(ndocs))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf").cast("double")
                * (
                    F.log(
                        (F.lit(1.0) + F.col("n_docs"))
                        / (F.lit(1.0) + F.col("df"))
                    )
                    + F.lit(1.0)
                ),
                9,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .orderBy("doc_id", "rank")
    )


DOC_TFIDF_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(
           trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM toks WHERE term <> '' GROUP BY doc_id, term
), dfreq AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), nd AS (
  SELECT COUNT(*) AS n_docs FROM documents
), scored AS (
  SELECT doc_id, term, tf, df,
         round(CAST(tf AS DOUBLE) * (ln((1.0 + n_docs) / (1.0 + df)) + 1.0), 9) AS tfidf
  FROM tf JOIN dfreq USING (term) CROSS JOIN nd
)
SELECT doc_id, term, tf, df, tfidf, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, term) AS rank
  FROM scored
) WHERE rank <= 5
ORDER BY doc_id, rank
"""


# --- repetition / quality signals (Gopher-style) ----------------------------

def doc_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition metrics used in corpus quality filters
    (Gopher/Dolma style): type-token ratio, top-token share, top-bigram
    share, mean token length.  All exact integer counts turned into
    double ratios in a fixed op order."""
    d = _t(spark, sf_dir, "documents")
    tokd = d.select(
        "doc_id", X.tokens(X.normalize_text(F.col("text"))).alias("tk")
    )
    per_tok = (
        tokd.select("doc_id", F.explode("tk").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tok_stats = per_tok.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("cnt").alias("top_tok_n"),
        F.sum(F.col("cnt") * F.length("tok")).alias("len_sum"),
    )
    bigram_arr = F.transform(
        F.sequence(F.lit(1), F.size("tk") - 1),
        lambda i: F.concat_ws(
            " ", F.element_at(F.col("tk"), i), F.element_at(F.col("tk"), i + 1)
        ),
    )
    per_bg = (
        tokd.filter(F.size("tk") >= 2)
        .select("doc_id", F.explode(bigram_arr).alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    bg_stats = per_bg.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_bigrams"), F.max("cnt").alias("top_bg_n")
    )
    return (
        tok_stats.join(bg_stats, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("n_distinct").cast("double") / F.col("n_tokens")).alias(
                "distinct_ratio"
            ),
            (F.col("top_tok_n").cast("double") / F.col("n_tokens")).alias(
                "top_token_frac"
            ),
            F.coalesce(
                F.col("top_bg_n").cast("double") / F.col("n_bigrams"), F.lit(0.0)
            ).alias("top_bigram_frac"),
            (F.col("len_sum").cast("double") / F.col("n_tokens")).alias(
                "mean_tok_len"
            ),
        )
        .orderBy("doc_id")
    )


DOC_REPETITION_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+') AS tk
  FROM documents
), per_tok AS (
  SELECT doc_id, tok, COUNT(*) AS cnt
  FROM (SELECT doc_id, unnest(tk) AS tok FROM toks)
  GROUP BY doc_id, tok
), tok_stats AS (
  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_tokens, COUNT(*) AS n_distinct,
         MAX(cnt) AS top_tok_n, SUM(cnt * length(tok)) AS len_sum
  FROM per_tok GROUP BY doc_id
), per_bg AS (
  SELECT doc_id, bg, COUNT(*) AS cnt
  FROM (
    SELECT doc_id, tk[i] || ' ' || tk[i+1] AS bg
    FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 1)) AS i
          FROM toks WHERE len(tk) >= 2)
  ) GROUP BY doc_id, bg
), bg_stats AS (
  SELECT doc_id, SUM(cnt) AS n_bigrams, MAX(cnt) AS top_bg_n
  FROM per_bg GROUP BY doc_id
)
SELECT t.doc_id,
       t.n_tokens,
       CAST(t.n_distinct AS DOUBLE) / t.n_tokens AS distinct_ratio,
       CAST(t.top_tok_n AS DOUBLE) / t.n_tokens AS top_token_frac,
       COALESCE(CAST(b.top_bg_n AS DOUBLE) / b.n_bigrams, 0.0) AS top_bigram_frac,
       CAST(t.len_sum AS DOUBLE) / t.n_tokens AS mean_tok_len
FROM tok_stats t LEFT JOIN bg_stats b USING (doc_id)
ORDER BY t.doc_id
"""


# --- event funnel / retention -----------------------------------------------

def ev_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view→click→purchase funnel per user: first view, first
    click strictly after it, first purchase strictly after that, and
    the stage reached.  Each step is a filtered aggregate shrunk to
    |users| rows before the next join, so event data is scanned three
    times but never shuffled at event granularity more than once per
    step; the per-user tables broadcast."""
    e = _t(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(F.broadcast(v), "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(c), "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "t_view",
            "t_click",
            "t_purchase",
            (
                F.lit(1)
                + F.col("t_click").isNotNull().cast("int")
                + F.col("t_purchase").isNotNull().cast("int")
            )
            .cast("long")
            .alias("stage"),
        )
        .orderBy("user_id")
    )


EV_FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t_view
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS t_purchase
  FROM events e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
  GROUP BY e.user_id
)
SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
       CAST(1 + (c.t_click IS NOT NULL)::INT
              + (p.t_purchase IS NOT NULL)::INT AS BIGINT) AS stage
FROM v
LEFT JOIN c ON c.user_id = v.user_id
LEFT JOIN p ON p.user_id = v.user_id
ORDER BY v.user_id
"""


def ev_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-activity week,
    counted as active in each subsequent week.  Two aggregations over
    events (first-seen per user, distinct active weeks per user) and
    one broadcast join — the classic triangle retention matrix."""
    e = _t(spark, sf_dir, "events")
    first = e.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort_week")
    )
    active = e.select(
        "user_id", F.to_date(F.date_trunc("week", F.col("ts"))).alias("w")
    ).distinct()
    return (
        active.join(F.broadcast(first), "user_id")
        .select(
            "cohort_week",
            (F.datediff("w", "cohort_week") / 7).cast("long").alias("week_n"),
            "user_id",
        )
        .groupBy("cohort_week", "week_n")
        .agg(F.count_distinct("user_id").alias("n_users"))
        # date columns stringify differently across engines' pandas paths
        # (datetime.date vs datetime64) — emit ISO strings for the compare
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_n",
            "n_users",
        )
        .orderBy("cohort_week", "week_n")
    )


EV_RETENTION_SQL = """
WITH first AS (
  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY user_id
), active AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS w
  FROM events
)
SELECT strftime(f.cohort_week, '%Y-%m-%d') AS cohort_week,
       CAST(date_diff('day', f.cohort_week, a.w) // 7 AS BIGINT) AS week_n,
       COUNT(DISTINCT a.user_id) AS n_users
FROM active a JOIN first f USING (user_id)
GROUP BY 1, 2
ORDER BY 1, 2
"""


def ev_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-type transition counts (the Markov matrix
    behind path analysis): per user, events ordered by (ts, event_id),
    adjacent pairs counted corpus-wide.  One window shuffle on user_id,
    then a tiny (|types|^2) aggregate."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("from_type", F.lag("event_type").over(w))
        .filter(F.col("from_type").isNotNull())
        .groupBy("from_type", F.col("event_type").alias("to_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("from_type", "to_type")
    )


EV_TRANSITION_SQL = """
SELECT from_type, event_type AS to_type, COUNT(*) AS n
FROM (
  SELECT user_id, event_type, ts,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS from_type
  FROM events
)
WHERE from_type IS NOT NULL
GROUP BY from_type, to_type
ORDER BY from_type, to_type
"""



# --- k-means (one Lloyd iteration) ------------------------------------------

def emb_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One deterministic Lloyd iteration over the embeddings (seed =
    16 lowest-id vectors, cosine assignment, exact quantized-mean
    update) — the iterative-training building block, hash-checked
    against the same assign+average in SQL."""
    e = _t(spark, sf_dir, "embeddings")
    return S.kmeans_lloyd_step(e, n_centroids=16)


EMB_KMEANS_STEP_SQL = f"""
WITH allv AS (
  SELECT vec_id, i,
         CAST(ROUND(CAST(embedding[i] AS DOUBLE)*{S.Q_SCALE}) AS BIGINT) AS v
  FROM (SELECT vec_id, embedding, unnest(generate_series(1, 64)) AS i
        FROM embeddings)
), norms AS (
  SELECT vec_id, CAST(SUM(v*v) AS BIGINT) AS nsq FROM allv GROUP BY vec_id
), cent_ids AS (
  SELECT vec_id AS centroid_id FROM embeddings ORDER BY vec_id LIMIT 16
), cent_cos AS (
  SELECT d.nid, d.centroid_id,
         CAST(d.dot AS DOUBLE)/sqrt(CAST(nn.nsq AS DOUBLE))
           /sqrt(CAST(nc.nsq AS DOUBLE)) AS cos
  FROM (
    SELECT a.vec_id AS nid, c.centroid_id, CAST(SUM(a.v*b.v) AS BIGINT) AS dot
    FROM allv a
    JOIN cent_ids c ON TRUE
    JOIN allv b ON b.vec_id = c.centroid_id AND b.i = a.i
    GROUP BY 1, 2
  ) d
  JOIN norms nn ON nn.vec_id = d.nid
  JOIN norms nc ON nc.vec_id = d.centroid_id
), assign AS (
  SELECT nid, centroid_id AS cell FROM (
    SELECT nid, centroid_id,
           ROW_NUMBER() OVER (PARTITION BY nid ORDER BY cos DESC, centroid_id) rn
    FROM cent_cos
  ) WHERE rn = 1
)
SELECT s.cell, v.i - 1 AS dim,
       CAST(SUM(v.v) AS DOUBLE) / COUNT(*) / {S.Q_SCALE} AS centroid,
       COUNT(*) AS n_members
FROM assign s JOIN allv v ON v.vec_id = s.nid
GROUP BY s.cell, v.i
ORDER BY cell, dim
"""


# --- deterministic split / sharding / packing --------------------------------

def doc_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment by content-independent
    id hash (md5 60-bit mod 100: <80 train, <90 val, else test) — the
    standard reproducible corpus split: stable under reprocessing,
    shard-count changes, and engine choice, unlike rand()-based
    sampling."""
    d = _t(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        % 100
    )
    return (
        d.select("doc_id", "lang", bucket.alias("hash_bucket"))
        .withColumn(
            "split",
            F.when(F.col("hash_bucket") < 80, "train")
            .when(F.col("hash_bucket") < 90, "val")
            .otherwise("test"),
        )
        .orderBy("doc_id")
    )


DOC_HASH_SPLIT_SQL = """
SELECT doc_id, lang,
       CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100
         AS hash_bucket,
       CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 < 80
            THEN 'train'
            WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 < 90
            THEN 'val'
            ELSE 'test' END AS split
FROM documents
ORDER BY doc_id
"""


def doc_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing for training shards: within each source
    (deterministic doc order), docs are laid head-to-tail and cut into
    512-token packs by running-total offset.  One window cumsum plus
    one aggregation — the whole packing plan shuffles each source
    partition once, never serializes through the driver."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "source",
        F.size(X.tokens(X.normalize_text(F.col("text")))).cast("long").alias(
            "n_tok"
        ),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = toks.withColumn("cum", F.sum("n_tok").over(w)).withColumn(
        "pack_id", ((F.col("cum") - F.col("n_tok")) / 512).cast("bigint")
    )
    return (
        packed.groupBy("source", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("tok_total"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("source", "pack_id")
    )


DOC_SEQ_PACKING_SQL = r"""
WITH toks AS (
  SELECT doc_id, source,
         CAST(len(regexp_split_to_array(
           trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+')) AS BIGINT)
           AS n_tok
  FROM documents
), packed AS (
  SELECT doc_id, source, n_tok,
         SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM toks
)
SELECT source, CAST((cum - n_tok) // 512 AS BIGINT) AS pack_id,
       COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS tok_total,
       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
FROM packed
GROUP BY source, pack_id
ORDER BY source, pack_id
"""


def doc_quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-score decile binning (curriculum/filter thresholds):
    ntile(10) over the full corpus ordered by (quality, doc_id), then
    per-decile stats.  The exact global rank is computed WITHOUT a
    single-partition window (round-7 VERDICT item 5): 31 VALUE-
    deterministic percentile cuts on quality (1-row broadcast; value
    buckets, not repartitionByRange+pid — the range sampler reseeds
    per execution), row_number locally per bucket, shift by the
    preceding buckets' counts (<=32-row offset window), then apply
    the exact SQL-standard NTILE formula — the first n%10 tiles carry
    one extra row — from the 1-row corpus count.  Bit-identical to
    ntile(10) OVER (ORDER BY quality, doc_id) and fully parallel."""
    d = _t(spark, sf_dir, "documents")
    q = d.select("doc_id", X.quality_score(F.col("text")).alias("quality"))
    qcs = [i / 32.0 for i in range(1, 32)]
    # frequency-weighted percentile over the distinct-quality rollup:
    # identical cuts to percentile over raw docs with a buffer bounded
    # by the score lattice (the quality formula emits a finite value
    # set); a truly continuous score would get a micro-unit quantize
    # here (round(q*1e6)) — monotone bucketing keeps the rank exact.
    qfreq = q.groupBy("quality").agg(F.count(F.lit(1)).alias("freq"))
    vcuts = qfreq.agg(
        F.percentile(
            "quality", F.array(*[F.lit(x) for x in qcs]), F.col("freq")
        ).alias("vcut")
    )  # 1 row
    n_below = sum(
        (F.col("quality") > F.element_at("vcut", i + 1)).cast("int")
        for i in range(31)
    )
    p = q.crossJoin(F.broadcast(vcuts)).select(
        "doc_id", "quality", n_below.alias("bk")
    )
    w_local = Window.partitionBy("bk").orderBy("quality", "doc_id")
    local = p.withColumn("rn_local", F.row_number().over(w_local))
    totals = local.groupBy("bk").agg(F.count(F.lit(1)).alias("p_total"))
    w_off = Window.orderBy("bk").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "offset", F.coalesce(F.sum("p_total").over(w_off), F.lit(0))
    ).select("bk", "offset")
    nrow = q.agg(F.count(F.lit(1)).alias("n"))  # 1 row
    ranked = (
        local.join(F.broadcast(offsets), "bk")
        .crossJoin(F.broadcast(nrow))
        .withColumn("rn", F.col("rn_local") + F.col("offset"))
    )
    # exact NTILE(10): with n = q*10 + s, tiles 1..s hold q+1 rows
    # (front-loaded, SQL standard); CASE is lazy so the DIV in the
    # ELSE branch never sees q=0 (when n < 10 every row takes the
    # THEN branch).
    decile = F.expr(
        "CASE WHEN rn <= (n % 10) * (n DIV 10 + 1)"
        "     THEN (rn - 1) DIV (n DIV 10 + 1) + 1"
        "     ELSE (n % 10) + (rn - 1 - (n % 10) * (n DIV 10 + 1))"
        "          DIV (n DIV 10) + 1 END"
    )
    return (
        ranked.withColumn("decile", decile.cast("long"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("quality").alias("q_min"),
            F.max("quality").alias("q_max"),
        )
        .orderBy("decile")
    )


_QUALITY_EXPR_SQL = """
  SELECT doc_id,
         0.5 * LEAST(CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE)/64.0, 1.0)
         + 0.3 * (CASE WHEN CAST(length(text) AS DOUBLE)/GREATEST(CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE),1.0) >= 3.0
                        AND CAST(length(text) AS DOUBLE)/GREATEST(CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE),1.0) <= 10.0
                       THEN 1.0 ELSE 0.5 END)
         - 0.1 * (CAST(len(regexp_extract_all(text, '([.,;:!?])', 1)) AS DOUBLE)/GREATEST(CAST(length(text) AS DOUBLE),1.0))
         - 0.1 * (CAST(len(regexp_extract_all(text, '([0-9])', 1)) AS DOUBLE)/GREATEST(CAST(length(text) AS DOUBLE),1.0)) AS quality
  FROM documents
"""

DOC_QUALITY_DECILES_SQL = f"""
WITH q AS ({_QUALITY_EXPR_SQL})
SELECT decile, COUNT(*) AS n_docs, MIN(quality) AS q_min, MAX(quality) AS q_max
FROM (
  SELECT doc_id, quality,
         CAST(NTILE(10) OVER (ORDER BY quality, doc_id) AS BIGINT) AS decile
  FROM q
)
GROUP BY decile
ORDER BY decile
"""


def doc_hash_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic balanced subsample: 3 docs per source, chosen by
    md5 rank — a reproducible stand-in for per-stratum random sampling
    (same sample on every rerun, any partitioning, any engine).  One
    window per source partition; at 100 TB the rank key is computed in
    the scan and the window only sorts within strata."""
    d = _t(spark, sf_dir, "documents")
    rk = D.md5_hash60(
        F.concat_ws("|", F.col("source"), F.col("doc_id").cast("string"))
    )
    w = Window.partitionBy("source").orderBy("rk", "doc_id")
    return (
        d.select("doc_id", "source", rk.alias("rk"))
        .withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= 3)
        .drop("rk")
        .orderBy("source", "sample_rank")
    )


DOC_HASH_SAMPLE_SQL = """
SELECT doc_id, source, sample_rank FROM (
  SELECT doc_id, source,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY CAST('0x' || substr(md5(source || '|' || CAST(doc_id AS VARCHAR)), 1, 15)
                         AS BIGINT),
                    doc_id) AS BIGINT) AS sample_rank
  FROM documents
)
WHERE sample_rank <= 3
ORDER BY source, sample_rank
"""


def doc_quality_bins_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-cut-point quality binning — the scan-only production swap
    for doc_quality_deciles' global ntile sort: bin boundaries at
    0.2/0.4/0.6/0.8 turn binning into a pure per-row expression plus
    one partial-aggregated groupBy, no global sort anywhere."""
    d = _t(spark, sf_dir, "documents")
    q = X.quality_score(F.col("text"))
    bin_ = (
        F.lit(1)
        + (q >= 0.2).cast("int")
        + (q >= 0.4).cast("int")
        + (q >= 0.6).cast("int")
        + (q >= 0.8).cast("int")
    ).cast("long")
    return (
        d.select(bin_.alias("bin"), q.alias("quality"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("quality").alias("q_min"),
            F.max("quality").alias("q_max"),
        )
        .orderBy("bin")
    )


DOC_QUALITY_BINS_FIXED_SQL = f"""
WITH q AS ({_QUALITY_EXPR_SQL})
SELECT CAST(1 + (quality >= 0.2)::INT + (quality >= 0.4)::INT
              + (quality >= 0.6)::INT + (quality >= 0.8)::INT AS BIGINT) AS bin,
       COUNT(*) AS n_docs, MIN(quality) AS q_min, MAX(quality) AS q_max
FROM q
GROUP BY 1
ORDER BY bin
"""



# --- count-min sketch (portable) --------------------------------------------

def doc_cms_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the token stream (4 md5 hash rows x 64
    buckets), then per-token estimates (min over rows of the bucket
    counters) joined against exact counts.  The sketch build is one
    groupBy over (row, bucket) — mergeable across shards by summing
    counters, which is why CMS is the 100 TB way to approximate heavy
    hitters; the estimate >= exact invariant is visible in the output."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(X.tokens(X.normalize_text(F.col("text")))).alias("tok")
    ).filter(F.col("tok") != "")
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("j"),
                    (D.md5_hash60(F.col("tok"), seed=j) % 64).alias("bucket"),
                )
                for j in range(4)
            ]
        )
    )
    cms = (
        toks.select("tok", rows.alias("rb"))
        .select("tok", "rb.j", "rb.bucket")
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_n"))
    probes = exact.select(
        "tok",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        (D.md5_hash60(F.col("tok"), seed=j) % 64).alias("bucket"),
                    )
                    for j in range(4)
                ]
            )
        ).alias("rb"),
    ).select("tok", "exact_n", "rb.j", "rb.bucket")
    return (
        probes.join(cms, ["j", "bucket"])
        .groupBy("tok", "exact_n")
        .agg(F.min("cnt").alias("cms_n"))
        .orderBy("tok")
    )


DOC_CMS_SQL = r"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(
           trim(regexp_replace(lower(text), '\s+', ' ', 'g')), '\s+')) AS tok
  FROM documents
), t AS (
  SELECT tok FROM toks WHERE tok <> ''
), hashed AS (
  SELECT tok, j,
         CAST('0x' || substr(md5(CAST(j AS VARCHAR) || '|' || tok), 1, 15) AS BIGINT) % 64
           AS bucket
  FROM t CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS j) js
), cms AS (
  SELECT j, bucket, COUNT(*) AS cnt FROM hashed GROUP BY j, bucket
), exact AS (
  SELECT tok, COUNT(*) AS exact_n FROM t GROUP BY tok
), probes AS (
  SELECT e.tok, e.exact_n, j,
         CAST('0x' || substr(md5(CAST(j AS VARCHAR) || '|' || e.tok), 1, 15) AS BIGINT) % 64
           AS bucket
  FROM exact e CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS j) js
)
SELECT p.tok, p.exact_n, MIN(c.cnt) AS cms_n
FROM probes p JOIN cms c ON c.j = p.j AND c.bucket = p.bucket
GROUP BY p.tok, p.exact_n
ORDER BY p.tok
"""


# --- Python UDTF: document chunker -------------------------------------------
# Spark 4's user-defined TABLE function surface: one input row ->
# many output rows, used from SQL as a correlated LATERAL table.
# Deterministic chunking (16-token windows), so the whole UDTF is hash-
# checked against a pure-SQL oracle.  NOTE the scale stance: a Python
# UDTF runs row-at-a-time in the Python worker — fine for control-
# plane-ish fan-outs, but hot-path chunking stays in expressions (see
# doc_chunk_dedup); this query exists to cover (and verify) the API.

_CHUNK_W = 16


def _chunk_udtf_cls():
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_no bigint, chunk_text string, n_toks bigint")
    class ChunkDoc:
        def eval(self, text: str):
            toks = (text or "").lower().split()
            for i in range(0, len(toks), _CHUNK_W):
                c = toks[i : i + _CHUNK_W]
                yield (i // _CHUNK_W, " ".join(c), len(c))

    return ChunkDoc


def doc_udtf_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.udtf.register("chunk_doc", _chunk_udtf_cls())
    _t(spark, sf_dir, "documents").createOrReplaceTempView("v_documents_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_no, c.chunk_text, c.n_toks
        FROM v_documents_udtf d, LATERAL chunk_doc(d.text) c
        ORDER BY d.doc_id, c.chunk_no
        """
    )


DOC_UDTF_CHUNKS_SQL = rf"""
WITH t AS (
  SELECT doc_id,
         regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
                               ' ') AS tk
  FROM documents
)
SELECT doc_id,
       CAST(g.i AS BIGINT) AS chunk_no,
       array_to_string(tk[g.i*{_CHUNK_W}+1 : g.i*{_CHUNK_W}+{_CHUNK_W}], ' ')
         AS chunk_text,
       CAST(LEAST({_CHUNK_W}, len(tk) - g.i*{_CHUNK_W}) AS BIGINT) AS n_toks
FROM t, LATERAL (
  SELECT unnest(generate_series(0,
    CAST(ceil(len(tk)/{_CHUNK_W}.0) AS INT) - 1)) AS i
) g
ORDER BY doc_id, chunk_no
"""


# --- eval-set decontamination ----------------------------------------------

def doc_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing 3-gram
    shingles with a held-out eval slice (doc_id % 20 == 0 stands in for
    the benchmark set).  Single pass over the shingle table: a window
    over each shingle's rows marks whether ANY eval doc carries it,
    then one groupBy(doc_id) folds hit and total counts — two shuffles
    total, the corpus is tokenized exactly once (the broadcast-eval-set
    formulation scanned and shingled it twice).  At 100 TB both
    shuffles key on high-cardinality columns (shingle, doc_id), so the
    plan has no small-side or driver bottleneck."""
    d = _t(spark, sf_dir, "documents")
    sh = D.shingle_table(d, "doc_id", "text", k=3).withColumn(
        "is_eval", (F.col("doc_id") % 20 == 0).cast("int")
    )
    w = Window.partitionBy("shingle")
    flagged = sh.withColumn("in_eval", F.max("is_eval").over(w))
    return (
        flagged.filter(F.col("is_eval") == 0)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_sh"),
            F.sum("in_eval").alias("n_hits"),
        )
        .select(
            "doc_id",
            "n_sh",
            "n_hits",
            (F.col("n_hits").cast("double") / F.col("n_sh").cast("double")).alias(
                "contamination"
            ),
        )
        .orderBy("doc_id")
    )


DOC_DECONTAMINATE_SQL = f"""
WITH {_SHINGLE_CTE},
ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 20 = 0),
tr AS (SELECT * FROM sh WHERE doc_id % 20 <> 0),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM tr GROUP BY doc_id),
hits AS (
  SELECT t.doc_id, COUNT(*) AS hits
  FROM tr t JOIN ev USING (shingle) GROUP BY t.doc_id
)
SELECT s.doc_id, s.n_sh, COALESCE(h.hits, 0) AS n_hits,
       CAST(COALESCE(h.hits, 0) AS DOUBLE)/CAST(s.n_sh AS DOUBLE)
         AS contamination
FROM sizes s LEFT JOIN hits h USING (doc_id)
ORDER BY doc_id
"""


# --- token-budget shard manifest (scalable global prefix sum) ---------------

_SHARD_TOKENS = 4096


def doc_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign docs to fixed-token-budget output shards by global
    cumulative token count in doc_id order — the manifest step before
    writing training shards.

    A naive `SUM() OVER (ORDER BY doc_id)` funnels the whole corpus
    through ONE partition; this uses the scalable two-phase prefix sum
    instead: range-partition on doc_id, per-partition running sums (32
    parallel windows), then a window over the tiny per-partition-totals
    table (rows = #partitions) broadcast back as offsets.  Identical
    result, no single-partition stage over the data."""
    d = _t(spark, sf_dir, "documents")
    ntok = d.select(
        "doc_id", X.token_count(F.col("text")).cast("long").alias("n_toks")
    )
    # NOTE: pid-based prefix sums rely on Catalyst reusing the range
    # exchange between the offsets subtree and the stream side — range
    # boundaries are SAMPLED per execution, so without reuse the two
    # sides can disagree (observed in an aggregated-input variant; see
    # wave10.ml_auc_rank for the value-deterministic bucket version).
    # This plan's exchange reuse is stable: hash-checked repeatedly.
    p = ntok.repartitionByRange(32, "doc_id").withColumn(
        "pid", F.spark_partition_id()
    )
    w_local = (
        Window.partitionBy("pid")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = p.withColumn("local_cum", F.sum("n_toks").over(w_local))
    totals = local.groupBy("pid").agg(F.sum("n_toks").alias("p_total"))
    # window over <= 32 rows — the only global-ordered stage, by design
    w_off = Window.orderBy("pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.withColumn(
        "offset", F.coalesce(F.sum("p_total").over(w_off), F.lit(0))
    ).select("pid", "offset")
    return (
        local.join(F.broadcast(offsets), "pid")
        .withColumn("cum_toks", F.col("local_cum") + F.col("offset"))
        .withColumn(
            "shard_id",
            F.floor(
                (F.col("cum_toks") - F.col("n_toks"))
                / F.lit(_SHARD_TOKENS)
            ),
        )
        .select("doc_id", "n_toks", "cum_toks", "shard_id")
        .orderBy("doc_id")
    )


DOC_SHARD_MANIFEST_SQL = rf"""
WITH t AS (
  SELECT doc_id,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
           AS n_toks
  FROM documents
), c AS (
  SELECT doc_id, n_toks,
         CAST(SUM(n_toks) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cum_toks
  FROM t
)
SELECT doc_id, n_toks, cum_toks,
       CAST(FLOOR((cum_toks - n_toks) / {_SHARD_TOKENS}.0) AS BIGINT)
         AS shard_id
FROM c ORDER BY doc_id
"""


# --- exact z-score outliers --------------------------------------------------

def ev_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier events by per-type z-score, exact at any parallelism:
    moments come from decimal(38,0) integer sums (see
    agg_stats_moments), assembled into mean/stddev by one fixed-order
    double formula, then broadcast back onto the event stream — two
    scans, no window, no skew sensitivity."""
    e = _t(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("decimal(38,0)").alias("cv"),
    )
    cv = F.col("cv")
    stats = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(cv).alias("s"),
        F.sum(cv * cv).alias("ssq"),
    )
    n, s, ssq = F.col("n"), F.col("s"), F.col("ssq")
    stats = stats.select(
        "event_type",
        (s.cast("double") / n.cast("double")).alias("mean_c"),
        F.sqrt(
            (n * ssq - s * s).cast("double") / (n * (n - 1)).cast("double")
        ).alias("std_c"),
    )
    z = (cv.cast("double") - F.col("mean_c")) / F.col("std_c")
    return (
        e.join(F.broadcast(stats), "event_type")
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) >= 3.0)
        .select(
            "event_id", "event_type", cv.cast("long").alias("value_cents"), "z"
        )
        .orderBy("event_id")
    )


EV_ZSCORE_SQL = """
WITH e AS (
  SELECT event_id, event_type,
         CAST(ROUND(value*100) AS HUGEINT) AS cv
  FROM events
), st AS (
  SELECT event_type,
         COUNT(*) AS n, SUM(cv) AS s, SUM(cv*cv) AS ssq
  FROM e GROUP BY event_type
), m AS (
  SELECT event_type,
         CAST(s AS DOUBLE)/CAST(n AS DOUBLE) AS mean_c,
         sqrt(CAST(n*ssq - s*s AS DOUBLE)/CAST(n*(n-1) AS DOUBLE)) AS std_c
  FROM st
)
SELECT event_id, event_type, CAST(cv AS BIGINT) AS value_cents,
       (CAST(cv AS DOUBLE) - mean_c)/std_c AS z
FROM e JOIN m USING (event_type)
WHERE abs((CAST(cv AS DOUBLE) - mean_c)/std_c) >= 3.0
ORDER BY event_id
"""


QUERIES = {
    "doc_hash_split": doc_hash_split,
    "doc_hash_sample_per_source": doc_hash_sample_per_source,
    "doc_sequence_packing": doc_sequence_packing,
    "doc_quality_deciles": doc_quality_deciles,
    "doc_quality_bins_fixed": doc_quality_bins_fixed,
    "doc_cms_token_counts": doc_cms_token_counts,
    "doc_near_dup_edges": doc_near_dup_edges,
    "doc_dup_clusters": doc_dup_clusters,
    "doc_chunk_dedup": doc_chunk_dedup,
    "doc_tfidf_top_terms": doc_tfidf_top_terms,
    "doc_repetition_signals": doc_repetition_signals,
    "ev_funnel_stages": ev_funnel_stages,
    "ev_retention_cohorts": ev_retention_cohorts,
    "ev_transition_matrix": ev_transition_matrix,
    "emb_kmeans_step": emb_kmeans_step,
    "doc_udtf_chunks": doc_udtf_chunks,
    "doc_decontaminate": doc_decontaminate,
    "doc_shard_manifest": doc_shard_manifest,
    "ev_zscore_anomaly": ev_zscore_anomaly,
}

ORACLES = {
    "doc_hash_split": DOC_HASH_SPLIT_SQL,
    "doc_hash_sample_per_source": DOC_HASH_SAMPLE_SQL,
    "doc_sequence_packing": DOC_SEQ_PACKING_SQL,
    "doc_quality_deciles": DOC_QUALITY_DECILES_SQL,
    "doc_quality_bins_fixed": DOC_QUALITY_BINS_FIXED_SQL,
    "doc_cms_token_counts": DOC_CMS_SQL,
    "doc_near_dup_edges": DOC_NEAR_DUP_EDGES_SQL,
    "doc_dup_clusters": DOC_DUP_CLUSTERS_SQL,
    "doc_chunk_dedup": DOC_CHUNK_DEDUP_SQL,
    "doc_tfidf_top_terms": DOC_TFIDF_SQL,
    "doc_repetition_signals": DOC_REPETITION_SQL,
    "ev_funnel_stages": EV_FUNNEL_SQL,
    "ev_retention_cohorts": EV_RETENTION_SQL,
    "ev_transition_matrix": EV_TRANSITION_SQL,
    "emb_kmeans_step": EMB_KMEANS_STEP_SQL,
    "doc_udtf_chunks": DOC_UDTF_CHUNKS_SQL,
    "doc_decontaminate": DOC_DECONTAMINATE_SQL,
    "doc_shard_manifest": DOC_SHARD_MANIFEST_SQL,
    "ev_zscore_anomaly": EV_ZSCORE_SQL,
}
