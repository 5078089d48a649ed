"""Round-6 additions (SURVEY.md §2.10 corpus-curation wing): weighted
reservoir sampling and fuzzy (Jaro-Winkler) entity matching — the two
operators previously deferred on cross-engine bit-parity grounds, now
expressible with full SQL oracles via deterministic md5 randomness
(operators/sampling.py) and exact-rational quantized similarity
(functions/fuzzy.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from planning_center_data_pipeline_spark.operators.sampling import (
    aes_key_sql,
    weighted_sample,
)
from planning_center_data_pipeline_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- weighted reservoir sample ----------------------------------------------

def doc_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """500-document A-ES weighted sample, weight = n_chars: longer
    documents proportionally more likely, sampled without replacement,
    byte-deterministic across engines and partitionings (see
    operators/sampling.py).  At 100 TB this is the 'sample k docs
    proportional to token count' curation primitive: per-row key
    expression + TakeOrderedAndProject, no global sort, no shuffle of
    document text."""
    d = _t(spark, sf_dir, "documents")
    return (
        weighted_sample(d, "doc_id", "n_chars", 500)
        .select("doc_id", F.col("n_chars").alias("w_chars"))
        .orderBy("doc_id")
    )


DOC_WEIGHTED_SAMPLE_SQL = f"""
SELECT doc_id, w_chars FROM (
  SELECT doc_id, n_chars AS w_chars
  FROM documents WHERE n_chars > 0
  ORDER BY {aes_key_sql("doc_id", "n_chars")} DESC, doc_id
  LIMIT 500
) ORDER BY doc_id
"""


def doc_weighted_sample_stratified(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source A-ES weighted sample (100 docs per source, weight =
    n_chars): the corpus-mixing primitive — each source keeps its own
    reservoir, so one giant source can't crowd out the rest.  One
    shuffle on source for the windowed top-k; key computation stays
    per-row."""
    from planning_center_data_pipeline_spark.operators.sampling import (
        aes_key,
    )

    d = _t(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    w = Window.partitionBy("source").orderBy(
        F.desc("k"), F.asc("doc_id")
    )
    return (
        d.withColumn("k", aes_key(F.col("doc_id"), F.col("n_chars")))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 100)
        .select("source", "doc_id", F.col("n_chars").alias("w_chars"))
        .orderBy("source", "doc_id")
    )


DOC_WEIGHTED_SAMPLE_STRAT_SQL = f"""
SELECT source, doc_id, w_chars FROM (
  SELECT source, doc_id, n_chars AS w_chars,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY {aes_key_sql("doc_id", "n_chars")} DESC, doc_id
         ) AS rn
  FROM documents WHERE n_chars > 0
) WHERE rn <= 100 ORDER BY source, doc_id
"""


# --- Jaro-Winkler best match -------------------------------------------------

def jw_best_match_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity matching: for each probe part (1-in-97 by key),
    the best Jaro-Winkler match among OTHER parts in the same
    (noun, brand) block — the classic blocked fuzzy-dedup lookup.

    Plan shape: block equi-join against the broadcast probe set bounds
    the candidate pairs (never a cross product over the catalog); the
    JW kernel runs as a vectorized pandas UDF over candidate pairs in
    exact integer arithmetic (functions/fuzzy.py), so the argmax and
    the reported micro-score hash-match DuckDB's native
    jaro_winkler_similarity.  Deterministic tie-break: (jw desc,
    candidate key asc)."""
    from planning_center_data_pipeline_spark.functions.fuzzy import (
        jw_micro_pairs,
    )

    @F.pandas_udf("long")
    def jw_q(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(jw_micro_pairs(a, b), dtype="int64")

    parts = _t(spark, sf_dir, "part").select(
        "p_partkey",
        "p_name",
        F.split(F.col("p_name"), " ").getItem(1).alias("noun"),
        "p_brand",
    )
    probes = parts.filter(F.col("p_partkey") % 97 == 0).select(
        F.col("p_partkey").alias("probe_key"),
        F.col("p_name").alias("probe_name"),
        F.col("noun").alias("p_noun"),
        F.col("p_brand").alias("p_pbrand"),
    )
    cand = parts.join(
        F.broadcast(probes),
        (F.col("noun") == F.col("p_noun"))
        & (F.col("p_brand") == F.col("p_pbrand"))
        & (F.col("p_partkey") != F.col("probe_key")),
    ).select(
        "probe_key",
        F.col("p_partkey").alias("cand_key"),
        jw_q(F.col("probe_name"), F.col("p_name")).alias("jw_micro"),
    )
    w = Window.partitionBy("probe_key").orderBy(
        F.desc("jw_micro"), F.asc("cand_key")
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("probe_key", F.col("cand_key").alias("best_match"), "jw_micro")
        .orderBy("probe_key")
    )


JW_BEST_MATCH_SQL = """
WITH parts AS (
  SELECT p_partkey, p_name, split_part(p_name, ' ', 2) AS noun, p_brand
  FROM part
), cand AS (
  SELECT pr.p_partkey AS probe_key, c.p_partkey AS cand_key,
         CAST(ROUND(jaro_winkler_similarity(pr.p_name, c.p_name) * 1000000)
              AS BIGINT) AS jw_micro
  FROM parts pr
  JOIN parts c
    ON c.noun = pr.noun AND c.p_brand = pr.p_brand
   AND c.p_partkey <> pr.p_partkey
  WHERE pr.p_partkey % 97 = 0
)
SELECT probe_key, cand_key AS best_match, jw_micro FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_key
                               ORDER BY jw_micro DESC, cand_key) AS rn
  FROM cand
) WHERE rn = 1 ORDER BY probe_key
"""


QUERIES = {
    "doc_weighted_sample": doc_weighted_sample,
    "doc_weighted_sample_stratified": doc_weighted_sample_stratified,
    "jw_best_match_parts": jw_best_match_parts,
}

ORACLES = {
    "doc_weighted_sample": DOC_WEIGHTED_SAMPLE_SQL,
    "doc_weighted_sample_stratified": DOC_WEIGHTED_SAMPLE_STRAT_SQL,
    "jw_best_match_parts": JW_BEST_MATCH_SQL,
}
