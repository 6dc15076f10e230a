"""Importance-weighted data selection (DSIR-style) for pretraining
corpora.

Data Selection with Importance Resampling (Xie et al., NeurIPS 2023)
scores every raw document by how much more likely its hashed n-gram
features are under a small TARGET corpus (the distribution you want —
e.g. Wikipedia, curated English) than under the RAW pool, then keeps
the top-scoring slice. The per-document importance weight is

    log w(doc) = sum_f c_doc(f) * [ log p_target(f) - log p_raw(f) ]

with features f = hashed unigrams/bigrams bucketed into a fixed-size
table (so model state is O(n_buckets), never vocabulary- or
corpus-sized) and add-one smoothing on both sides.

Scale shape:

- Tokenization and bucketing are pure Catalyst expressions
  (``text.hash64`` md5 bucketing — engine-portable, so the DuckDB
  oracle reproduces bucket ids bit-for-bit).
- The two feature tables are groupBy counts BOUNDED BY n_buckets
  (map-side partial agg; the shuffle moves at most n_buckets rows per
  task regardless of corpus size).
- Scoring joins corpus (doc, bucket, count) rows against the
  n_buckets-row ratio table — broadcast, since the table is fixed
  kilobytes — then one groupBy(doc) sum. Two corpus passes total
  (count features, score), zero Python.
- Per-doc score uses AVG of per-token log-ratios with ROUND(.,4) at
  the surface (the q113 float policy: deterministic IEEE ops per row,
  rounding only at the result boundary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from product_etl_spark.functions import text as T


def _doc_buckets(
    df: DataFrame, text_col: str, id_col: str, n_buckets: int
) -> DataFrame:
    """(id, bucket, n) hashed-unigram counts per document.

    Bucket id = portable md5 hash of the lowercased token, mod
    n_buckets — pmod so the result is non-negative in both engines.
    """
    tok = df.select(
        F.col(id_col),
        F.explode(T.tokens(F.lower(F.col(text_col)))).alias("tok"),
    )
    return (
        tok.withColumn("bucket", F.pmod(T.hash64("tok"), F.lit(n_buckets)))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def bucket_logratio_table(
    target: DataFrame,
    raw: DataFrame,
    text_col: str,
    n_buckets: int = 1024,
) -> DataFrame:
    """(bucket, logratio) for every occupied bucket: add-one-smoothed
    log(p_target(bucket) / p_raw(bucket)). At most n_buckets rows —
    driver- and broadcast-safe by construction.
    """

    def counts(df: DataFrame, out: str) -> DataFrame:
        tok = df.select(F.explode(T.tokens(F.lower(F.col(text_col)))).alias("tok"))
        return (
            tok.withColumn("bucket", F.pmod(T.hash64("tok"), F.lit(n_buckets)))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias(out))
        )

    tc = counts(target, "n_t")
    rc = counts(raw, "n_r")
    tot_t = tc.agg(F.sum("n_t").alias("tot_t"))
    tot_r = rc.agg(F.sum("n_r").alias("tot_r"))
    # Full outer: a bucket seen only in one corpus still gets its
    # smoothed ratio (that asymmetry IS the signal DSIR selects on).
    joined = (
        tc.join(rc, "bucket", "full_outer")
        .crossJoin(F.broadcast(tot_t))
        .crossJoin(F.broadcast(tot_r))
    )
    b = F.lit(n_buckets).cast("double")
    p_t = (F.coalesce("n_t", F.lit(0)) + 1).cast("double") / (
        F.col("tot_t").cast("double") + b
    )
    p_r = (F.coalesce("n_r", F.lit(0)) + 1).cast("double") / (
        F.col("tot_r").cast("double") + b
    )
    return joined.select("bucket", (F.log(p_t) - F.log(p_r)).alias("logratio"))


def importance_scores(
    corpus: DataFrame,
    target: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int = 1024,
) -> DataFrame:
    """(id, n_tokens, score): per-document DSIR importance score —
    the TOKEN-AVERAGED log importance weight (length-normalized so
    long documents aren't favored merely for repeating target-like
    tokens; rank by it and keep the top slice, or sample with
    Gumbel noise for the 'resampling' in DSIR).
    """
    ratios = bucket_logratio_table(target, corpus, text_col, n_buckets)
    doc = _doc_buckets(corpus, text_col, id_col, n_buckets)
    scored = doc.join(F.broadcast(ratios), "bucket")
    return scored.groupBy(id_col).agg(
        F.sum("n").alias("n_tokens"),
        F.round(
            F.sum(F.col("n").cast("double") * F.col("logratio"))
            / F.sum(F.col("n")).cast("double"),
            4,
        ).alias("score"),
    )


def select_top_fraction(
    scored: DataFrame, frac: float, id_col: str = "doc_id"
) -> DataFrame:
    """Keep the top ``frac`` of documents by score — exact threshold
    via approx_percentile twin: the cutoff is computed as a 1-row
    aggregate (approx at scale; the catalog query keeps an exact
    ORDER BY variant as its oracle-checked twin)."""
    cut = scored.agg(
        F.expr(f"approx_percentile(score, {1.0 - frac})").alias("cut")
    )
    return scored.crossJoin(F.broadcast(cut)).filter(
        F.col("score") >= F.col("cut")
    ).drop("cut")


def woe_binning(
    df,
    value_col: str,
    label_col,
    tiebreak_col: str,
    n_bins: int = 10,
) -> "DataFrame":
    """Weight-of-evidence feature binning — the classic supervised
    scorecard transform (per quantile bin of ``value_col``:
    ``WOE = ln((pos_i/pos_tot)/(neg_i/neg_tot))`` with +0.5 Laplace
    smoothing, plus the bin's information-value term
    ``IV_i = (pos_i/pos_tot - neg_i/neg_tot) * WOE``). A training
    pipeline uses the WOE table to encode a continuous column and the
    IV sum to rank features.

    Bins are exact NTILE semantics computed WITHOUT the single-task
    global window NTILE(n) OVER (ORDER BY …) plans:
    ``linkage.global_sort_ranks`` assigns dense global ranks (range
    partition + parallel local windows + offset map) and
    ``bin = (rank-1)*n_bins // N + 1`` reproduces NTILE's
    remainder-to-the-front bucket sizes exactly — integer-decided, so
    two engines cannot disagree on membership. The only floats are
    the WOE/IV surface (IEEE ops in a fixed order, ROUND(.,6) at the
    boundary — the q113/q133/q138 log policy).

    ``label_col``: boolean Column or column name (the positive class).
    ``tiebreak_col`` must make (value, tiebreak) a total order.

    Scale shape: one global-rank pass (no global window), one
    groupBy(bin) with map-side combine (n_bins result rows), totals
    as a broadcast 1-row frame joined onto the bins.
    """
    from pyspark.sql import functions as F

    from product_etl_spark.operators.linkage import global_sort_ranks

    lab = F.col(label_col) if isinstance(label_col, str) else label_col
    base = df.select(
        F.col(value_col).alias("_v"),
        F.col(tiebreak_col).alias("_tb"),
        lab.cast("int").alias("_pos"),
    ).filter(F.col("_v").isNotNull())
    ranked = global_sort_ranks(base, ["_v", "_tb"], rank_col="_rank")
    n_total = ranked.count()
    # integer division, never float: (r-1)*k/N computed in floating
    # point can land at 3.9999999... and misbin one row per boundary
    binned = ranked.withColumn(
        "bin",
        F.expr(f"((_rank - 1) * {n_bins}) div {n_total}") + F.lit(1),
    )
    bins = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("_pos").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("_pos")).alias("n_neg"),
    )
    totals = bins.agg(
        F.sum("n_pos").alias("_tp"), F.sum("n_neg").alias("_tn")
    )
    pos_rate = (F.col("n_pos") + F.lit(0.5)) / (F.col("_tp") + F.lit(0.5))
    neg_rate = (F.col("n_neg") + F.lit(0.5)) / (F.col("_tn") + F.lit(0.5))
    return (
        bins.crossJoin(F.broadcast(totals))
        .select(
            "bin",
            "n_rows",
            "n_pos",
            "n_neg",
            F.round(F.log(pos_rate / neg_rate), 6).alias("woe"),
            F.round(
                (pos_rate - neg_rate) * F.log(pos_rate / neg_rate), 6
            ).alias("iv_term"),
        )
    )
