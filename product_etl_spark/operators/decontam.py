"""Benchmark decontamination: flag (and drop) training documents that
overlap an evaluation/benchmark set by exact word n-grams.

This is the standard published recipe (GPT-3 appendix C / PaLM /
Llama: n-gram collision against eval sets; Dolma and RedPajama ship
the same shape): build the benchmark's n-gram set, mark any training
document whose distinct n-grams hit it above a threshold.

Scale shape (the reason this is NOT a doc x doc similarity join):
benchmark suites are small — thousands of documents, millions of
grams, megabytes hashed — while the corpus is the 100 TB side. So the
benchmark gram set broadcasts, the corpus side is one explode +
broadcast semi-join + per-doc count, and nothing ever shuffles on the
corpus x benchmark pair space. The threshold compare is integer
(``n_hits * 10 >= n_grams``), so no float boundary can flip a flag
between engines.

Reference parity: the reference repo has no decontamination stage —
this operator is part of the training-data surface BASELINE.json
names as the north star (dedup family; q112 is the catalog entry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from product_etl_spark.operators.dedup import exploded_shingles


def benchmark_ngrams(
    bench: DataFrame, text_col: str, id_col: str, n: int = 5
) -> DataFrame:
    """Distinct word n-grams of the benchmark set: one column ``sh``.

    Distinct-across-docs (set semantics — a gram shared by two
    benchmark docs counts once); callers broadcast this frame.
    """
    return exploded_shingles(bench, text_col, id_col, n).select("sh").distinct()


def contamination_scores(
    docs: DataFrame,
    bench_grams: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 5,
    threshold_pct: int = 10,
) -> DataFrame:
    """Per-document contamination accounting.

    Returns ``(id_col, n_grams, n_hits, contaminated)`` for every
    document with at least one n-gram (documents shorter than ``n``
    tokens have no grams and are absent — they cannot collide).
    ``contaminated`` is 1 when at least ``threshold_pct`` percent of
    the document's distinct n-grams appear in the benchmark set.

    The corpus is tokenized and shuffled ONCE: the benchmark
    membership probe is a broadcast left join that marks each gram
    row, and both counts (total grams, hit grams) come out of a
    single aggregation on the id partitioning the shingle window
    already established. The earlier two-branch shape (semi-join for
    hits + separate size count) re-evaluated the whole shingle
    subtree per branch — twice the scan at 100 TB.
    """
    sh = exploded_shingles(docs, text_col, id_col, n)
    marked = sh.join(
        F.broadcast(bench_grams.withColumn("_hit", F.lit(1))), "sh", "left"
    )
    return marked.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.count("_hit").alias("n_hits"),
    ).withColumn(
        "contaminated",
        (F.col("n_hits") * 100 >= F.col("n_grams") * threshold_pct).cast("int"),
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 5,
    threshold_pct: int = 10,
) -> DataFrame:
    """Drop contaminated documents from ``docs``.

    Documents with fewer than ``n`` tokens are kept (no grams — no
    evidence of contamination), matching the published recipes'
    behavior for short documents.
    """
    grams = benchmark_ngrams(bench, text_col, id_col, n)
    flagged = (
        contamination_scores(docs, grams, text_col, id_col, n, threshold_pct)
        .filter(F.col("contaminated") == 1)
        .select(id_col)
    )
    return docs.join(flagged, id_col, "leftanti")


def fuzzy_contaminated_ids(
    train: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 8,
    bands: int = 4,
    rows_per_band: int = 2,
    shingle_n: int = 2,
) -> DataFrame:
    """FUZZY benchmark decontamination: train docs whose MinHash-LSH
    bands collide with any benchmark doc — catches paraphrased /
    lightly-edited contamination the exact n-gram probe
    (contamination_scores) misses. This is the two-sided complement
    of dedup.lsh_candidate_pairs: same signatures, same banding, but
    the join is train-bands x BENCHMARK-bands instead of self.

    Returns ``(id_col, n_bench_matches)`` — distinct benchmark docs
    sharing at least one band bucket.

    Scale shape: the benchmark side is tiny by contract (eval suites
    vs a 100 TB corpus), so its band frame BROADCASTS; the train
    corpus pays exactly the signature aggregation (one doc-keyed
    shuffle with map-side combine) and a map-side hash join — the
    corpus never shuffles on the band key, and there is no self-join
    quadratic risk."""
    from product_etl_spark.operators.dedup import minhash_signatures

    def _bands(df: DataFrame) -> DataFrame:
        sig = minhash_signatures(df, text_col, id_col, k=k, shingle_n=shingle_n)
        band_hashes = [
            F.md5(
                F.concat_ws(
                    "|",
                    *[f"h{b * rows_per_band + r}" for r in range(rows_per_band)],
                )
            )
            for b in range(bands)
        ]
        return sig.select(
            F.col(id_col),
            F.posexplode(F.array(*band_hashes)).alias("band", "bh"),
        )

    t = _bands(train)
    e = _bands(bench).select(
        F.col(id_col).alias("_bench_id"), "band", "bh"
    )
    return (
        t.join(F.broadcast(e), ["band", "bh"])
        .groupBy(id_col)
        .agg(F.countDistinct("_bench_id").alias("n_bench_matches"))
    )


def fold_contamination_audit(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    n_folds: int = 3,
    n: int = 3,
) -> DataFrame:
    """Cross-FOLD contamination audit: after a per-row fold split
    (q183's portable-hash k-fold), how leaky is each fold really?
    For every fold reports how many of its documents share at least
    one exact word n-gram with ANY other fold, and how many of its
    distinct grams cross fold lines — the measurement that motivates
    cluster-safe folds (q193) over per-row folds, and the
    train/held-out twin of benchmark decontamination (q112, which
    audits train vs an EXTERNAL eval set; this audits the split
    against itself).

    Output: (fold, n_docs, contaminated_docs, shared_grams,
    contamination_rate) — one row per fold.

    Scale shape: fold id is a map-side portable hash; grams come from
    ``exploded_shingles`` (rows, distinct per doc); the cross-fold
    probe joins doc-grams against the DISTINCT (gram, fold) table on
    the gram key — gram-vocabulary-bounded, never doc x doc — and
    both report legs are fold-count-sized aggregates."""
    from product_etl_spark.functions.text import hash64
    from product_etl_spark.operators.dedup import exploded_shingles

    folds = docs.select(
        F.col(id_col),
        F.pmod(hash64(F.col(id_col).cast("string")), F.lit(n_folds))
        .cast("int")
        .alias("fold"),
    )
    dgf = (
        exploded_shingles(docs, text_col, id_col, n)
        .join(folds, id_col)
        .select(id_col, "sh", "fold")
    )
    gf = dgf.select("sh", "fold").distinct()
    # r16 note (measured, kept deliberately): deriving a crossing-
    # gram set via groupBy(sh).agg(min(fold) != max(fold)) and
    # equi-joining it — instead of these two `fold != fold` residual
    # self-joins — was built and REJECTED: at n_folds=3 the residual
    # fan-out is bounded by 3x while the extra aggregate adds a
    # stage per leg (jobs 15 -> ~17/rep, wall flat-to-worse).
    other = gf.select(
        F.col("sh").alias("_osh"), F.col("fold").alias("_ofold")
    )
    cont = (
        dgf.join(
            other,
            (F.col("sh") == F.col("_osh"))
            & (F.col("fold") != F.col("_ofold")),
        )
        .select(id_col, "fold")
        .distinct()
        .groupBy("fold")
        .agg(F.count(F.lit(1)).alias("_cont"))
    )
    shared = (
        gf.join(
            other,
            (F.col("sh") == F.col("_osh"))
            & (F.col("fold") != F.col("_ofold")),
        )
        .select("sh", "fold")
        .distinct()
        .groupBy("fold")
        .agg(F.count(F.lit(1)).alias("_shared"))
    )
    base = folds.groupBy("fold").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        base.join(cont, "fold", "left")
        .join(shared, "fold", "left")
        .select(
            "fold",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.coalesce(F.col("_cont"), F.lit(0))
            .cast("long")
            .alias("contaminated_docs"),
            F.coalesce(F.col("_shared"), F.lit(0))
            .cast("long")
            .alias("shared_grams"),
            F.round(
                F.coalesce(F.col("_cont"), F.lit(0)).cast("double")
                / F.col("n_docs").cast("double"),
                6,
            ).alias("contamination_rate"),
        )
        .orderBy("fold")
    )
