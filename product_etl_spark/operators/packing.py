"""Scale-safe prefix sums + context packing.

A naive running total (``Window.orderBy(key)`` with no partitionBy)
moves the entire dataset to ONE task — fine on a laptop, fatal on a
100 TB corpus. ``bucketed_cumsum`` computes the identical prefix sum in
two phases:

1. per-bucket cumsum, parallel across ``floor(order_col / width)``
   buckets (order-preserving because order_col is numeric);
2. per-bucket totals → cumulative offsets via a window over the
   *bucket* frame (rows = n_buckets ≈ corpus/width — dimension-sized),
   broadcast back and added.

Reference parity: the packing semantics mirror the sequence-packing
step of a pretraining data pipeline (greedy by cumulative token count);
the reference engine has no streaming analogue — this is a
forward-looking training-data operator (SURVEY §2 extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# ~1M ids per bucket: at 100 TB / ~1e10 docs that is ~1e4 buckets for
# the offset frame — comfortably dimension-sized.
DEFAULT_BUCKET_WIDTH = 1 << 20


def bucketed_cumsum(
    df: DataFrame,
    order_col: str,
    val_col: str,
    out_col: str = "cum_before",
    bucket_width: int = DEFAULT_BUCKET_WIDTH,
    inclusive: bool = False,
) -> DataFrame:
    """Prefix sum of ``val_col`` in ascending ``order_col`` order
    without a whole-dataset window. ``inclusive=False`` (default) gives
    the sum of *strictly preceding* rows (0 for the first row), the
    shape context packing needs; ``inclusive=True`` includes the
    current row. ``order_col`` must be numeric and unique. NULL
    order values form their own bucket that sorts FIRST (Spark's
    NULLS-FIRST ascending) — a plain equi-join here would silently
    DROP those rows (NULL never equi-matches), so the offset join is
    null-safe to keep the result exhaustive and deterministic."""
    upper = 0 if inclusive else -1
    bucket = F.floor(F.col(order_col) / F.lit(bucket_width))
    w_in = (
        Window.partitionBy("_pack_bucket")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, upper)
    )
    t = df.withColumn("_pack_bucket", bucket).withColumn(
        "_cum_in", F.coalesce(F.sum(val_col).over(w_in), F.lit(0).cast("long"))
    )
    totals = t.groupBy("_pack_bucket").agg(F.sum(val_col).alias("_bucket_total"))
    # Window over n_buckets rows only — dimension-sized at any scale.
    w_bucket = Window.orderBy("_pack_bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "_pack_bucket",
        F.coalesce(F.sum("_bucket_total").over(w_bucket), F.lit(0).cast("long")).alias(
            "_bucket_offset"
        ),
    )
    offsets = offsets.withColumnRenamed("_pack_bucket", "_pack_bucket_r")
    return (
        t.join(
            F.broadcast(offsets),
            F.col("_pack_bucket").eqNullSafe(F.col("_pack_bucket_r")),
        )
        .withColumn(out_col, (F.col("_cum_in") + F.col("_bucket_offset")).cast("long"))
        .drop("_pack_bucket", "_pack_bucket_r", "_cum_in", "_bucket_offset")
    )


def pack_contexts(
    docs: DataFrame,
    order_col: str,
    tokens_col: str,
    pack_size: int = 512,
    bucket_width: int = DEFAULT_BUCKET_WIDTH,
) -> DataFrame:
    """Assign documents (in ``order_col`` order) to ~``pack_size``-token
    context packs by cumulative token count; returns the input plus
    ``pack_id``. Two-phase cumsum — no global window over the corpus."""
    c = bucketed_cumsum(
        docs, order_col, tokens_col, out_col="_cum_before", bucket_width=bucket_width
    )
    return c.withColumn(
        "pack_id", F.floor(F.col("_cum_before") / F.lit(pack_size)).cast("long")
    ).drop("_cum_before")


def chunk_documents(
    docs: DataFrame,
    max_tokens: int = 64,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document's token sequence into sliding windows of
    ``max_tokens`` whitespace tokens with ``overlap`` tokens shared
    between consecutive chunks — the standard long-document
    preprocessing ahead of a fixed-context trainer (pack_contexts is
    the dual: it JOINS short docs, this SPLITS long ones).

    Map-only: tokenize, generate window starts with
    ``sequence(0, n-1, step)`` executor-side (never a driver loop,
    never a corpus-wide window), explode, slice. Chunk count per doc
    is ceil(n/step) — bounded by document length, so one huge
    document fans out to many rows instead of one huge task.

    Returns (doc_id, chunk_id, n_tokens, chunk_text); deterministic,
    and empty/NULL documents yield no chunks.
    """
    if not (0 <= overlap < max_tokens):
        raise ValueError(
            f"overlap must satisfy 0 <= overlap < max_tokens "
            f"(got overlap={overlap}, max_tokens={max_tokens})"
        )
    step = max_tokens - overlap
    from product_etl_spark.functions.text import tokens

    toked = docs.select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("_toks")
    ).filter(F.size("_toks") > 0)
    return (
        toked.select(
            "doc_id",
            "_toks",
            # start grid stops at the last start that contributes a
            # NEW token (start <= n - overlap - 1): a start inside the
            # final overlap region would emit a chunk fully contained
            # in its predecessor — pure duplicate training data
            F.posexplode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.size("_toks") - overlap - 1, F.lit(0)),
                    F.lit(step),
                )
            ).alias("chunk_id", "_start"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.slice(F.col("_toks"), F.col("_start") + 1, max_tokens).alias(
                "_chunk"
            ),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.size("_chunk").alias("n_tokens"),
            F.array_join("_chunk", " ").alias("chunk_text"),
        )
    )


def chunk_documents_oracle_sql(max_tokens: int = 64, overlap: int = 0) -> str:
    """DuckDB SQL mirroring chunk_documents over the ``documents``
    view: same whitespace tokenization, same start grid
    (range(0, n, step) = the starts strictly below n), same clamped
    slice."""
    if not (0 <= overlap < max_tokens):
        # the Spark twin raises too; an unvalidated oracle would
        # silently generate range(0, n, 0) = zero rows and "pass"
        raise ValueError(
            f"overlap must satisfy 0 <= overlap < max_tokens "
            f"(got overlap={overlap}, max_tokens={max_tokens})"
        )
    step = max_tokens - overlap
    return f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(COALESCE(text, ''), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ), s AS (
      SELECT doc_id, toks,
             unnest(range(0, GREATEST(len(toks) - {overlap}, 1), {step}))
               AS start,
             generate_subscripts(
               range(0, GREATEST(len(toks) - {overlap}, 1), {step}), 1) - 1
               AS chunk_id
      FROM t WHERE len(toks) > 0
    )
    SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
           len(toks[start + 1 : start + {max_tokens}]) AS n_tokens,
           array_to_string(toks[start + 1 : start + {max_tokens}], ' ')
             AS chunk_text
    FROM s
    """


def next_event_training_pairs(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    event_id_col: str = "event_id",
    context: int = 3,
) -> DataFrame:
    """Supervised next-event training examples from event logs — the
    (context window -> label) extraction every sequence-model data
    pipeline runs: for each event, the space-joined sequence of up to
    ``context`` PRECEDING event types of the same user is the input
    and the event itself is the label. Rows whose context is empty
    (each user's first event) are dropped — no label-only examples.

    Output: (user, ctx, label, n_ctx) where ``ctx`` is the
    space-joined context string (oldest first) and ``n_ctx`` its
    length — filter n_ctx = context for fixed-length examples.

    Scale shape: ONE user-partitioned window with a bounded
    ROWS BETWEEN context PRECEDING AND 1 PRECEDING frame (state is
    per-row k-bounded; never a global window), order totalised by
    (ts, event_id_col) so two engines emit identical context strings.
    """
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col).asc(), F.col(event_id_col).asc())
        .rowsBetween(-context, -1)
    )
    ctx = F.array_join(
        F.collect_list(F.col(event_col)).over(w), " "
    )
    return (
        events.select(
            F.col(user_col),
            F.col(event_id_col),
            ctx.alias("ctx"),
            F.col(event_col).alias("label"),
        )
        .withColumn(
            "n_ctx",
            F.when(F.col("ctx") == "", F.lit(0)).otherwise(
                F.size(F.split(F.col("ctx"), " "))
            ),
        )
        .filter(F.col("n_ctx") > 0)
        .select(user_col, event_id_col, "ctx", "label", "n_ctx")
    )


def temperature_mixture_budgets(
    df: DataFrame,
    domain_col: str,
    total_budget: int,
    temperature: int = 2,
) -> DataFrame:
    """Temperature-scaled domain sampling budgets — the mixing step a
    multi-source training pipeline runs before drawing its corpus
    (mT5/XLM-R recipe): domain i gets share ∝ n_i^(1/T), flattening
    the head so low-resource domains are not drowned by raw
    proportions. T=1 is proportional; T→∞ is uniform.

    Output: (domain, n_docs, weight, share, sample_budget) — weight is
    n^(1/T) rounded 1e-9, share is weight over the decimal sum of all
    weights rounded 1e-6, sample_budget = floor(total_budget * share).
    Floor never over-allocates; the remainder (total - Σbudgets, at
    most n_domains rows) is the caller's to assign (largest-remainder
    or drop).

    Engine-exactness: T=2 uses sqrt — a CORRECTLY-ROUNDED IEEE op any
    engine reproduces bit-for-bit — and the cross-domain sum of
    weights is an order-free DECIMAL sum of the 1e-9-rounded terms
    (the q142 mean recipe), so shares and budgets are driver-hashable
    (q191). Other temperatures go through pow(), which is NOT
    correctly rounded across math libraries — fine inside one engine,
    not cross-engine; the docstring is the contract boundary.

    Scale shape: one groupBy(domain) with map-side combine, one
    broadcast 1-row total, pure map after — domains are the only
    cardinality anywhere.
    """
    counts = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    if temperature == 2:
        w = F.sqrt(F.col("n_docs").cast("double"))
    else:
        w = F.pow(
            F.col("n_docs").cast("double"), F.lit(1.0 / float(temperature))
        )
    weighted = counts.withColumn("weight", F.round(w, 9))
    total = weighted.agg(
        F.sum(F.col("weight").cast("decimal(28,9)")).alias("_tw")
    )
    return (
        weighted.crossJoin(F.broadcast(total))
        .withColumn(
            "share",
            F.round(F.col("weight") / F.col("_tw").cast("double"), 6),
        )
        .select(
            "domain",
            "n_docs",
            "weight",
            "share",
            F.floor(F.lit(int(total_budget)) * F.col("share"))
            .cast("bigint")
            .alias("sample_budget"),
        )
    )
