"""Bigram collocation mining by pointwise mutual information.

PMI(x, y) = ln( p(x,y) / (p(x) p(y)) ) over adjacent word pairs —
the classic collocation statistic (Church & Hanks 1990). Training-data
pipelines use it to surface multi-word expressions worth protecting
from tokenizer splits and to build phrase vocabularies (word2vec's
phrase pass is thresholded PMI).

Reference parity: extends the text-analysis family (token stats q27,
TF-IDF q99, bigram LM q113) — the reference ETL has no corpus
statistics at all; this is the training-data-pipeline superset.

Scale shape: one tokenize + LEAD pass builds bigram rows with
multiplicity (the same shape as the q113 LM trainer — rows, not
per-doc arrays, so arbitrarily long documents never blow task
memory). Pair and unigram counts are map-side-combined groupBy
shuffles bounded by vocabulary, not corpus; the min-count floor is
applied to the pair table BEFORE the two vocabulary joins, so the
joined relation is the frequent tail only. Corpus totals fold from
the count tables themselves (1-row aggregates over vocabulary-sized
input, combined by crossJoin broadcast) — the corpus is tokenized
exactly twice (unigrams; bigrams via the per-doc LEAD), never a
third time for totals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from product_etl_spark.functions import text as T


def bigram_pmi(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_pair_count: int = 10,
) -> DataFrame:
    """(w1, w2, n_pair, pmi) for adjacent-word pairs seen at least
    ``min_pair_count`` times. pmi is rounded to 4 decimals at the
    surface; internal arithmetic is double with a fixed operation
    order so an independent engine reproduces it bit-for-bit."""
    tok = docs.select(
        F.col(id_col),
        F.posexplode(T.tokens(F.lower(F.col(text_col)))).alias("pos", "tok"),
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    bb = (
        tok.select(
            F.col("tok").alias("w1"),
            F.lead("tok", 1).over(w).alias("w2"),
        )
        .filter(F.col("w2").isNotNull())
    )
    pairs_all = bb.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_pair"))
    pairs = pairs_all.filter(F.col("n_pair") >= min_pair_count)
    uni = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("n_tok"))
    # Totals FOLD from the count tables (vocabulary-sized input) —
    # never a separate corpus pass. The corpus is tokenized exactly
    # twice: once for unigrams, once (plus the per-doc LEAD) for
    # bigrams.
    totals = uni.agg(
        F.sum("n_tok").cast("double").alias("n1_total")
    ).crossJoin(
        pairs_all.agg(F.sum("n_pair").cast("double").alias("n2_total"))
    )
    ux = uni.select(F.col("tok").alias("w1"), F.col("n_tok").alias("nx"))
    uy = uni.select(F.col("tok").alias("w2"), F.col("n_tok").alias("ny"))
    return (
        pairs.join(ux, "w1")
        .join(uy, "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            "n_pair",
            F.round(
                F.log(
                    (F.col("n_pair").cast("double") / F.col("n2_total"))
                    / (
                        (F.col("nx").cast("double") / F.col("n1_total"))
                        * (F.col("ny").cast("double") / F.col("n1_total"))
                    )
                ),
                4,
            ).alias("pmi"),
        )
    )


def vocabulary_coverage(
    docs: DataFrame,
    text_col: str,
    thresholds: list[tuple[int, int]] = ((1, 2), (9, 10), (99, 100)),
) -> DataFrame:
    """Vocabulary coverage curve cutpoints: how many distinct terms —
    taken most-frequent-first — cover num/den of ALL token
    occurrences. The tokenizer-design statistic (how big must a word
    vocabulary be before <unk> is rare), the Zipf-tail summary every
    corpus report carries, and the integer-exact complement of the
    top-k vocabulary listing (q77).

    One output row: vocab_size, total_tokens, then one
    ``terms_p<pct>`` column per threshold = the rank of the first
    term (frequency-descending, term-ascending tie-break) whose
    cumulative occurrence count reaches num/den of the total —
    decided by the integer cross-multiplication den*cum >= num*total,
    so no float can diverge.

    Scale shape: term counts are one map-side-combined groupBy
    (vocabulary-bounded); the ranking window is global but runs over
    the VOCABULARY, not the corpus — millions of rows at web scale,
    fine for one task. If vocabulary itself outgrows a task, the
    window swaps for a range-partitioned prefix sum (sort by count
    desc, per-partition partials, broadcast offsets) with identical
    output; the cutpoint logic is unchanged."""
    terms = docs.select(
        F.explode(T.index_terms(F.col(text_col))).alias("term")
    )
    counts = terms.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    order = Window.orderBy(F.col("cnt").desc(), F.col("term").asc())
    ranked = counts.select(
        "cnt",
        F.row_number().over(order).alias("rank"),
        F.sum("cnt").over(
            order.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("cum"),
        F.sum("cnt").over(Window.partitionBy()).alias("_tot"),
    )
    aggs = [
        F.count(F.lit(1)).alias("vocab_size"),
        F.max("_tot").alias("total_tokens"),
    ]
    for num, den in thresholds:
        aggs.append(
            F.min(
                F.when(
                    F.lit(den) * F.col("cum") >= F.lit(num) * F.col("_tot"),
                    F.col("rank"),
                )
            ).alias(f"terms_p{round(100 * num / den)}")
        )
    return ranked.agg(*aggs)


def doc_bigrams(
    docs: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """(id, w1, w2) adjacent-word bigram ROWS per document: lowercase
    tokenize + per-doc LEAD window — the ONE bigram construction
    every LM operator in this module shares (kneser_ney_bigrams,
    kneser_ney_score; q113's skeleton is the same shape), so a
    tokenization or ordering fix lands everywhere at once. Rows, not
    per-doc arrays: documents of any length never blow task memory.
    """
    tok = docs.select(
        F.col(id_col),
        F.posexplode(T.tokens(F.lower(F.col(text_col)))).alias(
            "pos", "tok"
        ),
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    return (
        tok.select(
            F.col(id_col),
            F.col("tok").alias("w1"),
            F.lead("tok", 1).over(w).alias("w2"),
        )
        .filter(F.col("w2").isNotNull())
    )


def kneser_ney_bigrams(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
    top_n: int = 20,
) -> DataFrame:
    """Interpolated Kneser-Ney smoothed bigram probabilities (Kneser &
    Ney 1995; Chen & Goodman 1998's benchmark winner) — the
    modern-smoothing sibling of q113's add-one bigram LM:

        P_kn(w2|w1) = (c(w1,w2) - d) / c(w1,.)
                      + (d * N1+(w1,.) / c(w1,.)) * (N1+(.,w2) / NB)

    where ``N1+(w1,.)`` counts distinct followers of w1, ``N1+(.,w2)``
    counts distinct CONTEXTS of w2 (the continuation count — "how many
    ways can w2 start a phrase", the insight that makes KN beat MLE on
    held-out text), and NB is the number of distinct bigram types.
    Surfaces the ``top_n`` most frequent bigrams with all four counts
    and the probability; every observed bigram has c >= 1 > d so the
    max(c-d, 0) clamp is a no-op here.

    Float policy: counts are exact BIGINTs; p_kn is the fixed
    expression tree a/b + ((d*x)/b)*(y/z) of single correctly-rounded
    IEEE ops on exact-integer doubles, so any engine reproduces it
    bit-for-bit; ROUND(., 9) at the surface.

    Scale shape: tokenize + per-doc LEAD builds bigram ROWS (documents
    of any length never blow task memory); one (w1,w2) map-side-
    combined groupBy bounded by bigram-type vocabulary; the context/
    continuation counts are two vocabulary-bounded window passes over
    the PAIR TABLE (never the corpus); NB folds from the pair table as
    a broadcast 1-row aggregate. The corpus is scanned once."""
    bb = doc_bigrams(docs, text_col, id_col)
    pairs = bb.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("pn"))
    w1w = Window.partitionBy("w1")
    w2w = Window.partitionBy("w2")
    enriched = pairs.select(
        "w1",
        "w2",
        "pn",
        F.sum("pn").over(w1w).alias("cw1"),
        F.count(F.lit(1)).over(w1w).alias("n_follow"),
        F.count(F.lit(1)).over(w2w).alias("n_cont"),
    )
    nb = pairs.agg(F.count(F.lit(1)).alias("nb"))
    d = float(discount)
    out = enriched.crossJoin(F.broadcast(nb)).select(
        "w1",
        "w2",
        "pn",
        "cw1",
        "n_follow",
        "n_cont",
        F.round(
            (F.col("pn").cast("double") - F.lit(d))
            / F.col("cw1").cast("double")
            + (
                (F.lit(d) * F.col("n_follow").cast("double"))
                / F.col("cw1").cast("double")
            )
            * (
                F.col("n_cont").cast("double")
                / F.col("nb").cast("double")
            ),
            9,
        ).alias("pkn"),
    )
    return out.orderBy(F.col("pn").desc(), "w1", "w2").limit(top_n)


def zipf_fit(
    docs: DataFrame,
    text_col: str = "text",
    top_n: int = 100,
) -> DataFrame:
    """Zipf's-law fit of the corpus rank-frequency curve: OLS of
    ln(freq) on ln(rank) over the ``top_n`` most frequent words
    (ranked by count desc, word asc — integer-decided). A healthy
    natural-language corpus fits slope ~ -1 with high r^2; templated
    or machine-generated text bends the curve, so the (slope, r2)
    pair is a cheap corpus-level quality fingerprint next to the
    per-document filters (q58 quality, q113 perplexity, q144
    repetition).

    Output: ONE row (n_pts, vocab, slope, intercept, r2).

    Float policy: ln of exact integers agrees across engines (the
    q113 precedent); each ln is ROUND(.,9) -> DECIMAL(18,9) so every
    OLS moment is an ORDER-FREE exact decimal sum (the q161 recipe
    lifted to log space); slope/intercept/r2 then evaluate once in
    double on identical operands.

    Scale shape: one tokenize + word groupBy (vocabulary-bounded,
    map-side combined); the fit runs over top_n rows — rank is a
    bounded TakeOrdered, the moments are a 1-row aggregate, vocab
    folds from the word table. The corpus is scanned once."""
    tok = docs.select(
        F.explode(T.tokens(F.lower(F.col(text_col)))).alias("tok")
    )
    wc = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    vocab = wc.agg(F.count(F.lit(1)).alias("vocab"))
    from pyspark.sql import Window as W

    # TakeOrderedAndProject first (scale-safe top-k), THEN the rank
    # window over the top_n-row frame only — never a SinglePartition
    # window over the full vocabulary (the global_sort_ranks lesson).
    ranked = (
        wc.orderBy(F.col("n").desc(), F.col("tok").asc())
        .limit(top_n)
        .select(
            "n",
            F.row_number()
            .over(W.orderBy(F.col("n").desc(), F.col("tok").asc()))
            .alias("rank"),
        )
    )
    m = lnln_ols(ranked, "rank", "n")
    return m.crossJoin(F.broadcast(vocab)).select(
        "n_pts",
        F.col("vocab").cast("long").alias("vocab"),
        "slope",
        "intercept",
        "r2",
    )


def lnln_ols(points: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """ONE-row OLS of ln(y) on ln(x) over exact-integer points:
    (n_pts, slope, intercept, r2) — the shared power-law fitter
    behind zipf_fit (q199) and heaps_fit (q200).

    Float policy: ln of exact integers agrees across engines (the
    q113 precedent); each ln is ROUND(.,9) -> DECIMAL(18,9) so every
    OLS moment is an ORDER-FREE exact decimal sum (the q161 recipe
    lifted to log space); slope/intercept/r2 then evaluate once in
    double on identical operands. Degenerate guards (ANSI raises on
    /0): varx = 0 -> slope 0 / flat line through the mean; r2 is 0
    when either variance vanishes."""
    x = F.round(F.log(F.col(x_col).cast("double")), 9).cast(
        "decimal(18,9)"
    )
    y = F.round(F.log(F.col(y_col).cast("double")), 9).cast(
        "decimal(18,9)"
    )
    m = points.agg(
        F.count(F.lit(1)).alias("n_pts"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
        F.sum(y * y).alias("syy"),
    )
    nd = F.col("n_pts").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    sxy = F.col("sxy").cast("double")
    syy = F.col("syy").cast("double")
    cov = nd * sxy - sx * sy
    varx = nd * sxx - sx * sx
    vary = nd * syy - sy * sy
    slope = F.when(varx == F.lit(0.0), F.lit(0.0)).otherwise(cov / varx)
    r2 = F.when(
        (varx * vary) == F.lit(0.0), F.lit(0.0)
    ).otherwise((cov * cov) / (varx * vary))
    return m.select(
        F.col("n_pts").cast("long").alias("n_pts"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / nd, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    )


def heaps_fit(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10,
) -> DataFrame:
    """Heaps'-law fit of vocabulary growth: V(n) ~ K * n^beta, fitted
    as OLS of ln(cumulative vocab) on ln(cumulative tokens) over
    ``n_buckets`` equal-width prefixes of the corpus in ``id_col``
    order. Natural text grows beta ~ 0.4-0.6; a closed template
    vocabulary saturates (beta -> 0), heavy boilerplate dedupe-bait
    grows slower than its token count — the growth-side sibling of
    the q199 rank-frequency fingerprint.

    Output: ONE row (n_pts, total_tokens, total_vocab, beta,
    intercept, r2); intercept is ln(K).

    The prefix curve never re-scans history: each word contributes
    ONE row at its FIRST bucket (min over the monotone bucket id),
    each bucket one token-sum row, and the cumulative sums run over
    the n_buckets-row curve only.

    Scale shape: document ranks come from linkage.global_sort_ranks
    (repartitionByRange + per-partition offsets — never the
    single-task global window); the bucket id is integer arithmetic
    on (rank, corpus count); one tokenize feeding a vocabulary-
    bounded min-bucket groupBy and a bucket-keyed token sum; the
    curve window and the OLS moments run over n_buckets rows."""
    from product_etl_spark.operators.linkage import global_sort_ranks
    from pyspark.sql import Window as W

    ranked = global_sort_ranks(
        docs.select(id_col, text_col), [id_col], rank_col="_rank"
    )
    dcount = ranked.agg(F.count(F.lit(1)).alias("_d"))
    withb = ranked.crossJoin(F.broadcast(dcount)).select(
        F.col(text_col),
        # clamp to the doc count: a corpus smaller than n_buckets
        # would otherwise produce SPARSE ids (1,3,5,... from the
        # integer division) — clamped, every doc is its own bucket
        # and ids stay contiguous 1..d (ADVICE r11); d >= n_buckets
        # corpora are bit-identical to the unclamped formula
        F.expr(
            f"CAST(((_rank - 1) * LEAST({n_buckets}, _d)) DIV _d + 1"
            " AS INT)"
        ).alias("bucket"),
    )
    # ONE tokenize feeds both legs: per-bucket token totals are a
    # count over the exploded rows, first-occurrence words a
    # min-bucket groupBy over the same frame.
    btoks = withb.select(
        "bucket",
        F.explode(T.tokens(F.lower(F.col(text_col)))).alias("w"),
    )
    # left-join from the full bucket list so a bucket of only-empty
    # documents still contributes its zero-token curve row
    bt = (
        withb.select("bucket")
        .distinct()
        .join(
            btoks.groupBy("bucket").agg(
                F.count(F.lit(1)).cast("long").alias("_t")
            ),
            "bucket",
            "left",
        )
        .select(
            "bucket", F.coalesce(F.col("_t"), F.lit(0)).alias("_toks")
        )
    )
    nw = (
        btoks.groupBy("w")
        .agg(F.min("bucket").alias("_fb"))
        .groupBy(F.col("_fb").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("_new"))
    )
    cum = W.orderBy("bucket").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    curve = (
        bt.join(nw, "bucket", "left")
        .select(
            "bucket",
            F.sum(F.col("_toks")).over(cum).alias("n_tokens"),
            F.sum(F.coalesce(F.col("_new"), F.lit(0)))
            .over(cum)
            .alias("vocab_cum"),
        )
    )
    fit = lnln_ols(
        curve.filter(
            (F.col("n_tokens") > 0) & (F.col("vocab_cum") > 0)
        ),
        "n_tokens",
        "vocab_cum",
    )
    tot = curve.agg(
        F.max("n_tokens").cast("long").alias("total_tokens"),
        F.max("vocab_cum").cast("long").alias("total_vocab"),
    )
    return fit.crossJoin(F.broadcast(tot)).select(
        "n_pts",
        "total_tokens",
        "total_vocab",
        F.col("slope").alias("beta"),
        "intercept",
        "r2",
    )


def kneser_ney_score(
    train_docs: DataFrame,
    test_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
) -> DataFrame:
    """Score held-out documents under a Kneser-Ney bigram LM fitted
    on DISJOINT training documents: per test doc, the average
    negative log-likelihood of its bigrams — the leakage-safe,
    modern-smoothing upgrade of q113's add-one filter (which trains
    on a language slice of the SAME corpus it scores; pair this with
    a fold split and train never sees test).

    Backoff ladder (every branch the identical expression tree in
    any engine):
      bigram seen      -> full interpolated KN (q195's formula)
      context-only seen-> lambda(w1) * add-one continuation
                          ((ncont+1)/(NB+1) — the +1 floor keeps an
                          unseen-w2 probability finite)
      context unseen   -> add-one continuation alone

    Output: (id, n_bigrams, avg_nll) for every test doc with >= 2
    tokens (shorter docs have no bigrams and are absent — the q113
    rule).

    Float policy: each -ln(p) term is ROUND(.,9) -> DECIMAL so the
    per-doc sum is order-free and exact; the average is ONE division
    of that exact sum by the exact count; ROUND(.,4) at the surface.

    Scale shape: model tables are vocabulary-bounded groupBy counts
    over the TRAIN side only; scoring joins test bigram ROWS against
    them on the bigram/word keys (AQE handles stop-word head skew);
    NB broadcasts as one row; one per-doc groupBy ends it. Each side
    is tokenized once."""

    d = float(discount)
    train_bb = doc_bigrams(train_docs, text_col, id_col)
    pairs = train_bb.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("pn"))
    ctx = pairs.groupBy("w1").agg(
        F.sum("pn").alias("cw1"), F.count(F.lit(1)).alias("n_follow")
    )
    cont = pairs.groupBy("w2").agg(F.count(F.lit(1)).alias("n_cont"))
    nb = pairs.agg(F.count(F.lit(1)).alias("nb"))
    bb = (
        doc_bigrams(test_docs, text_col, id_col)
        .join(pairs, ["w1", "w2"], "left")
        .join(ctx, ["w1"], "left")
        .join(cont, ["w2"], "left")
        .crossJoin(F.broadcast(nb))
    )
    pcont_smoothed = (
        F.coalesce(F.col("n_cont"), F.lit(0)) + F.lit(1)
    ).cast("double") / (F.col("nb") + F.lit(1)).cast("double")
    lam = (F.lit(d) * F.col("n_follow").cast("double")) / F.col(
        "cw1"
    ).cast("double")
    pkn = (
        F.when(
            F.col("pn").isNotNull(),
            (F.col("pn").cast("double") - F.lit(d))
            / F.col("cw1").cast("double")
            + lam
            * (
                F.col("n_cont").cast("double")
                / F.col("nb").cast("double")
            ),
        )
        .when(F.col("cw1").isNotNull(), lam * pcont_smoothed)
        .otherwise(pcont_smoothed)
    )
    term = F.round(-F.log(pkn), 9).cast("decimal(18,9)")
    return (
        bb.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(
                F.sum(term).cast("double")
                / F.count(F.lit(1)).cast("double"),
                4,
            ).alias("avg_nll"),
        )
    )


def unseen_vocabulary_estimate(
    docs: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Unseen-vocabulary estimators from the frequency-of-frequencies
    profile: Chao1 richness (Chao 1984) and the Good-Turing missing
    mass — "how much vocabulary/probability lives OUTSIDE this
    sample", the question Heaps' fit (q200) extrapolates and these
    answer from singleton/doubleton counts alone:

        chao1          = V + f1*(f1-1) / (2*(f2+1))   (bias-corrected)
        good_turing_p0 = f1 / N

    where V = observed vocabulary, f1/f2 = words seen exactly
    once/twice, N = total tokens. A corpus whose singletons dominate
    (high p0) is still growing — dedup thresholds and vocab sizes
    tuned on it will be wrong on the next shard.

    Output: ONE row (vocab, total_tokens, f1, f2, chao1,
    good_turing_p0).

    Float policy: everything is exact integers except the two single
    divisions (the bias-corrected Chao1 denominator f2+1 keeps it
    finite when f2 = 0), ROUND(.,4).

    Scale shape: one tokenize + vocabulary-bounded word groupBy; the
    frequency-of-frequencies table is a second groupBy over the WORD
    table (bounded by max word frequency); the estimators fold from
    1-row aggregates."""
    tok = docs.select(
        F.explode(T.tokens(F.lower(F.col(text_col)))).alias("tok")
    )
    wc = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    m = wc.agg(
        F.count(F.lit(1)).alias("vocab"),
        F.sum("n").alias("total_tokens"),
        F.sum(F.when(F.col("n") == 1, F.lit(1)).otherwise(F.lit(0))).alias(
            "f1"
        ),
        F.sum(F.when(F.col("n") == 2, F.lit(1)).otherwise(F.lit(0))).alias(
            "f2"
        ),
    )
    return m.select(
        F.col("vocab").cast("long").alias("vocab"),
        F.col("total_tokens").cast("long").alias("total_tokens"),
        F.col("f1").cast("long").alias("f1"),
        F.col("f2").cast("long").alias("f2"),
        F.round(
            F.col("vocab").cast("double")
            + (F.col("f1") * (F.col("f1") - F.lit(1))).cast("double")
            / (F.lit(2) * (F.col("f2") + F.lit(1))).cast("double"),
            4,
        ).alias("chao1"),
        F.round(
            F.col("f1").cast("double")
            / F.col("total_tokens").cast("double"),
            4,
        ).alias("good_turing_p0"),
    )
