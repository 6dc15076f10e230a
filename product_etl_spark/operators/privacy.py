"""Privacy auditing over tabular data: k-anonymity and l-diversity
reports.

Complements functions/text.redact_pii (which scrubs free text): these
audit the STRUCTURED side. A release is k-anonymous when every
combination of quasi-identifier values (the columns an attacker could
link on — zip, birth year, segment…) is shared by at least k rows;
it is l-diverse when every such group also contains at least l
distinct values of the sensitive attribute (k-anonymity alone fails
when a group is homogeneous in the secret — Machanavajjhala et al.).

The reference exports raw per-product CSV/PDF fan-outs with no such
gate; a pipeline publishing data derived from user events needs one.

Scale shape: both reports are ONE groupBy over the quasi-identifier
columns (map-side partial agg; countDistinct for l-diversity is
exact per group, bounded by the sensitive column's per-group
cardinality). The risky-row total is a 1-row aggregate of the group
table, not a second corpus scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    k: int,
    sensitive_col: str | None = None,
) -> DataFrame:
    """Groups violating k-anonymity: one row per quasi-identifier
    combination with fewer than k records — (quasi cols..., n_rows
    [, n_sensitive]). Empty result == the release is k-anonymous.

    Pass ``sensitive_col`` to also get the group's distinct sensitive
    count (the l-diversity ingredient) in the same single pass.
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if sensitive_col is not None:
        aggs.append(F.countDistinct(sensitive_col).alias("n_sensitive"))
    return df.groupBy(*quasi_cols).agg(*aggs).filter(F.col("n_rows") < k)


def l_diversity_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int,
) -> DataFrame:
    """Groups violating l-diversity: quasi-identifier combinations
    whose sensitive attribute takes fewer than l distinct values —
    including singleton-k groups (a group of one is trivially
    1-diverse and maximally identifying)."""
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct(sensitive_col).alias("n_sensitive"),
        )
        .filter(F.col("n_sensitive") < l)
    )


def anonymity_summary(
    df: DataFrame, quasi_cols: list[str], k: int
) -> DataFrame:
    """One-row release gate: (n_groups, n_risky_groups, n_risky_rows,
    risky_row_pct) — the number a publish job thresholds on before
    writing an export."""
    groups = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("n_rows"))
    return groups.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.when(F.col("n_rows") < k, 1).otherwise(0)).alias(
            "n_risky_groups"
        ),
        F.sum(
            F.when(F.col("n_rows") < k, F.col("n_rows")).otherwise(0)
        ).alias("n_risky_rows"),
        F.round(
            F.sum(F.when(F.col("n_rows") < k, F.col("n_rows")).otherwise(0))
            * 100.0
            / F.sum("n_rows"),
            4,
        ).alias("risky_row_pct"),
    )


def suppress_risky_groups(
    df: DataFrame,
    quasi_cols: list[str],
    k: int,
) -> DataFrame:
    """k-anonymize BY SUPPRESSION — the fix to ``k_anonymity_report``'s
    flag: rows whose quasi-identifier combination is shared by fewer
    than ``k`` records get every quasi column NULLed (suppressed into
    the 'withheld' group); all other rows pass through untouched. The
    released frame has the same row count and is k-anonymous over the
    quasi columns by construction (every surviving combination had
    >= k rows; the NULL group is its own crowd).

    Output: all original columns (quasi cols possibly NULLed) plus a
    ``suppressed`` flag for release-audit joins.

    Scale shape: one groupBy over the quasi columns (map-side combine,
    quasi-space-bounded result) broadcast-joined back onto the frame —
    no window over the release, no second scan.
    """
    risky = (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") < k)
        .select(
            *[F.col(c).alias(f"_r_{c}") for c in quasi_cols],
            F.lit(True).alias("_risky"),
        )
    )
    # null-SAFE join: groupBy puts NULL quasi values in one group, so
    # the join back must match them too (a plain equality join would
    # leave a small all-NULL group unsuppressed)
    cond = None
    for c in quasi_cols:
        clause = F.col(c).eqNullSafe(F.col(f"_r_{c}"))
        cond = clause if cond is None else (cond & clause)
    joined = df.join(F.broadcast(risky), cond, "left")
    keep = [c for c in df.columns if c not in quasi_cols]
    return joined.select(
        *keep,
        *[
            F.when(F.col("_risky").isNull(), F.col(c)).alias(c)
            for c in quasi_cols
        ],
        F.coalesce(F.col("_risky"), F.lit(False)).alias("suppressed"),
    )


def t_closeness_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    top_n: int = 10,
) -> DataFrame:
    """t-closeness report (Li, Li & Venkatasubramanian 2007) — the
    third rung of the privacy ladder after k-anonymity (q140/q182)
    and l-diversity (q179): a quasi-identifier group leaks when the
    DISTRIBUTION of the sensitive attribute inside it sits far from
    the global distribution, even if the group is large (k holds)
    and varied (l holds). For a categorical sensitive attribute
    under uniform ground distance the Earth Mover's Distance
    degenerates to half the L1 distance:

        t(g) = 0.5 * sum_v | P(v | g) - P(v) |

    Reports the ``top_n`` groups by t (ties broken by the quasi
    values) with their sizes — the groups to suppress or generalize
    first.

    Float policy: the per-value shares are single divisions of
    exact-integer doubles; each |q - p| term is ROUND(.,9) ->
    DECIMAL so the per-group sum is ORDER-FREE and exact (the q142
    mean recipe); the final 0.5x happens once in double.

    Scale shape: one groupBy over (quasi, sensitive) — the same
    shuffle the k/l reports pay — then the dense group x value grid
    is built from the two DISTINCT side tables (quasi-space x
    sensitive-cardinality rows, both bounded far below the corpus)
    with the observed counts LEFT-joined on, so absent combinations
    contribute their full global share without a corpus rescan."""
    gv = df.groupBy(*quasi_cols, sensitive_col).agg(
        F.count(F.lit(1)).alias("_cgv")
    )
    groups = gv.groupBy(*quasi_cols).agg(F.sum("_cgv").alias("_ng"))
    vals = gv.groupBy(sensitive_col).agg(F.sum("_cgv").alias("_nv"))
    total = vals.agg(F.sum("_nv").alias("_n"))
    # NULL-SAFE grid join: groupBy keeps NULL quasi/sensitive keys as
    # real groups (the suppress_risky_groups convention), but a plain
    # key-list join never matches NULL = NULL, which would hand every
    # NULL-keyed group q = 0 for all values and fabricate its t.
    gvr = gv.select(
        *[F.col(c).alias(f"_gv_{c}") for c in quasi_cols],
        F.col(sensitive_col).alias("_gv_s"),
        "_cgv",
    )
    cond = F.col(sensitive_col).eqNullSafe(F.col("_gv_s"))
    for c in quasi_cols:
        cond = cond & F.col(c).eqNullSafe(F.col(f"_gv_{c}"))
    grid = (
        groups.crossJoin(F.broadcast(vals))
        .join(gvr, cond, "left")
        .crossJoin(F.broadcast(total))
    )
    q = F.coalesce(F.col("_cgv"), F.lit(0)).cast("double") / F.col(
        "_ng"
    ).cast("double")
    p = F.col("_nv").cast("double") / F.col("_n").cast("double")
    term = F.round(F.abs(q - p), 9).cast("decimal(18,9)")
    per_group = grid.groupBy(*quasi_cols, "_ng").agg(
        F.sum(term).alias("_l1")
    )
    return (
        per_group.select(
            *quasi_cols,
            F.col("_ng").cast("long").alias("n_rows"),
            F.round(
                F.lit(0.5) * F.col("_l1").cast("double"), 6
            ).alias("t"),
        )
        .orderBy(F.col("t").desc(), *[F.col(c).asc() for c in quasi_cols])
        .limit(top_n)
    )
