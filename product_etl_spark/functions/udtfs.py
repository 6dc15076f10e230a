"""Python UDTFs (one row -> many rows with Python logic).

The engine's UDTF-like needs (attribute explode, image-URL explode,
OCR token rows — SURVEY §2.11) are all served by ``explode`` over
array expressions, which is always preferable (JVM-side, codegen).
This module exists for the residual cases where the row-splitting
logic itself needs Python: registered Spark 4 ``@udtf`` classes,
usable from SQL (`SELECT * FROM sentence_split(...)`).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="sentence: string, sent_idx: int")
class SentenceSplit:
    """Split text into sentences on ./!/? boundaries (keeping it
    dependency-free; a real deployment swaps in a proper segmenter —
    the UDTF plumbing is the point)."""

    def eval(self, text: str):  # noqa: D102
        if not text:
            return
        import re

        parts = [p.strip() for p in re.split(r"(?<=[.!?])\s+", text)]
        for i, p in enumerate(parts):
            if p:
                yield p, i


def register_udtfs(spark) -> None:
    """Make the UDTFs callable from SQL in this session."""
    spark.udtf.register("sentence_split", SentenceSplit)
