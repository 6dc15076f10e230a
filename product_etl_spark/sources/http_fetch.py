"""HTTP fetch stage (reference S6): url column -> binary content,
executed on executors with retry/backoff, pacing, and deterministic
skip-if-done — the Spark form of the serial download loops at
utils/product_collection_img_array_processor.py:55-68 and
utils/details_translator/1_image_extractor_from_html.py:50-68.

The fetcher is injectable (tests use a deterministic fake; production
wires requests.get). Idempotence contract: target identity is the
URL itself, reruns anti-join against the already-fetched stage table
(operators/incremental.py), and task retries re-fetch at most one
partition — safe because fetch is read-only against the remote."""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from product_etl_spark.operators.ratelimit import TokenBucket

Fetcher = Callable[[str], bytes]

FETCH_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("content", BinaryType()),
        StructField("status", StringType()),
        StructField("n_attempts", IntegerType()),
    ]
)


def fetch_urls(
    urls: DataFrame,
    fetcher: Fetcher,
    url_col: str = "url",
    max_attempts: int = 3,
    backoff_s: float = 2.0,
    rate_per_s: float | None = None,
    sleeper: Callable[[float], None] = time.sleep,
) -> DataFrame:
    """url column -> (url, content, status, n_attempts).

    Retry semantics mirror the reference: ``max_attempts`` tries with
    linear backoff, failure recorded (not raised) so one dead URL
    can't fail a task (1_image_extractor_from_html.py:50-68 catches
    and logs). ``rate_per_s`` caps the per-task request rate with a
    token bucket — global rate = rate_per_s x numPartitions, so cap
    concurrency by repartitioning the url frame first (M8).
    """

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bucket = TokenBucket(rate_per_s, sleeper=sleeper) if rate_per_s else None
        for pdf in it:
            rows = []
            for url in pdf[url_col]:
                content, status, attempts = None, "error", 0
                for attempt in range(1, max_attempts + 1):
                    attempts = attempt
                    if bucket:
                        bucket.acquire()
                    try:
                        content = fetcher(url)
                        status = "ok"
                        break
                    except Exception:
                        if attempt < max_attempts:
                            sleeper(backoff_s)
                rows.append(
                    {
                        "url": url,
                        "content": content,
                        "status": status,
                        "n_attempts": attempts,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FETCH_SCHEMA])

    return urls.select(url_col).distinct().mapInPandas(run, schema=FETCH_SCHEMA)
