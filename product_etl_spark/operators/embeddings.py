"""Embedding-column transforms: normalization and quantization.

Standard steps between embedding generation and similarity search:
- ``unit_normalize``: L2-normalize so cosine == dot (cuts the norm
  computation out of every subsequent comparison);
- ``quantize_int8`` / ``dequantize_int8``: per-vector symmetric int8
  quantization — 4x smaller than float32 on disk and on the shuffle
  wire, which at 100 TB of vectors is the difference between a
  broadcastable index and not.

All pure array expressions (map-only, codegen-friendly).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from product_etl_spark.functions import vectors as V


def unit_normalize(df: DataFrame, emb_col: str, out_col: str | None = None) -> DataFrame:
    out = out_col or emb_col
    norm = V.norm(emb_col)
    normalized = F.when(norm > 0,
        F.transform(F.col(emb_col), lambda x: x.cast("double") / norm)
    ).otherwise(F.transform(F.col(emb_col), lambda x: x.cast("double") * 0.0))
    return df.withColumn(out, normalized)


def quantize_int8(df: DataFrame, emb_col: str) -> DataFrame:
    """array<float|double> -> (array<tinyint> q_{col}, double scale_{col}).

    Symmetric per-vector scheme: scale = max|x| / 127,
    q = round(x / scale). Zero vectors get scale 0 and all-zero codes.
    """
    absmax = F.aggregate(
        F.col(emb_col),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
    )
    scale = absmax / F.lit(127.0)
    q = F.when(
        scale > 0,
        F.transform(
            F.col(emb_col),
            lambda x: F.round(x.cast("double") / scale).cast("tinyint"),
        ),
    ).otherwise(F.transform(F.col(emb_col), lambda x: F.lit(0).cast("tinyint")))
    return df.withColumn(f"q_{emb_col}", q).withColumn(f"scale_{emb_col}", scale)


def dequantize_int8(df: DataFrame, q_col: str, scale_col: str, out_col: str) -> DataFrame:
    return df.withColumn(
        out_col,
        F.transform(F.col(q_col), lambda x: x.cast("double") * F.col(scale_col)),
    )
