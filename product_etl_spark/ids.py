"""Deterministic id synthesis (RFC-4122 UUIDv5) as Catalyst expressions.

The reference generates random ids (``str(uuid.uuid4())``,
utils/importer/ETL.py:36-38) and pays for it with get-or-create
read-backs and a documented broken-FK incident
(utils/importer/COMPOSITE_KEY_FIX_README.md:16-24). Our engine
derives every id from its natural key with UUIDv5, which makes all
writes idempotent and task-retry safe — a hard requirement once
Spark may re-execute tasks.

``uuid5_col`` matches Python's ``uuid.uuid5(namespace, name)``
bit-for-bit (verified in tests/test_ids.py) while staying entirely
JVM-side (sha1 + string ops inside whole-stage codegen — no UDF).
"""

from __future__ import annotations

import uuid

from pyspark.sql import Column
from pyspark.sql import functions as F

# One namespace per entity family, themselves uuid5s of readable
# names under the DNS namespace so they are reproducible anywhere.
NS_ENGINE = uuid.uuid5(uuid.NAMESPACE_DNS, "product-etl-spark")
NS_COLLECTION = uuid.uuid5(NS_ENGINE, "product_collection")
NS_PRODUCT = uuid.uuid5(NS_ENGINE, "product")
NS_CATEGORY = uuid.uuid5(NS_ENGINE, "category")
NS_ATTR_KEY = uuid.uuid5(NS_ENGINE, "product_attribute_key")
NS_ATTR_VALUE = uuid.uuid5(NS_ENGINE, "product_attribute_value")
NS_TRANSLATION = uuid.uuid5(NS_ENGINE, "translation")
NS_RAW_ATTR = uuid.uuid5(NS_ENGINE, "custom_attributes_raw")
NS_LANG = uuid.uuid5(NS_ENGINE, "lang")


def uuid5_col(namespace: uuid.UUID, *parts: Column | str) -> Column:
    """RFC-4122 version-5 UUID of ``namespace`` + the UTF-8 concat of
    ``parts`` (joined by the unit separator ``\\x1f`` so composite
    keys can't collide by concatenation).

    NULL parts in composite keys are replaced by a ``\\x00`` sentinel
    *before* the join — ``concat_ws`` silently drops NULLs, which
    would make (NULL, 'x'), ('x', NULL) and ('x',) hash identically.
    With the sentinel every position contributes, so null patterns
    stay distinct. A single-part NULL key yields a NULL id (callers
    filter or guard those rows).

    Pure built-in expressions: sha1 over (namespace bytes ‖ name
    bytes), then version/variant nibbles patched in.
    """
    cols = [F.col(p) if isinstance(p, str) else p for p in parts]
    name = (
        cols[0]
        if len(cols) == 1
        else F.concat_ws("\x1f", *[F.coalesce(c, F.lit("\x00")) for c in cols])
    )
    payload = F.concat(
        F.unhex(F.lit(namespace.hex)), F.encode(name, "UTF-8")
    )
    h = F.sha1(payload)  # 40 lowercase hex chars
    # Variant: high 2 bits of byte 8 -> 10xx, i.e. nibble in {8,9,a,b}:
    # (nibble & 0x3) | 0x8.
    variant = F.lower(
        F.conv(
            (F.conv(F.substring(h, 17, 1), 16, 10).cast("int").bitwiseAND(F.lit(3)))
            .bitwiseOR(F.lit(8))
            .cast("string"),
            10,
            16,
        )
    )
    return F.concat(
        F.substring(h, 1, 8),
        F.lit("-"),
        F.substring(h, 9, 4),
        F.lit("-5"),  # version nibble
        F.substring(h, 14, 3),
        F.lit("-"),
        variant,
        F.substring(h, 18, 3),
        F.lit("-"),
        F.substring(h, 21, 12),
    )


def stable_long(*parts: Column | str) -> Column:
    """Deterministic 63-bit positive surrogate key (xxhash64).

    For internal join keys where a compact long beats a 36-char uuid
    at shuffle time (8 bytes vs 36+ on the wire at 100 TB scale).
    """
    cols = [F.col(p) if isinstance(p, str) else p for p in parts]
    return F.abs(F.xxhash64(*cols))
