"""Portable deterministic hashing for sampling / splits / shuffles.

The reference gets reproducibility from single-process seeded RNG
(``seed=42`` in /root/reference/notebooks/demo2/settings.yaml:11 and
``train_test_split``/``sample(random_state=42)`` in farm_trainer.py:74-77,
nq_curator.py:174-189).  Under distribution, ``rand(seed)`` is only
deterministic for a fixed partitioning — so this engine derives all sampling
decisions from a content hash of key columns instead (O2-O4, J11).  md5 is
used because it is bit-identical across Spark, DuckDB, and Python, making
every sampling decision oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_hex(*cols: Column) -> Column:
    """Lowercase hex md5 of the concatenated string form of the inputs."""
    return F.md5(F.concat_ws("|", *[c.cast("string") for c in cols]))


def bucket_of(c: Column, n_buckets: int, salt: str = "") -> Column:
    """Stable bucket in [0, n_buckets) from the first 4 md5 hex digits."""
    h = F.md5(F.concat(F.lit(salt), c.cast("string")))
    return (F.conv(F.substring(h, 1, 4), 16, 10).cast("int") % n_buckets).alias("bucket")


def deterministic_split_flag(key: Column, train_frac: float = 0.8, salt: str = "split") -> Column:
    """O3 train/dev split as a pure function of the row key: hash the key,
    compare the first 4 hex digits against the fraction threshold.  Stable
    under repartitioning, joins, and re-runs."""
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    threshold = int(train_frac * 65536)
    return (F.conv(F.substring(h, 1, 4), 16, 10).cast("int") < threshold).alias("is_train")


def stable_shuffle_key(*cols: Column) -> Column:
    """O2 deterministic shuffle: order by this key instead of rand(seed)."""
    return md5_hex(*cols).alias("shuffle_key")
