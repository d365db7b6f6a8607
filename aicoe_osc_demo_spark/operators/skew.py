"""Skew-mitigation utilities for hot-key joins.

At 100 TB a handful of hot keys (the 600-page PDF, the viral document) can
pin a shuffle partition.  Two mitigations compose here:

- AQE skew-join splitting is always on (session.py) — it handles skew the
  planner can see at runtime.
- ``salted_join`` handles the pathological case AQE can't fix: a single key
  so hot one task would still drown.  The fact side gets a random-but-
  deterministic salt in [0, n_salts); the dimension side is exploded n_salts
  times; the join key becomes (key, salt) which spreads the hot key over
  n_salts tasks.  Cost: dimension side replicated n_salts× — use for
  fact-dim joins where the dim is small but too big (or too hot) to
  broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``on`` with the key salted across ``n_salts`` buckets.

    The fact-side salt is a content hash of the whole row's join key plus a
    per-row disambiguator when available — here a deterministic pmod of
    ``spark_partition_id`` + monotonically_increasing_id is avoided on
    purpose (not stable under retries); instead the salt hashes the fact
    row's own key column with md5, which distributes a hot key's rows by
    their co-occurring attributes."""
    fact_salted = fact.withColumn(
        "_salt",
        (
            F.conv(F.substring(F.md5(F.concat_ws("|", *fact.columns)), 1, 4), 16, 10).cast("int")
            % n_salts
        ),
    )
    dim_exploded = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return fact_salted.join(dim_exploded, on=[on, "_salt"], how=how).drop("_salt")
