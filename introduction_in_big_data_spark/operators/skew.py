"""Skew-handling join strategies.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized shuffle partitions. Salting is the
explicit fallback for the pathological case AQE can't fix: a single
join key so hot that one *logical* key exceeds an executor.

salted_join replicates the build side `salt` times and scatters the
probe side uniformly across the replicas — turning one hot partition
into `salt` even ones at the cost of a `salt`-times-larger build side.
Semantics are identical to the plain inner equi-join (verified in
tests/test_skew.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `probe ⋈ build on key`, salted against probe-side key
    skew. The build side must tolerate `salt`-fold replication (i.e. be
    the smaller side)."""
    salt_col = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt))
    p = probe.withColumn("__salt", salt_col.cast("int"))
    b = build.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return p.join(b, [on, "__salt"], how).drop("__salt")
