"""Python UDF surface (SURVEY.md §2.10) — the escape hatches, each in
its fastest available form (Arrow-vectorized), for semantics the
built-in functions genuinely cannot express.

Everything the reference computes maps to built-ins (the engine's hot
paths use those — see operators/); these exist so a user porting custom
logic has the idiomatic pattern to follow, and each is unit-tested to
agree exactly with its built-in twin (tests/test_udf_surface.py), which
both pins semantics and demonstrates the ~equivalence.

Surface demonstrated here:
- scalar `pandas_udf`  — vectorized per-row kernel (cosine similarity
  over array<float>; the Arrow-batched alternative backend SURVEY §2.8
  F6 names for embedding math).
- grouped-agg `pandas_udf` — custom UDAF shape (RMSE; A17's metric as
  a user aggregate).
- Python UDTF — one row in, N rows out with per-call state (sentence
  splitting with positions); the table-function escape hatch.
"""

from __future__ import annotations

import math
import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import DoubleType


@pandas_udf(DoubleType())
def cosine_sim_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Vectorized cosine similarity between two array<float> columns.
    Arrow hands each batch over as Series of numpy arrays; non-null
    rows are stacked into 2-D (batch, dim) matrices and the whole
    batch is one einsum + two norms — no per-row Python in the kernel.
    Null and zero-norm rows yield None. Assumes equal-length vectors
    within a batch (the embeddings table's fixed dim)."""
    import numpy as np

    mask = a.notna() & b.notna()
    out = pd.Series([None] * len(a), dtype="object")
    if mask.any():
        xm = np.stack(a[mask].to_numpy()).astype("float64")
        ym = np.stack(b[mask].to_numpy()).astype("float64")
        dots = np.einsum("ij,ij->i", xm, ym)
        nx = np.linalg.norm(xm, axis=1)
        ny = np.linalg.norm(ym, axis=1)
        ok = (nx > 0) & (ny > 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            sims = dots / (nx * ny)
        vals = [float(s) if k else None for s, k in zip(sims, ok)]
        out[mask] = vals
    return out


@pandas_udf(DoubleType())
def rmse_udf(pred: pd.Series, actual: pd.Series) -> float:
    """Grouped-aggregate pandas UDF: per-group RMSE (A17 as a custom
    UDAF). Spark feeds each group's full columns as Series; the return
    is one scalar per group. Map-side partial aggregation does NOT
    apply to grouped-agg UDFs — every row shuffles to its group — so
    the built-in sqrt(avg(pow(...))) form in
    operators/relational.regression_errors remains the scale path."""
    d = (pred - actual).to_numpy(dtype="float64")
    return float(math.sqrt((d * d).mean()))


@udtf(returnType="sent_idx int, sentence string, n_chars int")
class SplitSentences:
    """Python UDTF (table function): explode a document into sentences
    with positions — one input row, variable output rows, computed in
    Python. The regex split itself could be posexplode(split(...));
    the UDTF form is the template for splitters that need real state
    (tokenizers, parsers) that no column expression can express."""

    _SENT_RE = re.compile(r"[^.!?]+[.!?]?")

    def eval(self, text: str):
        if text is None:
            return
        idx = 0
        for m in self._SENT_RE.finditer(text):
            # trim exactly ' \t\n\r' — NOT bare str.strip(), which also
            # removes \f, \v and unicode whitespace the DuckDB oracle's
            # trim(x, ' '||chr(9)||chr(10)||chr(13)) would keep
            # (ADVICE r2: keep both trim charsets identical)
            s = m.group(0).strip(" \t\n\r")
            if s:
                yield idx, s, len(s)
                idx += 1
