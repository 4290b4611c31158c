"""User-defined function surfaces (SURVEY §2.10).

The engine's UDF policy, in order of preference:
1. native ``F.*`` expressions (everything in text.py/dedup.py) — codegen;
2. Arrow-batched ``mapInPandas`` for matrix/codec kernels (similarity,
   multimodal) — amortized BLAS;
3. the two surfaces here, for when a *column-shaped* or *table-shaped*
   Python function is genuinely the right interface:
   * scalar ``@pandas_udf`` — vectorized per-column transform, usable
     inside any select/filter alongside native expressions;
   * Python UDTF — one row in, N rows out, usable from SQL via
     ``spark.udtf.register``.

Row-at-a-time ``F.udf`` is deliberately absent: 10-100× slower than
Arrow batches, never the right call in this engine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf


def cosine_to_query(query_vec) -> object:
    """Vectorized scalar UDF: cosine similarity of each row's embedding
    to a fixed query vector (closure-shipped, Arrow-batched). Usable as
    a plain Column: ``emb.select(cosine_to_query(q)(F.col("embedding")))``."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.linalg.norm(q)) or 1.0

    @pandas_udf("double")
    def cos(col: pd.Series) -> pd.Series:
        mat = np.array(list(col), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        return pd.Series(np.round(mat @ q / (norms * qn), 6))

    return cos


@udtf(returnType="sent_idx int, sentence string, n_words int")
class SentenceSplit:
    """Table function: one document row → one row per sentence.

    The UDTF form matters for SQL users (``SELECT * FROM
    sentence_split(...)``); the same logic as a DataFrame op would be
    explode(split()). Sentences split on . ! ? followed by whitespace.
    """

    def eval(self, text: str):  # noqa: D102 (signature fixed by Spark)
        import re

        if text is None:
            return
        parts = [p.strip() for p in re.split(r"(?<=[.!?])\s+", text) if p.strip()]
        for i, p in enumerate(parts):
            yield i, p, len(p.split(" "))


def register_udtfs(spark) -> None:
    """Expose the table functions to the SQL surface."""
    spark.udtf.register("sentence_split", SentenceSplit)


def minmax_norm_by_type(t: dict[str, DataFrame]) -> DataFrame:
    """Grouped-map pandas UDF (``applyInPandas``): per-event_type min-max
    feature scaling to integer basis points — the canonical 'normalize
    features per group' step of a training-data pipeline, where the
    whole group must be visible at once (group min/max live in Python).

    Exactness: every step — subtract, divide, scale, +0.5, floor — is a
    single IEEE-754 double op, deterministically rounded, so the result
    is bit-identical to any engine evaluating the same expression tree
    (the gate's DuckDB twin uses window MIN/MAX). No float ever reaches
    the output: the final value is a BIGINT.

    Scale: one shuffle on event_type; each group streams through Arrow
    in batches. Low-cardinality group keys cap parallelism at |groups| —
    fine for bounded type vocabularies; for high-skew grouping keys
    compute min/max via window functions instead (no Python needed).
    """
    e = t["events"].filter(F.col("value").isNotNull()).select(
        "event_id", "event_type", "value"
    )

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"].to_numpy(dtype=np.float64)
        lo, hi = v.min(), v.max()
        if hi == lo:
            bp = np.zeros(len(v), dtype=np.int64)
        else:
            bp = np.floor((v - lo) / (hi - lo) * 10000 + 0.5).astype(np.int64)
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "event_type": pdf["event_type"],
                "norm_bp": bp,
            }
        )

    return e.groupBy("event_type").applyInPandas(
        norm, "event_id long, event_type string, norm_bp long"
    )


MINMAX_NORM_ORACLE = """
    SELECT event_id, event_type,
           CAST(CASE WHEN mx = mn THEN 0
                ELSE floor((value - mn) / (mx - mn) * 10000 + 0.5)
           END AS BIGINT) AS norm_bp
    FROM (
        SELECT event_id, event_type, value,
               min(value) OVER (PARTITION BY event_type) AS mn,
               max(value) OVER (PARTITION BY event_type) AS mx
        FROM events
        WHERE value IS NOT NULL
    )
"""
