"""Model-based quality scoring: the Arrow-batched inference hook.

Modern curation pipelines filter on a learned quality score (fastText /
logistic classifiers in the published recipes). The *model* is
deployment-specific; what the engine owns is the scoring PLUMBING:
feature assembly as native expressions, batched Arrow transfer, a
vectorized scorer per executor, and a filter that pushes the kept-rows
predicate back into the plan.

``score_documents`` therefore takes any ``scorer(features: np.ndarray)
-> np.ndarray`` (load your ONNX/sklearn model in a closure — it is
deserialized once per executor, not per row) and runs it over
``mapInPandas`` batches. The default scorer is NOT a stub: a linear
model with a rational squash s(z) = 0.5 + z / (2 * (1 + |z|)), chosen
over the logistic sigmoid because exp() is libm-dependent while +,*,/,
abs are IEEE-exact — so the default path is bit-reproducible across
engines and the oracle can replay it in SQL (:func:`sql_default_score`).
A real model swap keeps the plumbing and loses only the oracle.

Scale: features are computed JVM-side (one projection), only the
feature matrix crosses to Python (Arrow-batched, numpy-shaped — never
the text), and the scorer is O(batch). Filtering AFTER scoring is a
plain predicate on the scored frame.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from assignment_etl_spark.ext.text import (
    bpe_ish_token_count,
    punct_ratio,
    stopword_ratio,
    whitespace_token_count,
)

# default linear model over the engine's native text features — weights
# are small rationals so z is exact-ish in doubles and the SQL replica
# computes the identical expression tree
DEFAULT_WEIGHTS = {
    "n_tokens_ws": 0.001,
    "n_tokens_bpe": -0.0005,
    "punct_ratio": -2.0,
    "stopword_ratio": 1.5,
}
DEFAULT_BIAS = -0.25

FEATURES: dict[str, Callable[[Column], Column]] = {
    "n_tokens_ws": lambda c: whitespace_token_count(c).cast("double"),
    "n_tokens_bpe": lambda c: bpe_ish_token_count(c).cast("double"),
    "punct_ratio": punct_ratio,
    "stopword_ratio": stopword_ratio,
}


def default_scorer(feats: np.ndarray) -> np.ndarray:
    """Vectorized linear + rational squash; column order = FEATURES.
    Accumulates left-to-right with element-wise ops (NOT a BLAS dot,
    whose summation order is implementation-defined) so the float result
    is bit-identical to the SQL replica's left-associated expression."""
    z = np.zeros(feats.shape[0], dtype=np.float64)
    for i, name in enumerate(FEATURES):
        z = z + feats[:, i] * DEFAULT_WEIGHTS[name]
    z = z + DEFAULT_BIAS
    return 0.5 + z / (2.0 * (1.0 + np.abs(z)))


def score_documents(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    scorer: Callable[[np.ndarray], np.ndarray] = default_scorer,
    score_col: str = "quality_model_score",
    batch_feature_cols: tuple[str, ...] = tuple(FEATURES),
) -> DataFrame:
    """id + features + model score, one Arrow round-trip.

    The text column never crosses to Python — features are projected
    JVM-side first. Join the result back on ``id_col`` to filter the
    corpus (the join is id-to-id, co-partitionable)."""
    feat_df = df.select(
        F.col(id_col),
        *[fn(F.col(text_col)).alias(name) for name, fn in FEATURES.items()],
    )
    out_schema = (
        feat_df.schema.simpleString()
        .removeprefix("struct<")
        .removesuffix(">")
        .replace(":", " ")
        + f", {score_col} double"
    )

    def _score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf[list(batch_feature_cols)].to_numpy(dtype=np.float64)
            pdf[score_col] = scorer(feats)
            yield pdf

    return feat_df.mapInPandas(_score, schema=out_schema)


def sql_default_score(text_expr: str) -> str:
    """DuckDB replica of the DEFAULT feature+score path. The feature SQL
    mirrors ext/text.py's formulas exactly (same regexes the existing
    text gates replay); z accumulates left-associated in the same order
    as :func:`default_scorer`."""
    ws = (
        f"(CASE WHEN length(trim({text_expr})) = 0 THEN 0 "
        f"ELSE length(regexp_extract_all(trim({text_expr}), '\\S+')) END)"
    )
    bpe = (
        f"length(regexp_extract_all({text_expr},"
        f" '[A-Za-zÀ-ÿ]+|[0-9]{{1,3}}|[^\\sA-Za-zÀ-ÿ0-9]+'))"
    )
    punct = (
        f"(CASE WHEN length({text_expr}) > 0 THEN "
        f"length(regexp_extract_all({text_expr}, '[^\\w\\s]'))"
        f" / length({text_expr}) ELSE 0.0 END)"
    )
    stop = (
        f"(CASE WHEN {ws} > 0 THEN "
        f"length(regexp_extract_all({text_expr},"
        f" '(?i)\\b(the|and|of|to|is|in|that|it)\\b')) / {ws}"
        f" ELSE 0.0 END)"
    )
    z = (
        f"(((((CAST({ws} AS DOUBLE) * 0.001)"
        f" + (CAST({bpe} AS DOUBLE) * -0.0005))"
        f" + ({punct} * -2.0))"
        f" + ({stop} * 1.5))"
        f" + -0.25)"
    )
    return f"(0.5 + {z} / (2.0 * (1.0 + abs({z}))))"
