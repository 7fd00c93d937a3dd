"""Ordered event-sequence pattern matching (MATCH_RECOGNIZE-style).

The reference engine has no event-sequence operator; this extends the
behavioral-analytics family (ops/funnel.py) with *contiguous* pattern
detection: positions in a per-key event stream where the last k event
types exactly equal a given pattern, with an optional bound on the
pattern's total elapsed time.

Two shapes, two scale profiles:

- ``contiguous_sequence_count`` (the scale path): a fixed-length pattern
  becomes k-1 ``lag`` columns over one window — ONE shuffle on the key,
  no per-key materialized arrays, state per row is k small strings. This
  is how a 100 TB event stream should be pattern-matched: the window sort
  is the same sort a sessionize pass already pays, and everything after
  it is codegen'd projection + partial aggregation. Overlapping matches
  are counted (each end-position is tested independently).

- ``sequence_signature`` (the flexible path): per-key ordered type string
  for arbitrary-regex matching. Builds a per-key array — fine for
  sessionized/bounded keys (document counts per user are bounded in any
  real clickstream after sessionization), wrong for unbounded keys; the
  docstring says so and the gate uses the lag path.

Determinism: events are ordered by (ts, id) — the id tiebreak makes the
per-key order total, so both engines sort identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def contiguous_sequence_count(
    events: DataFrame,
    steps: list[str],
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    within_seconds: int | None = None,
) -> DataFrame:
    """Per-key count of positions where the last ``len(steps)`` events
    (ordered by ts, id) match ``steps`` exactly and — when
    ``within_seconds`` is set — the first-to-last gap of the matched run
    is at most that many whole seconds (epoch-floor difference, the same
    convention ops.funnel uses).

    Returns (key, n_matches) for keys with at least one match.
    """
    if len(steps) < 2:
        raise ValueError("pattern needs at least 2 steps")
    k = len(steps)
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    df = events
    cond = F.col(type_col) == steps[-1]
    for i in range(1, k):
        df = df.withColumn(f"_seq_lag{i}", F.lag(type_col, i).over(w))
        cond = cond & (F.col(f"_seq_lag{i}") == steps[-1 - i])
    if within_seconds is not None:
        df = df.withColumn(f"_seq_ts{k - 1}", F.lag(ts_col, k - 1).over(w))
        gap = F.floor(F.col(ts_col).cast("double")) - F.floor(
            F.col(f"_seq_ts{k - 1}").cast("double")
        )
        cond = cond & (gap <= within_seconds)
    return (
        df.withColumn("_seq_hit", F.when(cond, 1).otherwise(0))
        .groupBy(key_col)
        .agg(F.sum("_seq_hit").cast("long").alias("n_matches"))
        .filter(F.col("n_matches") > 0)
    )


def sequence_signature(
    events: DataFrame,
    type_codes: dict[str, str],
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    other_code: str = "x",
) -> DataFrame:
    """Per-key ordered one-char-per-event signature string for arbitrary
    regex matching downstream (``F.regexp_count(signature, pattern)``).

    Builds one string per key (array_sort over collected structs), so the
    per-key event count must be bounded — sessionize or window the stream
    first for unbounded keys; use ``contiguous_sequence_count`` for
    fixed-length patterns at full scale.
    """
    if any(len(c) != 1 for c in type_codes.values()) or len(other_code) != 1:
        raise ValueError("codes must be single characters")
    code = F.lit(other_code)
    for t, c in sorted(type_codes.items()):
        code = F.when(F.col(type_col) == t, F.lit(c)).otherwise(code)
    return (
        events.select(
            F.col(key_col),
            F.struct(
                F.col(ts_col).alias("ts"), F.col(id_col).alias("id"), code.alias("c")
            ).alias("_ev"),
        )
        .groupBy(key_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("_ev")), lambda s: s.getField("c")
                ),
                "",
            ).alias("signature")
        )
    )
