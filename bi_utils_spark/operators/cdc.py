"""Change-data-capture apply: net-effect fold of an op log (X84).

The reference's MERGE upsert (bi_utils/database.py:125-214) cannot
express deletes or out-of-order redeliveries; a CDC feed (Debezium
style: I/U/D rows with a source ordinal) needs both. ``apply_cdc``
folds a change log into final table state:

- per key, the change with the HIGHEST (ordinal, tiebreak) wins —
  late-arriving older changes cannot regress state (idempotent
  re-apply of any log prefix/suffix);
- a winning ``D`` removes the key; a winning ``I``/``U`` keeps its
  payload;
- an optional base table participates as ordinal −∞ rows, so
  "snapshot + incremental log" is the same single fold.

ONE hash aggregation on the key: the winner rides a
max(struct(ord, tiebreak, op, payload…)) — the golden-record
arg-max discipline (operators/fuzzy.py), no windows, no sort. A
100 TB snapshot + a day's log shuffles each key once; storage-side,
pair it with scd.py if history (not just final state) must survive.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def apply_cdc(
    changes: DataFrame,
    key_cols: list[str],
    payload_cols: list[str],
    ord_col: str = "ord",
    op_col: str = "op",
    tiebreak_col: str | None = None,
    base: DataFrame | None = None,
) -> DataFrame:
    """Final state after applying the change log: one row per
    surviving key with the winning change's payload.

    ``op`` values: 'I'/'U' upsert, 'D' delete (case-sensitive).
    ``tiebreak_col`` breaks equal ordinals (e.g. a log sequence
    number); without one, equal-ordinal changes to one key resolve
    by lexicographic payload max — deterministic, but give CDC logs
    a real tiebreak.
    ``base``: optional current snapshot (payload columns only);
    treated as upserts older than every log row.
    """
    o = F.col(ord_col).cast("long")
    tb = (
        F.col(tiebreak_col).cast("long")
        if tiebreak_col
        else F.lit(0).cast("long")
    )
    log = changes.select(
        *key_cols,
        F.struct(
            o.alias("o"),
            tb.alias("t"),
            F.col(op_col).alias("op"),
            F.struct(
                *[F.col(c).alias(c) for c in payload_cols]
            ).alias("p"),
        ).alias("__w"),
    )
    if base is not None:
        lo = F.lit(-(1 << 62)).cast("long")
        snap = base.select(
            *key_cols,
            F.struct(
                lo.alias("o"),
                F.lit(0).cast("long").alias("t"),
                F.lit("I").alias("op"),
                F.struct(
                    *[F.col(c).alias(c) for c in payload_cols]
                ).alias("p"),
            ).alias("__w"),
        )
        log = log.unionByName(snap)
    won = log.groupBy(*key_cols).agg(F.max("__w").alias("__w"))
    return won.where(F.col("__w.op") != "D").select(
        *key_cols,
        *[F.col(f"__w.p.{c}").alias(c) for c in payload_cols],
        F.col("__w.o").alias(ord_col),
    )
