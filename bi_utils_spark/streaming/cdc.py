"""Streaming CDC apply (X93) — the continuous form of
operators/cdc.py::apply_cdc.

A Debezium-style feed delivers I/U/D changes continuously and
out of order; the serving table must always reflect the
highest-ordinal change per key. State per key is just the winning
(ordinal, tiebreak, op, payload) — constant size, no timeout needed
(dimension keys are live forever; pair with a TTL policy upstream
if they are not). Each micro-batch folds its rows against the
stored winner with the SAME max-(ord, tiebreak) rule as the batch
operator, so replaying any prefix of the log through the stream and
then running batch ``apply_cdc`` over the remainder lands on the
same table (parity is what makes backfill + streaming handoff
safe; test-asserted).

Emits one row per UPDATED key per micro-batch: key, payload,
ordinal, and ``is_deleted`` (tombstone) — the ``outputMode
("update")`` upsert-feed shape a ``foreachBatch`` MERGE sink wants.

Scale: one shuffle per micro-batch on the key; state is
O(live keys) regardless of log length; per-row work is an Arrow
pandas fold, no Python loops over history (only over the
micro-batch's own rows).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def apply_cdc_stream(
    stream: DataFrame,
    key_cols: Sequence[str],
    payload_cols: Sequence[str],
    ord_col: str = "ord",
    op_col: str = "op",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Stateful net-effect fold of an unbounded I/U/D change stream.

    For exact batch parity, (ord, tiebreak) must order each key's
    changes totally (CDC logs carry an LSN — use it as the
    tiebreak); equal-ordinal ties resolve by op then payload text,
    matching the batch operator's lexicographic struct max.
    """
    fields = {f.name: f.dataType.simpleString() for f in stream.schema}
    key_list = list(key_cols)
    pay_list = list(payload_cols)
    out_schema = ", ".join(
        [f"{c} {fields[c]}" for c in key_list]
        + [f"{c} {fields[c]}" for c in pay_list]
        + [f"{ord_col} long", "is_deleted boolean"]
    )
    state_schema = ", ".join(
        ["__o long", "__t long", "__op string"]
        + [f"{c} {fields[c]}" for c in pay_list]
    )
    n_keys = len(key_list)
    tb = tiebreak_col

    def fold(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        # comparison key is (ord, tiebreak, op) — never the payload,
        # whose D-row Nones would poison Python tuple comparison;
        # under the totality contract the payload can't decide a
        # winner anyway
        best = tuple(state.get) if state.exists else None
        for pdf in pdfs:
            for row in pdf.itertuples(index=False):
                r = row._asdict()
                cand = (
                    int(r[ord_col]),
                    int(r[tb]) if tb else 0,
                    str(r[op_col]),
                    *[r[c] for c in pay_list],
                )
                if best is None or cand[:3] > best[:3]:
                    best = cand
        if best is None:
            return
        state.update(tuple(best))
        yield pd.DataFrame(
            [
                list(key)
                + list(best[3:])
                + [best[0], best[2] == "D"]
            ],
            columns=key_list + pay_list + [ord_col, "is_deleted"],
        )

    return stream.groupBy(
        *[F.col(c) for c in key_list]
    ).applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
