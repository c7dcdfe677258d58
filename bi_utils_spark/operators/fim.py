"""Fill-in-the-Middle transformation for code/text training data.

The FIM objective (Bavarian et al. 2022, "Efficient Training of
Language Models to Fill in the Middle" — public) rewrites a
deterministic fraction of documents from ``prefix middle suffix`` to
the PSM layout ``<PRE> prefix <SUF> suffix <MID> middle`` so the
model learns infilling without any architecture change. At pipeline
scale the transform must be (a) map-only — no shuffle, no state, it
fuses into whatever scan feeds it — and (b) DETERMINISTIC per
document id, so re-runs, retries, and the train/val split all agree
on which documents were transformed and where the cuts fell.

Both properties come from one md5 over the document id: the first 8
hex digits gate the document against ``rate``, the next two 8-digit
words pick the two cut points. Everything is whole-stage-codegen
column arithmetic (conv/substring/concat) — zero Python in the hot
path, and the same expressions restate in ANSI SQL for the oracle.

No reference counterpart (the reference has no training-data tier);
public-knowledge parity target is the FIM data pipeline described in
the paper.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PRE_TOK = "<|fim_prefix|>"
SUF_TOK = "<|fim_suffix|>"
MID_TOK = "<|fim_middle|>"


def _hash_word(h: Column, pos: int) -> Column:
    """One 32-bit word of the md5 hex digest as a non-negative long."""
    return F.conv(F.substring(h, pos, 8), 16, 10).cast("long")


def fim_transform(
    df: DataFrame,
    id_col: str,
    text_col: str,
    rate: float = 0.5,
    out_col: str = "fim_text",
    min_chars: int = 2,
    salt: str = "fim",
) -> DataFrame:
    """Apply the PSM fill-in-the-middle rewrite to a deterministic
    ``rate`` fraction of documents; the rest (and documents shorter
    than ``min_chars``, and NULL texts) pass through unchanged in
    ``out_col``. Adds a boolean ``{out_col}_applied`` audit column.

    Cut points: two md5-derived offsets a <= b in [1, len] split the
    text into prefix = [1, a), middle = [a, b), suffix = [b, len] —
    either side may be empty, middle may be empty when a == b, both
    exactly as the paper's uniform character-level splitting."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"fim_transform: rate must be in [0, 1], got {rate}")
    h = F.md5(
        F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))
    )
    text = F.col(text_col)
    n = F.length(text)
    gate = (
        text.isNotNull()
        & (n >= F.lit(max(min_chars, 1)))
        & (_hash_word(h, 1) % 100 < int(round(rate * 100)))
    )
    c1 = _hash_word(h, 9) % n
    c2 = _hash_word(h, 17) % n
    a = F.least(c1, c2) + 1
    b = F.greatest(c1, c2) + 1
    fim = F.concat(
        F.lit(PRE_TOK),
        F.substring(text, F.lit(1), a - 1),
        F.lit(SUF_TOK),
        F.substring(text, b, n),
        F.lit(MID_TOK),
        F.substring(text, a, b - a),
    )
    return df.withColumn(
        out_col, F.when(gate, fim).otherwise(text)
    ).withColumn(f"{out_col}_applied", F.coalesce(gate, F.lit(False)))


def fim_oracle_sql(
    table: str,
    id_col: str,
    text_col: str,
    rate: float = 0.5,
    min_chars: int = 2,
    salt: str = "fim",
) -> str:
    """The ANSI restatement of :func:`fim_transform` (DuckDB dialect:
    hex words parse via CAST('0x…' AS BIGINT)) — kept beside the
    implementation so the two cut-point derivations can never
    drift."""
    h = f"md5(CAST({id_col} AS VARCHAR) || ':{salt}')"

    def word(pos: int) -> str:
        return f"CAST(('0x' || substr({h}, {pos}, 8)) AS BIGINT)"

    return f"""
    SELECT {id_col},
           CASE WHEN {text_col} IS NOT NULL
                 AND length({text_col}) >= {max(min_chars, 1)}
                 AND {word(1)} % 100 < {int(round(rate * 100))}
           THEN '{PRE_TOK}'
                || substr({text_col}, 1,
                          least({word(9)} % length({text_col}),
                                {word(17)} % length({text_col})))
                || '{SUF_TOK}'
                || substr({text_col},
                          greatest({word(9)} % length({text_col}),
                                   {word(17)} % length({text_col})) + 1)
                || '{MID_TOK}'
                || substr({text_col},
                          least({word(9)} % length({text_col}),
                                {word(17)} % length({text_col})) + 1,
                          greatest({word(9)} % length({text_col}),
                                   {word(17)} % length({text_col}))
                          - least({word(9)} % length({text_col}),
                                  {word(17)} % length({text_col})))
           ELSE {text_col} END AS fim_text,
           CASE WHEN {text_col} IS NOT NULL
                 AND length({text_col}) >= {max(min_chars, 1)}
                 AND {word(1)} % 100 < {int(round(rate * 100))}
           THEN TRUE ELSE FALSE END AS fim_text_applied
    FROM {table}
    """
