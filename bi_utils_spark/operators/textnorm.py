"""Unicode canonicalization + mojibake repair (X63).

Web-crawled text reaches a training pipeline in mixed Unicode
normalization forms (NFC vs decomposed NFD from mac filesystems/old
CMSes) and with encoding damage — the classic mojibake class where
UTF-8 bytes were decoded as cp1252 ("Café" shipped as "CafÃ©").
Both wreck downstream exact dedup (bytes differ, text identical) and
tokenization. This tier:

- :func:`normalize_unicode` — NFC/NFKC/NFD/NFKD via an Arrow-batched
  pandas UDF (vectorized ``Series.str.normalize``; Spark SQL has no
  normalization builtin). Python interop is per-STRING bounded and
  map-only.
- :func:`repair_mojibake` — reverses the UTF-8-read-as-cp1252 double
  encoding iff (a) a mojibake marker sequence is present and (b) the
  cp1252-encode → UTF-8-decode round trip succeeds strictly; anything
  else passes through untouched, so clean text can never be damaged
  (the repair is idempotent: repaired output contains no marker).
- :func:`strip_invisible` — drop control chars, zero-width
  spaces/joiners and BOMs: ONE JVM-side regexp, no Python.
- :func:`unicode_stats` — corpus audit: docs needing NFC, docs
  flagged as mojibake, invisible-char carriers.

All map-only projections; nothing shuffles until a caller aggregates.

Reference: Flaconi/bi_utils has no text tier (north-star surface,
same as X57-X62). Mojibake heuristic follows the ftfy "sloppy
cp1252" observation (Speer, ftfy docs).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_FORMS = ("NFC", "NFKC", "NFD", "NFKD")

# Sequences that essentially never occur in intentional Latin-script
# text but always occur in UTF-8-as-cp1252 mojibake: 'Ã'/'Â' followed
# by a continuation-byte image, or the 'â€' family (curly quotes /
# dashes). Used as a cheap JVM-side prefilter AND as the in-UDF gate.
_MOJIBAKE_MARKER = "(Ã.|Â.|â€)"


def _normalizer(form: str):
    # built lazily (inside the call) — pandas_udf parses its return
    # type against the ACTIVE session, so module import must not
    # require one
    @pandas_udf("string")
    def norm(s: pd.Series) -> pd.Series:
        return s.str.normalize(form)

    return norm


def normalize_unicode(
    col: Column | str, form: str = "NFC"
) -> Column:
    """Unicode-normalize a string column to ``form`` (default NFC —
    the canonical composition dedup/tokenizers want). Arrow-batched
    pandas UDF; nulls pass through."""
    if form not in _FORMS:
        raise ValueError(f"form must be one of {_FORMS}, got {form!r}")
    c = F.col(col) if isinstance(col, str) else col
    return _normalizer(form)(c)


def _repair_udf():
    @pandas_udf("string")
    def repair(s: pd.Series) -> pd.Series:
        import codecs
        import re

        marker = re.compile(r"Ã.|Â.|â€", re.S)
        # "sloppy cp1252" (ftfy): the five bytes cp1252 leaves
        # undefined surface as their C1 control codepoints when
        # browsers/Windows misdecode UTF-8, so map them back to the
        # raw byte; any OTHER unencodable char still aborts the
        # repair.
        sloppy = {0x81, 0x8D, 0x8F, 0x90, 0x9D}

        def on_err(exc):
            if isinstance(exc, UnicodeEncodeError):
                seg = exc.object[exc.start : exc.end]
                if all(ord(c) in sloppy for c in seg):
                    return bytes(ord(c) for c in seg), exc.end
            raise exc

        try:
            codecs.lookup_error("bi_utils_cp1252_sloppy")
        except LookupError:
            codecs.register_error("bi_utils_cp1252_sloppy", on_err)

        def fix(t):
            if t is None or not marker.search(t):
                return t
            try:
                return t.encode(
                    "cp1252", errors="bi_utils_cp1252_sloppy"
                ).decode("utf-8", errors="strict")
            except (UnicodeEncodeError, UnicodeDecodeError):
                return t

        return s.map(fix)

    return repair


def repair_mojibake(col: Column | str) -> Column:
    """Undo one layer of UTF-8-decoded-as-cp1252 damage. Strictly
    gated: rows without a marker sequence, and rows whose bytes do
    not round-trip cleanly, return unchanged — the repair can only
    fire on text that IS valid UTF-8 seen through cp1252 glasses."""
    c = F.col(col) if isinstance(col, str) else col
    # JVM-side prefilter keeps clean rows out of Python entirely
    return F.when(c.rlike(_MOJIBAKE_MARKER), _repair_udf()(c)).otherwise(c)


_INVISIBLE_RE = (
    "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F"
    "\\u200B-\\u200D\\u2060\\uFEFF]"
)


def strip_invisible(col: Column | str) -> Column:
    """Remove control characters (keeping \\t \\n \\r), zero-width
    spaces/joiners, word-joiner and BOM. One JVM regexp — map-only,
    zero Python."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, _INVISIBLE_RE, "")


def attach_normalized_text(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_norm",
    form: str = "NFC",
    fix_mojibake: bool = True,
) -> DataFrame:
    """The composed hygiene projection: mojibake repair (gated) →
    Unicode normalization → invisible-char strip. One map-only stage;
    only marker-bearing rows touch the repair UDF."""
    c: Column = F.col(text_col)
    if fix_mojibake:
        c = repair_mojibake(c)
    c = normalize_unicode(c, form)
    return df.withColumn(out_col, strip_invisible(c))


def unicode_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus hygiene audit: total docs, docs whose text is not
    NFC-normal, docs carrying mojibake markers, docs carrying
    invisible characters. One partial-aggregable pass."""
    t = F.col(text_col)
    return df.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(
            (normalize_unicode(t) != t).cast("long")
        ).alias("non_nfc_docs"),
        F.sum(t.rlike(_MOJIBAKE_MARKER).cast("long")).alias(
            "mojibake_docs"
        ),
        F.sum(t.rlike(_INVISIBLE_RE).cast("long")).alias(
            "invisible_docs"
        ),
    )
