"""Text cleaning / PII redaction for training-data pipelines.

The preprocessing stage that sits BEFORE dedup and quality filtering
(textstats.py) in an LLM data pipeline: scrub personally identifiable
substrings, strip markup and control characters, and normalize
whitespace — all as native Column expressions (`regexp_replace`
chains), so the whole cleanup is one codegen'd projection fused into
the scan. No reference counterpart (the reference's only privacy
primitive is SHA-1 id hashing, bi_utils/utils.py:46-55 — hash_id in
functions/scalars.py); patterns follow the common public recipes
(e.g. C4/RefinedWeb-style pipeline stages).

Scale: map-only by construction — zero shuffles, no Python, safe to
fuse with any downstream operator. Regexes are bounded-backtracking
(character classes + counted runs, no nested quantifiers).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.column import Column as ColumnType

ColumnOrName = ColumnType | str

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"(?:https?://|www\.)[^\s]+"
# 7+ digits with optional separators, anchored away from digit runs
# inside words; intentionally conservative (favors precision).
PHONE_RE = r"(?<![0-9A-Za-z])\+?[0-9][0-9 ()./-]{5,}[0-9](?![0-9A-Za-z])"
IPV4_RE = (
    r"(?<![0-9A-Za-z])(?<![0-9]\.)"          # not inside a word or dotted run
    r"(?:[0-9]{1,3}\.){3}[0-9]{1,3}"
    r"(?!\.?[0-9])(?![A-Za-z])"              # not continued by more octets/words
)
TAG_RE = r"<[^>]{1,500}>"
CONTROL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def redact_pii(
    c: ColumnOrName,
    email: str = "<EMAIL>",
    url: str = "<URL>",
    phone: str = "<PHONE>",
    ip: str = "<IP>",
) -> Column:
    """Replace emails, URLs, phone-like digit runs, and IPv4 literals
    with typed placeholder tokens (pass None for a class to skip it).

    Order matters: URLs before phones (URLs contain digit runs),
    emails before URLs (hosts look like domains).
    """
    out = _col(c)
    if email is not None:
        out = F.regexp_replace(out, EMAIL_RE, email)
    if url is not None:
        out = F.regexp_replace(out, URL_RE, url)
    if ip is not None:
        out = F.regexp_replace(out, IPV4_RE, ip)
    if phone is not None:
        out = F.regexp_replace(out, PHONE_RE, phone)
    return out


def strip_markup(c: ColumnOrName) -> Column:
    """Drop HTML/XML tags and decode the five XML entities."""
    out = F.regexp_replace(_col(c), TAG_RE, " ")
    for ent, ch in (
        ("&amp;", "&"),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
    ):
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def normalize_whitespace(c: ColumnOrName) -> Column:
    """Strip control characters, collapse whitespace runs to one
    space, and trim — the canonical form dedup should see."""
    out = F.regexp_replace(_col(c), CONTROL_RE, " ")
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def clean_text(
    c: ColumnOrName,
    markup: bool = True,
    pii: bool = True,
    whitespace: bool = True,
) -> Column:
    """The composed pipeline: markup → PII → whitespace. Each stage
    is optional; the result is still ONE projection expression."""
    out = _col(c)
    if markup:
        out = strip_markup(out)
    if pii:
        out = redact_pii(out)
    if whitespace:
        out = normalize_whitespace(out)
    return out


def pii_counts(c: ColumnOrName) -> dict[str, Column]:
    """Per-row counts of each PII class (for corpus audit reports):
    {'n_emails', 'n_urls', 'n_ips', 'n_phones'} column expressions."""
    col = _col(c)
    return {
        "n_emails": F.size(F.regexp_extract_all(col, F.lit(EMAIL_RE), F.lit(0))),
        "n_urls": F.size(F.regexp_extract_all(col, F.lit(URL_RE), F.lit(0))),
        "n_ips": F.size(F.regexp_extract_all(col, F.lit(IPV4_RE), F.lit(0))),
        "n_phones": F.size(F.regexp_extract_all(col, F.lit(PHONE_RE), F.lit(0))),
    }
