"""SQL DML front-end over manifest-log tx tables (r10 verdict task 2).

The reference drives its warehouse through SQL STRINGS — S1/S2 script
execution (`utils.py:265-290`, `utils.py:312-352`) renders a template
and ships it to the engine. `sources/sql_scripts.py` covers the
read/DDL side with Catalyst; this module completes the WRITE side for
tx tables: ``MERGE INTO`` / ``DELETE FROM`` / ``UPDATE`` / ``INSERT``
statements (plus ``VERSION AS OF`` / ``TIMESTAMP AS OF`` reads and the
maintenance verbs) parse against a name→path mapping and dispatch to
the existing `operators.txtable` verbs — the strings a reference user
already writes keep working, with the tx layer's ACID semantics
underneath.

Design choices, deliberately:

- **Parse, don't reimplement.** The front-end extracts the statement
  SHAPE (which table, which predicate, which set-clauses) and hands
  every expression string to the verbs unchanged — Catalyst parses
  predicates and set expressions (`F.expr`), and DML execution is the
  verbs' already-tested copy-on-write / merge-on-read machinery. No
  second SQL engine, no drift between the string path and the
  programmatic path.
- **Supported shapes are exact; everything else raises with
  guidance.** SQL MERGE is a large grammar; `merge_tx_table`
  implements the reference's M1 upsert semantics (`utils.py:237-296`)
  plus flagged deletes. The shapes below map onto that 1:1. A MERGE
  whose clauses mean something ELSE (partial-column updates,
  conditional inserts) gets a loud error naming the programmatic
  verb to use instead — never a silently-different semantic.
- **String-literal safety.** Statements are scanned with literals
  masked, so a WHERE value like ``'DELETE FROM x'`` never confuses
  the dispatcher, and time-travel rewriting never touches quoted
  text.

Supported statements (keywords case-insensitive; one statement per
call):

- ``SELECT ...`` — any Spark SELECT; each mapped table binds to a
  snapshot temp view NAMED LIKE the table (so qualified references,
  self-joins, and same-named columns/aliases resolve by Spark's own
  rules; the view shadows a same-named session temp view for the
  statement and is dropped after analysis), and ``VERSION AS OF n``
  / ``TIMESTAMP AS OF 'ts'`` suffixed references rewrite to
  per-version views.
- ``INSERT INTO t [(cols)] VALUES (...), (...)`` /
  ``INSERT INTO t [(cols)] SELECT ...`` — positional, like SQL.
- ``INSERT OVERWRITE t SELECT ...`` — full snapshot swap.
- ``UPDATE t SET c = expr[, ...] [WHERE p]``
- ``DELETE FROM t [WHERE p]``
- ``MERGE INTO t [AS] a USING (src|view) [AS] b ON <pk equi-join>``
  with clauses (each at most once, order free; SQL-standard row
  semantics — see `_do_merge`):
  ``WHEN MATCHED [AND c] THEN UPDATE SET *`` or
  ``SET col = expr[, ...]`` (partial update — unlisted columns keep
  their target values; expressions may reference both aliases),
  ``WHEN MATCHED [AND c] THEN DELETE`` (matched rows ONLY — a
  flagged key absent from the target still inserts, per standard),
  ``WHEN NOT MATCHED [AND c] THEN INSERT *`` or ``INSERT (cols)
  VALUES (exprs)`` (unlisted columns fill NULL; source columns
  beyond the target schema are readable by every condition and
  projected away before landing — ``*`` lands exactly the target
  schema),
  ``WHEN NOT MATCHED BY SOURCE [AND c] THEN DELETE``.
- ``RESTORE TABLE t TO VERSION AS OF n`` (or ``TIMESTAMP AS OF``)
- ``DESCRIBE HISTORY t``
- ``VACUUM t [RETAIN n VERSIONS]``
- DDL (r12): ``CREATE TABLE [IF NOT EXISTS] t (col type, ...)
  [PARTITIONED BY (cols)]`` / ``CREATE TABLE t [PARTITIONED BY
  (cols)] AS SELECT ...``; ``ALTER TABLE t`` with ``ADD COLUMN c
  type``, ``RENAME COLUMN a TO b``, ``DROP COLUMN c``, ``ALTER
  COLUMN c TYPE wider``, ``ADD CONSTRAINT n CHECK (expr)``, ``DROP
  CONSTRAINT n``; ``OPTIMIZE t [ZORDER BY (cols)]`` (partition-scoped
  `compact_partitions` on partitioned tables, `compact_table`
  otherwise). Each dispatches to the corresponding txtable verb —
  the metadata-time ALTERs stay metadata-time.

Scale: identical to the verbs — the front-end adds only driver-side
string work; plans, pruning, and commit protocol are untouched.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from bi_utils_spark.operators import txtable as tx

_IDENT = r"[A-Za-z_][A-Za-z0-9_.]*"


class SqlDmlError(ValueError):
    """Malformed or unsupported statement — message carries guidance."""


# ---------------------------------------------------------------------------
# literal masking + top-level splitting
# ---------------------------------------------------------------------------


def _strip_comments(sql: str) -> str:
    out, i, n = [], 0, len(sql)
    while i < n:
        c = sql[i]
        if c == "'":  # string literal: copy verbatim ('' escapes)
            j = i + 1
            while j < n:
                if sql[j] == "'" and j + 1 < n and sql[j + 1] == "'":
                    j += 2
                elif sql[j] == "'":
                    break
                else:
                    j += 1
            out.append(sql[i : j + 1])
            i = j + 1
        elif sql.startswith("--", i):
            while i < n and sql[i] != "\n":
                i += 1
        elif sql.startswith("/*", i):
            j = sql.find("*/", i + 2)
            i = n if j < 0 else j + 2
            out.append(" ")
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _mask_literals(sql: str) -> tuple[str, list[str]]:
    """Replace string literals with \x00<idx>\x00 placeholders so
    keyword scans never match quoted text."""
    lits: list[str] = []

    def repl(m: re.Match) -> str:
        lits.append(m.group(0))
        return f"\x00{len(lits) - 1}\x00"

    return re.sub(r"'(?:[^']|'')*'", repl, sql), lits


def _unmask(s: str, lits: list[str]) -> str:
    return re.sub(r"\x00(\d+)\x00", lambda m: lits[int(m.group(1))], s)


def _split_top(s: str, sep: str) -> list[str]:
    """Split on ``sep`` at paren depth 0 (literals already masked)."""
    parts, depth, start = [], 0, 0
    for i, c in enumerate(s):
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == sep and depth == 0:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    return parts


# ---------------------------------------------------------------------------
# time-travel binding for reads
# ---------------------------------------------------------------------------

# an AS OF-suffixed reference (the suffix is not Spark syntax, so
# these MUST rewrite); the lookbehind keeps `x.tbl` (tbl as a column
# of x) untouched while `tbl.x` (tbl as a qualifier) still matches
_ASOF = (
    r"(?<![\w.])(?P<name>{n})\b"
    r"(?:\s+VERSION\s+AS\s+OF\s+(?P<v>\d+)"
    r"|\s+TIMESTAMP\s+AS\s+OF\s+(?P<ts>\x00\d+\x00))"
)
_PLAIN = r"(?<![\w.]){n}\b"


def _bind_reads(
    spark: SparkSession, masked: str, lits: list[str],
    tables: dict[str, str],
) -> tuple[str, list[str]]:
    """Bind every mapped table reference to a snapshot temp view;
    return (rewritten masked SQL, created view names for cleanup).

    Plain references bind a temp view NAMED EXACTLY like the table
    and the SQL text is left untouched — so table-qualified column
    references (``SELECT t.x FROM t``), self-joins, and columns or
    aliases that merely share a mapped name all resolve by Spark's
    own scoping rules (r11 advice: per-occurrence view substitution
    broke every qualified reference). The view shadows any
    same-named session temp view for the statement's duration — by
    contract the mapping says what the name means here — and is
    dropped after analysis. AS OF references rewrite to one
    namespaced view per (table, version) since the suffix isn't
    Spark syntax; dotted table names (not legal temp-view names)
    fall back to one stable substitute view for ALL plain
    occurrences, so qualifiers keep resolving consistently."""
    views: list[str] = []

    def bind(path: str, view: str, version=None, ts=None) -> str:
        df = tx.read_table(spark, path, version=version, timestamp=ts)
        df.createOrReplaceTempView(view)
        views.append(view)
        return view

    for name, path in tables.items():
        safe = re.sub(r"\W", "_", name)
        asof_seen: dict[tuple, str] = {}

        def repl(m: re.Match) -> str:
            version = int(m.group("v")) if m.group("v") else None
            ts = m.group("ts")
            ts_val = _unmask(ts, lits).strip("'") if ts else None
            key = (version, ts_val)
            if key not in asof_seen:
                asof_seen[key] = bind(
                    path,
                    f"__tx_sql_{safe}_{len(views)}",
                    version=version,
                    ts=ts_val,
                )
            return asof_seen[key]

        masked = re.sub(
            _ASOF.format(n=re.escape(name)), repl, masked,
            flags=re.IGNORECASE,
        )
        plain = _PLAIN.format(n=re.escape(name))
        if re.search(plain, masked, flags=re.IGNORECASE):
            if "." in name:
                view = bind(path, f"__tx_sql_{safe}_{len(views)}")
                masked = re.sub(
                    plain, view, masked, flags=re.IGNORECASE
                )
            else:
                bind(path, name)
    return masked, views


def _drop_views(spark: SparkSession, views: list[str]) -> None:
    """Drop statement-scoped temp views — safe after ``spark.sql``
    because analysis is eager: the returned DataFrame's plan is
    already resolved and no longer needs the catalog entry."""
    for v in views:
        try:
            spark.catalog.dropTempView(v)
        except Exception:  # noqa: BLE001 — cleanup is best-effort
            pass


def _run_select(
    spark: SparkSession, masked: str, lits: list[str],
    tables: dict[str, str],
) -> DataFrame:
    bound, views = _bind_reads(spark, masked, lits, tables)
    try:
        return spark.sql(_unmask(bound, lits))
    finally:
        _drop_views(spark, views)


# ---------------------------------------------------------------------------
# statement handlers
# ---------------------------------------------------------------------------


def _resolve(tables: dict[str, str], name: str, stmt: str) -> str:
    if name not in tables:
        raise SqlDmlError(
            f"tx_sql: table {name!r} in {stmt.split()[0]} statement is "
            f"not in the tables mapping (have {sorted(tables)}). Pass "
            f"tables={{name: table_path}} for every tx table the "
            f"statement touches."
        )
    return tables[name]


def _source_df(
    spark: SparkSession, src: str, lits: list[str],
    tables: dict[str, str],
) -> DataFrame:
    src = src.strip()
    if src.startswith("("):
        return _run_select(spark, src[1:-1], lits, tables)
    if src in tables:
        return tx.read_table(spark, tables[src])
    return spark.sql(f"SELECT * FROM {src}")


def _positional_align(df: DataFrame, cols: list[str]) -> DataFrame:
    if len(df.columns) != len(cols):
        raise SqlDmlError(
            f"tx_sql INSERT: source has {len(df.columns)} columns, "
            f"target expects {len(cols)} ({cols})"
        )
    return df.toDF(*cols)


def _do_insert(spark, masked, lits, tables, m) -> dict:
    name, overwrite = m.group("tbl"), m.group(1).upper() == "OVERWRITE"
    path = _resolve(tables, name, "INSERT")
    rest = masked[m.end():].strip()
    cols_m = re.match(r"\(\s*(" + _IDENT + r"(?:\s*,\s*" + _IDENT + r")*)\s*\)\s*",
                      rest)
    explicit_cols = None
    if cols_m and not rest[: cols_m.end()].upper().lstrip("( ").startswith(
        "SELECT"
    ):
        explicit_cols = [c.strip() for c in cols_m.group(1).split(",")]
        rest = rest[cols_m.end():].strip()
    from pyspark.sql import functions as F

    schema = tx._fold(path).spark_schema()
    snap_cols = [f.name for f in schema.fields]
    types = {f.name: f.dataType for f in schema.fields}
    target_cols = explicit_cols or snap_cols
    unknown = [c for c in target_cols if c not in types]
    if unknown:
        raise SqlDmlError(
            f"tx_sql INSERT: column(s) {unknown} not in table schema "
            f"({snap_cols})"
        )
    up = rest.upper()
    if up.startswith("VALUES"):
        df = spark.sql(f"SELECT * FROM ( {_unmask(rest, lits)} )")
    elif up.startswith("SELECT") or up.startswith("("):
        df = _run_select(spark, rest, lits, tables)
    else:
        raise SqlDmlError(
            "tx_sql INSERT: expected VALUES (...) or SELECT ... after "
            f"the target, got: {rest[:60]!r}"
        )
    df = _positional_align(df, target_cols)
    # SQL INSERT semantics: positional assignment casts to the target
    # column types; unlisted columns fill with NULL.
    out = df.select(
        *[
            (
                F.col(c) if c in target_cols else F.lit(None)
            ).cast(types[c]).alias(c)
            for c in snap_cols
        ]
    )
    if overwrite:
        if explicit_cols:
            raise SqlDmlError(
                "tx_sql INSERT OVERWRITE: column lists are not "
                "supported — OVERWRITE replaces the full snapshot"
            )
        return {"op": "insert_overwrite", "version": tx.overwrite_table(out, path)}
    return {"op": "insert", "version": tx.append_table(out, path)}


def _do_delete(spark, masked, lits, tables, m, mode) -> dict:
    path = _resolve(tables, m.group("tbl"), "DELETE")
    cond = m.group("cond")
    cond_sql = _unmask(cond, lits).strip() if cond else "true"
    res = tx.delete_from_table(spark, path, cond_sql, mode=mode)
    return {"op": "delete", **res}


def _do_update(spark, masked, lits, tables, m, mode) -> dict:
    path = _resolve(tables, m.group("tbl"), "UPDATE")
    sets_raw = m.group("sets")
    cond = m.group("cond")
    sets: dict[str, str] = {}
    for part in _split_top(sets_raw, ","):
        eq = part.find("=")
        if eq < 0:
            raise SqlDmlError(
                f"tx_sql UPDATE: malformed SET clause {part.strip()!r} "
                f"(expected col = expr)"
            )
        col = part[:eq].strip()
        if not re.fullmatch(_IDENT, col):
            raise SqlDmlError(
                f"tx_sql UPDATE: {col!r} is not a column name"
            )
        sets[col] = _unmask(part[eq + 1 :], lits).strip()
    cond_sql = _unmask(cond, lits).strip() if cond else "true"
    res = tx.update_table(spark, path, cond_sql, sets, mode=mode)
    return {"op": "update", **res}


_MERGE_GUIDE = (
    "Supported MERGE shape: MERGE INTO t [AS] a USING (src|view) [AS] b "
    "ON a.pk = b.pk [AND ...] with clauses "
    "WHEN MATCHED [AND <cond>] THEN UPDATE SET * | SET c = expr[, ...], "
    "WHEN MATCHED [AND <cond>] THEN DELETE, "
    "WHEN NOT MATCHED [AND <cond over source>] THEN INSERT * | INSERT (cols) VALUES (exprs), "
    "WHEN NOT MATCHED BY SOURCE [AND <cond over target>] THEN DELETE "
    "(at most one of each kind; a MATCHED row satisfying the DELETE "
    "condition deletes regardless of clause order). For shapes beyond "
    "these call operators.txtable.merge_tx_table / update_table "
    "directly."
)


def _parse_merge_clauses(clauses_raw: str) -> dict:
    """Extract the WHEN clauses into at most one of each kind:
    ``upd`` {cond, sets ('*' or {col: masked expr})}, ``ins`` {cond},
    ``mdel`` {cond}, ``nmbs`` {cond}. Conditions stay MASKED."""
    out: dict[str, dict] = {}

    def put(kind: str, val: dict, cl: str) -> None:
        if kind in out:
            raise SqlDmlError(
                f"tx_sql MERGE: duplicate clause kind at {cl!r} — at "
                f"most one of each WHEN form. " + _MERGE_GUIDE
            )
        out[kind] = val

    for cl in re.split(r"(?=\bWHEN\b)", clauses_raw, flags=re.IGNORECASE):
        cl = cl.strip()
        if not cl:
            continue
        hm = re.fullmatch(
            r"WHEN\s+(?P<not>NOT\s+)?MATCHED"
            r"(?P<bysrc>\s+BY\s+SOURCE)?(?:\s+BY\s+TARGET)?"
            r"(?:\s+AND\s+(?P<cond>.+?))?"
            r"\s+THEN\s+(?P<action>.+)",
            cl,
            re.IGNORECASE | re.DOTALL,
        )
        if not hm:
            raise SqlDmlError(
                f"tx_sql MERGE: unsupported clause {cl!r}. "
                + _MERGE_GUIDE
            )
        is_not = bool(hm.group("not"))
        by_src = bool(hm.group("bysrc"))
        cond = hm.group("cond")
        action = hm.group("action").strip()
        a_up = action.upper()
        if by_src and not is_not:
            raise SqlDmlError(
                f"tx_sql MERGE: {cl!r} — MATCHED BY SOURCE is not a "
                f"SQL clause (did you mean NOT MATCHED BY SOURCE?). "
                + _MERGE_GUIDE
            )
        if is_not and by_src:
            if a_up != "DELETE":
                raise SqlDmlError(
                    "tx_sql MERGE: WHEN NOT MATCHED BY SOURCE supports "
                    "THEN DELETE only (an UPDATE of untouched target "
                    "rows is update_table's job). " + _MERGE_GUIDE
                )
            put("nmbs", {"cond": cond}, cl)
        elif is_not:
            if a_up == "INSERT *":
                put("ins", {"cond": cond, "cols": None, "vals": None}, cl)
                continue
            im = re.fullmatch(
                r"INSERT\s*\((?P<cols>[^)]*)\)\s*VALUES\s*"
                r"\((?P<vals>.+)\)",
                action,
                re.IGNORECASE | re.DOTALL,
            )
            if not im:
                raise SqlDmlError(
                    f"tx_sql MERGE: WHEN NOT MATCHED supports THEN "
                    f"INSERT * or INSERT (cols) VALUES (exprs), got "
                    f"{action!r}. " + _MERGE_GUIDE
                )
            cols = [c.strip() for c in im.group("cols").split(",")]
            vals = [v.strip() for v in _split_top(im.group("vals"), ",")]
            if len(cols) != len(vals):
                raise SqlDmlError(
                    f"tx_sql MERGE: INSERT lists {len(cols)} columns "
                    f"but {len(vals)} values."
                )
            put("ins", {"cond": cond, "cols": cols, "vals": vals}, cl)
        elif a_up == "DELETE":
            put("mdel", {"cond": cond}, cl)
        elif a_up.startswith("UPDATE"):
            sm = re.fullmatch(
                r"UPDATE\s+SET\s+(?P<sets>.+)", action,
                re.IGNORECASE | re.DOTALL,
            )
            if not sm:
                raise SqlDmlError(
                    f"tx_sql MERGE: malformed UPDATE action "
                    f"{action!r}. " + _MERGE_GUIDE
                )
            sets_raw = sm.group("sets").strip()
            if sets_raw == "*":
                put("upd", {"cond": cond, "sets": "*"}, cl)
            else:
                sets: dict[str, str] = {}
                for part in _split_top(sets_raw, ","):
                    eq = part.find("=")
                    col = part[:eq].strip() if eq > 0 else ""
                    col = re.sub(
                        r"^" + _IDENT + r"\.", "", col
                    )  # t.c = ... targets column c
                    if eq < 0 or not re.fullmatch(_IDENT, col):
                        raise SqlDmlError(
                            f"tx_sql MERGE: malformed SET clause "
                            f"{part.strip()!r} (expected col = expr). "
                            + _MERGE_GUIDE
                        )
                    if col in sets:
                        raise SqlDmlError(
                            f"tx_sql MERGE: column {col!r} SET twice."
                        )
                    sets[col] = part[eq + 1 :].strip()
                put("upd", {"cond": cond, "sets": sets}, cl)
        else:
            raise SqlDmlError(
                f"tx_sql MERGE: unsupported action {action!r}. "
                + _MERGE_GUIDE
            )
    if not out:
        raise SqlDmlError(
            "tx_sql MERGE: at least one WHEN clause is required. "
            + _MERGE_GUIDE
        )
    return out


def _do_merge(spark, masked, lits, tables, m) -> dict:
    """Lower a MERGE statement onto `merge_tx_table` with SQL-standard
    per-row semantics (r11 advice + verdict task 4):

    - a MATCHED source row satisfying the DELETE condition deletes
      the target row (delete wins over update for the same row — the
      net-effect convention, documented in the guide);
    - otherwise a MATCHED row satisfying the UPDATE condition
      updates (SET * replaces the row; SET c = expr rewrites listed
      columns, others keep their TARGET values — expressions may
      reference both aliases);
    - a MATCHED row satisfying neither condition leaves the target
      row UNTOUCHED;
    - a NOT MATCHED source row inserts iff the INSERT clause exists
      and its condition holds — in particular a delete-flagged row
      whose key is NOT in the target INSERTS (standard MERGE: the
      MATCHED DELETE clause only ever applies to matched rows; the
      pre-r12 lowering silently dropped such rows);
    - WHEN NOT MATCHED BY SOURCE THEN DELETE removes target rows no
      source key touches (condition over target columns).

    Everything lands in ONE merge commit: updates/inserts as the
    staged source, deletes as flagged tombstone rows through
    merge_tx_table's delete_col. The plain unconditional
    ``UPDATE SET * + INSERT *`` pair keeps the cheap path (no target
    join beyond the pk projection the DELETE clause needs);
    conditional/partial shapes join source to target on the pks —
    a column-pruned shuffle on the merge keys, the price of
    evaluating target-side expressions."""
    from pyspark.sql import functions as F

    path = _resolve(tables, m["tbl"], "MERGE")
    t_alias = m["talias"] or m["tbl"]
    s_alias = m["salias"] or (
        m["src"] if not m["src"].startswith("(") else None
    )
    on = m["on"].strip()

    # --- ON: conjunction of alias-qualified pk equalities
    pks: list[str] = []
    for conj in re.split(r"\bAND\b", on, flags=re.IGNORECASE):
        em = re.fullmatch(
            r"\s*(" + _IDENT + r")\.(" + _IDENT + r")\s*=\s*("
            + _IDENT + r")\.(" + _IDENT + r")\s*",
            conj,
        )
        if not em:
            raise SqlDmlError(
                f"tx_sql MERGE: ON must be a conjunction of "
                f"t.col = s.col equalities, got {conj.strip()!r}. "
                + _MERGE_GUIDE
            )
        a1, c1, a2, c2 = em.groups()
        sides = {a1: c1, a2: c2}
        if t_alias not in sides or (s_alias and s_alias not in sides):
            raise SqlDmlError(
                f"tx_sql MERGE: ON term {conj.strip()!r} does not join "
                f"the target alias {t_alias!r} to the source. "
                + _MERGE_GUIDE
            )
        if c1 != c2:
            raise SqlDmlError(
                f"tx_sql MERGE: pk columns must match by name "
                f"({c1!r} vs {c2!r}) — merge_tx_table merges on shared "
                f"pk names. " + _MERGE_GUIDE
            )
        pks.append(c1)

    clauses = _parse_merge_clauses(m["clauses"])
    upd = clauses.get("upd")
    ins = clauses.get("ins")
    mdel = clauses.get("mdel")
    nmbs = clauses.get("nmbs")

    src = _source_df(spark, m["src"], lits, tables)
    tgt_schema = tx._fold(path).spark_schema()
    target_cols = [f.name for f in tgt_schema.fields]
    dt_of = {f.name: f.dataType for f in tgt_schema.fields}

    def _require_full_source(star_kind: str) -> None:
        missing = [c for c in target_cols if c not in src.columns]
        if missing:
            raise SqlDmlError(
                f"tx_sql MERGE: source is missing target column(s) "
                f"{missing} — {star_kind} requires every target "
                f"column in the source"
            )

    def _cond(c, relation):
        return (
            F.expr(_unmask(c, lits).strip()) if c else F.lit(True)
        )

    dcol = "__tx_sql_del"

    fast = (
        upd is not None
        and upd["cond"] is None
        and upd["sets"] == "*"
        and ins is not None
        and ins["cond"] is None
        and ins["cols"] is None
        and nmbs is None
    )
    if fast and mdel is not None and mdel["cond"] is not None:
        # the cheap path evaluates the DELETE condition on the bare
        # source; a target-column reference needs the join path
        probe = _unmask(mdel["cond"], lits)
        if re.search(r"(?<![\w.])" + re.escape(t_alias) + r"\.", probe):
            fast = False

    if fast:
        _require_full_source("UPDATE SET * / INSERT *")
        flag = None
        if mdel is not None:
            expr_sql = _unmask(mdel["cond"], lits).strip() if mdel["cond"] else "true"
            if s_alias:
                expr_sql = re.sub(
                    r"(?<![\w.])" + re.escape(s_alias) + r"\.", "",
                    expr_sql,
                )
            # SQL standard: the MATCHED DELETE clause applies to
            # MATCHED rows only — restrict the flag to keys present
            # in the target, so a flagged-but-new key still INSERTS
            # (pk projection is column-pruned; the join shuffles on
            # the merge keys the merge shuffles on anyway)
            marker = (
                tx.read_table(spark, path)
                .select(*pks)
                .distinct()
                .withColumn("__tx_sql_m", F.lit(True))
            )
            flag = dcol
            src = (
                src.withColumn("__tx_sql_raw", F.expr(expr_sql))
                .join(marker, pks, "left")
                .withColumn(
                    dcol,
                    F.coalesce(F.col("__tx_sql_raw"), F.lit(False))
                    & F.coalesce(F.col("__tx_sql_m"), F.lit(False)),
                )
                .drop("__tx_sql_raw", "__tx_sql_m")
            )
        src = src.select(*target_cols, *([flag] if flag else []))
        version = tx.merge_tx_table(spark, path, src, pks, delete_col=flag)
        return {"op": "merge", "version": version}

    # --- general path: conditional / partial / by-source shapes.
    # Build ONE effective source relation with per-row delete flags,
    # then a single merge commit applies it.
    if s_alias is None:
        s_alias = "__tx_sql_src"
    if s_alias == t_alias:
        raise SqlDmlError(
            f"tx_sql MERGE: target and source share the alias "
            f"{t_alias!r} — expressions could not disambiguate."
        )
    tgt = tx.read_table(spark, path)
    parts: list[DataFrame] = []
    need_flag = mdel is not None or nmbs is not None

    def _with_flag(df: DataFrame, value: bool) -> DataFrame:
        return (
            df.withColumn(dcol, F.lit(value)) if need_flag else df
        )

    if upd is not None or mdel is not None:
        joined = tgt.alias(t_alias).join(
            src.alias(s_alias),
            [
                F.col(f"{t_alias}.{k}") == F.col(f"{s_alias}.{k}")
                for k in pks
            ],
            "inner",
        )
        del_c = (
            F.coalesce(_cond(mdel["cond"], joined), F.lit(False))
            if mdel is not None
            else F.lit(False)
        )
        if mdel is not None:
            parts.append(
                _with_flag(
                    joined.where(del_c).select(
                        *[
                            F.col(f"{t_alias}.{c}").alias(c)
                            for c in target_cols
                        ]
                    ),
                    True,
                )
            )
        if upd is not None:
            upd_rows = joined.where(
                ~del_c & F.coalesce(_cond(upd["cond"], joined), F.lit(False))
            )
            if upd["sets"] == "*":
                _require_full_source("UPDATE SET *")
                proj = [
                    F.col(f"{s_alias}.{c}").alias(c) for c in target_cols
                ]
            else:
                sets = {
                    c: _unmask(e, lits).strip()
                    for c, e in upd["sets"].items()
                }
                unknown = [c for c in sets if c not in target_cols]
                if unknown:
                    raise SqlDmlError(
                        f"tx_sql MERGE: SET column(s) {unknown} not in "
                        f"the target schema ({target_cols})"
                    )
                bad_pk = [c for c in sets if c in pks]
                if bad_pk:
                    raise SqlDmlError(
                        f"tx_sql MERGE: SET may not assign merge key "
                        f"column(s) {bad_pk} — a key change is a "
                        f"delete+insert, spell it as such."
                    )
                proj = [
                    (
                        F.expr(sets[c])
                        if c in sets
                        else F.col(f"{t_alias}.{c}")
                    ).alias(c)
                    for c in target_cols
                ]
            parts.append(_with_flag(upd_rows.select(*proj), False))
    if ins is not None:
        unmatched = (
            src.alias(s_alias)
            .join(tgt.select(*pks).distinct(), pks, "left_anti")
            .where(_cond(ins["cond"], src))
        )
        if ins["cols"] is None:
            _require_full_source("INSERT *")
            proj = [F.col(c) for c in target_cols]
        else:
            unknown = [c for c in ins["cols"] if c not in target_cols]
            if unknown:
                raise SqlDmlError(
                    f"tx_sql MERGE: INSERT column(s) {unknown} not in "
                    f"the target schema ({target_cols})"
                )
            missing_pks = [k for k in pks if k not in ins["cols"]]
            if missing_pks:
                raise SqlDmlError(
                    f"tx_sql MERGE: INSERT (cols) must list the merge "
                    f"key(s) {missing_pks} — a NULL-keyed insert can "
                    f"never be matched again."
                )
            val_of = dict(zip(ins["cols"], ins["vals"]))
            # unlisted columns fill NULL at the declared type — SQL
            # INSERT column-list semantics
            proj = [
                (
                    F.expr(_unmask(val_of[c], lits))
                    if c in val_of
                    else F.lit(None)
                ).cast(dt_of[c]).alias(c)
                for c in target_cols
            ]
        parts.append(_with_flag(unmatched.select(*proj), False))
    if nmbs is not None:
        untouched = (
            tgt.alias(t_alias)
            .join(src.select(*pks).distinct(), pks, "left_anti")
            .where(_cond(nmbs["cond"], tgt))
        )
        parts.append(_with_flag(untouched.select(*target_cols), True))
    effective = parts[0]
    for p in parts[1:]:
        effective = effective.unionByName(p)
    version = tx.merge_tx_table(
        spark, path, effective, pks,
        delete_col=dcol if need_flag else None,
    )
    return {"op": "merge", "version": version}


# ---------------------------------------------------------------------------
# entry point
# ---------------------------------------------------------------------------

_RE_INSERT = re.compile(
    r"^INSERT\s+(INTO|OVERWRITE)\s+(?:TABLE\s+)?(?P<tbl>" + _IDENT + r")\s*",
    re.IGNORECASE,
)
_RE_DELETE = re.compile(
    r"^DELETE\s+FROM\s+(?P<tbl>" + _IDENT + r")"
    r"(?:\s+WHERE\s+(?P<cond>.+))?$",
    re.IGNORECASE | re.DOTALL,
)
_RE_UPDATE = re.compile(
    r"^UPDATE\s+(?P<tbl>" + _IDENT + r")\s+SET\s+(?P<sets>.+?)"
    r"(?:\s+WHERE\s+(?P<cond>.+))?$",
    re.IGNORECASE | re.DOTALL,
)
_RE_MERGE_HEAD = re.compile(
    r"^MERGE\s+INTO\s+(?P<tbl>" + _IDENT + r")"
    r"(?:\s+AS)?(?:\s+(?P<talias>" + _IDENT + r"))?"
    r"\s+USING\s+",
    re.IGNORECASE,
)
_RE_MERGE_TAIL = re.compile(
    r"^(?:\s+AS)?(?:\s+(?P<salias>" + _IDENT + r"))?"
    r"\s+ON\s+(?P<on>.+?)"
    r"\s+(?P<clauses>WHEN\s+.+)$",
    re.IGNORECASE | re.DOTALL,
)


def _parse_merge(masked: str) -> dict | None:
    """MERGE shape extraction: the USING source is taken by a
    balanced-paren scan (regexes cap nesting; a subquery of a
    subquery is perfectly legal), the rest by anchored regexes."""
    head = _RE_MERGE_HEAD.match(masked)
    if not head:
        return None
    rest = masked[head.end():]
    if rest.startswith("("):
        depth = 0
        end = None
        for i, c in enumerate(rest):
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    end = i + 1
                    break
        if end is None:
            return None
        src, rest = rest[:end], rest[end:]
    else:
        im = re.match(_IDENT, rest)
        if not im:
            return None
        src, rest = im.group(0), rest[im.end():]
    tail = _RE_MERGE_TAIL.match(rest)
    if not tail:
        return None
    return {
        "tbl": head.group("tbl"),
        "talias": head.group("talias"),
        "src": src,
        "salias": tail.group("salias"),
        "on": tail.group("on"),
        "clauses": tail.group("clauses"),
    }
_RE_CREATE = re.compile(
    r"^CREATE\s+TABLE\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?"
    r"(?P<tbl>" + _IDENT + r")\s*",
    re.IGNORECASE,
)
_RE_ALTER = re.compile(
    r"^ALTER\s+TABLE\s+(?P<tbl>" + _IDENT + r")\s+(?P<rest>.+)$",
    re.IGNORECASE | re.DOTALL,
)
_RE_OPTIMIZE = re.compile(
    r"^OPTIMIZE\s+(?P<tbl>" + _IDENT + r")"
    r"(?:\s+ZORDER\s+BY\s*\(\s*(?P<z>[^)]*?)\s*\))?$",
    re.IGNORECASE,
)


def _balanced_paren(s: str) -> int | None:
    """End index (exclusive) of the paren group ``s`` starts with."""
    depth = 0
    for i, c in enumerate(s):
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i + 1
    return None


def _do_create(spark, masked, lits, tables, m) -> dict:
    path = _resolve(tables, m.group("tbl"), "CREATE")
    rest = masked[m.end():].strip()
    cols_sql = None
    if rest.startswith("("):
        end = _balanced_paren(rest)
        if end is None:
            raise SqlDmlError("tx_sql CREATE TABLE: unbalanced column list")
        cols_sql, rest = rest[1 : end - 1], rest[end:].strip()
    pcols = None
    pm = re.match(
        r"PARTITIONED\s+BY\s*\(\s*([^)]*?)\s*\)\s*", rest, re.IGNORECASE
    )
    if pm:
        pcols = [c.strip() for c in pm.group(1).split(",")]
        rest = rest[pm.end():].strip()
    if m.group("ine") and tx.latest_version(path) >= 0:
        return {
            "op": "create",
            "version": tx.latest_version(path),
            "skipped": True,
        }
    am = re.match(r"AS\s+", rest, re.IGNORECASE)
    if am:
        if cols_sql is not None:
            raise SqlDmlError(
                "tx_sql CREATE TABLE: a column list and AS SELECT are "
                "mutually exclusive — CTAS takes its schema from the "
                "query"
            )
        df = _run_select(spark, rest[am.end():], lits, tables)
    else:
        if rest or cols_sql is None:
            raise SqlDmlError(
                "tx_sql CREATE TABLE: expected (col type, ...) "
                "[PARTITIONED BY (cols)] or [PARTITIONED BY (cols)] "
                f"AS SELECT ..., got: {rest[:60]!r}"
            )
        df = spark.createDataFrame([], _unmask(cols_sql, lits))
    return {
        "op": "create",
        "version": tx.create_table(df, path, partition_cols=pcols),
    }


_ALTER_GUIDE = (
    "Supported ALTER TABLE forms: ADD COLUMN c type | RENAME COLUMN "
    "a TO b | DROP COLUMN c | ALTER COLUMN c TYPE wider | ADD "
    "CONSTRAINT n CHECK (expr) | DROP CONSTRAINT n. Partition "
    "evolution is repartition_table (no standard SQL spelling)."
)


def _do_alter(spark, masked, lits, tables, m) -> dict:
    path = _resolve(tables, m.group("tbl"), "ALTER")
    rest = m.group("rest").strip()
    am = re.fullmatch(
        r"ADD\s+COLUMNS?\s+\(?\s*(?P<c>" + _IDENT + r")\s+(?P<t>[^,()]+?)\s*\)?",
        rest, re.IGNORECASE,
    )
    if am:
        return {
            "op": "alter",
            "version": tx.add_column(path, am.group("c"), am.group("t")),
        }
    rm = re.fullmatch(
        r"RENAME\s+COLUMN\s+(?P<a>" + _IDENT + r")\s+TO\s+(?P<b>" + _IDENT + r")",
        rest, re.IGNORECASE,
    )
    if rm:
        return {
            "op": "alter",
            "version": tx.rename_column(path, rm.group("a"), rm.group("b")),
        }
    dm = re.fullmatch(
        r"DROP\s+COLUMN\s+(?P<c>" + _IDENT + r")", rest, re.IGNORECASE
    )
    if dm:
        return {"op": "alter", "version": tx.drop_column(path, dm.group("c"))}
    wm = re.fullmatch(
        r"ALTER\s+COLUMN\s+(?P<c>" + _IDENT + r")\s+(?:SET\s+DATA\s+)?TYPE\s+"
        r"(?P<t>\S+)",
        rest, re.IGNORECASE,
    )
    if wm:
        return {
            "op": "alter",
            "version": tx.widen_column_type(path, wm.group("c"), wm.group("t")),
        }
    cm = re.fullmatch(
        r"ADD\s+CONSTRAINT\s+(?P<n>" + _IDENT + r")\s+CHECK\s*"
        r"\((?P<e>.+)\)",
        rest, re.IGNORECASE | re.DOTALL,
    )
    if cm:
        return {
            "op": "alter",
            "version": tx.add_check_constraint(
                spark, path, cm.group("n"), _unmask(cm.group("e"), lits)
            ),
        }
    xm = re.fullmatch(
        r"DROP\s+CONSTRAINT\s+(?P<n>" + _IDENT + r")", rest, re.IGNORECASE
    )
    if xm:
        return {
            "op": "alter",
            "version": tx.drop_check_constraint(path, xm.group("n")),
        }
    raise SqlDmlError(
        f"tx_sql ALTER TABLE: unsupported form {rest[:60]!r}. "
        + _ALTER_GUIDE
    )


def _do_optimize(spark, masked, lits, tables, m) -> dict:
    path = _resolve(tables, m.group("tbl"), "OPTIMIZE")
    zorder = (
        [c.strip() for c in m.group("z").split(",")]
        if m.group("z")
        else None
    )
    if tx._fold(path).partition_cols:
        version = tx.compact_partitions(spark, path, zorder_by=zorder)
    else:
        version = tx.compact_table(spark, path, zorder_by=zorder)
    return {
        "op": "optimize",
        "version": (
            version if version is not None else tx.latest_version(path)
        ),
        "compacted": version is not None,
    }


_RE_RESTORE = re.compile(
    r"^RESTORE\s+TABLE\s+(?P<tbl>" + _IDENT + r")\s+TO\s+"
    r"(?:VERSION\s+AS\s+OF\s+(?P<v>\d+)"
    r"|TIMESTAMP\s+AS\s+OF\s+(?P<ts>\x00\d+\x00))$",
    re.IGNORECASE,
)
_RE_HISTORY = re.compile(
    r"^DESCRIBE\s+HISTORY\s+(?P<tbl>" + _IDENT + r")$", re.IGNORECASE
)
_RE_VACUUM = re.compile(
    r"^VACUUM\s+(?P<tbl>" + _IDENT + r")"
    r"(?:\s+RETAIN\s+(?P<n>\d+)\s+VERSIONS)?$",
    re.IGNORECASE,
)


def tx_sql(
    spark: SparkSession,
    statement: str,
    tables: dict[str, str],
    mode: str = "mor",
):
    """Execute ONE SQL statement against tx tables.

    ``tables`` maps statement table names to tx-table paths. Reads
    (SELECT / the USING source) may reference mapped names with
    ``VERSION AS OF n`` / ``TIMESTAMP AS OF 'ts'``. ``mode`` picks the
    DELETE/UPDATE execution strategy (``"mor"`` deletion vectors /
    ``"cow"`` rewrite), same default as the verbs.

    Returns a DataFrame for SELECT / DESCRIBE HISTORY, else a dict
    with at least ``op`` and ``version``.
    """
    stmt = _strip_comments(statement).strip().rstrip(";").strip()
    if not stmt:
        raise SqlDmlError("tx_sql: empty statement")
    masked, lits = _mask_literals(stmt)
    head = masked.split(None, 1)[0].upper()

    if head in ("SELECT", "WITH"):
        return _run_select(spark, masked, lits, tables)
    if head == "INSERT":
        m = _RE_INSERT.match(masked)
        if not m:
            raise SqlDmlError(
                "tx_sql: malformed INSERT — expected INSERT INTO|"
                "OVERWRITE <table> [(cols)] VALUES ... | SELECT ..."
            )
        return _do_insert(spark, masked, lits, tables, m)
    if head == "DELETE":
        m = _RE_DELETE.match(masked)
        if not m:
            raise SqlDmlError(
                "tx_sql: malformed DELETE — expected DELETE FROM "
                "<table> [WHERE <predicate>]"
            )
        return _do_delete(spark, masked, lits, tables, m, mode)
    if head == "UPDATE":
        m = _RE_UPDATE.match(masked)
        if not m:
            raise SqlDmlError(
                "tx_sql: malformed UPDATE — expected UPDATE <table> "
                "SET col = expr[, ...] [WHERE <predicate>]"
            )
        return _do_update(spark, masked, lits, tables, m, mode)
    if head == "MERGE":
        m = _parse_merge(masked)
        if not m:
            raise SqlDmlError("tx_sql: malformed MERGE. " + _MERGE_GUIDE)
        return _do_merge(spark, masked, lits, tables, m)
    if head == "RESTORE":
        m = _RE_RESTORE.match(masked)
        if not m:
            raise SqlDmlError(
                "tx_sql: malformed RESTORE — expected RESTORE TABLE "
                "<table> TO VERSION AS OF <n> | TIMESTAMP AS OF '<ts>'"
            )
        path = _resolve(tables, m.group("tbl"), "RESTORE")
        ts = m.group("ts")
        version = tx.restore_table(
            spark, path,
            version=int(m.group("v")) if m.group("v") else None,
            timestamp=_unmask(ts, lits).strip("'") if ts else None,
        )
        return {"op": "restore", "version": version}
    if head == "DESCRIBE":
        m = _RE_HISTORY.match(masked)
        if not m:
            raise SqlDmlError(
                "tx_sql: only DESCRIBE HISTORY <table> is supported"
            )
        return tx.table_history(
            spark, _resolve(tables, m.group("tbl"), "DESCRIBE")
        )
    if head == "VACUUM":
        m = _RE_VACUUM.match(masked)
        if not m:
            raise SqlDmlError(
                "tx_sql: malformed VACUUM — expected VACUUM <table> "
                "[RETAIN <n> VERSIONS]"
            )
        path = _resolve(tables, m.group("tbl"), "VACUUM")
        kw = {"retain_versions": int(m.group("n"))} if m.group("n") else {}
        deleted = tx.vacuum_table(path, **kw)
        return {"op": "vacuum", "version": tx.latest_version(path),
                "files_deleted": len(deleted)}
    if head == "CREATE":
        m = _RE_CREATE.match(masked)
        if not m:
            raise SqlDmlError(
                "tx_sql: malformed CREATE — expected CREATE TABLE "
                "[IF NOT EXISTS] <table> (col type, ...) [PARTITIONED "
                "BY (cols)] | ... AS SELECT ..."
            )
        return _do_create(spark, masked, lits, tables, m)
    if head == "ALTER":
        m = _RE_ALTER.match(masked)
        if not m:
            raise SqlDmlError("tx_sql: malformed ALTER. " + _ALTER_GUIDE)
        return _do_alter(spark, masked, lits, tables, m)
    if head == "OPTIMIZE":
        m = _RE_OPTIMIZE.match(masked)
        if not m:
            raise SqlDmlError(
                "tx_sql: malformed OPTIMIZE — expected OPTIMIZE "
                "<table> [ZORDER BY (cols)]"
            )
        return _do_optimize(spark, masked, lits, tables, m)
    raise SqlDmlError(
        f"tx_sql: unsupported statement kind {head!r} — supported: "
        f"SELECT/WITH, INSERT, UPDATE, DELETE, MERGE, CREATE TABLE, "
        f"ALTER TABLE, OPTIMIZE, RESTORE TABLE, DESCRIBE HISTORY, "
        f"VACUUM. (DROP TABLE is deliberately absent — deleting a "
        f"table is a filesystem operation, not a commit.)"
    )


def split_statements(script: str) -> list[str]:
    """Split a SQL script into statements on ``;`` at top level —
    literals and comments never split (the masking pass handles a
    ``';'`` inside a string), trailing empties drop."""
    stripped = _strip_comments(script)
    masked, lits = _mask_literals(stripped)
    out = []
    for part in _split_top(masked, ";"):
        stmt = _unmask(part, lits).strip()
        if stmt:
            out.append(stmt)
    return out


def tx_sql_script(
    spark: SparkSession,
    filename: str,
    tables: dict[str, str],
    mode: str = "mor",
    **params,
) -> list:
    """Execute a ``.sql`` FILE of ``;``-separated DML statements
    against tx tables — the write-side twin of the reference's S2
    `execute_sql_script` (`utils.py:342-352`): the same ``{param}``
    templating (via `sources.sql_scripts.render_sql_script`), each
    statement dispatched through :func:`tx_sql` in order. Returns the
    per-statement results (dicts for DML; DataFrames are EXECUTED —
    a script is run for effect, matching the reference's contract —
    and returned lazily for inspection).

    Errors raise at the failing statement with its index; statements
    before it have committed (scripts are not transactions — same as
    shipping the script to a warehouse that auto-commits per
    statement)."""
    from bi_utils_spark.sources.sql_scripts import render_sql_script

    script = render_sql_script(filename, **params)
    results = []
    for i, stmt in enumerate(split_statements(script)):
        try:
            results.append(tx_sql(spark, stmt, tables, mode=mode))
        except Exception as e:
            raise SqlDmlError(
                f"tx_sql_script: statement {i + 1} failed "
                f"({stmt[:80]!r}...): {e}"
            ) from e
    return results
