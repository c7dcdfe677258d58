"""Iceberg-format metadata export (operators/iceberg.py): spec-shaped
metadata tree, independent-reader verification (Avro JAVA library on
Spark's classpath — a second implementation the zero-dep writer never
touches), DuckDB row-for-row equality of the exported file set with
the exported name mapping applied, DV refusal/materialization, and
post-vacuum consistency."""

from __future__ import annotations

import json
import os

import duckdb
import pytest

from bi_utils_spark.operators import txtable as tx
from bi_utils_spark.operators.iceberg import (
    export_iceberg_metadata,
    read_iceberg_export,
)


def _mk(spark, tmp_path, partitioned=True):
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b"), (3, 30, "a"), (4, 40, "b")],
        "k int, v long, s string",
    )
    tx.create_table(df, path, partition_cols=["s"] if partitioned else None)
    return path


def _duckdb_rows(export, logical_cols):
    """Read the exported file list the way an external engine would:
    plain parquet scan + the exported name mapping + manifest
    partition values for identity-partition columns."""
    con = duckdb.connect()
    rows = []
    for f in export["files"]:
        phys = export["physical_of"]
        file_cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet(['{f['path']}'])"
            ).fetchall()
        ]
        sel = []
        for c in logical_cols:
            if phys[c] in file_cols:
                sel.append(f'"{phys[c]}"')
            else:  # identity partition value from the manifest
                v = f["partition"][c]
                sel.append("NULL" if v is None else repr(v))
        got = con.execute(
            f"SELECT {', '.join(sel)} FROM read_parquet(['{f['path']}'])"
        ).fetchall()
        rows.extend(map(tuple, got))
    return sorted(rows)


def _spark_rows(spark, path, cols):
    return sorted(
        tuple(r) for r in tx.read_table(spark, path).select(*cols).collect()
    )


def test_export_matches_read_table(spark, tmp_path):
    path = _mk(spark, tmp_path)
    res = export_iceberg_metadata(path)
    assert res["n_rows"] == 4 and res["version"] == 0
    export = read_iceberg_export(path)
    assert len(export["files"]) == res["n_files"]
    assert _duckdb_rows(export, ["k", "v", "s"]) == _spark_rows(
        spark, path, ["k", "v", "s"]
    )
    # every referenced file exists and sizes match the manifest
    for f in export["files"]:
        assert os.stat(f["path"]).st_size == f["bytes"]


def test_rename_survives_export(spark, tmp_path):
    path = _mk(spark, tmp_path)
    tx.rename_column(path, "v", "val")
    tx.append_table(
        spark.createDataFrame([(5, 50, "a")], "k int, val long, s string"),
        path,
    )
    # the symlink export refuses a column-mapped table; this one is
    # exactly the path that must NOT refuse (r10 verdict task 1)
    with pytest.raises(ValueError, match="renamed"):
        tx.write_symlink_manifest(path)
    export_iceberg_metadata(path)
    export = read_iceberg_export(path)
    assert export["physical_of"] == {"k": "k", "val": "v", "s": "s"}
    names = [f["name"] for f in export["schema_fields"]]
    assert names == ["k", "val", "s"]
    assert _duckdb_rows(export, ["k", "val", "s"]) == _spark_rows(
        spark, path, ["k", "val", "s"]
    )
    # name-mapping property is the spec shape: field-id + names
    mapping = json.loads(
        export["metadata"]["properties"]["schema.name-mapping.default"]
    )
    assert {"field-id": 2, "names": ["v", "val"]} in mapping


def test_dv_refusal_and_materialize(spark, tmp_path):
    path = _mk(spark, tmp_path)
    tx.delete_from_table(spark, path, "k = 2", mode="mor")
    with pytest.raises(ValueError, match="deletion vectors"):
        export_iceberg_metadata(path)
    res = export_iceberg_metadata(path, spark=spark, materialize=True)
    assert res["n_rows"] == 3
    export = read_iceberg_export(path)
    assert _duckdb_rows(export, ["k", "v", "s"]) == _spark_rows(
        spark, path, ["k", "v", "s"]
    )
    # materialize only applies to the latest version: version 1 is
    # the DV'd snapshot, now superseded by the materialize commit
    with pytest.raises(ValueError, match="latest"):
        export_iceberg_metadata(
            path, version=1, spark=spark, materialize=True
        )


def test_export_after_vacuum_purge(spark, tmp_path):
    path = _mk(spark, tmp_path)
    tx.delete_from_table(spark, path, "k <= 2", mode="cow")
    tx.compact_table(spark, path)
    tx.vacuum_table(path, retain_versions=1, stray_age_seconds=0.0)
    export_iceberg_metadata(path)
    export = read_iceberg_export(path)
    for f in export["files"]:
        assert os.path.exists(f["path"])  # nothing points at purged files
    assert _duckdb_rows(export, ["k", "v", "s"]) == _spark_rows(
        spark, path, ["k", "v", "s"]
    )


def test_export_old_version_time_travel(spark, tmp_path):
    path = _mk(spark, tmp_path)
    tx.delete_from_table(spark, path, "k = 1", mode="cow")
    res = export_iceberg_metadata(path, version=0)
    assert res["n_rows"] == 4 and res["snapshot_id"] == 0
    export = read_iceberg_export(path)
    assert sorted(r[0] for r in _duckdb_rows(export, ["k"])) == [1, 2, 3, 4]


def test_reexport_chains_history(spark, tmp_path):
    path = _mk(spark, tmp_path)
    assert export_iceberg_metadata(path)["version_hint"] == 1
    tx.append_table(
        spark.createDataFrame([(9, 90, "a")], "k int, v long, s string"),
        path,
    )
    res = export_iceberg_metadata(path)
    assert res["version_hint"] == 2
    export = read_iceberg_export(path)  # hint resolves the NEW tree
    md = export["metadata"]
    assert md["current-snapshot-id"] == res["snapshot_id"]
    assert sum(f["rows"] for f in export["files"]) == 5
    # continuity: same schema, so the first export's snapshot is
    # carried — an Iceberg reader of the LATEST tree time-travels
    # across exports — and metadata-log names the previous file
    snap_ids = sorted(s["snapshot-id"] for s in md["snapshots"])
    assert snap_ids == [0, 1]
    assert md["last-sequence-number"] == 2
    assert [e["snapshot-id"] for e in md["snapshot-log"]] == [0, 1]
    assert len(md["metadata-log"]) == 1
    assert md["metadata-log"][0]["metadata-file"].endswith(
        "v1.metadata.json"
    )
    # a schema change starts a fresh snapshot history
    tx.rename_column(path, "v", "val")
    export_iceberg_metadata(path)
    md3 = read_iceberg_export(path)["metadata"]
    assert [s["snapshot-id"] for s in md3["snapshots"]] == [
        md3["current-snapshot-id"]
    ]
    assert len(md3["metadata-log"]) == 2  # forensics chain intact


def test_unpartitioned_and_metadata_shape(spark, tmp_path):
    path = _mk(spark, tmp_path, partitioned=False)
    export_iceberg_metadata(path)
    export = read_iceberg_export(path)
    md = export["metadata"]
    assert md["format-version"] == 2
    assert md["partition-specs"] == [{"spec-id": 0, "fields": []}]
    assert md["current-schema-id"] == 0
    snap_ids = [s["snapshot-id"] for s in md["snapshots"]]
    assert md["current-snapshot-id"] in snap_ids
    assert md["refs"]["main"]["snapshot-id"] == md["current-snapshot-id"]
    fields = md["schemas"][0]["fields"]
    assert [(f["id"], f["name"], f["type"]) for f in fields] == [
        (1, "k", "int"),
        (2, "v", "long"),
        (3, "s", "string"),
    ]
    assert _duckdb_rows(export, ["k", "v", "s"]) == _spark_rows(
        spark, path, ["k", "v", "s"]
    )


def test_jvm_avro_reads_manifests(spark, tmp_path):
    """Independent-implementation check: the Avro JAVA library parses
    both OCF files and agrees on paths + counts."""
    path = _mk(spark, tmp_path)
    export_iceberg_metadata(path)
    export = read_iceberg_export(path)
    jvm = spark._jvm

    def jvm_records(avro_path):
        rd = jvm.org.apache.avro.file.DataFileReader(
            jvm.java.io.File(avro_path),
            jvm.org.apache.avro.generic.GenericDatumReader(),
        )
        out = []
        while rd.hasNext():
            out.append(json.loads(str(rd.next())))
        rd.close()
        return out

    md = export["metadata"]
    snap = md["snapshots"][0]
    mlist = jvm_records(snap["manifest-list"].replace("file://", ""))
    assert len(mlist) == 1
    assert mlist[0]["added_files_count"] == len(export["files"])
    assert mlist[0]["added_rows_count"] == sum(
        f["rows"] for f in export["files"]
    )
    entries = jvm_records(mlist[0]["manifest_path"].replace("file://", ""))
    jvm_paths = sorted(
        e["data_file"]["file_path"].replace("file://", "") for e in entries
    )
    assert jvm_paths == sorted(f["path"] for f in export["files"])
    for e in entries:
        assert e["status"] == 1
        assert e["data_file"]["file_format"] == "PARQUET"
        assert e["data_file"]["content"] == 0


def test_nested_type_refused_with_guidance(spark, tmp_path):
    path = str(tmp_path / "nested")
    tx.create_table(
        spark.createDataFrame([(1, [1, 2])], "k int, a array<int>"), path
    )
    with pytest.raises(ValueError, match="flatten"):
        export_iceberg_metadata(path)


def test_avro_deflate_and_empty_read(tmp_path):
    """Pure-python codec edges: a deflate-coded OCF (which OTHER
    writers produce — our writer emits codec null) and an empty
    container both read back correctly."""
    import io
    import zlib

    from bi_utils_spark.operators.avroio import (
        _MAGIC,
        _SYNC,
        _write_bytes,
        _write_long,
        _write_str,
        read_ocf,
        write_datum,
        write_ocf,
    )

    schema = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "x", "type": "long"}],
    }
    recs = [{"x": 1}, {"x": -300}]
    # hand-build a deflate OCF the way the Java writer would
    out = io.BytesIO()
    out.write(_MAGIC)
    meta = {"avro.schema": json.dumps(schema), "avro.codec": "deflate"}
    _write_long(out, len(meta))
    for k, v in meta.items():
        _write_str(out, k)
        _write_bytes(out, v.encode())
    _write_long(out, 0)
    out.write(_SYNC)
    body = io.BytesIO()
    for r in recs:
        write_datum(body, schema, r)
    comp = zlib.compress(body.getvalue())[2:-4]  # raw deflate, no hdr
    _write_long(out, len(recs))
    _write_long(out, len(comp))
    out.write(comp)
    out.write(_SYNC)
    p = str(tmp_path / "d.avro")
    with open(p, "wb") as fh:
        fh.write(out.getvalue())
    got_schema, got = read_ocf(p)
    assert got == recs
    # empty container round-trips
    p2 = str(tmp_path / "e.avro")
    write_ocf(p2, schema, [])
    assert read_ocf(p2) == (schema, [])


def test_position_delete_export(spark, tmp_path):
    """on_dv='deletes': DVs become Iceberg v2 position-delete files —
    the MOR snapshot survives the export with zero data rewritten."""
    from bi_utils_spark.operators.iceberg import read_iceberg_export_df

    path = _mk(spark, tmp_path)
    tx.rename_column(path, "v", "val")
    tx.delete_from_table(spark, path, "k % 2 = 0", mode="mor")
    tx.update_table(spark, path, "k = 1", {"val": "111"}, mode="mor")
    res = export_iceberg_metadata(path, on_dv="deletes")
    assert res["n_delete_files"] >= 1 and res["n_deleted_rows"] == 3
    export = read_iceberg_export(path)
    assert len(export["delete_files"]) == res["n_delete_files"]
    # the spec's reserved field-ids on the delete parquet
    import pyarrow.parquet as papq

    sch = papq.ParquetFile(export["delete_files"][0]["path"]).schema_arrow
    assert [
        (f.name, f.metadata[b"PARQUET:field_id"]) for f in sch
    ] == [("file_path", b"2147483546"), ("pos", b"2147483545")]
    # full Iceberg-way read == log fold, rename + MOR applied
    got = sorted(
        tuple(r)
        for r in read_iceberg_export_df(spark, path)
        .select("k", "val", "s")
        .collect()
    )
    assert got == _spark_rows(spark, path, ["k", "val", "s"])
    assert got == [(1, 111, "a"), (3, 30, "a")]
    # DuckDB applies the deletes through file_row_number — the
    # external-engine rendition of the same anti-join
    con = duckdb.connect()
    dpaths = [d["path"] for d in export["delete_files"]]
    dels = set(
        map(tuple, con.execute(
            f"SELECT file_path, pos FROM read_parquet({dpaths!r})"
        ).fetchall())
    )
    survivors = []
    for f in export["files"]:
        rows = con.execute(
            f"SELECT k, file_row_number FROM read_parquet(['{f['path']}'], "
            f"file_row_number=true)"
        ).fetchall()
        for k, pos in rows:
            if ("file://" + f["path"], pos) not in dels:
                survivors.append(k)
    assert sorted(survivors) == [1, 3]
    # the JVM Avro implementation reads the delete manifest too
    jvm = spark._jvm
    md = export["metadata"]
    snap = next(
        s for s in md["snapshots"]
        if s["snapshot-id"] == md["current-snapshot-id"]
    )
    rd = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(snap["manifest-list"].replace("file://", "")),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    contents = []
    while rd.hasNext():
        contents.append(json.loads(str(rd.next()))["content"])
    rd.close()
    assert sorted(contents) == [0, 1]  # data + deletes manifests


def test_on_dv_error_names_both_paths(spark, tmp_path):
    path = _mk(spark, tmp_path)
    tx.delete_from_table(spark, path, "k = 2", mode="mor")
    with pytest.raises(ValueError, match="on_dv='deletes'"):
        export_iceberg_metadata(path)
    with pytest.raises(ValueError, match="'error', 'deletes'"):
        export_iceberg_metadata(path, on_dv="bogus")
