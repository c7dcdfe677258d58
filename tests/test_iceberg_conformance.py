"""Iceberg v2 spec-conformance checklist for the metadata export
(r11 verdict task 3): the DuckDB iceberg extension / pyiceberg cannot
be installed in this offline environment, so this module validates the
exported tree against an explicit enumeration of the table-spec MUST
fields an external reader consumes — independently of the writer: raw
JSON + the Avro OCF reader + parquet footers, never
`read_iceberg_export`'s resolution logic.

Checklist sources (public Apache Iceberg table spec, format v2):
- Table Metadata: required fields for v2 metadata.json
- Snapshots: required snapshot fields incl. summary.operation
- Manifest Lists: manifest_file required fields + their field-ids
- Manifests: manifest_entry/data_file required fields + field-ids,
  and required Avro key/value metadata (schema, partition-spec,
  partition-spec-id, format-version, content)
- Position Delete Files: reserved column field-ids 2147483546/545,
  sorted by (file_path, pos)
"""

from __future__ import annotations

import json
import os

import pytest

from bi_utils_spark.operators import txtable as tx
from bi_utils_spark.operators.avroio import read_ocf_meta
from bi_utils_spark.operators.iceberg import export_iceberg_metadata

# spec: Table Metadata -> v2 required fields
_METADATA_REQUIRED = [
    "format-version",
    "table-uuid",
    "location",
    "last-sequence-number",
    "last-updated-ms",
    "last-column-id",
    "schemas",
    "current-schema-id",
    "partition-specs",
    "default-spec-id",
    "last-partition-id",
    "sort-orders",
    "default-sort-order-id",
]

# spec: Snapshots -> required fields (schema-id optional but emitted)
_SNAPSHOT_REQUIRED = [
    "snapshot-id",
    "sequence-number",
    "timestamp-ms",
    "manifest-list",
    "summary",
]

# spec: Manifest Lists -> manifest_file required fields and their
# assigned field-ids
_MANIFEST_FILE_REQUIRED = {
    "manifest_path": 500,
    "manifest_length": 501,
    "partition_spec_id": 502,
    "content": 517,
    "sequence_number": 515,
    "min_sequence_number": 516,
    "added_snapshot_id": 503,
    "added_files_count": 504,
    "existing_files_count": 505,
    "deleted_files_count": 506,
    "added_rows_count": 512,
    "existing_rows_count": 513,
    "deleted_rows_count": 514,
}

# spec: Manifests -> data_file required fields and their field-ids
_DATA_FILE_REQUIRED = {
    "content": 134,
    "file_path": 100,
    "file_format": 101,
    "partition": 102,
    "record_count": 103,
    "file_size_in_bytes": 104,
}

# spec: Manifests -> required Avro file key/value metadata
_MANIFEST_META_REQUIRED = [
    "schema",
    "schema-id",
    "partition-spec",
    "partition-spec-id",
    "format-version",
    "content",
]


@pytest.fixture(scope="module")
def exported(spark, tmp_path_factory):
    """A deliberately maximal export: partition evolution (two
    specs), a rename (name mapping), MOR deletes (position-delete
    files + content=1 manifests), and a re-export (metadata-log)."""
    path = str(tmp_path_factory.mktemp("conf") / "t")
    df = spark.createDataFrame(
        [(1, 10, "a", "x"), (2, 20, "b", "y"), (3, 30, "a", "y")],
        "k int, v long, s string, c string",
    )
    tx.create_table(df, path, partition_cols=["s"])
    export_iceberg_metadata(path)  # export 1 (single spec)
    tx.repartition_table(path, ["c"])
    tx.append_table(
        spark.createDataFrame(
            [(4, 40, "b", "x"), (5, 50, "a", "z")],
            "k int, v long, s string, c string",
        ),
        path,
    )
    tx.delete_from_table(spark, path, "k in (2, 4)", mode="mor")
    export_iceberg_metadata(path, on_dv="deletes")  # export 2
    meta_dir = os.path.join(path, "_iceberg", "metadata")
    with open(os.path.join(meta_dir, "version-hint.text")) as fh:
        n = int(fh.read().strip())
    with open(os.path.join(meta_dir, f"v{n}.metadata.json")) as fh:
        md = json.load(fh)
    return {"path": path, "md": md, "meta_dir": meta_dir, "hint": n}


def test_metadata_json_must_fields(exported):
    md = exported["md"]
    for key in _METADATA_REQUIRED:
        assert key in md, f"metadata.json missing required {key!r}"
    assert md["format-version"] == 2
    # current ids resolve
    assert any(
        s["schema-id"] == md["current-schema-id"] for s in md["schemas"]
    )
    assert any(
        ps["spec-id"] == md["default-spec-id"]
        for ps in md["partition-specs"]
    )
    assert any(
        so["order-id"] == md["default-sort-order-id"]
        for so in md["sort-orders"]
    )
    # last-* are genuine high-water marks
    assert md["last-column-id"] == max(
        f["id"] for s in md["schemas"] for f in s["fields"]
    )
    assert md["last-partition-id"] == max(
        f["field-id"]
        for ps in md["partition-specs"]
        for f in ps["fields"]
    )
    assert md["last-sequence-number"] >= max(
        s["sequence-number"] for s in md["snapshots"]
    )
    # field-id instability across exports is declared in-band
    assert md["properties"]["bi_utils_spark.field-ids"] == "per-export"


def test_schema_struct_must_fields(exported):
    for s in exported["md"]["schemas"]:
        assert s["type"] == "struct"
        for f in s["fields"]:
            assert set(f) >= {"id", "name", "required", "type"}
        ids = [f["id"] for f in s["fields"]]
        assert len(ids) == len(set(ids))


def test_partition_spec_must_fields(exported):
    md = exported["md"]
    schema_ids = {
        f["id"] for s in md["schemas"] for f in s["fields"]
    }
    for ps in md["partition-specs"]:
        assert "spec-id" in ps
        for f in ps["fields"]:
            assert set(f) >= {"name", "transform", "source-id", "field-id"}
            assert f["transform"] == "identity"
            assert f["source-id"] in schema_ids
            assert f["field-id"] >= 1000


def test_snapshot_must_fields(exported):
    md = exported["md"]
    for s in md["snapshots"]:
        for key in _SNAPSHOT_REQUIRED:
            assert key in s, f"snapshot missing required {key!r}"
        assert "operation" in s["summary"]
        assert s["summary"]["operation"] in (
            "append", "replace", "overwrite", "delete"
        )
        assert os.path.exists(s["manifest-list"].replace("file://", ""))
    assert md["current-snapshot-id"] in {
        s["snapshot-id"] for s in md["snapshots"]
    }
    assert md["refs"]["main"]["snapshot-id"] == md["current-snapshot-id"]


def _avro_field_ids(schema: dict) -> dict[str, int]:
    return {
        f["name"]: f.get("field-id") for f in schema["fields"]
    }


def test_manifest_list_must_fields_and_ids(exported):
    md = exported["md"]
    snap = next(
        s
        for s in md["snapshots"]
        if s["snapshot-id"] == md["current-snapshot-id"]
    )
    meta, schema, rows = read_ocf_meta(
        snap["manifest-list"].replace("file://", "")
    )
    ids = _avro_field_ids(schema)
    for name, fid in _MANIFEST_FILE_REQUIRED.items():
        assert ids.get(name) == fid, f"manifest_file.{name} field-id"
    spec_ids = {ps["spec-id"] for ps in md["partition-specs"]}
    assert rows
    for r in rows:
        assert r["partition_spec_id"] in spec_ids
        assert r["content"] in (0, 1)
        assert r["sequence_number"] <= md["last-sequence-number"]
        assert os.path.exists(r["manifest_path"].replace("file://", ""))
        assert (
            os.path.getsize(r["manifest_path"].replace("file://", ""))
            == r["manifest_length"]
        )


def test_manifest_must_fields_ids_and_file_metadata(exported):
    md = exported["md"]
    snap = next(
        s
        for s in md["snapshots"]
        if s["snapshot-id"] == md["current-snapshot-id"]
    )
    _, _, mlist = read_ocf_meta(snap["manifest-list"].replace("file://", ""))
    specs = {
        ps["spec-id"]: ps["fields"] for ps in md["partition-specs"]
    }
    for mf in mlist:
        meta, schema, rows = read_ocf_meta(
            mf["manifest_path"].replace("file://", "")
        )
        for key in _MANIFEST_META_REQUIRED:
            assert key in meta, f"manifest avro metadata missing {key!r}"
        assert meta["format-version"] == "2"
        assert meta["content"] == (
            "data" if mf["content"] == 0 else "deletes"
        )
        assert int(meta["partition-spec-id"]) == mf["partition_spec_id"]
        # the embedded schema equals the table's current schema
        assert (
            json.loads(meta["schema"])["fields"]
            == md["schemas"][md["current-schema-id"]]["fields"]
        )
        # partition-spec metadata matches the declared spec verbatim
        assert json.loads(meta["partition-spec"]) == specs[
            mf["partition_spec_id"]
        ]
        # entry + data_file field-ids
        entry_ids = _avro_field_ids(schema)
        assert entry_ids["status"] == 0
        assert entry_ids["snapshot_id"] == 1
        assert entry_ids["data_file"] == 2
        assert entry_ids["sequence_number"] == 3
        assert entry_ids["file_sequence_number"] == 4
        data_file = next(
            f for f in schema["fields"] if f["name"] == "data_file"
        )
        df_ids = _avro_field_ids(data_file["type"])
        for name, fid in _DATA_FILE_REQUIRED.items():
            assert df_ids.get(name) == fid, f"data_file.{name} field-id"
        # partition record field-ids match the spec's
        part = next(
            f
            for f in data_file["type"]["fields"]
            if f["name"] == "partition"
        )
        part_ids = _avro_field_ids(part["type"])
        assert part_ids == {
            f["name"]: f["field-id"]
            for f in specs[mf["partition_spec_id"]]
        }
        for r in rows:
            assert r["status"] in (0, 1, 2)
            d = r["data_file"]
            assert d["file_format"] == "PARQUET"
            assert d["record_count"] >= 0
            assert os.path.exists(d["file_path"].replace("file://", ""))


def test_position_delete_files_reserved_ids_and_sort(exported):
    import pyarrow.parquet as pq

    md = exported["md"]
    snap = next(
        s
        for s in md["snapshots"]
        if s["snapshot-id"] == md["current-snapshot-id"]
    )
    _, _, mlist = read_ocf_meta(snap["manifest-list"].replace("file://", ""))
    delete_manifests = [m for m in mlist if m["content"] == 1]
    assert delete_manifests, "fixture must carry position deletes"
    for mf in delete_manifests:
        _, _, rows = read_ocf_meta(mf["manifest_path"].replace("file://", ""))
        for r in rows:
            assert r["data_file"]["content"] == 1
            p = r["data_file"]["file_path"].replace("file://", "")
            sch = pq.read_schema(p)
            by_name = {f.name: f for f in sch}
            assert set(by_name) == {"file_path", "pos"}
            assert (
                by_name["file_path"].metadata[b"PARQUET:field_id"]
                == b"2147483546"
            )
            assert by_name["pos"].metadata[b"PARQUET:field_id"] == b"2147483545"
            tbl = pq.read_table(p)
            pairs = list(
                zip(
                    tbl.column("file_path").to_pylist(),
                    tbl.column("pos").to_pylist(),
                )
            )
            assert pairs == sorted(pairs), "position deletes must sort"
            assert len(pairs) == r["data_file"]["record_count"]


def test_name_mapping_and_metadata_log(exported):
    md = exported["md"]
    mapping = json.loads(md["properties"]["schema.name-mapping.default"])
    schema_fields = md["schemas"][md["current-schema-id"]]["fields"]
    assert {m["field-id"] for m in mapping} == {
        f["id"] for f in schema_fields
    }
    for m in mapping:
        assert m["names"], "every mapping entry needs >=1 physical name"
    # the first export chains via metadata-log
    assert md["metadata-log"], "re-export must carry metadata-log"
    for e in md["metadata-log"]:
        assert os.path.exists(e["metadata-file"].replace("file://", ""))
    assert exported["hint"] == 2
