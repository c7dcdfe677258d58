"""Tests for the binaryFile media source + real-codec decode path."""

from __future__ import annotations

import pathlib

from bi_utils_spark.operators.multimodal import (
    DecoderRegistry,
    bmp_feature_decoder,
    encode_bmp,
    encode_wav,
    extract_features,
    wav_feature_decoder,
)
from bi_utils_spark.sources.media import read_media_dir


def _write_fixtures(tmp_path: pathlib.Path) -> None:
    rows = [[(10, 20, 30), (40, 50, 60)], [(70, 80, 90), (5, 5, 5)]]
    (tmp_path / "a.bmp").write_bytes(encode_bmp(2, 2, rows))
    (tmp_path / "b.BMP").write_bytes(encode_bmp(1, 1, [[(255, 0, 0)]]))
    (tmp_path / "c.wav").write_bytes(encode_wav([100, -100, 100], 8000))
    (tmp_path / "d.dat").write_bytes(b"opaque")


def test_read_media_dir_modalities(spark, tmp_path):
    _write_fixtures(tmp_path)
    out = {r["media_id"].split("/")[-1]: r for r in read_media_dir(spark, str(tmp_path)).collect()}
    assert out["a.bmp"]["modality"] == "image"
    assert out["b.BMP"]["modality"] == "image"  # extension case-insensitive
    assert out["c.wav"]["modality"] == "audio"
    assert out["d.dat"]["modality"] == "binary"
    assert out["c.wav"]["mime_type"] == "audio/wav"
    assert out["a.bmp"]["length"] == len(bytes(out["a.bmp"]["payload"]))


def test_read_media_dir_glob(spark, tmp_path):
    _write_fixtures(tmp_path)
    only_wav = read_media_dir(spark, str(tmp_path), path_glob="*.wav").collect()
    assert len(only_wav) == 1 and only_wav[0]["modality"] == "audio"


def test_media_dir_end_to_end_decode(spark, tmp_path):
    # the full ingestion story: files on disk -> binaryFile source ->
    # real pure-python decoders -> features
    _write_fixtures(tmp_path)
    DecoderRegistry.register("image", bmp_feature_decoder())
    DecoderRegistry.register("audio", wav_feature_decoder())
    media = read_media_dir(spark, str(tmp_path)).filter(
        "modality in ('image', 'audio')"
    )
    feats = {
        r["media_id"].split("/")[-1]: r["features"]
        for r in extract_features(media).collect()
    }
    assert feats["a.bmp"][0] == 2.0 and feats["a.bmp"][1] == 2.0  # w, h
    assert feats["b.BMP"][2] == 255.0  # mean_r of the single red pixel
    assert feats["c.wav"][0] == 3.0 and feats["c.wav"][1] == 8000.0
