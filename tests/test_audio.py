"""operators/multimodal.py — X56 audio spectral features (real rFFT)."""

from __future__ import annotations

import math

import pytest

from bi_utils_spark.operators.multimodal import (
    _wav_samples,
    audio_spectral_features,
    encode_wav,
)


def _features(spark, payloads):
    df = spark.createDataFrame(
        [(str(i), p) for i, p in enumerate(payloads)],
        "media_id string, payload binary",
    )
    return {r["media_id"]: r for r in audio_spectral_features(df).collect()}


def test_pure_tone_lands_on_its_exact_bin(spark):
    # 10 cycles in 80 samples at 8 kHz -> bin 10, 1000 Hz
    n, rate, cycles = 80, 8000, 10
    samples = [
        int(round(10_000 * math.sin(2 * math.pi * cycles * t / n)))
        for t in range(n)
    ]
    r = _features(spark, [encode_wav(samples, rate)])["0"]
    assert r["n_samples"] == n and r["sample_rate"] == rate
    assert r["dominant_bin"] == cycles
    assert r["peak_freq_hz"] == rate * cycles / n == 1000.0
    assert r["duration_ms"] == 10.0


def test_square_wave_all_energy_at_nyquist_even_and_odd_n(spark):
    for n in (20, 21):
        samples = [300 if t % 2 == 0 else -300 for t in range(n)]
        r = _features(spark, [encode_wav(samples, 12000)])["0"]
        assert r["dominant_bin"] == n // 2
        assert r["rms"] == 300.0
        assert r["zero_crossings"] == n - 1
        assert r["peak_freq_hz"] == 12000 * (n // 2) / n


def test_silence_reports_zeros(spark):
    r = _features(spark, [encode_wav([0] * 32, 8000)])["0"]
    assert r["rms"] == 0.0
    assert r["zero_crossings"] == 0
    assert r["dominant_bin"] == 0 and r["peak_freq_hz"] == 0.0


def test_stereo_is_analyzed_on_channel_mean(spark):
    # L = +a/-a square, R = silence -> mean is a half-amplitude square
    n, a = 24, 400
    inter = []
    for t in range(n):
        inter += [a if t % 2 == 0 else -a, 0]
    r = _features(spark, [encode_wav(inter, 16000, num_channels=2)])["0"]
    assert r["n_samples"] == n
    assert r["rms"] == a / 2
    assert r["dominant_bin"] == n // 2


def test_dc_offset_signal_dominates_bin_zero(spark):
    r = _features(spark, [encode_wav([500] * 16, 8000)])["0"]
    assert r["dominant_bin"] == 0 and r["peak_freq_hz"] == 0.0
    assert r["zero_crossings"] == 0 and r["rms"] == 500.0


def test_wav_samples_walks_riff_and_rejects_garbage():
    p = encode_wav([1, -2, 3], 8000)
    assert _wav_samples(p) == [1, -2, 3]
    with pytest.raises(ValueError):
        _wav_samples(b"not a wav")
