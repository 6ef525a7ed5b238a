"""Real APNG frame sampling (operators/multimodal._decode_apng_frames).

Mirrors the GIF suite's discipline: the test ships its own minimal
APNG encoder (stdlib zlib + hand-built chunks with real CRCs, filter
types chosen per row), so the decoder is exercised against
independently constructed byte streams — multi-frame compositing,
region offsets, blend-over alpha, all three dispose ops, palette+tRNS,
gray+alpha, every scanline filter, and the corrupt-row degradation
contract.
"""

from __future__ import annotations

import zlib

import numpy as np

from cdc_example_spark.operators.multimodal import (
    _decode_apng_frames,
    sample_frames,
)

# ---------------------------------------------------------------------------
# minimal APNG writer
# ---------------------------------------------------------------------------


def _chunk(typ: bytes, data: bytes) -> bytes:
    crc = zlib.crc32(typ + data) & 0xFFFFFFFF
    return len(data).to_bytes(4, "big") + typ + data + crc.to_bytes(4, "big")


def _filter_rows(pix: np.ndarray, channels: int, ftypes: "list[int]") -> bytes:
    """Apply PNG filters per row (inverse of the decoder's unfilter)."""
    h, stride = pix.shape
    out = bytearray()
    prev = np.zeros(stride, np.int64)
    for y in range(h):
        cur = pix[y].astype(np.int64)
        ft = ftypes[y % len(ftypes)]
        line = np.empty(stride, np.int64)
        for x in range(stride):
            a = int(cur[x - channels]) if x >= channels else 0
            b = int(prev[x])
            c = int(prev[x - channels]) if x >= channels else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            line[x] = (int(cur[x]) - pred) & 0xFF
        out.append(ft)
        out += line.astype(np.uint8).tobytes()
        prev = cur
    return bytes(out)


def _apng(
    w: int,
    h: int,
    ctype: int,
    frames: "list[dict]",
    plte: "bytes | None" = None,
    trns: "bytes | None" = None,
    ftypes: "list[int] | None" = None,
) -> bytes:
    """frames: dicts with pix ((fh, fw·ch) uint8), optional x, y,
    dispose, blend. Frame 0 is the default image (IDAT, fcTL first)."""
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    ftypes = ftypes or [0]
    out = bytearray(b"\x89PNG\r\n\x1a\n")
    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([8, ctype, 0, 0, 0])
    )
    out += _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    if trns is not None:
        out += _chunk(b"tRNS", trns)
    out += _chunk(b"acTL", len(frames).to_bytes(4, "big") + (0).to_bytes(4, "big"))
    seq = 0
    for i, fr in enumerate(frames):
        pix = fr["pix"]
        fh, stride = pix.shape
        fw = stride // channels
        fctl = (
            seq.to_bytes(4, "big")
            + fw.to_bytes(4, "big")
            + fh.to_bytes(4, "big")
            + fr.get("x", 0).to_bytes(4, "big")
            + fr.get("y", 0).to_bytes(4, "big")
            + (1).to_bytes(2, "big")  # delay_num
            + (10).to_bytes(2, "big")  # delay_den
            + bytes([fr.get("dispose", 0), fr.get("blend", 0)])
        )
        out += _chunk(b"fcTL", fctl)
        seq += 1
        z = zlib.compress(_filter_rows(pix, channels, ftypes))
        if i == 0:
            out += _chunk(b"IDAT", z)
        else:
            out += _chunk(b"fdAT", seq.to_bytes(4, "big") + z)
            seq += 1
    out += _chunk(b"IEND", b"")
    return bytes(out)


def _gray601(rgb: np.ndarray, a: np.ndarray) -> np.ndarray:
    rgbE = (rgb.astype(np.uint32) * a[..., None].astype(np.uint32) + 127) // 255
    return (
        (rgbE[..., 0] * 19595 + rgbE[..., 1] * 38470 + rgbE[..., 2] * 7471 + 0x8000)
        >> 16
    ).astype(np.uint8)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def test_plain_png_is_single_frame():
    rgb = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(6, 4 * 3)
    payload = _apng(4, 6, 2, [{"pix": rgb}], ftypes=[0, 1, 2, 3, 4])
    w, h, frames = _decode_apng_frames(payload)
    assert (w, h, len(frames)) == (4, 6, 1)
    expect = _gray601(rgb.reshape(6, 4, 3), np.full((6, 4), 255, np.uint8))
    assert frames[0] == expect.tobytes()


def test_region_offsets_blend_over_and_dispose_ops():
    # frame 0: full RGBA base; frame 1: replace a region; frame 2:
    # alpha-over a region with dispose=previous; frame 3 must composite
    # against the PRE-frame-2 canvas.
    rng = np.random.default_rng(5)
    base = rng.integers(0, 256, (8, 8, 4), dtype=np.uint8)
    base[..., 3] = 255
    f1 = rng.integers(0, 256, (3, 2, 4), dtype=np.uint8)
    f1[..., 3] = 255
    f2 = rng.integers(0, 256, (2, 4, 4), dtype=np.uint8)
    f2[..., 3] = 128
    f3 = rng.integers(0, 256, (1, 1, 4), dtype=np.uint8)
    f3[..., 3] = 255
    payload = _apng(
        8,
        8,
        6,
        [
            {"pix": base.reshape(8, 32)},
            {"pix": f1.reshape(3, 8), "x": 5, "y": 2, "blend": 0},
            {"pix": f2.reshape(2, 16), "x": 1, "y": 6, "blend": 1, "dispose": 2},
            {"pix": f3.reshape(1, 4), "x": 0, "y": 0, "blend": 0},
        ],
        ftypes=[4, 3, 2, 1, 0],
    )
    w, h, frames = _decode_apng_frames(payload)
    assert (w, h, len(frames)) == (8, 8, 4)

    # replay the composite independently
    canvas = np.zeros((8, 8, 4), np.int64)
    canvas[...] = base
    assert frames[0] == _gray601(canvas[..., :3], canvas[..., 3]).tobytes()
    canvas[2:5, 5:7] = f1
    assert frames[1] == _gray601(canvas[..., :3], canvas[..., 3]).tobytes()
    saved = canvas.copy()
    reg = canvas[6:8, 1:5]
    fa = f2[..., 3:4].astype(np.int64)
    ca = reg[..., 3:4]
    out_a255 = fa * 255 + ca * (255 - fa)
    num = f2[..., :3].astype(np.int64) * (fa * 255) + reg[..., :3] * (ca * (255 - fa))
    reg[..., :3] = np.where(
        out_a255 > 0, (num + out_a255 // 2) // np.maximum(out_a255, 1), 0
    )
    reg[..., 3:4] = (out_a255 + 127) // 255
    assert frames[2] == _gray601(canvas[..., :3], canvas[..., 3]).tobytes()
    canvas = saved  # dispose=previous
    canvas[0:1, 0:1] = f3
    assert frames[3] == _gray601(canvas[..., :3], canvas[..., 3]).tobytes()


def test_palette_trns_and_gray_alpha():
    pal = bytes(range(48))  # 16 entries
    idx = np.arange(20, dtype=np.uint8).reshape(5, 4) % 16
    payload = _apng(4, 5, 3, [{"pix": idx}], plte=pal, trns=bytes([0, 255, 40]))
    w, h, frames = _decode_apng_frames(payload)
    pal_a = np.frombuffer(pal, np.uint8).reshape(16, 3)
    alpha = np.full(16, 255, np.uint8)
    alpha[:3] = [0, 255, 40]
    expect = _gray601(pal_a[idx], alpha[idx])
    assert frames[0] == expect.tobytes()

    ga = np.arange(24, dtype=np.uint8).reshape(4, 6) * 10
    payload = _apng(3, 4, 4, [{"pix": ga}], ftypes=[1, 4])
    w, h, frames = _decode_apng_frames(payload)
    gaa = ga.reshape(4, 3, 2)
    g = gaa[..., 0]
    expect = _gray601(np.dstack([g, g, g]), gaa[..., 1])
    assert frames[0] == expect.tobytes()


def test_apng_roundtrip_property():
    # random frames, palettes, offsets, blend/dispose, filters — the
    # decoder must match an independent numpy replay for every frame.
    rng = np.random.default_rng(17)
    for trial in range(8):
        w, h = int(rng.integers(3, 10)), int(rng.integers(3, 10))
        n = int(rng.integers(1, 5))
        frames, replay = [], []
        for i in range(n):
            if i == 0:
                fw, fh, x, y = w, h, 0, 0
            else:
                fw = int(rng.integers(1, w + 1))
                fh = int(rng.integers(1, h + 1))
                x = int(rng.integers(0, w - fw + 1))
                y = int(rng.integers(0, h - fh + 1))
            pix = rng.integers(0, 256, (fh, fw, 4), dtype=np.uint8)
            blend = int(rng.integers(0, 2)) if i else 0
            dispose = int(rng.integers(0, 3)) if i else 0
            frames.append(
                {"pix": pix.reshape(fh, fw * 4), "x": x, "y": y,
                 "blend": blend, "dispose": dispose}
            )
            replay.append((pix, x, y, fw, fh, blend, dispose))
        payload = _apng(w, h, 6, frames, ftypes=list(rng.integers(0, 5, 3)))
        _, _, got = _decode_apng_frames(payload)
        canvas = np.zeros((h, w, 4), np.int64)
        for i, (pix, x, y, fw, fh, blend, dispose) in enumerate(replay):
            saved = canvas.copy() if dispose == 2 else None
            reg = canvas[y : y + fh, x : x + fw]
            if blend == 1:
                fa = pix[..., 3:4].astype(np.int64)
                ca = reg[..., 3:4]
                oa = fa * 255 + ca * (255 - fa)
                num = pix[..., :3].astype(np.int64) * (fa * 255) + reg[..., :3] * (
                    ca * (255 - fa)
                )
                reg[..., :3] = np.where(oa > 0, (num + oa // 2) // np.maximum(oa, 1), 0)
                reg[..., 3:4] = (oa + 127) // 255
            else:
                reg[...] = pix
            assert got[i] == _gray601(canvas[..., :3], canvas[..., 3]).tobytes(), (
                trial,
                i,
            )
            if dispose == 1:
                canvas[y : y + fh, x : x + fw] = 0
            elif dispose == 2:
                canvas = saved


def test_corrupt_and_unsupported_degrade():
    import pytest

    for bad in (
        b"\x89PNG\r\n\x1a\ngarbage",
        b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", bytes(13)),  # 0×0, depth 0
    ):
        with pytest.raises(Exception):
            _decode_apng_frames(bad)
    # 16-bit depth: declared out of scope
    ihdr = (4).to_bytes(4, "big") + (4).to_bytes(4, "big") + bytes([16, 2, 0, 0, 0])
    with pytest.raises(ValueError):
        _decode_apng_frames(b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr))


def test_sample_frames_mixed_containers(spark):
    """One Spark stage serves GIF and APNG rows side by side; corrupt
    payloads degrade to ok=false without killing the stage."""
    rgb = np.arange(4 * 3 * 3, dtype=np.uint8).reshape(4, 3 * 3)
    png_payload = _apng(3, 4, 2, [{"pix": rgb}])
    from tests.test_multimodal_frames import _gif

    gif_payload = _gif(
        3, 4, [(0, 0, 0), (255, 255, 255)], [{"indices": [0, 1] * 6}]
    )
    df = spark.createDataFrame(
        [(1, bytearray(png_payload)), (2, bytearray(gif_payload)), (3, b"junk")],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in sample_frames(df, n_frames=2).collect()}
    assert rows[1]["ok"] and rows[1]["width"] == 3 and rows[1]["height"] == 4
    assert len(rows[1]["frame"]) == 12
    assert rows[2]["ok"]
    assert rows[3]["ok"] is False
