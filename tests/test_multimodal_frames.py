"""Real GIF frame sampling (operators/multimodal.sample_frames).

The test ships its own minimal GIF encoder (clear-code-per-pixel LZW —
the classic "uncompressed GIF" trick, decodable by any conformant LZW
reader), so the decoder is exercised against independently constructed
byte streams: multi-frame compositing, transparency, restore-to-
background disposal, interlacing, local palettes, and the corrupt-row
degradation contract.
"""

from __future__ import annotations

import numpy as np

from cdc_example_spark.operators.multimodal import (
    _decode_gif_frames,
    sample_frames,
)


# ---------------------------------------------------------------------------
# minimal GIF writer
# ---------------------------------------------------------------------------


def _lzw_encode(min_code_size: int, indices: list[int]) -> bytes:
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    code_size = min_code_size + 1
    out = bytearray()
    acc = nbits = 0

    def put(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    put(clear)
    for px in indices:
        put(px)
        put(clear)  # table never grows → fixed code width
    put(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _gif(
    w: int,
    h: int,
    palette: list[tuple[int, int, int]],
    frames: list[dict],
    bg: int = 0,
) -> bytes:
    """frames: dicts with keys indices (row-major list), and optional
    x,y,w,h, interlace, transparent, disposal."""
    size_bits = max((len(palette) - 1).bit_length(), 1) - 1
    n_entries = 2 << size_bits
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out.append(0x80 | (7 << 4) | size_bits)  # GCT present, 8-bit res
    out.append(bg)
    out.append(0)  # aspect
    for i in range(n_entries):
        r, g, b = palette[i] if i < len(palette) else (0, 0, 0)
        out += bytes((r, g, b))
    min_code = max(2, size_bits + 1)
    for f in frames:
        fx, fy = f.get("x", 0), f.get("y", 0)
        fw, fh = f.get("w", w), f.get("h", h)
        if "transparent" in f or "disposal" in f:
            flags = (f.get("disposal", 0) & 0x07) << 2
            tr = f.get("transparent")
            if tr is not None:
                flags |= 0x01
            out += bytes((0x21, 0xF9, 0x04, flags, 0, 0, tr or 0, 0x00))
        out.append(0x2C)
        out += fx.to_bytes(2, "little") + fy.to_bytes(2, "little")
        out += fw.to_bytes(2, "little") + fh.to_bytes(2, "little")
        out.append(0x40 if f.get("interlace") else 0x00)
        out.append(min_code)
        out += _sub_blocks(_lzw_encode(min_code, f["indices"]))
    out.append(0x3B)
    return bytes(out)


def _gray(palette: list[tuple[int, int, int]]) -> list[int]:
    return [(r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16 for r, g, b in palette]


PAL = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (255, 255, 255)]
G = _gray(PAL)


def test_multiframe_composite_transparency_and_disposal():
    # frame 0: full rect, all color 1. frame 1: 2×2 patch at (1,1) of
    # color 2 with color-0 transparent holes, disposal=2 (restore).
    # frame 2: full rect color 3 — must NOT show frame 1 remnants.
    f0 = {"indices": [1] * 12}
    f1 = {
        "x": 1, "y": 1, "w": 2, "h": 2,
        "indices": [2, 0, 0, 2],
        "transparent": 0,
        "disposal": 2,
    }
    f2 = {"indices": [3] * 12}
    payload = _gif(4, 3, PAL, [f0, f1, f2])
    w, h, frames = _decode_gif_frames(payload)
    assert (w, h, len(frames)) == (4, 3, 3)
    a0 = np.frombuffer(frames[0], np.uint8).reshape(3, 4)
    assert (a0 == G[1]).all()
    a1 = np.frombuffer(frames[1], np.uint8).reshape(3, 4)
    # opaque patch pixels overwrite; transparent holes keep frame-0 color
    assert a1[1, 1] == G[2] and a1[2, 2] == G[2]
    assert a1[1, 2] == G[1] and a1[2, 1] == G[1]
    # disposal=2 restored the patch rect to background before frame 2
    a2 = np.frombuffer(frames[2], np.uint8).reshape(3, 4)
    assert (a2 == G[3]).all()


def test_interlaced_rows_are_reordered():
    # 2×8, row r filled with palette index r%4; rows stored in the GIF
    # interlace pass order 0,8.. / 4.. / 2,6.. / 1,3,..
    natural = [[r % 4] * 2 for r in range(8)]
    order = [0, 4, 2, 6, 1, 3, 5, 7]
    stored = [px for r in order for px in natural[r]]
    payload = _gif(2, 8, PAL, [{"indices": stored, "interlace": True}])
    w, h, frames = _decode_gif_frames(payload)
    a = np.frombuffer(frames[0], np.uint8).reshape(8, 2)
    for r in range(8):
        assert (a[r] == G[r % 4]).all(), r


def test_gif_roundtrip_property():
    # encode→decode equality under random dimensions / palettes /
    # frame counts (full-rect opaque frames: composite == frame).
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        w=st.integers(1, 9),
        h=st.integers(1, 7),
        n_colors=st.integers(2, 8),
        data=st.data(),
    )
    def check(w, h, n_colors, data):
        rng_pal = data.draw(
            st.lists(
                st.tuples(*[st.integers(0, 255)] * 3),
                min_size=n_colors,
                max_size=n_colors,
            )
        )
        n_frames = data.draw(st.integers(1, 4))
        frame_px = [
            data.draw(
                st.lists(
                    st.integers(0, n_colors - 1), min_size=w * h, max_size=w * h
                )
            )
            for _ in range(n_frames)
        ]
        payload = _gif(w, h, rng_pal, [{"indices": px} for px in frame_px])
        gw, gh, frames = _decode_gif_frames(payload)
        assert (gw, gh, len(frames)) == (w, h, n_frames)
        g = _gray(rng_pal)
        for px, frame in zip(frame_px, frames):
            assert list(frame) == [g[i] for i in px]

    check()


def test_sample_frames_spark_plumbing(spark):
    five = _gif(4, 3, PAL, [{"indices": [i % 4] * 12} for i in range(5)])
    rows = [(1, bytearray(five)), (2, bytearray(b"not a gif"))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = sample_frames(df, n_frames=3).collect()
    good = sorted(
        (r.frame_idx for r in out if r.media_id == 1 and r.ok), key=int
    )
    # endpoints included, evenly spaced: round(i·4/2) → 0, 2, 4
    assert good == [0, 2, 4]
    for r in out:
        if r.media_id == 1:
            assert r.ok and (r.width, r.height, r.n_frames_total) == (4, 3, 5)
            assert len(bytes(r.frame)) == 12
            assert bytes(r.frame) == bytes([G[r.frame_idx % 4]] * 12)
    bad = [r for r in out if r.media_id == 2]
    assert len(bad) == 1 and not bad[0].ok and bad[0].frame_idx == -1
