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


# ---------------------------------------------------------------------------
# Lossy block-DCT codec ("bdct") — pure numpy, JPEG-shaped
# ---------------------------------------------------------------------------
# The container has no external image libraries, so the LOSSY clause of the
# round-trip invariant (PSNR >= 40 dB) is exercised by a from-scratch codec:
# 8x8 orthonormal DCT-II per RGB channel (no chroma subsampling — the color
# transform stays exactly invertible, all loss lives in the quantizer),
# the public JPEG luminance quantization table scaled by the standard
# quality law, zigzag coefficient order, zlib entropy stage. Deterministic
# end to end (fixed float expression graph + half-up rounding), so encoded
# bytes are bit-reproducible across runs and the golden digests can pin
# them.  Reference provenance: the reference repo has no image surface at
# all (SURVEY.md §2.7 extension); the table + quality law are from the
# public JPEG spec (ITU T.81 Annex K).

_BDCT_MAGIC = b"BDC1"

# ITU T.81 Annex K.1 luminance table (public), used for all 3 channels.
_QBASE = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int64)

# zigzag scan order for an 8x8 block (row-major index per zigzag position)
_ZIGZAG = np.array(sorted(
    range(64),
    key=lambda i: (
        (i // 8 + i % 8),
        (i % 8 if (i // 8 + i % 8) % 2 else i // 8),
    ),
), dtype=np.int64)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix (D @ D.T = I)."""
    k = np.arange(8, dtype=np.float64)[:, None]
    n = np.arange(8, dtype=np.float64)[None, :]
    D = np.cos((2 * n + 1) * k * np.pi / 16.0) * 0.5
    D[0, :] /= np.sqrt(2.0)
    return D


_DCT = _dct_matrix()


def _quant_matrix(quality: int) -> np.ndarray:
    """JPEG quality law: scale the base table, clamp to [1, 255]."""
    if not (1 <= quality <= 100):
        raise ValueError(f"quality must be in [1, 100], got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((_QBASE * scale + 50) // 100, 1, 255)


def _to_blocks(ch: np.ndarray) -> np.ndarray:
    """(H, W) -> (nby, nbx, 8, 8), H/W multiples of 8."""
    h, w = ch.shape
    return ch.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)


def _from_blocks(b: np.ndarray) -> np.ndarray:
    nby, nbx = b.shape[:2]
    return b.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)


def encode_bdct(pixels: np.ndarray, quality: int = 85) -> bytes:
    """(h, w, 3) uint8 -> lossy block-DCT bytes. Edges replicate-padded to
    8-px multiples (padding discarded on decode); coefficients rounded
    HALF-UP (floor(x+0.5) — deterministic, unlike banker's rounding)."""
    assert pixels.dtype == np.uint8 and pixels.ndim == 3 and pixels.shape[2] == 3
    h, w, _ = pixels.shape
    qm = _quant_matrix(quality).astype(np.float64)
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = np.pad(
        pixels, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge"
    ).astype(np.float64) - 128.0
    planes = []
    for c in range(3):
        blocks = _to_blocks(padded[:, :, c])
        coef = np.einsum("ij,byjk,lk->byil", _DCT, blocks, _DCT)
        q = np.floor(coef / qm + 0.5).astype(np.int16)
        planes.append(q.reshape(-1, 64)[:, _ZIGZAG])
    payload = np.concatenate(planes, axis=0).tobytes()
    return (
        _BDCT_MAGIC
        + struct.pack(">IIB", w, h, quality)
        + zlib.compress(payload, 6)
    )


def bdct_quality(data: bytes) -> int:
    """Read the quality dial back out of an encoded bdct stream."""
    if data[:4] != _BDCT_MAGIC:
        raise ValueError("not a bdct stream")
    return struct.unpack(">IIB", data[4:13])[2]


def decode_bdct(data: bytes) -> np.ndarray:
    """Lossy block-DCT bytes -> (h, w, 3) uint8 (dequantize, inverse DCT,
    clip, crop the 8-px padding)."""
    if data[:4] != _BDCT_MAGIC:
        raise ValueError("not a bdct stream")
    w, h, quality = struct.unpack(">IIB", data[4:13])
    qm = _quant_matrix(quality).astype(np.float64)
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    nblocks = (ph // 8) * (pw // 8)
    flat = np.frombuffer(zlib.decompress(data[13:]), dtype=np.int16)
    if len(flat) != nblocks * 64 * 3:
        raise ValueError("bdct payload size mismatch")
    inv = np.empty_like(_ZIGZAG)
    inv[_ZIGZAG] = np.arange(64)
    out = np.empty((ph, pw, 3), dtype=np.float64)
    per = nblocks * 64
    for c in range(3):
        zz = flat[c * per : (c + 1) * per].reshape(-1, 64)[:, inv]
        coef = zz.reshape(ph // 8, pw // 8, 8, 8).astype(np.float64) * qm
        blocks = np.einsum("ji,byjk,kl->byil", _DCT, coef, _DCT)
        out[:, :, c] = _from_blocks(blocks)
    px = np.clip(np.floor(out + 128.0 + 0.5), 0, 255).astype(np.uint8)
    return px[:h, :w]


def decode_image(data: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    if fmt == "raw":
        return decode_raw(data, w, h)
    if fmt == "png":
        return decode_png(data)
    if fmt == "bdct":
        return decode_bdct(data)
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
                    # round-trip through the row's own format (bdct re-encodes
                    # at the stream's own quality — the LOSSY leg of the gate)
                    if row.fmt == "png":
                        enc = encode_png(px)
                    elif row.fmt == "bdct":
                        enc = encode_bdct(px, bdct_quality(row.bytes))
                    else:
                        enc = encode_raw(px)
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
