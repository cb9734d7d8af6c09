"""Image payload encode/decode + ops (numpy, no external libs).

Mirrors ``audio_codec.py``'s split between REAL pure-byte-layout codecs
and import-try stubs for formats that need native libraries:

- **PPM (P6)** — REAL: netpbm binary RGB, trivial header + raw pixels.
- **BMP (24-bit BI_RGB)** — REAL: BITMAPFILEHEADER + BITMAPINFOHEADER,
  bottom-up BGR rows padded to 4 bytes.
- **PNG/JPEG** — decode via PIL *if present* (it is not in this
  container); otherwise a clear ValueError. The Spark-side plumbing in
  ``pipeline/multimodal.py`` is identical either way.

Also real ops over decoded ndarrays: nearest-neighbor resize and a
luminance grid feature (mean-pooled grayscale), both deterministic.
"""

from __future__ import annotations

import struct

import numpy as np

_BMP_FILE_HDR = struct.Struct("<2sIHHI")      # magic, size, res1, res2, data offset
_BMP_INFO_HDR = struct.Struct("<IiiHHIIiiII")  # 40-byte BITMAPINFOHEADER


# ---------------------------------------------------------------------------
# PPM (P6)
# ---------------------------------------------------------------------------

def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary PPM (P6, maxval 255)."""
    h, w, c = img.shape
    if c != 3:
        raise ValueError("PPM encoder needs (h, w, 3) RGB")
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(img, dtype=np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) -> (h, w, 3) uint8. ValueError on any corruption."""
    if payload is None or not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header = magic, width, height, maxval as whitespace-separated tokens
    # (comments '#...' allowed per spec); pixel data starts after the single
    # whitespace byte that follows maxval
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        fields.append(payload[start:pos])
    pos += 1  # single whitespace after maxval
    try:
        w, h, maxval = int(fields[0]), int(fields[1]), int(fields[2])
    except ValueError:
        raise ValueError("malformed PPM header") from None
    if maxval != 255 or w <= 0 or h <= 0:
        raise ValueError(f"unsupported PPM (maxval={maxval}, {w}x{h})")
    need = w * h * 3
    if len(payload) - pos < need:
        raise ValueError("truncated PPM pixel data")
    return np.frombuffer(payload, dtype=np.uint8, count=need, offset=pos).reshape(h, w, 3)


# ---------------------------------------------------------------------------
# BMP (24-bit uncompressed)
# ---------------------------------------------------------------------------

def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit BI_RGB BMP (bottom-up, BGR, padded rows)."""
    h, w, c = img.shape
    if c != 3:
        raise ValueError("BMP encoder needs (h, w, 3) RGB")
    row_bytes = (w * 3 + 3) & ~3
    pix = bytearray(row_bytes * h)
    bgr = np.ascontiguousarray(img[::-1, :, ::-1], dtype=np.uint8)  # bottom-up, BGR
    for r in range(h):
        pix[r * row_bytes:r * row_bytes + w * 3] = bgr[r].tobytes()
    data_off = _BMP_FILE_HDR.size + _BMP_INFO_HDR.size
    info = _BMP_INFO_HDR.pack(40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0)
    head = _BMP_FILE_HDR.pack(b"BM", data_off + len(pix), 0, 0, data_off)
    return head + info + bytes(pix)


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP -> (h, w, 3) uint8 RGB. ValueError on corruption."""
    if payload is None or len(payload) < _BMP_FILE_HDR.size + _BMP_INFO_HDR.size:
        raise ValueError("payload too short for BMP headers")
    magic, _sz, _r1, _r2, data_off = _BMP_FILE_HDR.unpack_from(payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    (hdr_sz, w, h, _planes, bpp, comp, _isz, _xp, _yp, _cu, _ci) = _BMP_INFO_HDR.unpack_from(
        payload, _BMP_FILE_HDR.size
    )
    if hdr_sz < 40 or bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (hdr={hdr_sz}, bpp={bpp}, comp={comp})")
    bottom_up = h > 0
    h = abs(h)
    if w <= 0 or h <= 0:
        raise ValueError("bad BMP dimensions")
    row_bytes = (w * 3 + 3) & ~3
    if data_off + row_bytes * h > len(payload):
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_bytes * h, offset=data_off
    ).reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]
    return rgb[::-1] if bottom_up else rgb


# ---------------------------------------------------------------------------
# dispatch + stubbed compressed formats
# ---------------------------------------------------------------------------

def decode_image(payload: bytes) -> np.ndarray:
    """Sniff-and-decode -> (h, w, 3) uint8 RGB.

    PPM/BMP are decoded for real; PNG/JPEG magic falls through to PIL if
    installed (not in this container) else a clear ValueError; anything
    else is undecodable. Never crashes the task — callers map ValueError
    to decode_ok=False rows (same policy as the audio decode gate).
    """
    if payload is None or len(payload) < 2:
        raise ValueError("empty payload")
    if payload.startswith(b"P6"):
        return decode_ppm(payload)
    if payload.startswith(b"BM"):
        return decode_bmp(payload)
    if payload.startswith(b"\x89PNG") or payload.startswith(b"\xff\xd8"):
        try:
            import io

            from PIL import Image  # not in this container; real deployments have it
        except ImportError:
            raise ValueError("png/jpeg decode needs an imaging lib (not in this environment)") from None
        try:
            return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
        except Exception as exc:  # UnidentifiedImageError/OSError etc.
            # translate to the decode-gate contract: corrupt payloads are
            # ValueError -> decode_ok=False rows, NEVER task failures
            raise ValueError(f"png/jpeg decode failed: {exc}") from None
    raise ValueError("unrecognized image payload")


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize (pure numpy indexing)."""
    h, w = img.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return img[ys][:, xs]


def luminance_feature(img: np.ndarray, grid: int = 4) -> np.ndarray:
    """REAL image feature: Rec.601 luminance, mean-pooled to a grid x grid
    patch vector in [0, 1] — a deterministic, library-free analog of an
    embedding extractor (fixed-dim array<float> contract)."""
    lum = (
        0.299 * img[:, :, 0].astype(np.float32)
        + 0.587 * img[:, :, 1].astype(np.float32)
        + 0.114 * img[:, :, 2].astype(np.float32)
    )
    small = resize_nearest(lum[:, :, None], grid, grid)[:, :, 0]
    return (small / 255.0).astype(np.float32).ravel()
