"""Video payload encode/decode — REAL byte-level RIFF/AVI parsing in
numpy, no external libs (the same design as the PPM/BMP image parsers
and the RIFF/WAVE audio parser in this package).

Scope: uncompressed 24-bit DIB ("full frames") AVI — the one video
container a validator can parse from first principles byte-for-byte.
That makes the video path REAL end-to-end: the frame sampler decodes
actual frames with actual pixels (tests assert pixel values round-trip
through encode -> sample -> decode). Compressed codecs (H.264 etc.)
need ffmpeg/pyav; when such a payload arrives the decoder raises
``ValueError`` and the pipeline surfaces decode_ok=False — exactly the
audio/image policy, never a task failure.

Container layout written/read here::

    RIFF <sz> AVI
      LIST <sz> hdrl
        avih <56-byte MainAVIHeader>            (dwMicroSecPerFrame, frames, w, h)
        LIST <sz> strl
          strh <56-byte AVIStreamHeader>        (fccType='vids', handler='DIB ')
          strf <40-byte BITMAPINFOHEADER>       (w, h, 24 bpp, BI_RGB)
      LIST <sz> movi
        00db <sz> <DIB frame: bottom-up BGR rows, 4-byte padded>
        ...

Reference parity note: the reference validator has no video surface;
this exists for the multimodal pipeline ops (SURVEY.md training-data
extensions), replacing round-2's pseudo-frame chunking stub.
"""

from __future__ import annotations

import struct

import numpy as np

_CHUNK = struct.Struct("<4sI")
_AVIH = struct.Struct("<14I")       # 56 bytes
_STRH = struct.Struct("<4s4s10I")   # 56 bytes (fccType, handler, 10 dwords)
_BMIH = struct.Struct("<IiiHHIIiiII")  # 40-byte BITMAPINFOHEADER


def _dib_encode_frame(img: np.ndarray) -> bytes:
    """RGB HxWx3 uint8 -> DIB pixel data (bottom-up BGR, rows padded to 4)."""
    h, w, _ = img.shape
    bgr = img[::-1, :, ::-1]  # bottom-up, RGB->BGR
    row = w * 3
    pad = (-row) % 4
    if pad:
        padded = np.zeros((h, row + pad), dtype=np.uint8)
        padded[:, :row] = bgr.reshape(h, row)
        return padded.tobytes()
    return np.ascontiguousarray(bgr).tobytes()


def _dib_decode_frame(data: bytes, w: int, h: int) -> np.ndarray:
    row = w * 3
    stride = row + ((-row) % 4)
    if len(data) < stride * h:
        raise ValueError("truncated DIB frame")
    arr = np.frombuffer(data, dtype=np.uint8, count=stride * h).reshape(h, stride)
    return arr[:, :row].reshape(h, w, 3)[::-1, :, ::-1].copy()  # -> top-down RGB


def encode_avi(frames: list[np.ndarray], fps: int = 10) -> bytes:
    """Encode HxWx3 uint8 RGB frames as an uncompressed 24-bit DIB AVI."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w, c = frames[0].shape
    if c != 3:
        raise ValueError("frames must be HxWx3 RGB")
    for f in frames:
        if f.shape != (h, w, 3):
            raise ValueError("all frames must share one shape")
    frame_bytes = [_dib_encode_frame(np.asarray(f, dtype=np.uint8)) for f in frames]
    buf_size = max(len(b) for b in frame_bytes)

    avih = _AVIH.pack(
        int(1_000_000 // fps), buf_size * fps, 0, 0x10,  # usec/frame, bytes/sec, pad, HASINDEX-less flags
        len(frames), 0, 1, buf_size, w, h, 0, 0, 0, 0,
    )
    strh = _STRH.pack(
        b"vids", b"DIB ", 0, 0, 0, 1, fps, 0, len(frames), buf_size, 0, 0,
    )
    strf = _BMIH.pack(40, w, h, 1, 24, 0, buf_size, 0, 0, 0, 0)

    def chunk(cid: bytes, body: bytes) -> bytes:
        return _CHUNK.pack(cid, len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def list_chunk(kind: bytes, body: bytes) -> bytes:
        return _CHUNK.pack(b"LIST", len(body) + 4) + kind + body

    strl = list_chunk(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = list_chunk(b"hdrl", chunk(b"avih", avih) + strl)
    movi = list_chunk(b"movi", b"".join(chunk(b"00db", fb) for fb in frame_bytes))
    body = b"AVI " + hdrl + movi
    return _CHUNK.pack(b"RIFF", len(body)) + body


def decode_avi(payload: bytes) -> tuple[int, list[np.ndarray]]:
    """Parse an uncompressed DIB AVI -> (fps, [HxWx3 uint8 RGB frames]).

    Raises ``ValueError`` on structural corruption or a compressed codec
    (anything the BITMAPINFOHEADER marks non-BI_RGB / non-24bpp) — the
    decode gate turns that into decode_ok=False, never a crash.
    """
    if payload is None or len(payload) < 24:
        raise ValueError("payload too short for RIFF header")
    magic, _sz = _CHUNK.unpack_from(payload, 0)
    if magic != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")

    w = h = None
    usec_per_frame = 100_000
    frames: list[np.ndarray] = []

    # explicit stack, NOT recursion: a crafted payload of thousands of
    # nested LIST chunks would blow the Python recursion limit, and
    # RecursionError is not the ValueError the decode contract promises
    stack: list[tuple[int, int]] = [(12, len(payload))]
    while stack:
        off, end = stack.pop()
        while off + _CHUNK.size <= end:
            cid, csize = _CHUNK.unpack_from(payload, off)
            body = off + _CHUNK.size
            if body + csize > len(payload):
                raise ValueError("truncated chunk")
            if cid == b"LIST":
                # resume THIS level after the list, then descend (skip the
                # 4-byte list kind)
                stack.append((body + csize + (csize & 1), end))
                end = body + csize
                off = body + 4
                continue
            if cid == b"avih":
                if csize < 56:
                    raise ValueError("truncated avih")
                vals = _AVIH.unpack_from(payload, body)
                usec_per_frame = vals[0] or usec_per_frame
            elif cid == b"strf":
                if csize < 40:
                    raise ValueError("truncated strf")
                (_hsz, bw, bh, _planes, bpp, compression, *_rest) = _BMIH.unpack_from(
                    payload, body
                )
                if compression != 0 or bpp != 24:
                    raise ValueError(
                        f"unsupported video codec (bpp={bpp}, compression={compression}); "
                        "only uncompressed 24-bit DIB is parseable without ffmpeg"
                    )
                w, h = int(bw), abs(int(bh))
            elif cid in (b"00db", b"00dc"):
                if w is None:
                    raise ValueError("frame chunk before strf header")
                frames.append(_dib_decode_frame(payload[body:body + csize], w, h))
            off = body + csize + (csize & 1)
    if not frames:
        raise ValueError("no frame chunks found")
    fps = max(1, round(1_000_000 / usec_per_frame))
    return fps, frames
