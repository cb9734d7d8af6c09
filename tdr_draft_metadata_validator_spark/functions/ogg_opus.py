"""Ogg/Opus container codec — REAL framing, honestly-gated packet decode.

The decode gate's job (reference analog: the UTF-8 gate accepts every
valid input and refuses every invalid one, Lambda.scala:130-153) is to
verify that ``bytes`` really carry the declared format. Until round 6
the ``opus`` label delegated to the RIFF parser — the same optimistic
false-accept shape the FLAC path had before r5 (a mislabeled WAV
payload "decoded" fine). This module closes that: everything at the
CONTAINER level is the real specification, byte for byte —

- **Ogg pages** (RFC 3533): "OggS" capture pattern, version 0,
  continuation/BOS/EOS flags, granule positions, serial + strictly
  sequential page numbers, segment lacing (packets span pages via
  255-lacing continuation), and the Ogg CRC-32 (poly 0x04C11DB7,
  init 0, no reflection, no final xor) verified on EVERY page —
  computed at C speed through zlib via the bit-reflection identity
  (see the CRC section below).
- **OpusHead / OpusTags** (RFC 7845 §5): magic, version 1, channel
  count, pre-skip, input sample rate, output gain, mapping family 0;
  the header's sample rate is what decode returns.

Only the innermost step — turning an Opus *packet* into PCM — needs
libopus (SILK/CELT DSP, not reimplementable here). That step is gated
three ways, never faked silently:

1. ``soundfile`` importable -> REAL full decode via libsndfile/libopus.
2. Packets carry the loudly-marked ``FPCM`` deterministic fake payload
   (``b"FPCM" + u32le n + int16le pcm``) that :func:`encode_ogg_fake_opus`
   writes for sandbox datagen -> PCM reassembled from those packets.
   This is NOT Opus compression and is clearly labeled as the sandbox
   stand-in (the container around it is real and fully verified).
3. Anything else (i.e. real Opus packets, no libopus in the image) ->
   ``ValueError("opus packet decode requires libopus...")`` — an honest
   refusal that surfaces as a violation row, never a silent wrong
   decode.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

OGG_CAPTURE = b"OggS"
_PAGE_HDR = struct.Struct("<4sBBqIIIB")  # capture, ver, type, granule, serial, seq, crc, nsegs
FAKE_PACKET_MAGIC = b"FPCM"  # sandbox stand-in payload marker (see module doc)
_OPUS_HEAD = struct.Struct("<8sBBHIhB")  # magic, ver, ch, pre_skip, rate, gain, mapping
_SAMPLES_PER_PACKET = 960  # 20 ms at 48 kHz — the canonical Opus frame
_MAX_SEGS_PER_PAGE = 255

# -- Ogg CRC-32 (poly 0x04C11DB7, init 0, no reflect, no xorout) -------------
#
# Computed through zlib's C CRC engine via the bit-reflection identity:
# a non-reflected CRC with poly P equals the bit-reversed reflected CRC
# (poly = bitrev(P) = 0xEDB88320, zlib's polynomial) of the byte-wise
# bit-reversed message. zlib.crc32(d, v) applies ~pre/~post conditioning
# around the raw reflected update, so the raw update from state 0 is
# ~zlib.crc32(d, 0xFFFFFFFF). Equivalence with the table-driven
# definition is pinned in tests (r7: replaced a vectorized numpy GF(2)
# fold that cost ~0.9 ms/clip of pure numpy-call overhead in the decode
# gate with ~0.07 ms/clip of C: translate + zlib.crc32).

_BITREV_BYTES = bytes(int(format(i, "08b")[::-1], 2) for i in range(256))


def _bitrev32(x: int) -> int:
    x = ((x & 0x55555555) << 1) | ((x >> 1) & 0x55555555)
    x = ((x & 0x33333333) << 2) | ((x >> 2) & 0x33333333)
    x = ((x & 0x0F0F0F0F) << 4) | ((x >> 4) & 0x0F0F0F0F)
    x = ((x & 0x00FF00FF) << 8) | ((x >> 8) & 0x00FF00FF)
    return ((x << 16) | (x >> 16)) & 0xFFFFFFFF


def crc32_ogg(data) -> int:
    if isinstance(data, np.ndarray):
        data = data.tobytes()
    rev = bytes(data).translate(_BITREV_BYTES)
    return _bitrev32((~zlib.crc32(rev, 0xFFFFFFFF)) & 0xFFFFFFFF)


def crc32_ogg_many(pages: list) -> np.ndarray:
    """Ogg CRC-32 of each byte string in ``pages`` (uint32 array out).
    Per-page C-speed passes (translate + zlib.crc32); page counts per
    clip are small, so the Python loop is negligible."""
    if not pages:
        return np.zeros(0, dtype=np.uint32)
    return np.array([crc32_ogg(p) for p in pages], dtype=np.uint32)


# -- page layer --------------------------------------------------------------

def _lacing(n: int) -> list[int]:
    """Lacing values for a packet of ``n`` bytes: 255-runs + remainder;
    a multiple of 255 ends with an explicit 0 segment (RFC 3533 §5)."""
    segs = [255] * (n // 255)
    segs.append(n % 255)
    return segs


def _emit_page(htype: int, granule: int, serial: int, seq: int,
               segs: list[int], body: bytes) -> bytes:
    hdr0 = _PAGE_HDR.pack(OGG_CAPTURE, 0, htype, granule, serial, seq, 0,
                          len(segs)) + bytes(segs)
    crc = crc32_ogg(hdr0 + body)
    return (_PAGE_HDR.pack(OGG_CAPTURE, 0, htype, granule, serial, seq, crc,
                           len(segs))
            + bytes(segs) + body)


def _paginate(packets: list[tuple[bytes, int]],
              first_seq: int) -> list[bytes]:
    """Packets (data, granule_after) -> pages. Packets longer than the
    page's remaining segment budget CONTINUE onto the next page (flag
    0x01), exactly per spec; granule of a page = granule after the last
    packet that COMPLETES on it (-1 if none completes)."""
    pages = []
    seq = first_seq
    cur_segs: list[int] = []
    cur_body = bytearray()
    cur_granule = -1
    cur_continued = False

    def flush():
        nonlocal cur_segs, cur_body, cur_granule, cur_continued, seq
        htype = 0x01 if cur_continued else 0
        pages.append((htype, cur_granule, seq, list(cur_segs), bytes(cur_body)))
        seq += 1
        cur_segs, cur_body, cur_granule = [], bytearray(), -1
        cur_continued = False

    for data, granule_after in packets:
        segs = _lacing(len(data))
        off = 0
        while segs:
            room = _MAX_SEGS_PER_PAGE - len(cur_segs)
            take = segs[:room]
            nbytes = sum(take)
            cur_segs.extend(take)
            cur_body += data[off:off + nbytes]
            off += nbytes
            segs = segs[room:]
            if segs:  # packet spills over: close page, continue on next
                flush()
                cur_continued = True
            else:
                cur_granule = granule_after
        if len(cur_segs) >= _MAX_SEGS_PER_PAGE:
            flush()
    if cur_segs:
        flush()
    return [(h, g, s, sg, b) for h, g, s, sg, b in pages]


def _render_pages(raw_pages, serial, bos_first, eos_last) -> bytes:
    out = []
    last = len(raw_pages) - 1
    for i, (htype, granule, seq, segs, body) in enumerate(raw_pages):
        if i == 0 and bos_first:
            htype |= 0x02
        if i == last and eos_last:
            htype |= 0x04
        out.append(_emit_page(htype, granule, serial, seq, segs, body))
    return b"".join(out)


# -- Opus stream layer -------------------------------------------------------

def encode_ogg_fake_opus(samples: np.ndarray, sr_hz: int,
                         serial: int = 0x5041) -> bytes:
    """Real Ogg/Opus container (spec pages + OpusHead/OpusTags) around
    the documented ``FPCM`` deterministic fake packet payload — the
    sandbox stand-in for libopus (module doc, gate 2). Container-level
    checks (CRC, lacing, headers, sequence) exercise the REAL format."""
    x = np.asarray(samples, dtype=np.int16)
    head = _OPUS_HEAD.pack(b"OpusHead", 1, 1, 0, sr_hz, 0, 0)
    vendor = b"tdr-spark-sandbox"
    tags = b"OpusTags" + struct.pack("<I", len(vendor)) + vendor + struct.pack("<I", 0)
    # header pages: OpusHead alone on the BOS page, OpusTags on its own
    # page, both granule 0 (RFC 7845 §3)
    head_pages = _paginate([(head, 0)], 0)
    tag_pages = _paginate([(tags, 0)], 1)
    audio_packets = []
    total_48k = 0
    for start in range(0, len(x), _SAMPLES_PER_PACKET):
        chunk = x[start:start + _SAMPLES_PER_PACKET]
        total_48k += int(len(chunk) * 48000 // sr_hz)
        audio_packets.append(
            (FAKE_PACKET_MAGIC + struct.pack("<I", len(chunk))
             + chunk.astype("<i2").tobytes(), total_48k)
        )
    if not audio_packets:  # zero-length clip still needs an EOS page
        audio_packets = [(FAKE_PACKET_MAGIC + struct.pack("<I", 0), 0)]
    audio_pages = _paginate(audio_packets, 2)
    # re-sequence audio pages after the two header pages
    audio_pages = [(h, g, 2 + i, sg, b)
                   for i, (h, g, _s, sg, b) in enumerate(audio_pages)]
    return (_render_pages(head_pages, serial, True, False)
            + _render_pages(tag_pages, serial, False, False)
            + _render_pages(audio_pages, serial, False, True))


def _walk_pages(payload: bytes):
    """Parse + verify every Ogg page: capture, version, CRC (vectorized
    across all pages in ONE fold), strictly sequential page numbers on
    one serial. Yields (header_type, granule, segs, body)."""
    if payload is None or len(payload) < _PAGE_HDR.size + 1:
        raise ValueError("payload too short for an Ogg page")
    pages = []
    crc_bufs = []
    crc_declared = []
    off = 0
    serial0 = None
    expect_seq = None
    while off < len(payload):
        if off + _PAGE_HDR.size > len(payload):
            raise ValueError("truncated Ogg page header")
        capture, ver, htype, granule, serial, seq, crc, nsegs = \
            _PAGE_HDR.unpack_from(payload, off)
        if capture != OGG_CAPTURE:
            raise ValueError("bad Ogg capture pattern")
        if ver != 0:
            raise ValueError(f"unsupported Ogg version {ver}")
        seg_off = off + _PAGE_HDR.size
        if seg_off + nsegs > len(payload):
            raise ValueError("truncated Ogg segment table")
        segs = payload[seg_off:seg_off + nsegs]
        body_off = seg_off + nsegs
        body_len = int(np.frombuffer(segs, dtype=np.uint8).sum()) if nsegs else 0
        if body_off + body_len > len(payload):
            raise ValueError("truncated Ogg page body")
        if serial0 is None:
            serial0 = serial
            if not htype & 0x02:
                raise ValueError("first Ogg page is not BOS")
        elif serial != serial0:
            raise ValueError("multiplexed Ogg streams not supported")
        if expect_seq is not None and seq != expect_seq:
            raise ValueError(f"Ogg page sequence gap at {seq}")
        expect_seq = seq + 1
        page_end = body_off + body_len
        # CRC covers the whole page with the crc field zeroed
        zeroed = bytearray(payload[off:page_end])
        zeroed[22:26] = b"\x00\x00\x00\x00"
        crc_bufs.append(bytes(zeroed))
        crc_declared.append(crc & 0xFFFFFFFF)
        pages.append((htype, granule, segs, payload[body_off:page_end]))
        off = page_end
    got = crc32_ogg_many(crc_bufs)
    bad = np.nonzero(got != np.array(crc_declared, dtype=np.uint32))[0]
    if bad.size:
        raise ValueError(f"Ogg page CRC mismatch on page {int(bad[0])}")
    if not pages[-1][0] & 0x04:
        raise ValueError("last Ogg page is not EOS")
    return pages


def _packets_of(pages) -> list[bytes]:
    """Packet reassembly from lacing values. r7: instead of a Python
    loop appending per 255-byte segment, concatenate the page bodies
    once (they are the packet byte stream in page order) and slice at
    the cumulative-lacing boundaries where a lace < 255 ends a packet —
    byte-identical output, ~0 per-segment Python work."""
    laces_per_page = []
    bodies = []
    open_packet = False
    for htype, _granule, segs, body in pages:
        if bool(htype & 0x01) != open_packet:
            raise ValueError("Ogg continuation flag inconsistent with lacing")
        bodies.append(body)
        laces_per_page.append(np.frombuffer(segs, dtype=np.uint8))
        if segs:
            open_packet = segs[-1] == 255
    if open_packet:
        raise ValueError("Ogg stream ends mid-packet")
    blob = b"".join(bodies)
    laces = (np.concatenate(laces_per_page) if laces_per_page
             else np.zeros(0, dtype=np.uint8))
    ends = np.cumsum(laces, dtype=np.int64)
    packets = []
    start = 0
    for i in np.nonzero(laces < 255)[0]:
        e = int(ends[i])
        packets.append(blob[start:e])
        start = e
    return packets


def parse_opus_head(packet: bytes) -> tuple[int, int, int]:
    """OpusHead (RFC 7845 §5.1) -> (channels, pre_skip, input_sample_rate)."""
    if len(packet) < _OPUS_HEAD.size:
        raise ValueError("OpusHead too short")
    magic, ver, ch, pre_skip, rate, _gain, mapping = \
        _OPUS_HEAD.unpack_from(packet, 0)
    if magic != b"OpusHead":
        raise ValueError("first Ogg packet is not OpusHead")
    if ver != 1:
        raise ValueError(f"unsupported OpusHead version {ver}")
    if ch < 1:
        raise ValueError("OpusHead channel count must be >= 1")
    if mapping != 0:
        raise ValueError(f"unsupported channel mapping family {mapping}")
    if rate <= 0:
        raise ValueError(f"invalid OpusHead input sample rate {rate}")
    return ch, pre_skip, rate


def decode_ogg_opus(payload: bytes) -> tuple[int, np.ndarray]:
    """Ogg/Opus -> (sr_hz, int16 samples). Container fully verified
    (every page CRC, lacing, headers, sequencing); packet decode per
    the three-way gate in the module doc."""
    pages = _walk_pages(payload)
    packets = _packets_of(pages)
    if len(packets) < 2:
        raise ValueError("Ogg/Opus stream missing header packets")
    channels, _pre_skip, sr_hz = parse_opus_head(packets[0])
    if not packets[1].startswith(b"OpusTags"):
        raise ValueError("second Ogg packet is not OpusTags")
    audio = packets[2:]
    if all(p.startswith(FAKE_PACKET_MAGIC) for p in audio) and audio:
        # gate 2: the documented sandbox stand-in payload
        if channels != 1:
            raise ValueError("FPCM stand-in payloads are mono")
        parts = []
        for p in audio:
            n = struct.unpack_from("<I", p, 4)[0]
            if len(p) != 8 + 2 * n:
                raise ValueError("FPCM packet length mismatch")
            parts.append(np.frombuffer(p, dtype="<i2", count=n, offset=8))
        return sr_hz, (np.concatenate(parts) if parts
                       else np.zeros(0, np.int16))
    # gate 3: real Opus packets, no libopus in this image (gate 1 — the
    # soundfile path — is taken upstream in audio_codec.DECODERS before
    # this function ever runs)
    raise ValueError(
        "opus packet decode requires libopus (soundfile); not available "
        "in this image — refusing rather than guessing"
    )
