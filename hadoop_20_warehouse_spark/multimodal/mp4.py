"""ISO-BMFF (MP4, ISO/IEC 14496-12) container metadata — pure struct.

Video DECODE stays honestly gated (no ffmpeg in the container; the
frame payloads in ``frame_sample_stub`` remain digest-derived fakes),
but the CONTAINER is plain big-endian box framing: real duration,
track inventory, and video dimensions parse with ``struct`` alone.
That is the honest middle a 100 TB ingest actually needs first — the
catalog/validate/filter stages run on container metadata (drop
zero-duration clips, route by resolution, bucket by track layout)
long before any codec touches a frame.

- :func:`parse_mp4_meta` — walk the box tree (size/type headers,
  64-bit largesize, version 0/1 full boxes), returning duration_ms
  (mvhd), track count, per-track handler types (vide/soun), the first
  video track's tkhd dimensions (16.16 fixed point), and sample
  counts (stsz).
- :func:`build_mp4` — synthesize a minimal valid ftyp+moov(+mdat)
  file from metadata, so tests and the registered query feed the
  parser REAL container bytes whose expected outputs derive from
  table columns (the encode-side pattern of every codec oracle here).

Reference analog: opaque BytesWritable payload rows
(``src/core/org/apache/hadoop/io/BytesWritable.java``); the parse
runs Arrow-batched per partition via multimodal/binary.py plumbing.
"""

from __future__ import annotations

import struct

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _walk(data: bytes, start: int, end: int):
    """Yield (box_type, body_start, body_end) for sibling boxes in
    [start, end); raises on malformed framing."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        btype = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            body = pos + 16
        elif size == 0:  # box extends to end of file
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError("malformed MP4 box framing")
        yield btype, body, pos + size
        pos += size


def parse_mp4_meta(payload: bytes) -> dict:
    """MP4/ISO-BMFF bytes → container metadata dict:
    ``brand`` (ftyp major), ``duration_ms`` (mvhd, timescale-scaled),
    ``n_tracks``, ``n_video``/``n_audio`` (hdlr handlers),
    ``width``/``height`` (first video track's tkhd, 16.16 fixed →
    integer px; 0 if no video track), ``n_samples`` (sum of stsz
    sample counts across tracks).  Raises ValueError when the bytes
    are not ISO-BMFF (no ftyp) or a box overruns its parent."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF file (missing ftyp)")
    brand = payload[8:12].decode("latin-1")
    out = {
        "brand": brand,
        "duration_ms": 0,
        "n_tracks": 0,
        "n_video": 0,
        "n_audio": 0,
        "width": 0,
        "height": 0,
        "n_samples": 0,
    }

    def full_box(body: bytes):
        version = body[0]
        return version, body[4:]

    def visit(data, start, end):
        for btype, b0, b1 in _walk(data, start, end):
            if btype == b"mvhd":
                version, rest = full_box(data[b0:b1])
                if version == 1:
                    ts, dur = struct.unpack_from(">IQ", rest, 16)
                else:
                    ts, dur = struct.unpack_from(">II", rest, 8)
                if ts:
                    out["duration_ms"] = dur * 1000 // ts
            elif btype == b"trak":
                out["n_tracks"] += 1
                visit(data, b0, b1)
            elif btype == b"tkhd":
                version, rest = full_box(data[b0:b1])
                # pre-width span: times/id/duration (v1 widens three
                # fields) + reserved(8) + layer/alt/volume/res(8) +
                # matrix(36)
                off = 84 if version == 1 else 72
                wfx, hfx = struct.unpack_from(">II", rest, off)
                if wfx and not out["width"]:
                    out["width"] = wfx >> 16
                    out["height"] = hfx >> 16
            elif btype == b"hdlr":
                handler = data[b0 + 8 : b0 + 12]
                if handler == b"vide":
                    out["n_video"] += 1
                elif handler == b"soun":
                    out["n_audio"] += 1
            elif btype == b"stsz":
                _, rest = full_box(data[b0:b1])
                _size, count = struct.unpack_from(">II", rest, 0)
                out["n_samples"] += count
            elif btype in _CONTAINERS:
                visit(data, b0, b1)

    visit(payload, 0, len(payload))
    return out


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + btype + body


def _full(btype: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(btype, struct.pack(">B", version) + flags.to_bytes(3, "big") + body)


def build_mp4(
    duration_ms: int,
    width: int = 0,
    height: int = 0,
    n_audio: int = 0,
    n_samples: int = 0,
    timescale: int = 1000,
    brand: str = "isom",
) -> bytes:
    """A minimal valid ISO-BMFF file: ftyp + moov(mvhd + one vide trak
    when width>0 + ``n_audio`` soun traks) + empty mdat.  Sample
    counts land in the video track's stsz.  Round-trips through
    :func:`parse_mp4_meta` exactly — which is what lets a DuckDB
    oracle check the parser from generating columns."""
    ftyp = _box(b"ftyp", brand.encode("latin-1") + struct.pack(">I", 0) + b"isomiso2")
    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration_ms * timescale // 1000)
        + struct.pack(">IH", 0x00010000, 0x0100) + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24 + struct.pack(">I", 2),
    )
    traks = b""

    def trak(handler: bytes, w: int, h: int, samples: int, tid: int) -> bytes:
        tkhd = _full(
            b"tkhd", 0, 7,
            struct.pack(">IIII", 0, 0, tid, 0)
            + struct.pack(">I", duration_ms * timescale // 1000)
            + b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0x0100, 0)
            + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + struct.pack(">II", w << 16, h << 16),
        )
        hdlr = _full(b"hdlr", 0, 0,
                     struct.pack(">I", 0) + handler + b"\x00" * 12 + b"\x00")
        stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, samples)
                     + b"".join(struct.pack(">I", 1) for _ in range(samples)))
        stbl = _box(b"stbl", stsz)
        minf = _box(b"minf", stbl)
        mdhd = _full(b"mdhd", 0, 0,
                     struct.pack(">IIII", 0, 0, timescale,
                                 duration_ms * timescale // 1000)
                     + struct.pack(">HH", 0x55C4, 0))
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        return _box(b"trak", tkhd + mdia)

    tid = 1
    if width > 0:
        traks += trak(b"vide", width, height, n_samples, tid)
        tid += 1
    for _ in range(n_audio):
        traks += trak(b"soun", 0, 0, 0, tid)
        tid += 1
    moov = _box(b"moov", mvhd + traks)
    mdat = _box(b"mdat", b"")
    return ftyp + moov + mdat
