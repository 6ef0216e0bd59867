"""Shared byte-range split machinery for sync-framed containers.

Both splittable formats in this repo (Avro OCF blocks, the seekable
compressed stream) use the same ownership rule — a task owns every
frame whose 16-byte sync marker STARTS inside its byte range — and
the same chunked forward scan to find its first sync.  The boundary
arithmetic (15-byte carry for markers straddling read windows,
``end``-overshoot cutoffs, skip positions for header syncs) is subtle
enough that two copies would drift; this module is the single
implementation both formats call.
"""

from __future__ import annotations

import os


def byte_range_splits(
    files: list[str], split_bytes: int
) -> list[tuple[str, int, int]]:
    """Cut each file into [start, end) byte ranges of ~split_bytes."""
    splits: list[tuple[str, int, int]] = []
    for f in files:
        size = os.path.getsize(f)
        for s in range(0, max(size, 1), split_bytes):
            splits.append((f, s, min(s + split_bytes, size)))
    return splits


def scan_first_sync(
    fh,
    sync: bytes,
    scan_from: int,
    end: int,
    skip_positions: tuple[int, ...] = (),
    window: int = 64 * 1024,
) -> int | None:
    """File position of the first occurrence of ``sync`` STARTING in
    [scan_from, end), reading forward in ``window``-sized chunks with
    a len(sync)-1 carry (markers straddle read windows), never
    buffering the whole range.  ``skip_positions``: absolute offsets
    whose hits don't count (a stream-header sync is not a frame
    boundary).  Returns None when no owned sync exists."""
    if scan_from >= end:
        return None
    fh.seek(scan_from)
    chunk_base = scan_from
    carry = b""
    remaining = end - scan_from + len(sync) - 1
    while remaining > 0:
        chunk = fh.read(min(window, remaining))
        if not chunk:
            return None
        remaining -= len(chunk)
        buf = carry + chunk
        off = buf.find(sync)
        while off != -1 and chunk_base - len(carry) + off in skip_positions:
            off = buf.find(sync, off + 1)
        if off != -1:
            p = chunk_base - len(carry) + off
            return p if p < end else None
        carry = buf[-(len(sync) - 1):]
        chunk_base += len(chunk)
    return None
