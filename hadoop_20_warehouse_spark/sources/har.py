"""Hadoop Archives (``har://``) — read AND write, Spark-first.

A Hadoop Archive is a directory holding ``part-*`` files (member
payloads concatenated back-to-back), ``_index`` (one space-separated
line per member, sorted by a 31-based string hash of the member path)
and ``_masterindex`` (a version line, then ``startHash endHash
startPos endPos`` ranges pointing into ``_index`` every N entries —
the level of indirection that makes point lookups cheap).

Reference behavior re-derived from
``src/core/org/apache/hadoop/fs/HarFileSystem.java:48`` (index
grammar, ``getHarHash``, master-index walk, the v2 trick of carrying
URL-encoded ``mtime atime perm owner group`` props in the dir rows'
partName slot) and
``src/tools/org/apache/hadoop/tools/HadoopArchives.java:570-699``
(writer: URL-encoded names, per-map part files, master ranges flushed
every ``numIndexes`` entries).  The byte/line layouts are the format's
definition, not copied code.

Scale posture: ``write_har`` is a per-partition writer (executors
write their own part files; only index METADATA — one short line per
member — travels to the driver, exactly what the reference's single
reducer materializes).  ``read_har_files`` hands each task a batch of
(part, offset, length) slices sorted by part/offset, so reads are
sequential per part file and fan out across executors;
``har_lookup`` reads only the ``_index`` byte ranges whose hash span
covers the target, never the whole index.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from urllib.parse import quote_plus, unquote_plus

from pyspark.sql import DataFrame, SparkSession

VERSION = 2
_DEFAULT_PROPS = (0, 0, 420, "spark", "spark")  # deterministic fixture stats


def har_hash(path: str) -> int:
    """``HarFileSystem.getHarHash``: Java ``String.hashCode`` of the
    member path, masked non-negative."""
    h = 0
    # Java hashes UTF-16 code units: h = 31*h + c for each unit
    for ch in path:
        o = ord(ch)
        if o < 0x10000:
            h = (31 * h + o) & 0xFFFFFFFF
        else:  # surrogate pair, two units
            o -= 0x10000
            h = (31 * h + (0xD800 + (o >> 10))) & 0xFFFFFFFF
            h = (31 * h + (0xDC00 + (o & 0x3FF))) & 0xFFFFFFFF
    return h & 0x7FFFFFFF


def _enc(name: str) -> str:
    # Java URLEncoder.encode: form-encoding, space -> '+'; Python's
    # quote_plus percent-encodes a couple more chars ('*', '~') which
    # URLDecoder decodes identically, so foreign readers are safe
    return quote_plus(name)


def _dec(name: str) -> str:
    return unquote_plus(name)


@dataclass
class HarEntry:
    name: str
    is_dir: bool
    part: str  # "none" for dirs
    start: int
    length: int
    children: list = field(default_factory=list)
    props: str = ""  # decoded "mtime atime perm owner group"


def _format_entry(e: HarEntry) -> str:
    """One _index line, the v2 grammar (writer side of
    ``HarStatus(String)``): files carry props at split 5, dirs carry
    them IN the partName slot with children after the 0 0."""
    props = _enc(e.props) if e.props else _enc(
        " ".join(str(p) for p in _DEFAULT_PROPS)
    )
    if e.is_dir:
        cols = [_enc(e.name), "dir", props, "0", "0"] + [
            _enc(c) for c in e.children
        ]
    else:
        cols = [
            _enc(e.name), "file", e.part, str(e.start),
            str(e.length), props,
        ]
    return " ".join(cols) + " "


def _parse_entry(line: str) -> HarEntry:
    """One _index line -> HarEntry (``HarFileSystem.HarStatus``)."""
    s = line.split(" ")
    name, kind = _dec(s[0]), s[1]
    if kind == "dir":
        props = _dec(s[2]) if s[2] != "none" else ""
        children = [_dec(c) for c in s[5:] if c]
        return HarEntry(name, True, "none", 0, 0, children, props)
    props = _dec(s[5]) if len(s) >= 6 else ""
    return HarEntry(name, False, s[2], int(s[3]), int(s[4]), [], props)


def write_har(
    df: DataFrame,
    name_col: str,
    payload_col: str,
    out_dir: str,
    num_indexes: int = 1000,
) -> int:
    """``df(name string, payload binary)`` -> a Hadoop Archive at
    ``out_dir``.  Member names must be absolute ('/a/b.txt');
    intermediate directories are synthesized with children lists the
    way the archiver's ``writeTopLevelDirs`` does.  Each partition
    writes its own ``part-<idx>`` (payloads back-to-back) and ships
    back only (name, part, start, length) tuples; the driver sorts by
    ``har_hash`` and emits ``_index`` + ``_masterindex`` with a master
    range flushed every ``num_indexes`` entries.  Returns the member
    file count."""
    os.makedirs(out_dir, exist_ok=True)

    def _write_part(idx, rows):
        part = f"part-{idx}"
        pos = 0
        out = []
        fh = None
        for r in rows:
            name, payload = r[0], bytes(r[1])
            if fh is None:
                fh = open(os.path.join(out_dir, part), "wb")
            fh.write(payload)
            out.append((name, part, pos, len(payload)))
            pos += len(payload)
        if fh is not None:
            fh.close()
        return iter(out)

    meta = (
        df.select(name_col, payload_col)
        .rdd.mapPartitionsWithIndex(_write_part)
        .collect()
    )

    entries: dict[str, HarEntry] = {}
    for name, part, start, length in meta:
        if not name.startswith("/") or name.endswith("/"):
            raise ValueError(
                f"har member names must be absolute file paths: {name!r}"
            )
        if name in entries:
            raise ValueError(
                f"duplicate har member name {name!r} — an archive maps "
                "each path to one (part, offset) slice"
            )
        entries[name] = HarEntry(name, False, part, start, length)
    # synthesize the directory tree ('/' included), children = direct
    # entries only, the archiver's top-level-dirs discipline
    for name in list(entries):
        child = name
        while child != "/":
            parent = child.rsplit("/", 1)[0] or "/"
            d = entries.get(parent)
            if d is None:
                d = entries[parent] = HarEntry(parent, True, "none", 0, 0)
            base = child[len(parent):].lstrip("/")
            if base not in d.children:
                d.children.append(base)
            child = parent
    for e in entries.values():
        e.children.sort()

    ordered = sorted(entries.values(), key=lambda e: (har_hash(e.name), e.name))
    index_pos = 0
    master_rows = []
    block_start_pos = 0
    block_start_hash = 0
    written = 0
    last_hash = 0
    with open(os.path.join(out_dir, "_index"), "wb") as idx:
        for e in ordered:
            line = (_format_entry(e) + "\n").encode("utf-8")
            idx.write(line)
            index_pos += len(line)
            last_hash = har_hash(e.name)
            written += 1
            if written >= num_indexes:
                master_rows.append(
                    (block_start_hash, last_hash, block_start_pos, index_pos)
                )
                block_start_hash = last_hash
                block_start_pos = index_pos
                written = 0
    if written > 0:
        master_rows.append(
            (block_start_hash, last_hash, block_start_pos, index_pos)
        )
    with open(os.path.join(out_dir, "_masterindex"), "wb") as ms:
        ms.write(f"{VERSION} \n".encode())
        for sh, eh, sp, ep in master_rows:
            ms.write(f"{sh} {eh} {sp} {ep} \n".encode())
    return len(meta)


def _read_master(har_dir: str) -> list[tuple[int, int, int, int]]:
    with open(os.path.join(har_dir, "_masterindex"), "rb") as fh:
        lines = fh.read().decode("utf-8").splitlines()
    if not lines:
        raise ValueError("empty har _masterindex")
    version = int(lines[0].split(" ")[0])
    if version > VERSION:
        raise ValueError(
            f"har version {version} > supported {VERSION}"
        )
    out = []
    for ln in lines[1:]:
        if not ln.strip():
            continue
        p = ln.split(" ")
        out.append((int(p[0]), int(p[1]), int(p[2]), int(p[3])))
    return out


def read_har_index(har_dir: str) -> list[HarEntry]:
    """Full listing: parse ``_masterindex`` (version gate) then every
    ``_index`` line — what ``listStatus`` does, driver-side metadata
    (one short line per member, same as the reference)."""
    _read_master(har_dir)  # version gate + structure check
    out = []
    with open(os.path.join(har_dir, "_index"), "rb") as fh:
        for ln in fh.read().decode("utf-8").splitlines():
            if ln.strip():
                out.append(_parse_entry(ln.rstrip()))
    return out


def har_lookup(har_dir: str, path: str) -> HarEntry | None:
    """Point lookup via the master index: read ONLY the ``_index``
    byte ranges whose ``[startHash, endHash]`` span covers
    ``har_hash(path)`` (``HarFileSystem.fileStatusInIndex``)."""
    h = har_hash(path)
    stores = [
        (sp, ep) for sh, eh, sp, ep in _read_master(har_dir)
        if sh <= h <= eh
    ]
    with open(os.path.join(har_dir, "_index"), "rb") as fh:
        for sp, ep in stores:
            fh.seek(sp)
            for ln in fh.read(ep - sp).decode("utf-8").splitlines():
                if not ln.strip():
                    continue
                e = _parse_entry(ln.rstrip())
                if e.name == path:
                    return e
    return None


def read_har_files(
    spark: SparkSession, har_dir: str, prefix: str = "/"
) -> DataFrame:
    """Members under ``prefix`` -> DataFrame(name string, payload
    binary).  The index (metadata) picks the slices; the PAYLOAD reads
    are distributed — slices sorted by (part, start) so each task
    streams its part file sequentially, seeking only between its own
    members."""
    entries = [
        e for e in read_har_index(har_dir)
        if not e.is_dir and e.name.startswith(prefix)
    ]
    entries.sort(key=lambda e: (e.part, e.start))
    slices = [(e.name, e.part, e.start, e.length) for e in entries]
    if not slices:
        return spark.createDataFrame([], "name string, payload binary")
    # Balance tasks by BYTES, not member count: archives routinely mix
    # multi-GB members with thousands of tiny ones, and an even
    # count-split would straggle on whichever task drew the big ones.
    # Greedy contiguous chunking keeps each task's reads sequential
    # within its part file while targeting equal byte shares.
    n_tasks = min(len(slices), spark.sparkContext.defaultParallelism)
    total = sum(s[3] for s in slices)
    target = max(1, total // n_tasks)
    groups: list[list] = [[]]
    acc = 0
    for s in slices:
        if acc >= target and len(groups) < n_tasks:
            groups.append([])
            acc = 0
        groups[-1].append(s)
        acc += s[3]

    def _read(group_iter):
        for group in group_iter:
            fh = None
            cur = None
            for name, part, start, length in group:
                if part != cur:
                    if fh is not None:
                        fh.close()
                    fh = open(os.path.join(har_dir, part), "rb")
                    cur = part
                fh.seek(start)
                yield name, bytearray(fh.read(length))
            if fh is not None:
                fh.close()

    rdd = spark.sparkContext.parallelize(groups, len(groups))
    return spark.createDataFrame(
        rdd.mapPartitions(_read), "name string, payload binary"
    )
