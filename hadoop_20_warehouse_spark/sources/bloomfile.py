"""Real-format BloomMapFile interop — the ``bloom`` side file.

A BloomMapFile (reference ``src/core/org/apache/hadoop/io/
BloomMapFile.java:47``) is a MapFile plus a ``bloom`` file holding a
serialized DynamicBloomFilter over the key wire bytes; readers consult
it to skip ``get`` calls for keys that cannot be present.  Wire layout
re-derived from the reference sources (the numbers are the format's
definition, not copied code):

- Filter header (``util/bloom/Filter.java:193``): BE int VERSION
  (-1), int nbHash, byte hashType, int vectorSize.
- BloomFilter (``util/bloom/BloomFilter.java``): header + ceil(v/8)
  bytes, bits packed LSB-first within each byte.
- DynamicBloomFilter (``util/bloom/DynamicBloomFilter.java``): header
  + int nr (keys per row) + int currentNbRecord + int rowCount + that
  many BloomFilters; a key is maybe-present if ANY row contains all
  its bits.
- Hash positions (``util/bloom/HashFunction.java``): chained
  ``initval = murmur(key, initval)``; position i =
  ``abs(initval % vectorSize)`` with Java int semantics.
- MurmurHash 2 (``util/hash/MurmurHash.java``): 32-bit, signed-byte
  tail mixing — replicated bit-exactly (JVM parity pytest-pinned).

The writer follows Hadoop's CURRENT BloomMapFile key discipline
(exact key wire bytes).  The 0.20 reference hashed the whole
DataOutputBuffer backing array — capacity, not length — making its
bloom bits depend on buffer growth history; Hadoop fixed this
(byteArrayForBloomKey), and Spark's bundled hadoop-common carries the
fix, which is the interop target here.

Membership is probabilistic (false positives only); every serving
path therefore uses the bloom as a GATE in front of the exact
MapFile lookup, so results stay deterministic.
"""

from __future__ import annotations

import math
import os
import struct

_M = 0x5BD1E995
_HASH_COUNT = 5  # BloomMapFile.HASH_COUNT
_MURMUR = 1  # Hash.MURMUR_HASH
_VERSION = -1


def _i32(x: int) -> int:
    x &= 0xFFFFFFFF
    return x - 0x100000000 if x >= 0x80000000 else x


def murmur2(data: bytes, seed: int) -> int:
    """Hadoop's MurmurHash 2 (32-bit), Java int semantics including
    SIGNED bytes in the tail mix."""
    length = len(data)
    h = _i32(seed ^ length)
    len_4 = length >> 2
    for i in range(len_4):
        i4 = i << 2
        k = data[i4 + 3] - 256 if data[i4 + 3] > 127 else data[i4 + 3]
        k = _i32(k << 8) | (data[i4 + 2] & 0xFF)
        k = _i32(k << 8) | (data[i4 + 1] & 0xFF)
        k = _i32(k << 8) | (data[i4] & 0xFF)
        k = _i32(k * _M)
        k = _i32(k ^ ((k & 0xFFFFFFFF) >> 24))
        k = _i32(k * _M)
        h = _i32(h * _M)
        h = _i32(h ^ k)
    left = length - (len_4 << 2)
    if left:
        if left >= 3:
            b = data[length - 3]
            h = _i32(h ^ _i32((b - 256 if b > 127 else b) << 16))
        if left >= 2:
            b = data[length - 2]
            h = _i32(h ^ _i32((b - 256 if b > 127 else b) << 8))
        if left >= 1:
            b = data[length - 1]
            h = _i32(h ^ (b - 256 if b > 127 else b))
        h = _i32(h * _M)
    h = _i32(h ^ ((h & 0xFFFFFFFF) >> 13))
    h = _i32(h * _M)
    h = _i32(h ^ ((h & 0xFFFFFFFF) >> 15))
    return h


def bloom_positions(key: bytes, nb_hash: int, vector_size: int) -> list[int]:
    """HashFunction.hash: chained murmur seeds → bit positions."""
    out = []
    initval = 0
    for _ in range(nb_hash):
        initval = murmur2(key, initval)
        # Java: Math.abs(initval % maxValue) — Java's % keeps the
        # DIVIDEND's sign, so the composite is |initval| % maxValue
        # (Python's % alone would fold negatives the other way)
        out.append(abs(initval) % vector_size)
    return out


class DynamicBloom:
    """In-memory DynamicBloomFilter with the reference's add/test
    semantics: rows of ``vector_size`` bits, each covering ``nr``
    keys; a new row opens when the current one is full."""

    def __init__(self, vector_size: int, nb_hash: int = _HASH_COUNT,
                 nr: int = 1024 * 1024):
        self.vector_size = vector_size
        self.nb_hash = nb_hash
        self.nr = nr
        self.current = 0
        self.rows: list[bytearray] = [bytearray((vector_size + 7) // 8)]

    def add(self, key: bytes) -> None:
        if self.current >= self.nr:
            self.rows.append(bytearray((self.vector_size + 7) // 8))
            self.current = 0
        row = self.rows[-1]
        for p in bloom_positions(key, self.nb_hash, self.vector_size):
            row[p >> 3] |= 1 << (p & 7)  # LSB-first packing
        self.current += 1

    def maybe_contains(self, key: bytes) -> bool:
        pos = bloom_positions(key, self.nb_hash, self.vector_size)
        for row in self.rows:
            if all(row[p >> 3] & (1 << (p & 7)) for p in pos):
                return True
        return False

    def to_bytes(self) -> bytes:
        out = bytearray()
        out += struct.pack(">iibi", _VERSION, self.nb_hash, _MURMUR,
                           self.vector_size)
        out += struct.pack(">iii", self.nr, self.current, len(self.rows))
        for row in self.rows:
            out += struct.pack(
                ">iibi", _VERSION, self.nb_hash, _MURMUR, self.vector_size
            )
            out += bytes(row)
        return bytes(out)

    @classmethod
    def from_bytes(cls, blob: bytes) -> "DynamicBloom":
        ver, nb_hash, hash_type, vector_size = struct.unpack_from(
            ">iibi", blob, 0
        )
        if ver != _VERSION:
            raise ValueError(f"unsupported bloom filter version {ver}")
        if hash_type != _MURMUR:
            raise ValueError(
                f"bloom hashType {hash_type} unsupported (only murmur=1; "
                "jenkins-hashed filters need a JVM path)"
            )
        pos = 13
        nr, current, n_rows = struct.unpack_from(">iii", blob, pos)
        pos += 12
        self = cls(vector_size, nb_hash, nr)
        self.current = current
        self.rows = []
        nbytes = (vector_size + 7) // 8
        for _ in range(n_rows):
            rver, rnb, rht, rvs = struct.unpack_from(">iibi", blob, pos)
            if (rver, rnb, rht, rvs) != (ver, nb_hash, hash_type,
                                         vector_size):
                raise ValueError("bloom matrix row header mismatch")
            pos += 13
            self.rows.append(bytearray(blob[pos : pos + nbytes]))
            pos += nbytes
        return self


def bloom_vector_size(num_keys: int, error_rate: float = 0.005,
                      nb_hash: int = _HASH_COUNT) -> int:
    """BloomMapFile.initBloomFilter's sizing formula
    (BloomMapFile.java:154)."""
    return int(math.ceil(
        (-nb_hash * num_keys)
        / math.log(1.0 - error_rate ** (1.0 / nb_hash))
    ))


def write_bloom_file(map_dir: str, key_wire_bytes,
                     num_keys: int = 1024 * 1024,
                     error_rate: float = 0.005) -> DynamicBloom:
    """Build + persist the ``bloom`` side file for a MapFile dir from
    the keys' wire bytes (exact Writable serialization — the fixed
    Hadoop discipline)."""
    bf = DynamicBloom(bloom_vector_size(num_keys, error_rate),
                      nr=num_keys)
    for kb in key_wire_bytes:
        bf.add(bytes(kb))
    with open(os.path.join(map_dir, "bloom"), "wb") as fh:
        fh.write(bf.to_bytes())
    return bf


def read_bloom_file(map_dir: str) -> DynamicBloom:
    with open(os.path.join(map_dir, "bloom"), "rb") as fh:
        return DynamicBloom.from_bytes(fh.read())
