"""Multimodal columns: opaque binary payloads + typed metadata.

Pattern (BASELINE.json north star; no reference counterpart — the
closest is BytesWritable payload rows, io/BytesWritable.java): media
lives in a ``binary`` column (or object-store pointers), metadata in
typed columns, and decode/feature-extraction runs as Arrow-batched
``mapInPandas`` so bytes never round-trip through Python row-at-a-time.

The actual image/audio decoders are NOT in this container, so
``decode_meta`` extracts real byte-level metadata (length, digest,
magic sniff) and ``decode_image_stub`` derives deterministic fake
dimensions from the digest — clearly marked; swap ``_fake_dims`` for a
PIL/ffmpeg call in production. The Spark-side plumbing (schema,
Arrow batching, partition-parallel UDF) is real and oracle-tested.

Scale notes: mapInPandas streams Arrow record batches; with binary
payloads set ``spark.sql.execution.arrow.maxRecordsPerBatch`` so a
batch of images fits executor memory. Feature extraction is
embarrassingly parallel — no shuffle at all.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_META_SCHEMA = (
    "id long, byte_len long, content_md5 string, width long, height long"
)

try:  # real decoder, absent in this container
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def _fake_dims(digest_hex: str) -> tuple[int, int]:
    """Deterministic stand-in dimensions derived from the content
    digest (md5-hex → ints), so tests and the DuckDB oracle can check
    the full pipeline without a codec."""
    w = int(digest_hex[:15], 16) % 1024 + 1
    h = int(digest_hex[15:30], 16) % 1024 + 1
    return w, h


def decode_image_real(payload: bytes) -> tuple[int, int]:
    """Real decode path — NOT available in this container."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv, not installed here; "
        "decode_meta uses _fake_dims instead"
    )


def decode_meta(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """(id, byte_len, content_md5, width, height) per binary payload
    via Arrow-batched mapInPandas.

    The closure below is deliberately SELF-CONTAINED (local imports,
    no references to this module's globals): cloudpickle then ships it
    by value, so Python workers never need ``hadoop_20_warehouse_spark``
    importable on their own path — the driver may run from any cwd
    without addPyFile/PYTHONPATH setup.
    """
    use_pil = HAVE_PIL

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        for pdf in batches:
            payloads = pdf[bin_col]
            digests = [_hashlib.md5(b).hexdigest() for b in payloads]
            if use_pil:  # pragma: no cover - decoder not in container
                raise NotImplementedError("real decode path not wired in container")
            dims = [
                (int(d[:15], 16) % 1024 + 1, int(d[15:30], 16) % 1024 + 1)
                for d in digests
            ]
            yield _pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "byte_len": [len(b) for b in payloads],
                    "content_md5": digests,
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    from hadoop_20_warehouse_spark.session import scatter

    return scatter(df.select(F.col(id_col), F.col(bin_col))).mapInPandas(
        run, schema=DECODE_META_SCHEMA
    )


RESIZE_SCHEMA = (
    "id long, width long, height long, out_width long, out_height long, "
    "resized_md5 string"
)


def resize_stub(
    df: DataFrame, id_col: str, bin_col: str, box_w: int = 256, box_h: int = 256
) -> DataFrame:
    """Aspect-fit image resize plumbing: (id, width, height, out_width,
    out_height, resized_md5) via Arrow-batched mapInPandas.

    Source dims come from the digest stub (``_fake_dims``); the fit
    math is REAL and **integer-exact** (branch on tw·h ≤ th·w instead
    of comparing float scales, floor-divide for the scaled edge, never
    upscale) so the DuckDB oracle reproduces it bit-for-bit. The
    resized payload is stood in by md5(content_md5 || out_w x out_h) —
    swap the body for a PIL/opencv call in production; the schema,
    batching, and no-shuffle parallelism are the production shape.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        def fit(w: int, h: int) -> tuple[int, int]:
            if w <= box_w and h <= box_h:
                return w, h  # never upscale
            if box_w * h <= box_h * w:  # width is the binding edge
                return box_w, max(1, (h * box_w) // w)
            return max(1, (w * box_h) // h), box_h

        for pdf in batches:
            digests = [_hashlib.md5(b).hexdigest() for b in pdf[bin_col]]
            dims = [
                (int(d[:15], 16) % 1024 + 1, int(d[15:30], 16) % 1024 + 1)
                for d in digests
            ]
            out = [fit(w, h) for w, h in dims]
            yield _pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "out_width": [o[0] for o in out],
                    "out_height": [o[1] for o in out],
                    "resized_md5": [
                        _hashlib.md5(
                            f"{d}:{o[0]}x{o[1]}".encode()
                        ).hexdigest()
                        for d, o in zip(digests, out)
                    ],
                }
            )

    from hadoop_20_warehouse_spark.session import scatter

    return scatter(df.select(F.col(id_col), F.col(bin_col))).mapInPandas(
        run, schema=RESIZE_SCHEMA
    )


def resize_stub_sql(
    table: str, id_col: str, text_col: str, box_w: int = 256, box_h: int = 256
) -> str:
    """DuckDB oracle for ``resize_stub`` over text-as-payload rows."""
    return f"""
WITH meta AS (
  SELECT {id_col} AS id, md5({text_col}) AS d,
         CAST('0x' || substring(md5({text_col}), 1, 15) AS BIGINT) % 1024 + 1 AS width,
         CAST('0x' || substring(md5({text_col}), 16, 15) AS BIGINT) % 1024 + 1 AS height
  FROM {table}
),
fitted AS (
  SELECT id, d, width, height,
         CASE
           WHEN width <= {box_w} AND height <= {box_h} THEN width
           WHEN {box_w} * height <= {box_h} * width THEN {box_w}
           ELSE greatest(1, (width * {box_h}) // height)
         END AS out_width,
         CASE
           WHEN width <= {box_w} AND height <= {box_h} THEN height
           WHEN {box_w} * height <= {box_h} * width THEN greatest(1, (height * {box_w}) // width)
           ELSE {box_h}
         END AS out_height
  FROM meta
)
SELECT id, width, height, out_width, out_height,
       md5(d || ':' || CAST(out_width AS VARCHAR) || 'x' || CAST(out_height AS VARCHAR)) AS resized_md5
FROM fitted
""".strip()


FRAME_SAMPLE_SCHEMA = "id long, n_frames long, frame_idx long, frame_md5 string"


def frame_sample_stub(
    df: DataFrame, id_col: str, bin_col: str, step: int = 10, max_frames: int = 120
) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    (every ``step``-th), a UDTF-shaped mapInPandas (1 row in → many
    rows out, Arrow-batched).

    The "video" length is stood in by a digest-derived frame count in
    [1, max_frames] and each frame payload by md5(content_md5:idx) —
    swap for an ffmpeg demux in production. Output stays partitioned
    with the input (no shuffle); downstream per-frame feature UDFs
    chain onto this frame table directly.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        for pdf in batches:
            ids, counts, idxs, fmd5 = [], [], [], []
            for rid, payload in zip(pdf[id_col], pdf[bin_col]):
                d = _hashlib.md5(payload).hexdigest()
                n_frames = int(d[:8], 16) % max_frames + 1
                for i in range(0, n_frames, step):
                    ids.append(rid)
                    counts.append(n_frames)
                    idxs.append(i)
                    fmd5.append(_hashlib.md5(f"{d}:{i}".encode()).hexdigest())
            yield _pd.DataFrame(
                {"id": ids, "n_frames": counts, "frame_idx": idxs, "frame_md5": fmd5}
            )

    from hadoop_20_warehouse_spark.session import scatter

    return scatter(df.select(F.col(id_col), F.col(bin_col))).mapInPandas(
        run, schema=FRAME_SAMPLE_SCHEMA
    )


def frame_sample_stub_sql(
    table: str, id_col: str, text_col: str, step: int = 10, max_frames: int = 120
) -> str:
    """DuckDB oracle for ``frame_sample_stub``."""
    return f"""
WITH meta AS (
  SELECT {id_col} AS id, md5({text_col}) AS d,
         CAST('0x' || substring(md5({text_col}), 1, 8) AS BIGINT) % {max_frames} + 1 AS n_frames
  FROM {table}
)
SELECT id, n_frames, frame_idx, md5(d || ':' || CAST(frame_idx AS VARCHAR)) AS frame_md5
FROM (
  SELECT id, d, n_frames, unnest(generate_series(0, n_frames - 1, {step})) AS frame_idx
  FROM meta
)
""".strip()
