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

    return df.select(F.col(id_col), F.col(bin_col)).mapInPandas(
        run, schema=DECODE_META_SCHEMA
    )
