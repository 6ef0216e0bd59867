"""Real media codecs (multimodal/codecs.py): pure decode/encode units
plus the Spark-side real-decode paths."""

from __future__ import annotations

import numpy as np
import pytest

from hadoop_20_warehouse_spark.multimodal.codecs import (
    decode_bmp,
    decode_image,
    decode_ppm,
    decode_wav_features,
    encode_bmp,
    encode_ppm,
    encode_wav_square,
    fit_box,
    resize_nearest,
    sniff_format,
)


def test_ppm_roundtrip_and_header_tolerance():
    img = decode_ppm(encode_ppm(5, 3, (10, 20, 30)))
    assert img.shape == (3, 5, 3)
    assert (img[:, :, 0] == 10).all() and (img[:, :, 2] == 30).all()
    # comments and mixed whitespace in the header (the format allows both)
    loose = b"P6 # c\n# c2\n 5\t3\n255\n" + bytes((10, 20, 30)) * 15
    assert decode_ppm(loose).shape == (3, 5, 3)
    with pytest.raises(ValueError, match="truncated PPM pixel"):
        decode_ppm(encode_ppm(5, 3, (1, 2, 3))[:-4])
    with pytest.raises(ValueError, match="maxval 255"):
        decode_ppm(b"P6\n2 2\n65535\n" + b"\x00" * 24)


def test_bmp_roundtrip_row_padding_and_orientation():
    # width 7 -> 21-byte rows padded to 24: the stride path is exercised
    img = decode_bmp(encode_bmp(7, 4, (200, 100, 50)))
    assert img.shape == (4, 7, 3)
    assert (img[:, :, 0] == 200).all() and (img[:, :, 2] == 50).all()
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"XX" + b"\x00" * 60)


def test_wav_square_features_exact():
    f = decode_wav_features(encode_wav_square(8000, 1000, 1234))
    assert f == {
        "sample_rate": 8000,
        "channels": 1,
        "n_samples": 1000,
        "peak": 1234,
        "rms": 1234.0,
    }
    # a non-square signal: rms < peak
    import io as _io
    import wave as _wave

    buf = _io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(np.array([0, 100, 0, -100], dtype="<i2").tobytes())
    f2 = decode_wav_features(buf.getvalue())
    assert f2["peak"] == 100 and 0 < f2["rms"] < 100


def test_resize_nearest_and_fit_box():
    img = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(4, 6, 3)
    out = resize_nearest(img, 3, 2)
    assert out.shape == (2, 3, 3)
    # nearest-neighbor: every output pixel is some input pixel
    assert out[0, 0, 0] == img[0, 0, 0]
    assert fit_box(1000, 500, 256, 256) == (256, 128)
    assert fit_box(100, 50, 256, 256) == (100, 50)  # never upscale
    assert fit_box(500, 1000, 256, 256) == (128, 256)


def test_sniff_and_dispatch_gate():
    assert sniff_format(encode_ppm(1, 1, (0, 0, 0))) == "ppm"
    assert sniff_format(encode_bmp(1, 1, (0, 0, 0))) == "bmp"
    assert sniff_format(encode_wav_square(8000, 4, 1)) == "wav"
    assert sniff_format(b"\xff\xd8\xff\xe0junk") == "jpeg"
    assert sniff_format(b"\x89PNGjunk") == "png"
    # jpeg/png stay gated (no PIL in the container)
    with pytest.raises(ValueError, match="no container-native decoder"):
        decode_image(b"\xff\xd8\xff\xe0junk")
    from hadoop_20_warehouse_spark.multimodal.binary import decode_image_real

    w, h = decode_image_real(encode_ppm(9, 6, (1, 2, 3)))
    assert (w, h) == (9, 6)
    with pytest.raises(NotImplementedError, match="requires PIL"):
        decode_image_real(b"\x89PNGjunk")


def test_spark_real_decode_paths(spark):
    from pyspark.sql import Row

    from hadoop_20_warehouse_spark.multimodal.binary import (
        audio_features,
        decode_image_meta,
        resize_image_real,
    )

    imgs = spark.createDataFrame(
        [
            Row(id=1, payload=bytearray(encode_ppm(10, 4, (7, 8, 9)))),
            Row(id=2, payload=bytearray(encode_bmp(6, 5, (1, 2, 3)))),
        ]
    )
    meta = {r["id"]: r for r in decode_image_meta(imgs, "id", "payload").collect()}
    assert meta[1]["fmt"] == "ppm" and meta[1]["width"] == 10
    assert meta[2]["fmt"] == "bmp" and meta[2]["height"] == 5
    assert meta[2]["mean_g"] == 2.0
    rs = resize_image_real(imgs, "id", "payload", box_w=4, box_h=4).collect()
    by_id = {r["id"]: r for r in rs}
    assert by_id[1]["out_width"] == 4 and by_id[1]["out_height"] == 1
    # the resized payload is a REAL P6 of the fitted dims
    _, out_img = decode_image(bytes(by_id[1]["resized_ppm"]))
    assert out_img.shape == (1, 4, 3) and (out_img[:, :, 0] == 7).all()

    wavs = spark.createDataFrame(
        [Row(id=1, payload=bytearray(encode_wav_square(8000, 64, 500)))]
    )
    feat = audio_features(wavs, "id", "payload").collect()[0]
    assert feat["rms"] == 500.0 and feat["n_samples"] == 64
