"""Real media codecs for the formats this container CAN decode.

The multimodal plumbing (multimodal/binary.py) has carried a gated
stub for image/audio decode since round 1 because PIL/cv2/ffmpeg are
not installed.  That gate is honest but narrower than necessary: three
production formats are decodable with what IS here —

- **PPM (P6)**: pure header parse + raw RGB24 — numpy reshape.
- **BMP** (uncompressed 24/32-bit): fixed little-endian header + row-
  padded pixels — struct + numpy.
- **WAV** (PCM): Python stdlib ``wave`` + numpy for sample features.

So decode is REAL for these (bytes → true dimensions, true pixels,
true sample statistics, true nearest-neighbor resample); JPEG/PNG/MP4
remain gated behind the PIL/ffmpeg import-try in binary.py.

Everything here is per-payload pure functions — the Spark side stays
in multimodal/binary.py as Arrow-batched ``mapInPandas``; these run
inside those batches.  Encoders exist so tests and driver queries can
synthesize REAL container bytes whose expected features derive from
table columns — which is what lets a DuckDB oracle check a binary
decoder: the oracle recomputes the expected width/height/RMS from the
same columns, and equality proves the decoder actually parsed the
bytes.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

# --- sniffing ---------------------------------------------------------------

_MAGICS = [
    (b"P6", "ppm"),
    (b"BM", "bmp"),
    (b"RIFF", "wav"),  # refined below (RIFF....WAVE)
    (b"\xff\xd8\xff", "jpeg"),
    (b"\x89PNG", "png"),
    (b"GIF8", "gif"),
]


def sniff_format(payload: bytes) -> str:
    for magic, name in _MAGICS:
        if payload[: len(magic)] == magic:
            if name == "wav" and payload[8:12] != b"WAVE":
                return "riff"
            return name
    return "unknown"


# --- PPM (P6) ----------------------------------------------------------------


def encode_ppm(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    """A real P6 PPM of one constant color (test/query synthesis)."""
    header = f"P6\n{width} {height}\n255\n".encode("ascii")
    return header + bytes(rgb) * (width * height)


def _ppm_token(b: bytes, pos: int) -> tuple[bytes, int]:
    """Next whitespace-delimited token, skipping ``#`` comments."""
    n = len(b)
    while pos < n:
        c = b[pos : pos + 1]
        if c == b"#":
            while pos < n and b[pos : pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            break
    start = pos
    while pos < n and not b[pos : pos + 1].isspace():
        pos += 1
    if start == pos:
        raise ValueError("truncated PPM header")
    return b[start:pos], pos


def decode_ppm(payload: bytes) -> np.ndarray:
    """P6 PPM → uint8 array (height, width, 3)."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    pos = 2
    w_tok, pos = _ppm_token(payload, pos)
    h_tok, pos = _ppm_token(payload, pos)
    max_tok, pos = _ppm_token(payload, pos)
    if int(max_tok) != 255:
        raise ValueError(f"only maxval 255 supported, got {int(max_tok)}")
    pos += 1  # the single whitespace byte after maxval
    w, h = int(w_tok), int(h_tok)
    need = w * h * 3
    if len(payload) - pos < need:
        raise ValueError("truncated PPM pixel data")
    pix = np.frombuffer(payload, dtype=np.uint8, count=need, offset=pos)
    return pix.reshape(h, w, 3)


# --- BMP (uncompressed 24/32-bit) --------------------------------------------


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BMP → uint8 array (height, width, 3).
    Header layout: BITMAPFILEHEADER (14 bytes: magic, size, reserved,
    pixel offset) + BITMAPINFOHEADER (width @18 int32le, height @22
    signed — negative means top-down rows, bpp @28, compression @30);
    rows are padded to 4-byte boundaries, stored bottom-up, BGR."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    (pix_off,) = struct.unpack_from("<I", payload, 10)
    w, h_signed = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"only uncompressed 24/32-bit BMP (bpp={bpp})")
    h = abs(h_signed)
    bytes_pp = bpp // 8
    stride = (w * bytes_pp + 3) // 4 * 4
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=pix_off
    ).reshape(h, stride)[:, : w * bytes_pp].reshape(h, w, bytes_pp)
    if h_signed > 0:  # bottom-up storage
        rows = rows[::-1]
    return rows[:, :, 2::-1]  # BGR(A) -> RGB


def encode_bmp(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    """A real bottom-up 24-bit BMP of one constant color."""
    stride = (width * 3 + 3) // 4 * 4
    row = (bytes(rgb[::-1]) * width).ljust(stride, b"\x00")
    pixels = row * height
    file_header = struct.pack("<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    return file_header + info + pixels


# --- WAV (PCM via stdlib wave) -----------------------------------------------


def encode_wav_square(
    sample_rate: int, n_samples: int, amplitude: int, period: int = 8
) -> bytes:
    """A real PCM16 mono WAV: ±amplitude square wave (test synthesis —
    its RMS is exactly ``amplitude``, so oracles derive it from the
    generating column)."""
    idx = np.arange(n_samples)
    samples = np.where((idx // period) % 2 == 0, amplitude, -amplitude).astype(
        "<i2"
    )
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav_features(payload: bytes) -> dict:
    """PCM WAV → real sample statistics: sample_rate, channels,
    n_samples (frames), peak and RMS of the int16 samples (RMS rounded
    to 6 decimals — the repo's transcendental-rounding discipline)."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        sr = w.getframerate()
        ch = w.getnchannels()
        n = w.getnframes()
        width = w.getsampwidth()
        raw = w.readframes(n)
    if width != 2:
        raise ValueError(f"only PCM16 supported (sampwidth={width})")
    samples = np.frombuffer(raw, dtype="<i2").astype(np.int64)
    peak = int(np.abs(samples).max()) if samples.size else 0
    rms = float(np.sqrt(np.mean(samples * samples))) if samples.size else 0.0
    return {
        "sample_rate": sr,
        "channels": ch,
        "n_samples": n,
        "peak": peak,
        "rms": round(rms, 6),
    }


# --- resampling ---------------------------------------------------------------


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Real nearest-neighbor resample (the deterministic kernel — no
    filtering library needed; index map is ``floor(i * in/out)``)."""
    h, w = img.shape[:2]
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return img[rows][:, cols]


def fit_box(w: int, h: int, box_w: int, box_h: int) -> tuple[int, int]:
    """Integer-exact aspect-fit (same math as binary.resize_stub and
    its SQL twin): never upscale; floor-divide the scaled edge."""
    if w <= box_w and h <= box_h:
        return w, h
    if box_w * h <= box_h * w:
        return box_w, max(1, (h * box_w) // w)
    return max(1, (w * box_h) // h), box_h


def decode_image(payload: bytes) -> tuple[str, np.ndarray]:
    """Dispatch: real decode for ppm/bmp; gated error for formats
    needing PIL/ffmpeg (kept honest — see multimodal/binary.py)."""
    fmt = sniff_format(payload)
    if fmt == "ppm":
        return fmt, decode_ppm(payload)
    if fmt == "bmp":
        return fmt, decode_bmp(payload)
    raise ValueError(f"no container-native decoder for format '{fmt}'")
