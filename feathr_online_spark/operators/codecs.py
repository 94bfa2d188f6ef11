"""Pure-stdlib media codecs for the multimodal operators.

This container ships no PIL/libav/torchaudio, so the engine implements the
formats that need nothing beyond ``struct``/``wave``/numpy:

- **BMP** (Windows bitmap, uncompressed 24-bit BI_RGB): full encoder+decoder.
  Bottom-up row order, 4-byte row padding, BGR channel order — the classic
  format quirks, handled here so decoded arrays are plain HxWx3 RGB uint8.
- **WAV** (RIFF PCM16): via the stdlib ``wave`` module.
- **RAWV** (raw RGB video): a minimal container — magic + (width, height,
  fps, n_frames) header + concatenated raw RGB24 frames.  Real video codecs
  require libav; this gives the frame-sampling operator an actual
  multi-frame format to work on end-to-end.

Formats that genuinely need external codecs (JPEG/PNG/MP3/H.264) raise a
clear error naming the missing library — the honest boundary of this
container.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

# ---------------------------------------------------------------------------
# BMP (24-bit uncompressed)
# ---------------------------------------------------------------------------


def encode_bmp(rgb: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB → 24-bit BI_RGB BMP bytes."""
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("encode_bmp expects an HxWx3 array")
    h, w, _ = rgb.shape
    row_size = (w * 3 + 3) & ~3                      # rows pad to 4 bytes
    pixel_bytes = row_size * h
    # pixel array: bottom-up rows, BGR order
    bgr = rgb[::-1, :, ::-1].astype(np.uint8)
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + pixel_bytes, 0, 0, 14 + 40)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, pixel_bytes, 2835, 2835, 0, 0)
    return header + info + rows.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP bytes → HxWx3 uint8 RGB array."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack_from("<I", data, 10)
    hdr_size, w, h, _planes, bpp, compression = struct.unpack_from("<IiiHHI", data, 14)
    if bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp}, comp={compression})")
    flip = h > 0                                     # positive height = bottom-up
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    rows = np.frombuffer(data, dtype=np.uint8, count=row_size * h, offset=offset)
    rows = rows.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]                           # BGR → RGB
    return (rgb[::-1] if flip else rgb).copy()


def resize_nearest(rgb: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize — index arithmetic, no interpolation libs."""
    h, w, _ = rgb.shape
    yi = (np.arange(height) * h // height).clip(0, h - 1)
    xi = (np.arange(width) * w // width).clip(0, w - 1)
    return rgb[yi][:, xi]


# ---------------------------------------------------------------------------
# WAV (RIFF PCM16)
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """1-D float array in [-1, 1] → mono PCM16 WAV bytes."""
    pcm = np.clip(samples, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(pcm.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes → (sample_rate, float32 samples in [-1, 1], mono-mixed)."""
    with wave.open(io.BytesIO(data), "rb") as f:
        rate = f.getframerate()
        n = f.getnframes()
        ch = f.getnchannels()
        width = f.getsampwidth()
        raw = f.readframes(n)
    if width != 2:
        raise ValueError(f"only PCM16 WAV supported (sample width {width})")
    pcm = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32767.0
    if ch > 1:
        pcm = pcm.reshape(-1, ch).mean(axis=1)
    return rate, pcm


# ---------------------------------------------------------------------------
# RAWV (raw RGB24 video container)
# ---------------------------------------------------------------------------

_RAWV_MAGIC = b"RAWV"


def encode_rawv(frames: np.ndarray, fps: int = 10) -> bytes:
    """NxHxWx3 uint8 frames → RAWV bytes."""
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError("encode_rawv expects NxHxWx3")
    n, h, w, _ = frames.shape
    return _RAWV_MAGIC + struct.pack("<HHHH", w, h, fps, n) + frames.astype(np.uint8).tobytes()


def decode_rawv(data: bytes) -> tuple[int, np.ndarray]:
    """RAWV bytes → (fps, NxHxWx3 uint8 frames)."""
    if data[:4] != _RAWV_MAGIC:
        raise ValueError("not a RAWV payload")
    w, h, fps, n = struct.unpack_from("<HHHH", data, 4)
    frames = np.frombuffer(data, dtype=np.uint8, count=n * h * w * 3, offset=12)
    return fps, frames.reshape(n, h, w, 3).copy()
