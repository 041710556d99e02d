"""Minimal real WAV (RIFF/WAVE PCM) codec — pure numpy + stdlib struct.

The multimodal operators need an ACTUAL audio decode path in a
container without soundfile/librosa: canonical WAV is fully specified
(RIFF container + fmt/data chunks, little-endian PCM) and
implementable with struct + numpy alone, so the engine's media
pipeline parses real audio containers end-to-end — RIFF header
validation, chunk walk (skipping unknown chunks the way real writers
emit LIST/fact/cue blocks), fmt sanity checks, and a vectorized PCM
sample decode.

Scope (asserted, not silently wrong): PCM (format tag 1), 16-bit
samples, any channel count / sample rate. That covers the engine's
synthetic payloads and round-trips arbitrary int16 arrays; a
production build swaps in libsndfile behind the same
array-in/array-out contract.
"""

from __future__ import annotations

import struct

import numpy as np


def wav_encode(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """int16 array (n,) mono or (n, c) multi-channel → WAV bytes."""
    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError(f"wav_encode supports (n,) or (n, c) int16, got {arr.shape}")
    n, channels = arr.shape
    byte_rate = sample_rate * channels * 2
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, 16
    )
    data = arr.astype("<i2").tobytes()
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")  # RIFF chunks are word-aligned
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (int16 array (n,) mono or (n, c), sample_rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    (riff_size,) = struct.unpack("<I", data[4:8])
    if riff_size + 8 != len(data):
        raise ValueError("WAV RIFF size mismatch")
    pos = 12
    channels = sample_rate = None
    pcm = None
    while pos + 8 <= len(data):
        ctype = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if pos + 8 + length > len(data):
            raise ValueError("truncated WAV chunk")
        body = data[pos + 8 : pos + 8 + length]
        if ctype == b"fmt ":
            if length < 16:
                raise ValueError("truncated WAV fmt chunk")
            tag, channels, sample_rate, _byte_rate, block_align, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if tag != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV: need 16-bit PCM, got tag={tag} bits={bits}"
                )
            if block_align != channels * 2:
                raise ValueError("WAV block_align inconsistent with channels")
        elif ctype == b"data":
            pcm = body
        # unknown chunks (LIST, fact, cue ...) are skipped, as in any
        # real reader — writers routinely interleave metadata blocks
        pos += 8 + length + (length % 2)  # chunks are word-aligned
    if channels is None or pcm is None:
        raise ValueError("WAV missing fmt or data chunk")
    if len(pcm) % (channels * 2):
        raise ValueError("WAV data length not a whole number of frames")
    arr = np.frombuffer(pcm, dtype="<i2").astype(np.int16).reshape(-1, channels)
    return (arr[:, 0] if channels == 1 else arr), sample_rate


def resample_nearest(samples: np.ndarray, out_n: int) -> np.ndarray:
    """Nearest-neighbor resample by integer index mapping:
    src_i = floor(i·n_in/out_n) — the floor semantics are
    SQL-recomputable ((i*n)//out_n), which is what lets the media gate
    verify a REAL fixed-length audio resample end-to-end."""
    n_in = samples.shape[0]
    idx = (np.arange(out_n) * n_in) // out_n
    return samples[idx]
