"""Minimal real PNG codec (pure numpy + stdlib zlib).

The multimodal operators need an ACTUAL image decode path in a
container without PIL/libvips: PNG is fully specified (RFC 2083) and
implementable with zlib + numpy alone, so the engine's media pipeline
decodes real compressed image bytes end-to-end — signature check,
chunk walk, zlib inflate, per-row unfiltering (all five filter types),
without any codec library.

Scope (asserted, not silently wrong): 8-bit depth, grayscale (color
type 0) and RGB (color type 2), no interlacing, no palette/alpha.
That covers the engine's synthetic payloads and round-trips arbitrary
uint8 arrays; a production build swaps in libvips behind the same
array-in/array-out contract.

Encoding writes one chosen filter type for every row (0 none / 1 sub /
2 up / 3 average / 4 paeth) — the decoder handles each per row
independently, so mixed-filter files from other writers decode too.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _as_frame(img: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Normalize to (h, w, channels) uint8 + (color_type, channels)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        return img[:, :, None], 0, 1
    if img.ndim == 3 and img.shape[2] == 3:
        return img, 2, 3
    raise ValueError(f"expected (h,w) or (h,w,3) uint8, got {img.shape}")


def _filter_frame(arr: np.ndarray, channels: int, filter_type: int) -> np.ndarray:
    """(h, w, channels) uint8 → filtered scanlines (h, 1+w·channels)
    uint8 with the per-row filter-type byte prepended — the raw
    datastream a PNG IDAT (or APNG fdAT) compresses."""
    h, w = arr.shape[:2]
    raw = arr.reshape(h, w * channels).astype(np.int16)
    bpp = channels
    left = np.zeros_like(raw)
    left[:, bpp:] = raw[:, :-bpp]
    up = np.zeros_like(raw)
    up[1:] = raw[:-1]
    up_left = np.zeros_like(raw)
    up_left[1:, bpp:] = raw[:-1, :-bpp]
    if filter_type == 0:
        filt = raw
    elif filter_type == 1:
        filt = raw - left
    elif filter_type == 2:
        filt = raw - up
    elif filter_type == 3:
        filt = raw - (left + up) // 2
    elif filter_type == 4:
        p = left + up - up_left
        pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - up_left)
        pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, up_left))
        filt = raw - pred
    else:
        raise ValueError(f"unknown PNG filter type {filter_type}")
    filt = (filt % 256).astype(np.uint8)
    scan = np.empty((h, 1 + w * channels), dtype=np.uint8)
    scan[:, 0] = filter_type
    scan[:, 1:] = filt
    return scan


def png_encode(img: np.ndarray, filter_type: int = 0, level: int = 6) -> bytes:
    """uint8 array (h, w) grayscale or (h, w, 3) RGB → PNG bytes."""
    arr, color_type, channels = _as_frame(img)
    h, w = arr.shape[:2]
    scan = _filter_frame(arr, channels, filter_type)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(scan.tobytes(), level))
        + _chunk(b"IEND", b"")
    )


def _paeth_pred(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (h, w) grayscale or (h, w, 3) RGB."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    w = h = None
    color_type = None
    idat = bytearray()
    saw_iend = False
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("truncated PNG chunk header")
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        if pos + 12 + length > len(data):
            raise ValueError("truncated PNG chunk")
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color_type not in (0, 2) or comp or filt or interlace:
                raise ValueError(
                    "unsupported PNG: need 8-bit gray/RGB non-interlaced, got "
                    f"depth={depth} color={color_type} interlace={interlace}"
                )
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            saw_iend = True
            break
        pos += 12 + length
    if not saw_iend:
        raise ValueError("truncated PNG: missing IEND")
    if w is None:
        raise ValueError("PNG missing IHDR")
    channels = 1 if color_type == 0 else 3
    arr = _unfilter_scan(zlib.decompress(bytes(idat)), w, h, channels)
    return arr[:, :, 0] if channels == 1 else arr


def _unfilter_scan(raw: bytes, w: int, h: int, channels: int) -> np.ndarray:
    """Decompressed scanline datastream → (h, w, channels) uint8 —
    the shared PNG/APNG per-row unfilter (all five filter types)."""
    stride = w * channels
    scan = np.frombuffer(raw, dtype=np.uint8)
    if len(scan) != h * (1 + stride):
        raise ValueError("PNG scanline data length mismatch")
    scan = scan.reshape(h, 1 + stride)
    ftypes = scan[:, 0]
    rows = scan[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), dtype=np.int32)
    bpp = channels
    for y in range(h):
        ft = int(ftypes[y])
        raw = rows[y]
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.int32)
        if ft == 0:
            out[y] = raw
        elif ft == 1:
            # sub: per-lane running sum mod 256 (vectorized cumsum)
            lanes = raw.reshape(-1, bpp)
            out[y] = (np.cumsum(lanes, axis=0) % 256).reshape(-1)
        elif ft == 2:
            out[y] = (raw + prev) % 256
        elif ft == 3:
            row = out[y]
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (raw[i] + (left + prev[i]) // 2) % 256
        elif ft == 4:
            row = out[y]
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                row[i] = (raw[i] + _paeth_pred(left, int(prev[i]), ul)) % 256
        else:
            raise ValueError(f"unknown PNG row filter {ft}")
    return out.astype(np.uint8).reshape(h, w, channels)


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize by integer index mapping:
    src_x = floor(x·w_in/width), src_y = floor(y·h_in/height) — the
    floor semantics are SQL-recomputable ((x*w)//width), which is what
    lets the media gate verify a REAL resize end-to-end."""
    h_in, w_in = img.shape[:2]
    ys = (np.arange(height) * h_in) // height
    xs = (np.arange(width) * w_in) // width
    return img[np.ix_(ys, xs)]
