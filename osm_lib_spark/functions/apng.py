"""Minimal real APNG (animated PNG) codec — pure numpy + stdlib zlib.

The multimodal operators need an ACTUAL video-like decode path in a
container without ffmpeg/pyav: APNG is a fully-public spec (the
animation chunks standardized into the PNG spec, third edition) and
layers cleanly over the engine's from-scratch PNG codec — an `acTL`
animation-control chunk, one `fcTL` frame-control chunk per frame,
frame 0's pixels in the ordinary `IDAT`, later frames in `fdAT`
chunks whose bodies are (sequence_number + the same compressed
filtered-scanline datastream IDAT carries). Decoding walks the chunk
sequence with CRC checks, validates the fcTL geometry, and inflates +
unfilters EVERY frame through the shared PNG kernels — so the media
pipeline parses a real multi-frame animation container end-to-end.

Scope (asserted, not silently wrong): every frame full-canvas
(fcTL width/height == IHDR, zero offsets), dispose_op 0 (none) and
blend_op 0 (source) — i.e. each frame fully replaces the canvas, so
decoded frames are independent full images; 8-bit gray/RGB, no
interlacing. That covers the engine's synthetic clips and round-trips
arbitrary uint8 frame stacks; a production build swaps in
ffmpeg/libvips behind the same frames-in/frames-out contract.
Partial-canvas frames and over/previous dispose modes raise.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from osm_lib_spark.functions.png import (
    _SIG,
    _as_frame,
    _chunk,
    _filter_frame,
    _unfilter_scan,
)


def _fctl(seq: int, w: int, h: int, delay_den: int) -> bytes:
    # seq, width, height, x_offset, y_offset, delay_num, delay_den,
    # dispose_op, blend_op
    return _chunk(
        b"fcTL", struct.pack(">IIIIIHHBB", seq, w, h, 0, 0, 1, delay_den, 0, 0)
    )


def apng_encode(
    frames: list[np.ndarray],
    delay_den: int = 30,
    filter_type: int = 0,
    level: int = 6,
) -> bytes:
    """List of uint8 arrays (h, w) or (h, w, 3), all same shape →
    APNG bytes (frame 0 in IDAT, later frames in fdAT)."""
    if not frames:
        raise ValueError("apng_encode needs at least one frame")
    first, color_type, channels = _as_frame(frames[0])
    h, w = first.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    out = [
        _SIG,
        _chunk(b"IHDR", ihdr),
        _chunk(b"acTL", struct.pack(">II", len(frames), 0)),
    ]
    seq = 0
    for i, frame in enumerate(frames):
        arr, ct, ch = _as_frame(frame)
        if arr.shape != first.shape or ct != color_type:
            raise ValueError(
                f"frame {i} shape {arr.shape} != frame 0 shape {first.shape}"
            )
        out.append(_fctl(seq, w, h, delay_den))
        seq += 1
        data = zlib.compress(_filter_frame(arr, channels, filter_type).tobytes(), level)
        if i == 0:
            out.append(_chunk(b"IDAT", data))
        else:
            out.append(_chunk(b"fdAT", struct.pack(">I", seq) + data))
            seq += 1
    out.append(_chunk(b"IEND", b""))
    return b"".join(out)


def is_apng(data: bytes) -> bool:
    """True iff the PNG carries an acTL chunk before its first IDAT —
    the spec's marker for an animation. A proper chunk walk, not a
    byte scan: compressed pixel data can contain the 4 bytes 'acTL'."""
    if data[:8] != _SIG:
        return False
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        if ctype == b"acTL":
            return True
        if ctype in (b"IDAT", b"IEND"):
            return False
        pos += 12 + length
    return False


def apng_decode(data: bytes) -> list[np.ndarray]:
    """APNG bytes → list of uint8 arrays (h, w) or (h, w, 3), one per
    frame, each a full independent canvas (scope: dispose none /
    blend source, full-frame fcTLs)."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    w = h = None
    color_type = None
    num_frames = None
    seqs: list[int] = []  # fcTL + fdAT sequence numbers, file order
    streams: list[bytearray] = []  # per-frame compressed datastreams
    cur: bytearray | None = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        if pos + 12 + length > len(data):
            raise ValueError("truncated APNG chunk")
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"APNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color_type not in (0, 2) or comp or filt or interlace:
                raise ValueError(
                    "unsupported APNG: need 8-bit gray/RGB non-interlaced, got "
                    f"depth={depth} color={color_type} interlace={interlace}"
                )
        elif ctype == b"acTL":
            num_frames, _num_plays = struct.unpack(">II", body)
        elif ctype == b"fcTL":
            seq, fw, fh, x0, y0, _dn, _dd, dispose, blend = struct.unpack(
                ">IIIIIHHBB", body
            )
            if (fw, fh, x0, y0) != (w, h, 0, 0):
                raise ValueError(
                    "unsupported APNG: partial-canvas frame "
                    f"({fw}x{fh}+{x0}+{y0} on {w}x{h} canvas)"
                )
            if dispose or blend:
                raise ValueError(
                    f"unsupported APNG: dispose_op={dispose} blend_op={blend} "
                    "(scope: none/source)"
                )
            seqs.append(seq)
            cur = bytearray()
            streams.append(cur)
        elif ctype == b"IDAT":
            if num_frames is None:
                # acTL must precede IDAT (spec chunk ordering), so this
                # is a plain still PNG, not an animation
                raise ValueError("not an APNG: no acTL chunk (use png_decode)")
            if cur is None:
                # a static default image outside the animation (fcTL
                # after IDAT) is out of scope for the engine's clips
                raise ValueError("unsupported APNG: IDAT before first fcTL")
            cur.extend(body)
        elif ctype == b"fdAT":
            if cur is None:
                raise ValueError("APNG fdAT before first fcTL")
            seqs.append(struct.unpack(">I", body[:4])[0])
            cur.extend(body[4:])
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if w is None:
        raise ValueError("APNG missing IHDR")
    if num_frames is None:
        raise ValueError("not an APNG: no acTL chunk (use png_decode)")
    if num_frames != len(streams):
        raise ValueError(
            f"APNG acTL declares {num_frames} frames, found {len(streams)} fcTLs"
        )
    if seqs != list(range(len(seqs))):
        raise ValueError(f"APNG sequence numbers not consecutive: {seqs}")
    channels = 1 if color_type == 0 else 3
    frames = []
    for stream in streams:
        arr = _unfilter_scan(zlib.decompress(bytes(stream)), w, h, channels)
        frames.append(arr[:, :, 0] if channels == 1 else arr)
    return frames
