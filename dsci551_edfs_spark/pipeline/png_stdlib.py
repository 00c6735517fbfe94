"""Minimal pure-stdlib PNG codec — zlib + struct only, no third-party
image library.

Purpose: the multimodal stages (`decode_media`, `resize_media`) expose a
real-codec injection point; in containers without Pillow that hook could
previously only be exercised as a skip. This module supplies a genuine
codec — real DEFLATE streams, real scanline filters, real pixels — so the
`use_real` paths run everywhere. It is deliberately minimal: PNG only,
8-bit depth, no interlace; decode handles color types 0/2/4/6 (gray, RGB,
gray+alpha, RGBA) and all five scanline filters (a Pillow- or libpng-
encoded image may use any filter per row); encode emits 8-bit grayscale
with filter 0. Images here are container fixtures (tens of KB), so the
per-scanline Python defilter loop is not a hot path — production swaps in
Pillow through the SAME `codec=` hook without touching the engine.

Format reference: the public PNG specification (RFC 2083 / ISO 15948):
signature, IHDR/IDAT/IEND chunks, CRC-32 per chunk, filter types
None/Sub/Up/Average/Paeth.
"""

from __future__ import annotations

import struct
import zlib

__all__ = ["encode_png_gray", "decode_png", "png_codec", "png_pixel_stats"]

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png_gray(pixels) -> bytes:
    """8-bit grayscale PNG from a row-major 2-D pixel source (list of
    rows, or a numpy array); filter 0 on every scanline."""
    rows = [bytes(bytearray(int(v) & 0xFF for v in row)) for row in pixels]
    if not rows or not rows[0]:
        raise ValueError("empty image")
    h, w = len(rows), len(rows[0])
    if any(len(r) != w for r in rows):
        raise ValueError("ragged rows")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + r for r in rows)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """→ (width, height, channels, defiltered pixel bytes, row-major).

    8-bit depth, non-interlaced, color types 0/2/4/6. CRC is validated per
    chunk; all five filter types are reversed.
    """
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, w = 8, None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth} (8 only)")
            if ctype not in _CHANNELS:
                raise ValueError(f"unsupported color type {ctype}")
            if comp != 0 or filt != 0:
                raise ValueError("nonstandard compression/filter method")
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("missing IHDR")
    ch = _CHANNELS[ctype]
    stride = w * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length does not match dimensions")
    out = bytearray(h * stride)
    prev = bytearray(stride)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ftype == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                ul = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown filter type {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return w, h, ch, bytes(out)


def png_pixel_stats(payload: bytes) -> dict:
    """Decode + luminance stats — the shape `decode_media`'s ``codec=``
    hook expects: {'px_width', 'px_height', 'px_mean'}. Multi-channel
    images average across channels (flat luminance proxy)."""
    w, h, ch, pix = decode_png(payload)
    total = sum(pix)
    return {
        "px_width": w,
        "px_height": h,
        "px_mean": total / (w * h * ch),
    }


def png_codec(kind: str, payload: bytes) -> dict:
    """Picklable `(kind, payload) -> dict` for `decode_media(codec=...)` —
    the stdlib counterpart of a PIL-backed codec."""
    return png_pixel_stats(payload)
