"""Pure-stdlib PNG codec: roundtrip, every scanline filter type, and the
error surface. No Spark session — these pin the codec the multimodal
`use_real` paths rely on."""

import random
import struct
import zlib

import pytest

from dsci551_edfs_spark.pipeline.png_stdlib import (
    decode_png,
    encode_png_gray,
    png_codec,
)


def _pix(w, h, seed=7):
    rnd = random.Random(seed)
    return [[rnd.randrange(256) for _ in range(w)] for _ in range(h)]


def test_roundtrip_gray():
    pix = _pix(13, 9)
    w, h, ch, raw = decode_png(encode_png_gray(pix))
    assert (w, h, ch) == (13, 9, 1)
    assert list(raw) == [v for row in pix for v in row]


def test_codec_stats():
    out = png_codec("img", encode_png_gray([[10, 20], [30, 40]]))
    assert out == {"px_width": 2, "px_height": 2, "px_mean": 25.0}


def _filtered_png(filters, pix):
    """Hand-encode with an explicit per-row filter type — what libpng and
    Pillow emit; the encoder here always uses 0, so the decoder's filter
    support needs adversarial fixtures."""
    h, w = len(pix), len(pix[0])

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    raws, prev = [], [0] * w
    for y, f in enumerate(filters):
        row = pix[y]
        left = lambda i: row[i - 1] if i else 0
        ul = lambda i: prev[i - 1] if i else 0
        if f == 0:
            enc = row[:]
        elif f == 1:
            enc = [(row[i] - left(i)) & 0xFF for i in range(w)]
        elif f == 2:
            enc = [(row[i] - prev[i]) & 0xFF for i in range(w)]
        elif f == 3:
            enc = [(row[i] - ((left(i) + prev[i]) >> 1)) & 0xFF for i in range(w)]
        else:
            enc = [(row[i] - paeth(left(i), prev[i], ul(i))) & 0xFF for i in range(w)]
        raws.append(bytes([f]) + bytes(enc))
        prev = row

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(raws)))
        + chunk(b"IEND", b"")
    )


def test_decode_all_filter_types():
    pix = _pix(11, 9, seed=3)
    data = _filtered_png([0, 1, 2, 3, 4, 4, 3, 2, 1], pix)
    w, h, ch, raw = decode_png(data)
    assert (w, h, ch) == (11, 9, 1)
    assert list(raw) == [v for row in pix for v in row]


def test_rejects_bad_signature_and_crc():
    good = encode_png_gray([[1, 2], [3, 4]])
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JUNK" + good[4:])
    corrupted = bytearray(good)
    corrupted[20] ^= 0xFF  # flip an IHDR body byte -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(corrupted))


def test_rejects_unsupported_shapes():
    with pytest.raises(ValueError, match="empty"):
        encode_png_gray([])
    with pytest.raises(ValueError, match="ragged"):
        encode_png_gray([[1, 2], [3]])
