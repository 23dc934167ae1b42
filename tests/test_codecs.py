"""Pins for the pure-Python PNG/WAV codecs (r7): spec-level round
trips, including the two scanline filters (Average, Paeth) the encoder
never emits — those are exercised via hand-built raw streams so the
decoder's reconstruction arithmetic is pinned against the PNG spec's
reference semantics, not against our own encoder."""

import struct
import zlib

import numpy as np
import pytest

from hbase_indexer_spark.pipeline.codecs import (
    PNG_SIG,
    png_decode,
    png_encode,
    png_resize_nearest,
    wav_decode,
    wav_encode,
)


def test_png_roundtrip_all_color_types_and_filters():
    rng = np.random.default_rng(11)
    for c in (1, 2, 3, 4):
        for ft in (0, 1, 2):
            px = rng.integers(0, 256, size=(6, 5, c), dtype=np.uint8)
            assert np.array_equal(png_decode(png_encode(px, ft)), px)


def _png_from_raw(w, h, color_type, raw: bytes) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    return (PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def test_png_decode_average_filter_reference():
    # 2x3 grayscale; row0 filter None = [10, 20, 30];
    # row1 filter Average with x = [5, 5, 5]:
    #   recon[i] = x + (left + up)//2
    #   -> [5+(0+10)//2, 5+(10+20)//2, 5+(20+30)//2] = [10, 20, 30]
    raw = bytes([0, 10, 20, 30, 3, 5, 5, 5])
    got = png_decode(_png_from_raw(3, 2, 0, raw))
    assert got[:, :, 0].tolist() == [[10, 20, 30], [10, 20, 30]]


def test_png_decode_paeth_filter_reference():
    # 2x3 grayscale; row0 None = [1, 2, 3]; row1 Paeth with x = [7, 7, 7]:
    #   i=0: a=0, b=1, c=0 -> p=1 -> pa=1 pb=0 pc=1 -> pred=b=1 -> 8
    #   i=1: a=8, b=2, c=1 -> p=9 -> pa=1 pb=7 pc=8 -> pred=a=8 -> 15
    #   i=2: a=15, b=3, c=2 -> p=16 -> pa=1 pb=13 pc=14 -> pred=a -> 22
    raw = bytes([0, 1, 2, 3, 4, 7, 7, 7])
    got = png_decode(_png_from_raw(3, 2, 0, raw))
    assert got[:, :, 0].tolist() == [[1, 2, 3], [8, 15, 22]]


def test_png_decode_rejects_out_of_scope_inputs():
    with pytest.raises(ValueError, match="signature"):
        png_decode(b"JFIF" + bytes(30))
    px = np.zeros((2, 2), dtype=np.uint8)
    good = png_encode(px)
    # corrupt bit depth byte inside IHDR (offset: 8 sig + 8 hdr + 8 dims)
    bad = bytearray(good)
    bad[24] = 16
    # crc is not validated (tolerated, like most decoders) but depth is
    with pytest.raises(ValueError, match="bit depth"):
        png_decode(bytes(bad))


def test_png_resize_nearest_integer_semantics():
    px = np.arange(30, dtype=np.uint8).reshape(5, 6)
    out = png_resize_nearest(px, 4, 4)
    want = [[px[(y * 5) // 4][(x * 6) // 4] for x in range(4)]
            for y in range(4)]
    assert out.tolist() == want


def test_wav_roundtrip_stereo_and_odd_chunk_alignment():
    rng = np.random.default_rng(3)
    s = rng.integers(-3000, 3000, size=10, dtype=np.int16)
    dec, rate, ch = wav_decode(wav_encode(s, 44100, channels=2))
    assert (rate, ch) == (44100, 2)
    assert np.array_equal(dec, s)
    # unknown odd-length chunk between fmt and data must be skipped
    # with word alignment (the RIFF rule real files rely on)
    raw = wav_encode(s[:4], 8000)
    i = raw.index(b"data")
    spliced = raw[:i] + b"LIST" + struct.pack("<I", 3) + b"abc\x00" + raw[i:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    dec2, rate2, _ = wav_decode(spliced)
    assert rate2 == 8000 and np.array_equal(dec2, s[:4])


def test_wav_decode_rejects_non_pcm():
    raw = bytearray(wav_encode(np.zeros(4, dtype=np.int16), 8000))
    fmt_at = raw.index(b"fmt ") + 8
    raw[fmt_at:fmt_at + 2] = struct.pack("<H", 3)  # IEEE float
    with pytest.raises(ValueError, match="format"):
        wav_decode(bytes(raw))
