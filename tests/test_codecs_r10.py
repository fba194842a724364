"""Round-10 codec unit tests: the paths the oracle queries don't
reach — TIFF big-endian (MM) decode, TIFF multi-strip reassembly, QOI
op coverage on adversarial rasters, dHash area cross-multiplication
on non-multiple-of-8 shapes."""

import struct

import numpy as np
import pytest

from koalas_spark.operators.multimodal import (
    decode_qoi_gray,
    decode_tiff_gray,
    encode_qoi_gray,
    encode_tiff_gray,
)


def _tiff_mm_two_strips(img: np.ndarray) -> bytes:
    """Hand-built BIG-endian TIFF with TWO strips (the encoder writes
    LE single-strip only, so this exercises the decoder's other
    paths)."""
    h, w = img.shape
    half = h // 2
    s1 = img[:half].tobytes()
    s2 = img[half:].tobytes()
    SHORT, LONG = 3, 4
    n_entries = 9
    # layout: header(8) IFD(2+9*12+4) offsets-arrays(2*4 + 2*4) strips
    ifd_off = 8
    arr_off = ifd_off + 2 + n_entries * 12 + 4
    strip1_off = arr_off + 16
    strip2_off = strip1_off + len(s1)
    entries = [
        (256, LONG, 1, w),
        (257, LONG, 1, h),
        (258, SHORT, 1, 8),
        (259, SHORT, 1, 1),
        (262, SHORT, 1, 1),
        (273, LONG, 2, arr_off),  # StripOffsets -> external array
        (277, SHORT, 1, 1),
        (278, LONG, 1, half),
        (279, LONG, 2, arr_off + 8),  # StripByteCounts -> external
    ]
    out = struct.pack(">2sHI", b"MM", 42, ifd_off)
    out += struct.pack(">H", n_entries)
    for tag, typ, cnt, val in entries:
        if typ == SHORT and cnt == 1:
            out += struct.pack(">HHIHH", tag, typ, cnt, val, 0)
        else:
            out += struct.pack(">HHII", tag, typ, cnt, val)
    out += struct.pack(">I", 0)
    out += struct.pack(">II", strip1_off, strip2_off)
    out += struct.pack(">II", len(s1), len(s2))
    return out + s1 + s2


def test_tiff_le_roundtrip_exact():
    img = np.arange(256, dtype=np.uint8).reshape(16, 16)
    assert (decode_tiff_gray(encode_tiff_gray(img)) == img).all()


def test_tiff_big_endian_multi_strip_decode():
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(16, 16)).astype(np.uint8)
    assert (decode_tiff_gray(_tiff_mm_two_strips(img)) == img).all()


def test_tiff_rejects_garbage_and_compressed():
    with pytest.raises(ValueError):
        decode_tiff_gray(b"notatiff....")
    img = np.zeros((8, 8), np.uint8)
    t = bytearray(encode_tiff_gray(img))
    # flip Compression (tag 259) value to 5 (LZW) in the LE IFD
    n = struct.unpack("<H", t[8:10])[0]
    for i in range(n):
        o = 10 + 12 * i
        if struct.unpack("<H", t[o : o + 2])[0] == 259:
            t[o + 8 : o + 10] = struct.pack("<H", 5)
    with pytest.raises(NotImplementedError):
        decode_tiff_gray(bytes(t))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_qoi_roundtrip_random(seed):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, size=(16, 16)).astype(np.uint8)
    assert (decode_qoi_gray(encode_qoi_gray(img)) == img).all()


def test_qoi_op_coverage():
    # long runs (RUN), revisited values (INDEX), +/-1 steps (DIFF),
    # medium steps (LUMA), big jumps (RGB literal) in one raster
    row = np.array(
        [0] * 62 + [0, 1, 2, 1, 0] + [40, 48, 56] + [200, 10]
        + [10] * 120 + [0] * 67,
        dtype=np.uint8,
    )[:256]
    img = row.reshape(16, 16)
    assert (decode_qoi_gray(encode_qoi_gray(img)) == img).all()


def test_qoi_rejects_garbage():
    with pytest.raises(ValueError):
        decode_qoi_gray(b"nope" + b"\x00" * 16)


def test_dhash_non_multiple_of_8_uses_area_cross_multiplication():
    # 12x20: pooling blocks have UNEQUAL areas, so the neighbor
    # compare must cross-multiply areas; verify against a direct
    # float-mean reference
    from koalas_spark.operators.multimodal import dhash_images  # noqa: F401

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(12, 20)).astype(np.int64)
    h, w = img.shape
    ye = (np.arange(9) * h) // 8
    xe = (np.arange(9) * w) // 8
    bs = np.array(
        [
            [
                img[ye[r] : ye[r + 1], xe[c] : xe[c + 1]].sum()
                for c in range(8)
            ]
            for r in range(8)
        ]
    )
    areas = (ye[1:] - ye[:-1])[:, None] * (xe[1:] - xe[:-1])[None, :]
    means = bs / areas
    expected = (means > np.roll(means, -1, axis=1)).ravel()
    nb = np.roll(bs, -1, axis=1)
    na = np.roll(areas, -1, axis=1)
    got = (bs * na > nb * areas).ravel()
    assert (got == expected).all()
