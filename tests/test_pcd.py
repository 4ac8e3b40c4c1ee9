"""PCD reader/writer tests (ascii, binary, binary_compressed + LZF)."""
import numpy as np
import pytest

from probabilistic_point_clouds_registration_tpu.io.pcd import (
    load_pcd,
    lzf_compress,
    lzf_decompress,
    save_pcd,
)


@pytest.mark.parametrize("mode", ["ascii", "binary", "binary_compressed"])
def test_roundtrip(tmp_path, mode):
    rng = np.random.default_rng(0)
    pts = (rng.random((123, 3)) * 100 - 50).astype(np.float32)
    path = tmp_path / f"cloud_{mode}.pcd"
    save_pcd(path, pts, mode=mode)
    loaded = load_pcd(path)
    np.testing.assert_allclose(loaded, pts, rtol=1e-6 if mode == "ascii" else 0)


def test_load_extra_fields(tmp_path):
    # A PCD with intensity interleaved — xyz extraction must skip it.
    path = tmp_path / "xyzi.pcd"
    body = "\n".join("1.0 2.0 3.0 9.9" for _ in range(4))
    path.write_text(
        "VERSION 0.7\nFIELDS x y z intensity\nSIZE 4 4 4 4\nTYPE F F F F\n"
        "COUNT 1 1 1 1\nWIDTH 4\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
        "POINTS 4\nDATA ascii\n" + body + "\n"
    )
    pts = load_pcd(path)
    assert pts.shape == (4, 3)
    np.testing.assert_allclose(pts, np.tile([1.0, 2.0, 3.0], (4, 1)))


def test_binary_with_extra_fields(tmp_path):
    path = tmp_path / "xyzi_bin.pcd"
    n = 7
    rec = np.zeros(n, dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"), ("i", "<f4")])
    rng = np.random.default_rng(1)
    for name in "xyz":
        rec[name] = rng.random(n).astype(np.float32)
    rec["i"] = 42.0
    header = (
        "VERSION 0.7\nFIELDS x y z i\nSIZE 4 4 4 4\nTYPE F F F F\nCOUNT 1 1 1 1\n"
        f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS {n}\nDATA binary\n"
    )
    path.write_bytes(header.encode() + rec.tobytes())
    pts = load_pcd(path)
    np.testing.assert_array_equal(pts[:, 0], rec["x"])
    np.testing.assert_array_equal(pts[:, 2], rec["z"])


def test_lzf_roundtrip():
    rng = np.random.default_rng(2)
    data = rng.integers(0, 255, size=10_000, dtype=np.uint8).tobytes()
    comp = lzf_compress(data)
    assert lzf_decompress(comp, len(data)) == data


def test_lzf_backref_decode():
    # Hand-built LZF stream with a back-reference: literal "abc" then a
    # 3-byte back-reference to offset-3 => "abcabc".
    # ctrl literal: 0x02 ("run of 3"), then 'a','b','c'
    # ctrl backref: length=3 -> L=1 (L+2=3), offset=3 -> ctrl=(1<<5)|(2>>8)=0x20, low=2
    stream = bytes([0x02]) + b"abc" + bytes([0x20 | 0x00, 0x02])
    assert lzf_decompress(stream, 6) == b"abcabc"


def test_missing_file_raises():
    with pytest.raises(OSError):
        load_pcd("/nonexistent/cloud.pcd")
