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


def test_golden_binary_compressed_decodes():
    """Decode a checked-in binary_compressed PCD whose LZF stream was
    hand-assembled from the liblzf format spec (literal runs, a short
    back-reference, a length-extended back-reference, and an overlapping
    run-length back-reference) — an encoder-independent golden for the
    decode path the reference feeds through pcl::io::loadPCDFile
    (src/prob_point_cloud_registration_ex.cc:111-136). Round-trip tests
    alone cannot catch a self-consistent codec bug; this can."""
    from pathlib import Path

    import numpy as np

    from probabilistic_point_clouds_registration_tpu.io.pcd import (
        load_pcd,
        lzf_decompress,
    )

    golden = Path(__file__).parent / "data" / "golden_binary_compressed.pcd"
    pts = load_pcd(golden)
    expected = np.array(
        [
            [1.5, 1.5, 0.0],
            [2.5, 2.5, 0.0],
            [1.5, 1.5, 0.0],
            [2.5, 2.5, 0.0],
        ],
        np.float32,
    )
    np.testing.assert_array_equal(pts, expected)

    # The python fallback decoder must agree byte-for-byte with whatever
    # load_pcd dispatched to (the native C++ codec when built).
    raw = golden.read_bytes()
    import struct

    data_start = raw.index(b"DATA binary_compressed\n") + len(
        b"DATA binary_compressed\n"
    )
    comp_size, uncomp_size = struct.unpack_from("<II", raw, data_start)
    stream = raw[data_start + 8 : data_start + 8 + comp_size]
    import probabilistic_point_clouds_registration_tpu.native as native

    py_out = None
    saved = native.lzf_decompress
    try:
        native.lzf_decompress = lambda *a, **k: None  # force python path
        py_out = lzf_decompress(stream, uncomp_size)
    finally:
        native.lzf_decompress = saved
    expected_body = (
        struct.pack("<4f", 1.5, 2.5, 1.5, 2.5) * 2 + b"\x00" * 16
    )
    assert py_out == expected_body
    native_out = native.lzf_decompress(stream, uncomp_size)
    if native_out is not None:
        assert bytes(native_out) == expected_body
