"""LAS 1.2 I/O: byte-level header golden tests against the reference layout
(lasio.cpp:38-48 reader offsets, lasio.cpp:141-204 writer layout) and
round-trip fidelity."""

import numpy as np
import pytest

from iterativeclosestpoint_tpu.io.las import (
    HEADER_SIZE,
    read_header,
    read_las,
    read_las_batches,
    write_las,
)
from iterativeclosestpoint_tpu.utils.synth import make_cloud


def test_header_golden_bytes(tmp_path):
    pts = np.array([[1.25, -2.5, 3.75], [4.0, 5.0, 6.0]])
    p = tmp_path / "golden.las"
    write_las(p, pts, scale=(0.001, 0.001, 0.001), offset=(1.0, -3.0, 3.0))

    raw = p.read_bytes()
    assert raw[:4] == b"LASF"
    assert raw[24] == 1 and raw[25] == 2  # version 1.2
    assert int.from_bytes(raw[94:96], "little") == HEADER_SIZE  # header size
    assert int.from_bytes(raw[96:100], "little") == HEADER_SIZE  # data offset
    assert raw[104] == 0  # point format 0
    assert int.from_bytes(raw[105:107], "little") == 20  # record length
    assert int.from_bytes(raw[107:111], "little") == 2  # point count
    assert np.frombuffer(raw, "<f8", 1, 131)[0] == 0.001  # x scale
    assert np.frombuffer(raw, "<f8", 1, 155)[0] == 1.0  # x offset
    # Bounds block: max/min interleaved per axis (lasio.cpp:177-182).
    assert np.frombuffer(raw, "<f8", 1, 179)[0] == 4.0  # max x
    assert np.frombuffer(raw, "<f8", 1, 187)[0] == 1.25  # min x
    assert np.frombuffer(raw, "<f8", 1, 211)[0] == 6.0  # max z
    assert np.frombuffer(raw, "<f8", 1, 219)[0] == 3.75  # min z
    assert len(raw) == HEADER_SIZE + 2 * 20
    # First record: int32 (1.25-1.0)/0.001 = 250
    assert int.from_bytes(raw[227:231], "little", signed=True) == 250


def test_roundtrip_preserves_georeference(tmp_path):
    """CLI writer policy: original scale/offset preserved
    (icp_registration.cpp:766-773)."""
    utm = np.array([500_000.0, 4_000_000.0, 1_200.0])
    pts = make_cloud(5000, seed=1) + utm
    p = tmp_path / "rt.las"
    write_las(p, pts, scale=(0.001, 0.001, 0.001), offset=tuple(utm))
    back, hdr = read_las(p)
    assert hdr.point_count == 5000
    assert hdr.scale == (0.001, 0.001, 0.001)
    assert hdr.offset == tuple(utm)
    np.testing.assert_allclose(back, pts, atol=0.0005 + 1e-9)  # scale/2


def test_rebase_mode_matches_gui_writer(tmp_path):
    """GUI writer re-bases offset to the cloud min (lasio.cpp:167-174)."""
    pts = make_cloud(100, seed=2) + 1000.0
    p = tmp_path / "gui.las"
    hdr = write_las(p, pts, rebase=True)
    assert hdr.scale == (0.001, 0.001, 0.001)
    np.testing.assert_allclose(hdr.offset, pts.min(axis=0))
    back, _ = read_las(p)
    np.testing.assert_allclose(back, pts, atol=0.0005 + 1e-6)


def test_max_points_and_stride(tmp_path):
    pts = make_cloud(1000, seed=3)
    p = tmp_path / "cap.las"
    write_las(p, pts)
    capped, _ = read_las(p, max_points=100)
    assert len(capped) == 100
    strided, _ = read_las(p, stride=50)  # the CLI's 1/50 downsample
    assert len(strided) == 20
    full, _ = read_las(p)
    np.testing.assert_array_equal(strided, full[::50])


def test_batch_reader_matches_full_read(tmp_path):
    pts = make_cloud(2500, seed=4)
    p = tmp_path / "batch.las"
    write_las(p, pts)
    full, _ = read_las(p)
    batches = list(read_las_batches(p, batch_size=700))
    assert [len(b) for b in batches] == [700, 700, 700, 400]
    np.testing.assert_array_equal(np.vstack(batches), full)


def test_signature_validation(tmp_path):
    p = tmp_path / "bad.las"
    p.write_bytes(b"NOPE" + b"\x00" * 300)
    with pytest.raises(ValueError, match="LASF"):
        read_header(p)


def test_longer_point_records(tmp_path):
    """Reader must honor point_record_length from the header (format 1+,
    28-byte records) — only xyz int32s are decoded."""
    pts = np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0], [7.0, 8.0, 9.0]])
    p = tmp_path / "fmt1.las"
    write_las(p, pts, scale=(0.01, 0.01, 0.01), offset=(0, 0, 0))
    raw = bytearray(p.read_bytes())
    # Rewrite as 28-byte records (pad each with 8 extra bytes).
    recs = [raw[227 + i * 20 : 227 + (i + 1) * 20] + b"\x00" * 8 for i in range(3)]
    raw[105:107] = (28).to_bytes(2, "little")
    out = bytes(raw[:227]) + b"".join(recs)
    p.write_bytes(out)
    back, hdr = read_las(p)
    assert hdr.point_record_length == 28
    np.testing.assert_allclose(back, pts, atol=0.005 + 1e-9)


def test_native_engine_matches_numpy(tmp_path):
    import pytest as _pytest

    from iterativeclosestpoint_tpu.runtime.native import native_available

    if not native_available():
        _pytest.skip("native toolchain unavailable")
    pts = make_cloud(3000, seed=9) + 1000.0
    p = tmp_path / "n.las"
    write_las(p, pts, scale=(0.001, 0.001, 0.001), offset=(999.0, 999.0, 999.0))
    a, _ = read_las(p, engine="numpy")
    b, _ = read_las(p, engine="native")
    # -O3 FMA contraction rounds int·scale+offset differently than numpy's
    # separate mul+add — equality up to one ulp of the coordinate scale.
    np.testing.assert_allclose(a, b, atol=1e-9)
