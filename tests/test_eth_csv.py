"""ETH ASL CSV scan ingestion (BASELINE config #3 real-data path)."""
import numpy as np
import pytest

from probabilistic_point_clouds_registration_tpu.io.eth_csv import (
    list_eth_scans,
    load_eth_csv,
)


def test_header_named_columns(tmp_path):
    f = tmp_path / "Hokuyo_0.csv"
    f.write_text(
        "timestamp,x,y,z,intensity\n"
        "100.5,1.0,2.0,3.0,17\n"
        "100.6,4.0,5.0,6.0,18\n"
    )
    pts = load_eth_csv(f)
    np.testing.assert_array_equal(pts, [[1, 2, 3], [4, 5, 6]])


def test_header_extra_columns_any_order(tmp_path):
    f = tmp_path / "s.csv"
    f.write_text("idx,Z,Y,X\n0,3.0,2.0,1.0\n")
    pts = load_eth_csv(f)
    np.testing.assert_array_equal(pts, [[1, 2, 3]])


def test_headerless_four_columns_is_timestamp_xyz(tmp_path):
    f = tmp_path / "s.csv"
    f.write_text("100.0,1.0,2.0,3.0\n101.0,4.0,5.0,6.0\n")
    np.testing.assert_array_equal(load_eth_csv(f), [[1, 2, 3], [4, 5, 6]])


def test_headerless_three_columns_is_xyz(tmp_path):
    f = tmp_path / "s.csv"
    f.write_text("1.0,2.0,3.0\n")
    np.testing.assert_array_equal(load_eth_csv(f), [[1, 2, 3]])


def test_nan_rows_dropped(tmp_path):
    f = tmp_path / "s.csv"
    f.write_text("x,y,z\n1,2,3\nnan,nan,nan\n4,5,6\n")
    np.testing.assert_array_equal(load_eth_csv(f), [[1, 2, 3], [4, 5, 6]])


def test_missing_xyz_header_raises(tmp_path):
    f = tmp_path / "s.csv"
    f.write_text("a,b,c\n1,2,3\n")
    with pytest.raises(ValueError, match="x/y/z"):
        load_eth_csv(f)


def test_sequence_via_odometry(tmp_path):
    """CSV scans flow through the odometry pipeline end-to-end."""
    from probabilistic_point_clouds_registration_tpu.core.params import (
        RegistrationParams,
    )
    from probabilistic_point_clouds_registration_tpu.io.synthetic import wave_grid
    from probabilistic_point_clouds_registration_tpu.models.odometry import (
        run_odometry,
    )

    world = wave_grid()
    for i, off in enumerate(([0, 0, 0], [0.1, 0, 0], [0.2, 0, 0])):
        pts = world - np.asarray(off)
        rows = "\n".join(
            f"{100+j*0.01},{p[0]},{p[1]},{p[2]}" for j, p in enumerate(pts)
        )
        (tmp_path / f"scan_{i}.csv").write_text("timestamp,x,y,z\n" + rows + "\n")
    scans = list_eth_scans(tmp_path)
    assert len(scans) == 3
    res = run_odometry(
        scans,
        RegistrationParams(max_neighbours=8, radius=1.0, n_iter=10,
                           cost_drop_thresh=0.003),
    )
    assert len(res.poses) == 3
    # Recovered per-pair translation ~ [0.1, 0, 0].
    t = res.relative_transforms[0][:3, 3]
    np.testing.assert_allclose(t, [0.1, 0, 0], atol=0.02)
