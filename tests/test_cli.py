"""End-to-end CLI tests (the reference executable's surface,
prob_point_cloud_registration_ex.cc:26-190)."""
import numpy as np
import pytest

from probabilistic_point_clouds_registration_tpu.cli import main
from probabilistic_point_clouds_registration_tpu.io.pcd import load_pcd, save_pcd
from probabilistic_point_clouds_registration_tpu.io.synthetic import transform_cloud, wave_grid


@pytest.fixture
def pair_files(tmp_path):
    source = wave_grid().astype(np.float32)
    m = np.eye(4)
    a = 0.08
    m[:3, :3] = [[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]]
    m[0, 3] = 0.2
    target = transform_cloud(source, m)
    src = tmp_path / "src.pcd"
    tgt = tmp_path / "tgt.pcd"
    gt = tmp_path / "gt.pcd"
    save_pcd(src, source)
    save_pcd(tgt, target)
    save_pcd(gt, target)  # perfect alignment ground truth
    return src, tgt, gt, source, target


def test_cli_end_to_end_with_dump_and_gt(pair_files, tmp_path, monkeypatch, capsys):
    src, tgt, gt, source, target = pair_files
    monkeypatch.chdir(tmp_path)
    rc = main(
        [str(src), str(tgt), "-r", "3", "-m", "8", "-i", "20",
         "-g", str(gt), "--dump", "-v", "--dtype", "float64"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "MSE w.r.t. ground truth" in out
    assert "Transformation history:" in out

    # --dump wrote <src>_<tgt>_summary.txt with params header + CSV.
    summary = tmp_path / "src_tgt_summary.txt"
    assert summary.exists()
    text = summary.read_text()
    assert text.startswith("Source: ")
    assert "iter, n_success_steps, initial_cost, final_cost" in text

    # -v saved aligned_<source-name>.pcd; it should be closer to target.
    aligned = load_pcd(tmp_path / "aligned_src.pcd")
    err_before = np.mean(np.linalg.norm(source - target, axis=1))
    err_after = np.mean(np.linalg.norm(aligned - target, axis=1))
    assert err_after < err_before / 3


def test_cli_gaussian_flag(pair_files, tmp_path, monkeypatch, capsys):
    src, tgt, _, _, _ = pair_files
    monkeypatch.chdir(tmp_path)
    rc = main([str(src), str(tgt), "-u", "-v", "-i", "3", "--dtype", "float64"])
    assert rc == 0
    assert "Using gaussian model" in capsys.readouterr().out


def test_cli_missing_source_errors(tmp_path, capsys):
    rc = main([str(tmp_path / "nope.pcd"), str(tmp_path / "nope2.pcd")])
    assert rc == 1
    assert "Could not load source cloud" in capsys.readouterr().out


def test_cli_bad_ground_truth_degrades(pair_files, tmp_path, monkeypatch, capsys):
    # A failed GT load degrades to no-GT mode, not an error (..._ex.cc:132-135).
    src, tgt, _, _, _ = pair_files
    monkeypatch.chdir(tmp_path)
    rc = main([str(src), str(tgt), "-i", "2", "-g", str(tmp_path / "missing.pcd"),
               "--dtype", "float64"])
    assert rc == 0
    assert "Could not load ground truth" in capsys.readouterr().out
