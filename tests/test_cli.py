"""CLI end-to-end smoke test: train on the synthetic dataloader via the
main entry point, then logging/summary utilities."""

import json
import os

import numpy as np
import pytest

from nvsf_tpu.scripts.main_nvsf import main as cli_main
from nvsf_tpu.train.logging import (Logger, count_parameters, model_summary,
                                    save_sampling_heatmap)
from test_preprocess import mini_kitti  # noqa: F401 — fixture import


def test_logger_and_summary(tmp_path):
    log = Logger(str(tmp_path), "t")
    log("hello", 123)
    log.close()
    txt = (tmp_path / "log_t.txt").read_text()
    assert "hello 123" in txt

    params = {"a": [np.zeros((3, 4))], "b": {"w": np.zeros(7)}}
    assert count_parameters(params) == 19
    s = model_summary(params)
    assert "TOTAL" in s and "19" in s


def test_sampling_heatmap(tmp_path):
    p = str(tmp_path / "hm.png")
    save_sampling_heatmap(np.random.default_rng(0).uniform(1, 100, (33, 51)),
                          p)
    assert os.path.exists(p)


@pytest.mark.slow
def test_cli_synthetic_train(tmp_path):
    ws = str(tmp_path / "ws")
    argv = [
        "--dataloader", "synthetic", "--path", "unused",
        "--sequence_id", "syn",
        "--num_frames", "4", "--scale", "0.04",
        "--lidar_max_depth", "20", "--min_near_lidar", "0.5",
        "--intrinsics_lidar", "10.0", "40.0",
        "--intrinsics_hoz_lidar", "180.0", "360.0",
        "--enable_lidar",
        "--epochs", "2", "--eval_interval", "2",
        "--num_rays_lidar", "128", "--num_steps", "32",
        "--max_ray_batch", "256",
        "--min_resolution", "8", "--n_levels_plane", "2",
        "--base_resolution", "16", "--max_resolution", "64",
        "--time_resolution", "4", "--n_levels_hash", "2",
        "--log2_hashmap_size", "10",
        "--flow_n_levels", "2", "--flow_log2_hashmap_size", "6",
        "--flow_base_resolution", "8", "--flow_max_resolution", "16",
        "--workspace", ws, "--ckpt", "scratch", "--name", "smoke",
        "--refine_steps", "5",
        "--profile_dir", str(tmp_path / "trace"),
    ]
    cli_main(argv)
    # the first warm epoch wrote a device trace (SURVEY §5 profiling)
    trace_files = [str(p) for p in (tmp_path / "trace").rglob("*")
                   if p.is_file()]
    assert trace_files, "profile_dir produced no trace"

    # --test branch (``main_nvsf.py:245-300``): checkpoint load, per-frame
    # render + artifact dump, density mesh export — on the same workspace
    test_argv = [a for a in argv if a != "--profile_dir"
                 and not a.startswith(str(tmp_path / "trace"))]
    test_argv += ["--test", "--mesh_xyz_res", "24", "24", "12"]
    test_argv[test_argv.index("scratch")] = "latest"
    cli_main(test_argv)
    res = os.path.join(ws, "results")
    files = os.listdir(res)
    assert any(f.endswith("_depth.png") for f in files)
    assert any(f.endswith("_pcd_lidar.txt") for f in files)
    assert any(f.endswith("_pcd_world.txt") for f in files)
    assert any(f.endswith("_lidar.pcd") for f in files)
    assert "smoke_mesh.ply" in files
    # checkpoints + logs + validation artifacts exist
    assert os.path.isdir(os.path.join(ws, "checkpoints"))
    assert any(f.endswith(".pkl")
               for f in os.listdir(os.path.join(ws, "checkpoints")))
    assert os.path.exists(os.path.join(ws, "log_smoke.txt"))
    val = os.path.join(ws, "validation")
    assert any("error_matrix_combined" in f for f in os.listdir(val))


@pytest.mark.slow
def test_cli_novel_sensor_synthesis(mini_kitti, tmp_path_factory):
    """The reference's headline novel-sensor capability end to end
    (``base_dataset.py:170-227`` + ``trainer.py:1109-1283``): train on the
    KITTI mini-fixture with the shipped-config loss flags (flow_loss,
    use_error_map), then run ``--test`` with pose delta + new beam count +
    new intrinsics — a GT-less scene — and assert pano/pcd artifacts."""
    base, src, _ = mini_kitti
    ws = tmp_path_factory.mktemp("ns")
    from nvsf_tpu.preprocess import kitti360 as K
    cfg_path = K.preprocess_kitti360(
        src, base, "1908", recording="2013_05_28_drive_0000",
        config_dir=str(ws / "configs"), workspace=str(ws / "run"),
        log_fn=lambda *a: None, H=16, W=64)
    common = [
        "--config", str(cfg_path),
        "--workspace", str(ws / "run"),
        "--flow_loss", "--use_error_map",
        "--render_mode", "occupancy", "--num_steps_occ", "16",
        "--num_rays_lidar", "128", "--num_rays", "128",
        "--num_steps", "32", "--refine_steps", "2",
        "--n_levels_hash", "2", "--log2_hashmap_size", "8",
        "--flow_n_levels", "2", "--flow_log2_hashmap_size", "6",
        "--min_resolution", "8", "--n_levels_plane", "2",
        "--base_resolution", "16", "--max_resolution", "64",
    ]
    cli_main(common + ["--epochs", "1", "--eval_interval", "100",
                       "--ckpt", "scratch"])
    # novel sensor: +1m z, 8 vertical beams, new vertical FoV
    cli_main(common + [
        "--test", "--ckpt", "latest",
        "--delta_position", "0", "0", "1.0",
        "--V_lidar_ch", "8", "--H_lidar_ch", "32",
        "--intrinsics_lidar_new", "10.0", "40.0",
        "--mesh_xyz_res", "16", "16", "8"])
    res = os.path.join(str(ws / "run"), "results")
    files = os.listdir(res)
    assert any(f.endswith("_depth.png") for f in files)
    assert any(f.endswith("_pcd_lidar.txt") for f in files)
    assert any(f.endswith("_pcd_world.txt") for f in files)
    # the rendered panos have the NOVEL beam geometry (8 + 2 extreme rows)
    import imageio.v2 as imageio
    depth_png = sorted(f for f in files if f.endswith("_depth.png"))[0]
    assert imageio.imread(os.path.join(res, depth_png)).shape[:2] == (10, 32)


def test_phase_timers():
    import time as _t
    from nvsf_tpu.train.profiler import PhaseTimers
    tm = PhaseTimers()
    with tm.phase("a"):
        _t.sleep(0.01)
    with tm.phase("a"):
        _t.sleep(0.01)
    assert tm.counts["a"] == 2
    assert tm.totals["a"] >= 0.02
    assert "a" in tm.report()
