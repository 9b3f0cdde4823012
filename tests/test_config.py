"""Config-system tests: reference config txt parses identically."""

import os
import textwrap

from nvsf_tpu.config import NVSFConfig, load_config, parse_config_file

REF_CONFIG = textwrap.dedent("""\
    # Scene
    dataloader = kitti360
    path = nvsf/data/kitti360
    sequence_id = 1908
    num_frames = 64
    intrinsics_lidar = [2.0, 26.9]
    intrinsics_hoz_lidar = [180.0, 360.0]
    lidar_max_depth = 80.0
    scale = 0.010851959895748291
    offset = [1063.6691809462566, 3765.2393276654057, 112.25726768813286]

    # For Loss function
    flow_loss
    grad_loss
    use_error_map
    use_refine

    # For Rendering
    enable_lidar
    enable_rgb

    # Training configuration
    fp16
    preload
    workspace = nvsf/log/kitti360
    ckpt = scratch
""")


def test_parse_reference_config(tmp_path):
    p = tmp_path / "kitti360_1908.txt"
    p.write_text(REF_CONFIG)
    d = parse_config_file(str(p))
    assert d["dataloader"] == "kitti360"
    assert d["sequence_id"] == 1908 or d["sequence_id"] == "1908"
    assert d["num_frames"] == 64
    assert d["intrinsics_lidar"] == [2.0, 26.9]
    assert d["offset"][0] == 1063.6691809462566
    assert d["flow_loss"] is True
    assert d["enable_rgb"] is True
    assert d["fp16"] is True
    assert d["ckpt"] == "scratch"


def test_load_config_merge(tmp_path):
    p = tmp_path / "cfg.txt"
    p.write_text(REF_CONFIG)
    cfg = load_config(["--config", str(p), "--lr", "0.005", "--epochs", "3"])
    assert cfg.lr == 0.005
    assert cfg.epochs == 3
    assert cfg.enable_lidar and cfg.enable_rgb
    assert cfg.scale == 0.010851959895748291


def test_finalize_scales_near_far(tmp_path):
    p = tmp_path / "cfg.txt"
    p.write_text(REF_CONFIG)
    cfg = load_config(["--config", str(p)])
    out = cfg.finalize(steps_per_epoch=60)
    assert abs(out.lidar_max_depth - 80.0 * cfg.scale) < 1e-9
    assert abs(out.min_near_lidar - 1.0 * cfg.scale) < 1e-9
    assert out.iters == out.epochs * 60


def test_config_roundtrip(tmp_path):
    cfg = NVSFConfig(enable_lidar=True, num_rays_lidar=1024)
    path = os.path.join(tmp_path, "dump.txt")
    cfg.save(path)
    d = parse_config_file(path)
    assert d["num_rays_lidar"] == 1024


def test_hash_size_dynamic_threads_to_field_spec(tmp_path):
    # per-plane dynamic hash sizes reach HashGrid4DSpec through the
    # config (and survive a config-txt round trip)
    from nvsf_tpu.train.trainer import field_spec_from_config

    cfg = NVSFConfig(hash_size_dynamic=[13, 11, 11])
    spec = field_spec_from_config(cfg)
    assert spec.hash_spec.hash_size_dynamic == (13, 11, 11)
    path = os.path.join(tmp_path, "dyn.txt")
    cfg.save(path)
    assert parse_config_file(path)["hash_size_dynamic"] == [13, 11, 11]
