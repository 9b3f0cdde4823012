"""Evaluation pipeline tests: meters over rendered frames, fg/bg category
masks from annotations, refined eval, artifact/JSON outputs."""

import json
import os

import numpy as np
import pytest

from nvsf_tpu.data.synthetic import make_synthetic_scene
from nvsf_tpu.lib import masks as masklib
from nvsf_tpu.train.evaluate import evaluate
from nvsf_tpu.train.trainer import Trainer

from test_trainer import SCENE_SPEC, tiny_config


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    ws = str(tmp_path_factory.mktemp("ws"))
    scene = make_synthetic_scene(SCENE_SPEC, split="train")
    tr = Trainer(tiny_config(enable_rgb=True, change_patch_size_lidar=[1]),
                 scene, workspace=ws)
    # the meters only need a FUNCTIONING model, not a converged one — one
    # short epoch keeps the module fixture's cost at ~one step compile
    tr.epoch = 1
    tr.train_one_epoch(order=np.arange(2))
    return tr


def test_masks_from_annotations():
    scene = make_synthetic_scene(SCENE_SPEC, split="val")
    assert scene.annotations and scene.annotations[0]
    gt = scene.images_lidar[0]
    static_m, dyn_m = masklib.compute_object_masks_pano(
        gt[:, :, 2], scene.poses_lidar[0], scene.annotations[0],
        scale=SCENE_SPEC.scale, offset=(0, 0, 0),
        intrinsics_lidar=scene.intrinsics_lidar,
        intrinsics_hoz_lidar=scene.intrinsics_hoz_lidar,
        max_depth=SCENE_SPEC.max_depth)
    assert static_m.shape == gt.shape[:2]
    assert dyn_m.sum() > 0          # the moving sphere is visible
    assert static_m.sum() > dyn_m.sum()


def test_image_masks_from_annotations():
    scene = make_synthetic_scene(SCENE_SPEC, split="val")
    st, dy = masklib.compute_object_masks_image(
        scene.poses[0], scene.intrinsics, scene.annotations[0],
        scene.H, scene.W, scale=SCENE_SPEC.scale, offset=(0, 0, 0))
    assert st.shape == (scene.H, scene.W)
    assert dy.sum() > 0


def test_evaluate_produces_all_categories(trained, tmp_path):
    val = make_synthetic_scene(SCENE_SPEC, split="val")
    res = evaluate(trained, val, save_dir=str(tmp_path), name="t",
                   write_outputs=True, log_fn=None)
    assert set(res) == {"combined", "background", "foreground"}
    comb = res["combined"]
    assert "point" in comb and "depth" in comb and "raydrop" in comb
    assert "rgb_psnr" in comb and comb["rgb_psnr"] > 5
    cd, f = comb["point"]
    assert np.isfinite(cd)
    # artifacts
    assert os.path.exists(tmp_path / "t_error_matrix_combined.json")
    assert os.path.exists(tmp_path / "t_0000_depth.png")
    assert os.path.exists(tmp_path / "t_0000_rgb.png")
    assert os.path.exists(tmp_path / "t_0000_pcd_lidar.txt")
    j = json.loads((tmp_path / "t_error_matrix_combined.json").read_text())
    assert j["category"] == "combined"


@pytest.mark.slow
def test_refine_then_refined_eval(trained, tmp_path):
    losses = trained.refine(steps=30, log_fn=None)
    assert trained.has_unet
    val = make_synthetic_scene(SCENE_SPEC, split="val")
    res = evaluate(trained, val, use_refine=True, log_fn=None)
    assert np.isfinite(res["combined"]["raydrop"][0])


def test_video_export_fallback(tmp_path):
    """Video export writes mp4 when an ffmpeg backend exists, else falls
    back to native GIF — either way a playable file must appear."""
    from nvsf_tpu.train.test_mode import _write_videos
    depth = [np.full((8, 16), i * 20, np.uint8) for i in range(5)]
    rgb = [np.full((8, 16, 3), i * 20, np.uint8) for i in range(5)]
    msgs = []
    _write_videos(str(tmp_path), "t", depth, rgb, msgs.append)
    for stem in ("t_depth", "t_rgb"):
        paths = [tmp_path / f"{stem}.mp4", tmp_path / f"{stem}.gif"]
        written = [p for p in paths if p.exists()]
        assert written, f"no video written for {stem}: {msgs}"
        assert written[0].stat().st_size > 0
        if written[0].suffix == ".gif":
            # pin the duration semantics: this imageio passes duration
            # through in MILLISECONDS (older versions used seconds —
            # a 100s/frame GIF would be a frozen animation)
            from PIL import Image
            im = Image.open(written[0])
            im.seek(1)
            assert 50 <= im.info.get("duration", 0) <= 200, im.info


def test_novel_sensor_render(trained):
    """Novel intrinsics/resolution render: double the vertical beams."""
    val = make_synthetic_scene(SCENE_SPEC, split="val")
    out = trained.render_pano(val.poses_lidar[0], float(val.times[0]),
                              SCENE_SPEC.H_lidar * 2, SCENE_SPEC.W_lidar,
                              (12.0, 44.0), val.intrinsics_hoz_lidar)
    assert out["depth"].shape == (SCENE_SPEC.H_lidar * 2, SCENE_SPEC.W_lidar)
    assert np.isfinite(out["depth"]).all()
