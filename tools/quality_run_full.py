"""Flagship-config quality trajectory at FULL KITTI-360 scale.

Extends tools/production_run.py (throughput/HBM proof) with the quality
axis: trains the SHIPPED flagship configuration (configs/kitti360_1908.txt
shapes — 4x8 hash, 4x32 flow, LiDAR K=96 / camera K=128, flow + URF +
error-map + patch schedule, occupancy mode) on the synthetic stand-in
scene at full KITTI-360 geometry — 64 frames, 66x1030 panos, 2048+2048
joint rays — and evaluates the held-out val frames periodically with the
production streaming renderer.  The reference's quality loop is
``/root/reference/nvsf/nerf/trainer.py:1019-1099`` (train) +
``:1458-1846`` (eval every ``eval_interval``); this is that loop at that
scale, one dataset mount away from the real thing.

Usage: python tools/quality_run_full.py [--epochs 60] [--eval-every 15]
Writes one JSON line per epoch and per eval to stdout.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def hbm_stats():
    import jax
    try:
        s = jax.local_devices()[0].memory_stats()
        return {"peak_gb": round((s.get("peak_bytes_in_use") or 0) / 2**30, 2)}
    except Exception:
        return {}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--eval-every", type=int, default=15)
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--dispatch", type=int, default=8,
                    help="steps per scan dispatch (tunnel watchdog bound)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/nvsf_tpu_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from nvsf_tpu.config import NVSFConfig, parse_config_file
    from nvsf_tpu.data.synthetic import (SyntheticSceneSpec,
                                         make_synthetic_scene)
    from nvsf_tpu.train.evaluate import evaluate
    from nvsf_tpu.train.trainer import Trainer

    flag = parse_config_file("configs/kitti360_1908.txt")
    spec = SyntheticSceneSpec(num_frames=args.frames, H_lidar=66,
                              W_lidar=1030, H=94, W=352, max_depth=80.0,
                              scale=1.0 / 81.0)
    train_scene = make_synthetic_scene(spec, split="train")
    val_scene = make_synthetic_scene(spec, split="val")
    overrides = dict(
        num_frames=spec.num_frames, scale=spec.scale, bound=1.0,
        min_near_lidar=1.0 * spec.scale, lidar_max_depth=80.0 * spec.scale,
        min_near=1.0 * spec.scale,
        intrinsics_lidar=list(spec.intrinsics_lidar),
        intrinsics_hoz_lidar=list(spec.intrinsics_hoz_lidar),
        dataloader="synthetic", path="", workspace="/tmp/nvsf_quality",
        epochs=args.epochs)
    cfg_d = dict(flag)
    cfg_d.update(overrides)
    cfg = NVSFConfig.from_dict(cfg_d).finalize(
        steps_per_epoch=len(train_scene))
    print(json.dumps({"config": {
        "rays": [cfg.num_rays_lidar, cfg.num_rays],
        "K": [cfg.num_steps_occ, cfg.num_steps_occ_rgb],
        "hash": [cfg.n_levels_hash, cfg.n_features_per_level_hash],
        "flow": [cfg.flow_n_levels, cfg.flow_n_features_per_level],
        "frames": [len(train_scene), len(val_scene)],
        "pano": [train_scene.H_lidar, train_scene.W_lidar]}}), flush=True)

    t0 = time.time()
    tr = Trainer(cfg, train_scene, workspace="/tmp/nvsf_quality")
    rng = np.random.default_rng(0)
    for ep in range(1, args.epochs + 1):
        tr.epoch = ep
        order = rng.permutation(len(train_scene))
        te0 = time.time()
        done = 0
        loss = float("nan")
        while done < len(order):
            n = min(args.dispatch, len(order) - done)
            stats = tr.train_one_epoch(order=order[done:done + n])
            loss = stats.loss
            done += n
        print(json.dumps({"epoch": ep, "loss": round(loss, 3),
                          "epoch_s": round(time.time() - te0, 1),
                          "t": round(time.time() - t0, 1),
                          **hbm_stats()}), flush=True)
        if ep % args.eval_every == 0 or ep == args.epochs:
            tv0 = time.time()
            res = evaluate(tr, val_scene, use_ema=True,
                           log_fn=lambda *a: None)
            c = res["combined"]
            print(json.dumps({
                "eval_epoch": ep,
                "CD": round(c["point"][0], 4),
                "F": round(c["point"][1], 4),
                "depth_RMSE": round(c["depth"][0], 4),
                "intensity_RMSE": round(c["intensity"][0], 4),
                "raydrop_acc": round(c["raydrop"][1], 4),
                "PSNR": round(c["rgb_psnr"], 2),
                "SSIM": round(c["rgb_ssim"], 4),
                "eval_s": round(time.time() - tv0, 1),
                "t": round(time.time() - t0, 1)}), flush=True)
    tr.save_checkpoint(full=True)
    print(json.dumps({"done": True, "total_s": round(time.time() - t0, 1),
                      **hbm_stats()}), flush=True)


if __name__ == "__main__":
    main()
