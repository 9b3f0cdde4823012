"""Flagship KITTI-scale production-run proof (VERDICT r2 item 6).

Trains the SHIPPED flagship configuration (configs/kitti360_1908.txt
shapes: 4-level x 8-feature hash encoders, 4-scale K-planes, flow + URF +
error-map + patch schedule, occupancy render mode) on a synthetic
stand-in scene at FULL KITTI-360 scale — 64 frames, 66x1030 panos,
2048+2048 joint rays — through the real CLI epoch loop (interval-split
scan dispatches, occupancy refresh cadence, checkpointing), and records
step time, cold/warm compile time, and HBM high-water.

This is the "one dataset-mount away" evidence that the production path
sustains at scale, not just the bench harness.

Usage: python tools/production_run.py [--epochs 3] [--frames 64]
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
        return {"bytes_in_use": s.get("bytes_in_use"),
                "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                "bytes_limit": s.get("bytes_limit")}
    except Exception:
        return {}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=3)
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
    from nvsf_tpu.train.trainer import Trainer

    # flagship config values (shapes, losses, schedules) with the synthetic
    # stand-in scene's geometry constants
    flag = parse_config_file("configs/kitti360_1908.txt")
    spec = SyntheticSceneSpec(num_frames=args.frames, H_lidar=66,
                              W_lidar=1030, H=94, W=352, max_depth=80.0,
                              scale=1.0 / 81.0)
    scene = make_synthetic_scene(spec, split="train")
    overrides = dict(
        num_frames=spec.num_frames, scale=spec.scale, bound=1.0,
        min_near_lidar=1.0 * spec.scale, lidar_max_depth=80.0 * spec.scale,
        min_near=1.0 * spec.scale,
        dataloader="synthetic", path="", workspace="/tmp/nvsf_prod",
        epochs=args.epochs)
    cfg_d = dict(flag)
    cfg_d.update(overrides)
    cfg = NVSFConfig.from_dict(cfg_d).finalize(
        steps_per_epoch=len(scene))
    print(json.dumps({"config": {
        "num_rays_lidar": cfg.num_rays_lidar, "num_rays": cfg.num_rays,
        "num_steps": cfg.num_steps, "num_steps_occ": cfg.num_steps_occ,
        "render_mode": cfg.render_mode,
        "n_levels_hash": cfg.n_levels_hash,
        "n_features_per_level_hash": cfg.n_features_per_level_hash,
        "flow": [cfg.flow_n_levels, cfg.flow_n_features_per_level],
        "enable_rgb": cfg.enable_rgb, "flow_loss": cfg.flow_loss,
        "frames": len(scene), "pano": [scene.H_lidar, scene.W_lidar]}}),
        flush=True)

    t0 = time.time()
    tr = Trainer(cfg, scene, workspace="/tmp/nvsf_prod")
    print(json.dumps({"init_s": round(time.time() - t0, 1),
                      "hbm_after_init": hbm_stats()}), flush=True)

    # the tunnel watchdog kills >60s device programs: dispatch in
    # interval-sized groups like the CLI does, but bound the group length
    rng = np.random.default_rng(0)
    for ep in range(1, args.epochs + 1):
        tr.epoch = ep
        order = rng.permutation(len(scene))
        te0 = time.time()
        # group dispatches at the occ interval (mirrors train_one_epoch's
        # split) but cap each at --dispatch steps for the watchdog
        done = 0
        first_dispatch_s = None
        while done < len(order):
            n = min(args.dispatch, len(order) - done)
            td = time.time()
            tr.train_one_epoch(order=order[done:done + n])
            dt = time.time() - td
            if first_dispatch_s is None:
                first_dispatch_s = dt
            done += n
        ep_s = time.time() - te0
        steps = len(order)
        rays = cfg.num_rays_lidar + (cfg.num_rays if cfg.enable_rgb else 0)
        warm_step = (ep_s - (first_dispatch_s or 0)) / max(
            steps - args.dispatch, 1)
        print(json.dumps({
            "epoch": ep, "epoch_s": round(ep_s, 1),
            "first_dispatch_s": round(first_dispatch_s or 0, 1),
            "warm_step_s": round(warm_step, 3),
            "rays_per_sec": round(rays / warm_step, 1),
            "occ_refreshes": tr._occ_refresh_count,
            "hbm": hbm_stats()}), flush=True)
    tr.save_checkpoint(full=True)
    print(json.dumps({"done": True, "total_s": round(time.time() - t0, 1),
                      "hbm_final": hbm_stats()}), flush=True)


if __name__ == "__main__":
    main()
