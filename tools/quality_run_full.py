"""Flagship-config quality trajectory at FULL KITTI-360 scale.

Extends tools/production_run.py (throughput/HBM proof) with the quality
axis: trains the SHIPPED flagship configuration (built by
production_run.build_flagship_trainer — 4x8 hash, 4x32 flow, LiDAR K=96 /
camera K=128, flow + URF + error-map + patch schedule, occupancy mode) on
the synthetic stand-in scene at full KITTI-360 geometry — 64 frames,
66x1030 panos, 2048+2048 joint rays — and evaluates the held-out val
frames periodically with the production streaming renderer.  The
reference's quality loop is ``/root/reference/nvsf/nerf/trainer.py:1019-1099``
(train) + ``:1458-1846`` (eval every ``eval_interval``); this is that loop
at that scale, one dataset mount away from the real thing.

Each epoch is ONE train_one_epoch call (the trainer's internal
interval-split handles the watchdog), so EMA decays once per epoch exactly
like the CLI loop and the reported loss is the true epoch mean.

Usage: python tools/quality_run_full.py [--epochs 60] [--eval-every 15]
Writes one JSON line per epoch and per eval to stdout.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from production_run import build_flagship_trainer, hbm_stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--eval-every", type=int, default=15)
    ap.add_argument("--frames", type=int, default=64)
    args = ap.parse_args()

    t0 = time.time()
    cfg, tr, train_scene, val_scene = build_flagship_trainer(
        args.frames, args.epochs, "/tmp/nvsf_quality")
    from nvsf_tpu.train.evaluate import evaluate
    print(json.dumps({"config": {
        "rays": [cfg.num_rays_lidar, cfg.num_rays],
        "K": [cfg.num_steps_occ, cfg.num_steps_occ_rgb],
        "hash": [cfg.n_levels_hash, cfg.n_features_per_level_hash],
        "flow": [cfg.flow_n_levels, cfg.flow_n_features_per_level],
        "frames": [len(train_scene), len(val_scene)],
        "pano": [train_scene.H_lidar, train_scene.W_lidar]}}), flush=True)

    rng = np.random.default_rng(0)
    for ep in range(1, args.epochs + 1):
        tr.epoch = ep
        te0 = time.time()
        stats = tr.train_one_epoch(order=rng.permutation(len(train_scene)))
        print(json.dumps({"epoch": ep, "loss": round(stats.loss, 3),
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
