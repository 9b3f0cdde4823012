"""Encoder-shape quality ablation (VERDICT r2 item 5).

Runs the VALIDATION.md 60-epoch synthetic quality protocol twice —
reference encoder shape (8-level x 4-feature hash, 16x8 flow,
``/root/reference/nvsf/nerf/models/hash_field.py:108-119`` /
``flow_field.py:68-84``) vs the shipped TPU-tuned shape (4x8 hash, 8x16
flow, ``configs/kitti360_1908.txt``) — and prints the held-out-frame
metric comparison. Both shapes produce the same 32-dim encoder outputs;
the question is whether halving the multiresolution ladder hurts quality.

Usage: python tools/ablate_encoders.py [--epochs 60] [--eval-every 20]
Writes one JSON line per (shape, epoch) to stdout.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


SHAPES = {
    "ref-8x4": dict(n_levels_hash=8, n_features_per_level_hash=4,
                    flow_n_levels=16, flow_n_features_per_level=8),
    "tuned-4x8": dict(n_levels_hash=4, n_features_per_level_hash=8,
                      flow_n_levels=8, flow_n_features_per_level=16),
    # bench.py's _TPU_ENC flow shape (half the flow gather rows of 8x16;
    # same 32-dim folded output) — ablated so the bench rung and the
    # shipped config can share one quality-validated shape
    "flow-4x32": dict(n_levels_hash=4, n_features_per_level_hash=8,
                      flow_n_levels=4, flow_n_features_per_level=32),
}


def quality_run(shape_name, shape, epochs, eval_every, seed=0, occ_k=64,
                eval_k=None, rgb_k=0):
    """eval_k: render-time K used by evaluate(); defaults to the training
    occ_k. Pinning it (e.g. 32) isolates TRAINING-K quality from
    render-time truncation."""
    import dataclasses

    import jax
    from nvsf_tpu.config import NVSFConfig
    from nvsf_tpu.data.synthetic import (SyntheticSceneSpec,
                                         make_synthetic_scene)
    from nvsf_tpu.train.evaluate import evaluate
    from nvsf_tpu.train.trainer import Trainer

    spec = SyntheticSceneSpec(num_frames=8, H_lidar=32, W_lidar=96, H=40,
                              W=56, max_depth=25.0, scale=1.0 / 26.0)
    train_scene = make_synthetic_scene(spec, split="train")
    val_scene = make_synthetic_scene(spec, split="val")
    cfg = NVSFConfig.from_dict(dict(
        enable_lidar=True, enable_rgb=True,
        num_frames=spec.num_frames, scale=spec.scale, bound=1.0,
        min_near_lidar=1.0 * spec.scale, lidar_max_depth=25.0 * spec.scale,
        min_near=1.0 * spec.scale, active_sensor=True,
        num_rays=1024, num_rays_lidar=1024, num_steps=192,
        num_steps_occ=occ_k, num_steps_occ_rgb=rgb_k,
        render_mode="occupancy", occ_grid_size=64,
        log2_hashmap_size=14, n_levels_plane=4,
        use_error_map=True, grad_loss=True,
        change_patch_size_lidar=[4, 4], change_patch_size_epoch=2,
        intrinsics_lidar=list(spec.intrinsics_lidar),
        intrinsics_hoz_lidar=list(spec.intrinsics_hoz_lidar),
        iters=epochs * len(train_scene) // 1, epochs=epochs,
        workspace=f"/tmp/nvsf_ablate_{shape_name}", **shape))
    tr = Trainer(cfg, train_scene,
                 workspace=f"/tmp/nvsf_ablate_{shape_name}", seed=seed)
    t0 = time.time()
    for ep in range(1, epochs + 1):
        tr.epoch = ep
        stats = tr.train_one_epoch()
        print(json.dumps({"shape": shape_name, "epoch": ep,
                          "loss": round(stats.loss, 3),
                          "t": round(time.time() - t0, 1)}), flush=True)
        if ep % eval_every == 0 or ep == epochs:
            if eval_k is not None and eval_k != occ_k:
                train_cfg = tr.cfg
                tr.cfg = dataclasses.replace(tr.cfg, num_steps_occ=eval_k)
                tr._render_cache.clear()
            res = evaluate(tr, val_scene, use_ema=True, log_fn=lambda *a: None)
            if eval_k is not None and eval_k != occ_k:
                tr.cfg = train_cfg
                tr._render_cache.clear()
            c = res["combined"]
            # meter outputs: point=[CD, F@0.05]; depth=[RMSE, MedAE, LPIPS,
            # SSIM, PSNR]; raydrop=[RMSE, Acc, F1]
            rec = {"shape": shape_name, "epoch": ep,
                   "train_loss": round(stats.loss, 2),
                   "CD": round(c["point"][0], 4),
                   "F": round(c["point"][1], 4),
                   "depth_RMSE": round(c["depth"][0], 4),
                   "raydrop_acc": round(c["raydrop"][1], 4),
                   "PSNR": round(c["rgb_psnr"], 2),
                   "SSIM": round(c["rgb_ssim"], 4),
                   "t": round(time.time() - t0, 1)}
            print(json.dumps(rec), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--eval-every", type=int, default=20)
    ap.add_argument("--shapes", default="ref-8x4,tuned-4x8")
    ap.add_argument("--occ-K", type=int, default=64,
                    help="kept samples per ray (192 candidates); 32 matches "
                         "the flagship 768->128 compaction ratio")
    ap.add_argument("--eval-K", type=int, default=None,
                    help="render-time K for the held-out eval (default: "
                         "same as --occ-K)")
    ap.add_argument("--rgb-K", type=int, default=0,
                    help="camera-branch training K (0 = same as --occ-K)")
    ap.add_argument("--backend", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--seed", type=int, default=0,
                    help="trainer seed; replicate an arm at another seed "
                         "to quantify the noise floor behind the "
                         "'within noise' calls")
    args = ap.parse_args()
    # the sandbox sitecustomize force-sets jax_platforms="axon,cpu"; the
    # env var alone cannot pick CPU (see tests/conftest.py)
    import jax
    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    for name in args.shapes.split(","):
        quality_run(name, SHAPES[name], args.epochs, args.eval_every,
                    seed=args.seed, occ_k=args.occ_K, eval_k=args.eval_K,
                    rgb_k=args.rgb_K)


if __name__ == "__main__":
    main()
