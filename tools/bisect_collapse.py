"""Bisect the production-scale LiDAR fog collapse to its causal config axis.

r4's A/B arms produced one decisive negative: `smallpano` (production
config at 33x103 — 60% pixel coverage/step, the same coverage the
known-good 32x96 protocol enjoys) still stalls (RMSE 12.5 flat at epoch
24, pred depth 0.64 m), while the 32x96 VALIDATION.md protocol reaches
RMSE 4.5 by epoch 10. Coverage is therefore NOT the binding variable.
Something else that differs between the ablation protocol
(tools/ablate_encoders.py) and the flagship config
(tools/production_run.py::build_flagship_trainer) breaks training.

This tool starts from the WORKING protocol config and flips ONE axis at a
time toward production, at the small pano where signal appears within
10-15 epochs (minutes on the chip):

  proto     control — expect F>0.3 by epoch 15 (VALIDATION.md table)
  scale80   25 m/1/26 scene -> 80 m/1/81 (content identical in meters;
            the depth term's sigma-gradients scale with metric depth x
            scale while raydrop/intensity BCE/MSE gradients are O(1) —
            the race the collapse mechanism describes is 3.1x more
            skewed at 1/81)
  samp768   192 candidates/K24 -> 768/K96 (flagship ratios; same 8x
            compaction)
  tables19  hash 2^14 -> 2^19 + occ grid 64 -> 128 (capacity axis)
  frames16  8 -> 16 frames (temporal axis)
  rays2048  1024+1024 -> 2048+2048 rays
  prod25    FULL flagship config at 32x96 pano but the 25 m scene
            (reverse arm: if this trains, scale is implicated from both
            directions)
  alphafix  scale80 + alpha_d x3.115 (=81/26): tests the race-balance
            hypothesis as a FIX candidate

Usage: python tools/bisect_collapse.py [--arms proto,scale80,...]
           [--epochs 20] [--eval-every 5] [--backend tpu]
One JSON line per epoch (loss parts + fog probe) and per eval (F/CD/RMSE).
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from diagnose_fog import probe
from quality_run_full import wait_for_tpu

ARMS = {
    "proto": {},
    "scale80": {"_scene": dict(max_depth=80.0, scale=1.0 / 81.0)},
    "samp768": {"num_steps": 768, "num_steps_occ": 96,
                "num_steps_occ_rgb": 128},
    "tables19": {"log2_hashmap_size": 19, "occ_grid_size": 128},
    "frames16": {"_scene": dict(num_frames=16)},
    "rays2048": {"num_rays": 2048, "num_rays_lidar": 2048},
    "prod25": {"_flagship": True, "_scene": dict(max_depth=25.0,
                                                 scale=1.0 / 26.0)},
    "prod80": {"_flagship": True},   # == smallpano bridge (known stall)
    "alphafix": {"_scene": dict(max_depth=80.0, scale=1.0 / 81.0),
                 "alpha_d": 81.0 / 26.0},
    # the working protocol never set fp16 (fp32 everywhere); production
    # trains bf16 under --fp16 — its own axis
    "fp16": {"fp16": True},
    # proto with the r4 stratified jitter REVERTED: the jitter commit
    # (87c2f11) is the ONLY nvsf_tpu training-path change between the
    # recorded-good 150-epoch protocol run (a1948e2) and HEAD — if proto
    # stalls and nojit trains, the "fog fix" is itself the regression
    "nojit": {"occ_jitter": False},
    # flow_loss defaults FALSE — the working protocol trained WITHOUT the
    # flow field/losses, while every collapsing production run has
    # flow_loss=True (configs/kitti360_1908.txt): its own axis
    "flow": {"flow_loss": True},
    # K-ratio axis (r5 finding): the K64 ablate protocol (1/3 compaction)
    # trains immediately at HEAD while proto (K24 = 1/8, the flagship's
    # 96/768 ratio) walls early on BOTH backends. 'k64' reproduces the
    # working ratio inside this harness; 'clamp1'/'clamp2' keep the
    # stalling K24 ratio but cap per-sample deltas at 1x/2x the dense
    # spacing (the reference marcher's local-dt quadrature,
    # raymarching.cu:388-427) — if clamp cures the K24 stall, whole-gap
    # deltas amplifying near-fog occlusion is the collapse mechanism
    "k64": {"num_steps_occ": 64, "num_steps_occ_rgb": 64},
    "clamp1": {"occ_delta_clamp": 1.0},
    "clamp2": {"occ_delta_clamp": 2.0},
    # occupancy-sampling discriminators: the ONLY protocol variant with
    # recorded early epochs (RMSE 4.5 by ep10) was the r2 UNIFORM dense
    # render; every stalling run is occupancy-mode. 'uniform' removes the
    # occupancy path entirely; 'occfull' keeps the occupancy machinery but
    # kills the compaction (K = all 192 candidates)
    "uniform": {"render_mode": "uniform"},
    "occfull": {"num_steps_occ": 192, "num_steps_occ_rgb": 192},
}


def build(arm_name, over, epochs, seed=0, pano=None, rays=None,
          frames=None, cfg_epochs=None):
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/nvsf_tpu_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from nvsf_tpu.config import NVSFConfig, parse_config_file
    from nvsf_tpu.data.synthetic import (SyntheticSceneSpec,
                                         make_synthetic_scene)
    from nvsf_tpu.train.trainer import Trainer

    over = dict(over)
    scene_over = over.pop("_scene", {})
    flagship = over.pop("_flagship", False)
    spec_kw = dict(num_frames=8, H_lidar=32, W_lidar=96, H=40, W=56,
                   max_depth=25.0, scale=1.0 / 26.0)
    spec_kw.update(scene_over)
    if pano:
        spec_kw.update(H_lidar=pano[0], W_lidar=pano[1])
    if frames:
        spec_kw["num_frames"] = frames
    spec = SyntheticSceneSpec(**spec_kw)
    train_scene = make_synthetic_scene(spec, split="train")
    val_scene = make_synthetic_scene(spec, split="val")

    ws = f"/tmp/nvsf_bisect_{arm_name}"
    if flagship:
        # the SHIPPED flagship config (production_run.py) bound to the
        # small scene — only pano/scene geometry overridden
        cfg_d = dict(parse_config_file("configs/kitti360_1908.txt"))
    else:
        # the WORKING VALIDATION.md protocol config (ablate_encoders.py,
        # 150-epoch extension arm: tuned 4x8 hash, 4x32 flow, K 24/32)
        cfg_d = dict(
            enable_lidar=True, enable_rgb=True,
            num_rays=1024, num_rays_lidar=1024, num_steps=192,
            num_steps_occ=24, num_steps_occ_rgb=32,
            render_mode="occupancy", occ_grid_size=64,
            log2_hashmap_size=14, n_levels_plane=4,
            use_error_map=True, grad_loss=True,
            change_patch_size_lidar=[4, 4], change_patch_size_epoch=2,
            n_levels_hash=4, n_features_per_level_hash=8,
            flow_n_levels=4, flow_n_features_per_level=32)
    cfg_d.update(
        num_frames=spec.num_frames, scale=spec.scale, bound=1.0,
        # METERS — finalize() scales into the box exactly once; passing
        # pre-scaled values double-scaled the far plane to <1 world meter
        # (the actual cause of every "collapse" this tool was built to
        # bisect — see VALIDATION.md r5)
        min_near_lidar=1.0,
        lidar_max_depth=float(spec.max_depth),
        min_near=1.0, active_sensor=True,
        intrinsics_lidar=list(spec.intrinsics_lidar),
        intrinsics_hoz_lidar=list(spec.intrinsics_hoz_lidar),
        dataloader="synthetic", path="",
        # LR-schedule horizon (lr * 0.1**(step/iters)) decoupled from the
        # TRAINED epochs: every recorded working run used a 60-150 epoch
        # horizon; compressing it to the bisect's 20 trained epochs would
        # confound every arm with a 3-7x faster LR decay
        iters=(cfg_epochs or epochs) * len(train_scene),
        epochs=cfg_epochs or epochs, workspace=ws)
    cfg_d.update(over)
    if rays:
        cfg_d.update(num_rays=rays, num_rays_lidar=rays)
    cfg = NVSFConfig.from_dict(cfg_d).finalize(
        steps_per_epoch=len(train_scene))
    tr = Trainer(cfg, train_scene, workspace=ws, seed=seed)
    return cfg, tr, train_scene, val_scene


def run_arm(arm_name, epochs, eval_every, seed=0, pano=None, rays=None,
            frames=None, cfg_epochs=None):
    from nvsf_tpu.train.evaluate import evaluate
    cfg, tr, train_scene, val_scene = build(arm_name, ARMS[arm_name],
                                            epochs, seed, pano=pano,
                                            rays=rays, frames=frames,
                                            cfg_epochs=cfg_epochs)
    print(json.dumps({"arm": arm_name, "frames": len(train_scene),
                      "scale": round(cfg.scale, 5),
                      "K": [cfg.num_steps, cfg.num_steps_occ],
                      "hash": cfg.log2_hashmap_size,
                      "rays": cfg.num_rays_lidar}), flush=True)
    t0 = time.time()
    rng = np.random.default_rng(seed)
    for ep in range(1, epochs + 1):
        tr.epoch = ep
        st = tr.train_one_epoch(order=rng.permutation(len(train_scene)))
        row = {"arm": arm_name, "epoch": ep, "loss": round(st.loss, 2),
               "loss_d": round(st.parts.get("loss_d", float("nan")), 2),
               "t": round(time.time() - t0, 1)}
        row.update(probe(tr, cfg, train_scene))
        print(json.dumps(row), flush=True)
        if ep % eval_every == 0 or ep == epochs:
            res = evaluate(tr, val_scene, use_ema=True,
                           log_fn=lambda *a: None)
            c = res["combined"]
            print(json.dumps({
                "arm": arm_name, "epoch": ep, "eval": True,
                "CD": round(c["point"][0], 4),
                "F": round(c["point"][1], 4),
                "depth_RMSE": round(c["depth"][0], 4),
                "raydrop_acc": round(c["raydrop"][1], 4),
                "t": round(time.time() - t0, 1)}), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", default="proto,uniform,occfull,scale80,"
                                      "samp768,tables19,frames16,fp16,"
                                      "prod25")
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--eval-every", type=int, default=5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--backend", default="tpu", choices=["cpu", "tpu"])
    ap.add_argument("--pano", default=None, help="HxW override, e.g. 24x64")
    ap.add_argument("--cfg-epochs", type=int, default=60,
                    help="LR-schedule horizon in epochs (keep at the "
                         "working protocol's 60 while training fewer)")
    ap.add_argument("--rays", type=int, default=None)
    ap.add_argument("--frames", type=int, default=None)
    args = ap.parse_args()
    pano = None
    if args.pano:
        h, w = args.pano.lower().split("x")
        pano = (int(h), int(w))
    import jax
    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    else:
        wait_for_tpu()
    for arm in args.arms.split(","):
        run_arm(arm, args.epochs, args.eval_every, seed=args.seed,
                pano=pano, rays=args.rays, frames=args.frames,
                cfg_epochs=args.cfg_epochs)


if __name__ == "__main__":
    main()
