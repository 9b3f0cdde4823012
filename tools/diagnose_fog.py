"""Diagnose the production-scale LiDAR fog collapse (r4 finding).

The production-scale quality run (tools/quality_run_full.py) exposed a
collapse the throughput-only runs never could: after ~3 epochs at the
full 66x1030 / 80 m geometry the LiDAR branch's density degenerates into
a near-plane fog wall (sigma ~1e5 along entire rays, rendered depth
~0.2 m vs gt ~8 m, depth loss flat at ~250 forever) while the camera
branch, raydrop and intensity keep improving — raydrop/intensity get
"painted" onto the wall. The occupancy grid then records the exploding
field max (3.7e17 by epoch 45).

This tool runs short production-shape arms on the chip, each with one
config knob changed, and prints per-epoch: the depth-loss part, the
field's sigma statistics over random scene points, and a small-ray-batch
rendered-depth-vs-gt probe — the collapse signature is visible within
~3-5 epochs.

Usage: python tools/diagnose_fog.py --arm baseline|uniform|noflow|fp32|...
           [--frames 16] [--epochs 5]
"""

import argparse
import json
import re
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from production_run import build_flagship_trainer
from quality_run_full import wait_for_tpu

ARMS = {
    # shipped flagship config, tuned shape (the fast one) — expect collapse
    "baseline": {},
    # dense 768-sample uniform rendering (the reference's live path);
    # isolates the occupancy-compaction sampling. Dispatch capped: the
    # dense step is ~5.5 s and a 16-step scan dispatch trips the tunnel's
    # ~60 s device-program watchdog (worker crash, observed)
    "uniform": {"render_mode": "uniform", "remat_chunks": 8,
                "max_dispatch_steps": 4},
    # no scene-flow loss (63-frame temporal structure suspect)
    "noflow": {"flow_loss": False},
    # fp32 compute (isolates bf16)
    "fp32": {"fp16": False},
    # no error-map sampling (random pixels only)
    "noerrmap": {"use_error_map": False},
    # no patch epochs / structural regularizers
    "nopatch": {"change_patch_size_lidar": [1], "grad_loss": False},
    # denser LiDAR sample budget
    "k192": {"num_steps_occ": 192},
    # lower LR
    "lr3": {"lr": 3e-3},
    # reference encoder shape for contrast
    "refshape": {},
    # production config on a small pano: rays-per-frame-pixel coverage
    # rises 3% -> 60% per step, interpolating toward the known-good
    # small-scale regime with EVERYTHING else at production values
    "smallpano": {},
    # the r4 fix reverted: pre-fix comb sampling (expect collapse) —
    # the A/B that isolates stratified_segment_jitter
    "nojitter": {"occ_jitter": False},
    # candidate fix: URF line-of-sight loss supervises the weight
    # distribution along each LiDAR ray toward a delta at the measured
    # depth — the textbook anti-fog mechanism (the reference gates the
    # same loss behind --use_urf_loss)
    "urf": {"use_urf_loss": True},
    # supervision-density lever at FULL production pano: 4x the LiDAR
    # rays/step raises per-frame pixel coverage 3% -> 12% per step —
    # tests the coverage-rate hypothesis without changing geometry
    "rays8k": {"num_rays_lidar": 8192},
    # r5 fix candidate: reference-faithful local-dt quadrature — caps
    # per-sample deltas at 1x the dense candidate spacing instead of the
    # whole skipped gap (2*T/K x). At the flagship's 1/8 compaction the
    # gap-deltas amplify near-fog occlusion 8-16x (the bisected collapse
    # mechanism); the clamp removes the amplification
    "clamp": {"occ_delta_clamp": 1.0},
}


def probe(tr, cfg, scene, n_rays=512):
    """Field sigma stats + rendered-depth-vs-gt on known-gt-hit rays."""
    import jax
    import jax.numpy as jnp

    from nvsf_tpu.lib import rays as raylib

    H, W = scene.H_lidar, scene.W_lidar
    fi = min(5, len(scene) - 1)
    gt = np.asarray(scene.images_lidar[fi]).reshape(H * W, 3)
    rng = np.random.default_rng(0)
    inds = rng.choice(H * W, n_rays, replace=False).astype(np.int32)
    ro, rd = raylib.get_lidar_rays(
        jnp.asarray(scene.poses_lidar[fi]), jnp.asarray(inds), H, W,
        scene.intrinsics_lidar, scene.intrinsics_hoz_lidar)
    t = jnp.float32(float(scene.times[fi]))
    params = tr.state["params"]
    out = tr.rend.render(params, ro, rd, t, cal_lidar_color=True,
                         staged=False,
                         **tr._occ_kwargs(tr.state.get("occ_grid_lidar"),
                                          lidar=True))
    pd = np.asarray(out["depth_lidar"]).ravel()
    gt_i = gt[inds]
    hit = gt_i[:, 0] > 0.5
    s = cfg.scale
    # sigma stats over random scene points at mid-time
    pts = jax.random.uniform(jax.random.PRNGKey(7), (32768, 3),
                             minval=-cfg.bound, maxval=cfg.bound)
    sig = np.asarray(tr.field.density(params, pts, jnp.float32(0.5),
                                      cal_lidar_color=True)["sigma"])
    g = tr.state.get("occ_grid_lidar")
    return {
        "pred_depth_mean_m": round(float(pd[hit].mean() / s), 2),
        "gt_depth_mean_m": round(float(gt_i[hit, 2].mean() / s), 2),
        "depth_rmse_hit_m": round(float(
            np.sqrt(((pd[hit] - gt_i[hit, 2]) ** 2).mean()) / s), 2),
        "sigma_max": float(np.format_float_scientific(sig.max(), 2)),
        "sigma_med": float(np.format_float_scientific(
            np.median(sig), 2)),
        "grid_max": float(np.format_float_scientific(
            np.asarray(g).max(), 2)) if g is not None else None,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arm", choices=sorted(ARMS), default="baseline")
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--pano", default=None,
                    help="HxW pano override, composes with any arm "
                         "(e.g. --arm uniform --pano 33x103)")
    args = ap.parse_args()

    wait_for_tpu()
    over = dict(ARMS[args.arm])
    shape = "reference" if args.arm == "refshape" else "tuned"
    pano = (33, 103) if args.arm == "smallpano" else None
    if args.pano:
        m = re.fullmatch(r"(\d+)x(\d+)", args.pano.lower())
        if m is None:
            ap.error(f"--pano expected HxW, e.g. 33x103 (got {args.pano!r})")
        pano = (int(m.group(1)), int(m.group(2)))
    tag = args.arm + (f"_{pano[0]}x{pano[1]}" if args.pano else "")
    cfg, tr, scene, _ = build_flagship_trainer(
        args.frames, 120, f"/tmp/nvsf_diag_{tag}", shape=shape,
        extra_overrides=over or None, pano=pano)
    print(json.dumps({"arm": args.arm, "frames": len(scene),
                      "pano": [scene.H_lidar, scene.W_lidar],
                      "overrides": {k: str(v) for k, v in over.items()}}),
          flush=True)
    t0 = time.time()
    for ep in range(1, args.epochs + 1):
        tr.epoch = ep
        st = tr.train_one_epoch(
            order=np.random.default_rng(ep).permutation(len(scene)))
        row = {"epoch": ep, "loss": round(st.loss, 2),
               "loss_d": round(st.parts.get("loss_d", float("nan")), 2),
               "loss_rd": round(st.parts.get("loss_rd", float("nan")), 3),
               "t": round(time.time() - t0, 1)}
        row.update(probe(tr, cfg, scene))
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
