"""Wall-clock multi-device step timing + per-collective attribution
(VERDICT r3 item 5).

Runs the SAME global-batch joint training step on a 1-device and an
8-virtual-CPU-device mesh and times REAL executions (wall-clock, not
compiled FLOPs), then attributes every collective in the 8-device HLO to
the JAX op that produced it (XLA op_name metadata) — naming which tensors
ride the all-gathers (error-map scatter indices, chamfer point sets, flow
batch, ...).

Caveat recorded in the output: this host exposes ONE physical core, so 8
virtual devices time-share it — the wall-clock ratio measures *sharding
overhead* (partitioning + collective copies), not parallel speedup; the
per-device FLOPs table (tools/mesh_scaling.py) remains the scaling
evidence. On real multi-chip hardware the same program's collectives ride
ICI.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python tools/mesh_walltime.py [--rays 1024] [--steps 8]
"""

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, ".")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np


def build(rays, mesh):
    from nvsf_tpu.config import NVSFConfig
    from nvsf_tpu.data.synthetic import (SyntheticSceneSpec,
                                         make_synthetic_scene)
    from nvsf_tpu.train.trainer import Trainer
    spec = SyntheticSceneSpec(num_frames=4, H_lidar=32, W_lidar=96, H=32,
                              W=48)
    scene = make_synthetic_scene(spec, split="train")
    cfg = NVSFConfig.from_dict(dict(
        enable_lidar=True, enable_rgb=True, use_rgbd_loss=True,
        flow_loss=True, use_urf_loss=True,
        render_mode="occupancy", num_steps_occ=16, occ_grid_size=32,
        num_frames=spec.num_frames, scale=spec.scale, bound=1.0,
        min_near_lidar=0.5 * spec.scale,
        lidar_max_depth=spec.max_depth * spec.scale,
        min_near=0.5 * spec.scale,
        num_rays_lidar=rays, num_rays=rays,   # FIXED global batch
        num_steps=64, max_ray_batch=256, iters=100, epochs=1,
        min_resolution=8, n_levels_plane=2, base_resolution=16,
        max_resolution=128, time_resolution=4, n_levels_hash=4,
        log2_hashmap_size=12,
        flow_n_levels=2, flow_n_features_per_level=4,
        flow_base_resolution=8, flow_max_resolution=16,
        flow_log2_hashmap_size=8,
        workspace="/tmp/nvsf_meshwall"))
    return Trainer(cfg, scene, workspace="/tmp/nvsf_meshwall", mesh=mesh)


def time_steps(tr, steps):
    import jax
    # warm (compile + first dispatch)
    st, m = tr._step_random(tr.state, np.int32(0))
    jax.device_get(m["loss"])
    tr.state = st
    t0 = time.perf_counter()
    for i in range(steps):
        tr.state, m = tr._step_random(tr.state, np.int32(i % 4))
    jax.device_get(m["loss"])   # scalar fetch = real barrier on any backend
    return (time.perf_counter() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=8)
    args = ap.parse_args()
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    from nvsf_tpu.parallel.mesh import (aggregate_collectives,
                                        collective_stats, make_mesh)

    t1 = time_steps(build(args.rays, None), args.steps)
    tr8 = build(args.rays, make_mesh(8))
    t8 = time_steps(tr8, args.steps)
    print(json.dumps({
        "global_rays": [args.rays, args.rays],
        "wall_s_per_step_1dev": round(t1, 4),
        "wall_s_per_step_8dev": round(t8, 4),
        "wall_ratio_8_over_1": round(t8 / t1, 3),
        "note": "1 physical core -> ratio measures sharding overhead, "
                "not speedup (see tools/mesh_scaling.py for the "
                "per-device FLOPs strong-scaling record)"}), flush=True)

    compiled = tr8._step_random.lower(tr8.state, np.int32(0)).compile()
    cs = collective_stats(compiled, per_op=True)
    rows = aggregate_collectives(cs["ops"])
    total = sum(v["bytes"] for _, v in rows)
    print(json.dumps({"collective_total_bytes": total}), flush=True)
    for (kind, name), v in rows[:14]:
        print(json.dumps({"kind": kind, "source": name, **v}), flush=True)


if __name__ == "__main__":
    main()
