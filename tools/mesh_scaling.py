"""Strong-scaling evidence from compiled HLO across mesh sizes.

Real multi-chip hardware is unavailable in this environment, so the
scaling record is compiler-level: compile the SAME global-batch training
step over 1/2/4/8-device meshes (virtual CPU devices) and report each
program's per-device FLOPs and collective ops/bytes. Per-device FLOPs
should fall ~1/N (the ray shards) while the gradient all-reduce payload
stays constant (replicated params) — the signature of ray-sharded data
parallelism (SURVEY §2.3; reference's dead DDP: ``trainer.py:82-84``).

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       JAX_PLATFORMS=cpu python tools/mesh_scaling.py
"""

import argparse
import json
import os
import sys

sys.path.insert(0, ".")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=64,
                    help="global rays per modality; the non-scaling FLOPs "
                         "floor is the replicated-param optimizer work, so "
                         "bigger batches approach linear speedup")
    args = ap.parse_args()
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

    from nvsf_tpu.config import NVSFConfig
    from nvsf_tpu.data.synthetic import (SyntheticSceneSpec,
                                         make_synthetic_scene)
    from nvsf_tpu.parallel.mesh import collective_stats, make_mesh
    from nvsf_tpu.train.trainer import Trainer

    spec = SyntheticSceneSpec(num_frames=4, H_lidar=16, W_lidar=32, H=16,
                              W=24)
    scene = make_synthetic_scene(spec, split="train")
    base = dict(
        enable_lidar=True, enable_rgb=True, use_rgbd_loss=True,
        flow_loss=True, use_urf_loss=True,
        render_mode="occupancy", num_steps_occ=8, occ_grid_size=16,
        num_frames=spec.num_frames, scale=spec.scale, bound=1.0,
        min_near_lidar=0.5 * spec.scale,
        lidar_max_depth=spec.max_depth * spec.scale,
        min_near=0.5 * spec.scale,
        # FIXED global batch across mesh sizes (strong scaling)
        num_rays_lidar=args.rays, num_rays=args.rays,
        num_steps=16, max_ray_batch=64, iters=10, epochs=1,
        min_resolution=8, n_levels_plane=2, base_resolution=16,
        max_resolution=64, time_resolution=4, n_levels_hash=2,
        log2_hashmap_size=8,
        flow_n_levels=2, flow_n_features_per_level=4,
        flow_base_resolution=8, flow_max_resolution=16,
        flow_log2_hashmap_size=6,
        workspace="/tmp/nvsf_meshscale")
    cfg = NVSFConfig.from_dict(base)

    rows = []
    for n in (1, 2, 4, 8):
        mesh = make_mesh(n) if n > 1 else None
        tr = Trainer(cfg, scene, workspace="/tmp/nvsf_meshscale", mesh=mesh)
        compiled = tr._step_random.lower(tr.state, np.int32(0)).compile()
        cs = collective_stats(compiled)
        ar = cs.get("all-reduce", {"count": 0, "bytes": 0})
        ag = cs.get("all-gather", {"count": 0, "bytes": 0})
        rows.append({"devices": n,
                     "per_device_gflops": round(cs["flops"] / 1e9, 4),
                     "all_reduce_n": ar["count"],
                     "all_reduce_bytes": ar["bytes"],
                     "all_gather_n": ag["count"],
                     "all_gather_bytes": ag["bytes"]})
        print(json.dumps(rows[-1]), flush=True)

    f1 = rows[0]["per_device_gflops"]
    for r in rows:
        r["flops_speedup"] = round(f1 / r["per_device_gflops"], 2)
    print(json.dumps({"summary": rows}))


if __name__ == "__main__":
    main()
