"""A/B the occ_jitter stratified-segment-jitter op at the bench headline rung.

VERDICT r4 item 2: BENCH_r04's headline dropped 3,655 -> 1,418 rays/s with
bench.py byte-identical to r3; the two candidate causes are (a) the r4
`occ_jitter=True` default now being in the perturbed train path
(renderer.py:300-303) and (b) chip contention at capture time (the r4 A/B
fog arms were still running when the driver benched). This script measures
(a) directly on an idle chip: the headline rung with jitter on vs off,
3 timed repetitions each, reporting each rep and the best.

Usage: python tools/bench_ab_jitter.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def measure(over, reps=3, n_steps=16):
    tag, cfg, tr, _ = bench._make_trainer(over)
    scan_len = 8
    frames = np.resize(np.arange(16), scan_len)
    tr.train_one_epoch(order=frames)
    float(np.asarray(tr.state["step"]))
    n_disp = max(n_steps // scan_len, 1)
    rates = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(n_disp):
            tr.train_one_epoch(order=frames)
        float(np.asarray(tr.state["step"]))
        dt = time.perf_counter() - t0
        rays = cfg.num_rays_lidar + (cfg.num_rays if cfg.enable_rgb else 0)
        rates.append(rays * scan_len * n_disp / dt)
    return tag, rates


def main():
    bench._wait_for_tpu()
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/nvsf_tpu_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    for jitter in (True, False):
        over = dict(bench.LADDER[0], occ_jitter=jitter)
        over["tag"] = f"2048rays-K96-jitter{'On' if jitter else 'Off'}"
        tag, rates = measure(over)
        print(json.dumps({
            "tag": tag, "reps_rays_per_s": [round(r, 1) for r in rates],
            "best": round(max(rates), 1),
            "spread_pct": round(100 * (max(rates) - min(rates)) /
                                max(rates), 1)}), flush=True)


if __name__ == "__main__":
    main()
