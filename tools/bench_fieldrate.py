"""Field-evaluation rate on the chip: pts/s for density (full warp) and
density (skip_warp), flagship tuned shape — closes the loop on the
gather-bound ceiling model."""
import sys
sys.path.insert(0, ".")
import time, jax, jax.numpy as jnp, numpy as np
from nvsf_tpu.models.field import NVSFFieldSpec

spec = NVSFFieldSpec(num_frames=64, bound=1.0,
                     n_levels_hash=4, n_features_per_level_hash=8,
                     flow_n_levels=8, flow_n_features_per_level=16)
params = spec.init(jax.random.PRNGKey(0))

N = 262_144   # = 2048 rays x K=128, the flagship step's field batch
key = jax.random.PRNGKey(1)
x = jax.random.uniform(key, (N, 3), minval=-1.0, maxval=1.0)
t = jnp.asarray(0.37)

@jax.jit
def full(params, x, t):
    o = spec.density(params, x, t, cal_lidar_color=True)
    return o["sigma"].sum() + o["geo_feat"].sum()

@jax.jit
def noworp(params, x, t):
    o = spec.density(params, x, t, cal_lidar_color=True, skip_warp=True)
    return o["sigma"].sum() + o["geo_feat"].sum()

def timeit(fn, n=10):
    float(np.asarray(fn(params, x, t)))
    t0 = time.perf_counter()
    for _ in range(n): r = fn(params, x, t)
    float(np.asarray(r))
    return (time.perf_counter() - t0) / n

for name, fn in (("density-full", full), ("density-skipwarp", noworp)):
    dt = timeit(fn)
    print(f"{name}: {dt*1e3:7.1f} ms for {N} pts = {N/dt/1e6:.2f} M pts/s")
