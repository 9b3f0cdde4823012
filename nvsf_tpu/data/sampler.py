"""Device-side pixel/ray samplers (random, error-map weighted, patch).

The reference samples pixels host-side per batch with ``torch.multinomial``
over a coarse error map (``dataset_utils.py:369-536``) and mutates the error
map in the trainer (``trainer.py:552-630``). Here sampling is a pure jitted
function of ``(key, error_map)`` so it runs on-device inside the train step,
and the error-map EMA update is an explicit state transition.

Weighted sampling without replacement uses the Gumbel top-k trick, which maps
to a single sort on the VPU instead of a sequential multinomial.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _gumbel_topk(key, log_weights, k):
    """Sample k items ∝ softmax(log_weights) — without replacement via the
    Gumbel top-k trick when k fits, with replacement (categorical) when k
    exceeds the support (the reference asserts this can't happen,
    ``dataset_utils.py:437``; small scenes hit it)."""
    if k > log_weights.shape[0]:
        return jax.random.categorical(key, log_weights, shape=(k,))
    g = jax.random.gumbel(key, log_weights.shape, dtype=jnp.float32)
    _, idx = jax.lax.top_k(log_weights + g, k)
    return idx


def sample_random_indices(key, H, W, N):
    """Uniform pixel sampling (with replacement, as the reference's randint)."""
    return jax.random.randint(key, (N,), 0, H * W, dtype=jnp.int32)


def sample_error_map_indices(key, error_map, H, W, N):
    """Error-map weighted sampling: multinomial w/o replacement on the coarse
    map, then upscale with jitter (``dataset_utils.py:468-498`` semantics).

    error_map: [He, We] positive weights. Returns flat indices [N] into H*W.
    """
    He, We = error_map.shape
    k_sel, k_jx, k_jy = jax.random.split(key, 3)
    logw = jnp.log(jnp.maximum(error_map.reshape(-1), 1e-12))
    inds_coarse = _gumbel_topk(k_sel, logw, N)
    sx, sy = W / We, H / He
    ix = (inds_coarse % We).astype(jnp.float32)
    iy = (inds_coarse // We).astype(jnp.float32)
    x = jnp.clip((ix * sx + jax.random.uniform(k_jx, (N,)) * sx).astype(jnp.int32), 0, W - 1)
    y = jnp.clip((iy * sy + jax.random.uniform(k_jy, (N,)) * sy).astype(jnp.int32), 0, H - 1)
    return y * W + x


def sample_patch_indices(key, H, W, N, patch_h, patch_w, error_map=None):
    """Patch sampling: random (or error-map weighted) top-left corners plus a
    dense patch offset grid (``dataset_utils.py:422-464``). N must be divisible
    by patch_h*patch_w; returns flat indices [N] ordered patch-major so the
    trainer can reshape to [num_patch, patch_h, patch_w]."""
    num_patch = N // (patch_h * patch_w)
    if error_map is not None:
        He, We = error_map.shape
        k_sel, k_jx, k_jy = jax.random.split(key, 3)
        logw = jnp.log(jnp.maximum(error_map.reshape(-1), 1e-12))
        inds_coarse = _gumbel_topk(k_sel, logw, num_patch)
        s_w, s_h = W / We, H / He
        ix = (inds_coarse % We).astype(jnp.float32)
        iy = (inds_coarse // We).astype(jnp.float32)
        inds_x = jnp.clip((ix * s_w + jax.random.uniform(k_jx, (num_patch,)) * s_w)
                          .astype(jnp.int32), 0, W - patch_w)
        inds_y = jnp.clip((iy * s_h + jax.random.uniform(k_jy, (num_patch,)) * s_h)
                          .astype(jnp.int32), 0, H - patch_h)
    else:
        kx, ky = jax.random.split(key)
        inds_x = jax.random.randint(kx, (num_patch,), 0, W - patch_w, dtype=jnp.int32)
        inds_y = jax.random.randint(ky, (num_patch,), 0, H - patch_h, dtype=jnp.int32)

    pi, pj = jnp.meshgrid(jnp.arange(patch_h), jnp.arange(patch_w), indexing="ij")
    offsets = jnp.stack([pi.reshape(-1), pj.reshape(-1)], axis=-1)  # [ph*pw, 2]
    corners = jnp.stack([inds_y, inds_x], axis=-1)                  # [np, 2]
    inds2d = corners[:, None, :] + offsets[None, :, :]              # [np, ph*pw, 2]
    inds2d = inds2d.reshape(-1, 2)
    return (inds2d[:, 0] * W + inds2d[:, 1]).astype(jnp.int32)


def sample_indices(key, H, W, N, patch_size=1, error_map=None,
                   use_error_map=False):
    """Dispatch between the three sampling modes. `patch_size`, `use_error_map`
    must be static at trace time (they choose the compiled program)."""
    if isinstance(patch_size, int):
        ph = pw = patch_size
    elif len(patch_size) == 1:
        ph = pw = patch_size[0]
    else:
        ph, pw = patch_size
    if ph > 1:
        return sample_patch_indices(
            key, H, W, N, ph, pw, error_map if use_error_map else None)
    if use_error_map and error_map is not None:
        return sample_error_map_indices(key, error_map, H, W, N)
    return sample_random_indices(key, H, W, N)


def update_error_map(error_map, inds, per_ray_error, H, W):
    """EMA-update the coarse error map at the sampled pixels.

    Mirrors ``trainer.py:552-589``: per-ray loss -> min-max normalize ->
    scale to [1, 1e3] -> coarse-pixel EMA 0.1*old + 0.9*new (scatter).

    error_map: [He, We];  inds: [N] flat fine indices;  per_ray_error: [N].
    """
    He, We = error_map.shape
    err = per_ray_error.astype(jnp.float32)
    lo, hi = err.min(), err.max()
    err = (err - lo) / (hi - lo + jnp.finfo(jnp.float32).eps)
    err = err * (1e3 - 1.0) + 1.0
    sh, sw = He / H, We / W
    ey = ((inds // W).astype(jnp.float32) * sh).astype(jnp.int32)
    ex = ((inds % W).astype(jnp.float32) * sw).astype(jnp.int32)
    old = error_map[ey, ex]
    new = 0.1 * old + 0.9 * err
    return error_map.at[ey, ex].set(new)
