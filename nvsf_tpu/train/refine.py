"""Ray-drop refinement stage: render all training frames with the trained
field, then optimize ONLY the U-Net for 1000 steps (Adam 1e-3, OneCycle LR,
random-box masking augmentation, BCE loss) — rebuilds
``nvsf/nerf/trainer.py:905-1017``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nvsf_tpu.models.unet import UNetSpec
from nvsf_tpu.train.losses import bce_with_logits


def onecycle_lr(max_lr: float, total_steps: int, pct_start: float = 0.3,
                div_factor: float = 25.0, final_div_factor: float = 1e4):
    """torch OneCycleLR (cos annealing) schedule."""
    init_lr = max_lr / div_factor
    min_lr = init_lr / final_div_factor
    up = int(pct_start * total_steps)

    def sched(step):
        step = jnp.minimum(step, total_steps - 1)
        warm = init_lr + (max_lr - init_lr) * 0.5 \
            * (1 - jnp.cos(jnp.pi * jnp.minimum(step / max(up, 1), 1.0)))
        t = jnp.clip((step - up) / max(total_steps - up, 1), 0.0, 1.0)
        cool = min_lr + (max_lr - min_lr) * 0.5 * (1 + jnp.cos(jnp.pi * t))
        return jnp.where(step < up, warm, cool)

    return sched


def random_box_mask(key, shape, box_num_max=32, frac=0.1):
    """Random-box occlusion mask, static shape: always draws ``box_num_max``
    boxes but activates a random count of them (``trainer.py:978-990``)."""
    B, C, H, W = shape
    by = max(int(frac * H), 2)
    bx = max(int(frac * W), 2)
    k_n, k_y, k_x, k_sy, k_sx = jax.random.split(key, 5)
    n_active = jax.random.randint(k_n, (), 0, box_num_max)
    ys = jax.random.randint(k_y, (box_num_max,), 0, H - by)
    xs = jax.random.randint(k_x, (box_num_max,), 0, W - bx)
    sy = jax.random.randint(k_sy, (box_num_max,), 1, by)
    sx = jax.random.randint(k_sx, (box_num_max,), 1, bx)
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    mask = jnp.ones((H, W), jnp.float32)
    for j in range(box_num_max):
        inside = ((yy >= ys[j]) & (yy < ys[j] + sy[j])
                  & (xx >= xs[j]) & (xx < xs[j] + sx[j]))
        mask = jnp.where((j < n_active) & inside, 0.0, mask)
    return jnp.broadcast_to(mask, shape)


def refine_raydrop(unet_spec: UNetSpec, unet_params, unet_stats,
                   unet_input: np.ndarray, raydrop_gt: np.ndarray,
                   *, steps: int = 1000, lr: float = 1e-3,
                   seed: int = 0, log_fn=None, log_every: int = 50):
    """Train the U-Net on (pred raydrop/intensity/depth -> GT raydrop).

    unet_input: [B, 3, H, W] rendered (raydrop, intensity, depth);
    raydrop_gt: [B, 1, H, W]. Returns (params, stats, losses).
    """
    sched = onecycle_lr(lr, steps)
    tx = optax.chain(optax.scale_by_adam(),
                     optax.scale_by_schedule(lambda s: -sched(s)))
    opt_state = tx.init(unet_params)
    x_full = jnp.asarray(unet_input, jnp.float32)
    gt = jnp.asarray(raydrop_gt, jnp.float32)

    @jax.jit
    def step_fn(params, stats, opt_state, key):
        key, k_mask, k_drop = jax.random.split(key, 3)
        x = x_full * random_box_mask(k_mask, x_full.shape)

        def loss_fn(p):
            out, new_stats = unet_spec.apply(p, stats, x, train=True,
                                             key=k_drop)
            # reference feeds the sigmoid output into BCEWithLogits
            # (``trainer.py:993-997`` with self.bce_fn = BCEWithLogitsLoss)
            return bce_with_logits(out, gt).mean(), new_stats

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, new_opt, key, loss

    key = jax.random.PRNGKey(seed)
    losses = []
    params, stats = unet_params, unet_stats
    for i in range(steps):
        params, stats, opt_state, key, loss = step_fn(params, stats,
                                                      opt_state, key)
        if i % log_every == 0:
            lv = float(loss)
            losses.append(lv)
            if log_fn:
                log_fn(f"[refine] iter {i} loss {lv:.5f}")
    return params, stats, losses


def apply_refinement(unet_spec: UNetSpec, unet_params, unet_stats,
                     pred_raydrop, pred_intensity, pred_depth):
    """Refine a rendered pano's raydrop (eval path, ``trainer.py:721-723``).
    Inputs [H, W]; returns refined raydrop [H, W]."""
    x = jnp.stack([jnp.asarray(pred_raydrop), jnp.asarray(pred_intensity),
                   jnp.asarray(pred_depth)], axis=0)[None]
    out, _ = unet_spec.apply(unet_params, unet_stats, x, train=False)
    return out[0, 0]
