"""Table gather with a scatter-free custom VJP.

``table_gather(table, cols)`` == ``jnp.take(table, cols, axis=1)`` for a
features-major table ``[F, T]``, but its backward routes through
``nvsf_tpu.ops.segsum.segment_add_fm`` (sort + MXU one-hot matmul) instead
of XLA's serialized scatter-add. This is the TPU replacement for
tiny-cuda-nn's fused encoder forward/backward
(``/root/reference/nvsf/nerf/models/hash_field.py:108-133`` via tcnn).

A further benefit over autodiff-of-take: the VJP residual is just the int32
column vector — the gathered corner values are never saved, so encoder
memory no longer forces rematerialization at large ray batches.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from nvsf_tpu.ops.segsum import segment_add_fm


@functools.lru_cache(maxsize=None)
def _make_gather(T: int, dtype_name: str):
    dtype = jnp.dtype(dtype_name)

    @jax.custom_vjp
    def gather(table, cols):
        return jnp.take(table, cols, axis=1)

    def fwd(table, cols):
        return jnp.take(table, cols, axis=1), cols

    def bwd(cols, g):
        d_table = segment_add_fm(cols, g.astype(jnp.float32), T)
        return d_table.astype(dtype), None

    gather.defvjp(fwd, bwd)
    return gather


def table_gather(table: jnp.ndarray, cols: jnp.ndarray) -> jnp.ndarray:
    """table: [F, T]; cols: [M] int32 -> [F, M]."""
    return _make_gather(table.shape[1], jnp.result_type(table).name)(
        table, cols)
