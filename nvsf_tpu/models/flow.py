"""Scene-flow field: hash-grid encoding + small bias-free MLP -> 6-dim
(forward, backward) flow (``nvsf/nerf/models/flow_field.py:41-133``)."""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from nvsf_tpu.models.hash_grid import HashEncodingSpec, lagrange_fold_table
from nvsf_tpu.models.mlp import MLPSpec


@dataclass(frozen=True)
class FlowFieldSpec:
    num_layers: int = 3
    hidden_dim: int = 64
    num_basis: int = 4
    n_levels: int = 16
    n_features_per_level: int = 8
    base_resolution: int = 32
    max_resolution: int = 8192
    log2_hashmap_size: int = 18
    remat_gather: bool = True

    @property
    def grid(self) -> HashEncodingSpec:
        return HashEncodingSpec(
            dim=3, n_levels=self.n_levels,
            n_features_per_level=self.n_features_per_level,
            log2_hashmap_size=self.log2_hashmap_size,
            base_resolution=self.base_resolution,
            max_resolution=self.max_resolution,
            remat_gather=self.remat_gather)

    @property
    def input_dim(self) -> int:
        return self.grid.n_output_dims // self.num_basis  # 32

    @property
    def mlp(self) -> MLPSpec:
        # bias-free; last layer init N(0, 1e-3) (``flow_field.py:98-103``)
        return MLPSpec(in_dim=self.input_dim, hidden_dim=self.hidden_dim,
                       out_dim=6, n_layers=self.num_layers, bias=False,
                       last_init_std=1e-3)

    def init(self, key):
        kg, km = jax.random.split(key)
        return {"grid": self.grid.init(kg), "mlp": self.mlp.init(km)}

    def apply(self, params, xt, compute_dtype=jnp.float32):
        """xt: [N, 4] in [0,1] (xyz + shared scalar t) -> flow [N, 6].

        The temporal Lagrange blend (``flow_field.py:105-114``) has scalar
        t-dependent coefficients, so it is folded INTO the table before the
        gather (``hash_grid.lagrange_fold_table``): each corner fetches
        F/num_basis features instead of F, and the backward segment-sum
        shrinks by the same factor."""
        x = xt[:, :3]
        t = xt[0, 3]
        folded = lagrange_fold_table(params["grid"], t, self.num_basis)
        h = self.grid.apply(folded, x).astype(jnp.float32)
        return self.mlp.apply(params["mlp"], h, compute_dtype).astype(jnp.float32)
