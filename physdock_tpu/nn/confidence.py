"""Confidence module: PAE/PDE/pLDDT heads.

Re-implementation of reference PhysDock/models/layers/confidence_module.py
(marked unused in the released checkpoint but wired into the training config
via use_mini_rollout — loss_module3.py:599-610).  Kept as an optional head:
the released ranking path is geometric clustering (infer/ranking.py); a
trained confidence head enables fused VS ranking (BASELINE north star).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from physdock_tpu.nn.primitives import Linear
from physdock_tpu.nn.transformers import AtomTransformer, Pairformer
from physdock_tpu.utils.geometry import one_hot_nearest

Dtype = Any


class ConfidenceModule(nn.Module):
    c_a: int
    c_ap: int
    c_z: int
    no_blocks_heads: int
    no_blocks_atom: int = 3
    c_pae: int = 64
    c_pde: int = 64
    c_plddt: int = 50
    inf: float = 1e9
    eps: float = 1e-8
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, batch: Dict, s, z, x_pred):
        """x_pred: [S, A, 3]; uses sample 0 (confidence_module.py:65)."""
        centre_ids = batch["token_id_to_centre_atom_id"]
        tok_of_atom = batch["atom_id_to_token_id"]
        xc = jnp.take(x_pred[0], centre_ids, axis=-2)

        z = (
            z
            + Linear(self.c_z, dtype=self.dtype, name="linear_s_i")(s)[..., None, :]
            + Linear(self.c_z, dtype=self.dtype, name="linear_s_j")(s)[..., None, :, :]
        )
        d = jnp.linalg.norm(
            xc[..., None, :] - xc[..., None, :, :] + 1e-12, axis=-1
        )
        v_bins = jnp.linspace(3.375, 24.375, 13)
        z = z + Linear(self.c_z, use_bias=False, dtype=self.dtype, name="linear_d")(
            one_hot_nearest(d, v_bins).astype(self.dtype)
        )

        s, z = Pairformer(
            no_blocks=self.no_blocks_heads,
            inf=self.inf,
            eps=self.eps,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            name="pairformer",
        )(s, z, batch["z_mask"])
        z = z + jnp.swapaxes(z, -2, -3)
        p_pae = Linear(self.c_pae, dtype=self.dtype, name="linear_pae")(z)
        p_pde = Linear(self.c_pde, dtype=self.dtype, name="linear_pde")(z)

        a = jnp.take(
            Linear(self.c_a, dtype=self.dtype, name="linear_s_a")(s),
            tok_of_atom,
            axis=-2,
        )
        d_atoms = jnp.linalg.norm(
            x_pred[0][None] - x_pred[0][:, None] + 1e-12, axis=-1
        )[..., None]
        ap = Linear(self.c_ap, dtype=self.dtype, name="linear_z_a")(
            d_atoms.astype(self.dtype)
        )
        a = a + AtomTransformer(
            no_blocks=self.no_blocks_atom,
            inf=self.inf,
            eps=self.eps,
            dtype=self.dtype,
            attn_impl=self.attn_impl,
            name="atom_transformer",
        )(a, ap, batch["ap_mask"])
        p_plddt = Linear(self.c_plddt, dtype=self.dtype, name="linear_plddt")(a)

        return (
            p_pae.astype(jnp.float32),
            p_pde.astype(jnp.float32),
            p_plddt.astype(jnp.float32),
        )
