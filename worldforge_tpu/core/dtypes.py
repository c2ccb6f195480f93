"""Dtype policy for mixed-precision inference on TPU.

The reference stacks run bf16 compute with fp32 "islands" (norms, adaLN
modulation, gated residual adds — e.g. WanAttentionBlock keeps `e` fp32 and
does the residual `x + y * e[2]` under fp32 autocast,
/root/reference/wan_for_worldforge/wan/modules/model.py:297-313; LongCat keeps
FFN gate and residuals fp32). On TPU we mirror that: params and matmul inputs
bf16 (MXU), norms/modulation/residual accumulation fp32 (VPU).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    """Mixed-precision policy threaded through model apply functions."""

    param_dtype: jnp.dtype = jnp.bfloat16  # storage dtype of weights
    compute_dtype: jnp.dtype = jnp.bfloat16  # matmul input dtype
    norm_dtype: jnp.dtype = jnp.float32  # layernorm/rmsnorm internal dtype
    mod_dtype: jnp.dtype = jnp.float32  # adaLN modulation + gated residuals

    def cast_compute(self, x):
        return x.astype(self.compute_dtype)

    def cast_mod(self, x):
        return x.astype(self.mod_dtype)


DEFAULT_POLICY = Policy()

# Full-fp32 policy (VAE / CLIP run fp32 in the reference:
# /root/reference/wan_for_worldforge/infer_worldforge.py:179-197)
FP32_POLICY = Policy(
    param_dtype=jnp.float32,
    compute_dtype=jnp.float32,
    norm_dtype=jnp.float32,
    mod_dtype=jnp.float32,
)
