"""Precision policy for TPU execution.

The reference pipeline runs bf16 end-to-end with fp32 islands (VGGT time
embedding, RMSNorm statistics; see SURVEY.md section 6 'Precision' row and
reference vggt/models/vggt.py:78-82). On TPU the MXU natively consumes
bf16 with f32 accumulation, so the policy is:

  * parameters stored bf16 (fp32 for the fp32-island modules),
  * matmuls: bf16 x bf16 -> f32 accumulate (preferred_element_type),
  * normalization statistics and softmax in f32,
  * RoPE rotation in f32.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.bfloat16
    compute_dtype: jnp.dtype = jnp.bfloat16
    accum_dtype: jnp.dtype = jnp.float32

    def cast_compute(self, x):
        return x.astype(self.compute_dtype)

    def cast_accum(self, x):
        return x.astype(self.accum_dtype)


DEFAULT_POLICY = Policy()
# CPU-parity / unit-test policy: everything f32.
F32_POLICY = Policy(param_dtype=jnp.float32, compute_dtype=jnp.float32)
