"""Flash-attention custom VJP: Pallas backward parity vs the XLA path.

The production logits (16,317^2 per head) cannot be materialized by the
XLA fallback, so TPU training differentiates through the Pallas kernels
(_flash_backward). These tests check dq/dk/dv against jax.grad of the XLA
attention in interpret mode, across the raggedness/padding cases the
forward discipline produces.
"""
import numpy as np
import pytest

import conftest  # noqa: F401


def _grads(fn, q, k, v, do):
    import jax
    import jax.numpy as jnp

    def loss(q, k, v):
        return jnp.sum(fn(q, k, v) * do)
    return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)


@pytest.mark.parametrize("lq,lk,h,d,bq,bk", [
    (256, 256, 2, 128, 128, 128),     # aligned, multi k block
    (200, 300, 1, 64, 128, 128),      # ragged seqs + padded head dim
    (130, 513, 2, 96, 128, 256),      # ragged everything
    (128, 100, 2, 128, 128, 128),     # onekv forward path
])
def test_flash_vjp_interpret_parity(lq, lk, h, d, bq, bk):
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from fantasy_world_tpu.ops import flash_attention as fa
    from fantasy_world_tpu.ops.attention import _xla_attention

    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.standard_normal((1, lq, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, lk, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, lk, h, d)), jnp.float32)
    do = jnp.asarray(rng.standard_normal((1, lq, h, d)), jnp.float32)
    scale = d ** -0.5

    ref = _grads(lambda q, k, v: _xla_attention(q, k, v, scale), q, k, v, do)
    with pltpu.force_tpu_interpret_mode():
        got = _grads(lambda q, k, v: fa.flash_attention(
            q, k, v, scale=scale, block_q=bq, block_k=bk), q, k, v, do)

    for g, r, name in zip(got, ref, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-3, atol=2e-3,
                                   err_msg=f"d{name} mismatch")


def test_flash_vjp_paired_head_route():
    """head_dim<=64 primal uses the paired kernel; the VJP must still work
    (its fwd rule reroutes through the generic stats kernel)."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu
    from fantasy_world_tpu.ops import flash_attention as fa
    from fantasy_world_tpu.ops.attention import _xla_attention

    rng = np.random.default_rng(8)
    q = jnp.asarray(rng.standard_normal((1, 140, 4, 64)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 140, 4, 64)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 140, 4, 64)), jnp.float32)
    do = jnp.asarray(rng.standard_normal((1, 140, 4, 64)), jnp.float32)
    scale = 64 ** -0.5

    ref = _grads(lambda q, k, v: _xla_attention(q, k, v, scale), q, k, v, do)
    with pltpu.force_tpu_interpret_mode():
        got = _grads(lambda q, k, v: fa.flash_attention(q, k, v, scale=scale),
                     q, k, v, do)
    for g, r, name in zip(got, ref, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-3, atol=2e-3,
                                   err_msg=f"d{name} mismatch")
