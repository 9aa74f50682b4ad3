"""bilinear_align_corners (the DPT pyramid's resize) vs torch
F.interpolate(align_corners=True).

Round 4 rewrote the op from a take()-based gather+lerp into two banded-
matrix matmuls (a lane-axis gather de-vectorizes on TPU; measured 32x
faster at the production refinenet shape, 1-ulp-bf16 identical). These
tests pin the matmul formulation to torch's reference semantics across
up/down/non-integer/degenerate scale factors, and pin the interpolation
matrices' structural invariants.
"""
import numpy as np
import pytest

import conftest  # noqa: F401

from fantasy_world_tpu.ops.interpolate import (bilinear_align_corners,
                                               _interp_matrix)

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402


@pytest.mark.parametrize("hw_in,hw_out", [
    ((7, 9), (14, 18)),        # exact 2x
    ((21, 37), (84, 148)),     # exact 4x (DPT stage-1 level shapes)
    ((84, 148), (168, 296)),   # refinenet 2x at production aspect
    ((10, 12), (7, 5)),        # downscale
    ((5, 8), (13, 11)),        # non-integer both ways
    ((1, 6), (4, 9)),          # degenerate H=1
    ((6, 1), (9, 4)),          # degenerate W=1
    ((8, 8), (8, 8)),          # identity short-circuit
])
def test_matches_torch_align_corners(hw_in, hw_out):
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 5, *hw_in)).astype(np.float32)
    ref = TF.interpolate(torch.from_numpy(x), size=hw_out, mode="bilinear",
                         align_corners=True).numpy()
    out = bilinear_align_corners(jnp.asarray(x), hw_out)
    # torch's CPU upsample derives per-pixel weights through its own f32
    # index math; ours come from f64 coords rounded to f32. The weight
    # rounding differs by a few f32 ulps -> absolute diffs <= ~3e-5 on
    # unit-gaussian data (measured), 1000x below bf16 resolution (the
    # model dtype). The DPT parity suites bound the composed effect.
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3, atol=5e-5)


def test_interp_matrix_rows_sum_to_one():
    for n_in, n_out in ((7, 19), (19, 7), (84, 168), (2, 5), (1, 4)):
        A = _interp_matrix(n_in, n_out)
        assert A.shape == (n_out, n_in)
        np.testing.assert_allclose(A.sum(axis=1), 1.0, rtol=1e-6)
        # two-tap banded: at most 2 nonzeros per row
        assert (np.count_nonzero(A, axis=1) <= 2).all()


def test_bf16_roundtrip_dtype():
    import jax.numpy as jnp
    x = jnp.asarray(np.random.default_rng(1).standard_normal((3, 4, 6, 8)),
                    jnp.bfloat16)
    out = bilinear_align_corners(x, (12, 16))
    assert out.dtype == jnp.bfloat16 and out.shape == (3, 4, 12, 16)
