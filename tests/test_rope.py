"""RoPE parity against the reference torch implementations (CPU oracle)."""
import numpy as np
import pytest

import conftest as C

torch = pytest.importorskip("torch")


def _ref_wan_rope():
    C.add_reference_to_path()
    from FantasyWorld.diffsynth_wan21.models import wan_video_dit as ref
    return ref


@pytest.mark.skipif(not C.reference_available(), reason="reference absent")
# head_dim 128 (DiT) and 96 (bicross) are the deployed configs; head dims not
# divisible by 6 give odd interleave bands in the reference and are unused.
@pytest.mark.parametrize("head_dim,heads", [(128, 4), (96, 12)])
def test_rope_3d_interleaved_parity(head_dim, heads):
    from fantasy_world_tpu.ops import rope
    import jax.numpy as jnp
    ref = _ref_wan_rope()

    f, h, w = 3, 4, 5
    seq = f * h * w
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, seq, heads * head_dim)).astype(np.float32)

    freqs_cis = ref.precompute_freqs_cis_3d(head_dim)
    tf = torch.cat([
        freqs_cis[0][:f].view(f, 1, 1, -1).expand(f, h, w, -1),
        freqs_cis[1][:h].view(1, h, 1, -1).expand(f, h, w, -1),
        freqs_cis[2][:w].view(1, 1, w, -1).expand(f, h, w, -1),
    ], dim=-1).reshape(seq, 1, -1)
    ref_out = ref.rope_apply(torch.from_numpy(x), tf, heads).numpy()

    angles = rope.build_angles_3d(head_dim, f, h, w)
    cos, sin = rope.cos_sin_from_angles(angles)
    xj = jnp.asarray(x).reshape(1, seq, heads, head_dim)
    out = rope.apply_rope_interleaved(xj, cos, sin).reshape(1, seq, -1)

    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=2e-5, atol=2e-5)


@pytest.mark.skipif(not C.reference_available(), reason="reference absent")
def test_rope_3d_with_extra_tokens_parity():
    """freqs_bi_agg layout: 5 unit tokens per frame (fusion model_wan21.py:144)."""
    from fantasy_world_tpu.ops import rope
    import jax.numpy as jnp
    ref = _ref_wan_rope()

    head_dim, heads = 96, 12
    f, h, w, n_extra = 3, 4, 5, 5
    seq = f * (n_extra + h * w)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, seq, heads * head_dim)).astype(np.float32)

    freqs_cis = ref.precompute_freqs_cis_3d(head_dim)
    tf = ref.build_freqs_3d_with_extra_cis(freqs_cis, f, h, w, n_extra)
    ref_out = ref.rope_apply(torch.from_numpy(x), tf, heads).numpy()

    angles = rope.build_angles_3d(head_dim, f, h, w, n_extra_per_frame=n_extra)
    cos, sin = rope.cos_sin_from_angles(angles)
    xj = jnp.asarray(x).reshape(1, seq, heads, head_dim)
    out = rope.apply_rope_interleaved(xj, cos, sin).reshape(1, seq, -1)
    np.testing.assert_allclose(np.asarray(out), ref_out, rtol=2e-5, atol=2e-5)


@pytest.mark.skipif(not C.reference_available(), reason="reference absent")
def test_rope_2d_parity():
    C.add_reference_to_path()
    from FantasyWorld.vggt.layers.rope import (RotaryPositionEmbedding2D,
                                               PositionGetter)
    from fantasy_world_tpu.ops import rope
    import jax.numpy as jnp

    B, H, heads, head_dim = 2, 4, 16, 64
    w = 5
    n_special = 5
    seq = n_special + H * w

    ref_rope = RotaryPositionEmbedding2D(frequency=100.0)
    pos_np = rope.grid_positions_2d(H, w, n_special=n_special)
    pos_t = torch.from_numpy(pos_np.astype(np.int64)).unsqueeze(0).expand(B, -1, -1)

    rng = np.random.default_rng(2)
    x = rng.standard_normal((B, heads, seq, head_dim)).astype(np.float32)
    ref_out = ref_rope(torch.from_numpy(x), pos_t).numpy()

    xj = jnp.asarray(x.transpose(0, 2, 1, 3))      # (B, seq, heads, d)
    pj = jnp.asarray(pos_np)[None].repeat(B, axis=0)
    out = rope.apply_rope_2d(xj, pj)
    out = np.asarray(out).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(out, ref_out, rtol=2e-5, atol=2e-5)


@pytest.mark.skipif(not C.reference_available(), reason="reference absent")
def test_sinusoidal_embedding_parity():
    from fantasy_world_tpu.ops import rope
    import jax.numpy as jnp
    ref = _ref_wan_rope()
    t = np.array([0.0, 1.0, 500.0, 999.0], np.float32)
    ref_out = ref.sinusoidal_embedding_1d(256, torch.from_numpy(t)).numpy()
    out = np.asarray(rope.sinusoidal_embedding_1d(256, jnp.asarray(t)))
    # f32 trig on angles up to ~1000 rad carries ~3e-5 absolute error vs the
    # reference's float64 path -- far below bf16 resolution downstream.
    np.testing.assert_allclose(out, ref_out, rtol=1e-4, atol=1e-4)


def test_rope_half_equals_permuted_interleaved():
    """apply_rope_half(perm(x)) == perm(apply_rope_interleaved(x)) -- the
    weight-folded permutation scheme used by the hot path (ops/rope.py)."""
    import numpy as np
    import jax.numpy as jnp
    from fantasy_world_tpu.ops import rope

    rng = np.random.default_rng(0)
    seq, heads, d = 23, 3, 96
    x = rng.standard_normal((2, seq, heads, d)).astype(np.float32)
    ang = rope.build_angles_3d(d, 2, 3, 4)[:seq]

    cos_i, sin_i = rope.cos_sin_from_angles(ang)
    ref = np.asarray(rope.apply_rope_interleaved(jnp.asarray(x), cos_i, sin_i))

    idx = rope.deinterleave_indices(d)
    cos_h, sin_h = rope.cos_sin_half_from_angles(ang)
    out = np.asarray(rope.apply_rope_half(jnp.asarray(x[..., idx]),
                                          cos_h, sin_h))
    np.testing.assert_allclose(out, ref[..., idx], rtol=1e-6, atol=1e-6)

    # permute_qk_out_channels applies the same permutation across heads
    w = rng.standard_normal((5, heads * d)).astype(np.float32)
    wp = rope.permute_qk_out_channels(w, d)
    manual = w.reshape(5, heads, d)[..., idx].reshape(5, heads * d)
    np.testing.assert_array_equal(wp, manual)


def test_rope_2d_hoisted_tables_equal_direct():
    """The scan-hoisted table path (rope2d_tables_from_positions +
    apply_rope_2d_tables) must equal apply_rope_2d, including after the
    frame->global layout reshape used by the fusion loop."""
    from fantasy_world_tpu.ops import rope
    import jax.numpy as jnp

    B, S, Hh, Ww, heads, head_dim = 2, 3, 4, 5, 16, 64
    n_special = 5
    P = n_special + Hh * Ww
    pos = rope.grid_positions_2d(Hh, Ww, n_special=n_special)
    pos_f = jnp.broadcast_to(jnp.asarray(pos)[None], (B * S, P, 2))

    rng = np.random.default_rng(3)
    xf = jnp.asarray(rng.standard_normal((B * S, P, heads, head_dim))
                     .astype(np.float32))
    direct = rope.apply_rope_2d(xf, pos_f)
    tab_f = rope.rope2d_tables_from_positions(pos_f, head_dim)
    hoisted = rope.apply_rope_2d_tables(xf, *tab_f)
    np.testing.assert_allclose(np.asarray(hoisted), np.asarray(direct),
                               rtol=1e-6, atol=1e-6)

    # global layout: reshaped tables == tables from reshaped positions
    xg = xf.reshape(B, S * P, heads, head_dim)
    pos_g = pos_f.reshape(B, S * P, 2)
    tab_g = tuple(t.reshape(B, S * P, 1, t.shape[-1]) for t in tab_f)
    out_g = rope.apply_rope_2d_tables(xg, *tab_g)
    np.testing.assert_allclose(np.asarray(out_g),
                               np.asarray(rope.apply_rope_2d(xg, pos_g)),
                               rtol=1e-6, atol=1e-6)
