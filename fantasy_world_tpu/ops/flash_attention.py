"""Pallas TPU flash-attention (dense, bidirectional, online-softmax).

One kernel serves every attention family in the framework (DiT self/cross,
VGGT frame/global, bicross): all are dense bidirectional attentions, so no
causal masking is needed -- only key-padding masking for ragged sequence
lengths (the video token count 21*21*37 = 16317 is not lane-aligned).

Design (see /opt/skills/guides/pallas_guide.md):
  * inputs stay in their natural (B, L, H, D) layout; the wrapper reshapes
    (free) to (B, L, H*D) and the per-head block is addressed as a D-wide
    column slice -- no transposes, no HBM copies.
  * grid (B, H, num_q_blocks, num_k_blocks); the k axis is innermost so the
    f32 accumulator / running-max / running-sum scratch carried in VMEM is
    valid across the online-softmax sweep.
  * q/k/v blocks stay bf16 in VMEM; logits and softmax statistics are f32.
  * head_dim is zero-padded to a lane multiple (zero lanes do not perturb
    logits; zero value lanes are sliced off). The SEQUENCE axes are NOT
    physically padded (a pad is a full-tensor HBM copy -- measured ~2 ms
    per q/k/v at the 480P shape): the grid is ceil-divided and the final
    ragged blocks are handled in-kernel. OOB q rows compute garbage that
    the masked store drops; OOB k/v rows of the tail block are zeroed on
    load (two (BK, D) selects, 8x cheaper than masking the (BQ, BK)
    logits), which reproduces the zero-padded-key situation exactly: a
    zeroed key scores 0 and contributes exactly n_pad * exp2(-m) to the
    softmax sum, which the tail block subtracts (see _fa_kernel).

Performance notes (measured on v5e, 197 bf16 TFLOP/s):
  * the inner loop is VPU-bound, not MXU-bound, at these head dims; every
    elementwise pass over the (block_q, block_k) logits matters. Softmax
    therefore runs in the exp2 domain (TPU transcendental unit is exp2;
    exp costs an extra multiply pass) with log2(e)*scale folded into q --
    one (block_q, D) multiply replaces two (block_q, block_k) passes.
  * when every key fits in one k block (cross-attention vs 769 context
    tokens, VGGT per-frame attention over 782 tokens) a stats-free fast
    path computes plain softmax without running-max/rescale bookkeeping
    or scratch init/finalize.
  * block_q = block_k = 1024 measured best across all five production
    shapes (vs 512/1024 default of round 1: +6% on DiT self-attention).
  * FAILED EXPERIMENT (2026-08-17, don't retry): int8-QK flash attention.
    Pre-quantized per-row int8 q/k (scales lane-replicated, rescale of the
    int32 logits fused into the softmax scale) with the production 4-D
    grid/blocking measured 0.94x vs this bf16 kernel at the DiT self shape
    (2,16384,40,128): the inner loop is VPU-bound (softmax), so doubling
    MXU rate on QK^T buys nothing and the extra f32 rescale pass over the
    (BQ, BK) logits costs ~6%. Accuracy was fine (cos 0.99997); speed is
    the reason it's dead. int8 stays weights+dense-activations only
    (core/quant.py).
  * Block-size sweep re-run 2026-08-18 (chained-scan microbench, kv as
    args, per-call at the production shapes): DiT self (2,16317,40,128)
    74-75 ms = 145-147 TFLOP/s; bicross (16317x16422, 12h x 96) 22.2 ms =
    111 TFLOP/s; VGGT global (16422, 16h x 64 paired path) 30.6 ms = 72
    TFLOP/s; VGGT frame (42x782) 0.57 ms = 184 TFLOP/s; DiT cross 6.5 ms
    = 79 TFLOP/s (2.0x the XLA path). bq512 regressed self 13%, bq2048
    5%; defaults (bq1024, bk2048 generic / 1024 paired) confirmed best.
    WHY THE REMAINDER IS IRREDUCIBLE HERE: counting the structural MXU
    ceilings -- 96->128 lane pad caps bicross at ~75% of peak, D=64
    contraction caps the paired path at ~50% -- every shape lands at
    73-75% of ITS ceiling, exactly where DiT self (no pad, D=128) lands
    in absolute terms. The uniform ~25% gap is the online-softmax VPU
    sweep that cannot overlap the MXU further under Mosaic's pipeline;
    the int8-QK and head-packing experiments below attacked it and lost.
  * FAILED EXPERIMENT (2026-08-17, don't retry): packing four 96-wide
    bicross heads into 384 lanes via block-diagonal K'/V' (generalizing
    the paired-head kernel) to avoid the 96->128 pad measured 45 useful
    TFLOP/s vs 102 for this generic kernel at the production bicross
    shape -- the (4BK, 384) block-diagonal concats plus per-head stat
    reassembly are VPU passes that cost far more than the 25% MXU pad
    waste, and BQ=1024 blows scoped VMEM (19M > 16M). The pad-128 path
    is already at ~69% of chip peak counting padded FLOPs.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
_LOG2E = 1.4426950408889634


def _fa_kernel(q_ref, k_ref, v_ref, *refs,
               scale: float, n_pad: int, with_stats: bool = False):
    """Online-softmax sweep over k blocks (exp2 domain).

    Padded key columns are NOT masked: the wrapper zero-pads k and v, so a
    padded column scores exactly 0 and contributes exactly exp2(0 - m) to
    the softmax sum (and nothing to the accumulator, v rows being zero).
    The tail block subtracts that known contribution -- n_pad * exp2(-m) --
    from l instead of paying iota/compare/select passes on every block.
    The subtraction is exact in real arithmetic but cancels catastrophically
    in f32 when the real keys' total mass is below ~2^-24 of the pad mass
    (every true logit < about -25 in log2 after max-shift -- unreachable
    for sane attention inputs, but it would be an Inf/NaN cliff): the
    finalize therefore clamps the corrected l at 2^-23 * l, which is
    inactive in every normal case and bounds |o| by max|v| in the
    pathological one.

    with_stats: two extra (1, BQ, 128) outputs receive the pad-corrected
    softmax statistics per q row -- the base-2 running max m2 and the sum
    l = sum(exp2(s2 - m2)) -- for cross-device merging (parallel/ring.py).
    The stats store the full (BQ, 128) lane-replicated stat scratch as-is
    (Mosaic requires 128-lane blocks; a lane-1 column store is rejected):
    no relayout inside the kernel, the wrapper slices lane 0 outside."""
    if with_stats:
        o_ref, mstat_ref, lstat_ref, acc_ref, m_ref, l_ref = refs
    else:
        o_ref, acc_ref, m_ref, l_ref = refs
    ik = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ik == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = (q_ref[0].astype(jnp.float32) * (scale * _LOG2E)).astype(q_ref.dtype)
    k = k_ref[0]                               # (BK, D)
    v = v_ref[0]                               # (BK, D)
    if n_pad:
        # ragged tail: zero the out-of-bounds k/v rows so the exact
        # zero-pad softmax correction below applies unchanged
        rows = jax.lax.broadcasted_iota(jnp.int32, k.shape, 0)
        ok = (ik < nk - 1) | (rows < k.shape[0] - n_pad)
        k = jnp.where(ok, k, 0)
        v = jnp.where(ok, v, 0)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)    # (BQ, BK), log2-domain logits

    m_prev = m_ref[...]                        # (BQ, 128) replicated stat
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
    alpha = jnp.exp2(m_prev - m_new)
    p = jnp.exp2(s - m_new[:, :1])
    l_ref[...] = l_ref[...] * alpha + jnp.broadcast_to(
        jnp.sum(p, axis=-1, keepdims=True), m_prev.shape)
    m_ref[...] = m_new
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_ref[...] = acc_ref[...] * alpha[:, :1] + pv

    @pl.when(ik == nk - 1)
    def _finalize():
        l = l_ref[..., :1]
        if n_pad:
            # see kernel docstring: relative clamp kills the cancellation
            # Inf/NaN cliff without touching the hot loop
            l = jnp.maximum(l - n_pad * jnp.exp2(-m_ref[..., :1]),
                            l * jnp.float32(1.1920929e-7))
        o_ref[0] = (acc_ref[...] / l).astype(o_ref.dtype)
        if with_stats:
            mstat_ref[0] = m_ref[...]
            lstat_ref[0] = jnp.broadcast_to(l, lstat_ref.shape[1:])


def _fa_kernel_onekv(q_ref, k_ref, v_ref, *refs, scale: float, n_pad: int,
                     with_stats: bool = False):
    """Fast path: every key in one block -> plain (still max-shifted)
    softmax, no scratch, no init/finalize conditionals, no rescale passes.
    Key padding handled by the same exact zero-pad correction as above."""
    if with_stats:
        o_ref, mstat_ref, lstat_ref = refs
    else:
        (o_ref,) = refs
    q = (q_ref[0].astype(jnp.float32) * (scale * _LOG2E)).astype(q_ref.dtype)
    k = k_ref[0]
    v = v_ref[0]
    if n_pad:
        rows = jax.lax.broadcasted_iota(jnp.int32, k.shape, 0)
        ok = rows < k.shape[0] - n_pad
        k = jnp.where(ok, k, 0)
        v = jnp.where(ok, v, 0)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    if n_pad:
        # relative clamp: see _fa_kernel docstring
        l = jnp.maximum(l - n_pad * jnp.exp2(-m),
                        l * jnp.float32(1.1920929e-7))
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = (pv / l).astype(o_ref.dtype)
    if with_stats:
        mstat_ref[0] = jnp.broadcast_to(m, mstat_ref.shape[1:])
        lstat_ref[0] = jnp.broadcast_to(l, lstat_ref.shape[1:])


def _fa_kernel_pair(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *,
                    scale: float, n_pad: int, block_k: int):
    """Two heads of head_dim<=64 per program at FULL MXU rate.

    A 64-wide head pads to 128 lanes and runs every matmul at half MXU
    utilization. Instead, lanes 0-63 carry head h0 and 64-127 head h1, and
    the kernel builds block-diagonal key/value matrices

        K' = [[k0, 0], [0, k1]]   (2*BK, 128)
        V' = [[v0, 0], [0, v1]]   (2*BK, 128)

    so  q_pair @ K'^T = [s0 | s1] (BQ, 2*BK)  and  p_pair @ V' lands h0's
    output in lanes 0-63 and h1's in 64-127 -- both (BQ,128)-contraction
    matmuls with zero wasted MXU columns. Softmax statistics are kept
    per-head in lane halves of the (BQ, 128) stat scratch."""
    ik = pl.program_id(3)
    nk = pl.num_programs(3)
    D2 = 64

    @pl.when(ik == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = (q_ref[0].astype(jnp.float32) * (scale * _LOG2E)).astype(q_ref.dtype)
    kp = k_ref[0]                              # (BK, 128) two heads
    vp = v_ref[0]
    BK = kp.shape[0]
    if n_pad:
        rows = jax.lax.broadcasted_iota(jnp.int32, kp.shape, 0)
        ok = (ik < nk - 1) | (rows < BK - n_pad)
        kp = jnp.where(ok, kp, 0)
        vp = jnp.where(ok, vp, 0)
    z = jnp.zeros((BK, D2), kp.dtype)
    kd = jnp.concatenate(
        [jnp.concatenate([kp[:, :D2], z], axis=1),
         jnp.concatenate([z, kp[:, D2:]], axis=1)], axis=0)   # (2BK, 128)
    vd = jnp.concatenate(
        [jnp.concatenate([vp[:, :D2], z], axis=1),
         jnp.concatenate([z, vp[:, D2:]], axis=1)], axis=0)

    s = jax.lax.dot_general(
        q, kd, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)    # (BQ, 2BK) = [s0 | s1]

    m_prev = m_ref[...]                        # lanes [:64]=h0, [64:]=h1
    m0 = jnp.max(s[:, :BK], axis=-1, keepdims=True)
    m1 = jnp.max(s[:, BK:], axis=-1, keepdims=True)
    m_cur = jnp.concatenate([jnp.broadcast_to(m0, (m0.shape[0], D2)),
                             jnp.broadcast_to(m1, (m1.shape[0], D2))], axis=1)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp2(m_prev - m_new)
    m_bcast = jnp.concatenate(
        [jnp.broadcast_to(m_new[:, :1], (s.shape[0], BK)),
         jnp.broadcast_to(m_new[:, D2:D2 + 1], (s.shape[0], BK))], axis=1)
    p = jnp.exp2(s - m_bcast)
    l0 = jnp.sum(p[:, :BK], axis=-1, keepdims=True)
    l1 = jnp.sum(p[:, BK:], axis=-1, keepdims=True)
    l_cur = jnp.concatenate([jnp.broadcast_to(l0, (l0.shape[0], D2)),
                             jnp.broadcast_to(l1, (l1.shape[0], D2))], axis=1)
    l_ref[...] = l_ref[...] * alpha + l_cur
    m_ref[...] = m_new
    pv = jax.lax.dot_general(
        p.astype(vd.dtype), vd, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)    # (BQ, 128) both heads
    acc_ref[...] = acc_ref[...] * alpha + pv

    @pl.when(ik == nk - 1)
    def _finalize():
        l = l_ref[...]
        if n_pad:
            # relative clamp: see _fa_kernel docstring
            l = jnp.maximum(l - n_pad * jnp.exp2(-m_ref[...]),
                            l * jnp.float32(1.1920929e-7))
        o_ref[0] = (acc_ref[...] / l).astype(o_ref.dtype)


def _pad_axis(x, axis, target):
    pad = target - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                    scale: Optional[float] = None,
                    block_q: int = 1024,
                    block_k: Optional[int] = None,
                    return_stats: bool = False):
    """q: (B, Lq, H, D), k/v: (B, Lk, H, D) -> (B, Lq, H, D).

    Differentiable: the plain call carries a custom VJP whose backward runs
    the Pallas kernels in _flash_backward (the XLA fallback cannot even
    materialize the production logits, so TPU training needs this path).
    The ``return_stats`` variant is forward-only (it is the primitive under
    parallel/ring.py, whose merge is differentiated at the XLA level).

    block_k default (measured on v5e at the production shapes, 2026-08):
    2048 for the generic path (+8% on DiT self 40hx128@16317, +1.5% on
    bicross 12hx96; still inside the default 16M scoped-VMEM budget) and
    1024 for the paired-head path (2048 regressed VGGT global by 5% and
    larger q blocks blow the VMEM stack).

    return_stats: additionally return the per-row softmax statistics
    (m2, l), both (B, Lq, H) f32 in the BASE-2 domain: with
    s2 = log2(e)*scale*(q.k), m2 = max_k s2 and l = sum_k exp2(s2 - m2).
    o, m2, l are exactly mergeable across key shards (parallel/ring.py).
    The stats request routes head_dim<=64 through the generic kernel
    (the paired-head layout interleaves two heads per stat lane)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if return_stats:
        return _flash_forward(q, k, v, scale=scale, block_q=block_q,
                              block_k=block_k, return_stats=True)
    return _flash_diff(q, k, v, scale, block_q, block_k)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k",
                                             "return_stats"))
def _flash_forward(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                   scale: float,
                   block_q: int = 1024,
                   block_k: Optional[int] = None,
                   return_stats: bool = False):
    B, Lq, H, D = q.shape
    Lk = k.shape[1]

    if D <= 64 and H % 2 == 0 and not return_stats:
        bk = min(block_k or 1024, -(-Lk // 128) * 128)
        bq = min(block_q, -(-Lq // 128) * 128)
        return _flash_attention_paired(q, k, v, scale, bq, bk)

    block_q = min(block_q, -(-Lq // 128) * 128)
    block_k = min(block_k or 2048, -(-Lk // 128) * 128)

    d_pad = -(-D // 128) * 128

    # (B, L, H, D) -> pad D only (zero lanes; free when D is already a lane
    # multiple) -> reshape (B, L, H*Dp). The L axes stay ragged: the grid is
    # ceil-divided and the kernels mask the tail blocks.
    qp = _pad_axis(q, 3, d_pad).reshape(B, Lq, H * d_pad)
    kp = _pad_axis(k, 3, d_pad).reshape(B, Lk, H * d_pad)
    vp = _pad_axis(v, 3, d_pad).reshape(B, Lk, H * d_pad)

    nq = -(-Lq // block_q)
    nk = -(-Lk // block_k)
    lk_pad = nk * block_k

    qspec = pl.BlockSpec((1, block_q, d_pad), lambda b, h, iq, ik: (b, iq, h))
    kvspec = pl.BlockSpec((1, block_k, d_pad), lambda b, h, iq, ik: (b, ik, h))
    ospec = pl.BlockSpec((1, block_q, d_pad), lambda b, h, iq, ik: (b, iq, h))
    out_shape = jax.ShapeDtypeStruct((B, Lq, H * d_pad), q.dtype)
    if return_stats:
        # full (BQ, 128) lane-replicated stat stores (Mosaic's lane-block
        # minimum); ~0.3 ms extra HBM write at the production shape, lane 0
        # sliced off outside the kernel
        sspec = pl.BlockSpec((1, block_q, 128),
                             lambda b, h, iq, ik: (b, iq, h))
        sshape = jax.ShapeDtypeStruct((B, Lq, H * 128), jnp.float32)
        out_specs = [ospec, sspec, sspec]
        out_shape = [out_shape, sshape, sshape]
    else:
        out_specs = ospec

    if nk == 1:
        out = pl.pallas_call(
            functools.partial(_fa_kernel_onekv, scale=scale,
                              n_pad=lk_pad - Lk, with_stats=return_stats),
            grid=(B, H, nq, 1),
            in_specs=[qspec, kvspec, kvspec],
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel",
                                     "arbitrary"),
            ),
        )(qp, kp, vp)
    else:
        out = pl.pallas_call(
            functools.partial(_fa_kernel, scale=scale, n_pad=lk_pad - Lk,
                              with_stats=return_stats),
            grid=(B, H, nq, nk),
            in_specs=[qspec, kvspec, kvspec],
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((block_q, d_pad), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel",
                                     "arbitrary"),
            ),
        )(qp, kp, vp)

    if return_stats:
        out, m2, l = out
        o = out.reshape(B, Lq, H, d_pad)[..., :D] if d_pad != D else \
            out.reshape(B, Lq, H, D)
        return (o, m2.reshape(B, Lq, H, 128)[..., 0],
                l.reshape(B, Lq, H, 128)[..., 0])
    return out.reshape(B, Lq, H, d_pad)[..., :D] if d_pad != D else \
        out.reshape(B, Lq, H, D)


def _flash_attention_paired(q, k, v, scale, block_q, block_k):
    """head_dim <= 64, even H: two heads per program (see _fa_kernel_pair).
    Layout (B, L, H*64); a 128-lane block column at index hp covers heads
    (2*hp, 2*hp+1)."""
    B, Lq, H, D = q.shape
    Lk = k.shape[1]
    d_pad = 64

    qp = _pad_axis(q, 3, d_pad).reshape(B, Lq, H * d_pad)
    kp = _pad_axis(k, 3, d_pad).reshape(B, Lk, H * d_pad)
    vp = _pad_axis(v, 3, d_pad).reshape(B, Lk, H * d_pad)

    nq = -(-Lq // block_q)
    nk = -(-Lk // block_k)
    lk_pad = nk * block_k

    qspec = pl.BlockSpec((1, block_q, 128), lambda b, h, iq, ik: (b, iq, h))
    kvspec = pl.BlockSpec((1, block_k, 128), lambda b, h, iq, ik: (b, ik, h))
    ospec = pl.BlockSpec((1, block_q, 128), lambda b, h, iq, ik: (b, iq, h))

    out = pl.pallas_call(
        functools.partial(_fa_kernel_pair, scale=scale, n_pad=lk_pad - Lk,
                          block_k=block_k),
        grid=(B, H // 2, nq, nk),
        in_specs=[qspec, kvspec, kvspec],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((B, Lq, H * d_pad), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
    )(qp, kp, vp)

    return out.reshape(B, Lq, H, d_pad)[..., :D] if d_pad != D else \
        out.reshape(B, Lq, H, D)


# ---------------------------------------------------------------------------
# backward pass (custom VJP): FlashAttention-2-style Pallas kernels
# ---------------------------------------------------------------------------
#
# With the forward's base-2 logits s2 = c*(q.k), c = scale*log2(e), and the
# saved log-sum-exp lse2 = m2 + log2(l), the probabilities reconstruct as
# p = exp2(s2 - lse2) and the chain-rule constants cancel exactly:
#   dL/d(q.k) = ln(2) * c * p*(dp - delta) = scale * p*(dp - delta)
# where dp = do.v^T and delta = rowsum(do*o). delta is recomputed in-kernel
# per q block (one (BQ, D) elementwise pass -- cheaper than a residual
# array). Two kernels: dq sweeps k blocks with a VMEM accumulator; dk/dv
# sweeps q blocks, using transposed-contraction dot_generals (dim 0 vs
# dim 0) so no block is ever physically transposed.
#
# Raggedness: OOB k/v rows are zeroed in the dq kernel (their k row nulls
# the contribution); OOB q rows have garbage lse, so the dk/dv kernel
# zeroes their p rows explicitly; OOB output rows are dropped by the
# clipped stores either way.


def _fa_bwd_dq_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref, dq_ref,
                      dq_acc, delta_ref, *, scale: float, n_pad_k: int):
    ik = pl.program_id(3)
    nk = pl.num_programs(3)

    @pl.when(ik == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)
        do_f = do_ref[0].astype(jnp.float32)
        o_f = o_ref[0].astype(jnp.float32)
        delta_ref[...] = jnp.broadcast_to(
            jnp.sum(do_f * o_f, axis=-1, keepdims=True), delta_ref.shape)

    qs = (q_ref[0].astype(jnp.float32) * (scale * _LOG2E)).astype(q_ref.dtype)
    k = k_ref[0]
    v = v_ref[0]
    if n_pad_k:
        rows = jax.lax.broadcasted_iota(jnp.int32, k.shape, 0)
        ok = (ik < nk - 1) | (rows < k.shape[0] - n_pad_k)
        k = jnp.where(ok, k, 0)
        v = jnp.where(ok, v, 0)

    s2 = jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    p = jnp.exp2(s2 - lse_ref[0][:, :1])
    dp = jax.lax.dot_general(do_ref[0], v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta_ref[..., :1])
    dq_acc[...] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ik == nk - 1)
    def _finalize():
        dq_ref[0] = (dq_acc[...] * scale).astype(dq_ref.dtype)


def _fa_bwd_dkv_kernel(k_ref, v_ref, q_ref, o_ref, do_ref, lse_ref,
                       dk_ref, dv_ref, dk_acc, dv_acc, *,
                       scale: float, n_pad_q: int):
    iq = pl.program_id(3)
    nq = pl.num_programs(3)

    @pl.when(iq == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q = q_ref[0]
    do = do_ref[0]
    if n_pad_q:
        # OOB q rows read garbage (NaN in interpret mode) and the dk/dv
        # contractions SUM over q rows, so 0*NaN would poison every output
        # row: zero the q/do rows themselves, and re-mask p and ds after
        # the arithmetic (their OOB rows see garbage lse/dp/delta).
        rows = jax.lax.broadcasted_iota(jnp.int32, q.shape, 0)
        row_ok = (iq < nq - 1) | (rows[:, :1] < q.shape[0] - n_pad_q)
        q = jnp.where(row_ok, q, 0)
        do = jnp.where(row_ok, do, 0)
    qs = (q.astype(jnp.float32) * (scale * _LOG2E)).astype(q.dtype)
    s2 = jax.lax.dot_general(qs, k_ref[0], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    p = jnp.exp2(s2 - lse_ref[0][:, :1])
    if n_pad_q:
        p = jnp.where(row_ok, p, 0)
    dv_acc[...] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v_ref[0], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    delta = jnp.sum(do.astype(jnp.float32) * o_ref[0].astype(jnp.float32),
                    axis=-1, keepdims=True)
    ds = p * (dp - delta)
    if n_pad_q:
        ds = jnp.where(row_ok, ds, 0)
    dk_acc[...] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(iq == nq - 1)
    def _finalize():
        dk_ref[0] = (dk_acc[...] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k"))
def _flash_backward(q, k, v, o, lse2, do, *, scale: float,
                    block_q: int, block_k: Optional[int]):
    """(dq, dk, dv) at the same raggedness discipline as forward, at
    smaller blocks: the backward keeps four (BQ, BK) f32 temporaries live
    at once (s2, p, dp, ds), so the forward's 1024x2048 blocking blows the
    16M scoped-VMEM stack (measured: 19.2M on v5e); 512x1024 fits with
    room for double-buffering."""
    B, Lq, H, D = q.shape
    Lk = k.shape[1]
    block_q = min(block_q, 512, -(-Lq // 128) * 128)
    block_k = min(block_k or 1024, 1024, -(-Lk // 128) * 128)
    d_pad = -(-D // 128) * 128
    nq = -(-Lq // block_q)
    nk = -(-Lk // block_k)

    qp = _pad_axis(q, 3, d_pad).reshape(B, Lq, H * d_pad)
    kp = _pad_axis(k, 3, d_pad).reshape(B, Lk, H * d_pad)
    vp = _pad_axis(v, 3, d_pad).reshape(B, Lk, H * d_pad)
    op = _pad_axis(o, 3, d_pad).reshape(B, Lq, H * d_pad)
    dop = _pad_axis(do, 3, d_pad).reshape(B, Lq, H * d_pad)
    # lane-replicate lse (B, Lq, H) -> (B, Lq, H*128) so its blocks meet the
    # 128-lane minimum; ~Lq*H*512B of HBM, trivial next to the matmuls
    lse_rep = jnp.broadcast_to(lse2[..., None],
                               (B, Lq, H, 128)).reshape(B, Lq, H * 128)

    qblk = pl.BlockSpec((1, block_q, d_pad), lambda b, h, iq, ik: (b, iq, h))
    kblk = pl.BlockSpec((1, block_k, d_pad), lambda b, h, iq, ik: (b, ik, h))
    lse_q = pl.BlockSpec((1, block_q, 128), lambda b, h, iq, ik: (b, iq, h))

    dq = pl.pallas_call(
        functools.partial(_fa_bwd_dq_kernel, scale=scale,
                          n_pad_k=nk * block_k - Lk),
        grid=(B, H, nq, nk),
        in_specs=[qblk, kblk, kblk, qblk, qblk, lse_q],
        out_specs=qblk,
        out_shape=jax.ShapeDtypeStruct((B, Lq, H * d_pad), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d_pad), jnp.float32),
                        pltpu.VMEM((block_q, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
    )(qp, kp, vp, op, dop, lse_rep)

    # dk/dv grid: q innermost; index maps swap roles (dims 2=k, 3=q)
    kblk2 = pl.BlockSpec((1, block_k, d_pad), lambda b, h, ik, iq: (b, ik, h))
    qblk2 = pl.BlockSpec((1, block_q, d_pad), lambda b, h, ik, iq: (b, iq, h))
    lse_q2 = pl.BlockSpec((1, block_q, 128), lambda b, h, ik, iq: (b, iq, h))
    dk, dv = pl.pallas_call(
        functools.partial(_fa_bwd_dkv_kernel, scale=scale,
                          n_pad_q=nq * block_q - Lq),
        grid=(B, H, nk, nq),
        in_specs=[kblk2, kblk2, qblk2, qblk2, qblk2, lse_q2],
        out_specs=[kblk2, kblk2],
        out_shape=[jax.ShapeDtypeStruct((B, Lk, H * d_pad), k.dtype),
                   jax.ShapeDtypeStruct((B, Lk, H * d_pad), v.dtype)],
        scratch_shapes=[pltpu.VMEM((block_k, d_pad), jnp.float32),
                        pltpu.VMEM((block_k, d_pad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
    )(kp, vp, qp, op, dop, lse_rep)

    def _unpack(x, L):
        x = x.reshape(B, L, H, d_pad)
        return x[..., :D] if d_pad != D else x
    return _unpack(dq, Lq), _unpack(dk, Lk), _unpack(dv, Lk)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_diff(q, k, v, scale, block_q, block_k):
    return _flash_forward(q, k, v, scale=scale, block_q=block_q,
                          block_k=block_k, return_stats=False)


def _flash_diff_fwd(q, k, v, scale, block_q, block_k):
    o, m2, l = _flash_forward(q, k, v, scale=scale, block_q=block_q,
                              block_k=block_k, return_stats=True)
    return o, (q, k, v, o, m2 + jnp.log2(l))


def _flash_diff_bwd(scale, block_q, block_k, res, do):
    q, k, v, o, lse2 = res
    return _flash_backward(q, k, v, o, lse2, do, scale=scale,
                           block_q=block_q, block_k=block_k)


_flash_diff.defvjp(_flash_diff_fwd, _flash_diff_bwd)
