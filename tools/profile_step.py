"""Where does a denoise step's time actually go? (VERDICT round-2 item #4)

Microbenchmarks every production-shape unit of the fusion step in a
dependency-chained on-device loop (lax.scan over the unit, carry = the
activation), then compares the bottom-up sum against the bench-measured
irgheavy point. Chaining is load-bearing twice over on this platform:
block_until_ready does not block through the axon tunnel, and per-call
dispatch costs ms -- a scalar fetch after a scanned chain is the only
trustworthy timing.

Usage:  python tools/profile_step.py [unit ...]   (default: all)

FINDINGS (2026-08-19, v5e, production 480P CFG-pair shapes) -- why the
remaining ~0.7 s/step above the kernel floors is irreducible here:

  in-situ blocks        measured     structural floor
    dit block           178.1 ms     ~181 ms  (flash self 74.5 + cross 6.5
                                     + 19.8 TFLOP proj/ffn at ~198 TF/s)
    vggt frame+global   63-64 ms     ~40 ms   (paired-head flash, D=64
                                     contraction = 50% MXU ceiling)
    bicross             66.4 ms      ~51 ms   (two flash dirs at 96->128
                                     lane pad = 75% ceiling)

  * The DiT stack (73% of the step) RUNS AT ITS FLOOR: 178 vs 181 ms.
    XLA overlaps every elementwise pass (layer_norm_modulate, rms_norm,
    rope, gated residual) into the matmul/flash stream. The isolated
    microbenchmark numbers for those units (8.2/7.6/7.3/5.2 ms) do NOT
    add in-situ -- do not chase them.
  * Isolated projection rates mislead the same way: a lone DxD matmul
    times at 115 TF/s and a fused Dx3D at 158 TF/s, which suggests
    fusing q/k/v param layouts; in-situ the projection stream already
    runs at ~chip peak (block total = flash + FLOPs/peak), so fused-QKV
    buys ~nothing and costs converter/LoRA-name complexity. Rejected.
  * The vggt/bicross gaps over their floors are real but small in step
    terms (~0.6 s of 10.7 total) and sit in the flash kernel's documented
    73-75%-of-ceiling band (ops/flash_attention.py header: int8-QK and
    head-packing attacks on that band both measured slower). Hoisting
    the 2D-rope position gather out of the scan bodies (2026-08-19,
    rope2d_tables_from_positions) recovers ~1.5 ms/block-pair; beyond
    that, repeated A/B runs differ by +-1.5 ms/block (tunnel timing
    noise), so further single-block chasing is below the noise floor.
  * Ceiling accounting for the full step: 16 PCB x 178 + 24 IRG x
    (178 + 64 + 66) ms = 10.2 s measured-sum vs 10.7 s bench fit (the
    difference is prologue/head/TeaCache bookkeeping + fit conservatism).
    A hypothetical perfect elementwise implementation saves <=0.6 s
    (5.6%); matching the 9.5 s stretch target requires beating the
    Mosaic flash ceiling, not better glue.
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from fantasy_world_tpu.core.params import linear as _linear  # noqa: E402
from fantasy_world_tpu.core.quant import quantize_linear_params  # noqa: E402

# production wan21 480P CFG-pair geometry
B, F = 2, 21
L = 16317            # DiT video tokens
D, FFN, NH, HD = 5120, 13824, 40, 128
A, AF, ANH = 1024, 4096, 16          # aggregator width / ffn / heads
BD, BNH = 1152, 12                   # bicross hidden / heads
P = 782                              # geometry tokens per frame
LA = F * P                           # 16,422
CTX = 769                            # text 512 + CLIP 257
PLK = 2048                           # plucker feature dim

REPS = 8


def log(msg):
    print(msg, flush=True)


def fetch(x):
    return float(np.asarray(jax.device_get(jnp.ravel(x)[0]), np.float32))


def chain_time(unit, carry, reps=REPS):
    """Time reps of `unit` chained through `carry` (same pytree shape)."""
    @jax.jit
    def run(c):
        return jax.lax.scan(lambda c, _: (unit(c), None), c, None,
                            length=reps)[0]
    out = run(carry)
    fetch(jax.tree_util.tree_leaves(out)[0])         # compile + warm
    t0 = time.perf_counter()
    out = run(carry)
    fetch(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / reps


def zeros(*shape, dtype=jnp.bfloat16):
    return jnp.zeros(shape, dtype)


def w(k, n, dtype=jnp.bfloat16, bias=True):
    p = {"kernel": zeros(k, n, dtype=dtype)}
    if bias:
        p["bias"] = zeros(n, dtype=dtype)
    return p


def report(name, t, flops=None, note=""):
    tf = f"{flops / t / 1e12:7.1f} TF/s" if flops else "           "
    log(f"  {name:<34} {t * 1e3:8.2f} ms  {tf}  {note}")
    return t


# ---------------------------------------------------------------------------
# units
# ---------------------------------------------------------------------------

def u_proj_dd():
    """One (B*L, D)@(D, D) projection (the self/cross q,k,v,o shape)."""
    W = w(D, D)
    x = zeros(B, L, D)
    t = chain_time(lambda c: _linear(W, c), x)
    return report("proj DxD bf16", t, 2 * B * L * D * D)


def u_proj_qkv_fused():
    """(B*L, D)@(D, 3D) -- the fused-qkv candidate, per-matmul rate."""
    W = w(D, 3 * D)
    x = zeros(B, L, D)
    t = chain_time(lambda c: _linear(W, c)[..., :D], x)
    return report("proj Dx3D bf16 (fused qkv)", t, 2 * B * L * D * 3 * D)


def u_ffn():
    """fc1 + tanh-gelu + fc2 at (D, FFN)."""
    p = {"fc1": w(D, FFN), "fc2": w(FFN, D)}
    x = zeros(B, L, D)

    def unit(c):
        return _linear(p["fc2"], jax.nn.gelu(_linear(p["fc1"], c),
                                             approximate=True))
    t = chain_time(unit, x)
    return report("ffn pair bf16", t, 2 * 2 * B * L * D * FFN)


def u_proj_dd_int8():
    W = quantize_linear_params(w(D, D))
    x = zeros(B, L, D)
    t = chain_time(lambda c: _linear(W, c), x)
    return report("proj DxD int8 w8a8", t, 2 * B * L * D * D)


def u_ffn_int8():
    p = {"fc1": quantize_linear_params(w(D, FFN)),
         "fc2": quantize_linear_params(w(FFN, D))}
    x = zeros(B, L, D)

    def unit(c):
        return _linear(p["fc2"], jax.nn.gelu(_linear(p["fc1"], c),
                                             approximate=True))
    t = chain_time(unit, x)
    return report("ffn pair int8 w8a8", t, 2 * 2 * B * L * D * FFN)


def u_act_quant():
    """The dynamic activation-quant prologue alone (absmax+round+cast)."""
    x = zeros(B, L, D)

    def unit(c):
        xf = c.astype(jnp.float32)
        sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
                         / 127.0, 1e-12)
        xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
        return (xq.astype(jnp.float32) * sx).astype(c.dtype)
    t = chain_time(unit, x)
    return report("act quant+dequant roundtrip", t,
                  note=f"{B * L * D * 2 / 1e6:.0f} MB tensor")


def u_norm_mod():
    """layer_norm_modulate at the DiT shape (pre-attn/pre-ffn pattern)."""
    from fantasy_world_tpu.ops.norms import layer_norm_modulate
    x = zeros(B, L, D)
    sh = zeros(B, 1, D, dtype=jnp.float32)
    sc = zeros(B, 1, D, dtype=jnp.float32)
    t = chain_time(lambda c: layer_norm_modulate(c, sh, sc, None, 1e-6), x)
    return report("layer_norm_modulate", t)


def u_rms():
    from fantasy_world_tpu.ops.norms import rms_norm
    x = zeros(B, L, D)
    s = zeros(D)
    t = chain_time(lambda c: rms_norm(c, s, 1e-6), x)
    return report("rms_norm", t)


def u_rope():
    from fantasy_world_tpu.ops import rope as rope_ops
    cos, sin = rope_ops.cos_sin_half_from_angles(
        rope_ops.build_angles_3d(HD, F, 21, 37))
    x = zeros(B, L, NH, HD)
    t = chain_time(lambda c: rope_ops.apply_rope_half(c, cos, sin), x)
    return report("rope apply (q or k)", t)


def u_gate_residual():
    """gate * attn_out + residual (the g_msa/g_mlp pattern, f32 math)."""
    x = zeros(B, L, D)
    g = zeros(B, 1, D, dtype=jnp.float32)

    def unit(c):
        return c + (g * c.astype(jnp.float32)).astype(c.dtype)
    t = chain_time(unit, x)
    return report("gated residual add", t)


def u_camera_adapter():
    """The adaln pose adapter chain at production shape (NOT counted in
    bench analytic_flops -- quantify what it really costs per block)."""
    from fantasy_world_tpu.models.wan.dit import (_init_camera_adapter,
                                                  WanDiTConfig)
    from fantasy_world_tpu.core.params import abstract_init
    cfg = WanDiTConfig()
    with abstract_init():
        cam = _init_camera_adapter(0, cfg, jnp.bfloat16)
    cam = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), cam)
    plk = zeros(B, L, PLK)

    def unit(o):
        plucker_proj = _linear(cam["k_group1"], plk)
        hidden = _linear(cam["k_group2"]["fc2"],
                         jax.nn.relu(_linear(cam["k_group2"]["fc1"], o)))
        combined = hidden + plucker_proj
        shift = _linear(cam["v_group2"]["fc2"],
                        jax.nn.relu(_linear(cam["v_group2"]["fc1"],
                                            combined)))
        nz = jnp.any(plk != 0).astype(shift.dtype)
        return o + shift * nz
    x = zeros(B, L, D)
    fl = 2 * B * L * (PLK * PLK + D * (min(D, PLK) // 2)
                      + (min(D, PLK) // 2) * PLK + PLK * (PLK // 5)
                      + (PLK // 5) * D)
    t = chain_time(unit, x)
    return report("camera adaln adapter", t, fl)


def u_dit_block():
    """Full dit_block_apply in-situ (sum-of-parts cross-check)."""
    from fantasy_world_tpu.models.wan.dit import (init_dit_block,
                                                  dit_block_apply,
                                                  WanDiTConfig)
    from fantasy_world_tpu.core.params import abstract_init
    from fantasy_world_tpu.ops import rope as rope_ops
    cfg = WanDiTConfig(camera_adapter_end=0)
    with abstract_init():
        blk = init_dit_block(0, cfg, 30, jnp.bfloat16)
    blk = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), blk)
    cos, sin = rope_ops.cos_sin_half_from_angles(
        rope_ops.build_angles_3d(HD, F, 21, 37))
    ctx = zeros(B, CTX, D)
    tmod = zeros(B, 6, D)
    x = zeros(B, L, D)
    t = chain_time(lambda c: dit_block_apply(blk, c, ctx, tmod, cos, sin,
                                             cfg), x, reps=4)
    fl = (4 * 2 * L * D * D + 2 * 2 * L * L * D + 2 * 2 * L * D * D
          + 4 * 2 * CTX * D * D + 2 * 2 * L * CTX * D
          + 2 * 2 * L * D * FFN) * B
    return report("dit block in-situ", t, fl)


def u_vggt_blocks():
    """Frame + global aggregator block pair in-situ."""
    from fantasy_world_tpu.models.vggt.blocks import (init_vggt_block,
                                                      vggt_block_apply)
    from fantasy_world_tpu.models.vggt.aggregator import AggregatorConfig
    from fantasy_world_tpu.core.params import abstract_init
    acfg = AggregatorConfig(embed_dim=A)
    bcfg = acfg.block_cfg
    with abstract_init():
        blk = init_vggt_block(0, bcfg, jnp.bfloat16)
    blk = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), blk)
    e0 = zeros(B, 6, A, dtype=jnp.float32)
    pos_f = jnp.zeros((B * F, P, 2), jnp.int32)
    pos_g = jnp.zeros((B, LA, 2), jnp.int32)

    def frame_unit(c):
        return vggt_block_apply(blk, bcfg, c, pos_f, e0)
    tf = chain_time(frame_unit, zeros(B * F, P, A), reps=REPS)
    fl_f = (4 * 2 * LA * A * A + F * 2 * 2 * P * P * A
            + 2 * 2 * LA * A * AF) * B
    report("vggt frame block in-situ", tf, fl_f)

    def global_unit(c):
        return vggt_block_apply(blk, bcfg, c, pos_g, e0)
    tg = chain_time(global_unit, zeros(B, LA, A), reps=4)
    fl_g = (4 * 2 * LA * A * A + 2 * 2 * LA * LA * A
            + 2 * 2 * LA * A * AF) * B
    report("vggt global block in-situ", tg, fl_g)
    return tf + tg


def u_bicross():
    """bicross_apply in-situ (both directions + gates)."""
    from fantasy_world_tpu.models.fusion.bicross import (BicrossConfig,
                                                         init_bicross,
                                                         bicross_apply)
    from fantasy_world_tpu.core.params import abstract_init
    from fantasy_world_tpu.ops import rope as rope_ops
    cfg = BicrossConfig()
    with abstract_init():
        p = init_bicross(0, cfg, jnp.bfloat16)
    p = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), p)
    rope_dit = rope_ops.cos_sin_half_from_angles(
        rope_ops.build_angles_3d(cfg.head_dim, F, 21, 37))
    rope_agg = rope_ops.cos_sin_half_from_angles(
        rope_ops.build_angles_3d(cfg.head_dim, F, 21, 37,
                                 n_extra_per_frame=5))
    x1 = zeros(B, L, D)
    x2 = zeros(B, LA, A)
    t = chain_time(lambda c: bicross_apply(p, cfg, c[0], c[1], rope_dit,
                                           rope_agg), (x1, x2), reps=4)
    fl = (2 * L * D * BD * 3 + 2 * LA * A * BD * 3
          + 4 * L * LA * BD + 4 * L * LA * BD) * B
    return report("bicross in-situ", t, fl)


UNITS = {
    "proj": u_proj_dd, "qkv": u_proj_qkv_fused, "ffn": u_ffn,
    "proj8": u_proj_dd_int8, "ffn8": u_ffn_int8, "actq": u_act_quant,
    "normmod": u_norm_mod, "rms": u_rms, "rope": u_rope,
    "gate": u_gate_residual, "camera": u_camera_adapter,
    "dit": u_dit_block, "vggt": u_vggt_blocks, "bicross": u_bicross,
}


def main():
    names = sys.argv[1:] or list(UNITS)
    log(f"device: {jax.devices()[0].device_kind}")
    results = {}
    for n in names:
        try:
            results[n] = UNITS[n]()
        except Exception as e:
            log(f"  {n:<34} FAILED {type(e).__name__}: {str(e)[:150]}")
    log("")
    # bottom-up DiT block model from the parts (if measured)
    r = results
    if all(k in r for k in ("proj", "ffn", "normmod", "rms", "rope", "gate")):
        # self: 4 proj + 2 rms + 2 rope + attn(74.5ms measured) ; cross:
        # 2 proj + small kv + 2 rms + attn(6.5) ; ffn ; 2 normmod + 2 gate
        model = (6 * r["proj"] + r["ffn"] + 4 * r["rms"] + 2 * r["rope"]
                 + 2 * r["normmod"] + 2 * r["gate"] + 0.0745 + 0.0065)
        log(f"sum-of-parts DiT block: {model * 1e3:.1f} ms "
            f"(+ measured flash 74.5 + 6.5 ms)")
        if "dit" in r:
            log(f"in-situ DiT block:      {r['dit'] * 1e3:.1f} ms "
                f"(gap = {(r['dit'] - model) * 1e3:+.1f} ms)")




def u_rope2d():
    """apply_rope_2d at the vggt global shape -- the per-block cos_t[p]
    gather repeated 4x/block is the hoisting candidate."""
    from fantasy_world_tpu.ops import rope as rope_ops
    pos = jnp.asarray(np.tile(rope_ops.grid_positions_2d(23, 34, 0), (F, 1))[None].repeat(B, 0))  # (B, LA, 2)
    x = zeros(B, F * 782, 16, 64)
    t = chain_time(lambda c: rope_ops.apply_rope_2d(c, pos), x)
    return report("rope2d apply (global q or k)", t)


def u_vggt_norope():
    """Global vggt block with rope disabled: isolates the rope+gather cost."""
    from fantasy_world_tpu.models.vggt.blocks import (init_vggt_block,
                                                      vggt_block_apply,
                                                      VGGTBlockConfig)
    from fantasy_world_tpu.core.params import abstract_init
    bcfg = VGGTBlockConfig(rope_frequency=-1.0)
    with abstract_init():
        blk = init_vggt_block(0, bcfg, jnp.bfloat16)
    blk = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), blk)
    e0 = zeros(B, 6, A, dtype=jnp.float32)
    t = chain_time(lambda c: vggt_block_apply(blk, bcfg, c, None, e0), zeros(B, LA, A), reps=4)
    return report("vggt global block NO rope", t)


UNITS["rope2d"] = u_rope2d
UNITS["vggtnr"] = u_vggt_norope




def u_vggt_hoisted():
    """Global + frame vggt blocks with the hoisted rope tables (the
    production fusion-loop configuration after 2026-08-19)."""
    from fantasy_world_tpu.models.vggt.blocks import (init_vggt_block,
                                                      vggt_block_apply,
                                                      VGGTBlockConfig)
    from fantasy_world_tpu.core.params import abstract_init
    from fantasy_world_tpu.ops import rope as rope_ops
    bcfg = VGGTBlockConfig()
    with abstract_init():
        blk = init_vggt_block(0, bcfg, jnp.bfloat16)
    blk = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), blk)
    e0 = zeros(B, 6, A, dtype=jnp.float32)
    pos = jnp.asarray(rope_ops.grid_positions_2d(21, 37, n_special=5))
    pos_f = jnp.broadcast_to(pos[None], (B * F,) + pos.shape)
    rope_f = rope_ops.rope2d_tables_from_positions(pos_f, bcfg.head_dim)
    rope_g = tuple(t.reshape(B, F * P, 1, t.shape[-1]) for t in rope_f)
    tg = chain_time(lambda c: vggt_block_apply(blk, bcfg, c, rope_g, e0),
                    zeros(B, LA, A), reps=4)
    report("vggt global block hoisted rope", tg)
    tf = chain_time(lambda c: vggt_block_apply(blk, bcfg, c, rope_f, e0),
                    zeros(B * F, P, A), reps=REPS)
    report("vggt frame block hoisted rope", tf)
    return tf + tg


UNITS["vggth"] = u_vggt_hoisted


if __name__ == "__main__":
    main()
