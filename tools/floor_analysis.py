"""Structural-floor analysis for the non-denoise clip units (r3 VERDICT
next-#3): the geometry heads (~44% of the non-denoise budget) and the tiled
VAE decode had measured medians but no FLOPs/bandwidth floor, so nobody
could say whether 16 s of heads was noise, regression, or headroom.

Method: build each unit exactly as bench.py times it (same staged
executables: camera head, DPT stage1+2, DPT stage3 in 27-frame chunks; the
reference tiled VAE config (30,52)/(15,26)), lower it ONCE on CPU and read
XLA's HLO cost analysis (flops + bytes accessed). Floors:

    mxu_floor  = flops / peak          (197 TF/s bf16 on the v5e)
    hbm_floor  = bytes / achievable_bw (4.8e11 B/s measured on this v5e via
                 a bf16 read+write elementwise loop -- NOT the 8.2e11 paper
                 number; .claude/skills/verify notes)
    floor      = max(mxu, hbm)         (whichever resource binds)

Caveats, stated rather than hidden: 'bytes accessed' comes from the CPU
backend's fusion decisions, so the HBM floor is approximate (TPU fuses at
least as aggressively; the CPU number is an upper bound on traffic, making
the floor conservative); flops are backend-independent algebra.

Writes FLOOR_ANALYSIS.json; PERF.md carries the measured-vs-floor table.

Run on CPU:  JAX_PLATFORMS=cpu python tools/floor_analysis.py [wan21|wan22]
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import jax
import jax.numpy as jnp

import bench  # geometry constants + staged-unit layout

PEAK_F = 197e12          # v5e bf16 peak
BW = 4.8e11              # measured achievable HBM B/s on this v5e


def cost(fn, *args):
    """(flops, bytes) from XLA HLO cost analysis of fn at args' shapes."""
    comp = jax.jit(fn).lower(*args).compile()
    ca = comp.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def floors(flops, byts):
    mxu, hbm = flops / PEAK_F, byts / BW
    return {"gflops": round(flops / 1e9, 1), "gbytes": round(byts / 1e9, 2),
            "mxu_floor_s": round(mxu, 3), "hbm_floor_s": round(hbm, 3),
            "floor_s": round(max(mxu, hbm), 3),
            "bound": "mxu" if mxu >= hbm else "hbm"}


def vae_unit(variant):
    from fantasy_world_tpu.core.params import abstract_init
    from fantasy_world_tpu.models.wan.vae import (VAEConfig, init_wan_vae,
                                                  vae_decode_tiled)
    g = bench.GEOM[variant]
    cfg = VAEConfig()
    with abstract_init():
        host = init_wan_vae(0, cfg, jnp.bfloat16)
    params = jax.tree_util.tree_map(
        lambda x: jnp.zeros(x.shape, x.dtype), host)
    lat = jnp.zeros((1, 16, g["F"], g["H2"], g["W2"]), jnp.bfloat16)
    fl, by = cost(lambda p, z: vae_decode_tiled(p, cfg, z, (30, 52),
                                                (15, 26)), params, lat)
    return floors(fl, by)


def heads_unit(variant):
    """Same staged decomposition bench.time_heads runs (cam + per-head
    s12 + s3 chunks); stage-3 chunk cost is multiplied by the chunk count."""
    from fantasy_world_tpu.core.params import abstract_init
    from fantasy_world_tpu.models.vggt.model import VGGTConfig, init_vggt
    from fantasy_world_tpu.models.vggt.aggregator import AggregatorConfig
    from fantasy_world_tpu.models.vggt.heads import (
        camera_head_forward, dpt_stage1_project, dpt_stage2_upsample,
        dpt_stage3_fuse)

    g = bench.GEOM[variant]
    f_lat = g["F"]
    _, l_agg_p, _ = bench.geom_tokens(variant)
    cfg = VGGTConfig(embed_dim=1024, wan_dim=5120,
                     aggregator=AggregatorConfig(embed_dim=1024, depth=24))
    with abstract_init():
        host = init_vggt(0, cfg, jnp.bfloat16)
    params = jax.tree_util.tree_map(
        lambda x: jnp.zeros(x.shape, x.dtype), host)
    taps = sorted(set(cfg.dpt_layer_idx) | {23})
    uniq = {i: jnp.zeros((1, f_lat, l_agg_p, 2048), jnp.bfloat16)
            for i in taps}
    hw = (g["H2"] // 2, g["W2"] // 2)
    tap_args = tuple(uniq[i] for i in taps)

    out = {}
    fl, by = cost(lambda p, last: camera_head_forward(
        p["camera_head"], cfg.camera_head, last)[-1],
        params, uniq[taps[-1]])
    out["camera_head"] = floors(fl, by)

    total_f = fl
    total_b = by
    for hname, hcfg in (("depth", cfg.dpt_head(2, "exp")),
                        ("point", cfg.dpt_head(4, "inv_log"))):
        hp = params[f"{hname}_head"]

        def s12_run(hp_, *tap_arrays):
            arrs = dict(zip(taps, tap_arrays))
            inters = [arrs.get(i, tap_arrays[0]) for i in range(24)]
            feats = dpt_stage1_project(hp_, hcfg, inters, hw, 5)
            return tuple(dpt_stage2_upsample(hp_, feats))

        fl, by = cost(s12_run, hp, *tap_args)
        outs = jax.eval_shape(s12_run, hp, *tap_args)
        out[f"{hname}_s12"] = floors(fl, by)
        total_f += fl
        total_b += by

        T_out = outs[0].shape[2]
        chunk = next(c for c in range(min(27, T_out), 0, -1)
                     if T_out % c == 0)
        sl0 = tuple(jnp.zeros(o.shape[:2] + (chunk,) + o.shape[3:], o.dtype)
                    for o in outs)

        def s3_run(hp_, *outs_chunk):
            return dpt_stage3_fuse(hp_, hcfg, list(outs_chunk), hw)[0]

        fl, by = cost(s3_run, hp, *sl0)
        n_chunks = T_out // chunk
        out[f"{hname}_s3"] = dict(floors(fl * n_chunks, by * n_chunks),
                                  chunks=n_chunks)
        total_f += fl * n_chunks
        total_b += by * n_chunks
    out["heads_total"] = floors(total_f, total_b)
    return out


def main():
    variants = sys.argv[1:] or ["wan21"]
    doc = {"peak_tflops": PEAK_F / 1e12, "achievable_hbm_gbs": BW / 1e9,
           "method": "XLA HLO cost analysis on the CPU backend of the "
                     "exact staged executables bench.py times; see module "
                     "docstring for caveats", "units": {}}
    for v in variants:
        print(f"[floor] {v} vae...", file=sys.stderr, flush=True)
        doc["units"][f"{v}_vae_decode_tiled"] = vae_unit(v)
        print(f"[floor] {v} heads...", file=sys.stderr, flush=True)
        doc["units"][f"{v}_heads"] = heads_unit(v)
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            os.pardir, "FLOOR_ANALYSIS.json")
    with open(out_path, "w") as fh:
        json.dump(doc, fh, indent=1)
    print(json.dumps(doc, indent=1))


if __name__ == "__main__":
    main()
