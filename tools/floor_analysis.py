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

# HLO cost analysis is backend-independent algebra; force the CPU backend
# the same way tests/conftest.py does (the environment pins JAX_PLATFORMS
# to the tunneled TPU at a level a shell export cannot override, and the
# big tiled-VAE graphs crash that platform's remote-compile helper).
jax.config.update("jax_platforms", "cpu")

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
    """Floors of the exact program bench.time_vae_decode times (shared
    builder: bench.build_vae_decode)."""
    params, lat, run = bench.build_vae_decode(variant)
    fl, by = cost(run, params, lat)
    return floors(fl, by)


def heads_unit(variant):
    """Floors of the exact staged decomposition bench.time_heads times.
    The staging (taps, s12/s3 split, chunk divisor) comes from the shared
    bench.heads_stage_plan, so a staging change there changes this floor
    too; stage-3 chunk cost is multiplied by the chunk count."""
    _cfg, (cam_run, cam_args), head_stages = bench.heads_stage_plan(variant)

    out = {}
    fl, by = cost(cam_run, *cam_args)
    out["camera_head"] = floors(fl, by)

    total_f = fl
    total_b = by
    for hname, _hp, s12_run, s12_args, make_s3 in head_stages:
        fl, by = cost(s12_run, *s12_args)
        out[f"{hname}_s12"] = floors(fl, by)
        total_f += fl
        total_b += by

        outs_sds = jax.eval_shape(s12_run, *s12_args)
        outs = tuple(jnp.zeros(o.shape, o.dtype) for o in outs_sds)
        s3_fn, s3_args, _chunk, n_chunks = make_s3(outs)
        fl, by = cost(s3_fn, *s3_args)
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
