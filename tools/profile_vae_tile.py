"""xprof the strip-tiled VAE decode: where does the 2x-over-HBM-floor go?

FLOOR_ANALYSIS.json puts the tiled decode at ~2x its HBM floor on both
geometries, with the reference (30,52) grid AND (by the same per-px rate)
the r5 strip plan. This traces ONE warm strip decode on the TPU and
prints the top device ops from the xprof framework_op_stats table, so the
gap stops being a guess (the r4 trace of this kind found 21% of device
time in convert_element_type and led to the input-dtype conv emission
fix, ops/causal_conv.py:conv3d docstring).

Usage: python tools/profile_vae_tile.py [wan21|wan22]
"""
from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import numpy as np


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "wan22"
    import jax
    import jax.numpy as jnp
    from bench import fetch_scalar
    from fantasy_world_tpu.core.params import abstract_init
    from fantasy_world_tpu.models.wan.vae import (VAEConfig, init_wan_vae,
                                                  deploy_tile_plan,
                                                  vae_decode_tiled)

    F, H2, W2 = (21, 42, 74) if variant == "wan21" else (21, 60, 104)
    cfg = VAEConfig()
    with abstract_init():
        host = init_wan_vae(0, cfg, jnp.bfloat16)
    params = jax.jit(lambda: jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype),
        jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), host)))()
    lat = jnp.zeros((1, 16, F, H2, W2), jnp.bfloat16)
    plan = deploy_tile_plan(H2, W2)

    def run():
        return vae_decode_tiled(params, cfg, lat, *plan)

    fetch_scalar(run())                                   # compile + warm
    t0 = time.perf_counter()
    fetch_scalar(run())
    print(f"[profile_vae_tile] {variant} warm decode "
          f"{time.perf_counter() - t0:.2f} s plan={plan}", flush=True)

    trace_dir = f"/tmp/vae_trace_{variant}"
    with jax.profiler.trace(trace_dir):
        fetch_scalar(run())

    pbs = sorted(glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True))
    if not pbs:
        print("no xplane captured", flush=True)
        return
    from xprof.convert.raw_to_tool_data import xspace_to_tool_data
    data, _ = xspace_to_tool_data([pbs[-1]], "framework_op_stats",
                                  {"tqx": "out:json"})
    tab = json.loads(data)[0]          # [0]=by-op table, [1]=by-type table
    cols = [c["id"] for c in tab["cols"]]
    rows = [[(c or {}).get("v") if isinstance(c, dict) else c
             for c in r["c"]] for r in tab["rows"]]
    ih, it, ist, ibw, ifl, ib = (cols.index(k) for k in
                                 ("host_or_device", "type",
                                  "total_self_time", "measured_memory_bw",
                                  "measured_flop_rate", "bound_by"))
    dev = [r for r in rows if r[ih] == "Device"]
    total = sum(r[ist] or 0 for r in dev)
    print(f"device total {total / 1e6:.3f} s across {len(dev)} op rows")
    agg = {}
    for r in dev:
        a = agg.setdefault(str(r[it]), [0.0, 0.0, 0.0])
        t = r[ist] or 0
        a[0] += t
        a[1] += (r[ibw] or 0) * t
        a[2] += (r[ifl] or 0) * t
    for k, (t, bw, fl) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:14]:
        print(f"  {t / 1e6:8.3f} s {100 * t / total:5.1f}%  "
              f"bw={bw / t if t else 0:6.1f} GB/s  "
              f"{fl / t / 1e3 if t else 0:6.1f} TF/s  {k}")


if __name__ == "__main__":
    main()
