"""Tile-shape sweep for the spatially tiled VAE decode.

FLOOR_ANALYSIS.json puts the wan21 tiled decode at 2.4 s (HBM-bound floor)
vs 5.1 s measured -- a 2.1x gap. One suspect is lane-dimension padding:
the reference's (30,52)-latent tiles decode to 416-pixel-wide frames whose
last axis pads poorly to the TPU's 128-lane tiling, and the 4-tile grid
re-decodes the overlap twice. Full-width horizontal strips (X, 74) decode
to the native 592-pixel width with fewer tiles and less overlap. The blend
math is tile-shape-agnostic (same masks, same add order), so the tile
shape is a free deployment parameter -- the reference's (30,52)/(15,26)
is just its GPU-memory default (wan_video_vae.py:643-692).

Run AFTER the bench finishes (needs the TPU):
    python tools/vae_tile_experiment.py
Appends results to VAE_TILE_SWEEP.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import jax
import jax.numpy as jnp
import numpy as np

# bench.py owns the tunneled-platform sync workaround (block_until_ready
# returns early on axon; syncing is fetching a scalar) -- reuse it so the
# sweep can't silently drift out of sync with how the bench times things
from bench import fetch_scalar


def main():
    from fantasy_world_tpu.core.params import abstract_init
    from fantasy_world_tpu.models.wan.vae import (VAEConfig, init_wan_vae,
                                                  vae_decode_tiled)

    cfg = VAEConfig()
    with abstract_init():
        host = init_wan_vae(0, cfg, jnp.bfloat16)
    params = jax.jit(lambda: jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype),
        jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), host)))()

    results = {"device": jax.devices()[0].device_kind, "configs": []}
    rng = np.random.default_rng(0)
    for geom_name, (F, H2, W2) in (("wan21_480p", (21, 42, 74)),
                                   ("wan22_480x832", (21, 60, 104))):
        lat = jnp.asarray(rng.standard_normal((1, 16, F, H2, W2)) * 0.5,
                          jnp.bfloat16)
        # r4 finding: every tile with latent area >= 1776 px crashes the
        # remote-compile helper (hstrip rows below, kept for the record);
        # the reference's (30,52) = 1560 px compiles. Full-HEIGHT narrow
        # strips stay at/under that area while cutting the overlap
        # redundancy (wan22 9 tiles x1560 -> 4 x1680; wan21 4 x1560 ->
        # 3 x1176), so they attack the 2x-over-floor decode cost from the
        # redundancy side without touching the per-tile program size.
        if H2 == 42:       # wan21: full height 42
            vstrips = [
                ("vstrip_42x28", (42, 28), (42, 26)),     # 3 tiles, area 1176
                ("vstrip_42x38", (42, 38), (42, 36)),     # 2 tiles, area 1596
            ]
        else:              # wan22: full height 60
            vstrips = [
                ("vstrip_60x26", (60, 26), (30, 24)),     # 5 tiles, area 1560
                ("vstrip_60x28", (60, 28), (30, 26)),     # 4 tiles, area 1680
            ]
        configs = [
            ("reference_30x52", (30, 52), (15, 26)),
            *vstrips,
            ("hstrip_24xW", (24, W2), (18, W2)),
            ("hstrip_30xW", (30, W2), (21, W2)),
        ]
        base = None
        for name, tile, stride in configs:
            try:
                t0 = time.perf_counter()
                out = vae_decode_tiled(params, cfg, lat, tile, stride)
                fetch_scalar(out)
                compile_s = time.perf_counter() - t0
                reps = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    out = vae_decode_tiled(params, cfg, lat, tile, stride)
                    fetch_scalar(out)
                    reps.append(time.perf_counter() - t0)
                med = float(np.median(reps))
                # the equivalence number is only meaningful against the
                # reference tiling; if that config errored, later rows must
                # NOT silently diff against some other baseline
                diff = None
                if name == "reference_30x52":
                    base = np.asarray(out, np.float32)
                elif base is not None:
                    o = np.asarray(out, np.float32)
                    diff = float(np.max(np.abs(o - base)))
                rec = {"geom": geom_name, "name": name, "tile": tile,
                       "stride": stride, "median_s": round(med, 3),
                       "min_max": [round(min(reps), 3), round(max(reps), 3)],
                       "compile_s": round(compile_s, 1),
                       "max_abs_diff_vs_reference_tiles": diff}
            except Exception as e:
                rec = {"geom": geom_name, "name": name, "tile": tile,
                       "stride": stride,
                       "error": f"{type(e).__name__}: {str(e)[:200]}"}
            results["configs"].append(rec)
            print(json.dumps(rec), flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        os.pardir, "VAE_TILE_SWEEP.json")
    with open(path, "w") as fh:
        json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
