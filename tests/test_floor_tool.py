"""tools/floor_analysis.py primitives: the cost-analysis plumbing that
produced FLOOR_ANALYSIS.json must keep returning sane numbers (bitrot in
the XLA cost-analysis API surface would silently zero the floors)."""
import os
import sys

import conftest  # noqa: F401

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                "tools"))


def test_cost_counts_matmul_flops():
    import jax.numpy as jnp
    from floor_analysis import cost, floors

    n = 256
    fl, by = cost(lambda a, b: a @ b, jnp.zeros((n, n), jnp.float32),
                  jnp.zeros((n, n), jnp.float32))
    want = 2 * n ** 3
    assert want * 0.9 <= fl <= want * 1.1, fl
    # 3 tensors of n*n f32 move at minimum
    assert by >= 3 * n * n * 4 * 0.9, by

    f = floors(fl, by)
    assert set(f) >= {"gflops", "gbytes", "mxu_floor_s", "hbm_floor_s",
                      "floor_s", "bound"}
    assert f["floor_s"] == max(f["mxu_floor_s"], f["hbm_floor_s"])


def test_floor_artifact_is_current():
    """FLOOR_ANALYSIS.json exists and covers both production geometries."""
    import json
    path = os.path.join(os.path.dirname(__file__), os.pardir,
                        "FLOOR_ANALYSIS.json")
    with open(path) as fh:
        d = json.load(fh)
    assert {"wan21_vae_decode_tiled", "wan21_heads", "wan22_vae_decode_tiled",
            "wan22_heads"} <= set(d["units"])
    assert d["units"]["wan21_heads"]["heads_total"]["floor_s"] > 0
