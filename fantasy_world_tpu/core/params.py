"""Parameter-pytree helpers.

Every model component in this framework is a pair of pure functions:

    params = init_xxx(rng, cfg)        # nested dict of jnp arrays
    out    = xxx_apply(params, *args)  # jit/pjit-compatible

Linear layers store kernels as (in_features, out_features) so the forward
pass is a plain ``x @ kernel + bias`` that tiles directly onto the MXU
(the torch convention of (out, in) is transposed at checkpoint-conversion
time, see fantasy_world_tpu/convert/).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict

import jax
import jax.numpy as jnp

PyTree = Any

_ABSTRACT_INIT = False


class abstract_init:
    """Context manager: init_* helpers return jax.ShapeDtypeStruct leaves
    instead of materializing host arrays. Building the 14B fusion tree for
    shape purposes drops from ~500 s of numpy RNG to milliseconds (the
    round-1 bench spent 512 s here). stack_trees understands the abstract
    leaves, so prepare_scan_params works unchanged."""

    def __enter__(self):
        global _ABSTRACT_INIT
        self._prev = _ABSTRACT_INIT
        _ABSTRACT_INIT = True
        return self

    def __exit__(self, *exc):
        global _ABSTRACT_INIT
        _ABSTRACT_INIT = self._prev
        return False


def _abstract(shape, dtype) -> "jax.ShapeDtypeStruct":
    return jax.ShapeDtypeStruct(tuple(int(s) for s in shape),
                                jnp.dtype(dtype))


@dataclasses.dataclass(frozen=True)
class ParamSpec:
    """Shape/dtype spec used for abstract initialization and conversion."""

    shape: tuple
    dtype: Any = jnp.bfloat16


def _np_rng(rng) -> "np.random.Generator":
    """Host-side generator from either a jax PRNG key or a plain int seed.
    Init runs in numpy (per-leaf jax.random dispatch is minutes of overhead
    for a 40-block model; converted checkpoints overwrite these values)."""
    import numpy as np
    if isinstance(rng, (int, np.integer)):
        return np.random.default_rng(int(rng) & 0x7FFFFFFF)
    data = np.asarray(jax.random.key_data(rng)).ravel()
    return np.random.default_rng(int(data[-1]) & 0x7FFFFFFF)


def prng_split(rng, num: int = 2):
    """jax.random.split that stays on host when given an int seed -- init
    paths pass ints so building a 40-block tree issues zero XLA dispatches."""
    import numpy as np
    if isinstance(rng, (int, np.integer)):
        base = int(rng)
        return [(base * 1000003 + i * 7919 + 0x9E3779B9) & 0x7FFFFFFFFFFF
                for i in range(num)]
    return jax.random.split(rng, num)


def prng_fold_in(rng, data: int):
    import numpy as np
    if isinstance(rng, (int, np.integer)):
        return (int(rng) * 31 + int(data) * 2654435761 + 97) & 0x7FFFFFFFFFFF
    return jax.random.fold_in(rng, data)


def np_cast(x, dtype):
    """Host-side dtype cast; bf16 via ml_dtypes so leaves stay numpy (no
    per-leaf device transfer through the TPU tunnel at init time)."""
    import numpy as np
    import ml_dtypes
    np_dtype = {jnp.bfloat16: ml_dtypes.bfloat16,
                jnp.float32: np.float32,
                jnp.float16: np.float16}.get(dtype, dtype)
    return np.asarray(x).astype(np_dtype)


def np_normal(rng, shape, std=1.0, dtype=jnp.float32):
    if _ABSTRACT_INIT:
        return _abstract(shape, dtype)
    return np_cast(_np_rng(rng).standard_normal(shape) * std, dtype)


def np_zeros(shape, dtype=jnp.float32):
    if _ABSTRACT_INIT:
        return _abstract(shape, dtype)
    import numpy as np
    return np_cast(np.zeros(shape, np.float32), dtype)


def np_full(shape, value, dtype=jnp.float32):
    if _ABSTRACT_INIT:
        return _abstract(shape, dtype)
    import numpy as np
    return np_cast(np.full(shape, value, np.float32), dtype)


def np_ones(shape, dtype=jnp.float32):
    return np_full(shape, 1.0, dtype)


def init_linear(rng, in_dim: int, out_dim: int, *, bias: bool = True,
                dtype=jnp.bfloat16, scale: float | None = None) -> Dict:
    if scale is None:
        scale = 1.0 / math.sqrt(in_dim)
    if _ABSTRACT_INIT:
        p = {"kernel": _abstract((in_dim, out_dim), dtype)}
    else:
        gen = _np_rng(rng)
        p = {"kernel": np_cast(gen.uniform(-scale, scale, (in_dim, out_dim)),
                               dtype)}
    if bias:
        p["bias"] = np_zeros((out_dim,), dtype)
    return p


def linear(p: Dict, x: jnp.ndarray, *, accum_dtype=jnp.float32) -> jnp.ndarray:
    """x @ kernel (+ bias), accumulating in f32 on the MXU.

    Dispatches to the int8/fp8 path when ``p`` was rewritten by
    core.quant.quantize_tree (the key check is on pytree structure, so it
    is trace-time static under jit)."""
    if "kernel" not in p:
        from .quant import qlinear
        return qlinear(p, x)
    y = jnp.dot(x, p["kernel"], preferred_element_type=accum_dtype)
    if "bias" in p:
        y = y + p["bias"].astype(accum_dtype)
    return y.astype(x.dtype)


def init_layernorm(dim: int, *, affine: bool = True, dtype=jnp.bfloat16) -> Dict:
    if not affine:
        return {}
    return {"scale": np_ones((dim,), dtype), "bias": np_zeros((dim,), dtype)}


def init_rmsnorm(dim: int, *, dtype=jnp.bfloat16) -> Dict:
    return {"scale": np_ones((dim,), dtype)}


def count_params(tree: PyTree) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(tree))


def cast_tree(tree: PyTree, dtype) -> PyTree:
    return jax.tree_util.tree_map(lambda x: x.astype(dtype), tree)


def stack_trees(trees) -> PyTree:
    """Stack a list of identically-structured pytrees leaf-wise along a new
    leading axis -- the layout lax.scan consumes for homogeneous block
    stacks (compile the block body once instead of once per layer)."""
    import numpy as np

    def stack(*xs):
        if isinstance(xs[0], jax.ShapeDtypeStruct):
            return jax.ShapeDtypeStruct((len(xs),) + tuple(xs[0].shape),
                                        xs[0].dtype)
        if all(isinstance(x, np.ndarray) for x in xs):
            return np.stack(xs)      # host stack: no per-leaf XLA dispatch
        return jnp.stack(xs)
    return jax.tree_util.tree_map(stack, *trees)


def index_tree(tree: PyTree, i) -> PyTree:
    """Select layer i from a stacked block tree."""
    return jax.tree_util.tree_map(lambda x: x[i], tree)
