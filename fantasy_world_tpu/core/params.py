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


@dataclasses.dataclass(frozen=True)
class ParamSpec:
    """Shape/dtype spec used for abstract initialization and conversion."""

    shape: tuple
    dtype: Any = jnp.bfloat16


def init_linear(rng, in_dim: int, out_dim: int, *, bias: bool = True,
                dtype=jnp.bfloat16, scale: float | None = None) -> Dict:
    kr, _ = jax.random.split(rng)
    if scale is None:
        scale = 1.0 / math.sqrt(in_dim)
    p = {"kernel": (jax.random.uniform(kr, (in_dim, out_dim), jnp.float32,
                                       -scale, scale)).astype(dtype)}
    if bias:
        p["bias"] = jnp.zeros((out_dim,), dtype)
    return p


def linear(p: Dict, x: jnp.ndarray, *, accum_dtype=jnp.float32) -> jnp.ndarray:
    """x @ kernel (+ bias), accumulating in f32 on the MXU."""
    y = jnp.dot(x, p["kernel"], preferred_element_type=accum_dtype)
    if "bias" in p:
        y = y + p["bias"].astype(accum_dtype)
    return y.astype(x.dtype)


def init_layernorm(dim: int, *, affine: bool = True, dtype=jnp.bfloat16) -> Dict:
    if not affine:
        return {}
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def init_rmsnorm(dim: int, *, dtype=jnp.bfloat16) -> Dict:
    return {"scale": jnp.ones((dim,), dtype)}


def count_params(tree: PyTree) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(tree))


def cast_tree(tree: PyTree, dtype) -> PyTree:
    return jax.tree_util.tree_map(lambda x: x.astype(dtype), tree)


def stack_trees(trees) -> PyTree:
    """Stack a list of identically-structured pytrees leaf-wise along a new
    leading axis -- the layout lax.scan consumes for homogeneous block
    stacks (compile the block body once instead of once per layer)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def index_tree(tree: PyTree, i) -> PyTree:
    """Select layer i from a stacked block tree."""
    return jax.tree_util.tree_map(lambda x: x[i], tree)
