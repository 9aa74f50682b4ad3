"""GSPMD sharding over a Mesh(('data', 'seq', 'model')).

The scale-out design (SURVEY.md section 2.9): the reference's xfuser/NCCL
Ulysses hooks become GSPMD annotations -- parameters carry tensor-parallel
PartitionSpecs over 'model' (megatron-style column/row splits of the 5120-
wide projections; 40 heads shard cleanly over up to 8 chips), activations
are sharded over 'data' (CFG pair / batch) and 'seq' (video tokens), and
XLA inserts the all-gathers/reduce-scatters over ICI. The small VGGT
(1024) and bicross (1152) towers stay replicated.

Rules are path-regex -> PartitionSpec, applied leaf-wise to the param tree.
"""
from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = 1, seq: int = 1, model: int = 1,
              devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = data * seq * model
    assert devices.size >= n, f"need {n} devices, have {devices.size}"
    grid = devices[:n].reshape(data, seq, model)
    return Mesh(grid, ("data", "seq", "model"))


# (path regex, spec) -- first match wins. Paths are '/'-joined tree keys
# with list indices, e.g. dit/blocks/3/self_attn/q/kernel.
_DIT_ATTN = r"(dit|irg/\d+/dit)"
_K = r"kernel(_q|_f8)?"   # float or int8/fp8-quantized kernel (core/quant.py)
PARAM_RULES: List[Tuple[str, P]] = [
    # column-parallel: shard output features of q/k/v and ffn up-projection.
    # Quantized kernels shard like their float originals; their per-output-
    # channel scales (N,) follow the bias.
    (r".*/(self_attn|cross_attn)/(q|k|v|k_img|v_img)/" + _K + r"$",
     P(None, "model")),
    (r".*/(self_attn|cross_attn)/(q|k|v|k_img|v_img)/(bias|kscale)$",
     P("model")),
    (r".*/ffn/fc1/" + _K + r"$", P(None, "model")),
    (r".*/ffn/fc1/(bias|kscale)$", P("model")),
    # row-parallel: shard input features of the output projections (their
    # kscale is over the replicated output axis -> falls through to P())
    (r".*/(self_attn|cross_attn)/o/" + _K + r"$", P("model", None)),
    (r".*/ffn/fc2/" + _K + r"$", P("model", None)),
    # T5 tower follows the same pattern
    (r"t5/blocks/\d+/attn/(q|k|v)/" + _K + r"$", P(None, "model")),
    (r"t5/blocks/\d+/attn/o/" + _K + r"$", P("model", None)),
    (r"t5/blocks/\d+/ffn/(gate|fc1)/" + _K + r"$", P(None, "model")),
    (r"t5/blocks/\d+/ffn/fc2/" + _K + r"$", P("model", None)),
    (r"t5/token_embedding$", P(None, "model")),
    # everything else (norms, embeddings, VGGT, bicross, VAE, CLIP): replicate
    (r".*", P()),
]


def _iter_paths(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _iter_paths(v, f"{prefix}{k}/")
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _iter_paths(v, f"{prefix}{i}/")
    else:
        yield prefix[:-1], tree


def spec_for_path(path: str, rules=None) -> P:
    for pat, spec in (rules or PARAM_RULES):
        if re.match(pat, path):
            return spec
    return P()


def _map_with_paths(fn, tree, prefix=""):
    if isinstance(tree, dict):
        return {k: _map_with_paths(fn, v, f"{prefix}{k}/")
                for k, v in tree.items()}
    if isinstance(tree, list):
        return [_map_with_paths(fn, v, f"{prefix}{i}/")
                for i, v in enumerate(tree)]
    if isinstance(tree, tuple):
        return tuple(_map_with_paths(fn, v, f"{prefix}{i}/")
                     for i, v in enumerate(tree))
    return fn(prefix[:-1], tree)


def _axis_sizes(mesh: Optional[Mesh]):
    return dict(zip(mesh.axis_names, mesh.devices.shape)) if mesh else {}


def _fits(spec_dims, shape, axis_sizes) -> bool:
    for d, name in enumerate(spec_dims):
        if name is None:
            continue
        size = axis_sizes.get(name, 1)
        if size > 1 and shape[d] % size != 0:
            return False
    return True


def param_specs(tree, rules=None, mesh: Optional[Mesh] = None):
    """Mirror the param tree with PartitionSpecs.

    A rule that names more axes than a leaf has, or whose sharded dimension
    does not divide the mesh axis size, falls back to replication.
    """
    sizes = _axis_sizes(mesh)

    def leaf(path, x):
        spec = spec_for_path(path, rules)
        dims = list(spec)
        shape = getattr(x, "shape", ())
        if len(dims) > len(shape) or not _fits(dims, shape, sizes):
            return P()
        return spec
    return _map_with_paths(leaf, tree)


def stacked_specs(tree, rules=None, strip_prefix: str = "",
                  mesh: Optional[Mesh] = None):
    """Specs for leaf-stacked scan segments: same rules but with a leading
    None for the layer axis."""
    sizes = _axis_sizes(mesh)

    def leaf(path, x):
        spec = spec_for_path(strip_prefix + path, rules)
        dims = [None] + list(spec)
        shape = getattr(x, "shape", ())
        if len(dims) > len(shape) or not _fits(dims, shape, sizes):
            return P()
        return P(*dims)
    return _map_with_paths(leaf, tree)


def shard_tree(tree, mesh: Mesh, specs=None):
    """device_put every leaf with its NamedSharding."""
    if specs is None:
        specs = param_specs(tree)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs,
        is_leaf=lambda x: isinstance(x, P))


def shard_opt_state(opt_state, params, mesh: Mesh):
    """Place optimizer state on the mesh device set.

    ``jit(opt.init)`` leaves scalar state (adam counts, schedule steps) with
    a committed single-device sharding; Orbax restore then pins it there,
    and a later jit over mesh-sharded params rejects the mixed device sets.
    Subtrees structured like ``params`` (adam mu/nu) copy the param
    shardings leaf-for-leaf so first/second moments shard exactly like their
    weights; every other array leaf replicates over the mesh.
    """
    tdef = jax.tree_util.tree_structure(params)
    replicated = NamedSharding(mesh, P())

    def target_sharding(p):
        s = getattr(p, "sharding", None)
        return s if isinstance(s, NamedSharding) else replicated

    shardings = jax.tree_util.tree_map(target_sharding, params)

    def is_params_like(node):
        return jax.tree_util.tree_structure(node) == tdef

    def place(node):
        if is_params_like(node):
            return jax.tree_util.tree_map(jax.device_put, node, shardings)
        return jax.device_put(node, replicated)

    return jax.tree_util.tree_map(place, opt_state, is_leaf=is_params_like)


def activation_spec(mesh: Mesh, kind: str = "tokens") -> P:
    if kind == "tokens":      # (B, L, D)
        return P("data", "seq", None)
    if kind == "latent":      # (B, C, F, H, W)
        return P("data", None, None, "seq", None)
    return P()


def constrain(x, mesh: Mesh, spec: P):
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def maybe_constrain(x, mesh: Optional[Mesh], spec: P):
    """with_sharding_constraint that no-ops when mesh is None or a named
    sharded dim does not divide its mesh axis (GSPMD would still be correct
    with padding, but even splits are the only ones worth asking for)."""
    if mesh is None:
        return x
    sizes = _axis_sizes(mesh)
    for d, name in enumerate(spec):
        if name is None:
            continue
        names = name if isinstance(name, tuple) else (name,)
        size = int(np.prod([sizes.get(nm, 1) for nm in names]))
        if size > 1 and x.shape[d] % size != 0:
            return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
