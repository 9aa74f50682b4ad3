"""LoRA fine-tuning of the fusion model (low-rank adapters, frozen base).

The reference only CONSUMES LoRA -- it merges pre-trained Reward-LoRA
deltas into the Wan2.2 DiT weights at load time (fusion/model_wan22.py:
18-118, mirrored host-side in convert/lora.py). This module adds the
producing side: train the low-rank factors themselves against the same
rectified-flow objective while the 14B base stays frozen.

Functional JAX design -- no module surgery: ``init_lora`` walks the
scan-stacked parameter tree (models/fusion/model.py:prepare_scan_params)
and creates a flat {path: {"down", "up"}} dict for every targeted stacked
kernel (L, d_in, d_out); ``apply_lora`` rebuilds the scan tree with

    W_eff = W + (alpha / rank) * down @ up        (per stacked layer)

so gradients flow only into the factors. The per-step merge costs
O(L * rank * d_in * d_out) FLOPs -- rank/d of one forward matmul pass,
negligible against the block stack. down is init N(0, 1/sqrt(d_in)), up is
zero-init (the merge starts as identity), matching the convention of the
LoRA checkpoints the reference loads.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..core.params import np_normal, np_zeros, prng_split
from ..models.fusion.model import FusionConfig
from .step import flow_match_loss

# kernels targeted by default: the DiT projections the reference's
# Reward-LoRA checkpoints cover (self/cross attention q,k,v,o and both ffn
# matmuls -- convert/lora.py resolves the same layer set by name).
DEFAULT_TARGETS = ("self_attn", "cross_attn", "ffn")


def _path_str(path) -> str:
    """Stable flat key for a tree path: 'irg/0/dit/self_attn/q/kernel'."""
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def _is_target(path_s: str, leaf, targets) -> bool:
    return (path_s.endswith("/kernel") and getattr(leaf, "ndim", 0) == 3
            and any(t in path_s.split("/") for t in targets))


def init_lora(rng, scan_params: Dict, rank: int = 16,
              targets: Tuple[str, ...] = DEFAULT_TARGETS,
              dtype=jnp.bfloat16) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Flat {path: {"down": (L, d_in, r), "up": (L, r, d_out)}} over every
    targeted stacked kernel in the scan tree."""
    leaves = jax.tree_util.tree_flatten_with_path(scan_params)[0]
    sel = [(path, leaf) for path, leaf in leaves
           if _is_target(_path_str(path), leaf, targets)]
    if not sel:
        raise ValueError(f"no LoRA targets matched {targets}")
    rs = prng_split(rng, len(sel))
    lora = {}
    for r, (path, leaf) in zip(rs, sel):
        L, d_in, d_out = leaf.shape
        lora[_path_str(path)] = {
            "down": np_normal(r, (L, d_in, rank), 1.0 / (d_in ** 0.5), dtype),
            "up": np_zeros((L, rank, d_out), dtype),
        }
    return lora


def apply_lora(scan_params: Dict, lora: Dict, alpha: float = 1.0) -> Dict:
    """Rebuild the scan tree with W + (alpha/rank) * down @ up on every
    adapted kernel. Pure function of (scan_params, lora): differentiable
    in the factors, frozen base untouched."""
    def merge(path, leaf):
        entry = lora.get(_path_str(path))
        if entry is None:
            return leaf
        rank = entry["down"].shape[-1]
        delta = jnp.einsum("lir,lro->lio", entry["down"].astype(jnp.float32),
                           entry["up"].astype(jnp.float32))
        return leaf + ((alpha / rank) * delta).astype(leaf.dtype)

    return jax.tree_util.tree_map_with_path(merge, scan_params)


def make_lora_train_step(cfg: FusionConfig,
                         optimizer: optax.GradientTransformation,
                         alpha: float = 1.0, mesh=None, remat: bool = True):
    """Returns step(lora, opt_state, frozen, batch) -> (lora, opt_state,
    loss). ``frozen`` is the (params_lite, scan_params) pair from
    split_trainable -- passed as an argument (not closed over) so the jit
    treats the 14B base as a regular device-resident input. Jit with
    donation on the factors only:
        jax.jit(step, donate_argnums=(0, 1)).
    """

    def train_step(lora, opt_state, frozen, batch):
        lite, scan = frozen

        def loss_fn(lo):
            return flow_match_loss(lite, apply_lora(scan, lo, alpha), cfg,
                                   mesh=mesh, remat=remat, **batch)

        loss, grads = jax.value_and_grad(loss_fn)(lora)
        updates, opt_state = optimizer.update(grads, opt_state, lora)
        lora = optax.apply_updates(lora, updates)
        return lora, opt_state, loss

    return train_step


def merge_lora_into_scan(scan_params: Dict, lora: Dict,
                         alpha: float = 1.0) -> Dict:
    """Bake trained factors into the scan weights for inference -- the
    counterpart of the reference's load-time merge (convert/lora.py), on
    this side of the checkpoint boundary."""
    return apply_lora(scan_params, lora, alpha)
