"""int8 / fp8 quantized inference for the dense hot path.

TPU-native counterpart of the reference's low-precision serving hook
(fusion/model_wan21.py:42 "set `torch_dtype=torch.float8_e4m3fn` to enable
FP8" + the per-call weight-cast machinery in vram_management/layers.py).
On TPU the MXU has a native int8 path -- measured on this v5e: 558 TOP/s
vs 198 TFLOP/s bf16 at the production (16K, 5120)x(5120, 5120) shape,
2.8x -- so the speed format here is w8a8 int8, not fp8:

  * weights: symmetric per-output-channel int8, scale = absmax/127 over
    the contraction axis, quantized once at load time;
  * activations: symmetric per-token dynamic int8 at call time (the
    absmax+divide is O(M*K) VPU work fused into the surrounding
    elementwise graph, negligible next to the O(M*K*N) matmul);
  * accumulation int32 on the MXU, rescale in f32, bias in f32.

``fp8`` mode stores weights as float8_e4m3fn with the same per-channel
scale and dequantizes to bf16 at use: that is the reference's actual fp8
semantics (storage/memory halving, not compute) and the right choice on
chips without an int8/fp8 MXU path.

Quantized linear params replace {"kernel"} with {"kernel_q", "kscale"}
(int8) or {"kernel_f8", "kscale"} (fp8); ``core.params.linear`` dispatches
on the keys, so every model routed through it picks the path up without
code changes. Scan-stacked kernels (L, K, N) get per-layer scales (L, N)
and slice transparently under ``lax.scan``.

Accuracy contract (tests/test_quant_drift.py): vs bf16 with identical
noise, int8 drifts (relative L2, random-gaussian weights, CFG 5)
  * final latents <= 4% over the 6-step gate loop (measured 1.09%) AND
    over the product-scale 50-step loop (measured 0.82% -- drift does not
    compound linearly; the CFG trajectory self-corrects);
  * the outputs users actually see, through head_prediction (measured at
    50 steps): depth 0.017% (bound 0.2%), depth_conf 0.007% (0.2%),
    pose_enc 2.57% (8%), world_points 0.98% (4%), world_points_conf
    0.005% (0.2%).
int8 is the documented serving OPTION (bench: int8_full_s, 1.22x
end-to-end); bf16 stays the headline/default because the reference's own
precision is bf16.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax import lax

# Layers whose numerics or structure must stay untouched: patch embeddings
# feed the dtype introspection in the pipelines; "projection_head" is the
# VGGT fp32 island (reference vggt.py:78-82); heads/time-MLPs are excluded
# by the size threshold anyway but named here for clarity.
DEFAULT_EXCLUDE = ("patch_embedding", "projection_head", "head",
                   "time_embedding", "time_projection",
                   # conditioning-side: run on <1k tokens per step (FLOPs
                   # rounding error) but feed every block downstream
                   "text_embedding", "camera_pose_encoder", "img_emb")


def quantize_linear_params(p: Dict, mode: str = "int8") -> Dict:
    """{"kernel": (..., K, N) float} -> quantized linear params.

    Symmetric per-output-channel: scale over the contraction (second-to-
    last) axis. Stacked (L, K, N) kernels get (L, N) scales."""
    k = jnp.asarray(p["kernel"]).astype(jnp.float32)
    s = jnp.max(jnp.abs(k), axis=-2) / (127.0 if mode == "int8" else 448.0)
    s = jnp.maximum(s, 1e-12)
    scaled = k / s[..., None, :]
    out: Dict = {"kscale": s}
    if mode == "int8":
        out["kernel_q"] = jnp.clip(jnp.round(scaled), -127, 127
                                   ).astype(jnp.int8)
    elif mode == "fp8":
        out["kernel_f8"] = scaled.astype(jnp.float8_e4m3fn)
    else:
        raise ValueError(f"unknown quant mode {mode!r}")
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def qlinear(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """Quantized x @ kernel (+ bias). int8: dynamic per-token activation
    quant -> int8xint8 MXU matmul -> f32 rescale. fp8: dequant to the
    activation dtype and run the normal bf16 matmul."""
    if "kernel_f8" in p:
        k = (p["kernel_f8"].astype(jnp.float32)
             * p["kscale"][..., None, :]).astype(x.dtype)
        y = jnp.dot(x, k, preferred_element_type=jnp.float32)
    else:
        xf = x.astype(jnp.float32)
        sx = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
        sx = jnp.maximum(sx, 1e-12)
        xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
        y = lax.dot_general(xq, p["kernel_q"],
                            (((xq.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * sx * p["kscale"]
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def is_quantized(p) -> bool:
    return isinstance(p, dict) and ("kernel_q" in p or "kernel_f8" in p)


def _eligible(name: str, kernel, min_dim: int, exclude) -> bool:
    if any(tag in name for tag in exclude):
        return False
    shape = kernel.shape
    if len(shape) not in (2, 3):        # 4/5-D = conv kernels: stay float
        return False
    return min(shape[-2:]) >= min_dim


def quantize_tree(tree, mode: str = "int8", *, min_dim: int = 1024,
                  exclude=DEFAULT_EXCLUDE):
    """Walk a param pytree and quantize every eligible linear.

    Eligible = a dict holding a 2-D (K, N) or scan-stacked 3-D (L, K, N)
    "kernel" with min(K, N) >= min_dim and no excluded name on its path.
    The threshold keeps embeddings, modulation tables, heads and the tiny
    camera MLPs in bf16 -- they are a rounding error of the FLOPs but
    carry the numerically delicate ends of the network."""

    def walk(node, path):
        if isinstance(node, dict):
            if "kernel" in node and _eligible(path, node["kernel"],
                                              min_dim, exclude):
                return quantize_linear_params(node, mode)
            return {k: walk(v, f"{path}/{k}") for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(walk(v, f"{path}/{i}")
                              for i, v in enumerate(node))
        return node

    return walk(tree, "")


def count_quantized(tree) -> int:
    n = 0

    def walk(node):
        nonlocal n
        if isinstance(node, dict):
            if is_quantized(node):
                n += 1
                return
            for v in node.values():
                walk(v)
        elif isinstance(node, (list, tuple)):
            for v in node:
                walk(v)

    walk(tree)
    return n
