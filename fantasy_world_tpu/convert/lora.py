"""LoRA merge into flat torch state dicts (numpy, host-side).

Re-design of the wan2.2 Reward-LoRA loader (fusion/model_wan22.py:18-118):
the reference normalizes underscore-mangled LoRA keys and then resolves the
target module by greedy attribute search. Here the search runs against the
state-dict key set directly: the mangled layer name (all '.' flattened to
'_') is matched to the unique weight key whose own flattening equals it.

    W += multiplier * alpha * (up @ down),  alpha = lora.alpha / rank
"""
from __future__ import annotations

from collections import defaultdict
from typing import Dict, Mapping

import numpy as np


def _normalize_key(key: str) -> str:
    if "lora_A" in key or "lora_B" in key:
        key = "lora_unet__" + key
    key = key.replace(".", "_")
    for suffix, repl in (
            ("_lora_up_weight", ".lora_up.weight"),
            ("_lora_down_weight", ".lora_down.weight"),
            ("_lora_A_default_weight", ".lora_A.weight"),
            ("_lora_B_default_weight", ".lora_B.weight"),
            ("_lora_A_weight", ".lora_A.weight"),
            ("_lora_B_weight", ".lora_B.weight"),
            ("_alpha", ".alpha")):
        if key.endswith(suffix):
            key = key[: -len(suffix)] + repl
            break
    key = (key.replace(".lora_A.default.", ".lora_down.")
              .replace(".lora_B.default.", ".lora_up.")
              .replace(".lora_A.", ".lora_down.")
              .replace(".lora_B.", ".lora_up."))
    return key


def resolve_lora_targets(sd: Mapping, lora_keys) -> Dict[str, str]:
    """Mangled-LoRA layer name -> target '.weight' key in sd. Mirrors the
    reference's greedy attribute search (fusion/model_wan22.py:50-102) at
    the key-set level: the underscore-flattened layer name must match a
    unique weight key's own flattening (exactly, or as a unique suffix when
    the LoRA omits module prefixes)."""
    flat_index = {}
    for k in sd:
        if k.endswith(".weight"):
            flat_index[k[:-len(".weight")].replace(".", "_")] = k
    out = {}
    for key in lora_keys:
        layer = _normalize_key(key).split(".", 1)[0]
        # peft-style keys get the 'lora_unet__' prefix (double underscore,
        # model_wan22.py:27-28); the reference's attribute walk skips the
        # resulting empty leading segment -- lstrip is the key-set analogue
        name = layer.split("lora_unet_")[-1].lstrip("_")
        target = flat_index.get(name)
        if target is None:
            # suffix fallback with a token boundary: bare endswith would
            # let "attn_q" match mid-token into "cross_attn_q" AND
            # "self_attn_q" (dropping both) or worse, uniquely match an
            # unrelated key and merge the delta into the wrong weight
            cands = [v for k, v in flat_index.items()
                     if k.endswith("_" + name)]
            target = cands[0] if len(cands) == 1 else None
        if target is not None:
            out[layer] = target
    return out


def merge_lora_into_state_dict(sd: Dict[str, np.ndarray],
                               lora_sd: Mapping[str, np.ndarray],
                               multiplier: float = 0.55,
                               verbose: bool = False) -> Dict[str, np.ndarray]:
    """Returns sd with LoRA deltas merged into the matched '.weight' keys."""
    updates = defaultdict(dict)
    for key, value in lora_sd.items():
        key = _normalize_key(key)
        if "." not in key:
            # unrecognized element suffix (dora_scale, .diff, ...): count
            # it as an unmatched layer like the reference loader instead
            # of crashing the whole merge on the unpack below
            updates[key]
            continue
        layer, elem = key.split(".", 1)
        updates[layer][elem] = np.asarray(value)

    targets = resolve_lora_targets(sd, lora_sd.keys())
    merged = dict(sd)
    n_hit = n_miss = 0
    for layer, elems in updates.items():
        target = targets.get(layer)
        if target is None or "lora_up.weight" not in elems \
                or "lora_down.weight" not in elems:
            n_miss += 1
            if verbose:
                print(f"[lora] unmatched layer: {layer}")
            continue
        up = elems["lora_up.weight"].astype(np.float32)
        down = elems["lora_down.weight"].astype(np.float32)
        alpha = (float(elems["alpha"]) / up.shape[1]
                 if "alpha" in elems else 1.0)
        if up.ndim == 4:
            delta = (up[..., 0, 0] @ down[..., 0, 0])[..., None, None]
        else:
            delta = up @ down
        merged[target] = (np.asarray(merged[target], np.float32)
                          + multiplier * alpha * delta).astype(
            np.asarray(sd[target]).dtype)
        n_hit += 1
    if verbose:
        print(f"[lora] merged {n_hit} layers, {n_miss} unmatched")
    return merged
