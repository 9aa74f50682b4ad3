"""fantasy-world-tpu: TPU-native camera-controlled video + 3D world generation.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
Fantasy-AMAP/fantasy-world (reference layout documented in SURVEY.md):
a Wan 2.1/2.2 14B video diffusion transformer fused with a VGGT-style
geometry transformer through IRG dual-branch blocks, producing video and
per-frame depth / world-point / camera-pose outputs in one denoise pass.

Design pillars (TPU-first, not a port):
  * pure-functional modules: every component is (init_params, apply) over
    explicit parameter pytrees -- jit/pjit/shard_map compose freely.
  * bf16 compute on the MXU with f32 normalization/softmax accumulation.
  * RoPE tables precomputed host-side in float64 then cast once to f32.
  * one attention dispatch (`fantasy_world_tpu.ops.attention`) lowering to a
    Pallas flash-attention kernel on TPU with an XLA fallback everywhere.
  * GSPMD sharding over a Mesh(('data','seq','model')) -- no explicit
    collectives in model code.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy: importing the package must not pull jax/model code eagerly
    if name == "FantasyWorldSampler":
        from .sampler import FantasyWorldSampler
        return FantasyWorldSampler
    raise AttributeError(name)
