import time
import numpy as np, jax, jax.numpy as jnp
from fantasy_world_tpu.models.wan.vae import VAEConfig, init_wan_vae, vae_decode_tiled
from fantasy_world_tpu.core.params import abstract_init

cfg = VAEConfig()
with abstract_init():
    host = init_wan_vae(0, cfg, jnp.bfloat16)
abstract = jax.tree_util.tree_map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), host)
params = jax.jit(lambda: jax.tree_util.tree_map(
    lambda s: jnp.zeros(s.shape, s.dtype), abstract))()
lat = jnp.zeros((1, 16, 21, 42, 74), jnp.bfloat16)
def fetch_scalar(x):
    return np.asarray(jax.device_get(x.ravel()[0]))
t0=time.perf_counter()
out = vae_decode_tiled(params, cfg, lat, (30, 52), (15, 26)); fetch_scalar(out)
print("compile+first:", time.perf_counter()-t0, out.shape, out.dtype)
for _ in range(3):
    t0=time.perf_counter()
    out = vae_decode_tiled(params, cfg, lat, (30, 52), (15, 26)); fetch_scalar(out)
    print("tiled decode:", time.perf_counter()-t0)
