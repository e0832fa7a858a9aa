import os, time
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/root/.jax_cache"
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np
from dacapo_tpu.crypto.scheme import Scheme
s = Scheme("test_n11"); t0=time.time(); s.generate_keys(rot_steps=(1,))
print("keygen:", time.time()-t0)
a = s.encrypt(np.ones(1024)); t0=time.time()
out = s.mul(a, a); out.data.block_until_ready()
print("first mul (compile):", time.time()-t0)
