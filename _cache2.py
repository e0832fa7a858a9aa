import time, jax
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
import numpy as np
from dacapo_tpu.crypto.scheme import Scheme
t0=time.time(); s = Scheme("test_n11"); s.generate_keys(rot_steps=(1,))
print("keygen:", round(time.time()-t0,1), flush=True)
a = s.encrypt(np.ones(1024))
t0=time.time(); out = s.mul(a, a); out.data.block_until_ready()
print("first mul wall:", round(time.time()-t0,2), flush=True)
