# Tests run on CPU with a virtual 8-device mesh so sharding paths are
# exercised without (and without hogging) the single TPU chip.
# NOTE: the axon TPU plugin force-selects itself via /root/.axon_site even if
# JAX_PLATFORMS is overridden in os.environ; jax.config is the reliable knob.
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
