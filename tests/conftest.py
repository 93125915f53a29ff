"""Test harness: force an 8-device virtual CPU mesh (the JAX analog of the
reference's virtual-GPU multi-device trick, see SURVEY.md §4)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The installed 'axon' TPU plugin overrides JAX_PLATFORMS from the
# environment, so pin the platform through the config API too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# NOTE: the persistent compilation cache (retinanet_tpu.core.cache) is NOT
# enabled here — XLA:CPU AOT blobs fail to reload across runs on this host
# (machine-feature mismatch -> MemoryError). The cache is for the slow
# tunneled TPU compiles only.
