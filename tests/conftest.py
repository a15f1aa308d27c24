import os

# Tests run on a virtual 8-device CPU mesh with float64 enabled; the real
# TPU chip is reserved for bench.py.  NOTE: the environment pins
# JAX_PLATFORMS=axon via sitecustomize, so the config update below (not the
# env var) is what actually forces CPU.
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

REF = "/root/reference"


def ref_path(*parts):
    return os.path.join(REF, *parts)
