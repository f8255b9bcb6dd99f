"""Test configuration: force an 8-device virtual CPU platform so sharding
tests run without TPU hardware (set BEFORE jax import)."""

import os

# Force-override: the machine environment presets JAX_PLATFORMS=axon (the
# real TPU tunnel); tests must run on the virtual CPU mesh.  NOTE the env
# var alone is NOT enough — the axon PJRT plugin still grabs the TPU; the
# explicit jax.config.update below is what actually forces CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: most suite wall-time is XLA:CPU compiles;
# cache them across runs
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
