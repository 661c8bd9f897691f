"""Test config: run JAX on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4's implication: multi-chip behaviour is validated with
`--xla_force_host_platform_device_count` since only one real TPU chip exists.

Note: the environment pins JAX_PLATFORMS=axon (the TPU tunnel) and the env
var alone does not reliably win, so we force the platform through jax.config
before any jax computation runs.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
# parity tests compare f32 numerics against torch-CPU; keep matmuls exact
jax.config.update("jax_default_matmul_precision", "highest")
# reuse compiles across test runs (engine/forensics graphs are large)
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# build the native decoders once if the toolchain is available, so the
# decode/video tests run instead of skipping (cpp/*.cc + `make -C cpp`)
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if not all(os.path.exists(os.path.join(_repo, "cpp", so))
           for so in ("libtpudf_decode.so", "libtpudf_video.so")):
    import subprocess
    try:
        subprocess.run(["make", "-C", os.path.join(_repo, "cpp")],
                       capture_output=True, timeout=120, check=False)
    except Exception:
        pass  # tests skip gracefully when the decoder stays unbuilt
