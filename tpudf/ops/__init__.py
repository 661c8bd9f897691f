"""Device op library: attention, layernorm, forensic feature kernels.

Import submodules explicitly (e.g. `from tpudf.ops.attention import
attention`) — the package does not re-export names to avoid shadowing
submodules.
"""
