"""Multi-process (multi-host) runtime initialization.

The reference is strictly single-process (SURVEY.md §2.4 — no
init_process_group anywhere); tpudf's scale-out runs one process per host
over a TPU slice, coordinated by JAX's built-in distributed service (the
TPU-native replacement for the NCCL/MPI launchers a CUDA framework would
carry). Collectives then ride ICI/DCN via XLA from shardings alone —
nothing here ever issues an explicit collective.

Two entry styles:

  * On a real TPU pod: ``initialize()`` with no arguments — JAX
    auto-detects the coordinator and topology from the TPU runtime.
  * Anywhere else (CPU smoke runs, the 2-process CI test,
    ``tpudf.cli.launch``): the launcher exports TPUDF_COORD /
    TPUDF_NUM_PROCS / TPUDF_PROC_ID and workers call
    ``initialize_from_env()`` before any jax computation. On the CPU
    backend cross-process collectives use gloo
    (jax_cpu_collectives_implementation), validated end-to-end by
    tests/test_multiprocess.py.

Call ``initialize_from_env()`` early — before devices are queried — or it
cannot take effect; it is a silent no-op when the env vars are absent so
single-process CLIs need no guard.
"""

from __future__ import annotations

import os

COORD_VAR = "TPUDF_COORD"
NPROCS_VAR = "TPUDF_NUM_PROCS"
PROC_ID_VAR = "TPUDF_PROC_ID"

_initialized = False


def is_multiprocess_env() -> bool:
    return COORD_VAR in os.environ


def initialize(coordinator: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_ids=None) -> bool:
    """Bring up jax.distributed. Explicit args win; a no-arg call on a TPU
    pod auto-detects. Returns True when initialization ran (False when it
    already had)."""
    global _initialized
    if _initialized:
        return False
    import jax
    if coordinator is not None:
        # cross-process CPU collectives need gloo. Set unconditionally (it
        # only affects the CPU backend) — probing jax.default_backend()
        # here would initialize XLA before distributed.initialize, which
        # jax forbids.
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id,
                               local_device_ids=local_device_ids)
    _initialized = True
    return True


def initialize_from_env() -> bool:
    """Initialize from the TPUDF_* env vars exported by ``tpudf.cli.launch``
    (or by hand). No-op without them — safe to call unconditionally at the
    top of every CLI main()."""
    if not is_multiprocess_env():
        return False
    coord = os.environ[COORD_VAR]
    n = int(os.environ[NPROCS_VAR])
    pid = int(os.environ[PROC_ID_VAR])
    # CPU smoke topology: the launcher may also pin the virtual device
    # count per process; honoring it here keeps workers one-line simple
    if os.environ.get("TPUDF_FORCE_CPU"):
        import jax
        jax.config.update("jax_platforms", "cpu")
    return initialize(coord, n, pid)
