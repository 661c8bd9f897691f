"""Multi-process launcher — the tpudf analogue of torchrun/mpirun.

Spawns N copies of a worker command with the TPUDF_* coordination env vars
set (consumed by tpudf.parallel.dist.initialize_from_env), streams each
child's output with a ``[pK]`` prefix, and exits non-zero if any child
fails. The reference has no launcher at all (it never runs multi-process,
SURVEY.md §2.4); on a real TPU pod you normally don't need one either (one
process per host is started by the pod runtime and ``initialize()``
auto-detects) — this exists for single-host multi-process runs and the
CPU smoke topology the CI test drives.

Examples:
    # 2-process CPU smoke, 4 virtual devices each (8-device global mesh)
    python -m tpudf.cli.launch --nprocs 2 --cpu_devices 4 -- \
        python tests/_mp_worker.py --out /tmp/mp.npz

    # 2 local processes sharing the host's devices
    python -m tpudf.cli.launch --nprocs 2 -- python my_trainer.py ...
"""

from __future__ import annotations

import argparse
import os
import socket
import subprocess
import sys
import threading

from tpudf.parallel.dist import COORD_VAR, NPROCS_VAR, PROC_ID_VAR


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _stream(proc, tag):
    for line in proc.stdout:
        sys.stdout.write(f"[{tag}] {line if isinstance(line, str) else line.decode()}")
        sys.stdout.flush()


def launch(cmd, nprocs: int, cpu_devices: int = 0, port: int | None = None,
           env_extra: dict | None = None) -> int:
    """Run `cmd` (argv list) nprocs times with coordination env. Returns
    the max child return code."""
    port = port or _free_port()
    procs = []
    for pid in range(nprocs):
        env = os.environ.copy()
        env[COORD_VAR] = f"localhost:{port}"
        env[NPROCS_VAR] = str(nprocs)
        env[PROC_ID_VAR] = str(pid)
        if cpu_devices:
            env["TPUDF_FORCE_CPU"] = "1"
            env["JAX_PLATFORMS"] = "cpu"
            flags = env.get("XLA_FLAGS", "")
            flags = " ".join(f for f in flags.split()
                             if "host_platform_device_count" not in f)
            env["XLA_FLAGS"] = (
                f"{flags} --xla_force_host_platform_device_count="
                f"{cpu_devices}").strip()
        env.update(env_extra or {})
        procs.append(subprocess.Popen(
            cmd, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    threads = [threading.Thread(target=_stream, args=(p, f"p{i}"))
               for i, p in enumerate(procs)]
    for t in threads:
        t.start()
    rcs = [p.wait() for p in procs]
    for t in threads:
        t.join()
    return max(rcs)


def main(argv=None):
    p = argparse.ArgumentParser(
        description="spawn N coordinated tpudf worker processes")
    p.add_argument("--nprocs", type=int, required=True)
    p.add_argument("--cpu_devices", type=int, default=0,
                   help="force the CPU backend with this many virtual "
                        "devices per process (smoke/test topology)")
    p.add_argument("--port", type=int, default=0,
                   help="coordinator TCP port (default: pick a free one)")
    p.add_argument("cmd", nargs=argparse.REMAINDER,
                   help="worker command after `--`")
    args = p.parse_args(argv)
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        p.error("no worker command given (pass it after --)")
    rc = launch(cmd, args.nprocs, args.cpu_devices, args.port or None)
    sys.exit(rc)


if __name__ == "__main__":
    main()
