"""Two-process ``jax.distributed`` CPU smoke test (SURVEY.md section 2b,
multi-host comm path).

Round-2 verdict gap: ``parallel/input.py``'s multi-host branch
(``jax.distributed.initialize`` + ``make_array_from_process_local_data``)
was never executed — the driver dryrun is single-process. This spawns two
coordinator-connected CPU processes (2 virtual devices each -> a 4-device
global mesh) running tests/_distributed_worker.py: uneven-split global
assembly, a jitted global reduction, and a tiny data-parallel fit.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
WORKER = Path(__file__).resolve().parent / "_distributed_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_smoke():
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker pins cpu itself before import
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(i), str(port)],
            cwd=REPO,
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        raise AssertionError(
            "distributed smoke timed out; partial output:\n" + "\n".join(outs)
        )
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert "DISTRIBUTED-SMOKE-OK" in out, f"process {i} output:\n{out}"
        assert "ragged split rejected" in out, out
        assert "global sum OK" in out and "dp fit OK" in out, out
