"""Two-process distributed smoke test (VERDICT r2 item 6).

Spawns two real OS processes that join one jax.distributed job over a
localhost coordinator (gloo CPU collectives) and exercise, for the first
time with process_count > 1:

  * parallel/mesh.py::initialize_multihost
  * a cross-process psum
  * serving/distributed_engine.py::DistributedEngine.sync_queue — process 0
    submits, process 1 receives the queue by broadcast, both decode the same
    SPMD program and produce identical tokens.

The reference has no multi-process path at all (its distribution is
sequential layer offload, reference: pt2e_utils.py:62-156); this guards the
DCN story SURVEY §2.5 prescribes.  Skipped when the port can't be bound or
the CPU backend lacks gloo collectives.
"""

import os
import socket
import subprocess
import sys

import pytest

_CHILD = os.path.join(os.path.dirname(__file__), "_mp_child.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_multihost_and_sync_queue():
    try:
        port = _free_port()
    except OSError:
        pytest.skip("cannot bind a localhost port")

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, _CHILD, str(port), str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("two-process smoke test timed out")

    for i, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 and "gloo" in out.lower() and "MP_OK" not in out:
            pytest.skip(f"CPU gloo collectives unavailable:\n{out[-800:]}")
        assert p.returncode == 0, f"process {i} failed:\n{out[-3000:]}"
        assert "MP_OK" in out, f"process {i} did not reach MP_OK:\n{out[-3000:]}"
