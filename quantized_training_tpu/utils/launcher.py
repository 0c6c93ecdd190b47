"""Thin job launcher: the TPU-native counterpart of the reference's slurm
submission helpers (reference utils.py:22-67 write_slurm_script /
submit_job).

On a slurm cluster the reference renders an ``.sbatch`` script per job and
shells out to ``sbatch``.  TPU pods are provisioned differently (one process
per host, meshes inside the process), so the common cases here are:

* ``LocalLauncher`` — run the experiment-matrix commands on this host with a
  bounded worker pool (the TPU is single-tenant, so the default is serial),
  one log file per job, non-zero exits collected not raised.
* ``render_tpu_script`` — render a job to a plain shell script (the
  ``write_slurm_script`` analogue) so it can be shipped to any scheduler —
  ``gcloud compute tpus tpu-vm ssh --command``, k8s, or indeed sbatch.

Both consume the same ``Job`` records the paper launcher
(run_quantized_training.py) produces.
"""

import dataclasses
import os
import shlex
import subprocess
import time
from typing import Dict, List, Optional, Sequence


@dataclasses.dataclass
class Job:
    """One experiment invocation."""

    name: str
    cmd: Sequence[str]                      # argv, e.g. ["python", "examples/..."]
    env: Optional[Dict[str, str]] = None    # extra environment (merged over os.environ)
    cwd: Optional[str] = None


@dataclasses.dataclass
class JobResult:
    name: str
    returncode: int
    log_path: str
    seconds: float


def render_tpu_script(job: Job, log_dir: str = "logs",
                      setup: str = "") -> str:
    """Render ``job`` as a standalone shell script (reference
    write_slurm_script analogue; no #SBATCH header — TPU schedulers take the
    resources out-of-band)."""
    lines = ["#!/bin/bash", "set -e", 'echo "host = $(hostname)"',
             'echo "start = $(date -Is)"']
    if setup:
        lines.append(setup)
    for k, v in (job.env or {}).items():
        lines.append(f"export {k}={shlex.quote(v)}")
    if job.cwd:
        lines.append(f"cd {shlex.quote(job.cwd)}")
    lines.append(" ".join(shlex.quote(c) for c in job.cmd))
    os.makedirs(log_dir, exist_ok=True)
    path = os.path.join(log_dir, job.name + ".sh")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    os.chmod(path, 0o755)
    return path


class LocalLauncher:
    """Run jobs on this host with at most ``max_parallel`` concurrent
    processes (default 1: the TPU is single-tenant — concurrent compute
    through the runtime corrupts both jobs' timings)."""

    def __init__(self, log_dir: str = "logs", max_parallel: int = 1):
        self.log_dir = log_dir
        self.max_parallel = max(1, max_parallel)
        os.makedirs(log_dir, exist_ok=True)

    def run(self, jobs: Sequence[Job]) -> List[JobResult]:
        results: List[JobResult] = []
        running: List[tuple] = []   # (popen, job, log file, t0)

        def _reap(block: bool) -> None:
            while running:
                for i, (proc, job, logf, t0) in enumerate(running):
                    rc = proc.poll()
                    if rc is not None:
                        logf.close()
                        results.append(JobResult(
                            job.name, rc, logf.name, time.time() - t0))
                        running.pop(i)
                        return
                if not block:
                    return
                time.sleep(0.05)

        for job in jobs:
            while len(running) >= self.max_parallel:
                _reap(block=True)
            env = dict(os.environ)
            env.update(job.env or {})
            log_path = os.path.join(self.log_dir, job.name + ".log")
            logf = open(log_path, "w")
            proc = subprocess.Popen(
                list(job.cmd), stdout=logf, stderr=subprocess.STDOUT,
                env=env, cwd=job.cwd)
            running.append((proc, job, logf, time.time()))
        while running:
            _reap(block=True)
        # preserve submission order in the report
        order = {j.name: i for i, j in enumerate(jobs)}
        results.sort(key=lambda r: order[r.name])
        return results
