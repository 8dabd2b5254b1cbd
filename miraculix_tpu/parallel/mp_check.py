"""Launcher for the multi-PROCESS distributed drive (see _mp_worker.py).

``run_cluster(n)`` builds a small .bed panel + f64 oracle results, then
spawns ``n`` real OS processes that form a jax.distributed CPU cluster
(Gloo collectives, 4 virtual devices each) and run the full checklist:
per-process range-confined .bed ingestion, sharded dgemm/GRM/CG vs the
oracle, collective checkpoint save/load, and the 2D layer.  This is the
process-boundary proof the single-process virtual mesh cannot give
(addressable-shard index math, coordinator bootstrap, non-addressable
gathers).  The reference has no distributed layer to compare against
(/root/reference/src/cuda/cuda_utils.cu:188-248 picks one GPU by env var).
"""
from __future__ import annotations

import os
import socket
import subprocess
import sys
import tempfile

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def write_oracle(workdir: str, indiv: int = 48, snps: int = 700,
                 seed: int = 7) -> None:
    """Write <workdir>/panel.bed and <workdir>/oracle.npz: the dense-f64
    reference results every worker checks its distributed outputs against."""
    import numpy as np

    from ..io import bed as bedio
    from ..io import codec

    g = bedio.simulate_genotypes(indiv, snps, seed=seed)
    bedio.write_bed(os.path.join(workdir, "panel.bed"), g)
    f = codec.allele_freq(g)
    zc = g.astype(np.float64) - 2.0 * f[None, :]
    rng = np.random.default_rng(seed + 1)
    b_n = rng.standard_normal((snps, 2)).astype(np.float32)
    b_t = rng.standard_normal((indiv, 2)).astype(np.float32)
    gu = zc @ zc.T
    np.savez(
        os.path.join(workdir, "oracle.npz"),
        b_n=b_n, b_t=b_t,
        c_n=zc @ b_n.astype(np.float64),
        c_t=zc.T @ b_t.astype(np.float64),
        grm=gu / (2.0 * np.sum(f * (1.0 - f))),
        g_unscaled=gu,
        lam=np.float64(50.0),
        rhs=rng.standard_normal(indiv).astype(np.float32),
    )


def run_cluster(num_processes: int = 2, timeout: float = 900.0,
                indiv: int = 48, snps: int = 700,
                devices_per_proc: int = 4,
                fail_process: int = None) -> list:
    """Spawn the N-process drive; raise with full worker logs on any
    failure.  Returns the per-process stdout (each ends in MP_DRIVE_OK).

    ``devices_per_proc``: virtual CPU devices per process (4-process cases
    run 1 each).  ``fail_process``: failure-injection index — that worker
    exits rc=3 before the first collective; run_cluster then asserts every
    SURVIVOR terminates with a nonzero rc (a clear distributed-runtime
    error) instead of hanging past ``timeout``, and returns the logs."""
    with tempfile.TemporaryDirectory() as workdir:
        write_oracle(workdir, indiv=indiv, snps=snps)
        port = _free_port()
        env = dict(os.environ)
        env["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={devices_per_proc}")
        env["JAX_PLATFORMS"] = "cpu"
        env["MX_MP_DPP"] = str(devices_per_proc)
        if fail_process is not None:
            env["MX_MP_FAIL_PID"] = str(fail_process)
        procs = [
            subprocess.Popen(
                [sys.executable, "-m", "miraculix_tpu.parallel._mp_worker",
                 str(i), str(num_processes), str(port), workdir],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                env=env, cwd=_REPO_ROOT)
            for i in range(num_processes)
        ]
        outs = []
        try:
            for p in procs:
                out, _ = p.communicate(timeout=timeout)
                outs.append(out.decode(errors="replace"))
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            got = "\n---\n".join(outs)
            raise RuntimeError(
                f"mp drive timed out after {timeout}s; partial logs:\n{got}")

        if fail_process is not None:
            logs = "\n".join(
                f"--- process {i} (rc={procs[i].returncode}) ---\n{outs[i]}"
                for i in range(num_processes))
            assert procs[fail_process].returncode == 3, logs
            assert "MP_FAIL_INJECTED" in outs[fail_process], logs
            survivors = [i for i in range(num_processes)
                         if i != fail_process]
            hung_ok = [i for i in survivors
                       if procs[i].returncode == 0
                       or "MP_DRIVE_OK" in outs[i]]
            assert not hung_ok, (
                f"survivors {hung_ok} reported success despite a dead "
                f"peer — the failure was swallowed:\n{logs}")
            return outs

        bad = [i for i, (p, out) in enumerate(zip(procs, outs))
               if p.returncode != 0 or "MP_DRIVE_OK" not in out]
        if bad:
            logs = "\n".join(
                f"--- process {i} (rc={procs[i].returncode}) ---\n{outs[i]}"
                for i in range(num_processes))
            raise RuntimeError(f"mp drive failed in process(es) {bad}:\n{logs}")
        return outs


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    for line in run_cluster(n):
        print(line)
