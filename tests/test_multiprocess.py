"""Multi-process data-parallel test: 2 jax.distributed CPU processes with
4 virtual devices each must reproduce the single-process 8-device run —
global batch assembly, one train step (identical replicated params), and
cross-host meter reduction (the path the reference's vestigial
torch.distributed setup never exercised, SURVEY.md section 2.2)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np

import mp_worker


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn_workers(nproc, devices_per_proc):
    here = os.path.dirname(os.path.abspath(__file__))
    coord = f"127.0.0.1:{_free_port()}"
    procs = []
    for pid in range(nproc):
        env = dict(os.environ)
        flags = " ".join(
            f for f in env.get("XLA_FLAGS", "").split()
            if not f.startswith("--xla_force_host_platform_device_count"))
        env["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count="
            f"{devices_per_proc}").strip()
        env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_test")
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(here, "mp_worker.py"),
             "--coord", coord, "--nproc", str(nproc), "--pid", str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True))
    results = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            p.kill()
            out, err = p.communicate()
            raise RuntimeError(
                f"mp worker timed out; stderr tail:\n{err[-2000:]}")
        assert p.returncode == 0, (
            f"worker rc={p.returncode}\nstdout:{out[-1000:]}\n"
            f"stderr:{err[-3000:]}")
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert line, f"no RESULT line in worker output:\n{out[-1000:]}"
        results.append(json.loads(line[-1][len("RESULT "):]))
    return results


def _spawn_with_retry(nproc, devices_per_proc, attempts=2):
    """gloo context init has a hard 30 s key-value handshake timeout; on
    a heavily loaded host a worker can be descheduled past it. One retry
    keeps the test robust without masking real regressions (all
    numerical assertions stay strict)."""
    for attempt in range(attempts):
        try:
            return _spawn_workers(nproc, devices_per_proc)
        except Exception:
            if attempt == attempts - 1:
                raise
    raise RuntimeError("unreachable")


def test_two_process_dp_matches_single_process():
    ref = mp_worker.compute()          # in-process: 1 proc x 8 devices
    assert ref["ndev"] == 8

    results = _spawn_with_retry(nproc=2, devices_per_proc=4)
    assert [r["rank"] for r in results] == [0, 1]
    for r in results:
        assert r["world"] == 2 and r["ndev"] == 8

    r0, r1 = results
    # (a) global batch assembled identically on a 2-process mesh
    np.testing.assert_allclose(r0["batch_chk"], ref["batch_chk"], rtol=1e-6)
    np.testing.assert_allclose(r1["batch_chk"], ref["batch_chk"], rtol=1e-6)
    # (c) one train step: params identical across processes and equal to
    # the single-process run (same 8-way sharding => same reductions)
    assert r0["param_sum"] == r1["param_sum"], "replica divergence"
    assert r0["loss"] == r1["loss"]
    np.testing.assert_allclose(r0["param_sum"], ref["param_sum"], rtol=1e-6)
    np.testing.assert_allclose(r0["loss"], ref["loss"], rtol=1e-5)
    # (b) cross-host meter reduction reproduces the single-process score
    np.testing.assert_allclose(r0["miou"], ref["miou"], rtol=1e-9)
    np.testing.assert_allclose(r1["miou"], ref["miou"], rtol=1e-9)
