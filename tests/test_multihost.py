"""True multi-PROCESS distributed tests (workload 5's multi-host runtime):
two jax.distributed processes, 4 virtual CPU devices each, one global
8-device mesh, per-process local data feeding, psum-reduced loss — plus
cross-process merged evaluation (VERDICT r2 #4).

This exercises what the in-process 8-device mesh cannot: the
jax.distributed.initialize handshake, cross-process GSPMD collectives,
and make_array_from_process_local_data batch assembly
(VERDICT r1: 'multi-HOST path has never been exercised')."""

import os
import re
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Failure signatures of the gloo clique-connect window expiring on a
# loaded 1-core host (VERDICT r2 #5: the test is flaky under suite load —
# compile skew between the two processes can exceed the KV-exchange
# window). These runs are retried; real failures are not.
_TRANSIENT = ("DEADLINE_EXCEEDED", "Gloo connectFullMesh failed",
              "Timed out waiting", "connection closed by peer",
              "UNAVAILABLE")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(worker: str, timeout: int, attempts: int = 3):
    """Launch the 2-process worker pair, retrying transient distributed-
    runtime failures. Returns both stdouts."""
    script = os.path.join(REPO, "tests", worker)
    last_outs = None
    for attempt in range(attempts):
        coord = f"localhost:{_free_port()}"
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env["GLOO_SOCKET_IFNAME"] = "lo"  # sandboxed host: force loopback
        env["PYTHONPATH"] = REPO + os.pathsep + \
            env.get("PYTHONPATH", "").replace("/root/.axon_site", "")
        procs = [subprocess.Popen(
            [sys.executable, script, coord, "2", str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True) for pid in (0, 1)]
        outs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=timeout)
            except subprocess.TimeoutExpired:
                p.kill()
                out, _ = p.communicate()
            outs.append(out)
        if all(p.returncode == 0 for p in procs):
            return outs
        last_outs = outs
        joined = "\n".join(outs)
        if not any(sig in joined for sig in _TRANSIENT):
            break  # a real failure — don't mask it with retries
    for pid, out in enumerate(last_outs):
        assert procs[pid].returncode == 0, \
            f"proc {pid} failed after retries:\n{out[-4000:]}"
    return last_outs


@pytest.mark.slow
def test_two_process_distributed_train_step():
    outs = _run_workers("_multihost_worker.py", timeout=1200)
    losses = []
    for out in outs:
        m = re.search(r"MULTIHOST_OK pid=\d+ loss=([0-9.]+)", out)
        assert m, out[-2000:]
        losses.append(float(m.group(1)))
    # the psum-reduced global loss must agree bit-for-bit across hosts
    assert losses[0] == losses[1], losses


@pytest.mark.slow
def test_two_process_sharded_vos_eval():
    """run_sequences_sharded across two processes (VERDICT r4 #7): local
    sequences in -> local predictions out with single-device pixel parity
    (asserted inside the worker), and the documented multi-process delta
    fallback — yuv420_delta requested, delta=False on the wire."""
    outs = _run_workers("_sharded_eval_worker.py", timeout=1200)
    for out in outs:
        m = re.search(r"SHARDED_EVAL_OK pid=\d+ worst_agree=([0-9.]+)", out)
        assert m, out[-3000:]
        assert float(m.group(1)) > 0.999
        # the fallback is load-bearing: packed uploads, no delta coding
        m = re.search(r"run_sequences_sharded: upload .*format=yuv420_delta"
                      r", delta=(\w+)", out)
        assert m, out[-3000:]
        assert m.group(1) == "False", out[-3000:]


@pytest.mark.slow
def test_two_process_merged_evaluation():
    """Each process evaluates a strided shard; merge_across_processes
    must reproduce the full-dataset summary on BOTH processes (the worker
    verifies values; here we verify both reported the same AP)."""
    outs = _run_workers("_gather_worker.py", timeout=600)
    aps = []
    for out in outs:
        m = re.search(r"GATHER_OK pid=\d+ AP=([0-9.]+)", out)
        assert m, out[-2000:]
        aps.append(float(m.group(1)))
    assert aps[0] == aps[1], aps
