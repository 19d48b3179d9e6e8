"""2-process jax.distributed CPU test (VERDICT round-2 item 4b).

Spawns two real OS processes that bootstrap a jax.distributed cluster over
localhost, each owning 2 virtual CPU devices, and drives the genuine
multi-process path: distinct host shards, the Loader's cross-process global
batch assembly, shard_map training with pmean'd grads, lockstep padded eval,
and rank-0-only checkpointing. See tests/_dist_child.py for what runs inside.
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_training(tmp_path):
    child = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_dist_child.py")
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, child, str(port), str(rank), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for rank in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert "OK" in out, f"rank {rank} no OK:\n{out}"

    checksums = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("CHECKSUM ")]
        assert len(lines) == 1, out
        checksums.append(lines[0])
    # identical replicated params across ranks proves the grad all-reduce
    assert checksums[0] == checksums[1], checksums

    # rank-0-only checkpointing wrote exactly the rank-0 file
    assert (tmp_path / "ckpt_rank0.bin").exists()
    assert not (tmp_path / "ckpt_rank1.bin").exists()


@pytest.mark.slow
def test_two_process_tp_zero1_sharded_checkpoint(tmp_path):
    """Cross-process TP+ZeRO-1: training over a (data=2, model=2) mesh whose
    data axis spans two OS processes, the never-otherwise-executable
    ``process_allgather`` checkpoint branch (asserted via the printed
    non-fully-addressable leaf census), restore-under-layout, and a mid-epoch
    preemption consensus + cursor resume that is bit-identical to the
    uninterrupted run. See tests/_dist_tp_child.py."""
    child = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "_dist_tp_child.py")
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, child, str(port), str(rank), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for rank in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=1500)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-8000:]}"
        assert "OK" in out, f"rank {rank} no OK:\n{out[-8000:]}"

    def field(out, name):
        lines = [l for l in out.splitlines() if l.startswith(name + " ")]
        assert len(lines) == 1, out[-8000:]
        return lines[0]

    # the allgather branch provably ran (non-fully-addressable leaves existed)
    for out in outs:
        assert int(field(out, "NFA").split()[1]) > 0
    # identical final params across ranks proves consistent collectives
    assert field(outs[0], "CHECKSUM") == field(outs[1], "CHECKSUM")
