"""Child process for the 2-process TP/ZeRO-1 sharded-state test.

Usage: python _dist_tp_child.py <port> <process_id> <workdir>

Two real OS processes x 2 virtual CPU devices each form a (data=2, model=2)
mesh where the ``data`` axis spans the PROCESS boundary. This is the regime
ZeRO-1 exists for: optimizer-moment shards physically live on another
process, so every state leaf is non-fully-addressable and checkpointing MUST
take the ``process_allgather`` branch of ``core/checkpoint.py::_to_host`` —
the one code path that cannot execute in any single-process test. It proves,
across a real process boundary:

- cross-process TP+ZeRO-1 training (GSPMD collectives over gloo)
- the sharded-state checkpoint save (allgather branch, asserted to have run
  via the addressability census printed as ``NFA <count>``)
- restore re-placed onto the TP layout (``restore_checkpoint(shardings=)``)
- mid-epoch preemption consensus (``Trainer._stop_consensus`` allgather),
  cursor save with carried metric sums, and a resume whose final parameters
  are BIT-IDENTICAL to the uninterrupted trajectory

Prints ``NFA <n>``, ``CHECKSUM <value>`` (must match across ranks) and
``OK``. The reference's nearest claim is multi-node DDP
(``tools/prepare_things.py:9-31``); this goes beyond it (the reference has
no sharded state and no mid-epoch resume at all).
"""

import os
import sys

port, pid, workdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(f"localhost:{port}", num_processes=2, process_id=pid)

import numpy as np  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402

from scouter_tpu.core import ScouterConfig  # noqa: E402
from scouter_tpu.core.cache import setup_compilation_cache  # noqa: E402
from scouter_tpu.core.checkpoint import (  # noqa: E402
    checkpoint_path,
    restore_checkpoint,
    save_checkpoint,
)
from scouter_tpu.data import ArrayDataset, synthetic_mnist  # noqa: E402
from scouter_tpu.parallel import make_mesh  # noqa: E402
from scouter_tpu.train import Trainer  # noqa: E402

setup_compilation_cache()  # share compiles across the three Trainers below

assert jax.process_count() == 2 and len(jax.devices()) == 4

cfg = ScouterConfig(
    model="resnet10", dataset="MNIST", num_classes=10, channel=512,
    use_slot=True, slots_per_class=2, power=2, loss_status=1, to_k_layer=2,
    lambda_value=1.0, img_size=32, batch_size=8, epochs=2,
    pre_trained=False, freeze_layers=0, output_dir=workdir, seed=0,
    zero1=True, sync_bn=True,
)

# data axis (rows of the device grid) spans the two processes; model axis is
# intra-process. Both hosts build the same dataset; the Loader reads shards.
mesh = make_mesh((2, 2), ("data", "model"))
(tr_x, tr_y), (te_x, te_y) = synthetic_mnist(num_train=32, num_test=8)
datasets = (ArrayDataset(tr_x, tr_y, "MNIST"), ArrayDataset(te_x, te_y, "MNIST"))


def host_params(state):
    """Full host values of every param leaf (collective under this layout)."""
    from scouter_tpu.core.checkpoint import _to_host

    return _to_host(state.params)


# ---- uninterrupted trajectory -------------------------------------------------
t1 = Trainer(cfg, mesh=mesh, datasets=datasets)
assert t1.loader_train.steps_per_epoch() == 2, t1.loader_train.steps_per_epoch()

# the layout really is cross-process sharded: a ZeRO-1 'data'-sharded moment
# holds only this process's half locally, and non-fully-addressable leaves
# exist throughout the state (each one forces the allgather branch on save)
state_leaves = [x for x in jax.tree_util.tree_leaves(t1.state)
                if isinstance(x, jax.Array)]
nfa = sum(1 for x in state_leaves if not x.is_fully_addressable)
assert nfa > 0, "no non-fully-addressable leaves; allgather branch not forced"
zleaves = [x for x in jax.tree_util.tree_leaves(t1.state.opt_state)
           if isinstance(x, jax.Array) and "data" in str(getattr(x.sharding, "spec", ""))]
assert zleaves, "zero1 sharded no optimizer leaf over 'data'"
z = max(zleaves, key=lambda x: x.size)
ax = list(z.sharding.spec).index("data")
assert not z.is_fully_addressable
assert z.addressable_shards[0].data.shape[ax] == z.shape[ax] // 2
assert len({s.index[ax] for s in z.addressable_shards}) == 1, \
    "this process should hold exactly one half of the data-sharded moment"

t1.run_epoch(0, "train")
h0 = host_params(t1.state)

# epoch-0 boundary checkpoint: _to_host's process_allgather branch runs here
save_checkpoint(workdir, cfg, t1.state, 0)
multihost_utils.sync_global_devices("ckpt_epoch0")

# restore re-placed onto the TP/ZeRO-1 layout; values identical
path = checkpoint_path(workdir, cfg)
restored, ep, _ = restore_checkpoint(path, t1.state, shardings=t1.state_shardings)
assert ep == 0
rk = restored.params["backbone"]["layer4_0"]["conv1"]["kernel"]
assert rk.sharding.spec[3] == "model", rk.sharding.spec
for a, b in zip(jax.tree_util.tree_leaves(h0),
                jax.tree_util.tree_leaves(host_params(restored))):
    np.testing.assert_array_equal(a, b)

t1.run_epoch(1, "train")
h_full = host_params(t1.state)
loss_full = t1.log.record["train"]["loss"][-1]

# ---- preempted + resumed trajectory (same layout) ------------------------------
cfg_resume = cfg.replace(resume=True, preempt_save=True)
t2 = Trainer(cfg_resume, mesh=mesh, datasets=datasets)
t2.maybe_resume()
assert t2.start_epoch == 1 and t2._skip_batches == 0
t2.guard.trigger()  # both ranks flag before the epoch; consensus must agree
# default consensus_every (8) exceeds this 2-step epoch, so the poll interval
# must be pinned to assert the exact stop index; production epochs poll every
# 8 batches (Trainer._stop_consensus)
t2.consensus_every = 1
t2.run_epoch(1, "train")
assert t2._preempted_at == (1, 1), t2._preempted_at
save_checkpoint(workdir, cfg, t2.state, 1, batch=1,
                metric_sums=t2._preempt_sums)
multihost_utils.sync_global_devices("ckpt_preempt")

t3 = Trainer(cfg.replace(resume=True), mesh=mesh, datasets=datasets)
t3.maybe_resume()
assert t3.start_epoch == 1 and t3._skip_batches == 1
assert t3._resume_metric_sums is not None and t3._resume_metric_sums["n"] == 1
t3.run_epoch(1, "train")

# bit-identical final parameters, and the carried metric sums make the
# resumed epoch's logged average cover all batches
for a, b in zip(jax.tree_util.tree_leaves(h_full),
                jax.tree_util.tree_leaves(host_params(t3.state))):
    np.testing.assert_array_equal(a, b)
loss_resumed = t3.log.record["train"]["loss"][-1]
assert abs(loss_resumed - loss_full) < 1e-5, (loss_resumed, loss_full)

checksum = float(sum(np.float64(np.abs(x)).sum()
                     for x in jax.tree_util.tree_leaves(h_full)))
print(f"NFA {nfa}", flush=True)
print(f"CHECKSUM {checksum:.10f}", flush=True)
print("OK", flush=True)
