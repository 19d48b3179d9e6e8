"""Child process for the 2-process jax.distributed CPU test.

Usage: python _dist_child.py <port> <process_id> <workdir>

Exercises, across two real OS processes (the TPU-native analogue of the
reference's multi-node DDP path, ``tools/prepare_things.py:9-31`` +
``train.py:139-154``):

- ``jax.distributed.initialize`` bootstrap (core/distributed.py)
- ``host_shard_bounds`` handing each process a distinct contiguous shard
- the Loader's multi-process global-batch assembly
  (``jax.make_array_from_process_local_data``)
- per-replica-BN shard_map training with cross-process pmean'd grads
- rank-0-only checkpointing (``save_on_master``)

Prints ``CHECKSUM <value>`` (must match across ranks — proves the grad
all-reduce) and ``OK`` on success.
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
import jax.numpy as jnp  # noqa: E402
from flax import linen as nn  # noqa: E402

from scouter_tpu.core.checkpoint import save_on_master  # noqa: E402
from scouter_tpu.data import ArrayDataset, Loader  # noqa: E402
from scouter_tpu.parallel import host_shard_bounds, make_mesh  # noqa: E402
from scouter_tpu.train.state import create_train_state  # noqa: E402
from scouter_tpu.train.steps import make_eval_step, make_train_step  # noqa: E402

assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == pid
assert len(jax.devices()) == 4, jax.devices()

# distinct contiguous host shards (DistributedSampler replacement)
b0 = host_shard_bounds(11, process_index=0, process_count=2)
b1 = host_shard_bounds(11, process_index=1, process_count=2)
assert b0 == (0, 6) and b1 == (6, 11), (b0, b1)


class TinyCNN(nn.Module):
    """Minimal conv+BN+pool+dense classifier (exercises batch_stats under the
    shard_map step exactly like the backbone BNs do)."""

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(8, (3, 3), name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn")(x)
        x = jax.nn.relu(x)
        x = x.mean(axis=(1, 2))
        return {"logits": nn.Dense(4, name="fc")(x)}


mesh = make_mesh()  # 4 global devices, 2 per process
model = TinyCNN()
variables = model.init(jax.random.PRNGKey(0), np.zeros((4, 8, 8, 1), np.float32))
state, tx = create_train_state(variables, 1e-2)

# dataset identical on both hosts; each Loader reads only its own shard.
rng = np.random.RandomState(0)
images = (rng.rand(16, 8, 8, 1) * 255).astype(np.uint8)
labels = rng.randint(0, 4, 16).astype(np.int32)
ds = ArrayDataset(images, labels, "MNIST")
loader = Loader(ds, batch_size=4, img_size=8, train=True, seed=0, mesh=mesh)
assert loader.steps_per_epoch() == 2, loader.steps_per_epoch()

step = make_train_step(model, tx, 0.0, donate=False, mesh=mesh, sync_bn=False)
for batch in loader.epoch(0):
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))

# replicated params must be identical across ranks after pmean'd grads
checksum = float(sum(jnp.sum(jnp.abs(p)) for p in
                     jax.tree_util.tree_leaves(state.params)))
print(f"CHECKSUM {checksum:.10f}", flush=True)

# padded val loader: 11 examples over 2 hosts (6/5), both run 2 lockstep steps
val_loader = Loader(ArrayDataset(images[:11], labels[:11], "MNIST"),
                    batch_size=4, img_size=8, train=False, seed=0, mesh=mesh)
assert val_loader.steps_per_epoch() == 2, val_loader.steps_per_epoch()
eval_step = make_eval_step(model, 0.0)
accs = [float(eval_step(state, b)["acc"]) for b in val_loader.epoch(0)]
assert len(accs) == 2 and all(np.isfinite(a) for a in accs), accs

# rank-0-only checkpointing
my_path = os.path.join(workdir, f"ckpt_rank{pid}.bin")
save_on_master(b"payload", my_path)
if pid == 0:
    assert os.path.exists(my_path)
else:
    assert not os.path.exists(my_path)

print("OK", flush=True)
