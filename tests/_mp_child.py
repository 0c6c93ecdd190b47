"""Child process for the two-process distributed smoke test.

Run as: python _mp_child.py <port> <process_id>

First genuine multi-process exercise of parallel/mesh.py::initialize_multihost
and serving/distributed_engine.py::sync_queue (VERDICT r2 item 6): two OS
processes, each with 2 virtual CPU devices, join one 4-device job over a
localhost coordinator with gloo CPU collectives, then

  1. run a cross-process psum (the basic DCN collective),
  2. build a DistributedEngine on the global (2 data x 2 model) mesh —
     tensor-parallel collectives cross the process boundary — submit work on
     process 0 ONLY, sync_queue() it to process 1, and check both processes
     produce identical tokens.

Prints MP_OK on success; any failure exits nonzero.
"""

import os
import sys

port, pid = sys.argv[1], int(sys.argv[2])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from quantized_training_tpu.parallel.mesh import initialize_multihost

initialize_multihost(f"localhost:{port}", num_processes=2, process_id=pid,
                     cpu_collectives="gloo")
assert jax.process_count("cpu") == 2, jax.process_count("cpu")
cpus = jax.devices("cpu")
assert len(cpus) == 4, cpus
# pin default device so stray ops don't dispatch to a TPU plugin if present
jax.config.update("jax_default_device",
                  [d for d in jax.local_devices(backend="cpu")][0])

# --- 1. cross-process psum -------------------------------------------------
mesh = Mesh(np.asarray(cpus), ("data",))
x = jax.make_array_from_callback(
    (4,), NamedSharding(mesh, P("data")),
    lambda idx: np.arange(4.0, dtype=np.float32)[idx])
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(x)
got = float(np.asarray(total.addressable_shards[0].data))
assert got == 6.0, got
print(f"[{pid}] psum over 2 processes: {got}", flush=True)

# --- 2. DistributedEngine.sync_queue round ----------------------------------
from quantized_training_tpu.models import LlamaConfig, LlamaForCausalLM
from quantized_training_tpu.serving import KVCacheConfig
from quantized_training_tpu.serving.distributed_engine import DistributedEngine

kcfg = KVCacheConfig.kivi(max_prefill=16, max_decode=8)
cfg = LlamaConfig.tiny(max_position_embeddings=64, kv_cache=kcfg)
model = LlamaForCausalLM(cfg, None)
ids0 = jnp.asarray(np.random.default_rng(21).integers(0, 256, (1, 8)))
vars_ = model.init(jax.random.PRNGKey(0), ids0)  # same seed => same on both

gmesh = Mesh(np.asarray(cpus).reshape(2, 2), ("data", "model"))
eng = DistributedEngine(model, {"params": vars_["params"]}, gmesh,
                        batch_slots=2)
from quantized_training_tpu.serving.engine import SamplingParams

if pid == 0:  # only the front-end host sees requests
    rng = np.random.default_rng(7)
    eng.submit(rng.integers(0, 256, 6), max_new_tokens=4)
    # per-request sampling params + stop sequences ride the queue broadcast
    eng.submit(rng.integers(0, 256, 11), max_new_tokens=4,
               temperature=0.8, top_k=12, top_p=0.9, stop=[[3, 1]])
    eng.submit(rng.integers(0, 256, 4), max_new_tokens=4)
eng.sync_queue()
# the synced params must round-trip the int32 wire exactly on every process
assert eng.queue[1][3] == SamplingParams(
    temperature=np.float32(0.8), top_k=12, top_p=np.float32(0.9),
    stop=((3, 1),)), eng.queue[1][3]
out = eng.run()
assert set(out.keys()) == {0, 1, 2}, out.keys()
assert all(len(v) <= 4 for v in out.values()), out

# identical tokens on every process
from jax.experimental import multihost_utils

flat = np.asarray([t for rid in sorted(out) for t in out[rid]], np.int32)
flat0 = np.asarray(multihost_utils.broadcast_one_to_all(flat))
assert np.array_equal(flat, flat0), (flat, flat0)
print(f"[{pid}] sync_queue round: {len(out)} requests, tokens match "
      f"process 0", flush=True)
print(f"[{pid}] MP_OK", flush=True)
