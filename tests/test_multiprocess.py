"""Real multi-process (multi-host-shaped) mesh tests.

Launches TWO OS processes that form one global JAX mesh via
``jax.distributed`` (Gloo collectives between processes — the DCN analog;
4 virtual CPU devices each = the ICI analog), then drives the full
ShardedHnswIndex lifecycle across it: SPMD build, graph search with the
hierarchical dcn_slices merge, compressed sweep (the PQ codebook trains on
a COLLECTIVE cross-process sample), delete, and both snapshot forms —
including the per-shard split where each process writes only the shard
files its own devices hold (parallel/sharded.py save()).

This is the multi-host placement ROADMAP #5 said needed hardware: the
communication topology is real (two processes, out-of-process collectives);
only the physical transport differs (TCP here, ICI/DCN on a pod).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

_CHILD = r"""
import os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
tmp = sys.argv[4]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=nproc, process_id=pid)
sys.path.insert(0, {repo!r})
import numpy as np
from jax.sharding import Mesh
from jax.experimental import multihost_utils
from pg_embedding_tpu import HnswConfig, ShardedHnswIndex

assert jax.process_count() == nproc
assert len(jax.devices()) == 4 * nproc
mesh = Mesh(np.asarray(jax.devices()), ("shard",))
rng = np.random.default_rng(7)
pts = rng.normal(size=(400, 16)).astype(np.float32)
qs = rng.normal(size=(6, 16)).astype(np.float32)
cfg = HnswConfig(dims=16, m=6, ef_construction=24, ef_search=24)

# process boundary = slice boundary: hierarchical merge crosses it only
# with reduced top-k sets
idx = ShardedHnswIndex(cfg, mesh=mesh, initial_capacity=64,
                       dcn_slices=nproc)
idx.build(pts, np.arange(400))
assert idx.n_nodes == 400

d, l, v = idx.search(qs, 10)
de, le, ve = idx.exact_search(qs, 10)
rec = np.mean([len(set(l[i][v[i]]) & set(le[i][ve[i]])) / 10
               for i in range(6)])
assert rec >= 0.95, rec

# compressed sweep: codebook trained on a collective cross-process sample
ds, ls, vs = idx.search(qs, 10, mode="sweep_pq")
recs = np.mean([len(set(ls[i][vs[i]]) & set(le[i][ve[i]])) / 10
                for i in range(6)])
assert recs >= 0.9, recs

# delete crosses the collective host round-trip
gone = np.arange(0, 50, dtype=np.uint64)
assert idx.delete(gone) == 50
d2, l2, v2 = idx.search(qs, 10)
assert not np.isin(l2[v2], gone).any()
assert idx.vacuum()["num_dead"] == 50

# monolithic snapshot: fetches are collective, process 0 writes
p1 = os.path.join(tmp, "mp_idx.npz")
idx.save(p1)
multihost_utils.sync_global_devices("after-save")
idx2 = ShardedHnswIndex.load(p1, mesh=mesh, dcn_slices=nproc)
d3, l3, v3 = idx2.search(qs, 10)
np.testing.assert_array_equal(l2, l3)

# per-shard split: each process writes only ITS devices' shard files
p2 = os.path.join(tmp, "mp_split.npz")
idx.save(p2, per_shard=True)
multihost_utils.sync_global_devices("after-split-save")
idx3 = ShardedHnswIndex.load(p2, mesh=mesh)
d4, l4, v4 = idx3.search(qs, 10)
np.testing.assert_array_equal(l2, l4)

print(f"[p{pid}] MP OK", flush=True)
"""


def test_two_process_mesh_lifecycle(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "mp_child.py"
    script.write_text(_CHILD.replace("{repo!r}", repr(repo)))
    port = str(29500 + (os.getpid() % 400))
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # never touch the TPU tunnel
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), "2", port, str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-process children timed out:\n" +
                    "\n".join(outs))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-4000:]}"
        assert f"[p{i}] MP OK" in out
