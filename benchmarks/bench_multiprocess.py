#!/usr/bin/env python
"""Multi-host-shaped serving demonstration: the sharded index on a REAL
multi-process mesh (jax.distributed), hierarchical DCN merge included.

Two OS processes x 4 virtual CPU devices form one 8-device global mesh
(Gloo over TCP between the processes — the DCN analog; in-process devices
— the ICI analog).  The parent launches the children, each child:

  1. joins the mesh (jax.distributed.initialize),
  2. SPMD-builds a ShardedHnswIndex over the global mesh
     (dcn_slices=2: process boundary = slice boundary),
  3. serves a query batch through the hierarchical merge (within-slice
     gather+reduce stays in-process; only reduced [B, k] sets cross the
     process boundary) and through the flat merge,
  4. checks merged recall against a process-local exact oracle and that
     hierarchical == flat,
  5. writes the per-shard split snapshot (each process writes only ITS
     devices' shard files).

Timings are CPU+TCP numbers — topology evidence, not TPU throughput (the
per-chip serving column composes from benchmarks/bench_10m.py as
documented in BASELINE.md).

Usage:  python benchmarks/bench_multiprocess.py  [N_TOTAL] [DIMS]
Env:    MP_NPROC (default 2), MP_PORT (default 29873)
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

N_TOTAL = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
DIMS = int(sys.argv[2]) if len(sys.argv) > 2 else 96
NPROC = int(os.environ.get("MP_NPROC", 2))
PORT = os.environ.get("MP_PORT", "29873")

_CHILD = r'''
import json, os, sys, time
pid = int(sys.argv[1]); nproc = int(sys.argv[2])
n_total = int(sys.argv[3]); dims = int(sys.argv[4]); port = sys.argv[5]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=nproc, process_id=pid)
sys.path.insert(0, os.environ["PG_EMB_REPO"])
import numpy as np
from jax.sharding import Mesh
from jax.experimental import multihost_utils
from pg_embedding_tpu import HnswConfig, ShardedHnswIndex

def log(m):
    if pid == 0:
        print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)

mesh = Mesh(np.asarray(jax.devices()), ("shard",))
S = mesh.devices.size
log(f"global mesh: {S} devices over {jax.process_count()} processes "
    f"({len(jax.local_devices())} local each)")

rng = np.random.default_rng(1234)
centers = rng.normal(scale=4.0, size=(2000, dims)).astype(np.float32)
pts = (centers[rng.integers(0, 2000, n_total)] +
       rng.normal(size=(n_total, dims)).astype(np.float32))
nq = 256
qs = (centers[rng.integers(0, 2000, nq)] +
      rng.normal(size=(nq, dims)).astype(np.float32))

cfg = HnswConfig(dims=dims, m=16, ef_construction=64, ef_search=64)
idx = ShardedHnswIndex(cfg, mesh=mesh, dcn_slices=nproc,
                       initial_capacity=n_total // S + 512)
t0 = time.time()
idx.build(pts, np.arange(n_total))
multihost_utils.sync_global_devices("built")
build_s = time.time() - t0
log(f"built {n_total} x {dims}d in {build_s:.1f}s = "
    f"{n_total/build_s:.0f} vec/s (CPU mesh, {jax.process_count()} procs)")

# exact oracle (sharded exact sweep, collective)
de, le, ve = idx.exact_search(qs, 10)

# hierarchical (DCN) merge serving
d1, l1, v1 = idx.search(qs, 10, mode="graph")
t0 = time.time()
for _ in range(4):
    d1, l1, v1 = idx.search(qs, 10, mode="graph")
hier_qps = 4 * nq / (time.time() - t0)
rec = np.mean([len(set(l1[i][v1[i]]) & set(le[i][ve[i]])) / 10
               for i in range(nq)])

# flat merge for comparison (identical results required)
idx.dcn_slices = None
d2, l2, v2 = idx.search(qs, 10, mode="graph")
t0 = time.time()
for _ in range(4):
    d2, l2, v2 = idx.search(qs, 10, mode="graph")
flat_qps = 4 * nq / (time.time() - t0)
np.testing.assert_array_equal(l1, l2)
idx.dcn_slices = nproc

log(f"serve: recall@10={rec:.4f}; hierarchical merge {hier_qps:.0f} QPS, "
    f"flat merge {flat_qps:.0f} QPS (CPU+TCP transport; results identical)")

# per-shard split snapshot: each process writes only its devices' shards
out = os.environ.get("MP_OUT", "/tmp/mp_bench_idx.npz")
t0 = time.time()
idx.save(out, per_shard=True)
multihost_utils.sync_global_devices("saved")
save_s = time.time() - t0
mine = sum(1 for i in range(S)
           if list(mesh.devices.flat)[i].process_index == pid)
print(f"[p{pid}] wrote {mine} shard files in {save_s:.1f}s", flush=True)

if pid == 0:
    print("RESULT " + json.dumps({
        "n_total": n_total, "dims": dims, "nproc": nproc, "devices": S,
        "build_vps": round(n_total / build_s, 1),
        "recall_at_10": round(float(rec), 4),
        "hier_qps": round(hier_qps, 1), "flat_qps": round(flat_qps, 1),
    }), flush=True)
'''


def main():
    child = os.path.join("/tmp", "mp_bench_child.py")
    with open(child, "w") as f:
        f.write(_CHILD)
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)   # never touch the TPU tunnel
    env["PG_EMB_REPO"] = REPO
    procs = [
        subprocess.Popen(
            [sys.executable, child, str(i), str(NPROC), str(N_TOTAL),
             str(DIMS), PORT],
            env=env,
            stdout=None if i == 0 else subprocess.DEVNULL,
            stderr=subprocess.STDOUT if i == 0 else subprocess.DEVNULL)
        for i in range(NPROC)
    ]
    rc = [p.wait() for p in procs]
    if any(rc):
        print(f"FAILED rc={rc}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
