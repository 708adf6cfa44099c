"""Worker for the 2-process CPU-cluster test (tests/test_distributed.py).

Run as ``python tests/_mp_worker.py <rank> <port> <tmpdir>`` twice (rank 0/1).
Exercises the REAL multi-process branches that a single process can never
reach — the analog of the reference's ``accelerate launch`` DDP run
(reference: src/flowhigh/train/trainer.py:97-102):

- ``parallel.initialize`` coordinator rendezvous (jax.distributed over gloo),
- ``make_global_mesh`` spanning both processes' devices,
- ``batch_iterator(process_index=...)`` disjoint data sharding,
- ``shard_global_batch`` -> ``jax.make_array_from_process_local_data``,
- one jitted train step with a cross-process gradient psum,
- coordinated multihost orbax save + restore (Trainer.save/restore_state),
- the torch-layout export running on process 0 only.

Prints one "MP_OK rank=..." line on success; any assert/exception exits
nonzero, which the spawning test reports.
"""

import os
import sys

rank = int(sys.argv[1])
port = sys.argv[2]
tmpdir = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from flowhigh_tpu.config import (DataConfig, FlowHighConfig,  # noqa: E402
                                 ModelConfig, TrainConfig)
from flowhigh_tpu.parallel import (initialize, make_global_mesh,  # noqa: E402
                                   shard_global_batch)
from flowhigh_tpu.train import (SyntheticAudioDataset, Trainer,  # noqa: E402
                                batch_iterator)


def main():
    pi, pc = initialize(f"localhost:{port}", 2, rank)
    assert (pi, pc) == (rank, 2), (pi, pc)
    assert jax.device_count() == 4 and len(jax.local_devices()) == 2

    # global mesh across both processes: dp4 x tp1
    mesh = make_global_mesh(n_data=4)
    assert dict(mesh.shape) == {"data": 4, "model": 1}

    import dataclasses
    cfg = FlowHighConfig().replace(
        model=ModelConfig(dim_in=32, dim=32, depth=1, heads=2, dim_head=8),
        mel=dataclasses.replace(FlowHighConfig().mel, n_mels=32, n_fft=256,
                                win_length=256, hop_length=120),
        train=TrainConfig(batch_size=4, num_warmup_steps=0, lr=1e-4))

    # disjoint per-process data shards of one GLOBAL batch draw
    ds = SyntheticAudioDataset(DataConfig(), n_items=8, seconds=0.05)
    it = batch_iterator(ds, 4, seed=7, num_workers=1,
                        process_index=pi, process_count=pc)
    local = next(it)
    it.close()
    assert local["wave"].shape[0] == 2  # 4 global / 2 processes

    tr = Trainer(cfg, mesh=mesh, cfm_method="independent_cfm_adaptive")
    state = tr.init_state(jax.random.PRNGKey(0))

    gbatch = shard_global_batch(
        mesh, {k: local[k] for k in ("wave", "cond", "lengths")})
    assert gbatch["wave"].shape[0] == 4  # global leading dim

    if tr._step_fn is None:
        tr._step_fn = tr._make_step()
    state, metrics = tr._step_fn(state, gbatch["wave"], gbatch["cond"],
                                 gbatch["lengths"])
    loss = float(metrics["loss"])  # replicated output: fetch is process-local
    assert np.isfinite(loss), loss

    # coordinated multihost orbax save (every process participates) +
    # torch-layout export on process 0 only
    folder = os.path.join(tmpdir, "ckpt")
    tr.results_folder = __import__("pathlib").Path(folder)
    tr.save(state)
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("post_save")
    assert os.path.isdir(os.path.join(folder, "orbax_1"))
    torch_export = os.path.join(folder, "FLowHigh.1.pt")
    assert os.path.exists(torch_export) == True  # written by proc 0, shared fs

    restored = tr.restore_state(os.path.join(folder, "orbax_1"), state)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(a.addressable_data(0))),
            np.asarray(jax.device_get(b.addressable_data(0))))
    assert int(restored.step) == 1

    # the loss is a cross-process psum product: both ranks must agree
    print(f"MP_OK rank={rank} loss={loss:.6f} step={int(restored.step)}",
          flush=True)


if __name__ == "__main__":
    main()
