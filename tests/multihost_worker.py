"""Worker for tests/test_multihost.py: one process of a 2-process x
4-virtual-device distributed run of the REAL shard_map train step.

Launched as a subprocess (env bootstrap sets 4 CPU devices + cpu platform
before jax import); writes its final params / loss trajectory to an npz the
test master compares against a single-process 8-device run on the
concatenated global batches.

argv: <pid> <nproc> <coordinator addr:port> <out.npz>
"""

import sys

import numpy as np

import jax


def local_batches(pid: int, n_steps: int, b_local: int, n: int):
    """Deterministic per-process batches; the master rebuilds these and
    concatenates process 0's and 1's rows into the global batch."""
    rng = np.random.default_rng(100 + pid)
    out = []
    for _ in range(n_steps):
        out.append(
            {
                "points": rng.uniform(0, 1.5, size=(b_local, n, 3)).astype(np.float32),
                "labels": rng.integers(0, 20, size=(b_local, n)).astype(np.int32),
                "weights": np.ones((b_local, n), np.float32),
            }
        )
    return out


def flat_params(state) -> np.ndarray:
    return np.concatenate(
        [np.asarray(x).ravel() for x in jax.tree_util.tree_leaves(state.params)]
    )


def main() -> None:
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    coordinator, out_path = sys.argv[3], sys.argv[4]

    from pointnet2_scannet_tpu import models
    from pointnet2_scannet_tpu.engine import train_state as ts
    from pointnet2_scannet_tpu.parallel import make_mesh, ProcessContext
    from pointnet2_scannet_tpu.parallel.distributed import initialize_distributed
    from pointnet2_scannet_tpu.parallel.step import make_shardmap_train_step

    ctx = initialize_distributed(coordinator, nproc, pid)
    assert ctx.num_processes == nproc and jax.device_count() == 8, (
        ctx,
        jax.device_count(),
    )

    mesh = make_mesh(8)
    model = models.get_model(
        num_classes=20, is_msg=False, input_channels=0, bn_axis_name="dp"
    )
    tx = ts.make_optimizer(ts.make_lr_schedule(1e-3, 100, 0.7, 10))
    state = ts.create_train_state(
        model, jax.random.key(0), np.zeros((1, 1024, 3), np.float32), tx
    )
    state = ctx.replicate(state, mesh)
    key = ctx.replicate(jax.random.key(1), mesh)

    step = make_shardmap_train_step(mesh, num_classes=20, donate=False)
    losses = []
    for batch in local_batches(pid, n_steps=3, b_local=4, n=1024):
        gbatch = ctx.place(batch, mesh)
        state, stats = step(state, gbatch, key)
        losses.append(float(np.asarray(stats["loss"])))

    # readback helpers round-trip (cheap: no model compile involved):
    # place -> local_rows is the identity on this process's rows, and
    # all_rows yields the process-order concatenation on BOTH processes
    probe = np.arange(8, dtype=np.float32).reshape(4, 2) + 100 * pid
    garr = ctx.place({"x": probe}, mesh)["x"]
    np.testing.assert_array_equal(ctx.local_rows(garr), probe)
    expected_all = np.concatenate(
        [np.arange(8, dtype=np.float32).reshape(4, 2) + 100 * q for q in range(nproc)]
    )
    np.testing.assert_array_equal(ctx.all_rows(garr), expected_all)

    # place_from_global (whole-scene path): every process holds the same
    # global rows; placement slices mine -> identical to direct place of the
    # concatenation
    garr2 = ctx.place_from_global({"x": expected_all}, mesh)["x"]
    np.testing.assert_array_equal(ctx.local_rows(garr2), probe)
    np.testing.assert_array_equal(ctx.all_rows(garr2), expected_all)

    # sharded real-data loading with collective global weights (argv[5] =
    # a directory of .npy scenes the test wrote): each process holds only
    # its shard but the weights must BIT-match the full streaming pass
    # (integer-valued float64 counts sum exactly in any order)
    if len(sys.argv) > 5:
        import pathlib

        from pointnet2_scannet_tpu.data.scene_store import SceneStore

        scene_dir = pathlib.Path(sys.argv[5])
        ids = sorted(p.stem for p in scene_dir.glob("*.npy"))
        sharded = SceneStore.from_npy_dir_sharded(
            ids, scene_dir, process_id=pid, num_processes=nproc, ctx=ctx
        )
        full = SceneStore.from_npy_dir(ids, scene_dir)
        assert len(sharded) == len(ids) // nproc
        np.testing.assert_array_equal(sharded.label_weights, full.label_weights)

    np.savez(out_path, losses=np.array(losses), params=flat_params(state))
    ctx.barrier("worker-done")
    print(f"[{pid}] ok losses={losses}", flush=True)


if __name__ == "__main__":
    main()
