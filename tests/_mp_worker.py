"""Worker for tests/test_multiprocess.py: one rank of a 2-process CPU
data-parallel training run (``jax.distributed`` over localhost — the
TPU-native analog of the reference's Lightning DDP ranks)."""

import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    port, rank, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=rank)
    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    from unet_design_tpu.data import loader as loader_lib
    from unet_design_tpu.parallel import mesh as mesh_lib

    assert jax.process_count() == 2 and jax.device_count() == 2
    mesh = mesh_lib.make_mesh(data=2, model=1)

    rng = np.random.default_rng(0)
    X = rng.standard_normal((8, 4)).astype(np.float32)
    Y = rng.standard_normal((8, 1)).astype(np.float32)
    W = rng.standard_normal((4, 1)).astype(np.float32)

    # rank-sharded data exactly where the reference keys off dist.get_rank()
    # (shallowwater2d.py:68-87)
    idx = loader_lib.shard_for_process(list(range(len(X))))
    to_global = lambda a, spec: multihost_utils.host_local_array_to_global_array(
        a, mesh, spec)
    gx = to_global(X[idx], P("data"))
    gy = to_global(Y[idx], P("data"))
    w = to_global(W, P())   # replicated params

    @jax.jit
    def step(w, x, y):
        def loss_fn(w):
            return jnp.mean((x @ w - y) ** 2)
        loss, grad = jax.value_and_grad(loss_fn)(w)
        return loss, w - 0.1 * grad   # grad all-reduce inserted by GSPMD

    losses = []
    for _ in range(3):
        loss, w = step(w, gx, gy)
        losses.append(float(np.asarray(loss.addressable_data(0))))

    with open(out_path, "w") as f:
        json.dump({"rank": rank, "losses": losses,
                   "w": np.asarray(w.addressable_data(0)).ravel().tolist(),
                   "n_local": len(idx)}, f)


if __name__ == "__main__":
    main()
