"""Worker for the 2-process jax.distributed smoke test (run via
subprocess by tests/test_distributed.py, NOT collected by pytest).

Each process owns 4 virtual CPU devices; together they form the 8-device
('data' x 'model') mesh and run one REAL sharded BPR training step
(device-side sampling -> grads -> Adam) plus a cross-process psum check.
This is the dress rehearsal for `cleverrec-tpu --distributed` on a pod
(SURVEY.md section 2.4: DCN tier) — the first time the multi-process path
executes anywhere.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")


def main(process_id: int, coordinator: str) -> None:
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=2, process_id=process_id)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from __graft_entry__ import _toy_arrays, _toy_config
    from cleverrec_tpu.common import make_optimizer
    from cleverrec_tpu.models import make_model
    from cleverrec_tpu.models.base import DataMeta
    from cleverrec_tpu.parallel.sharding import (param_sharding_tree,
                                                 sharded_train_step)

    assert jax.process_count() == 2, jax.process_count()
    devs = np.array(jax.devices()).reshape(4, 2)
    mesh = Mesh(devs, ("data", "model"))

    cfg = _toy_config()
    arrays, n_users, n_items = _toy_arrays()
    model = make_model(cfg, DataMeta(n_users, n_items))
    optimizer = make_optimizer(cfg.optimizer, cfg.lr)

    # Params/opt-state are created INSIDE jit with explicit global output
    # shardings (the multi-process-safe way to materialize global arrays).
    template = jax.eval_shape(model.init, jax.random.PRNGKey(0))
    shardings = param_sharding_tree(template, model.meta, mesh)

    params = jax.jit(model.init, out_shardings=shardings)(
        jax.random.PRNGKey(0))
    opt_state = jax.jit(optimizer.init)(params)

    step = sharded_train_step(model, optimizer, mesh, n_items,
                              cfg.neg_ratio)
    b = cfg.batch_size
    rows = jnp.arange(b, dtype=jnp.int32)
    valid = jnp.ones((b,), jnp.float32)
    params, opt_state, loss = step(params, opt_state, jax.random.PRNGKey(1),
                                   arrays, rows, valid)
    loss = float(loss)
    assert np.isfinite(loss), loss

    # Explicit cross-process collective: psum over the whole mesh.
    total = float(jax.jit(
        jnp.sum, out_shardings=NamedSharding(mesh, P()))(
            jax.jit(lambda: jnp.ones((8, 4)),
                    out_shardings=NamedSharding(mesh, P("data")))()))
    assert total == 32.0, total
    print(f"DIST_OK process={process_id} loss={loss:.6f}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), sys.argv[2])
