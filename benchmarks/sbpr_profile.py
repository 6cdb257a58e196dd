"""Decompose SBPR's Epinions-scale scan epoch (round-3 verdict item 3):
where do the ~329ms go — per-step sampling (sbpr_batch: social-positive
CSR draw + union-complement negative draw) or grad+Adam?

Usage: python benchmarks/sbpr_profile.py
Prints one JSON line with the component timings.
"""

from __future__ import annotations

import functools
import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from benchmarks.epinions_runs import base_cfg  # noqa: E402
from cleverrec_tpu import sampling  # noqa: E402
from cleverrec_tpu.utils.logging import enable_compilation_cache  # noqa: E402


def timed(fn, *a, n=3):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3, out


def main():
    enable_compilation_cache()
    from cleverrec_tpu.data import load_ranking_data
    from cleverrec_tpu.models import make_model
    from cleverrec_tpu.models.base import DataMeta
    from cleverrec_tpu.train import Trainer
    logging.basicConfig(level=logging.INFO, stream=sys.stdout,
                        format="%(message)s")
    cfg = base_cfg("SBPR", 1)
    cfg._v["train.fused_kernel"] = "False"
    t0 = time.time()
    data = load_ranking_data(cfg)
    model = make_model(cfg, DataMeta(data.user_nums, data.item_nums))
    tr = Trainer(model, data, cfg, logger=logging.getLogger("prof"))
    print(f"setup {time.time() - t0:.1f}s; steps/epoch="
          f"{tr.steps_per_epoch}, batch={tr.batch_size}")
    params, opt = tr.init_state()
    key = jax.random.PRNGKey(0)
    arrays = tr.arrays
    steps, b = tr.steps_per_epoch, tr.batch_size
    rows_total = tr._epoch_rows
    padded = steps * b

    # -- full epoch --------------------------------------------------
    # The trainer jits the epoch fn with donate_argnums=(0,1): copy the
    # param/opt LEAVES per call (dict()/tuple() copy only containers),
    # or call 2+ would read donated-away buffers.
    def fresh(t):
        return jax.tree_util.tree_map(jnp.copy, t)

    epoch = tr._build_epoch_fn(register_body=False)
    full_ms, _ = timed(lambda: epoch(fresh(dict(params)),
                                     fresh(tuple(opt)), key, arrays)[2])

    # -- sampling-only scan ------------------------------------------
    @jax.jit
    def sample_only(key, arrays):
        pkey, skey = jax.random.split(key)
        step_keys = jax.random.split(skey, steps)
        perm, valid = sampling.epoch_permutation(pkey, rows_total, padded)
        xs = ((perm.reshape(steps, b), valid.reshape(steps, b)), step_keys)

        def step(carry, xs):
            (rows, w), k = xs
            sk, _ = jax.random.split(k)
            batch = tr._build_batch(sk, rows, w, arrays)
            # Force EVERY batch output (float entries included) so XLA
            # can't dead-code-eliminate part of the sampling work.
            s = sum(jnp.sum(v).astype(jnp.float32)
                    for kk, v in batch.items() if kk != "dropout_key")
            return carry + s, None

        tot, _ = jax.lax.scan(step, jnp.float32(0), xs)
        return tot

    samp_ms, _ = timed(lambda: sample_only(key, arrays))

    # -- permutation-only (epoch shuffle) ----------------------------
    perm_ms, _ = timed(jax.jit(
        lambda k: sampling.epoch_permutation(k, rows_total, padded)[0]),
        key)

    # -- grad+adam-only scan (fixed batch) ---------------------------
    pkey, _ = jax.random.split(key)
    perm, valid = sampling.epoch_permutation(pkey, rows_total, padded)
    fixed = tr._build_batch(jax.random.PRNGKey(1), perm[:b], valid[:b],
                            arrays)
    fixed = {k: v for k, v in fixed.items()}
    fixed["dropout_key"] = jax.random.PRNGKey(2)
    fixed = jax.block_until_ready(fixed)

    @jax.jit
    def grad_only(params, opt_state, batch):
        def step(carry, _):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(
                lambda p: model.loss(p, batch, arrays))(params)
            updates, opt_state = tr.optimizer.update(grads, opt_state,
                                                     params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), None, length=steps)
        return jnp.mean(losses)

    grad_ms, _ = timed(lambda: grad_only(fresh(dict(params)),
                                         fresh(tuple(opt)), fixed))

    # -- grad-only, no optimizer (value_and_grad alone) ---------------
    @jax.jit
    def vg_only(params, batch):
        def step(carry, _):
            loss, grads = jax.value_and_grad(
                lambda p: model.loss(p, batch, arrays))(carry)
            carry = jax.tree_util.tree_map(
                lambda p, g: p - 1e-9 * g, carry, grads)
            return carry, loss

        p, losses = jax.lax.scan(step, params, None, length=steps)
        return jnp.mean(losses)

    vg_ms, _ = timed(lambda: vg_only(fresh(dict(params)), fixed))

    rec = {"model": "SBPR", "steps": steps, "batch": b,
           "full_epoch_ms": round(full_ms, 1),
           "sample_only_ms": round(samp_ms, 1),
           "perm_only_ms": round(perm_ms, 1),
           "grad_adam_fixedbatch_ms": round(grad_ms, 1),
           "grad_only_fixedbatch_ms": round(vg_ms, 1)}
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
