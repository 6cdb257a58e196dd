"""Decompose the catalog-scale BPR SCAN epoch (319k items: ~4.1s —
1.53M examples/s vs the 40M/s VMEM-resident fused tier at ml-100k):
whole-epoch pairwise sampling tensors vs the grad+Adam scan, and
within the latter, value_and_grad alone vs the dense optax.adam
traversal.  Companion to bpr_sparse_probe.py (which showed the lazy
row-Adam tier LOSES here) — this names what actually dominates.

Usage: python benchmarks/bpr_catalog_profile.py [n_items]
Prints one JSON line with the component timings.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from benchmarks.bpr_sparse_probe import ensure_data, ROOT  # noqa: E402
from cleverrec_tpu import sampling  # noqa: E402
from cleverrec_tpu.config import Config  # noqa: E402
from cleverrec_tpu.utils.logging import enable_compilation_cache  # noqa: E402


def timed_param_chain(fn, params, *rest, n=3):
    """Time ``fn(params, *rest)`` (scalar-returning) with each call's
    params nudged by the previous call's output — memo-proof against
    the tunneled runtime's repeat-execution cache."""
    o = fn(params, *rest)
    jax.block_until_ready(o)
    p = params
    t0 = time.perf_counter()
    for _ in range(n):
        p = {**p, "P": p["P"] + o * 1e-12}
        o = fn(p, *rest)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / n * 1e3, o


def main():
    n_items = int(sys.argv[1]) if len(sys.argv) > 1 else 1048576
    enable_compilation_cache()
    from cleverrec_tpu.data import load_ranking_data
    from cleverrec_tpu.models import make_model
    from cleverrec_tpu.models.base import DataMeta
    from cleverrec_tpu.train import Trainer
    logging.basicConfig(level=logging.INFO, stream=sys.stdout,
                        format="%(message)s")
    name = ensure_data(n_items)
    cfg = Config({
        "recommender": "BPR", "model_type": "ranking",
        "data.root_dir": os.path.join(ROOT, "data"),
        "data.dataset": name, "data.file_name": "ratings.csv",
        "data.sep": ",", "data.format": "UIRT",
        "data.split_way": "rs", "data.split_ratio": "[0.8,0.0,0.2]",
        "data.split_by_time": "True",
        "data.user_min": "0", "data.item_min": "0",
        "test.neg_samples": "0", "test.batch_size": "1024",
        "topk": "[10]", "epoches": "2", "batch_size": "6144",
        "embed_size": "64", "reg": "0.01", "lr": "0.001",
        "neg_ratio": "4", "optimizer": "Adam", "is_pairwise": "True",
        "loss_func": "bpr", "init_method": "normal", "stddev": "0.01",
        "seed": "42", "train.max_epoch_block": "1",
    })
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

    def fresh(t):
        return jax.tree_util.tree_map(jnp.copy, t)

    # NOTE on the full-epoch wall figure: take it from
    # bpr_sparse_probe.py (train_epochs + host sync per epoch — 4121 ms
    # at 319k; reproduced across rounds in CATALOG_SCALE.jsonl).
    # In-process repeats of the whole-epoch program here read back
    # wildly wrong (1.7 ms same-inputs, ~308 ms params-chained) — the
    # tunneled runtime's repeat-execution cache; the component arms
    # below are stable and sum to the train_epochs figure.

    # -- whole-epoch sampling tensors alone ---------------------------
    @jax.jit
    def sample_only(key):
        batch = sampling.pairwise_epoch_tensors(
            key, arrays["pairwise_static"], arrays["seen"],
            tr.dd.item_nums, steps, b)
        return sum(jnp.sum(v).astype(jnp.float32)
                   for v in batch.values())

    # Distinct key per call (repeat-execution-cache hazard); the float
    # force-sum stays in range, so no output-dependent chaining needed.
    skeys = jax.random.split(jax.random.PRNGKey(9), 4)
    s0 = sample_only(skeys[0])
    jax.block_until_ready(s0)
    t0 = time.perf_counter()
    outs = [sample_only(skeys[1 + i]) for i in range(3)]
    jax.block_until_ready(outs)
    samp_ms = (time.perf_counter() - t0) / 3 * 1e3

    # -- grad+adam scan over a FIXED prebuilt batch -------------------
    pkey, _ = jax.random.split(key)
    batch_all = sampling.pairwise_epoch_tensors(
        pkey, arrays["pairwise_static"], arrays["seen"],
        tr.dd.item_nums, steps, b)
    fixed = jax.block_until_ready(
        {k: v[0] for k, v in batch_all.items()})

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

    grad_ms, _ = timed_param_chain(
        lambda p, o, bt: grad_only(fresh(dict(p)), fresh(tuple(o)), bt),
        params, opt, fixed)

    # -- value_and_grad alone (no optimizer) --------------------------
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

    vg_ms, _ = timed_param_chain(
        lambda p, bt: vg_only(fresh(dict(p)), bt), params, fixed)

    # -- value_and_grad with a CONCAT-gather loss form -----------------
    # BPR.loss gathers Q[i] and Q[j] separately, so autodiff emits TWO
    # dense [I, d] scatter buffers + an add; one gather of Q[cat(i, j)]
    # emits ONE.  Same math (gather/scatter is linear in the ids).
    from cleverrec_tpu.common import l2_loss, pairwise_loss

    def loss_concat(p, batch):
        w = batch["w"]
        ij = jnp.concatenate([batch["i"], batch["j"]])
        e = p["Q"][ij] * jnp.concatenate([w, w])[:, None]
        ie, je = e[:b], e[b:]
        ue = p["P"][batch["u"]] * w[:, None]
        diff = jnp.sum(ue * ie, axis=1) - jnp.sum(ue * je, axis=1)
        main = pairwise_loss(model.loss_func, diff, weight=w)
        return main + model.reg * (l2_loss(ue) + l2_loss(ie)
                                   + l2_loss(je))

    @jax.jit
    def vg_concat(params, batch):
        def step(carry, _):
            loss, grads = jax.value_and_grad(
                lambda p: loss_concat(p, batch))(carry)
            carry = jax.tree_util.tree_map(
                lambda p, g: p - 1e-9 * g, carry, grads)
            return carry, loss

        p, losses = jax.lax.scan(step, params, None, length=steps)
        return jnp.mean(losses)

    vgc_ms, _ = timed_param_chain(
        lambda p, bt: vg_concat(fresh(dict(p)), bt), params, fixed)

    rec = {"model": "BPR", "items": data.item_nums, "steps": steps,
           "batch": b,
           "sample_only_ms": round(samp_ms, 1),
           "grad_adam_fixedbatch_ms": round(grad_ms, 1),
           "grad_only_fixedbatch_ms": round(vg_ms, 1),
           "grad_only_concat_gather_ms": round(vgc_ms, 1)}
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
