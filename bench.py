#!/usr/bin/env python
"""Driver benchmark: BPR on ml-100k (loo, 99-neg eval) on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

- value: steady-state training examples/s/chip (pairwise rows consumed per
  second) for the reference BPR recipe (embed 128, batch 6144, neg_ratio 4
  — conf/BPR.properties values), measured as the MARGINAL epoch cost of a
  multi-epoch device program (a 16-epoch call minus a 1-epoch call — both
  power-of-two counts, so each runs as ONE device program — so
  dispatch/transfer latency of this tunneled chip is excluded but every
  on-device cost — sampling, kernel, loss readback chain — is included).
- vs_baseline: ratio against the measured TF1-semantics baseline
  (benchmarks/BASELINE_MEASURED.json, produced by
  benchmarks/baseline_tf1.py on this container's CPU — the reference
  publishes no numbers of its own, see BASELINE.md).
- extra keys: eval_users_per_s (marginal chained one-call device eval),
  mxu_tflops/mxu_pct_peak (roofline accounting for the fused epoch
  kernel's one-hot matmul formulation: 4*B*(U_pad + 2*I_pad)*d flops per
  step), hbm_gb_per_s (table state + index traffic; LOW by design — the
  fused kernel keeps tables+Adam moments VMEM-resident, turning the
  gather-bound workload compute-bound).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cleverrec_tpu.config import Config  # noqa: E402
from cleverrec_tpu.utils.logging import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from cleverrec_tpu.data import load_ranking_data  # noqa: E402
from cleverrec_tpu.models import make_model  # noqa: E402
from cleverrec_tpu.models.base import DataMeta  # noqa: E402
from cleverrec_tpu.train import Trainer  # noqa: E402

# Peak specs by device kind (conservative defaults = v5e).
PEAKS = {"TPU v5e": (197e12, 819e9), "TPU v5 lite": (197e12, 819e9),
         "TPU v4": (275e12, 1228e9), "TPU v6e": (918e12, 1640e9)}


def main():
    cfg = Config({
        "recommender": "BPR", "model_type": "ranking",
        "data.root_dir": "/root/reference/dataset",
        "data.dataset": "ml-100k", "data.file_name": "u.data",
        "data.sep": "\t", "data.format": "UIRT", "data.split_way": "loo",
        "data.split_by_time": "True", "data.user_min": "0",
        "data.item_min": "0", "test.neg_samples": "99",
        "test.batch_size": "1024", "test.interval": "1", "topk": "[10,20]",
        "epoches": "5", "batch_size": "6144", "embed_size": "128",
        "reg": "0.01", "lr": "0.001", "neg_ratio": "4", "optimizer": "Adam",
        "is_pairwise": "True", "loss_func": "bpr", "init_method": "normal",
        "stddev": "0.01", "seed": "42",
    })
    data = load_ranking_data(cfg)
    model = make_model(cfg, DataMeta(data.user_nums, data.item_nums))
    trainer = Trainer(model, data, cfg)
    params, opt_state = trainer.init_state()

    # Warm both block sizes + eval.
    params, opt_state, _ = trainer.train_epochs(params, opt_state, 1)
    params, opt_state, _ = trainer.train_epochs(params, opt_state, 16)
    trainer.evaluate(params)

    # Marginal epoch cost: 16-epoch call minus 1-epoch call.  BOTH counts
    # are powers of two, so each train_epochs call runs as ONE device
    # program (train_epochs splits other counts into power-of-two blocks,
    # and every extra block adds a ~26ms dispatch+readback round-trip on
    # this tunneled backend — a 10-vs-1 protocol overstated the marginal
    # epoch by ~2.5ms).  float(loss) inside train_epochs is the real D2H
    # sync; it appears once in both calls and cancels in the difference.
    # Retry if tunnel noise makes the long call cheaper than the short.
    for _ in range(3):
        t0 = time.time()
        params, opt_state, _ = trainer.train_epochs(params, opt_state, 1)
        t_one = time.time() - t0
        t0 = time.time()
        params, opt_state, _ = trainer.train_epochs(params, opt_state, 16)
        t_big = time.time() - t0
        if t_big > t_one:
            break
    # Fallback when tunnel noise defeats all retries: the 16-epoch call
    # averaged per epoch (overstates by dispatch/16 — conservative).
    per_epoch = ((t_big - t_one) / 15 if t_big > t_one
                 else max(t_big / 16, 1e-9))
    examples_per_s = trainer._epoch_rows / per_epoch

    # Marginal eval cost: chained device evals (each consumes the previous
    # sums so execution is serialized), one real D2H at the end.
    ev = trainer.evaluator
    b = ev._batches
    acc = jnp.zeros((len(ev.topk), 3), jnp.float32)

    # The n-eval chain runs INSIDE one device program (lax.scan with the
    # params content chained through each result): one dispatch, so the
    # marginal is pure device time — immune to both the tunnel's RTT
    # jitter AND the experimental runtime's memoization of identical
    # executions (a host-side chain of same-args evals measured cache
    # hits: 1.2M-2.8M "users/s" swings; the 1e-12 nudge is numerically
    # invisible but makes every iteration's inputs distinct).
    import functools

    @functools.partial(jax.jit, static_argnames=("n",))
    def eval_chain(params, arrays, b, n):
        def body(p, _):
            r = ev._device_eval(p, arrays, b)
            return {**p, "P": p["P"] + r[0, 0] * 1e-12}, r
        _, rs = jax.lax.scan(body, params, None, length=n)
        return rs.sum(0)

    def run_evals(n):
        t0 = time.time()
        np.asarray(eval_chain(params, trainer.arrays, b, n))
        return time.time() - t0

    # This ~1ms program's wall time swings ~2x with device state, so
    # take the best of three 2-vs-62 marginals (the min is the
    # least-perturbed run — standard for microbenchmarks).
    run_evals(1)
    run_evals(2), run_evals(62)     # compile both chain lengths
    pairs = [(run_evals(2), run_evals(62)) for _ in range(3)]
    vals = [(t62 - t2) / 60 for t2, t62 in pairs if t62 > t2]
    eval_per = (min(vals) if vals
                else max(min(t62 for _, t62 in pairs) / 62, 1e-9))
    eval_users_per_s = len(trainer.dd.test_users) / eval_per

    # Roofline accounting for the fused epoch (one-hot matmul form):
    # per step 6 matmuls of [*, B] x [*, d] over U_pad + 2*I_pad rows.
    from cleverrec_tpu.ops.pallas_train import sentinel_dims
    u_pad, i_pad = sentinel_dims(data.user_nums, data.item_nums)
    steps = trainer.steps_per_epoch
    bsz = trainer.batch_size
    # 6 MXU matmuls per block: u gather+scatter (2 x 2*B*u_pad*d) and
    # i/j gathers+scatters (4 x 2*B*i_pad*d).
    flops_epoch = steps * 4 * bsz * (u_pad + 2 * i_pad) * cfg.int(
        "embed_size")
    tflops = flops_epoch / per_epoch / 1e12
    # Model-FLOPs MFU (the honest-algorithm form): BPR's per-example math
    # is two d-dim dot products (x_ui, x_uj) forward; fwd+bwd ~ 3x forward
    # for dot-product chains.  This counts NONE of the one-hot
    # gather/scatter matmul work the kernel formulation spends MXU on —
    # it is orders below mxu_pct_peak by construction, and that gap is
    # the price of casting sparse gathers as MXU matmuls.
    model_flops_epoch = steps * bsz * 3 * (2 * 2 * cfg.int("embed_size"))
    model_tflops = model_flops_epoch / per_epoch / 1e12
    # HBM traffic/epoch: tables+moments in and out + streamed indices.
    d = cfg.int("embed_size")
    state_bytes = 2 * 4 * d * (3 * u_pad + 3 * i_pad)
    idx_bytes = steps * bsz * 3 * 4
    hbm_gbs = (state_bytes + idx_bytes) / per_epoch / 1e9
    kind = jax.devices()[0].device_kind
    peak_flops, peak_hbm = next(
        (v for k, v in PEAKS.items() if k.lower() in kind.lower()),
        (197e12, 819e9))

    baseline = None
    bl_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "benchmarks", "BASELINE_MEASURED.json")
    if os.path.exists(bl_path):
        with open(bl_path) as f:
            bl = json.load(f)
            baseline = bl.get("train_examples_per_s")
            eval_baseline = bl.get("eval_users_per_s")

    print(json.dumps({
        "metric": "train_examples_per_s_per_chip (BPR ml-100k loo)",
        "value": round(examples_per_s, 1),
        "unit": "examples/s",
        "vs_baseline": (round(examples_per_s / baseline, 2)
                        if baseline else None),
        "epoch_ms": round(per_epoch * 1e3, 3),
        "eval_users_per_s": round(eval_users_per_s, 1),
        "eval_vs_baseline": (round(eval_users_per_s / eval_baseline, 1)
                             if eval_baseline else None),
        "mxu_tflops": round(tflops, 1),
        "mxu_pct_peak": round(100 * tflops * 1e12 / peak_flops, 1),
        "mxu_form": "one-hot gather/scatter matmul formulation (kernel "
                    "roofline, NOT algorithmic MFU)",
        "model_tflops": round(model_tflops, 3),
        "model_mfu_pct": round(100 * model_tflops * 1e12 / peak_flops, 3),
        "model_form": "algorithmic BPR FLOPs only (2 d-dots fwd, 3x for "
                      "fwd+bwd) — the honest MFU",
        "hbm_gb_per_s": round(hbm_gbs, 2),
        "hbm_pct_peak": round(100 * hbm_gbs * 1e9 / peak_hbm, 1),
        "device": kind,
    }))


if __name__ == "__main__":
    main()
