"""Item-CATALOG-axis scaling (SURVEY.md section 5.7's "long axis"):
train + full-catalog eval + streaming retrieval at catalogs far past
the bitmap/complement budgets, where the dense [B, I] paths stop being
an option.

Synthetic zipf-popularity interactions over U=49,152 users; catalog
sizes from argv (default 131072 and 1048576 items).  Records marginal
train epoch, full-catalog eval users/s (streaming evaluator), and
streaming-retrieval serving QPS to benchmarks/CATALOG_SCALE.jsonl.

Usage: python benchmarks/catalog_scale.py [n_items ...]
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cleverrec_tpu.config import Config  # noqa: E402
from cleverrec_tpu.utils.logging import enable_compilation_cache  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "CATALOG_SCALE.jsonl")
N_USERS = 49152
PER_USER = 40


def ensure_data(n_items: int) -> str:
    name = f"catalog-{n_items}"
    path = os.path.join(ROOT, "data", name)
    if os.path.exists(os.path.join(path, "ratings.csv")):
        return name
    os.makedirs(path, exist_ok=True)
    rng = np.random.default_rng(7)
    # Zipf-ish popularity over the catalog head; every user also gets a
    # couple of uniform tail items so the tail is reachable.
    rows = []
    n_head = N_USERS * (PER_USER - 2)
    head = (rng.pareto(1.2, n_head) * n_items / 50).astype(np.int64)
    head = np.clip(head, 0, n_items - 1)
    tail = rng.integers(0, n_items, N_USERS * 2)
    items = np.concatenate([head, tail])
    users = np.concatenate([
        np.repeat(np.arange(N_USERS), PER_USER - 2),
        np.repeat(np.arange(N_USERS), 2)])
    t = rng.integers(1_000_000, 2_000_000, items.shape[0])
    order = rng.permutation(items.shape[0])
    with open(os.path.join(path, "ratings.csv"), "w") as f:
        f.write("u,i,r,t\n")
        for idx in order:
            f.write(f"{users[idx]},{items[idx]},5,{t[idx]}\n")
    return name


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [131072, 1048576]
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from cleverrec_tpu import serving
    from cleverrec_tpu.data import load_ranking_data
    from cleverrec_tpu.models import make_model
    from cleverrec_tpu.models.base import DataMeta
    from cleverrec_tpu.train import Trainer

    logging.basicConfig(level=logging.INFO, stream=sys.stdout,
                        format="%(message)s")
    for n_items in sizes:
        name = ensure_data(n_items)
        cfg = Config({
            "recommender": "BPR", "model_type": "ranking",
            "data.root_dir": os.path.join(ROOT, "data"),
            "data.dataset": name, "data.file_name": "ratings.csv",
            "data.sep": ",", "data.format": "UIRT",
            # rs split + neg_samples=0: the FULL-CATALOG eval protocol
            # (loo always builds candidate lists, reference semantics).
            "data.split_way": "rs", "data.split_ratio": "[0.8,0.0,0.2]",
            "data.split_by_time": "True",
            "data.user_min": "0", "data.item_min": "0",
            "test.neg_samples": "0", "test.batch_size": "1024",
            "test.interval": "8", "topk": "[10]", "epoches": "2",
            "batch_size": "6144", "embed_size": "64", "reg": "0.01",
            "lr": "0.001", "neg_ratio": "4", "optimizer": "Adam",
            "is_pairwise": "True", "loss_func": "bpr",
            "init_method": "normal", "stddev": "0.01", "seed": "42",
            # Eval mode is AUTO: the fused kernel covers catalogs past
            # the global bitmap budget too (device-built per-batch
            # bitmaps + grouped exact top-k); streaming only starts at
            # the default 500k-item score-matrix budget.
            # Multi-epoch scanned programs fault the tunneled TPU worker
            # at this catalog scale (single-epoch programs run fine);
            # cap blocks to 1 — dispatch (~26ms) is noise against these
            # multi-second epochs anyway.
            "train.max_epoch_block": "1",
        })
        t0 = time.time()
        data = load_ranking_data(cfg)
        model = make_model(cfg, DataMeta(data.user_nums, data.item_nums))
        tr = Trainer(model, data, cfg, logger=logging.getLogger("cat"))
        setup_s = time.time() - t0
        params, opt = tr.init_state()

        # Per-epoch wall from single-epoch calls: these epochs run for
        # seconds, so the ~26ms dispatch round-trip is noise and the
        # power-of-two marginal protocol is unnecessary.
        params, opt, _ = tr.train_epochs(params, opt, 1)
        t1s = []
        for _ in range(3):
            t0 = time.time()
            params, opt, _ = tr.train_epochs(params, opt, 1)
            np.asarray(params["P"][:1])
            t1s.append(time.time() - t0)
        per_epoch = min(t1s)

        # Marginal full-catalog STREAMING eval (chained device evals).
        ev = tr.evaluator
        b = ev._batches
        acc = jnp.zeros((len(ev.topk), 3), jnp.float32)

        def run_evals(n):
            a = acc
            p = params
            t0 = time.time()
            for _ in range(n):
                r = ev._eval_fn(p, tr.arrays, b)
                a = a + r
                # Distinct inputs per call — the runtime memoizes
                # identical executions (see bench.py run_evals).
                p = {**p, "P": p["P"] + r[0, 0] * 1e-12}
            np.asarray(a)
            return time.time() - t0

        run_evals(1)
        e1s, ens = [], []
        for _ in range(3):
            e1s.append(run_evals(1))
            ens.append(run_evals(4))
        eval_per = max((min(ens) - min(e1s)) / 3, 1e-9)
        n_test = len(tr.dd.test_users)

        # Streaming retrieval QPS (serving surface): exact top-k (full
        # sorts per chunk) and ScaNN-style approx_max_k selection.
        bq = 4096
        u0 = jnp.arange(bq, dtype=jnp.int32) % data.user_nums

        def serve_marginal(fn):
            def run(n):
                u = u0
                t0 = time.time()
                for _ in range(n):
                    items, _ = fn(u)
                    u = (u + jnp.abs(items[:, 0])) % data.user_nums
                np.asarray(u[:1])
                return time.time() - t0

            run(1)
            s1s, sns = [], []
            for _ in range(3):
                s1s.append(run(1))
                sns.append(run(32))
            return max((min(sns) - min(s1s)) / 31, 1e-9)

        serve_per = serve_marginal(serving.build_retrieval_fn(
            model, params, tr.arrays, tr.dd, k=10, backend="stream"))
        serve_approx_per = serve_marginal(serving.build_retrieval_fn(
            model, params, tr.arrays, tr.dd, k=10, backend="stream",
            approx=True))
        # Fused-kernel serving (the dense [B, I_pad] score matrix is
        # B*I_pad*4 bytes per call — 5.2GB at bq=4096 x 320k, in HBM).
        serve_fused_per = serve_marginal(serving.build_retrieval_fn(
            model, params, tr.arrays, tr.dd, k=10, backend="fused"))
        # Approx fused serving: bf16 rescue-slab copy (candidate scores
        # round to bf16; ~90% top-20 id agreement) halves the dominant
        # slab gather of the comb-pruned path.
        serve_fused_approx_per = serve_marginal(serving.build_retrieval_fn(
            model, params, tr.arrays, tr.dd, k=10, backend="fused",
            approx=True))

        rec = {"dataset": name, "users": data.user_nums,
               "items": data.item_nums, "pairs": int(tr.n_pairs),
               "setup_s": round(setup_s, 1), "eval_mode": ev.mode,
               "epoch_ms": round(per_epoch * 1e3, 1),
               "train_examples_per_s": round(tr._epoch_rows / per_epoch, 1),
               "eval_users_per_s": round(n_test / eval_per, 1),
               "serve_stream_users_per_s": round(bq / serve_per, 1),
               "serve_stream_approx_users_per_s":
                   round(bq / serve_approx_per, 1),
               "serve_fused_users_per_s": round(bq / serve_fused_per, 1),
               "serve_fused_approx_users_per_s":
                   round(bq / serve_fused_approx_per, 1)}
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
