"""Online-serving retrieval/rerank throughput on the real chip.

Trains BPR briefly on the reconstructed ml-1m (the flagship catalog),
builds the compiled serving closures (serving.py), and measures
MARGINAL per-call latency with the chained protocol this container's
tunneled chip requires (each call's user batch is derived from the
previous call's output, so a chain of N calls executes serially on
device; one D2H at the end; (t_N - t_1)/(N - 1) cancels dispatch).

Usage: python benchmarks/serving_bench.py [k] [epochs]
Appends JSON records to benchmarks/SERVING.jsonl.
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
                   "SERVING.jsonl")


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from benchmarks import ml1m_reconstruct
    from cleverrec_tpu import serving
    from cleverrec_tpu.data import load_ranking_data
    from cleverrec_tpu.models import make_model
    from cleverrec_tpu.models.base import DataMeta
    from cleverrec_tpu.train import Trainer

    if not os.path.exists(os.path.join(ROOT, "data", "ml-1m-recon",
                                       "ratings.csv")):
        ml1m_reconstruct.main()
    logging.basicConfig(level=logging.INFO, stream=sys.stdout,
                        format="%(message)s")
    cfg = Config({
        "recommender": "BPR", "model_type": "ranking",
        "data.root_dir": os.path.join(ROOT, "data"),
        "data.dataset": "ml-1m-recon", "data.file_name": "ratings.csv",
        "data.sep": ",", "data.format": "UIRT", "data.split_way": "loo",
        "data.split_by_time": "True", "data.user_min": "0",
        "data.item_min": "0", "test.neg_samples": "99",
        "test.batch_size": "1024", "test.interval": str(epochs),
        "topk": "[10]", "epoches": str(epochs), "batch_size": "6144",
        "embed_size": "64", "reg": "0.01", "lr": "0.001", "neg_ratio": "4",
        "optimizer": "Adam", "is_pairwise": "True", "loss_func": "bpr",
        "init_method": "normal", "stddev": "0.01", "seed": "42",
    })
    data = load_ranking_data(cfg)
    model = make_model(cfg, DataMeta(data.user_nums, data.item_nums))
    tr = Trainer(model, data, cfg, logger=logging.getLogger("serve"))
    params, opt = tr.init_state()
    params, opt, _ = tr.train_epochs(params, opt, epochs)

    un = data.user_nums

    def marginal(call, b, chain=64):
        """Chained marginal seconds/call: feed each call a user batch
        derived from the previous call's items."""
        u0 = jnp.arange(b, dtype=jnp.int32) % un

        def run(n):
            u = u0
            t0 = time.time()
            for _ in range(n):
                items, scores = call(u)
                u = (u + jnp.abs(items[:, 0])) % un
            np.asarray(u[:1])
            return time.time() - t0

        run(1)
        t1s, tns = [], []
        for _ in range(3):
            t1s.append(run(1))
            tns.append(run(chain))
        t1, tn = min(t1s), min(tns)
        if tn > t1:
            return (tn - t1) / (chain - 1)
        return max(tn / chain, 1e-9)

    for backend in ("fused", "dense", "stream"):
        for b in (256, 4096):
            fn = serving.build_retrieval_fn(
                model, params, tr.arrays, tr.dd, k=k, filter_seen=True,
                backend=backend)
            per = marginal(fn, b)
            rec = {"surface": "retrieval", "backend": backend,
                   "batch": b, "k": k, "dataset": "ml-1m-recon",
                   "items": data.item_nums,
                   "call_ms": round(per * 1e3, 3),
                   "users_per_s": round(b / per, 1)}
            with open(OUT, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(json.dumps(rec))

    # Rerank stage: 1000 external candidates per user.
    rk = serving.build_rerank_fn(model, params, tr.arrays, k=k)
    rng = np.random.default_rng(0)
    for b in (256, 4096):
        cand = jnp.asarray(rng.integers(0, data.item_nums, (b, 1000),
                                        dtype=np.int32))
        per = marginal(lambda u: rk(u, cand), b)
        rec = {"surface": "rerank", "backend": "dense", "batch": b,
               "k": k, "n_cand": 1000, "dataset": "ml-1m-recon",
               "call_ms": round(per * 1e3, 3),
               "users_per_s": round(b / per, 1)}
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
