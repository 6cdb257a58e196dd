"""Grouped fused epoch on a many-users / small-catalog workload.

The grouped path's claimed win scenario (PARITY.md): the user table alone
overflows VMEM, but the catalog is small, so the per-pair one-hot matmul
cost stays low while the scan path pays its ~8ns/element gathers.  This
benchmark builds a synthetic retail-shaped dataset (~98k users x 2k
items, ~20 ratings/user), measures marginal epoch cost for the scan path
vs the grouped fused path (train.fused_groups forced), and appends a
JSON record to GROUPED_SCALE.jsonl.

Also answers an open planner question: whether XLA scoped-vmem pins the
FULL sliced P/moment buffers (75MB here — far beyond any VMEM) next to
the kernel, or spills them to HBM.  plan_fused_grouped conservatively
charges them against a 15.5MB ceiling measured at ml-1m scale; if this
run compiles, that charge is wrong for large tables.

Usage: python benchmarks/grouped_scale.py [n_users] [n_items] [groups] [arm]
(arm: scan | grouped | both — split arms across invocations when cold
remote compiles exceed one run's time budget; records merge by key.)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cleverrec_tpu.config import Config  # noqa: E402
from cleverrec_tpu.utils.logging import enable_compilation_cache  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(ROOT, "data")
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "GROUPED_SCALE.jsonl")


def ensure_data(n_users: int, n_items: int, per_user: int = 20) -> str:
    name = f"grouped-synth-{n_users}x{n_items}"
    path = os.path.join(DATA, name, "ratings.csv")
    if os.path.exists(path):
        return name
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.default_rng(7)
    # Zipf-ish item popularity; fixed ratings/user keeps pair mass
    # uniform across user-id groups.
    pop = 1.0 / np.arange(1, n_items + 1) ** 0.8
    pop /= pop.sum()
    rows = []
    items_all = rng.choice(n_items, size=(n_users, per_user * 2), p=pop)
    ts = rng.integers(1e8, 2e8, size=(n_users, per_user))
    with open(path, "w") as f:
        for u in range(n_users):
            seen = np.unique(items_all[u])[:per_user]
            for k, it in enumerate(seen):
                f.write(f"{u},{it},5,{ts[u, k]}\n")
    del rows
    return name


def build_trainer(name: str, fused_groups: int, n_items: int = 2048,
                  model_name: str = "BPR"):
    from cleverrec_tpu.data import load_ranking_data
    from cleverrec_tpu.models import make_model
    from cleverrec_tpu.models.base import DataMeta
    from cleverrec_tpu.train import Trainer
    overrides = {"CML": {"loss_func": "hinge", "margin": "1.0",
                         "reg": "0.1", "lr": "0.05", "neg_ratio": "10"}
                 }.get(model_name, {})
    cfg = Config({
        "recommender": model_name, "model_type": "ranking",
        "data.root_dir": DATA, "data.dataset": name,
        "data.file_name": "ratings.csv", "data.sep": ",",
        "data.format": "UIRT", "data.split_way": "loo",
        "data.split_by_time": "True", "data.user_min": "0",
        "data.item_min": "0",
        # Full-catalog eval mode: candidate sampling is a per-user host
        # loop (irrelevant here — this benchmark only times training).
        "test.neg_samples": "0",
        "embed_size": "64", "epoches": "2", "batch_size": "6144",
        "reg": "0.01", "lr": "0.001", "neg_ratio": "4",
        "optimizer": "Adam", "is_pairwise": "True", "loss_func": "bpr",
        "init_method": "normal", "stddev": "0.01", "seed": "42",
        "topk": "[10]",
        "train.fused_kernel": str(fused_groups > 0),
        "train.fused_groups": str(fused_groups),
        **overrides,
    })
    data = load_ranking_data(cfg)
    model = make_model(cfg, DataMeta(data.user_nums, data.item_nums))
    return Trainer(model, data, cfg), data


def marginal_epoch_s(tr, chain: int = 8) -> float:
    import jax.numpy as jnp  # noqa: F401
    p, o = tr.init_state()
    p, o, _ = tr.train_epochs(p, o, 1)
    p, o, _ = tr.train_epochs(p, o, chain)
    np.asarray(p["P"][:1])
    for _ in range(3):
        t0 = time.time()
        p, o, _ = tr.train_epochs(p, o, 1)
        np.asarray(p["P"][:1])
        t1 = time.time() - t0
        t0 = time.time()
        p, o, _ = tr.train_epochs(p, o, chain)
        np.asarray(p["P"][:1])
        tn = time.time() - t0
        if tn > t1:
            return (tn - t1) / (chain - 1)
    return max(tn / chain, 1e-9)


def main():
    enable_compilation_cache()
    n_users = int(sys.argv[1]) if len(sys.argv) > 1 else 98304
    n_items = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    groups = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    arm = sys.argv[4] if len(sys.argv) > 4 else "both"
    model_name = sys.argv[5] if len(sys.argv) > 5 else "BPR"
    name = ensure_data(n_users, n_items)

    rec = {"dataset": name, "model": model_name, "n_users": n_users,
           "n_items": n_items, "embed_size": 64, "batch_size": 6144,
           "groups": groups}
    arms = {"scan": (("scan", 0),), "grouped": (("grouped_fused", groups),),
            "both": (("scan", 0), ("grouped_fused", groups))}[arm]
    for tag, g in arms:
        t0 = time.time()
        tr, data = build_trainer(name, g, n_items, model_name)
        if g:
            assert tr._fused_grouped_plan is not None, "grouped not planned"
            rec["plan"] = list(tr._fused_grouped_plan)
        per = marginal_epoch_s(tr)
        rec[f"{tag}_epoch_ms"] = round(per * 1000, 2)
        rec[f"{tag}_examples_per_s"] = round(tr._epoch_rows / per, 1)
        rec[f"{tag}_total_s"] = round(time.time() - t0, 1)
        print(tag, rec[f"{tag}_epoch_ms"], "ms",
              rec[f"{tag}_examples_per_s"], "ex/s", flush=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
