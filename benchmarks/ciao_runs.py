"""Social models on the REAL Ciao data (7.3k users, 11.2k items, 149k
ratings + 112k trust edges — the one bundled social dataset whose
ratings survived upstream; Epinions ratings are synthetic).  Same
recipe/fields as benchmarks/epinions_runs.py; appends to
benchmarks/CIAO_RUNS.jsonl.

Usage: python benchmarks/ciao_runs.py SBPR|TBPR|SAMN [epochs]
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cleverrec_tpu.config import Config  # noqa: E402
from cleverrec_tpu.utils.logging import enable_compilation_cache  # noqa: E402

from benchmarks.epinions_runs import MODEL_OVERRIDES as _EPI_OV  # noqa: E402

MODEL_OVERRIDES = {
    **_EPI_OV,
    # Latent-friend social triple (deep walks + in-repo JAX SGNS +
    # cosine top-K) on the real Ciao graph.
    "CUNE_BPR": {"loss_func": "bpr", "reg": "0.01", "embed_size": "64",
                 "lr": "0.001", "neg_ratio": "4", "walk_count": "5",
                 "walk_length": "10", "walk_dim": "32",
                 "window_size": "3", "topk_f": "10"},
}

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "CIAO_RUNS.jsonl")


def base_cfg(name, epochs):
    return Config({
        "recommender": name, "model_type": "ranking",
        "data.root_dir": "/root/reference/dataset",
        "data.dataset": "Ciao", "data.file_name": "ratings.csv",
        "data.sep": ",", "data.format": "UIR", "data.split_way": "loo",
        "data.split_by_time": "False", "data.user_min": "5",
        "data.item_min": "5", "social_file": "trusts.csv",
        "test.neg_samples": "99", "test.batch_size": "1024",
        "test.interval": "1", "topk": "[10,20]", "epoches": str(epochs),
        "batch_size": "6144", "optimizer": "Adam",
        "is_pairwise": "True", "init_method": "normal", "stddev": "0.01",
        "seed": "42", **MODEL_OVERRIDES[name],
    })


def main():
    name = sys.argv[1]
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    enable_compilation_cache()
    from cleverrec_tpu.data import load_ranking_data
    from cleverrec_tpu.models import make_model
    from cleverrec_tpu.models.base import DataMeta
    from cleverrec_tpu.train import Trainer
    logging.basicConfig(level=logging.INFO, stream=sys.stdout,
                        format="%(message)s")
    cfg = base_cfg(name, epochs)
    t0 = time.time()
    data = load_ranking_data(cfg)
    model = make_model(cfg, DataMeta(data.user_nums, data.item_nums))
    tr = Trainer(model, data, cfg, logger=logging.getLogger("ciao"))
    setup_s = time.time() - t0
    t0 = time.time()
    best = tr.run()
    wall = time.time() - t0
    p, o = tr.params, tr.opt_state
    p, o, _ = tr.train_epochs(p, o, 1)
    p, o, _ = tr.train_epochs(p, o, 8)
    per_epoch = None
    for _ in range(3):
        t0 = time.time()
        p, o, _ = tr.train_epochs(p, o, 1)
        t1 = time.time() - t0
        t0 = time.time()
        p, o, _ = tr.train_epochs(p, o, 8)
        t8 = time.time() - t0
        if t8 > t1:
            m = (t8 - t1) / 7
            per_epoch = m if per_epoch is None else min(per_epoch, m)
    per_epoch = per_epoch or 1e-9
    tier = ("fused" if getattr(tr, "_fused_plan", None) is not None
            else "sparse_rows" if getattr(tr, "_sparse_tier", False)
            else "scan")
    rec = {
        "model": name, "dataset": "Ciao", "tier": tier,
        "users": data.user_nums, "items": data.item_nums,
        "epochs": epochs, "best_epoch": best["epoch"],
        "metrics": {str(k): list(v) for k, v in best["metrics"].items()},
        "setup_s": round(setup_s, 1), "wall_s": round(wall, 1),
        "epoch_ms": round(per_epoch * 1e3, 1),
        "examples_per_s": round(tr._epoch_rows / per_epoch, 1),
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec, indent=2))


if __name__ == "__main__":
    main()
