"""A/B probe: BPR catalog-scale train epoch, scan (dense Adam) vs the
lazy row-Adam sparse-rows tier (round-5 extension of the rows tier to
the pairwise protocol — models/bpr.py fused_rows_spec).

Measured outcome (TPU v5e, 319k items x embed 64, batch 6144): the
sparse tier LOSES to scan (4635 vs 4121 ms/epoch) — BPR's whole-epoch
pairwise tensors already removed the sampling cost, and the dedup sort
+ row scatters outweigh the dense-Adam traversal they avoid — so the
tier is opt-in (train.sparse_rows_force) for the pairwise protocol,
default-on only for the rows protocols where it wins.
Usage: python benchmarks/bpr_sparse_probe.py [n_items]
(default 1048576 — the 319k-real-item catalog tier).
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
from benchmarks.catalog_scale import ensure_data, ROOT  # noqa: E402


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
    base = {
        "recommender": "BPR", "model_type": "ranking",
        "data.root_dir": os.path.join(ROOT, "data"),
        "data.dataset": name, "data.file_name": "ratings.csv",
        "data.sep": ",", "data.format": "UIRT",
        "data.split_way": "rs", "data.split_ratio": "[0.8,0.0,0.2]",
        "data.split_by_time": "True",
        "data.user_min": "0", "data.item_min": "0",
        "test.neg_samples": "0", "test.batch_size": "1024",
        "test.interval": "8", "topk": "[10]", "epoches": "2",
        "batch_size": "6144", "embed_size": "64", "reg": "0.01",
        "lr": "0.001", "neg_ratio": "4", "optimizer": "Adam",
        "is_pairwise": "True", "loss_func": "bpr",
        "init_method": "normal", "stddev": "0.01", "seed": "42",
        "train.max_epoch_block": "1",
    }
    data = load_ranking_data(Config(dict(base)))
    out = {}
    for arm, ov in (("scan", {}),
                    ("sparse_rows", {"train.sparse_rows_force": "True"})):
        cfg = Config({**base, **ov})
        model = make_model(cfg, DataMeta(data.user_nums, data.item_nums))
        tr = Trainer(model, data, cfg, logger=logging.getLogger(arm))
        assert bool(getattr(tr, "_sparse_tier", False)) == (
            arm == "sparse_rows"), arm
        params, opt = tr.init_state()
        params, opt, _ = tr.train_epochs(params, opt, 1)  # compile+warm
        ts = []
        for _ in range(3):
            t0 = time.time()
            params, opt, loss = tr.train_epochs(params, opt, 1)
            np.asarray(params["P"][:1])
            ts.append(time.time() - t0)
        out[arm] = {"epoch_ms": round(min(ts) * 1e3, 1),
                    "loss": float(np.asarray(loss).ravel()[-1])}
        print(f"{arm}: epoch {out[arm]['epoch_ms']}ms "
              f"loss {out[arm]['loss']:.4f}")
    rec = {"dataset": name, "items": data.item_nums,
           "pairs": int(tr.n_pairs), **{
               f"{a}_epoch_ms": v["epoch_ms"] for a, v in out.items()},
           **{f"{a}_loss": round(v["loss"], 4) for a, v in out.items()}}
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
