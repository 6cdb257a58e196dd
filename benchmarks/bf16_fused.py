"""bf16 table storage demo at a shape the f32 resident plan rejects
(round-3 verdict item 4): BPR ml-100k @ embed 256 — f32 runs the
GROUPED overflow tier today; train.fused_bf16 keeps it VMEM-resident
(state + one-hots bf16, f32 arithmetic).

Arms (both 30 epochs, loo/99-negative, eval every epoch):
  f32  : train.fused_kernel=True (auto -> grouped tier)
  bf16 : + train.fused_bf16=True (resident tier)

Records marginal epoch time + best metrics per arm to
FUSED_FAMILY.jsonl ("embed_size": 256, "tier", "bf16" fields) — the
metric delta doubles as the bf16 parity row.

Usage: python benchmarks/bf16_fused.py [epochs]
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

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "FUSED_FAMILY.jsonl")


def build(bf16: bool, epochs: int):
    from cleverrec_tpu.data import load_ranking_data
    from cleverrec_tpu.models import make_model
    from cleverrec_tpu.models.base import DataMeta
    from cleverrec_tpu.train import Trainer
    cfg = Config({
        "recommender": "BPR", "model_type": "ranking",
        "data.root_dir": "/root/reference/dataset",
        "data.dataset": "ml-100k", "data.file_name": "u.data",
        "data.sep": "\t", "data.format": "UIRT", "data.split_way": "loo",
        "data.split_by_time": "True", "data.user_min": "0",
        "data.item_min": "0", "test.neg_samples": "99",
        "test.batch_size": "1024", "test.interval": "1", "topk": "[10]",
        "embed_size": "256", "epoches": str(epochs), "batch_size": "6144",
        "reg": "0.01", "lr": "0.001", "neg_ratio": "4",
        "optimizer": "Adam", "is_pairwise": "True", "loss_func": "bpr",
        "init_method": "normal", "stddev": "0.01", "seed": "42",
        "train.fused_kernel": "True",
        "train.fused_bf16": str(bf16),
    })
    data = load_ranking_data(cfg)
    model = make_model(cfg, DataMeta(data.user_nums, data.item_nums))
    return Trainer(model, data, cfg, logger=logging.getLogger("bf16"))


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    enable_compilation_cache()
    logging.basicConfig(level=logging.INFO, stream=sys.stdout,
                        format="%(message)s")
    for bf16 in (False, True):
        tr = build(bf16, epochs)
        tier = ("resident" if tr._fused_plan is not None else
                "grouped" if tr._fused_grouped_plan is not None else
                "scan")
        t0 = time.time()
        best = tr.run()
        wall = time.time() - t0
        p, o = tr.params, tr.opt_state
        # Warm BOTH program shapes (1-epoch and 8-epoch scans compile
        # separately) before timing — an earlier version warmed only
        # the 1-epoch shape and timed the 8-epoch compile as epochs.
        p, o, _ = tr.train_epochs(p, o, 1)
        p, o, _ = tr.train_epochs(p, o, 8)
        t0 = time.time()
        p, o, _ = tr.train_epochs(p, o, 1)
        t1 = time.time() - t0
        t0 = time.time()
        p, o, _ = tr.train_epochs(p, o, 8)
        t8 = time.time() - t0
        per_epoch = max((t8 - t1) / 7, 1e-9)
        rec = {
            "model": "BPR", "dataset": "ml-100k", "embed_size": 256,
            "batch_size": 6144, "bf16": bf16, "tier": tier,
            "epoch_ms": round(per_epoch * 1e3, 2),
            "examples_per_s": round(tr._epoch_rows / per_epoch, 1),
            "best_epoch": best["epoch"],
            "metrics": {str(k): list(v) for k, v in best["metrics"].items()},
            "wall_s": round(wall, 1),
        }
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
