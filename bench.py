#!/usr/bin/env python
"""Driver benchmark: BPR on ml-100k (loo, 99-neg eval) on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

- value: steady-state training examples/s/chip (pairwise rows consumed per
  second, compile excluded) for the reference BPR recipe (embed 128,
  batch 6144, neg_ratio 4 — conf/BPR.properties values).
- vs_baseline: ratio against the measured TF1-semantics baseline
  (benchmarks/BASELINE_MEASURED.json, produced by
  benchmarks/baseline_tf1.py on this container's CPU — the reference
  publishes no numbers of its own, see BASELINE.md).
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
from cleverrec_tpu.data import load_ranking_data  # noqa: E402
from cleverrec_tpu.models import make_model  # noqa: E402
from cleverrec_tpu.models.base import DataMeta  # noqa: E402
from cleverrec_tpu.train import Trainer  # noqa: E402

TIMED_EPOCHS = 3


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

    # Warmup (compiles ONLY the multi-epoch program + eval; the persistent
    # compilation cache makes repeat bench runs start fast).
    params, opt_state, _ = trainer.train_epochs(params, opt_state,
                                                TIMED_EPOCHS)
    trainer.evaluate(params)

    t0 = time.time()
    params, opt_state, _ = trainer.train_epochs(params, opt_state,
                                                TIMED_EPOCHS)
    train_dt = time.time() - t0
    examples = trainer._epoch_rows * TIMED_EPOCHS
    examples_per_s = examples / train_dt

    baseline = None
    bl_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "benchmarks", "BASELINE_MEASURED.json")
    if os.path.exists(bl_path):
        with open(bl_path) as f:
            baseline = json.load(f).get("train_examples_per_s")

    print(json.dumps({
        "metric": "train_examples_per_s_per_chip (BPR ml-100k loo)",
        "value": round(examples_per_s, 1),
        "unit": "examples/s",
        "vs_baseline": (round(examples_per_s / baseline, 2)
                        if baseline else None),
    }))


if __name__ == "__main__":
    main()
