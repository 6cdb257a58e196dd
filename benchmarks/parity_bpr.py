"""Metric parity: TF1-semantics BPR vs cleverrec-tpu BPR, same recipe.

The north-star check (BASELINE.md): HR@10 / NDCG@10 on ml-100k
(loo, 99-negative candidates) must agree within run-to-run variance.
Both sides share OUR data pipeline and metric formulas (which reproduce
the reference's formulas exactly — tests/test_metrics.py), so any gap
isolates to the training math.

Writes benchmarks/PARITY_BPR.json and prints a summary table.

Run:  python benchmarks/parity_bpr.py [epochs]
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

enable_compilation_cache()
from cleverrec_tpu.data import load_ranking_data  # noqa: E402
from cleverrec_tpu.metrics import pad_lists, ranking_metrics_topks  # noqa: E402

EMBED = 64
BATCH = 6144
NEG_RATIO = 4
LR = 0.001
REG = 0.01
TOPKS = (10, 20)


def _config(epochs):
    return Config({
        "recommender": "BPR", "data.root_dir": "/root/reference/dataset",
        "data.dataset": "ml-100k", "data.file_name": "u.data",
        "data.sep": "\t", "data.format": "UIRT", "data.split_way": "loo",
        "data.split_by_time": "True", "data.user_min": "0",
        "data.item_min": "0", "test.neg_samples": "99",
        "test.batch_size": "1024", "test.interval": "1", "topk": "[10,20]",
        "epoches": str(epochs), "batch_size": str(BATCH),
        "embed_size": str(EMBED), "reg": str(REG), "lr": str(LR),
        "neg_ratio": str(NEG_RATIO), "optimizer": "Adam",
        "is_pairwise": "True", "loss_func": "bpr", "init_method": "normal",
        "stddev": "0.01", "seed": "42",
    })


def eval_tf1(sess, pair_scores, u_ph, i_ph, data):
    """Reference candidate-protocol eval on the TF1 model's scores."""
    users = list(data.ui_test.keys())
    recs, reals = [], []
    for s in range(0, len(users), 1024):
        cur = users[s: s + 1024]
        uu, ii, counts = [], [], []
        for u in cur:
            cand = data.ui_test[u]
            uu.extend([u] * len(cand))
            ii.extend(cand)
            counts.append(len(cand))
        scores = sess.run(pair_scores, {u_ph: uu, i_ph: ii})
        ofs = 0
        for u, c in zip(cur, counts):
            sc = scores[ofs: ofs + c]
            cand = data.ui_test[u]
            order = np.argsort(-sc)[: max(TOPKS)]
            recs.append([cand[a] for a in order])
            reals.append(cand[data.neg_samples:])
            ofs += c
    per_k = ranking_metrics_topks(pad_lists(reals), pad_lists(recs), TOPKS)
    return {k: (float(h.mean()), float(m.mean()), float(n.mean()))
            for k, (h, m, n) in per_k.items()}


def run_tf1(data, epochs):
    import tensorflow.compat.v1 as tf
    tf.disable_v2_behavior()
    from benchmarks.baseline_tf1 import python_pairwise_sampler

    tf.reset_default_graph()
    rng = np.random.default_rng(0)
    u_ph = tf.placeholder(tf.int32, [None])
    i_ph = tf.placeholder(tf.int32, [None])
    j_ph = tf.placeholder(tf.int32, [None])
    P = tf.get_variable("P", [data.user_nums, EMBED],
                        initializer=tf.random_normal_initializer(stddev=0.01))
    Q = tf.get_variable("Q", [data.item_nums, EMBED],
                        initializer=tf.random_normal_initializer(stddev=0.01))
    ue = tf.nn.embedding_lookup(P, u_ph)
    ie = tf.nn.embedding_lookup(Q, i_ph)
    je = tf.nn.embedding_lookup(Q, j_ph)
    x_ui = tf.reduce_sum(ue * ie, 1)
    loss = (tf.reduce_sum(-tf.log_sigmoid(x_ui - tf.reduce_sum(ue * je, 1)))
            + REG * (tf.nn.l2_loss(ue) + tf.nn.l2_loss(ie)
                     + tf.nn.l2_loss(je)))
    train = tf.train.AdamOptimizer(LR).minimize(loss)
    sess = tf.Session()
    sess.run(tf.global_variables_initializer())
    best = None
    for ep in range(epochs):
        nb, us, is_, js = python_pairwise_sampler(
            data.ui_train, data.item_nums, NEG_RATIO, BATCH, rng)
        for b in range(nb):
            sl = slice(b * BATCH, (b + 1) * BATCH)
            sess.run(train, {u_ph: us[sl], i_ph: is_[sl], j_ph: js[sl]})
        res = eval_tf1(sess, x_ui, u_ph, i_ph, data)
        if best is None or res[10][2] > best[10][2]:
            best = res
        print(f"  tf1 epoch {ep + 1}: HR@10={res[10][0]:.4f} "
              f"NDCG@10={res[10][2]:.4f}", flush=True)
    return best


def run_ours(cfg, data):
    from cleverrec_tpu.models import make_model
    from cleverrec_tpu.models.base import DataMeta
    from cleverrec_tpu.train import Trainer
    model = make_model(cfg, DataMeta(data.user_nums, data.item_nums))
    trainer = Trainer(model, data, cfg)
    best = trainer.run()
    return best["metrics"]


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    cfg = _config(epochs)
    data = load_ranking_data(cfg)

    t0 = time.time()
    ours = run_ours(cfg, data)
    t_ours_cold = time.time() - t0
    # Second identical run: jit caches are warm, so this is the honest
    # steady-state end-to-end wall (compile excluded) — the number a user
    # with a persistent compilation cache sees on every run after the
    # first.
    t0 = time.time()
    ours_warm = run_ours(cfg, data)
    t_ours_warm = time.time() - t0
    t0 = time.time()
    tf1 = run_tf1(data, epochs)
    t_tf1 = time.time() - t0

    out = {
        "config": {"model": "BPR", "dataset": "ml-100k", "split": "loo",
                   "neg_samples": 99, "epochs": epochs, "embed": EMBED,
                   "batch": BATCH, "neg_ratio": NEG_RATIO, "lr": LR,
                   "reg": REG},
        "best_tf1": {str(k): v for k, v in tf1.items()},
        "best_ours": {str(k): list(v) for k, v in ours.items()},
        "best_ours_warm": {str(k): list(v) for k, v in ours_warm.items()},
        "wall_s": {"tf1_cpu": t_tf1, "ours_tpu_cold": t_ours_cold,
                   "ours_tpu_warm": t_ours_warm},
    }
    path = os.path.join(os.path.dirname(__file__), "PARITY_BPR.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
