"""Measured baseline: the reference's training recipe, faithfully
re-expressed (not copied) in TF1 graph mode via tf.compat.v1.

The reference publishes no numbers (BASELINE.md), so the comparison
baseline must be measured.  This harness reproduces the reference's hot
loop shape exactly (SURVEY.md section 3.2):

1. per-epoch Python rejection sampler materializing (u, i, j) arrays
   (utils/sampler.py:46-74 semantics),
2. per-batch feed_dict -> sess.run([train, loss]) round trips on a
   BPR graph (embedding lookups -> dot scores -> -log sigmoid + L2,
   Adam) (model/ranking/BPR.py semantics),
3. candidate-list evaluation via per-user np.argsort
   (RankingRecommender.py:250-299 semantics).

Run:  python benchmarks/baseline_tf1.py  (CPU; writes BASELINE_MEASURED.json)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cleverrec_tpu.config import Config  # noqa: E402
from cleverrec_tpu.data import load_ranking_data  # noqa: E402

EMBED = 128
BATCH = 6144
NEG_RATIO = 4
LR = 0.001
REG = 0.01
EPOCHS = 3


def python_pairwise_sampler(ui_train, item_nums, neg_ratio, batch_size, rng):
    """Reference-shaped epoch sampler: Python rejection loops + full-epoch
    materialization + shuffle."""
    us, is_, js = [], [], []
    for u, items in ui_train.items():
        seen = set(items)
        for i in items:
            picked = set()
            for _ in range(neg_ratio):
                j = rng.integers(item_nums)
                while j in picked or j in seen:
                    j = rng.integers(item_nums)
                picked.add(j)
                us.append(u)
                is_.append(i)
                js.append(j)
    n = len(us)
    order = rng.permutation(n)
    return (math.ceil(n / batch_size), np.asarray(us)[order],
            np.asarray(is_)[order], np.asarray(js)[order])


def main():
    import tensorflow.compat.v1 as tf
    tf.disable_v2_behavior()

    cfg = Config({
        "recommender": "BPR", "data.root_dir": "/root/reference/dataset",
        "data.dataset": "ml-100k", "data.file_name": "u.data",
        "data.sep": "\t", "data.format": "UIRT", "data.split_way": "loo",
        "data.split_by_time": "True", "data.user_min": "0",
        "data.item_min": "0", "test.neg_samples": "99", "seed": "42",
        "init_method": "normal", "stddev": "0.01",
    })
    data = load_ranking_data(cfg)
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
    x_uj = tf.reduce_sum(ue * je, 1)
    loss = (tf.reduce_sum(-tf.log_sigmoid(x_ui - x_uj))
            + REG * (tf.nn.l2_loss(ue) + tf.nn.l2_loss(ie)
                     + tf.nn.l2_loss(je)))
    train = tf.train.AdamOptimizer(LR).minimize(loss)
    pair_scores = x_ui

    sess = tf.Session()
    sess.run(tf.global_variables_initializer())

    # -- timed training epochs (sampler + feed_dict loop, like the ref) ---
    epoch_times, epoch_examples = [], []
    for _ in range(EPOCHS):
        t0 = time.time()
        nb, us, is_, js = python_pairwise_sampler(
            data.ui_train, data.item_nums, NEG_RATIO, BATCH, rng)
        for b in range(nb):
            sl = slice(b * BATCH, (b + 1) * BATCH)
            sess.run([train, loss],
                     {u_ph: us[sl], i_ph: is_[sl], j_ph: js[sl]})
        epoch_times.append(time.time() - t0)
        epoch_examples.append(len(us))

    # -- timed eval pass (batched pair scoring + np.argsort, like the ref) -
    test_users = list(data.ui_test.keys())
    t0 = time.time()
    bt = 1024
    for s in range(0, len(test_users), bt):
        cur = test_users[s: s + bt]
        uu, ii, counts = [], [], []
        for u in cur:
            cand = data.ui_test[u]
            uu.extend([u] * len(cand))
            ii.extend(cand)
            counts.append(len(cand))
        scores = sess.run(pair_scores, {u_ph: uu, i_ph: ii, j_ph: ii})
        ofs = 0
        for u, c in zip(cur, counts):
            np.argsort(-scores[ofs: ofs + c])[:20]
            ofs += c
    eval_time = time.time() - t0

    examples_per_s = sum(epoch_examples) / sum(epoch_times)
    out = {
        "harness": "tf1_compat_feed_dict",
        "hardware": "container CPU (reference envelope: 1x GPU or CPU)",
        "config": {"dataset": "ml-100k", "model": "BPR", "embed": EMBED,
                   "batch": BATCH, "neg_ratio": NEG_RATIO,
                   "split": "loo", "neg_samples": 99},
        "train_examples_per_s": examples_per_s,
        "epoch_seconds": sum(epoch_times) / len(epoch_times),
        "eval_users_per_s": len(test_users) / eval_time,
    }
    path = os.path.join(os.path.dirname(__file__), "BASELINE_MEASURED.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
