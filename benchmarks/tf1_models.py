"""TF1-semantics parity arms beyond BPR: GMF / NeuMF / CML / LRML /
SBPR graphs + the reference's Python epoch samplers, re-expressed (not
copied) via tf.compat.v1.

Each builder reproduces the reference model's math exactly:
- GMF:   model/ranking/GMF.py:38-50   (h-weighted hadamard, sum-BCE)
- NeuMF: model/ranking/NeuMF.py:58-99 (GMF+MLP towers, fused h_neumf)
- CML:   model/ranking/CML.py:40-78   (WARP-weighted min-negative hinge
         + covariance regularizer; the reference's "unit clipping" never
         feeds back into training — see models/metric.py docstring)
- LRML:  model/ranking/LRML.py:42-66  (memory attention r = softmax((p
         ⊙ q)K)M, pairwise hinge on distances)
- SBPR:  model/ranking/SBPR.py:40-57  (social triple bpr with suk
         coefficient), sampler utils/sampler.py:102-141 (suk counts are
         static per (u, s), so they are precomputed once — identical
         values, no per-row Python friend loop)

Samplers mirror utils/sampler.py: per-(u,i) rejection sampling without
replacement, whole-epoch materialization, one shuffle.

Shared protocol with the `ours` arms: the SAME data pipeline
(cleverrec_tpu.data) and the reference's exact metric formulas, so any
metric gap isolates to training math.
"""

from __future__ import annotations

import math

import numpy as np

from cleverrec_tpu.metrics import pad_lists, ranking_metrics_topks


# -- reference-shaped epoch samplers ---------------------------------------

def sample_pointwise(ui_train, item_nums, neg_ratio, rng):
    """(u, i, y) rows: 1 positive + neg_ratio rejected negatives per pair
    (utils/sampler.py:10-43)."""
    us, is_, ys = [], [], []
    for u, items in ui_train.items():
        seen = set(items)
        for i in items:
            us.append(u)
            is_.append(i)
            ys.append(1.0)
            picked = set()
            for _ in range(neg_ratio):
                j = rng.integers(item_nums)
                while j in picked or j in seen:
                    j = rng.integers(item_nums)
                picked.add(j)
                us.append(u)
                is_.append(j)
                ys.append(0.0)
    order = rng.permutation(len(us))
    return (np.asarray(us)[order], np.asarray(is_)[order],
            np.asarray(ys, np.float32)[order])


def sample_cml(ui_train, item_nums, neg_ratio, rng):
    """(u, i, [neg x K]) rows (utils/sampler.py:77-99)."""
    us, is_, negs = [], [], []
    for u, items in ui_train.items():
        seen = set(items)
        for i in items:
            us.append(u)
            is_.append(i)
            row, picked = [], set()
            for _ in range(neg_ratio):
                j = rng.integers(item_nums)
                while j in picked or j in seen:
                    j = rng.integers(item_nums)
                picked.add(j)
                row.append(j)
            negs.append(row)
    order = rng.permutation(len(us))
    return (np.asarray(us)[order], np.asarray(is_)[order],
            np.asarray(negs)[order])


def sample_pairwise(ui_train, item_nums, neg_ratio, rng):
    """(u, i, j) rows (utils/sampler.py:46-74)."""
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
    order = rng.permutation(len(us))
    return (np.asarray(us)[order], np.asarray(is_)[order],
            np.asarray(js)[order])


def sample_sbpr(ui_train, spu, suk, item_nums, neg_ratio, rng):
    """(u, i, i_s, i_neg, suk) rows (utils/sampler.py:102-141): social
    item s uniform from SPu, negative rejected against seen UNION SPu,
    suk = #friends who consumed s (precomputed, same definition)."""
    us, is_, ss, js, sks = [], [], [], [], []
    for u, items in ui_train.items():
        if u not in spu:
            continue
        seen, social = set(items), set(spu[u])
        for i in items:
            for _ in range(neg_ratio):
                s = rng.integers(len(spu[u]))
                j = rng.integers(item_nums)
                while j in seen or j in social:
                    j = rng.integers(item_nums)
                us.append(u)
                is_.append(i)
                ss.append(spu[u][s])
                js.append(j)
                sks.append(suk[u][s])
    order = rng.permutation(len(us))
    return (np.asarray(us)[order], np.asarray(is_)[order],
            np.asarray(ss)[order], np.asarray(js)[order],
            np.asarray(sks, np.float32)[order])


# -- graph builders ---------------------------------------------------------

def _tf():
    import tensorflow.compat.v1 as tf
    tf.disable_v2_behavior()
    return tf


def build_gmf(tf, data, hp):
    """GMF.py:38-50: logits = h . (p_u o q_i), sum-BCE + reg l2."""
    u = tf.placeholder(tf.int32, [None])
    i = tf.placeholder(tf.int32, [None])
    y = tf.placeholder(tf.float32, [None])
    init = tf.random_normal_initializer(stddev=hp["stddev"])
    P = tf.get_variable("P", [data.user_nums, hp["embed"]], initializer=init)
    Q = tf.get_variable("Q", [data.item_nums, hp["embed"]], initializer=init)
    h = tf.get_variable("h", [hp["embed"]], initializer=init)
    ue, ie = tf.gather(P, u), tf.gather(Q, i)
    logits = tf.einsum("ab,b->a", ue * ie, h)
    loss = (tf.reduce_sum(tf.nn.sigmoid_cross_entropy_with_logits(
        labels=y, logits=logits))
        + hp["reg"] * (tf.nn.l2_loss(ue) + tf.nn.l2_loss(ie)))
    train = tf.train.AdamOptimizer(hp["lr"]).minimize(loss)
    return {"phs": (u, i, y), "train": train, "loss": loss,
            "pair_scores": logits, "pair_phs": (u, i), "cml_like": False,
            "sampler": "pointwise"}


def build_neumf(tf, data, hp):
    """NeuMF.py:58-99: dual GMF+MLP towers fused by h_neumf, sum-BCE."""
    u = tf.placeholder(tf.int32, [None])
    i = tf.placeholder(tf.int32, [None])
    y = tf.placeholder(tf.float32, [None])
    init = tf.random_normal_initializer(stddev=hp["stddev"])
    layers = hp["layers"]
    d = hp["embed"]
    P_g = tf.get_variable("P_gmf", [data.user_nums, d], initializer=init)
    Q_g = tf.get_variable("Q_gmf", [data.item_nums, d], initializer=init)
    P_m = tf.get_variable("P_mlp", [data.user_nums, layers[0] // 2],
                          initializer=init)
    Q_m = tf.get_variable("Q_mlp", [data.item_nums, layers[0] // 2],
                          initializer=init)
    h = tf.get_variable("h_neumf", [d + layers[-1] // 2], initializer=init)
    ue_g, ie_g = tf.gather(P_g, u), tf.gather(Q_g, i)
    ue_m, ie_m = tf.gather(P_m, u), tf.gather(Q_m, i)
    y_gmf = ue_g * ie_g
    z = tf.concat([ue_m, ie_m], 1)
    for li, width in enumerate(layers):
        W = tf.get_variable(f"W_{li}", [width, width // 2], initializer=init)
        b = tf.get_variable(f"b_{li}", [width // 2], initializer=init)
        z = tf.nn.relu(tf.matmul(z, W) + b)
    logits = tf.einsum("ab,b->a", tf.concat([y_gmf, z], 1), h)
    loss = (tf.reduce_sum(tf.nn.sigmoid_cross_entropy_with_logits(
        labels=y, logits=logits))
        + hp["reg1"] * (tf.nn.l2_loss(ue_g) + tf.nn.l2_loss(ie_g))
        + hp["reg2"] * (tf.nn.l2_loss(ue_m) + tf.nn.l2_loss(ie_m)))
    train = tf.train.AdamOptimizer(hp["lr"]).minimize(loss)
    return {"phs": (u, i, y), "train": train, "loss": loss,
            "pair_scores": logits, "pair_phs": (u, i), "cml_like": False,
            "sampler": "pointwise"}


def build_cml(tf, data, hp):
    """CML.py:40-78 as written: min-negative hinge, WARP log(rank+1)
    weight, covariance regularizer over concat(Q, P)."""
    u = tf.placeholder(tf.int32, [None])
    i = tf.placeholder(tf.int32, [None])
    negs = tf.placeholder(tf.int32, [None, hp["neg_ratio"]])
    init = tf.random_normal_initializer(stddev=hp["stddev"])
    d = hp["embed"]
    P = tf.get_variable("P", [data.user_nums, d], initializer=init)
    Q = tf.get_variable("Q", [data.item_nums, d], initializer=init)
    ue, ie = tf.gather(P, u), tf.gather(Q, i)
    ne = tf.transpose(tf.gather(Q, negs), (0, 2, 1))       # [B, d, K]
    d_ui = tf.reduce_sum(tf.squared_difference(ue, ie), 1)
    d_un = tf.reduce_sum(
        tf.squared_difference(tf.expand_dims(ue, -1), ne), 1)  # [B, K]
    per_pair = tf.maximum(d_ui + hp["margin"] - tf.reduce_min(d_un, 1), 0)
    imposters = tf.cast(
        (tf.expand_dims(d_ui, -1) + hp["margin"] - d_un) > 0, tf.float32)
    rank = (tf.reduce_mean(imposters, 1)
            * data.item_nums / hp["neg_ratio"])
    per_pair *= tf.log(rank + 1)
    X = tf.concat((Q, P), 0)
    n_rows = tf.cast(tf.shape(X)[0], tf.float32)
    Xc = X - tf.reduce_mean(X, axis=0)
    cov = tf.matmul(Xc, Xc, transpose_a=True) / n_rows
    cov_loss = hp["reg"] * tf.reduce_sum(
        tf.linalg.set_diag(cov, tf.zeros(d, tf.float32)))
    loss = tf.reduce_sum(per_pair) + cov_loss
    train = tf.train.AdamOptimizer(hp["lr"]).minimize(loss)
    return {"phs": (u, i, negs), "train": train, "loss": loss,
            "pair_scores": d_ui, "pair_phs": (u, i), "cml_like": True,
            "sampler": "cml"}


def build_lrml(tf, data, hp):
    """LRML.py:42-66: r = softmax((p o q) K) M, hinge on distance gap."""
    u = tf.placeholder(tf.int32, [None])
    i = tf.placeholder(tf.int32, [None])
    j = tf.placeholder(tf.int32, [None])
    init = tf.random_normal_initializer(stddev=hp["stddev"])
    d, m = hp["embed"], hp["mem_size"]
    P = tf.get_variable("P", [data.user_nums, d], initializer=init)
    Q = tf.get_variable("Q", [data.item_nums, d], initializer=init)
    K = tf.get_variable("K", [d, m], initializer=init)
    M = tf.get_variable("M", [m, d], initializer=init)
    ue, ie, je = tf.gather(P, u), tf.gather(Q, i), tf.gather(Q, j)

    def lram(user_e, item_e):
        joint = user_e * item_e
        return tf.matmul(tf.nn.softmax(tf.matmul(joint, K)), M)

    ui_d = tf.reduce_sum(tf.square(ue + lram(ue, ie) - ie), 1)
    uj_d = tf.reduce_sum(tf.square(ue + lram(ue, je) - je), 1)
    loss = (tf.reduce_sum(tf.maximum(ui_d - uj_d + hp["margin"], 0))
            + hp["reg"] * (tf.nn.l2_loss(ue) + tf.nn.l2_loss(ie)
                           + tf.nn.l2_loss(je)))
    train = tf.train.AdamOptimizer(hp["lr"]).minimize(loss)
    return {"phs": (u, i, j), "train": train, "loss": loss,
            "pair_scores": ui_d, "pair_phs": (u, i), "cml_like": True,
            "sampler": "pairwise"}


def build_sbpr(tf, data, hp):
    """SBPR.py:40-57: bpr((x_ui - x_uk)/suk) + bpr(x_uk - x_uj)."""
    u = tf.placeholder(tf.int32, [None])
    i = tf.placeholder(tf.int32, [None])
    s = tf.placeholder(tf.int32, [None])
    j = tf.placeholder(tf.int32, [None])
    suk = tf.placeholder(tf.float32, [None])
    init = tf.random_normal_initializer(stddev=hp["stddev"])
    d = hp["embed"]
    P = tf.get_variable("P", [data.user_nums, d], initializer=init)
    Q = tf.get_variable("Q", [data.item_nums, d], initializer=init)
    bias = tf.get_variable("bias", [data.item_nums], initializer=init)
    ue = tf.gather(P, u)

    def score(idx):
        e, b = tf.gather(Q, idx), tf.gather(bias, idx)
        return e, b, tf.einsum("ab,ab->a", ue, e) + b

    ie, ib, x_ui = score(i)
    se, sb, x_uk = score(s)
    je, jb, x_uj = score(j)
    loss = (tf.reduce_sum(-tf.log_sigmoid((x_ui - x_uk) / suk))
            + tf.reduce_sum(-tf.log_sigmoid(x_uk - x_uj))
            + hp["reg"] * (tf.nn.l2_loss(ue) + tf.nn.l2_loss(ie)
                           + tf.nn.l2_loss(se) + tf.nn.l2_loss(je)
                           + tf.nn.l2_loss(ib) + tf.nn.l2_loss(sb)
                           + tf.nn.l2_loss(jb)))
    train = tf.train.AdamOptimizer(hp["lr"]).minimize(loss)
    return {"phs": (u, i, s, j, suk), "train": train, "loss": loss,
            "pair_scores": x_ui, "pair_phs": (u, i), "cml_like": False,
            "sampler": "sbpr"}


BUILDERS = {"GMF": build_gmf, "NeuMF": build_neumf, "CML": build_cml,
            "LRML": build_lrml, "SBPR": build_sbpr}


# -- train / eval loop -------------------------------------------------------

def eval_candidates(sess, g, data, topks=(10, 20), batch=1024):
    """Reference candidate-protocol eval (RankingRecommender.py:250-299):
    per-user argsort of candidate pair scores, ascending for cml_like."""
    sign = 1.0 if g["cml_like"] else -1.0
    u_ph, i_ph = g["pair_phs"]
    users = list(data.ui_test.keys())
    recs, reals = [], []
    for s0 in range(0, len(users), batch):
        cur = users[s0: s0 + batch]
        uu, ii, counts = [], [], []
        for u in cur:
            cand = data.ui_test[u]
            uu.extend([u] * len(cand))
            ii.extend(cand)
            counts.append(len(cand))
        scores = sess.run(g["pair_scores"], {u_ph: uu, i_ph: ii})
        ofs = 0
        for u, c in zip(cur, counts):
            sc = scores[ofs: ofs + c]
            cand = data.ui_test[u]
            order = np.argsort(sign * sc)[: max(topks)]
            recs.append([cand[a] for a in order])
            reals.append(cand[data.neg_samples:])
            ofs += c
    per_k = ranking_metrics_topks(pad_lists(reals), pad_lists(recs), topks)
    return {k: (float(h.mean()), float(m.mean()), float(n.mean()))
            for k, (h, m, n) in per_k.items()}


def run_tf1(name, data, hp, epochs, batch_size=6144, seed=0,
            eval_interval=1, spu=None, suk=None):
    """Train a TF1 parity arm; returns (best_metrics, best_epoch)."""
    tf = _tf()
    tf.reset_default_graph()
    tf.set_random_seed(seed)
    rng = np.random.default_rng(seed)
    g = BUILDERS[name](tf, data, hp)
    sess = tf.Session()
    sess.run(tf.global_variables_initializer())
    best, best_ep = None, 0
    for ep in range(epochs):
        if g["sampler"] == "pointwise":
            arrays = sample_pointwise(data.ui_train, data.item_nums,
                                      hp["neg_ratio"], rng)
        elif g["sampler"] == "cml":
            arrays = sample_cml(data.ui_train, data.item_nums,
                                hp["neg_ratio"], rng)
        elif g["sampler"] == "pairwise":
            arrays = sample_pairwise(data.ui_train, data.item_nums,
                                     hp["neg_ratio"], rng)
        else:
            arrays = sample_sbpr(data.ui_train, spu, suk, data.item_nums,
                                 hp["neg_ratio"], rng)
        n = len(arrays[0])
        for b in range(math.ceil(n / batch_size)):
            sl = slice(b * batch_size, (b + 1) * batch_size)
            feed = {ph: arr[sl] for ph, arr in zip(g["phs"], arrays)}
            sess.run(g["train"], feed)
        if (ep + 1) % eval_interval:
            continue
        res = eval_candidates(sess, g, data)
        if best is None or res[10][2] > best[10][2]:
            best, best_ep = res, ep + 1
        print(f"  tf1 {name} epoch {ep + 1}: HR@10={res[10][0]:.4f} "
              f"NDCG@10={res[10][2]:.4f}", flush=True)
    return best, best_ep
