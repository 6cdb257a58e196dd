"""LFM: pointwise matrix factorization with popularity-biased negatives
(Basic/LFM.py:55-125).

The reference is per-sample Python SGD with multiprocessing sampling; here
one training iteration is a jitted JAX epoch: popularity-weighted negative
draws (rejecting seen items), squared-error SGD on P/Q with L2, minibatched.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cleverrec_tpu.classic.base import InteractionData, topn_from_scores
from cleverrec_tpu.sampling import build_member_table, member


class LFM:
    def __init__(self, factors: int = 64, lr: float = 0.01,
                 reg: float = 1e-5, neg_ratio: int = 3, iters: int = 30,
                 batch: int = 8192, seed: int = 0):
        self.f = factors
        self.lr = lr
        self.reg = reg
        self.neg_ratio = neg_ratio
        self.iters = iters
        self.batch = batch
        self.seed = seed

    def fit(self, data: InteractionData):
        self.data = data
        coo = data.train.tocoo()
        pos_u = jnp.asarray(coo.row.astype(np.int32))
        pos_i = jnp.asarray(coo.col.astype(np.int32))
        n = len(coo.row)
        seen_np = build_member_table(
            {u: data.train[u].indices.tolist() for u in range(data.user_nums)},
            data.user_nums, data.item_nums)
        seen = jax.tree_util.tree_map(jnp.asarray, seen_np)
        # Popularity-proportional negative sampling via the degree CDF
        # (the reference passes popularity weights to np.random.choice,
        # Basic/LFM.py:66).
        deg = data.item_degrees.astype(np.float64)
        cdf = jnp.asarray(np.cumsum(deg) / max(deg.sum(), 1.0),
                          dtype=jnp.float32)

        key = jax.random.PRNGKey(self.seed)
        k1, key = jax.random.split(key)
        # Scaled uniform init: <p, q> starts ~0.25 (labels are 0/1).
        scale = 1.0 / np.sqrt(self.f)
        params = {
            "P": scale * jax.random.uniform(k1, (data.user_nums, self.f)),
            "Q": scale * jax.random.uniform(jax.random.fold_in(key, 7),
                                            (data.item_nums, self.f)),
        }
        # Adam converges far faster than the reference's per-sample SGD
        # for the same objective; the model itself is unchanged.
        opt = optax.adam(self.lr)
        opt_state = opt.init(params)
        item_nums = data.item_nums
        grp = 1 + self.neg_ratio
        rows_total = n * grp
        steps = -(-rows_total // self.batch)
        padded = steps * self.batch
        b = self.batch
        reg = self.reg

        def loss_fn(p, u, i, y, w):
            pred = jnp.sum(p["P"][u] * p["Q"][i], axis=1)
            denom = jnp.maximum(jnp.sum(w), 1.0)
            main = jnp.sum(jnp.square(y - pred) * w) / denom
            wc = w[:, None]
            return main + reg * (jnp.sum(jnp.square(p["P"][u] * wc))
                                 + jnp.sum(jnp.square(p["Q"][i] * wc))) / denom

        @jax.jit
        def epoch(params, opt_state, key):
            pkey, skey = jax.random.split(key)
            perm = jax.random.permutation(pkey, padded)
            valid = (perm < rows_total).astype(jnp.float32)
            r = jnp.minimum(perm, rows_total - 1)
            p_idx = (r // grp)
            is_pos = (r % grp) == 0
            u_all = pos_u[p_idx]
            # Popularity-biased candidate: invert the CDF on uniforms,
            # reject seen items.
            uni = jax.random.uniform(skey, u_all.shape + (16,))
            cand = jnp.searchsorted(cdf, uni.reshape(-1)).reshape(
                uni.shape).astype(jnp.int32)
            cand = jnp.clip(cand, 0, item_nums - 1)
            bad = member(seen, u_all, cand)
            first = jnp.argmax(~bad, axis=-1)
            j_all = jnp.take_along_axis(cand, first[..., None],
                                        axis=-1)[..., 0]
            i_all = jnp.where(is_pos, pos_i[p_idx], j_all)
            y_all = is_pos.astype(jnp.float32)
            # A heavy user can reject ALL 16 popularity-biased draws;
            # argmax(all-False)=0 would then train a SEEN item toward
            # label 0 — zero-weight those rows instead.
            all_bad = jnp.all(bad, axis=-1) & ~is_pos
            w_all = jnp.where(all_bad, 0.0, 1.0)

            def step(carry, xs):
                params, opt_state = carry
                u, i, y, w = xs
                l, g = jax.value_and_grad(loss_fn)(params, u, i, y, w)
                upd, opt_state = opt.update(g, opt_state, params)
                return (optax.apply_updates(params, upd), opt_state), l

            xs = tuple(a.reshape(steps, b) for a in
                       (u_all, i_all, y_all, valid * w_all))
            (params, opt_state), losses = jax.lax.scan(
                step, (params, opt_state), xs)
            return params, opt_state, losses.mean()

        for it in range(self.iters):
            key, ekey = jax.random.split(key)
            params, opt_state, _ = epoch(params, opt_state, ekey)
        self.P = np.asarray(params["P"])
        self.Q = np.asarray(params["Q"])
        return self

    def recommend(self, users, n: int) -> np.ndarray:
        scores = self.P[users] @ self.Q.T
        return topn_from_scores(scores, self.data.seen_mask(users), n)
