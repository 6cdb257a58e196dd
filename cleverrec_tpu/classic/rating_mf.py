"""SVD++ and TrustSVD rating predictors, and SlopeOne / SLIM.

All four are advertised by the reference with empty files
(model/rating/{SVD++,TrustSVD,SlopeOne,SLIM}.py are 0 bytes — SURVEY.md
section 2.2); these implement the published algorithms:

- SVD++ (Koren, KDD'08): r_hat = mu + b_u + b_i +
  q_i . (p_u + |N(u)|^-1/2 sum_{j in N(u)} y_j); minibatch SGD with the
  implicit-feedback sum recomputed from the CURRENT y table per step
  (segment-sum over the rating pairs).
- TrustSVD (Guo et al., AAAI'15): SVD++ plus trust terms — the truster's
  representation also aggregates trustee embeddings
  |T(u)|^-1/2 sum_{v in T(u)} w_v, and a trust-prediction loss
  t_hat_uv = w_v . p_u is trained jointly.
- SlopeOne (Lemire & Maclachlan'05): closed-form item-pair average
  deviations, weighted by co-rating counts.
- SLIM (Ning & Karypis, ICDM'11): sparse item-item linear model
  min ||A - A W||^2 + l2/2 ||W||^2 + l1 ||W||_1, W >= 0, diag(W) = 0 —
  solved by jitted projected proximal gradient descent (dense W; guarded
  by catalog size).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
import scipy.sparse as sp

from cleverrec_tpu.classic.base import InteractionData, topn_from_scores


class _ImplicitMFBase:
    """Shared SVD++/TrustSVD machinery."""

    use_trust = False

    def __init__(self, factors: int = 32, lr: float = 0.005,
                 reg: float = 0.02, reg_t: float = 0.05, epochs: int = 20,
                 batch: int = 4096, seed: int = 0):
        self.f = factors
        self.lr = lr
        self.reg = reg
        self.reg_t = reg_t
        self.epochs = epochs
        self.batch = batch
        self.seed = seed

    def fit(self, triples, user_nums: int, item_nums: int,
            trust_pairs=None):
        t = np.asarray(list(triples), dtype=np.float64)
        u_np = t[:, 0].astype(np.int32)
        i_np = t[:, 1].astype(np.int32)
        u = jnp.asarray(u_np)
        i = jnp.asarray(i_np)
        r = jnp.asarray(t[:, 2], dtype=jnp.float32)
        self.mu = float(t[:, 2].mean()) if len(t) else 0.0
        self.user_nums, self.item_nums = user_nums, item_nums

        n_u = np.zeros(user_nums)
        np.add.at(n_u, u_np, 1.0)
        inv_sqrt_n = jnp.asarray(1.0 / np.sqrt(np.maximum(n_u, 1.0)),
                                 dtype=jnp.float32)
        if self.use_trust:
            tp = np.asarray(list(trust_pairs or []), dtype=np.int64)
            # Empty trust graph: keep a shape-stable placeholder edge but
            # ZERO its loss weight (a trained fake (0,0) edge pushed user
            # 0's embeddings toward w_0 . p_0 = 1 every step).
            t_weight = 1.0 if len(tp) else 0.0
            if len(tp) == 0:
                tp = np.zeros((1, 2), np.int64)
            tu = jnp.asarray(tp[:, 0].astype(np.int32))
            tv = jnp.asarray(tp[:, 1].astype(np.int32))
            t_cnt = np.zeros(user_nums)
            np.add.at(t_cnt, tp[:, 0], 1.0)
            inv_sqrt_t = jnp.asarray(1.0 / np.sqrt(np.maximum(t_cnt, 1.0)),
                                     dtype=jnp.float32)

        key = jax.random.PRNGKey(self.seed)
        ks = jax.random.split(key, 4)
        params = {
            "P": 0.05 * jax.random.normal(ks[0], (user_nums, self.f)),
            "Q": 0.05 * jax.random.normal(ks[1], (item_nums, self.f)),
            "Y": jnp.zeros((item_nums, self.f)),
            "bu": jnp.zeros(user_nums),
            "bi": jnp.zeros(item_nums),
        }
        if self.use_trust:
            params["W"] = 0.05 * jax.random.normal(ks[2],
                                                   (user_nums, self.f))
        opt = optax.adam(self.lr)
        opt_state = opt.init(params)
        n = len(t)
        steps = max(-(-n // self.batch), 1)
        padded = steps * self.batch
        mu = self.mu
        reg = self.reg
        reg_t = self.reg_t
        use_trust = self.use_trust

        def user_repr(p):
            z = jax.ops.segment_sum(p["Y"][i], u, num_segments=user_nums)
            rep = p["P"] + z * inv_sqrt_n[:, None]
            if use_trust:
                tz = jax.ops.segment_sum(p["W"][tv], tu,
                                         num_segments=user_nums)
                rep = rep + tz * inv_sqrt_t[:, None]
            return rep

        def loss_fn(p, rows, w):
            rep = user_repr(p)
            uu, ii, rr = u[rows], i[rows], r[rows]
            pred = (mu + p["bu"][uu] + p["bi"][ii]
                    + jnp.sum(rep[uu] * p["Q"][ii], axis=1))
            denom = jnp.maximum(jnp.sum(w), 1.0)
            main = jnp.sum(jnp.square(rr - pred) * w) / denom
            wc = w[:, None]
            l2 = (jnp.sum(jnp.square(p["P"][uu] * wc))
                  + jnp.sum(jnp.square(p["Q"][ii] * wc))
                  + jnp.sum(jnp.square(p["Y"][ii] * wc))
                  + jnp.sum(jnp.square(p["bu"][uu] * w))
                  + jnp.sum(jnp.square(p["bi"][ii] * w))) / denom
            total = main + reg * l2
            if use_trust:
                t_pred = jnp.sum(p["W"][tv] * p["P"][tu], axis=1)
                total = total + reg_t * t_weight * (
                    jnp.mean(jnp.square(1.0 - t_pred))
                    + jnp.mean(jnp.square(p["W"][tv])))
            return total

        @jax.jit
        def epoch(p, s, ekey):
            perm = jax.random.permutation(ekey, padded)
            w = (perm < n).astype(jnp.float32)
            rows = jnp.minimum(perm, n - 1)

            def step(carry, xs):
                p, s = carry
                rr, wt = xs
                l, g = jax.value_and_grad(loss_fn)(p, rr, wt)
                upd, s = opt.update(g, s, p)
                return (optax.apply_updates(p, upd), s), l

            xs = (rows.reshape(steps, -1), w.reshape(steps, -1))
            (p, s), losses = jax.lax.scan(step, (p, s), xs)
            return p, s, losses.mean()

        for _ in range(self.epochs):
            key, ekey = jax.random.split(key)
            params, opt_state, _ = epoch(params, opt_state, ekey)
        self.params = jax.tree_util.tree_map(np.asarray, params)
        # Final user representations (fixed for prediction).
        self._rep = np.asarray(user_repr(
            jax.tree_util.tree_map(jnp.asarray, self.params)))
        return self

    def predict(self, users, items) -> np.ndarray:
        p = self.params
        return (self.mu + p["bu"][users] + p["bi"][items]
                + np.sum(self._rep[users] * p["Q"][items], axis=1))


class SVDpp(_ImplicitMFBase):
    use_trust = False


class TrustSVD(_ImplicitMFBase):
    use_trust = True


class SlopeOne:
    """Weighted SlopeOne: dev[i,j] = mean(r_ui - r_uj) over co-raters."""

    def fit(self, triples, user_nums: int, item_nums: int):
        t = np.asarray(list(triples), dtype=np.float64)
        u = t[:, 0].astype(np.int64)
        i = t[:, 1].astype(np.int64)
        r = t[:, 2]
        m = sp.csr_matrix((r, (u, i)), shape=(user_nums, item_nums))
        mask = sp.csr_matrix((np.ones(len(u)), (u, i)),
                             shape=(user_nums, item_nums))
        rd = m.toarray()
        md = mask.toarray()
        # counts[i, j] = co-raters; diffs[i, j] = sum of (r_ui - r_uj).
        counts = md.T @ md
        diffs = rd.T @ md - md.T @ rd
        with np.errstate(divide="ignore", invalid="ignore"):
            self.dev = np.where(counts > 0, diffs / np.maximum(counts, 1), 0.0)
        self.counts = counts
        self.r = rd
        self.mask = md
        self.u_avg = rd.sum(axis=1) / np.maximum(md.sum(axis=1), 1.0)
        return self

    def predict(self, users, items) -> np.ndarray:
        users = np.asarray(users, np.int64)
        items = np.asarray(items, np.int64)
        out = np.empty(len(users))
        for k, (uu, ii) in enumerate(zip(users, items)):
            rated = self.mask[uu] > 0
            c = self.counts[ii][rated]
            keep = c > 0
            if keep.any():
                d = self.dev[ii][rated][keep]
                rj = self.r[uu][rated][keep]
                out[k] = np.sum((d + rj) * c[keep]) / np.sum(c[keep])
            else:
                out[k] = self.u_avg[uu]
        return out


class SLIM:
    """Sparse linear item model via jitted projected proximal gradient."""

    def __init__(self, l1: float = 0.0001, l2: float = 0.001,
                 iters: int = 400, lr: float = 0.01, max_items: int = 20000):
        self.l1 = l1
        self.l2 = l2
        self.iters = iters
        self.lr = lr
        self.max_items = max_items

    def fit(self, data: InteractionData):
        self.data = data
        if data.item_nums > self.max_items:
            raise ValueError("SLIM dense solver capped at "
                             f"{self.max_items} items")
        a = jnp.asarray(data.train.toarray())
        n_i = data.item_nums
        l1, l2, lr = self.l1, self.l2, self.lr
        eye = jnp.eye(n_i, dtype=bool)

        @jax.jit
        def run(w0):
            gram = a.T @ a                             # [I, I]

            def body(_, w):
                grad = gram @ w - gram + l2 * w
                w = w - lr * grad
                w = jnp.sign(w) * jnp.maximum(jnp.abs(w) - lr * l1, 0.0)
                w = jnp.maximum(w, 0.0)                # nonnegativity
                return jnp.where(eye, 0.0, w)          # zero diagonal
            return jax.lax.fori_loop(0, self.iters, body, w0)

        self.w = np.asarray(run(jnp.zeros((n_i, n_i))))
        return self

    def recommend(self, users, n: int) -> np.ndarray:
        scores = np.asarray(self.data.train[users].toarray() @ self.w)
        return topn_from_scores(scores, self.data.seen_mask(users), n)
