"""Classic rating prediction: user/item kNN and SVD-family MF.

- RatingUserCF / RatingItemCF (model/rating/Basic/UserCF.py:51-99,
  ItemCF.py): similarity over co-ratings (cosine / adjusted-cosine /
  Pearson), prediction = similarity-weighted mean of the top-K neighbors'
  ratings, falling back to the user's mean when no neighbor rated the
  item.  Vectorized: dense similarity via mean-centered rating matmuls.
- FunkSVD: r_hat = <p_u, q_i>; BiasSVD: r_hat = mu + b_u + b_i +
  <p_u, q_i>; both minibatch-SGD in a jitted scan.  NOTE: the reference's
  ``BiasSVD.py``/``FunkSVD.py`` files actually contain a copy of its
  rating UserCF script (no SVD code at all); these are the models their
  names promise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
import scipy.sparse as sp


def _ratings_matrix(triples, user_nums, item_nums):
    t = np.asarray(list(triples), dtype=np.float64)
    u = t[:, 0].astype(np.int64)
    i = t[:, 1].astype(np.int64)
    r = t[:, 2]
    m = sp.csr_matrix((r, (u, i)), shape=(user_nums, item_nums))
    mask = sp.csr_matrix((np.ones(len(u)), (u, i)),
                         shape=(user_nums, item_nums))
    return m, mask


class _KnnBase:
    def __init__(self, k: int = 10, sim_type: str = "cosine"):
        self.k = k
        self.sim_type = sim_type

    def _similarity(self, r: np.ndarray, mask: np.ndarray,
                    center: np.ndarray | None) -> np.ndarray:
        """Rows = entities; cosine over observed co-ratings, optionally
        mean-centered (adjusted-cosine / pcc pick the centering axis)."""
        x = r.copy()
        if center is not None:
            x = np.where(mask > 0, x - center, 0.0)
        num = x @ x.T
        d = np.sqrt(np.maximum(np.sum(np.square(x), axis=1), 1e-12))
        sim = num / (d[:, None] * d[None, :])
        np.fill_diagonal(sim, 0.0)
        return sim

    @staticmethod
    def _topk_mask(sim: np.ndarray, k: int) -> np.ndarray:
        if sim.shape[1] <= k:
            return sim
        kth = np.partition(sim, -k, axis=1)[:, -k][:, None]
        out = sim.copy()
        out[out < kth] = 0.0
        return out


class RatingUserCF(_KnnBase):
    def fit(self, triples, user_nums: int, item_nums: int):
        m, mask = _ratings_matrix(triples, user_nums, item_nums)
        r = m.toarray()
        msk = mask.toarray()
        cnt_u = np.maximum(msk.sum(axis=1), 1.0)
        cnt_i = np.maximum(msk.sum(axis=0), 1.0)
        self.u_avg = r.sum(axis=1) / cnt_u
        i_avg = r.sum(axis=0) / cnt_i
        center = (i_avg[None, :] if self.sim_type == "adjust_cosine"
                  else self.u_avg[:, None] if self.sim_type == "pcc"
                  else None)
        sim = self._similarity(r, msk, center)
        self.sim_k = self._topk_mask(sim, self.k)
        self.r = r
        self.mask = msk
        return self

    def predict(self, users, items) -> np.ndarray:
        users = np.asarray(users, np.int64)
        items = np.asarray(items, np.int64)
        s = self.sim_k[users]                              # [B, U]
        rated = self.mask[:, items].T                      # [B, U]
        w = s * rated
        num = np.sum(w * self.r[:, items].T, axis=1)
        den = np.sum(w, axis=1)
        fallback = self.u_avg[users]
        return np.where(den > 0, num / np.maximum(den, 1e-12), fallback)


class RatingItemCF(_KnnBase):
    def fit(self, triples, user_nums: int, item_nums: int):
        m, mask = _ratings_matrix(triples, user_nums, item_nums)
        r = m.toarray().T                                  # items x users
        msk = mask.toarray().T
        cnt_i = np.maximum(msk.sum(axis=1), 1.0)
        cnt_u = np.maximum(msk.sum(axis=0), 1.0)
        self.i_avg = r.sum(axis=1) / cnt_i
        u_avg = r.sum(axis=0) / cnt_u
        center = (u_avg[None, :] if self.sim_type == "adjust_cosine"
                  else self.i_avg[:, None] if self.sim_type == "pcc"
                  else None)
        sim = self._similarity(r, msk, center)
        self.sim_k = self._topk_mask(sim, self.k)
        self.r = r
        self.mask = msk
        return self

    def predict(self, users, items) -> np.ndarray:
        users = np.asarray(users, np.int64)
        items = np.asarray(items, np.int64)
        s = self.sim_k[items]                              # [B, I]
        rated = self.mask[:, users].T                      # [B, I]
        w = s * rated
        num = np.sum(w * self.r[:, users].T, axis=1)
        den = np.sum(w, axis=1)
        fallback = self.i_avg[items]
        return np.where(den > 0, num / np.maximum(den, 1e-12), fallback)


class _SvdBase:
    use_bias = False

    def __init__(self, factors: int = 32, lr: float = 0.01,
                 reg: float = 0.02, epochs: int = 20, batch: int = 4096,
                 seed: int = 0):
        self.f = factors
        self.lr = lr
        self.reg = reg
        self.epochs = epochs
        self.batch = batch
        self.seed = seed

    def fit(self, triples, user_nums: int, item_nums: int):
        t = np.asarray(list(triples), dtype=np.float64)
        u = jnp.asarray(t[:, 0].astype(np.int32))
        i = jnp.asarray(t[:, 1].astype(np.int32))
        r = jnp.asarray(t[:, 2], dtype=jnp.float32)
        self.mu = float(t[:, 2].mean()) if len(t) else 0.0
        key = jax.random.PRNGKey(self.seed)
        k1, k2 = jax.random.split(key)
        # Bias-free FunkSVD must carry the rating scale in P.Q itself;
        # start at <p, q> ~= mu so SGD refines rather than bootstraps.
        # (BiasSVD carries the scale in mu + biases instead.)
        base = (0.0 if self.use_bias
                else float(np.sqrt(max(self.mu, 0.0) / self.f)))
        params = {
            "P": base + 0.1 * jax.random.normal(k1, (user_nums, self.f)),
            "Q": base + 0.1 * jax.random.normal(k2, (item_nums, self.f)),
        }
        if self.use_bias:
            params["bu"] = jnp.zeros(user_nums)
            params["bi"] = jnp.zeros(item_nums)
        opt = optax.sgd(self.lr)
        opt_state = opt.init(params)
        n = len(t)
        steps = max(-(-n // self.batch), 1)
        padded = steps * self.batch
        mu = self.mu
        use_bias = self.use_bias
        reg = self.reg

        def pred(p, uu, ii):
            out = jnp.sum(p["P"][uu] * p["Q"][ii], axis=1)
            if use_bias:
                out = out + mu + p["bu"][uu] + p["bi"][ii]
            return out

        def loss_fn(p, uu, ii, rr, w):
            e = (rr - pred(p, uu, ii)) * w
            l2 = (jnp.sum(jnp.square(p["P"][uu] * w[:, None]))
                  + jnp.sum(jnp.square(p["Q"][ii] * w[:, None])))
            if use_bias:
                l2 = l2 + (jnp.sum(jnp.square(p["bu"][uu] * w))
                           + jnp.sum(jnp.square(p["bi"][ii] * w)))
            denom = jnp.maximum(jnp.sum(w), 1.0)
            return (jnp.sum(jnp.square(e)) + reg * l2) / denom

        @jax.jit
        def epoch(params, opt_state, ekey):
            perm = jax.random.permutation(ekey, padded)
            w = (perm < n).astype(jnp.float32)
            rows = jnp.minimum(perm, n - 1)

            def step(carry, xs):
                params, opt_state = carry
                rr_idx, wt = xs
                l, g = jax.value_and_grad(loss_fn)(
                    params, u[rr_idx], i[rr_idx], r[rr_idx], wt)
                upd, opt_state = opt.update(g, opt_state, params)
                return (optax.apply_updates(params, upd), opt_state), l

            xs = (rows.reshape(steps, -1), w.reshape(steps, -1))
            (params, opt_state), losses = jax.lax.scan(
                step, (params, opt_state), xs)
            return params, opt_state, losses.mean()

        for e in range(self.epochs):
            key, ekey = jax.random.split(key)
            params, opt_state, _ = epoch(params, opt_state, ekey)
        self.params = jax.tree_util.tree_map(np.asarray, params)
        return self

    def predict(self, users, items) -> np.ndarray:
        p = self.params
        out = np.sum(p["P"][users] * p["Q"][items], axis=1)
        if self.use_bias:
            out = out + self.mu + p["bu"][users] + p["bi"][items]
        return out


class FunkSVD(_SvdBase):
    use_bias = False


class BiasSVD(_SvdBase):
    use_bias = True
