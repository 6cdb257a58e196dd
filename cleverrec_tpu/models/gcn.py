"""Graph-convolution CF: LightGCN and NGCF.

The reference ADVERTISES these models (README.md:26-35) but ships empty
placeholder files (model/ranking/LightGCN.py is 0 bytes; NGCF.py is an
all-`pass` stub — SURVEY.md section 2.2).  These are full implementations
of the published algorithms, built on the same edge-list + segment-sum
propagation machinery as SoHRML:

- LightGCN (SIGIR'20): E^(l+1) = A_hat E^l with the symmetric-normalized
  bipartite adjacency A_hat = D^-1/2 A D^-1/2 (no self loops, no
  transforms); final embeddings = mean over layers 0..L; BPR loss with
  L2 on the EGO embeddings of the batch (the paper's reg).
- NGCF (SIGIR'19): E^(l+1) = LeakyReLU((A_hat + I) E^l W1
  + (A_hat E^l) (.) E^l W2), message dropout, final embedding = concat of
  all layers; BPR loss.

Both rank by inner product (not cml_like).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cleverrec_tpu.common import bpr_loss, init_param, l2_loss
from cleverrec_tpu.models.base import Aux, Params, RecModel


def _bipartite_edges(device_data, user_nums, item_nums):
    """Symmetric-normalized bipartite edges over U+I nodes."""
    u = device_data.pos_u.astype(np.int64)
    i = device_data.pos_i.astype(np.int64) + user_nums
    rows = np.concatenate([u, i])
    cols = np.concatenate([i, u])
    deg = np.zeros(user_nums + item_nums)
    np.add.at(deg, rows, 1.0)
    w = 1.0 / np.sqrt(np.maximum(deg[rows] * deg[cols], 1.0))
    return (rows.astype(np.int32), cols.astype(np.int32),
            w.astype(np.float32))


# Dense-adjacency budget: A_hat as a DENSE [n, n] f32 matrix turns each
# propagation layer into one MXU matmul instead of a gather + scatter
# over the edge list.  The graph is ~99% zeros, so the matmul "wastes"
# most of its MACs — but on TPU the segment-sum path is HBM-bound
# (edge-gather + scatter traffic every step, fwd AND transposed in the
# backward pass) while the dense matmul is nearly free MXU time:
# measured 172ms -> ~40ms LightGCN epochs on ml-100k.  ml-1m's 9746
# nodes need 380MB (fits); Epinions-scale graphs fall back to edges.
DENSE_ADJ_BUDGET_MB = 512


def _graph_aux(device_data, user_nums, item_nums, cfg):
    rows, cols, w = _bipartite_edges(device_data, user_nums, item_nums)
    n = user_nums + item_nums
    budget = cfg.int("graph.dense_budget_mb", DENSE_ADJ_BUDGET_MB)
    if n * n * 4 <= budget * 2 ** 20:
        dense = np.zeros((n, n), np.float32)
        # add.at, not assignment: duplicate (u, i) interactions emit the
        # edge multiple times and segment_sum SUMS them — the dense form
        # must be the same operator.
        np.add.at(dense, (rows, cols), w)
        return {"g_dense": dense}
    return {"g_row": rows, "g_col": cols, "g_w": w}


def _adj_apply(aux, ego, n):
    """One A_hat @ E propagation step (dense matmul or segment-sum)."""
    if "g_dense" in aux:
        return jnp.dot(aux["g_dense"], ego,
                       preferred_element_type=jnp.float32)
    return jax.ops.segment_sum(aux["g_w"][:, None] * ego[aux["g_col"]],
                               aux["g_row"], num_segments=n)


class LightGCN(RecModel):
    name = "LightGCN"
    sampler = "pairwise"

    def __init__(self, cfg, meta):
        super().__init__(cfg, meta)
        cfg.require("embed_size", "reg")
        self.embed_size = cfg.int("embed_size")
        self.reg = cfg.float("reg")
        self.n_layers = cfg.int("n_layers", 3)

    def build_aux(self, device_data, data) -> dict:
        return _graph_aux(device_data, self.meta.user_nums,
                          self.meta.item_nums, self.cfg)

    def init(self, key) -> Params:
        P, Q = self._embed_tables(
            key,
            (self.meta.user_nums, self.embed_size),
            (self.meta.item_nums, self.embed_size))
        return {"P": P, "Q": Q}

    def _propagate(self, params, aux):
        n = self.meta.user_nums + self.meta.item_nums
        ego = jnp.concatenate([params["P"], params["Q"]], axis=0)
        acc = ego
        for _ in range(self.n_layers):
            ego = _adj_apply(aux, ego, n)
            acc = acc + ego
        final = acc / (self.n_layers + 1)
        return final[: self.meta.user_nums], final[self.meta.user_nums:]

    def loss(self, params: Params, batch, aux: Aux):
        w = batch["w"]
        u_g, i_g = self._propagate(params, aux)
        ue = u_g[batch["u"]]
        s_i = jnp.sum(ue * i_g[batch["i"]], axis=1)
        s_j = jnp.sum(ue * i_g[batch["j"]], axis=1)
        main = bpr_loss(s_i - s_j, weight=w)
        wc = w[:, None]
        reg = (l2_loss(params["P"][batch["u"]] * wc)
               + l2_loss(params["Q"][batch["i"]] * wc)
               + l2_loss(params["Q"][batch["j"]] * wc))
        return main + self.reg * reg

    def score_pairs(self, params: Params, u, i, aux: Aux):
        u_g, i_g = self._propagate(params, aux)
        return jnp.sum(u_g[u] * i_g[i], axis=1)

    def score_candidates(self, params: Params, u, cand, aux: Aux):
        u_g, i_g = self._propagate(params, aux)
        return jnp.einsum("bd,bcd->bc", u_g[u], i_g[cand])

    def score_all(self, params: Params, u, aux: Aux):
        u_g, i_g = self._propagate(params, aux)
        return jnp.dot(u_g[u], i_g.T, preferred_element_type=jnp.float32)

    def dot_decomposition(self, params: Params, u, aux: Aux):
        u_g, i_g = self._propagate(params, aux)
        return u_g[u], i_g, None


class NGCF(RecModel):
    name = "NGCF"
    sampler = "pairwise"

    def __init__(self, cfg, meta):
        super().__init__(cfg, meta)
        cfg.require("embed_size", "reg")
        self.embed_size = cfg.int("embed_size")
        self.reg = cfg.float("reg")
        self.n_layers = cfg.int("n_layers", 3)
        self.message_dropout = cfg.float("message_dropout", 0.1)

    def build_aux(self, device_data, data) -> dict:
        return _graph_aux(device_data, self.meta.user_nums,
                          self.meta.item_nums, self.cfg)

    def init(self, key) -> Params:
        d = self.embed_size
        keys = jax.random.split(key, 2 + 4 * self.n_layers)
        params: Params = {
            "P": init_param(keys[0], self.initializer,
                            (self.meta.user_nums, d)),
            "Q": init_param(keys[1], self.initializer,
                            (self.meta.item_nums, d)),
        }
        for lid in range(self.n_layers):
            params[f"W1_{lid}"] = init_param(keys[2 + 4 * lid],
                                             self.initializer, (d, d))
            params[f"b1_{lid}"] = init_param(keys[3 + 4 * lid],
                                             self.initializer, (d,))
            params[f"W2_{lid}"] = init_param(keys[4 + 4 * lid],
                                             self.initializer, (d, d))
            params[f"b2_{lid}"] = init_param(keys[5 + 4 * lid],
                                             self.initializer, (d,))
        return params

    def _propagate(self, params, aux, train=False, key=None):
        n = self.meta.user_nums + self.meta.item_nums
        ego = jnp.concatenate([params["P"], params["Q"]], axis=0)
        outs = [ego]
        for lid in range(self.n_layers):
            agg = _adj_apply(aux, ego, n)
            side = (agg + ego) @ params[f"W1_{lid}"] + params[f"b1_{lid}"]
            inter = (agg * ego) @ params[f"W2_{lid}"] + params[f"b2_{lid}"]
            ego = jax.nn.leaky_relu(side + inter, 0.2)
            if train and key is not None and self.message_dropout > 0:
                key, sub = jax.random.split(key)
                keep = jax.random.bernoulli(sub, 1 - self.message_dropout,
                                            ego.shape)
                ego = jnp.where(keep, ego / (1 - self.message_dropout), 0.0)
            norm = jax.lax.rsqrt(jnp.sum(jnp.square(ego), axis=1,
                                         keepdims=True) + 1e-12)
            outs.append(ego * norm)
        final = jnp.concatenate(outs, axis=1)
        return final[: self.meta.user_nums], final[self.meta.user_nums:]

    def loss(self, params: Params, batch, aux: Aux):
        w = batch["w"]
        u_g, i_g = self._propagate(params, aux, train=True,
                                   key=batch.get("dropout_key"))
        ue = u_g[batch["u"]]
        s_i = jnp.sum(ue * i_g[batch["i"]], axis=1)
        s_j = jnp.sum(ue * i_g[batch["j"]], axis=1)
        main = bpr_loss(s_i - s_j, weight=w)
        wc = w[:, None]
        reg = (l2_loss(ue * wc) + l2_loss(i_g[batch["i"]] * wc)
               + l2_loss(i_g[batch["j"]] * wc))
        return main + self.reg * reg

    def score_pairs(self, params: Params, u, i, aux: Aux):
        u_g, i_g = self._propagate(params, aux)
        return jnp.sum(u_g[u] * i_g[i], axis=1)

    def score_candidates(self, params: Params, u, cand, aux: Aux):
        u_g, i_g = self._propagate(params, aux)
        return jnp.einsum("bd,bcd->bc", u_g[u], i_g[cand])

    def score_all(self, params: Params, u, aux: Aux):
        u_g, i_g = self._propagate(params, aux)
        return jnp.dot(u_g[u], i_g.T, preferred_element_type=jnp.float32)
