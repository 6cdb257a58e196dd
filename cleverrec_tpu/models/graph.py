"""Graph-attention social models: RML_DGATs and SoHRML.

Both are dual-domain metric learners (``cml_like``): hinge losses over
item-domain (u, i, j) and social-domain (u, v, w) triples, combined as
loss_i + gamma * loss_s plus neighborhood/distance regularizers
(RML_DGATs.py:148-166, SoHRML.py:200-218).  Batch protocol: each epoch
splits BOTH domains into ``train_batches`` slices consumed together
(train_model_sohrml, RankingRecommender.py:179-195).

- RML_DGATs (model/ranking/RML_DGATs.py): single-layer GATs over
  FIXED-SIZE sampled neighbor tables (utils/tools.py:212-246): user's
  item neighbors, item's user neighbors, user's friends — each padded
  with a sentinel row.  Attention types 0/1/2; the self node is appended
  to its own neighbor list (:89-91); aggregate then
  leaky_relu(x @ W_gat) (:98-100).  Relation vectors via mlp_type
  (:105-120), distances ||p + r - q||^2.
- SoHRML (model/ranking/SoHRML.py): FULL-graph multi-layer GAT over the
  (A+I) bipartite adjacency and the social (T+I) adjacency, with a
  per-epoch attention refresh: edge scores from the current embeddings
  (:81-100) -> row-softmax -> a new attentive adjacency consumed by the
  next epoch's propagation (RankingRecommender.py:157-176).  We hold the
  edge list as static COO index arrays and the attention values as a
  device array recomputed by a jitted ``pre_epoch``; propagation is a
  per-row segment-sum (the reference's 100-fold splitting is pure memory
  relief on its GPU — not needed here).  Node dropout drops edges
  (scale 1/(1-p)); message dropout after each layer; both train-only.
  Full-catalog prediction is implemented via the propagated embeddings
  (the reference left ``_predict``'s full-catalog branch as ``pass``,
  SoHRML.py:232-236 — loo/sampled candidates are its supported mode).

Deviation noted for parity review: the reference's TF1 ``tf.nn.dropout``
inside att_type=2 scoring has no train/test switch and is therefore
active at evaluation time too (RML_DGATs.py:95, SoHRML.py:96-100); we
apply dropout only during training, which is the models' published
semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cleverrec_tpu.common import pairwise_loss, init_param
from cleverrec_tpu.data.social import flatten_friend_edges
from cleverrec_tpu.models.base import Aux, Params, RecModel
from cleverrec_tpu.models.modules import relu_mlp_logits
from cleverrec_tpu.sampling import build_member_table


def _social_arrays(user_friends, user_nums):
    """Flat positive friend pairs + a membership table for w-negatives."""
    sf_u, sf_v = flatten_friend_edges(user_friends)
    tbl = build_member_table(user_friends, user_nums, user_nums)
    return (sf_u, sf_v, tbl)


def _uniform_row_values(rows, n_rows) -> np.ndarray:
    """Per-edge 1/deg(row): the uniform row-softmax over an edge list."""
    deg = np.zeros(n_rows)
    np.add.at(deg, rows, 1.0)
    return (1.0 / np.maximum(deg[rows], 1.0)).astype(np.float32)


def _sample_fixed_neighbors(sets: dict[int, list[int]], n_entities: int,
                            width: int, sentinel: int,
                            rng: np.random.Generator) -> np.ndarray:
    """Fixed-width neighbor table: subsample when longer, sentinel-pad when
    shorter (utils/tools.py:212-246 scheme)."""
    out = np.full((n_entities, width), sentinel, dtype=np.int32)
    for e, ids in sets.items():
        if len(ids) > width:
            out[e] = rng.choice(ids, size=width, replace=False)
        else:
            out[e, : len(ids)] = ids
    return out


class _DualDomainBase(RecModel):
    sampler = "dual"
    cml_like = True

    def __init__(self, cfg, meta):
        super().__init__(cfg, meta)
        cfg.require("embed_size", "atten_size", "gamma", "reg1", "reg2",
                    "margin", "att_type", "mlp_type", "train_batches")
        self.embed_size = cfg.int("embed_size")
        self.atten_size = cfg.int("atten_size")
        self.gamma = cfg.float("gamma")
        self.reg1 = cfg.float("reg1")
        self.reg2 = cfg.float("reg2")
        self.margin = cfg.float("margin")
        self.att_type = cfg.int("att_type")
        self.mlp_type = cfg.int("mlp_type")
        self.train_batches = cfg.int("train_batches")

    def _mlp_param_shapes(self):
        shapes = {}
        d = self.embed_size
        for lid in range(self.mlp_type):
            w = min(self.mlp_type - lid, 2) * d
            in_w = 2 * d if lid == 0 else min(self.mlp_type - lid + 1, 2) * d
            shapes[f"W_mlp_{lid}"] = (in_w, w)
            shapes[f"b_mlp_{lid}"] = (w,)
        return shapes

    def _relation(self, params, a, b):
        """mlp_type 0: elementwise product; else an MLP tower on concat
        (RML_DGATs.py:105-120).  Operands may be broadcastable (eval
        passes [B, 1, d] vs [B, C, d]); concatenate requires equal
        leading dims, so broadcast explicitly (the reference tiles both
        sides in its is_test path)."""
        if self.mlp_type == 0:
            return a * b
        shape = jnp.broadcast_shapes(a.shape, b.shape)
        a = jnp.broadcast_to(a, shape)
        b = jnp.broadcast_to(b, shape)
        x = jnp.concatenate([a, b], axis=-1)
        for lid in range(self.mlp_type):
            x = jax.nn.relu(x @ params[f"W_mlp_{lid}"]
                            + params[f"b_mlp_{lid}"])
        return x

    def _domain_losses(self, batch, ue_i, ie, je, un_i, in_, jn,
                       ue_s, ve, we, un_s, vn, wn, params):
        w_i = batch["w"]
        w_s = batch["w_s"]
        ui_vec = self._relation(params, un_i, in_)
        uj_vec = self._relation(params, un_i, jn)
        uv_vec = self._relation(params, un_s, vn)
        uw_vec = self._relation(params, un_s, wn)
        d_ui = jnp.sum(jnp.square(ue_i + ui_vec - ie), axis=1)
        d_uj = jnp.sum(jnp.square(ue_i + uj_vec - je), axis=1)
        d_uv = jnp.sum(jnp.square(ue_s + uv_vec - ve), axis=1)
        d_uw = jnp.sum(jnp.square(ue_s + uw_vec - we), axis=1)
        # The reference dispatches get_loss(self.loss_func, ...) here
        # (RML_DGATs.py / SoHRML.py) — honor a configured bpr too.
        loss_i = pairwise_loss(self.loss_func, d_ui - d_uj,
                               margin=self.margin, weight=w_i)
        loss_s = pairwise_loss(self.loss_func, d_uv - d_uw,
                               margin=self.margin, weight=w_s)
        wc_i = w_i[:, None]
        wc_s = w_s[:, None]
        reg_nbr = (jnp.sum(jnp.square((ue_i - un_i) * wc_i))
                   + jnp.sum(jnp.square((ie - in_) * wc_i))
                   + jnp.sum(jnp.square((ue_s - un_s) * wc_s))
                   + jnp.sum(jnp.square((ve - vn) * wc_s)))
        reg_dist = (jnp.sum(jnp.square((d_ui + self.margin - d_uj) * w_i))
                    + jnp.sum(jnp.square((d_uv + self.margin - d_uw) * w_s)))
        return (loss_i + self.gamma * loss_s
                + self.reg1 * reg_nbr + self.reg2 * reg_dist)


class RML_DGATs(_DualDomainBase):
    name = "RML_DGATs"

    def __init__(self, cfg, meta):
        super().__init__(cfg, meta)
        cfg.require("max_i", "max_s")
        self.max_i = cfg.int("max_i")
        self.max_s = cfg.int("max_s")

    def build_aux(self, device_data, data) -> dict:
        if data.user_friends is None:
            raise ValueError("RML_DGATs requires social_file")
        rng = np.random.default_rng(self.cfg.seed)
        u, i = self.meta.user_nums, self.meta.item_nums
        iu: dict[int, list[int]] = {}
        for uu, items in data.ui_train.items():
            for it in items:
                iu.setdefault(it, []).append(uu)
        u_hist_max = max((len(v) for v in data.ui_train.values()), default=1)
        i_hist_max = max((len(v) for v in iu.values()), default=1)
        s_max = max((len(v) for v in data.user_friends.values()), default=1)
        w_ui = self.max_i if 0 < self.max_i < u_hist_max else u_hist_max
        w_iu = self.max_i if 0 < self.max_i < i_hist_max else i_hist_max
        w_s = self.max_s if 0 < self.max_s < s_max else s_max
        sf_u, sf_v, friends_tbl = _social_arrays(data.user_friends, u)
        return {
            "user_nbrs_i": _sample_fixed_neighbors(data.ui_train, u, w_ui,
                                                   i, rng),
            "item_nbrs": _sample_fixed_neighbors(iu, i, w_iu, u, rng),
            "user_nbrs_s": _sample_fixed_neighbors(data.user_friends, u,
                                                   w_s, u, rng),
            "sf_u": sf_u, "sf_v": sf_v, "friends_tbl": friends_tbl,
        }

    def init(self, key) -> Params:
        d, a = self.embed_size, self.atten_size
        keys = jax.random.split(key, 6 + 2 * self.mlp_type)
        params: Params = {
            "P": init_param(keys[0], self.initializer,
                            (self.meta.user_nums + 1, d)),
            "Q": init_param(keys[1], self.initializer,
                            (self.meta.item_nums + 1, d)),
            "W": init_param(keys[2], self.initializer, (2 * d, a)),
            "h": init_param(keys[3], self.initializer, (a,)),
            "b": init_param(keys[4], self.initializer, (a,)),
            "W_gat": init_param(keys[5], self.initializer, (d, d)),
        }
        for lid, (k, shape) in enumerate(self._mlp_param_shapes().items()):
            params[k] = init_param(keys[6 + lid], self.initializer, shape)
        return params

    def _gat(self, params, nbr_table, idx, own_embed, sentinel, embed_mat,
             train: bool, key=None):
        """Single-layer neighbor attention + GAT transform
        (RML_DGATs.py:75-102)."""
        nbrs = nbr_table[idx]                              # [B, n]
        exists = (nbrs != sentinel).astype(own_embed.dtype)
        ne = embed_mat[nbrs] * exists[:, :, None]          # [B, n, d]
        ne = jnp.concatenate([ne, own_embed[:, None, :]], axis=1)
        if self.att_type == 0:
            logits = jnp.einsum("bd,bnd->bn", own_embed, ne)
        elif self.att_type == 1:
            logits = jax.nn.relu(jnp.einsum("bd,bnd->bn", own_embed, ne))
        else:
            x = jnp.concatenate(
                [jnp.broadcast_to(own_embed[:, None, :], ne.shape), ne],
                axis=-1)
            pre = x @ params["W"] + params["b"]
            if train and key is not None:
                keep = jax.random.bernoulli(key, 0.7, pre.shape)
                pre = jnp.where(keep, pre / 0.7, 0.0)
            logits = jax.nn.relu(pre) @ params["h"]
        att = jax.nn.softmax(logits, axis=1)
        agg = jnp.einsum("bn,bnd->bd", att, ne)
        return jax.nn.leaky_relu(agg @ params["W_gat"])

    def _reprs(self, params, aux, batch, train, key):
        u, i, j = batch["u"], batch["i"], batch["j"]
        us, v, w = batch["u_s"], batch["v"], batch["w_neg"]
        P, Q = params["P"], params["Q"]
        U, I = self.meta.user_nums, self.meta.item_nums
        keys = (jax.random.split(key, 6) if key is not None else [None] * 6)
        un_i = self._gat(params, aux["user_nbrs_i"], u, P[u], I, Q, train,
                         keys[0])
        in_ = self._gat(params, aux["item_nbrs"], i, Q[i], U, P, train,
                        keys[1])
        jn = self._gat(params, aux["item_nbrs"], j, Q[j], U, P, train,
                       keys[2])
        un_s = self._gat(params, aux["user_nbrs_s"], us, P[us], U, P, train,
                         keys[3])
        vn = self._gat(params, aux["user_nbrs_s"], v, P[v], U, P, train,
                       keys[4])
        wn = self._gat(params, aux["user_nbrs_s"], w, P[w], U, P, train,
                       keys[5])
        return (P[u], Q[i], Q[j], un_i, in_, jn,
                P[us], P[v], P[w], un_s, vn, wn)

    def loss(self, params: Params, batch, aux: Aux):
        reprs = self._reprs(params, aux, batch, train=True,
                            key=batch.get("dropout_key"))
        return self._domain_losses(batch, *reprs, params=params)

    def score_pairs(self, params: Params, u, i, aux: Aux):
        P, Q = params["P"], params["Q"]
        U, I = self.meta.user_nums, self.meta.item_nums
        un_i = self._gat(params, aux["user_nbrs_i"], u, P[u], I, Q, False)
        in_ = self._gat(params, aux["item_nbrs"], i, Q[i], U, P, False)
        r = self._relation(params, un_i, in_)
        return jnp.sum(jnp.square(P[u] + r - Q[i]), axis=1)

    SCORE_ALL_CHUNK = 512

    def score_candidates(self, params: Params, u, cand, aux: Aux):
        """Candidate scoring with the USER-side GAT computed once per user
        (the default flattened path recomputes it per candidate)."""
        P, Q = params["P"], params["Q"]
        U, I = self.meta.user_nums, self.meta.item_nums
        b, c = cand.shape
        un_i = self._gat(params, aux["user_nbrs_i"], u, P[u], I, Q, False)
        cc = 16
        n_chunks = -(-c // cc)
        pad = n_chunks * cc - c
        cand_p = jnp.pad(cand, ((0, 0), (0, pad)))
        chunks = jnp.moveaxis(cand_p.reshape(b, n_chunks, cc), 1, 0)

        def one(c_chunk):                               # [B, cc]
            flat = c_chunk.reshape(-1)
            in_ = self._gat(params, aux["item_nbrs"], flat, Q[flat], U, P,
                            False)                      # [B*cc, d]
            un_rep = jnp.repeat(un_i, cc, axis=0)
            r = self._relation(params, un_rep, in_)
            pu = jnp.repeat(P[u], cc, axis=0)
            d = jnp.sum(jnp.square(pu + r - Q[flat]), axis=1)
            return d.reshape(b, cc)

        out = jax.lax.map(one, chunks)
        out = jnp.moveaxis(out, 0, 1).reshape(b, n_chunks * cc)
        return out[:, :c]


class SoHRML(_DualDomainBase):
    name = "SoHRML"
    # [B, chunk, d] relation intermediates: keep chunks small like
    # RML_DGATs.
    SCORE_ALL_CHUNK = 512

    def __init__(self, cfg, meta):
        super().__init__(cfg, meta)
        cfg.require("gat_layer_nums", "node_dropout", "message_dropout",
                    "max_i", "max_s")
        self.gat_layers = cfg.int("gat_layer_nums")
        self.node_dropout = cfg.float("node_dropout")
        self.message_dropout = cfg.float("message_dropout")
        self.max_i = cfg.int("max_i")
        self.max_s = cfg.int("max_s")

    def build_aux(self, device_data, data) -> dict:
        if data.user_friends is None:
            raise ValueError("SoHRML requires social_file")
        rng = np.random.default_rng(self.cfg.seed)
        U, I = self.meta.user_nums, self.meta.item_nums
        # Item-domain bipartite adjacency over U+I nodes: R in the top-right
        # block, R^T bottom-left, + self loops (utils/tools.py:249-276),
        # neighbor lists subsampled to max_i when positive.
        rows_i, cols_i = [], []
        iu: dict[int, list[int]] = {}
        for u, items in data.ui_train.items():
            for it in items:
                iu.setdefault(it, []).append(u)
            sel = (rng.choice(items, self.max_i, replace=False)
                   if 0 < self.max_i < len(items) else items)
            for it in sel:
                rows_i.append(u)
                cols_i.append(U + it)
        for it, users in iu.items():
            sel = (rng.choice(users, self.max_i, replace=False)
                   if 0 < self.max_i < len(users) else users)
            for u in sel:
                rows_i.append(U + it)
                cols_i.append(u)
        for n in range(U + I):
            rows_i.append(n)
            cols_i.append(n)
        # Social adjacency over U nodes + self loops (utils/tools.py:279-298).
        rows_s, cols_s = [], []
        for u, friends in data.user_friends.items():
            sel = (rng.choice(friends, self.max_s, replace=False)
                   if 0 < self.max_s < len(friends) else friends)
            for v in sel:
                rows_s.append(u)
                cols_s.append(v)
        for n in range(U):
            rows_s.append(n)
            cols_s.append(n)
        sf_u, sf_v, friends_tbl = _social_arrays(data.user_friends, U)
        return {
            "friends_tbl": friends_tbl,
            "adj_i_row": np.asarray(rows_i, np.int32),
            "adj_i_col": np.asarray(cols_i, np.int32),
            "adj_s_row": np.asarray(rows_s, np.int32),
            "adj_s_col": np.asarray(cols_s, np.int32),
            # Attention values refreshed per epoch (pre_epoch); start at
            # the true uniform row-softmax (1/row-degree) so scoring a
            # freshly-initialized model is already well-defined.
            "att_i": _uniform_row_values(rows_i, U + I),
            "att_s": _uniform_row_values(rows_s, U),
            "sf_u": sf_u, "sf_v": sf_v,
        }

    def init(self, key) -> Params:
        d, a = self.embed_size, self.atten_size
        n_mlp = len(self._mlp_param_shapes())
        keys = jax.random.split(key, 5 + 2 * self.gat_layers + n_mlp)
        params: Params = {
            "P": init_param(keys[0], self.initializer,
                            (self.meta.user_nums, d)),
            "Q": init_param(keys[1], self.initializer,
                            (self.meta.item_nums, d)),
            "W": init_param(keys[2], self.initializer, (2 * d, a)),
            "h": init_param(keys[3], self.initializer, (a,)),
            "b": init_param(keys[4], self.initializer, (a,)),
        }
        ofs = 5
        for lid in range(self.gat_layers):
            params[f"W_gat_{lid}"] = init_param(keys[ofs], self.initializer,
                                                (d, d))
            params[f"b_gat_{lid}"] = init_param(keys[ofs + 1],
                                                self.initializer, (d,))
            ofs += 2
        for k, shape in self._mlp_param_shapes().items():
            params[k] = init_param(keys[ofs], self.initializer, shape)
            ofs += 1
        return params

    # -- per-epoch attention refresh (RankingRecommender.py:157-176) ------
    def pre_epoch(self, params, arrays):
        """Recompute edge attention from current embeddings + row softmax.
        Returns updated entries for the arrays dict."""
        ego_i = jnp.concatenate([params["P"], params["Q"]], axis=0)
        scores_i = self._edge_scores(params, ego_i, arrays["adj_i_row"],
                                     arrays["adj_i_col"])
        scores_s = self._edge_scores(params, params["P"],
                                     arrays["adj_s_row"],
                                     arrays["adj_s_col"])
        n_i = self.meta.user_nums + self.meta.item_nums
        att_i = self._row_softmax(scores_i, arrays["adj_i_row"], n_i)
        att_s = self._row_softmax(scores_s, arrays["adj_s_row"],
                                  self.meta.user_nums)
        return {"att_i": att_i, "att_s": att_s}

    def _edge_scores(self, params, embed, rows, cols):
        re = embed[rows]
        ce = embed[cols]
        if self.att_type == 0:
            return jnp.sum(re * ce, axis=1)
        if self.att_type == 1:
            return jax.nn.relu(jnp.sum(re * ce, axis=1))
        x = jnp.concatenate([re, ce], axis=1)
        return relu_mlp_logits(x, params["W"], params["b"], params["h"])

    @staticmethod
    def _row_softmax(scores, rows, n_rows):
        m = jax.ops.segment_max(scores, rows, num_segments=n_rows)
        e = jnp.exp(scores - m[rows])
        denom = jax.ops.segment_sum(e, rows, num_segments=n_rows)
        return e / jnp.maximum(denom[rows], 1e-30)

    def _propagate(self, params, aux, train: bool, key=None):
        """Multi-layer attentive propagation over both graphs
        (SoHRML.py:146-184)."""
        U, I = self.meta.user_nums, self.meta.item_nums
        ego_i = jnp.concatenate([params["P"], params["Q"]], axis=0)
        ego_s = params["P"]
        att_i = aux["att_i"]
        att_s = aux["att_s"]
        if train and key is not None and self.node_dropout > 0:
            k1, k2, key = jax.random.split(key, 3)
            keep_i = jax.random.bernoulli(k1, 1 - self.node_dropout,
                                          att_i.shape)
            att_i = jnp.where(keep_i, att_i / (1 - self.node_dropout), 0.0)
            keep_s = jax.random.bernoulli(k2, 1 - self.node_dropout,
                                          att_s.shape)
            att_s = jnp.where(keep_s, att_s / (1 - self.node_dropout), 0.0)
        for lid in range(self.gat_layers):
            agg_i = jax.ops.segment_sum(
                att_i[:, None] * ego_i[aux["adj_i_col"]],
                aux["adj_i_row"], num_segments=U + I)
            agg_s = jax.ops.segment_sum(
                att_s[:, None] * ego_s[aux["adj_s_col"]],
                aux["adj_s_row"], num_segments=U)
            w, b = params[f"W_gat_{lid}"], params[f"b_gat_{lid}"]
            ego_i = jax.nn.leaky_relu(agg_i @ w + b)
            ego_s = jax.nn.leaky_relu(agg_s @ w + b)
            if train and key is not None and self.message_dropout > 0:
                kd1, kd2, key = jax.random.split(key, 3)
                keep = jax.random.bernoulli(kd1, 1 - self.message_dropout,
                                            ego_i.shape)
                ego_i = jnp.where(keep, ego_i / (1 - self.message_dropout), 0.0)
                keep = jax.random.bernoulli(kd2, 1 - self.message_dropout,
                                            ego_s.shape)
                ego_s = jnp.where(keep, ego_s / (1 - self.message_dropout), 0.0)
        return ego_i[:U], ego_i[U:], ego_s

    def loss(self, params: Params, batch, aux: Aux):
        u_g, i_g, s_g = self._propagate(params, aux, train=True,
                                        key=batch.get("dropout_key"))
        u, i, j = batch["u"], batch["i"], batch["j"]
        us, v, w = batch["u_s"], batch["v"], batch["w_neg"]
        reprs = (params["P"][u], params["Q"][i], params["Q"][j],
                 u_g[u], i_g[i], i_g[j],
                 params["P"][us], params["P"][v], params["P"][w],
                 s_g[us], s_g[v], s_g[w])
        return self._domain_losses(batch, *reprs, params=params)

    def score_pairs(self, params: Params, u, i, aux: Aux):
        u_g, i_g, _ = self._propagate(params, aux, train=False)
        r = self._relation(params, u_g[u], i_g[i])
        return jnp.sum(jnp.square(params["P"][u] + r - params["Q"][i]),
                       axis=1)

    def score_candidates(self, params: Params, u, cand, aux: Aux):
        # Propagate ONCE per batch, then score all candidates.
        u_g, i_g, _ = self._propagate(params, aux, train=False)
        r = self._relation(params, u_g[u][:, None, :], i_g[cand])
        diff = params["P"][u][:, None, :] + r - params["Q"][cand]
        return jnp.sum(jnp.square(diff), axis=-1)

    def score_all(self, params: Params, u, aux: Aux):
        # Full-catalog scoring via the propagated embeddings (the reference
        # left this branch unimplemented, SoHRML.py:232-236).  Items are
        # chunked: the [B, I, d] relation/diff intermediates would cost
        # d times the [B, I] score budget at social-catalog scale.
        u_g, i_g, _ = self._propagate(params, aux, train=False)
        item_nums = self.meta.item_nums
        chunk = min(self.SCORE_ALL_CHUNK, item_nums)
        n_chunks = -(-item_nums // chunk)
        items = (jnp.arange(n_chunks * chunk, dtype=jnp.int32)
                 % item_nums).reshape(n_chunks, chunk)
        ug, pu = u_g[u], params["P"][u]

        def one(chunk_items):
            r = self._relation(params, ug[:, None, :],
                               i_g[chunk_items][None, :, :])
            diff = pu[:, None, :] + r - params["Q"][chunk_items][None, :, :]
            return jnp.sum(jnp.square(diff), axis=-1)

        scores = jax.lax.map(one, items)            # [n_chunks, B, chunk]
        scores = jnp.moveaxis(scores, 0, 1).reshape(u.shape[0], -1)
        return scores[:, :item_nums]
