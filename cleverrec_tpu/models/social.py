"""Social models: SBPR, CUNE_BPR, SAMN (+ SAMN_single alias).

Math parity:
- SBPR (model/ranking/SBPR.py:41-66): triple ranking i > social-item k >
  negative j; loss = bpr((x_ui - x_uk)/suk) + bpr(x_uk - x_uj) +
  reg * l2 over all gathered embeddings and biases; x has an item bias;
  full-catalog predict is P[u] @ Q^T WITHOUT the bias (SBPR.py:62 — we
  reproduce that asymmetry).
- CUNE_BPR (model/ranking/CUNE_BPR.py:41-66): same triple loss but with
  a LEARNED scalar s: bpr(x_ui - x_uk) + bpr((x_uk - x_uj)/(s+1));
  friends are latent (deep-walk + skip-gram top-K cosine,
  utils/tools.py:130-209 — see data/social.py).
- SAMN (model/ranking/SAMN.py:56-107): memory-attended friend vectors
  (key-addressed memory over normalized joint embeddings), friend-level
  attention, u_vec = u_embed + u_frien.  Reference quirk reproduced:
  masked friend slots still receive softmax mass in the friend-level
  attention (their logits come from zeroed uf_vec rows -> h.ReLU(b)),
  they just contribute zero vectors (SAMN.py:77-85).  ``SAMN_single``
  shares this implementation — the reference's per-user variant computes
  the same math one user at a time (SAMN_single.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from cleverrec_tpu.common import bpr_loss, l2_loss, pairwise_loss
from cleverrec_tpu.models.base import Aux, Params, RecModel
from cleverrec_tpu.models.modules import relu_mlp_logits
from cleverrec_tpu.sampling import build_member_table


def _union_table(ui_train, social_sets, user_nums, item_nums):
    """MemberTable of seen(u) UNION the given social item sets — the
    exclusion set of the social-family negative draw.  Built WITH a
    complement table when it fits the budget (zero-rejection draws)."""
    union = {}
    for u, items in ui_train.items():
        union[u] = list(items)
    for sets in social_sets:
        for u, items in sets.items():
            union.setdefault(u, [])
            union[u] = union[u] + list(items)
    # Union members per user can approach catalog size (a user's
    # friends' items) — skip the max-width rows plane (need_rows=False)
    # and build the GB-scale complement ON DEVICE from the 32x-smaller
    # bitmap (sampling.attach_device_complement) instead of uploading.
    from cleverrec_tpu.sampling import attach_device_complement
    return attach_device_complement(
        build_member_table(union, user_nums, item_nums,
                           need_rows=False, complement_budget=0),
        item_nums)


class _SocialTripleBase(RecModel):
    """Shared SBPR/CUNE machinery: SPu aux tables + restricted epoch."""

    sampler = "sbpr"
    # Multi-plane fused epoch (ops/pallas_train.py fused_rows_epoch):
    # the per-row triple loss is differentiated inside the kernel.
    fused_protocol = "rows"

    def __init__(self, cfg, meta):
        super().__init__(cfg, meta)
        cfg.require("embed_size", "reg")
        self.embed_size = cfg.int("embed_size")
        self.reg = cfg.float("reg")
        self._fused_spec = None

    def _rows_pack_unpack(self):
        """Item table packing for the fused rows kernel: the bias rides
        as an extra column of Q ([Q | bias[:I]]); the bias vector's
        trailing (I+1)-th element is the eval-candidate PAD slot — never
        gathered in training, so it passes through unchanged (zero grads
        in the scan path too)."""
        d, item_nums = self.embed_size, self.meta.item_nums

        def pack(t):
            return (t["P"],
                    jnp.concatenate([t["Q"], t["bias"][:item_nums, None]],
                                    axis=1), ())

        def unpack(orig, pu, qi, dense):
            return {"P": pu, "Q": qi[:, :d],
                    "bias": jnp.concatenate([qi[:, d],
                                             orig["bias"][item_nums:]])}

        return pack, unpack

    def _rows_x(self, ue, r):
        """x(u, m) = <P[u], Q[m]> + bias[m] over packed item rows."""
        d = self.embed_size
        return (jnp.sum(ue * r[:, :d], axis=1, keepdims=True)
                + r[:, d:d + 1])

    def _rows_reg(self, ue, item_rows, w):
        d = self.embed_size
        terms = l2_loss(ue * w)
        for r in item_rows:
            terms += l2_loss(r[:, :d] * w)
            terms += l2_loss(r[:, d:d + 1] * w)
        return terms

    # Subclasses fill self._spu/self._suk in build_aux.
    def _social_aux(self, device_data, spu, suk, ui_train):
        # The SPu lists live CSR-flat for the social-item draw (a padded
        # [U, max_len] plane was ~20x sentinel waste at Epinions scale);
        # the MemberTable keeps only lens + bitmap (rejection fallback).
        # The union (seen | SPu) gets its OWN MemberTable so the
        # negative draw is a zero-rejection complement gather (or a
        # single-set bitmap rejection) instead of a two-set rejection —
        # the social epochs are sampler-bound, so this is the hot path.
        from cleverrec_tpu.sampling import build_csr_lists
        t = build_member_table(spu, self.meta.user_nums, self.meta.item_nums,
                               complement_budget=0, need_rows=False)
        # Restrict epoch pairs to users with social positives
        # (utils/sampler.py:105-106).
        has = np.zeros(self.meta.user_nums, bool)
        has[list(spu.keys())] = True
        keep = has[device_data.pos_u]
        self._pos_u = device_data.pos_u[keep]
        self._pos_i = device_data.pos_i[keep]
        # complement_budget=0 above => t.complement is already None.
        return {"spu": t,
                "spu_csr": build_csr_lists(spu, self.meta.user_nums,
                                           aux=suk),
                "social_neg": _union_table(ui_train, (spu,),
                                           self.meta.user_nums,
                                           self.meta.item_nums)}

    def epoch_pairs(self, device_data):
        return self._pos_u, self._pos_i

    def init(self, key) -> Params:
        P, Q = self._embed_tables(
            key,
            (self.meta.user_nums, self.embed_size),
            (self.meta.item_nums, self.embed_size))
        params = {"P": P, "Q": Q,
                  "bias": jnp.zeros(self.meta.item_nums + 1)}
        return params

    def _x(self, params, ue, idx):
        return (jnp.sum(ue * params["Q"][idx], axis=1)
                + params["bias"][idx])

    def _reg_terms(self, params, batch, w):
        wc = w[:, None]
        terms = 0.0
        for key in ("i", "k", "j"):
            idx = batch[key]
            terms += l2_loss(params["Q"][idx] * wc)
            terms += l2_loss(params["bias"][idx] * w)
        terms += l2_loss(params["P"][batch["u"]] * wc)
        return terms

    def score_pairs(self, params: Params, u, i, aux: Aux):
        return self._x(params, params["P"][u], i)

    def score_all(self, params: Params, u, aux: Aux):
        # Reference full-catalog path omits the bias (SBPR.py:62).
        return jnp.dot(params["P"][u], params["Q"].T,
                       preferred_element_type=jnp.float32)

    def dot_decomposition(self, params: Params, u, aux: Aux):
        return params["P"][u], params["Q"], None


class SBPR(_SocialTripleBase):
    name = "SBPR"

    def build_aux(self, device_data, data) -> dict:
        from cleverrec_tpu.data.social import build_spu
        if data.user_friends is None:
            raise ValueError("SBPR requires social_file")
        spu, suk = build_spu(data.ui_train, data.user_friends)
        return self._social_aux(device_data, spu, suk, data.ui_train)

    def loss(self, params: Params, batch, aux: Aux):
        w = batch["w"]
        ue = params["P"][batch["u"]]
        x_ui = self._x(params, ue, batch["i"])
        x_uk = self._x(params, ue, batch["k"])
        x_uj = self._x(params, ue, batch["j"])
        suk = jnp.maximum(batch["suk"], 1.0)
        main = (bpr_loss((x_ui - x_uk) / suk, weight=w)
                + bpr_loss(x_uk - x_uj, weight=w))
        return main + self.reg * self._reg_terms(params, batch, w)

    def fused_rows_spec(self):
        """Spec for the multi-plane fused epoch: SBPR.loss verbatim over
        gathered [P[u]] / [Q|bias] rows, suk as a float column."""
        if self._fused_spec is not None:
            return self._fused_spec
        reg = self.reg
        pack, unpack = self._rows_pack_unpack()

        def row_loss(rows, floats, dense, w):
            ue, ri, rk, rj = rows
            x_ui = self._rows_x(ue, ri)
            x_uk = self._rows_x(ue, rk)
            x_uj = self._rows_x(ue, rj)
            suk = jnp.maximum(floats[0], 1.0)
            main = (jnp.sum(-jax.nn.log_sigmoid((x_ui - x_uk) / suk) * w)
                    + jnp.sum(-jax.nn.log_sigmoid(x_uk - x_uj) * w))
            return main + reg * self._rows_reg(ue, (ri, rk, rj), w)

        self._fused_spec = {
            "planes": (("u", "u"), ("i", "i"), ("k", "i"), ("j", "i")),
            "floats": ("suk",), "dense": (),
            "pack": pack, "unpack": unpack, "row_loss": row_loss,
            "tw_u": self.embed_size, "tw_i": self.embed_size + 1,
            "dense_elems": 0,
        }
        return self._fused_spec


class TBPR(_SocialTripleBase):
    """TBPR: Social recommendation with strong and weak ties (CIKM 2016).

    Advertised by the reference (README.md:17) but model/ranking/TBPR.py
    is 0 bytes — this is a fresh implementation from the paper.  Ties are
    partitioned by neighborhood-overlap strength (data/social.py
    build_tie_partitioned_spu, ``strong_ratio`` knob); items consumed by
    strong vs weak ties form intermediate preference levels in a 4-level
    BPR chain:

        L = bpr(x_ui - x_us) + bpr(x_us - x_ut) + bpr(x_ut - x_uj) + reg

    with x(u, m) = <P[u], Q[m]> + bias[m] (the SBPR-family score form)
    over users that have BOTH tie classes (analogous to the reference's
    SBPR restriction to users with social positives).
    """

    name = "TBPR"
    sampler = "tbpr"

    def build_aux(self, device_data, data) -> dict:
        from cleverrec_tpu.data.social import build_tie_partitioned_spu
        if data.user_friends is None:
            raise ValueError("TBPR requires social_file")
        from cleverrec_tpu.sampling import build_csr_lists
        strong, weak = build_tie_partitioned_spu(
            data.ui_train, data.user_friends,
            self.cfg.float("strong_ratio", 0.5))
        meta = self.meta
        t_s = build_member_table(strong, meta.user_nums, meta.item_nums,
                                 complement_budget=0, need_rows=False)
        t_w = build_member_table(weak, meta.user_nums, meta.item_nums,
                                 complement_budget=0, need_rows=False)
        has = np.zeros(meta.user_nums, bool)
        both = set(strong) & set(weak)
        has[list(both)] = True
        keep = has[device_data.pos_u]
        self._pos_u = device_data.pos_u[keep]
        self._pos_i = device_data.pos_i[keep]
        # complement_budget=0 above => no complement planes to strip.
        return {"tie_strong": t_s, "tie_weak": t_w,
                "ts_csr": build_csr_lists(strong, meta.user_nums),
                "tw_csr": build_csr_lists(weak, meta.user_nums),
                "social_neg": _union_table(data.ui_train, (strong, weak),
                                           meta.user_nums, meta.item_nums)}

    def _reg_terms(self, params, batch, w):
        wc = w[:, None]
        terms = l2_loss(params["P"][batch["u"]] * wc)
        for key in ("i", "s", "t", "j"):
            idx = batch[key]
            terms += l2_loss(params["Q"][idx] * wc)
            terms += l2_loss(params["bias"][idx] * w)
        return terms

    def loss(self, params: Params, batch, aux: Aux):
        w = batch["w"]
        ue = params["P"][batch["u"]]
        x_ui = self._x(params, ue, batch["i"])
        x_us = self._x(params, ue, batch["s"])
        x_ut = self._x(params, ue, batch["t"])
        x_uj = self._x(params, ue, batch["j"])
        main = (bpr_loss(x_ui - x_us, weight=w)
                + bpr_loss(x_us - x_ut, weight=w)
                + bpr_loss(x_ut - x_uj, weight=w))
        return main + self.reg * self._reg_terms(params, batch, w)

    def fused_rows_spec(self):
        """Spec for the multi-plane fused epoch: TBPR's 4-level BPR
        chain verbatim over 5 id planes."""
        if self._fused_spec is not None:
            return self._fused_spec
        reg = self.reg
        pack, unpack = self._rows_pack_unpack()

        def row_loss(rows, floats, dense, w):
            ue, ri, rs, rt, rj = rows
            x_ui = self._rows_x(ue, ri)
            x_us = self._rows_x(ue, rs)
            x_ut = self._rows_x(ue, rt)
            x_uj = self._rows_x(ue, rj)
            main = (jnp.sum(-jax.nn.log_sigmoid(x_ui - x_us) * w)
                    + jnp.sum(-jax.nn.log_sigmoid(x_us - x_ut) * w)
                    + jnp.sum(-jax.nn.log_sigmoid(x_ut - x_uj) * w))
            return main + reg * self._rows_reg(ue, (ri, rs, rt, rj), w)

        self._fused_spec = {
            "planes": (("u", "u"), ("i", "i"), ("s", "i"), ("t", "i"),
                       ("j", "i")),
            "floats": (), "dense": (),
            "pack": pack, "unpack": unpack, "row_loss": row_loss,
            "tw_u": self.embed_size, "tw_i": self.embed_size + 1,
            "dense_elems": 0,
        }
        return self._fused_spec


class CUNE_BPR(_SocialTripleBase):
    name = "CUNE_BPR"

    def __init__(self, cfg, meta):
        super().__init__(cfg, meta)
        cfg.require("walk_count", "walk_length", "walk_dim", "window_size",
                    "topk_f")

    def build_aux(self, device_data, data) -> dict:
        from cleverrec_tpu.data.social import build_cune_friends
        cfg = self.cfg
        friends, spu, suk = build_cune_friends(
            data.ui_train, self.meta.user_nums, self.meta.item_nums,
            cfg.int("walk_count"), cfg.int("walk_length"),
            cfg.int("walk_dim"), cfg.int("window_size"), cfg.int("topk_f"),
            seed=cfg.seed)
        return self._social_aux(device_data, spu, suk, data.ui_train)

    def init(self, key) -> Params:
        params = super().init(key)
        params["s"] = jnp.zeros(())   # learned social coefficient
        return params

    def loss(self, params: Params, batch, aux: Aux):
        w = batch["w"]
        ue = params["P"][batch["u"]]
        x_ui = self._x(params, ue, batch["i"])
        x_uk = self._x(params, ue, batch["k"])
        x_uj = self._x(params, ue, batch["j"])
        main = (bpr_loss(x_ui - x_uk, weight=w)
                + bpr_loss((x_uk - x_uj) / (params["s"] + 1.0), weight=w))
        return main + self.reg * self._reg_terms(params, batch, w)

    def fused_rows_spec(self):
        """Spec for the multi-plane fused epoch: CUNE_BPR.loss verbatim;
        the learned social coefficient s rides as a dense kernel param
        (delivered as [1, 1], broadcast-compatible with the scalar)."""
        if self._fused_spec is not None:
            return self._fused_spec
        reg = self.reg
        base_pack, base_unpack = self._rows_pack_unpack()

        def pack(t):
            pu, qi, _ = base_pack(t)
            return pu, qi, (t["s"],)

        def unpack(orig, pu, qi, dense):
            return {**base_unpack(orig, pu, qi, ()), "s": dense[0]}

        def row_loss(rows, floats, dense, w):
            ue, ri, rk, rj = rows
            x_ui = self._rows_x(ue, ri)
            x_uk = self._rows_x(ue, rk)
            x_uj = self._rows_x(ue, rj)
            s = dense[0]
            main = (jnp.sum(-jax.nn.log_sigmoid(x_ui - x_uk) * w)
                    + jnp.sum(-jax.nn.log_sigmoid(
                        (x_uk - x_uj) / (s + 1.0)) * w))
            return main + reg * self._rows_reg(ue, (ri, rk, rj), w)

        self._fused_spec = {
            "planes": (("u", "u"), ("i", "i"), ("k", "i"), ("j", "i")),
            "floats": (), "dense": ("s",),
            "pack": pack, "unpack": unpack, "row_loss": row_loss,
            "tw_u": self.embed_size, "tw_i": self.embed_size + 1,
            "dense_elems": 1,
        }
        return self._fused_spec


class SAMN(RecModel):
    name = "SAMN"
    sampler = "pairwise"
    # The memory-attended friend vector is item-independent and
    # dominates the per-row cost (an [F, d] gather + attention + an
    # [F, d] gradient scatter per pair row): train in the user-GROUPED
    # pairwise layout so it is computed once per (user, T-cell) group
    # (Trainer._build_pairwise_grouped_epoch).
    pairwise_grouped = True
    TARGET_CHUNK = 128

    def __init__(self, cfg, meta):
        super().__init__(cfg, meta)
        cfg.require("embed_size", "mem_size", "atten_size", "reg1", "reg2")
        self.embed_size = cfg.int("embed_size")
        self.mem_size = cfg.int("mem_size")
        self.atten_size = cfg.int("atten_size")
        self.reg1 = cfg.float("reg1")
        self.reg2 = cfg.float("reg2")

    def build_aux(self, device_data, data) -> dict:
        if device_data.friends_padded is None:
            raise ValueError("SAMN requires social_file")
        return {}

    def init(self, key) -> Params:
        d, m, a = self.embed_size, self.mem_size, self.atten_size
        P, Q, ib, Key, Mem, W3, b, h = self._embed_tables(
            key,
            (self.meta.user_nums + 1, d),   # sentinel friend row
            (self.meta.item_nums, d),
            (self.meta.item_nums,),
            (d, m), (m, d), (d, a), (a,), (a,))
        return {"P": P, "Q": Q, "i_b": ib, "Key": Key, "Mem": Mem,
                "W3": W3, "b": b, "h": h}

    def _user_vec(self, params, u, friends):
        """u_vec = u_embed + attention-weighted memory friend vectors
        (SAMN.py:56-89)."""
        ue = params["P"][u]                                # [B, d]
        fe = params["P"][friends]                          # [B, F, d]
        exists = (friends != self.meta.user_nums).astype(ue.dtype)  # [B, F]
        fe = fe * exists[:, :, None]
        # rsqrt(|x|^2 + eps) normalization: finite gradients for the
        # all-zero rows of masked friend slots (norm() NaNs at 0).
        un = ue * jax.lax.rsqrt(jnp.sum(jnp.square(ue), axis=1,
                                        keepdims=True) + 1e-12)
        fn = fe * jax.lax.rsqrt(jnp.sum(jnp.square(fe), axis=2,
                                        keepdims=True) + 1e-12)
        joint = un[:, None, :] * fn                        # [B, F, d]
        atten_key = jax.nn.softmax(joint @ params["Key"], axis=-1)
        atten_key = atten_key * exists[:, :, None]
        f_vec = (atten_key @ params["Mem"]) * fe           # [B, F, d]
        # Friend-level attention; masked slots keep their softmax mass
        # (reference behavior, SAMN.py:77-85).
        logits = relu_mlp_logits(f_vec, params["W3"], params["b"],
                                 params["h"])              # [B, F]
        att = jax.nn.softmax(logits, axis=1)
        u_frien = jnp.einsum("bf,bfd->bd", att, f_vec)
        return ue + u_frien

    def loss(self, params: Params, batch, aux: Aux):
        w = batch["w"]
        friends = aux["friends_padded"][batch["u"]]
        uv = self._user_vec(params, batch["u"], friends)
        ie = params["Q"][batch["i"]]
        je = params["Q"][batch["j"]]
        ib = params["i_b"][batch["i"]]
        jb = params["i_b"][batch["j"]]
        s_i = jnp.sum(uv * ie, axis=1) + ib
        s_j = jnp.sum(uv * je, axis=1) + jb
        main = pairwise_loss(self.loss_func, s_i - s_j, weight=w)
        wc = w[:, None]
        l2_1 = (l2_loss(uv * wc) + l2_loss(ie * wc) + l2_loss(je * wc)
                + l2_loss(ib * w) + l2_loss(jb * w))
        l2_2 = l2_loss(params["W3"]) + l2_loss(params["b"]) + l2_loss(params["h"])
        return main + self.reg1 * l2_1 + self.reg2 * l2_2

    def loss_grouped_pairwise(self, params: Params, batch, aux: Aux):
        """User-grouped pairwise loss: ``gu`` [G] users, ``gi``/``gj``
        [G, T] positive/negative cells, ``gw`` [G, T] validity.  Each
        valid (g, t) cell is exactly one flat-protocol pair row — same
        per-row main loss and regularizers as ``loss`` (uv's per-row L2
        becomes |uv_g|^2 times the group's valid-cell count) — but the
        friend attention runs once per GROUP."""
        gu, gi, gj, gw = batch["gu"], batch["gi"], batch["gj"], batch["gw"]
        friends = aux["friends_padded"][gu]
        uv = self._user_vec(params, gu, friends)            # [G, d]
        ie = params["Q"][gi]                                # [G, T, d]
        je = params["Q"][gj]
        ib = params["i_b"][gi]
        jb = params["i_b"][gj]
        s_i = jnp.einsum("gd,gtd->gt", uv, ie) + ib
        s_j = jnp.einsum("gd,gtd->gt", uv, je) + jb
        main = pairwise_loss(self.loss_func, s_i - s_j, weight=gw)
        wc = gw[..., None]
        l2_1 = (0.5 * jnp.sum(jnp.sum(uv * uv, axis=1) * jnp.sum(gw, axis=1))
                + l2_loss(ie * wc) + l2_loss(je * wc)
                + l2_loss(ib * gw) + l2_loss(jb * gw))
        l2_2 = (l2_loss(params["W3"]) + l2_loss(params["b"])
                + l2_loss(params["h"]))
        return main + self.reg1 * l2_1 + self.reg2 * l2_2

    def score_pairs(self, params: Params, u, i, aux: Aux):
        friends = aux["friends_padded"][u]
        uv = self._user_vec(params, u, friends)
        return jnp.sum(uv * params["Q"][i], axis=1) + params["i_b"][i]

    def score_candidates(self, params: Params, u, cand, aux: Aux):
        # Friend attention computed once per user, then one dot per cand.
        friends = aux["friends_padded"][u]
        uv = self._user_vec(params, u, friends)            # [B, d]
        ce = params["Q"][cand]                             # [B, C, d]
        return jnp.einsum("bd,bcd->bc", uv, ce) + params["i_b"][cand]

    def score_all(self, params: Params, u, aux: Aux):
        friends = aux["friends_padded"][u]
        uv = self._user_vec(params, u, friends)
        return (jnp.dot(uv, params["Q"].T,
                        preferred_element_type=jnp.float32)
                + params["i_b"][None, :])

    def dot_decomposition(self, params: Params, u, aux: Aux):
        friends = aux["friends_padded"][u]
        return self._user_vec(params, u, friends), params["Q"], params["i_b"]


class SAMNSingle(SAMN):
    """Alias: the reference's per-user SAMN variant (same math batched)."""

    name = "SAMN_single"
