"""Host-side social preprocessing: SPu sets and CUNE latent friends.

Parity targets:
- SPu (SBPR's social-positive item sets): union of a user's friends'
  train items minus the user's own (utils/tools.py:116-127), plus the
  per-item social coefficient suk = number of the user's friends who
  consumed that item (utils/sampler.py:122-130 — sample-independent, so
  precomputed here, aligned with the SORTED SPu rows used on device).
- CUNE (CUNE_BPR's latent friends, utils/tools.py:130-209): collaborative
  user network from co-consumption counts -> weighted greedy deep walks ->
  skip-gram user embeddings -> top-K cosine friends -> SPu over those.
  The reference uses gensim word2vec; this environment has none, so the
  embeddings come from a compact JAX skip-gram-negative-sampling trainer
  (same objective).  All randomness is seeded.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import scipy.sparse as sp


def flatten_friend_edges(user_friends: dict[int, list[int]]
                         ) -> tuple[np.ndarray, np.ndarray]:
    """{u: [v, ...]} -> flat (u, v) edge arrays (int32)."""
    sf_u, sf_v = [], []
    for u, friends in user_friends.items():
        for v in friends:
            sf_u.append(u)
            sf_v.append(v)
    return np.asarray(sf_u, np.int32), np.asarray(sf_v, np.int32)


def build_spu(ui_train: dict[int, list[int]],
              user_friends: dict[int, list[int]]):
    """Returns (SPu, suk): {u: sorted social items}, {u: aligned counts}."""
    spu: dict[int, list[int]] = {}
    suk: dict[int, list[int]] = {}
    friend_sets = {f: set(items) for f, items in ui_train.items()}
    for u, items in ui_train.items():
        friends = user_friends.get(u)
        if not friends:
            continue
        own = set(items)
        cnt: Counter = Counter()
        seen_friend = set()
        for f in friends:
            if f in seen_friend or f not in friend_sets:
                continue
            seen_friend.add(f)
            for it in friend_sets[f]:
                if it not in own:
                    cnt[it] += 1
        if cnt:
            ks = sorted(cnt)
            spu[u] = ks
            suk[u] = [cnt[k] for k in ks]
    return spu, suk


def _cunet(ui_train: dict[int, list[int]], user_nums: int, item_nums: int):
    """Co-consumption weight matrix W = A A^T (diag zeroed), sparse CSR."""
    rows, cols = [], []
    for u, items in ui_train.items():
        for i in set(items):
            rows.append(u)
            cols.append(i)
    a = sp.csr_matrix((np.ones(len(rows), np.float32), (rows, cols)),
                      shape=(user_nums, item_nums))
    w = (a @ a.T).tocsr()
    w.setdiag(0)
    w.eliminate_zeros()
    return w


def _deep_walks(w: sp.csr_matrix, walk_count: int, walk_length: int,
                rng: np.random.Generator) -> list[list[int]]:
    """Weighted greedy walks (reference scheme, utils/tools.py:144-170):
    prefer the highest-weight not-yet-visited neighbor; fall back to a
    weight-proportional random neighbor when all are visited."""
    walks = []
    n = w.shape[0]
    for u in range(n):
        if w.indptr[u] == w.indptr[u + 1]:
            continue
        for _ in range(walk_count):
            path = [u]
            visited = {u}
            cur = u
            for _ in range(walk_length - 1):
                lo, hi = w.indptr[cur], w.indptr[cur + 1]
                if lo == hi:
                    break
                nbrs = w.indices[lo:hi]
                wts = w.data[lo:hi]
                fresh = ~np.isin(nbrs, list(visited), assume_unique=False)
                if fresh.any():
                    cand = nbrs[fresh]
                    nxt = int(cand[np.argmax(wts[fresh])])
                else:
                    nxt = int(rng.choice(nbrs, p=wts / wts.sum()))
                path.append(nxt)
                visited.add(nxt)
                cur = nxt
            walks.append(path)
    order = rng.permutation(len(walks))
    return [walks[i] for i in order]


def _sgns_embeddings(walks: list[list[int]], n_nodes: int, dim: int,
                     window: int, rng: np.random.Generator,
                     epochs: int = 3, lr: float = 0.025,
                     negatives: int = 5) -> np.ndarray:
    """Skip-gram with negative sampling over the walks (word2vec objective,
    standing in for the reference's gensim call, utils/tools.py:173-177).
    Small JAX-jitted SGD over (center, context) pairs."""
    import jax
    import jax.numpy as jnp
    import optax

    centers, contexts = [], []
    for path in walks:
        for i, c in enumerate(path):
            for j in range(max(0, i - window), min(len(path), i + window + 1)):
                if j != i:
                    centers.append(c)
                    contexts.append(path[j])
    if not centers:
        return np.zeros((n_nodes, dim), np.float32)
    centers = np.asarray(centers, np.int32)
    contexts = np.asarray(contexts, np.int32)

    key = jax.random.PRNGKey(int(rng.integers(1 << 31)))
    k_init, key = jax.random.split(key)
    params = {
        "in": 0.1 * jax.random.normal(k_init, (n_nodes, dim)),
        "out": jnp.zeros((n_nodes, dim)),
    }
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    def loss_fn(p, c, ctx, neg):
        ve = p["in"][c]                        # [B, d]
        ue = p["out"][ctx]                     # [B, d]
        ne = p["out"][neg]                     # [B, K, d]
        pos = jax.nn.log_sigmoid(jnp.sum(ve * ue, axis=1))
        negl = jnp.sum(jax.nn.log_sigmoid(
            -jnp.einsum("bd,bkd->bk", ve, ne)), axis=1)
        return -jnp.mean(pos + negl)

    @jax.jit
    def step(p, s, c, ctx, neg):
        l, g = jax.value_and_grad(loss_fn)(p, c, ctx, neg)
        upd, s = opt.update(g, s, p)
        return optax.apply_updates(p, upd), s, l

    batch = 8192
    n = len(centers)
    for _ in range(epochs):
        order = rng.permutation(n)
        for s0 in range(0, n, batch):
            sel = order[s0: s0 + batch]
            if len(sel) < 16:
                continue
            neg = rng.integers(0, n_nodes, (len(sel), negatives))
            params, opt_state, _ = step(params, opt_state,
                                        jnp.asarray(centers[sel]),
                                        jnp.asarray(contexts[sel]),
                                        jnp.asarray(neg, dtype=jnp.int32))
    return np.asarray(params["in"], np.float32)


def build_cune_friends(ui_train: dict[int, list[int]], user_nums: int,
                       item_nums: int, walk_count: int, walk_length: int,
                       walk_dim: int, window_size: int, topk_f: int,
                       seed: int = 0):
    """Top-K latent friends per user + the resulting SPu/suk sets
    (full CUNE pipeline, utils/tools.py:130-209)."""
    import jax.numpy as jnp
    import jax

    rng = np.random.default_rng(seed)
    w = _cunet(ui_train, user_nums, item_nums)
    walks = _deep_walks(w, walk_count, walk_length, rng)
    emb = _sgns_embeddings(walks, user_nums, walk_dim, window_size, rng)

    # Cosine top-K over users that appear in the CUNet, computed in row
    # BLOCKS: a dense [active, active] similarity matrix is O(U^2)
    # memory (multi-GB at Epinions scale) when only the top-K per row is
    # needed.
    active = np.unique(np.concatenate([np.asarray(p) for p in walks])
                       if walks else np.zeros(0, np.int64))
    norms = np.linalg.norm(emb, axis=1, keepdims=True)
    unit = (emb / np.maximum(norms, 1e-12))[active]
    n_act = len(active)
    k = min(topk_f, max(n_act - 1, 1))
    unit_dev = jnp.asarray(unit)
    block = 4096
    top_rows = []
    for r0 in range(0, n_act, block):
        sims = np.array(unit_dev[r0: r0 + block] @ unit_dev.T)
        rows = np.arange(r0, min(r0 + block, n_act))
        sims[np.arange(len(rows)), rows] = -np.inf       # self
        top = np.argpartition(-sims, kth=k - 1, axis=1)[:, :k]
        row_sims = np.take_along_axis(sims, top, axis=1)
        order = np.argsort(-row_sims, axis=1)
        top_rows.append(np.take_along_axis(top, order, axis=1))
    top = np.concatenate(top_rows) if top_rows else np.zeros((0, k), int)

    friends = {int(active[r]): [int(active[c]) for c in top[r]]
               for r in range(n_act)}
    spu, suk = build_spu(ui_train, friends)
    return friends, spu, suk


def build_tie_partitioned_spu(ui_train: dict[int, list[int]],
                              user_friends: dict[int, list[int]],
                              strong_ratio: float = 0.5):
    """TBPR's strong/weak-tie item sets (CIKM'16 "Social recommendation
    with strong and weak ties"; the reference advertises the model in
    README.md:17 but model/ranking/TBPR.py is empty).

    Tie strength t(u, v) = Jaccard overlap of the two users' friend
    neighborhoods (the paper's common-neighborhood measure).  A GLOBAL
    threshold at the (1 - strong_ratio) quantile of all positive tie
    strengths splits ties into strong/weak (the paper sweeps this split
    percentage; ``strong_ratio`` is the config knob, default 0.5).  Ties
    with zero overlap are always weak.

    Returns ({u: sorted strong-tie items}, {u: sorted weak-tie items}) —
    each is the union of that tie class's friends' train items minus the
    user's own; items reachable through BOTH classes count as strong
    (the stronger evidence level).
    """
    friend_sets = {u: set(fs) for u, fs in user_friends.items()}
    item_sets = {u: set(it) for u, it in ui_train.items()}

    strengths = {}
    all_pos = []
    for u, fs in user_friends.items():
        nu = friend_sets.get(u, set())
        for v in fs:
            nv = friend_sets.get(v, set())
            # Jaccard over COMMON NEIGHBORS: the endpoints themselves are
            # excluded (u in N(v) / v in N(u) is the tie being measured,
            # not shared structure — counting them deflates t for every
            # reciprocal pair and zeroes mutually-tied users with no
            # other overlap).
            nu_x = nu - {u, v}
            nv_x = nv - {u, v}
            union = len(nu_x | nv_x)
            t = (len(nu_x & nv_x) / union) if union else 0.0
            strengths[(u, v)] = t
            if t > 0:
                all_pos.append(t)
    thresh = (float(np.quantile(np.asarray(all_pos), 1.0 - strong_ratio))
              if all_pos else np.inf)

    strong_items: dict[int, list[int]] = {}
    weak_items: dict[int, list[int]] = {}
    for u, fs in user_friends.items():
        own = item_sets.get(u, set())
        s_set: set[int] = set()
        w_set: set[int] = set()
        for v in fs:
            items = item_sets.get(v)
            if not items:
                continue
            t = strengths[(u, v)]
            dst = s_set if (t > 0 and t >= thresh) else w_set
            dst |= (items - own)
        w_set -= s_set      # both-class items count as strong
        if s_set:
            strong_items[u] = sorted(s_set)
        if w_set:
            weak_items[u] = sorted(w_set)
    return strong_items, weak_items
