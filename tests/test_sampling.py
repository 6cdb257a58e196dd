"""Device-side sampler: correctness + statistical contracts.

Every membership test runs on BOTH execution paths (packed bitmap and
sorted-rows binary search) — the bitmap path is the default; the rows
path serves entity sets whose bitmap would blow the memory budget.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cleverrec_tpu import sampling


def _table(user_items, n_users, n_items, mode="complement"):
    t = sampling.build_member_table(
        user_items, n_users, n_items,
        bitmap_budget=(1 << 30) if mode != "rows" else 0,
        complement_budget=(1 << 30) if mode == "complement" else 0)
    if mode == "complement":
        assert t.complement is not None
    if mode == "rows":
        assert t.bits is None
    return jax.tree_util.tree_map(jnp.asarray, t)


@pytest.fixture(params=["complement", "bitmap", "rows"])
def table_mode(request):
    return request.param


@pytest.fixture(params=["bitmap", "rows"])
def use_bitmap(request):
    return request.param == "bitmap"


def test_member(use_bitmap):
    t = _table({0: [1, 3, 5], 1: [2, 4]}, 2, 100,
               mode="bitmap" if use_bitmap else "rows")
    e = jnp.asarray([0, 1], dtype=jnp.int32)
    assert sampling.member(t, e, jnp.asarray([3, 5])).tolist() == [True, False]
    assert sampling.member(t, e, jnp.asarray([0, 2])).tolist() == [False, True]
    # Multi-query layout [B, K]: row b holds queries against entity e[b].
    q = jnp.asarray([[1, 99], [2, 4]], dtype=jnp.int32)
    got = sampling.member(t, e, q)
    assert got.tolist() == [[True, False], [True, True]]


def test_sample_not_in_avoids_seen(table_mode):
    n_items = 20
    user_items = {0: [0, 1, 2, 3], 1: list(range(15)), 2: [19]}
    t = _table(user_items, 3, n_items, mode=table_mode)
    u = jnp.asarray([0, 1, 2] * 50, dtype=jnp.int32)
    j = sampling.sample_not_in(jax.random.PRNGKey(0), t, u, n_items, u.shape)
    for uu, jj in zip(np.asarray(u), np.asarray(j)):
        assert jj not in user_items[int(uu)]
        assert 0 <= jj < n_items


def test_sample_not_in_2d(table_mode):
    n_items = 30
    user_items = {0: [5, 6, 7], 1: [0]}
    t = _table(user_items, 2, n_items, mode=table_mode)
    u = jnp.asarray([0, 1, 0, 1], dtype=jnp.int32)
    negs = np.asarray(sampling.sample_not_in(jax.random.PRNGKey(1), t, u,
                                             n_items, (4, 6)))
    assert negs.shape == (4, 6)
    for r, uu in enumerate(np.asarray(u)):
        for jj in negs[r]:
            assert jj not in user_items[int(uu)]
            assert 0 <= jj < n_items


def test_negatives_roughly_uniform():
    n_items = 50
    t = _table({0: [0, 1, 2, 3, 4]}, 1, n_items)
    u = jnp.zeros(20000, dtype=jnp.int32)
    j = np.asarray(sampling.sample_not_in(jax.random.PRNGKey(2), t, u,
                                          n_items, u.shape))
    counts = np.bincount(j, minlength=n_items)
    assert counts[:5].sum() == 0
    # 45 valid items, 20000 draws -> expectation ~444; loose 4-sigma bound.
    assert counts[5:].min() > 444 - 4 * np.sqrt(444)
    assert counts[5:].max() < 444 + 4 * np.sqrt(444)


def test_bitmap_and_rows_paths_agree():
    rng = np.random.default_rng(0)
    n_users, n_items = 40, 300
    user_items = {u: rng.choice(n_items, size=rng.integers(1, 50),
                                replace=False).tolist()
                  for u in range(n_users)}
    tb = _table(user_items, n_users, n_items, mode="bitmap")
    tr = _table(user_items, n_users, n_items, mode="rows")
    e = jnp.asarray(rng.integers(0, n_users, 500), dtype=jnp.int32)
    q = jnp.asarray(rng.integers(0, n_items, 500), dtype=jnp.int32)
    np.testing.assert_array_equal(np.asarray(sampling.member(tb, e, q)),
                                  np.asarray(sampling.member(tr, e, q)))


def test_epoch_permutation_and_pairwise_batch():
    key = jax.random.PRNGKey(3)
    perm, valid = sampling.epoch_permutation(key, 10, 16)
    assert sorted(np.asarray(perm).tolist()) == list(range(16))
    assert np.asarray(valid).sum() == 10

    pos_u = jnp.asarray([0, 0, 1], dtype=jnp.int32)
    pos_i = jnp.asarray([2, 3, 4], dtype=jnp.int32)
    t = _table({0: [2, 3], 1: [4]}, 2, 10)
    rows = jnp.arange(6, dtype=jnp.int32)  # full epoch, unshuffled
    w = jnp.ones(6)
    b = sampling.pairwise_batch(jax.random.PRNGKey(4), rows, w, pos_u, pos_i,
                                t, 10, 2)
    # Each pair appears exactly neg_ratio times.
    got = sorted(zip(np.asarray(b["u"]).tolist(), np.asarray(b["i"]).tolist()))
    assert got == [(0, 2), (0, 2), (0, 3), (0, 3), (1, 4), (1, 4)]
    for uu, jj in zip(np.asarray(b["u"]), np.asarray(b["j"])):
        assert jj not in ([2, 3] if uu == 0 else [4])


def test_pointwise_batch_layout():
    pos_u = jnp.asarray([0, 1], dtype=jnp.int32)
    pos_i = jnp.asarray([5, 6], dtype=jnp.int32)
    t = _table({0: [5], 1: [6]}, 2, 10)
    rows = jnp.arange(8, dtype=jnp.int32)
    w = jnp.ones(8)
    b = sampling.pointwise_batch(jax.random.PRNGKey(5), rows, w, pos_u, pos_i,
                                 t, 10, 3)
    y = np.asarray(b["y"])
    u = np.asarray(b["u"])
    i = np.asarray(b["i"])
    # 1 positive + neg_ratio negatives per pair.
    assert y.sum() == 2
    for r in range(8):
        if y[r] == 1.0:
            assert i[r] == (5 if u[r] == 0 else 6)
        else:
            assert i[r] != (5 if u[r] == 0 else 6)


def test_cml_batch():
    pos_u = jnp.asarray([0, 1], dtype=jnp.int32)
    pos_i = jnp.asarray([5, 6], dtype=jnp.int32)
    t = _table({0: [5], 1: [6]}, 2, 12)
    rows = jnp.arange(2, dtype=jnp.int32)
    b = sampling.cml_batch(jax.random.PRNGKey(6), rows, jnp.ones(2), pos_u,
                           pos_i, t, 12, 4)
    negs = np.asarray(b["negs"])
    assert negs.shape == (2, 4)
    assert 5 not in negs[0] and 6 not in negs[1]


def test_popularity_sampler_biased_and_unseen():
    # Item popularity 0..9 heavily skewed toward high ids.
    deg = np.arange(1, 11, dtype=np.float64) ** 3
    cdf = jnp.asarray(np.cumsum(deg) / deg.sum(), dtype=jnp.float32)
    t = _table({0: [9]}, 1, 10)   # most popular item is seen
    u = jnp.zeros(20000, dtype=jnp.int32)
    j = np.asarray(sampling.sample_not_in_popular(
        jax.random.PRNGKey(0), t, u, cdf, u.shape))
    assert 9 not in j
    counts = np.bincount(j, minlength=10)
    # Popularity-biased: item 8 drawn far more than item 1.
    assert counts[8] > 10 * max(counts[1], 1)


def test_pairwise_epoch_tensors_negatives_exact_and_uniform():
    """Epoch-tensor negatives: never seen, every pair appears neg_ratio
    times, and draws cover the FULL unseen range (regression: a biased
    complement-prefix length once restricted negatives to low item ids)."""
    rng = np.random.default_rng(0)
    n_users, n_items, neg_ratio = 8, 60, 4
    user_items = {u: sorted(rng.choice(n_items, size=10,
                                       replace=False).tolist())
                  for u in range(n_users)}
    pos_u = np.repeat(np.arange(n_users, dtype=np.int32), 10)
    pos_i = np.concatenate([np.asarray(user_items[u], np.int32)
                            for u in range(n_users)])
    t = sampling.build_member_table(user_items, n_users, n_items)
    assert t.complement is not None
    steps, b = 10, 40  # padded=400, rows_total=320
    static = jax.tree_util.tree_map(jnp.asarray, sampling.pairwise_epoch_static(
        pos_u, pos_i, t.lens, n_items, steps * b, neg_ratio))
    t_dev = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x) if x is not None else None, t)
    batch = sampling.pairwise_epoch_tensors(jax.random.PRNGKey(0), static,
                                            t_dev, n_items, steps, b)
    u = np.asarray(batch["u"]).ravel()
    i = np.asarray(batch["i"]).ravel()
    j = np.asarray(batch["j"]).ravel()
    w = np.asarray(batch["w"]).ravel()
    assert w.sum() == len(pos_u) * neg_ratio
    # Multiset of valid (u, i) rows = pairs x neg_ratio.
    from collections import Counter
    got = Counter(zip(u[w > 0].tolist(), i[w > 0].tolist()))
    assert all(c == neg_ratio for c in got.values())
    assert len(got) == len(pos_u)
    # Negatives unseen and spanning the range (with 50 unseen per user and
    # 320 draws, the top quartile of item ids must be hit).
    for uu, jj in zip(u[w > 0], j[w > 0]):
        assert int(jj) not in user_items[int(uu)]
    assert (j[w > 0] >= 3 * n_items // 4).sum() > 0


def test_pairwise_epoch_tensors_rejection_fallback():
    """No complement table -> the chunked rejection path produces unseen
    negatives with the same layout guarantees."""
    rng = np.random.default_rng(1)
    n_users, n_items, neg_ratio = 6, 40, 3
    user_items = {u: sorted(rng.choice(n_items, size=8,
                                       replace=False).tolist())
                  for u in range(n_users)}
    pos_u = np.repeat(np.arange(n_users, dtype=np.int32), 8)
    pos_i = np.concatenate([np.asarray(user_items[u], np.int32)
                            for u in range(n_users)])
    t = sampling.build_member_table(user_items, n_users, n_items,
                                    complement_budget=0)
    assert t.complement is None
    steps, b = 6, 32
    static = jax.tree_util.tree_map(
        jnp.asarray, sampling.pairwise_epoch_static(
            pos_u, pos_i, t.lens, n_items, steps * b, neg_ratio))
    t_dev = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x) if x is not None else None, t)
    batch = sampling.pairwise_epoch_tensors(jax.random.PRNGKey(2), static,
                                            t_dev, n_items, steps, b)
    u = np.asarray(batch["u"]).ravel()
    j = np.asarray(batch["j"]).ravel()
    w = np.asarray(batch["w"]).ravel()
    assert w.sum() == len(pos_u) * neg_ratio
    for uu, jj in zip(u[w > 0], j[w > 0]):
        assert int(jj) not in user_items[int(uu)]


def test_sbpr_epoch_tensors_invariants():
    """Whole-epoch SBPR tensors: every pair appears neg_ratio times,
    k in SPu(u) with its aligned suk, j outside seen(u) UNION SPu(u)
    (utils/sampler.py:102-141 semantics)."""
    rng = np.random.default_rng(4)
    n_users, n_items, neg_ratio = 8, 50, 3
    user_items = {u: sorted(rng.choice(n_items, size=8,
                                       replace=False).tolist())
                  for u in range(n_users)}
    spu = {u: sorted(rng.choice(n_items, size=5,
                                replace=False).tolist())
           for u in range(n_users)}
    suk = {u: [float(x % 4) for x in spu[u]] for u in range(n_users)}
    pos_u = np.repeat(np.arange(n_users, dtype=np.int32), 8)
    pos_i = np.concatenate([np.asarray(user_items[u], np.int32)
                            for u in range(n_users)])
    union = {u: sorted(set(user_items[u]) | set(spu[u]))
             for u in range(n_users)}
    social_neg = sampling.build_member_table(union, n_users, n_items)
    assert social_neg.complement is not None
    spu_t = sampling.build_member_table(spu, n_users, n_items)
    spu_csr = sampling.build_csr_lists(spu, n_users, aux=suk)
    steps, b = 8, 32   # padded=256, rows_total=192
    static = jax.tree_util.tree_map(jnp.asarray, sampling.sbpr_epoch_static(
        pos_u, pos_i, social_neg.lens, spu_t.lens, spu_csr["off"],
        n_items, steps * b, neg_ratio))
    sn_dev = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x) if x is not None else None, social_neg)
    csr_dev = jax.tree_util.tree_map(jnp.asarray, spu_csr)
    batch = sampling.sbpr_epoch_tensors(jax.random.PRNGKey(5), static,
                                        sn_dev, csr_dev, n_items, steps, b)
    u = np.asarray(batch["u"]).ravel()
    i = np.asarray(batch["i"]).ravel()
    k = np.asarray(batch["k"]).ravel()
    j = np.asarray(batch["j"]).ravel()
    s = np.asarray(batch["suk"]).ravel()
    w = np.asarray(batch["w"]).ravel()
    assert w.sum() == len(pos_u) * neg_ratio
    from collections import Counter
    got = Counter(zip(u[w > 0].tolist(), i[w > 0].tolist()))
    assert all(c == neg_ratio for c in got.values())
    assert len(got) == len(pos_u)
    for uu, kk, jj, ss in zip(u[w > 0], k[w > 0], j[w > 0], s[w > 0]):
        uu, kk, jj = int(uu), int(kk), int(jj)
        assert kk in spu[uu]
        assert ss == suk[uu][spu[uu].index(kk)]
        assert jj not in user_items[uu] and jj not in spu[uu]
    # Social draws cover the SPu lists (5 per user, 24 draws per user).
    assert len(set(k[w > 0].tolist())) > 10


def test_tbpr_epoch_tensors_invariants():
    """Whole-epoch TBPR tensors: s in strong(u), t in weak(u), j outside
    seen UNION strong UNION weak."""
    rng = np.random.default_rng(6)
    n_users, n_items, neg_ratio = 6, 40, 2
    user_items = {u: sorted(rng.choice(n_items, size=6,
                                       replace=False).tolist())
                  for u in range(n_users)}
    strong = {u: sorted(rng.choice(n_items, size=4,
                                   replace=False).tolist())
              for u in range(n_users)}
    weak = {u: sorted(rng.choice(n_items, size=3,
                                 replace=False).tolist())
            for u in range(n_users)}
    pos_u = np.repeat(np.arange(n_users, dtype=np.int32), 6)
    pos_i = np.concatenate([np.asarray(user_items[u], np.int32)
                            for u in range(n_users)])
    union = {u: sorted(set(user_items[u]) | set(strong[u]) | set(weak[u]))
             for u in range(n_users)}
    social_neg = sampling.build_member_table(union, n_users, n_items)
    ts = sampling.build_member_table(strong, n_users, n_items)
    tw = sampling.build_member_table(weak, n_users, n_items)
    ts_csr = sampling.build_csr_lists(strong, n_users)
    tw_csr = sampling.build_csr_lists(weak, n_users)
    steps, b = 4, 32
    static = jax.tree_util.tree_map(jnp.asarray, sampling.tbpr_epoch_static(
        pos_u, pos_i, social_neg.lens, ts.lens, ts_csr["off"],
        tw.lens, tw_csr["off"], n_items, steps * b, neg_ratio))
    sn_dev = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x) if x is not None else None, social_neg)
    batch = sampling.tbpr_epoch_tensors(
        jax.random.PRNGKey(8), static, sn_dev,
        jax.tree_util.tree_map(jnp.asarray, ts_csr),
        jax.tree_util.tree_map(jnp.asarray, tw_csr), n_items, steps, b)
    u = np.asarray(batch["u"]).ravel()
    s = np.asarray(batch["s"]).ravel()
    t = np.asarray(batch["t"]).ravel()
    j = np.asarray(batch["j"]).ravel()
    w = np.asarray(batch["w"]).ravel()
    assert w.sum() == len(pos_u) * neg_ratio
    for uu, ss, tt, jj in zip(u[w > 0], s[w > 0], t[w > 0], j[w > 0]):
        uu = int(uu)
        assert int(ss) in strong[uu]
        assert int(tt) in weak[uu]
        assert (int(jj) not in user_items[uu]
                and int(jj) not in strong[uu]
                and int(jj) not in weak[uu])


def test_pointwise_epoch_tensors_layout():
    """Pointwise epoch tensors: every pair contributes exactly one
    positive row (y=1, its own item) and neg_ratio negative rows (y=0,
    unseen items); padding rows carry w=0."""
    rng = np.random.default_rng(3)
    n_users, n_items, neg_ratio = 8, 60, 4
    user_items = {u: sorted(rng.choice(n_items, size=10,
                                       replace=False).tolist())
                  for u in range(n_users)}
    pos_u = np.repeat(np.arange(n_users, dtype=np.int32), 10)
    pos_i = np.concatenate([np.asarray(user_items[u], np.int32)
                            for u in range(n_users)])
    t = sampling.build_member_table(user_items, n_users, n_items)
    assert t.complement is not None
    steps, b = 10, 48  # padded=480, rows_total=400
    static = jax.tree_util.tree_map(
        jnp.asarray, sampling.pointwise_epoch_static(
            pos_u, pos_i, t.lens, n_items, steps * b, neg_ratio))
    t_dev = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x) if x is not None else None, t)
    batch = sampling.pointwise_epoch_tensors(jax.random.PRNGKey(1), static,
                                             t_dev, n_items, steps, b)
    u = np.asarray(batch["u"]).ravel()
    i = np.asarray(batch["i"]).ravel()
    y = np.asarray(batch["y"]).ravel()
    w = np.asarray(batch["w"]).ravel()
    grp = 1 + neg_ratio
    assert w.sum() == len(pos_u) * grp
    assert y[w > 0].sum() == len(pos_u)
    assert not y[w == 0].any()
    # Positive rows: the multiset of (u, i) with y=1 == the pair list.
    from collections import Counter
    pos_rows = Counter(zip(u[(w > 0) & (y > 0)].tolist(),
                           i[(w > 0) & (y > 0)].tolist()))
    assert pos_rows == Counter(zip(pos_u.tolist(), pos_i.tolist()))
    # Negative rows: unseen, neg_ratio per pair, span the id range.
    neg = (w > 0) & (y == 0)
    per_user = Counter(u[neg].tolist())
    assert all(per_user[uu] == 10 * neg_ratio for uu in range(n_users))
    for uu, ii in zip(u[neg], i[neg]):
        assert int(ii) not in user_items[int(uu)]
    assert (i[neg] >= 3 * n_items // 4).sum() > 0


def test_cml_epoch_tensors_layout_and_negatives():
    """CML epoch tensors: one row per pair (each exactly once), K unseen
    negatives per row spanning the unseen range, w masks the padding."""
    rng = np.random.default_rng(7)
    n_users, n_items, K = 8, 60, 5
    user_items = {u: sorted(rng.choice(n_items, size=10,
                                       replace=False).tolist())
                  for u in range(n_users)}
    pos_u = np.repeat(np.arange(n_users, dtype=np.int32), 10)
    pos_i = np.concatenate([np.asarray(user_items[u], np.int32)
                            for u in range(n_users)])
    t = sampling.build_member_table(user_items, n_users, n_items)
    steps, b = 10, 10  # padded=100, rows_total=80
    static = jax.tree_util.tree_map(jnp.asarray, sampling.pairwise_epoch_static(
        pos_u, pos_i, t.lens, n_items, steps * b, 1))
    t_dev = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x) if x is not None else None, t)
    batch = sampling.cml_epoch_tensors(jax.random.PRNGKey(0), static,
                                       t_dev, n_items, steps, b,
                                       neg_ratio=K)
    u = np.asarray(batch["u"]).ravel()
    i = np.asarray(batch["i"]).ravel()
    w = np.asarray(batch["w"]).ravel()
    negs = np.asarray(batch["negs"]).reshape(-1, K)
    assert batch["negs"].shape == (steps, b, K)
    assert w.sum() == len(pos_u)
    from collections import Counter
    got = Counter(zip(u[w > 0].tolist(), i[w > 0].tolist()))
    assert all(c == 1 for c in got.values())
    assert len(got) == len(pos_u)
    for uu, row in zip(u[w > 0], negs[w > 0]):
        for jj in row:
            assert int(jj) not in user_items[int(uu)]
    assert (negs[w > 0] >= 3 * n_items // 4).sum() > 0


def test_complement_from_bits_matches_host_builder():
    """Device-side complement (stable argsort of the unpacked bitmap)
    reproduces the host builder's exact layout: unseen ids ascending,
    then members ascending."""
    from cleverrec_tpu.sampling import (build_member_table,
                                        complement_from_bits)
    rng = np.random.default_rng(11)
    n, id_range = 37, 97
    sets = {e: list(rng.choice(id_range, size=rng.integers(0, 60),
                               replace=False))
            for e in range(0, n, 2)}
    host = build_member_table(sets, n, id_range)
    assert host.complement is not None and host.bits is not None
    dev = complement_from_bits(host.bits, id_range, chunk=8)
    np.testing.assert_array_equal(np.asarray(dev), host.complement)


def test_unseen_by_rank_enumerates_complement():
    """unseen_by_rank(e, r) over all ranks r is EXACTLY the sorted
    complement list — the order-statistics draw is exact."""
    rng = np.random.default_rng(11)
    n_users, n_items = 5, 37
    user_items = {u: sorted(rng.choice(
        n_items, size=int(rng.integers(0, 20)), replace=False).tolist())
        for u in range(n_users)}
    t = _table(user_items, n_users, n_items, mode="rows")
    for u in range(n_users):
        comp = sorted(set(range(n_items)) - set(user_items[u]))
        r = jnp.arange(len(comp), dtype=jnp.int32)[None, :]
        got = sampling.unseen_by_rank(t, jnp.asarray([u], jnp.int32), r)
        np.testing.assert_array_equal(np.asarray(got)[0], comp)


def test_rows_only_draws_identical_to_complement_tier():
    """The rows-only exact tier consumes the SAME uniforms and must
    produce byte-identical negatives to the complement-table tier."""
    rng = np.random.default_rng(12)
    n_users, n_items = 8, 50
    user_items = {u: sorted(rng.choice(n_items, size=12,
                                       replace=False).tolist())
                  for u in range(n_users)}
    t_comp = _table(user_items, n_users, n_items, mode="complement")
    t_rows = _table(user_items, n_users, n_items, mode="rows")
    key = jax.random.PRNGKey(7)
    e = jnp.asarray(rng.integers(0, n_users, 64), jnp.int32)
    a = sampling.sample_not_in(key, t_comp, e, n_items, (64,))
    b = sampling.sample_not_in(key, t_rows, e, n_items, (64,))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    a2 = sampling.sample_not_in(key, t_comp, e, n_items, (64, 3))
    b2 = sampling.sample_not_in(key, t_rows, e, n_items, (64, 3))
    np.testing.assert_array_equal(np.asarray(a2), np.asarray(b2))


def test_epoch_negatives_rows_only_identical_to_complement():
    """pairwise_epoch_tensors on a rows-only table == on a
    complement-table (same key): the whole-epoch negative draw goes
    through the same exact rank path."""
    rng = np.random.default_rng(13)
    n_users, n_items, neg_ratio = 6, 40, 3
    user_items = {u: sorted(rng.choice(n_items, size=8,
                                       replace=False).tolist())
                  for u in range(n_users)}
    pos_u = np.repeat(np.arange(n_users, dtype=np.int32), 8)
    pos_i = np.concatenate([np.asarray(user_items[u], np.int32)
                            for u in range(n_users)])
    steps, b = 6, 32
    outs = {}
    for mode in ("complement", "rows"):
        t = _table(user_items, n_users, n_items, mode=mode)
        static = jax.tree_util.tree_map(
            jnp.asarray, sampling.pairwise_epoch_static(
                pos_u, pos_i, t.lens, n_items, steps * b, neg_ratio))
        outs[mode] = sampling.pairwise_epoch_tensors(
            jax.random.PRNGKey(3), static, t, n_items, steps, b)
    for k in outs["complement"]:
        np.testing.assert_array_equal(np.asarray(outs["complement"][k]),
                                      np.asarray(outs["rows"][k]), k)
