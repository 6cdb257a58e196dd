"""Device-side sampler: correctness + statistical contracts."""

import jax
import jax.numpy as jnp
import numpy as np

from cleverrec_tpu import sampling


def _mk_seen(user_items, n_users, n_items):
    width = max(len(v) for v in user_items.values())
    table = np.full((n_users, width), n_items, dtype=np.int32)
    for u, items in user_items.items():
        table[u, : len(items)] = np.sort(items)
    return jnp.asarray(table)


def test_member():
    rows = jnp.asarray([[1, 3, 5, 99], [2, 2, 4, 99]], dtype=jnp.int32)
    x = jnp.asarray([3, 5], dtype=jnp.int32)
    assert sampling.member(rows, x).tolist() == [True, False]
    x2 = jnp.asarray([0, 2], dtype=jnp.int32)
    assert sampling.member(rows, x2).tolist() == [False, True]


def test_sample_not_in_avoids_seen():
    n_items = 20
    user_items = {0: [0, 1, 2, 3], 1: list(range(15)), 2: [19]}
    seen = _mk_seen(user_items, 3, n_items)
    u = jnp.asarray([0, 1, 2] * 50, dtype=jnp.int32)
    j = sampling.sample_not_in(jax.random.PRNGKey(0), seen[u], n_items,
                               u.shape)
    j = np.asarray(j)
    for uu, jj in zip(np.asarray(u), j):
        assert jj not in user_items[int(uu)]
        assert 0 <= jj < n_items


def test_sample_not_in_2d():
    n_items = 30
    user_items = {0: [5, 6, 7], 1: [0]}
    seen = _mk_seen(user_items, 2, n_items)
    u = jnp.asarray([0, 1, 0, 1], dtype=jnp.int32)
    negs = sampling.sample_not_in(jax.random.PRNGKey(1), seen[u], n_items,
                                  (4, 6))
    negs = np.asarray(negs)
    assert negs.shape == (4, 6)
    for r, uu in enumerate(np.asarray(u)):
        for jj in negs[r]:
            assert jj not in user_items[int(uu)]


def test_negatives_roughly_uniform():
    n_items = 50
    user_items = {0: [0, 1, 2, 3, 4]}
    seen = _mk_seen(user_items, 1, n_items)
    u = jnp.zeros(20000, dtype=jnp.int32)
    j = np.asarray(sampling.sample_not_in(jax.random.PRNGKey(2), seen[u],
                                          n_items, u.shape))
    counts = np.bincount(j, minlength=n_items)
    assert counts[:5].sum() == 0
    # 45 valid items, 20000 draws -> expectation ~444; loose 4-sigma bound.
    assert counts[5:].min() > 444 - 4 * np.sqrt(444)
    assert counts[5:].max() < 444 + 4 * np.sqrt(444)


def test_epoch_permutation_and_pairwise_batch():
    key = jax.random.PRNGKey(3)
    perm, valid = sampling.epoch_permutation(key, 10, 16)
    perm_np = np.asarray(perm)
    assert sorted(perm_np.tolist()) == list(range(16))
    assert np.asarray(valid).sum() == 10

    pos_u = jnp.asarray([0, 0, 1], dtype=jnp.int32)
    pos_i = jnp.asarray([2, 3, 4], dtype=jnp.int32)
    seen = _mk_seen({0: [2, 3], 1: [4]}, 2, 10)
    neg_ratio = 2
    rows = jnp.arange(6, dtype=jnp.int32)  # full epoch, unshuffled
    w = jnp.ones(6)
    b = sampling.pairwise_batch(jax.random.PRNGKey(4), rows, w, pos_u, pos_i,
                                seen, 10, neg_ratio)
    # Each pair appears exactly neg_ratio times.
    got = sorted(zip(np.asarray(b["u"]).tolist(), np.asarray(b["i"]).tolist()))
    assert got == [(0, 2), (0, 2), (0, 3), (0, 3), (1, 4), (1, 4)]
    for uu, jj in zip(np.asarray(b["u"]), np.asarray(b["j"])):
        assert jj not in ([2, 3] if uu == 0 else [4])


def test_pointwise_batch_layout():
    pos_u = jnp.asarray([0, 1], dtype=jnp.int32)
    pos_i = jnp.asarray([5, 6], dtype=jnp.int32)
    seen = _mk_seen({0: [5], 1: [6]}, 2, 10)
    neg_ratio = 3
    rows = jnp.arange(8, dtype=jnp.int32)
    w = jnp.ones(8)
    b = sampling.pointwise_batch(jax.random.PRNGKey(5), rows, w, pos_u, pos_i,
                                 seen, 10, neg_ratio)
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
