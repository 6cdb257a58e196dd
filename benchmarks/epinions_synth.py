"""Synthesize Epinions-scale ratings conditioned on the REAL trust graph.

The reference mount strips dataset/Epinions/ratings.csv
(/root/reference/.MISSING_LARGE_BLOBS:2) but keeps the full trusts.csv
(355,754 real edges over 18,098 users).  With zero egress the ratings
cannot be fetched, so this generator builds a ratings set over the REAL
social graph with the published dataset's aggregate shape (~40k users /
~660k ratings in the original; here the 18k trust-graph users with a
power-law per-user volume, power-law item popularity over 100k items)
and PLANTED SOCIAL HOMOPHILY: a fraction of each user's items is drawn
from their friends' item pools, so social models (SBPR/TBPR/SAMN) have
real signal to exploit.  SYNTHETIC CONTENT — the value is (a) exercising
the social pipeline at Epinions scale (bitmap sampler fallback, capped
friend attention) and (b) relative model comparisons on one dataset; the
numbers are not comparable to published Epinions results.

Writes data/epinions-synth/{ratings.csv,trusts.csv}.
Run: python benchmarks/epinions_synth.py
"""

from __future__ import annotations

import os

import numpy as np

TRUSTS = "/root/reference/dataset/Epinions/trusts.csv"
ITEM_NUMS = 100_000
MEAN_DEG = 25          # ~= 660k ratings / 26k active users in the original
SOCIAL_FRACTION = 0.4  # items copied from friends' pools


def main(seed: int = 20260817):
    rng = np.random.default_rng(seed)
    t = np.loadtxt(TRUSTS, delimiter=",", skiprows=1, dtype=np.int64)
    users = np.unique(t)
    uid = {int(v): k for k, v in enumerate(users)}
    n_users = len(users)
    friends = [[] for _ in range(n_users)]
    for a, b in t:
        friends[uid[int(a)]].append(uid[int(b)])

    # Power-law item popularity (Zipf-ish) and per-user volume.
    pop = 1.0 / np.arange(1, ITEM_NUMS + 1) ** 0.9
    pop /= pop.sum()
    deg = np.minimum(np.maximum(
        rng.pareto(1.5, n_users) * MEAN_DEG * 0.5, 3).astype(np.int64),
        2000)

    # Pass 1: seed each user with popularity-drawn items.
    own = []
    for u in range(n_users):
        k = int(deg[u])
        items = np.unique(rng.choice(ITEM_NUMS, size=2 * k, p=pop))[:k]
        own.append(set(items.tolist()))

    # Pass 2: rewire SOCIAL_FRACTION of each user's items to friend items
    # (homophily the social models can learn).
    for u in range(n_users):
        fs = friends[u]
        if not fs:
            continue
        pool = []
        for v in rng.choice(fs, size=min(len(fs), 20), replace=False):
            pool.extend(own[int(v)])
        if not pool:
            continue
        k_soc = int(SOCIAL_FRACTION * len(own[u]))
        take = rng.choice(len(pool), size=min(k_soc, len(pool)),
                          replace=False)
        own[u] |= {pool[i] for i in take}

    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "epinions-synth")
    os.makedirs(root, exist_ok=True)
    n_rows = 0
    with open(os.path.join(root, "ratings.csv"), "w") as f:
        f.write("u_id,i_id,rating,time\n")
        for u in range(n_users):
            items = sorted(own[u])
            ts = rng.integers(1, 1 << 30, len(items))
            rs = rng.integers(3, 6, len(items))
            for i, r, tt in zip(items, rs, ts):
                f.write(f"{u},{i},{r},{tt}\n")
            n_rows += len(items)
    with open(os.path.join(root, "trusts.csv"), "w") as f:
        f.write("u_id,v_id\n")
        for a, b in t:
            f.write(f"{uid[int(a)]},{uid[int(b)]}\n")
    print(f"epinions-synth: {n_rows} ratings, {n_users} users, "
          f"{ITEM_NUMS} item ids, {len(t)} real trust edges")


if __name__ == "__main__":
    main()
