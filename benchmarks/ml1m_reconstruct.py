"""Reconstruct ml-1m ratings.dat for the north-star benchmarks.

The reference mount strips dataset/ml-1m/ratings.dat
(/root/reference/.MISSING_LARGE_BLOBS:4) and this environment has zero
egress, so the full file cannot be fetched.  What DOES survive is
``ml-1m.test.libfm``: the reference's own fm_to_libfm.py output — a
uniform 20% sample (train_test_split(test_size=0.2), fm_to_libfm.py:87)
of the REAL 1,000,209 ratings, encoded as
``rating,<dense_u+1>:1,<6040+dense_i+1>:1`` (fm_to_libfm.py:55-56).

This script writes two datasets under <repo>/data/:

- ``ml-1m-real20/ratings.csv`` — the 200,042 REAL triples, verbatim
  (dense ids, synthetic per-user timestamps since the converter dropped
  time).  Every rating is a genuine MovieLens rating.
- ``ml-1m-recon/ratings.csv`` — full-size reconstruction: the real 20%
  plus 800,167 synthetic ratings drawn CONDITIONED on the real sample's
  marginals (per-user volume scaled 5x binomially, item popularity from
  the real sample, per-user rating-value distribution), deduplicated
  against the real pairs.  Totals 1,000,209 rows like the original.
  SYNTHETIC CONTENT — metric numbers on this set are
  reconstruction-conditioned, not comparable to published ml-1m results;
  they ARE valid for TF1-vs-TPU parity (both sides see the same data)
  and for real-scale throughput measurement.

Run: python benchmarks/ml1m_reconstruct.py
"""

from __future__ import annotations

import os

import numpy as np

REF = "/root/reference/dataset/ml-1m/ml-1m.test.libfm"
USER_NUMS = 6040
TOTAL = 1_000_209


def load_real():
    u, i, r = [], [], []
    with open(REF) as f:
        for line in f:
            parts = line.strip().split(",")
            rating = int(float(parts[0]))
            uid = int(parts[1].split(":")[0])
            fid = int(parts[2].split(":")[0])
            u.append(uid - 1)            # dense, 0-based
            i.append(fid - USER_NUMS - 1)
            r.append(rating)
    return (np.asarray(u, np.int64), np.asarray(i, np.int64),
            np.asarray(r, np.int64))


def write_csv(path, u, i, r, t):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("u_id,i_id,rating,time\n")
        for row in zip(u, i, r, t):
            f.write("%d,%d,%d,%d\n" % row)


def main():
    rng = np.random.default_rng(20260817)
    u, i, r = load_real()
    n_real = len(u)
    item_nums = int(i.max()) + 1
    print(f"real sample: {n_real} ratings, {int(u.max()) + 1} users, "
          f"{item_nums} items")

    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data")

    # Synthetic per-user timestamps (converter dropped time): random order.
    t_real = rng.integers(956_700_000, 1_046_000_000, n_real)
    write_csv(os.path.join(root, "ml-1m-real20", "ratings.csv"),
              u, i, r, t_real)

    # --- full-size reconstruction -----------------------------------
    n_syn = TOTAL - n_real
    # Per-user true volume ~ observed/0.2 (binomial thinning inverse).
    obs = np.bincount(u, minlength=USER_NUMS)
    target = np.maximum(np.round(obs / 0.2).astype(np.int64), 20)
    need = np.maximum(target - obs, 0)
    # Scale to exactly n_syn rows.
    need = np.round(need * (n_syn / need.sum())).astype(np.int64)
    diff = n_syn - need.sum()
    # Adjust the largest users by the rounding residue.
    order = np.argsort(-need)
    for k in range(abs(int(diff))):
        need[order[k % len(order)]] += np.sign(diff)
    assert need.sum() == n_syn

    # Item popularity + per-user rating-value histograms from the sample.
    pop = np.bincount(i, minlength=item_nums).astype(np.float64)
    pop_p = pop / pop.sum()
    global_hist = np.bincount(r, minlength=6)[1:].astype(np.float64)
    global_p = global_hist / global_hist.sum()

    real_pairs = set(zip(u.tolist(), i.tolist()))
    su, si, sr = [], [], []
    for uu in range(USER_NUMS):
        k = int(need[uu])
        if k == 0:
            continue
        # Oversample popularity-weighted, drop dupes vs real + self.
        cand = rng.choice(item_nums, size=4 * k + 8, p=pop_p)
        picked, seen_u = [], set()
        for c in cand:
            c = int(c)
            if c in seen_u or (uu, c) in real_pairs:
                continue
            seen_u.add(c)
            picked.append(c)
            if len(picked) == k:
                break
        # Rating values: user's empirical distribution, global fallback.
        mask = u == uu
        if mask.sum() >= 5:
            h = np.bincount(r[mask], minlength=6)[1:].astype(np.float64)
            p = h / h.sum()
        else:
            p = global_p
        vals = rng.choice(5, size=len(picked), p=p) + 1
        su.extend([uu] * len(picked))
        si.extend(picked)
        sr.extend(vals.tolist())

    su = np.asarray(su, np.int64)
    si = np.asarray(si, np.int64)
    sr = np.asarray(sr, np.int64)
    all_u = np.concatenate([u, su])
    all_i = np.concatenate([i, si])
    all_r = np.concatenate([r, sr])
    all_t = rng.integers(956_700_000, 1_046_000_000, len(all_u))
    write_csv(os.path.join(root, "ml-1m-recon", "ratings.csv"),
              all_u, all_i, all_r, all_t)
    print(f"recon: {len(all_u)} ratings ({n_real} real + {len(su)} "
          f"synthetic), {item_nums} items")


if __name__ == "__main__":
    main()
