"""Host-side ranking-data preprocessing.

Reproduces the reference's load/filter/reindex/split/candidate pipeline
(model/RankingPreprocess.py:12-134) with its load-bearing invariants:

- UI / UIR / UIRT CSV formats with a configurable separator,
- user-min filter applied before item-min filter (:35-39),
- dense reindexing of surviving user/item ids (:42-47),
- social trust graph filtered to surviving users, reindexed, grouped
  (:50-58); SAMN-style friend padding to the max list length with the
  sentinel id ``user_nums`` (:61-67),
- leave-one-out split keeps users with <= 3 interactions entirely in
  train (:98-108); random split honors ``[r1, r2, r3]`` (:109-116);
  optional sort by (user, time) first (:96-97),
- per-user test-candidate lists: ``neg_samples`` unseen items sampled
  WITHOUT replacement, then the ground-truth items appended at the END
  (:120-129) — candidate ordering is an invariant the evaluator relies on.

Implementation differences (behavior-preserving, documented):
- all randomness is driven by a seeded ``numpy.random.Generator`` (the
  reference uses the global unseeded numpy RNG),
- random split is a seeded permutation split (statistically equivalent to
  the reference's unseeded ``sklearn.train_test_split``),
- reindexing maps sorted original ids to 0..n-1 (the reference maps
  arbitrary set-iteration order; any bijection is equivalent downstream).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pandas as pd

from cleverrec_tpu.config import Config


@dataclass
class RankingData:
    """Preprocessed interactions in host memory."""

    user_nums: int
    item_nums: int
    ui_train: dict[int, list[int]]
    ui_test: dict[int, list[int]]          # candidate lists when candidate_eval
    ratings_num: int
    candidate_eval: bool
    neg_samples: int
    user_friends: dict[int, list[int]] | None = None
    # SAMN-style padded friends matrix [user_nums, max_friends] with the
    # sentinel row id == user_nums for missing friends; None if no social.
    friends_padded: np.ndarray | None = None

    def stats_line(self) -> str:
        return (f"user_nums={self.user_nums}, item_nums={self.item_nums}, "
                f"ratings_num={self.ratings_num}")


def _read_interactions(cfg: Config) -> pd.DataFrame:
    path = os.path.join(cfg.str("data.root_dir"), cfg.str("data.dataset"),
                        cfg.str("data.file_name"))
    sep = cfg.str("data.sep", ",")
    fmt = cfg.str("data.format", "UI")
    names = {"UI": ["u_id", "i_id"],
             "UIR": ["u_id", "i_id", "rating"],
             "UIRT": ["u_id", "i_id", "rating", "time"]}[fmt]
    # Native mmapped parser first (single-byte separators, numeric ids);
    # pandas handles everything else.  Both skip the first line, matching
    # the reference's header=0 read (RankingPreprocess.py:21-22).
    df = None
    if len(sep) == 1:
        from cleverrec_tpu.data import fastcsv
        cols = fastcsv.read_columns(path, sep, len(names))
        if cols is not None:
            df = pd.DataFrame({n: c for n, c in zip(names, cols)})
            df["u_id"] = df["u_id"].astype(np.int64)
            df["i_id"] = df["i_id"].astype(np.int64)
    if df is None:
        df = pd.read_csv(path, sep=sep, header=0, names=names,
                         usecols=list(range(len(names))), engine="python")
    if fmt == "UIRT":
        df["time"] = df["time"].astype(np.int64)
    return df


def _filter_min_counts(df: pd.DataFrame, user_min: int, item_min: int) -> pd.DataFrame:
    # Order matters and matches the reference: users first, then items.
    if user_min > 0:
        keep = df.groupby("u_id")["u_id"].transform("size") >= user_min
        df = df[keep].reset_index(drop=True)
    if item_min > 0:
        keep = df.groupby("i_id")["i_id"].transform("size") >= item_min
        df = df[keep].reset_index(drop=True)
    return df


def _reindex(values: pd.Series) -> tuple[pd.Series, dict]:
    uniq = np.sort(values.unique())
    mapping = {v: i for i, v in enumerate(uniq)}
    return values.map(mapping), mapping


def _split_loo(df: pd.DataFrame) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Last interaction per user to test; users with <= 3 rows stay in train."""
    sizes = df.groupby("u_id")["u_id"].transform("size")
    is_last = ~df.duplicated(subset="u_id", keep="last")
    to_test = is_last & (sizes > 3)
    return df[~to_test].reset_index(drop=True), df[to_test].reset_index(drop=True)


def _split_random(df: pd.DataFrame, ratios: tuple[float, float, float],
                  rng: np.random.Generator) -> tuple[pd.DataFrame, pd.DataFrame]:
    r1, r2, r3 = ratios
    if r1 < 0 or r3 < 0 or r1 + r3 > 1 + 1e-9:
        raise ValueError(
            f"data.split_ratio train+test = {r1}+{r3} > 1: the slices "
            "would overlap and leak train rows into the test set")
    n = len(df)
    perm = rng.permutation(n)
    n_train = int(round(r1 * n))
    n_test = int(round(r3 * n))
    train_idx = perm[:n_train]
    test_idx = perm[n - n_test:]
    return (df.iloc[train_idx].reset_index(drop=True),
            df.iloc[test_idx].reset_index(drop=True))


def _sample_candidates(ui_train: dict, ui_test: dict, item_nums: int,
                       neg_samples: int, rng: np.random.Generator) -> dict:
    """Per test user: ``neg_samples`` unseen-in-train items without
    replacement, ground truth appended LAST (RankingPreprocess.py:120-129)."""
    all_items = np.arange(item_nums, dtype=np.int64)
    mask = np.ones(item_nums, dtype=bool)
    out = {}
    for u, truth in ui_test.items():
        seen = np.asarray(ui_train.get(u, []), dtype=np.int64)
        if seen.size == 0:
            pool = all_items
        else:
            # O(I) boolean mask (setdiff1d re-sorted the catalog per
            # user); flatnonzero yields the same sorted pool, so the
            # rng.choice draw stream is unchanged.
            mask[seen] = False
            pool = np.flatnonzero(mask)
            mask[seen] = True
        negs = rng.choice(pool, size=neg_samples, replace=False)
        out[u] = negs.tolist() + list(truth)
    return out


def load_ranking_data(cfg: Config, rng: np.random.Generator | None = None,
                      logger=None) -> RankingData:
    rng = rng if rng is not None else np.random.default_rng(cfg.seed)
    df = _read_interactions(cfg)
    df = _filter_min_counts(df, cfg.int("data.user_min", 0),
                            cfg.int("data.item_min", 0))

    df["u_id"], user_map = _reindex(df["u_id"])
    df["i_id"], item_map = _reindex(df["i_id"])
    user_nums, item_nums = len(user_map), len(item_map)
    ratings_num = len(df)

    # Social graph (optional).
    user_friends = None
    friends_padded = None
    if "social_file" in cfg:
        spath = os.path.join(cfg.str("data.root_dir"), cfg.str("data.dataset"),
                             cfg.str("social_file"))
        trusts = pd.read_csv(spath, sep=cfg.str("data.sep", ","), header=0,
                             names=["u_id", "v_id"], usecols=[0, 1],
                             engine="python")
        valid = set(user_map)
        trusts = trusts[trusts["u_id"].isin(valid) & trusts["v_id"].isin(valid)]
        trusts = trusts.assign(u_id=trusts["u_id"].map(user_map),
                               v_id=trusts["v_id"].map(user_map))
        user_friends = trusts.groupby("u_id")["v_id"].apply(list).to_dict()
        # Padded matrix with sentinel id == user_nums (RankingPreprocess.py:61-67).
        # ``social.max_friends`` caps the width for heavy-tailed graphs
        # (Epinions-class max out-degree makes max-padding infeasible for
        # SAMN's [B, F, d] attention; truncation keeps the FIRST cap
        # friends and only narrows the attention set — SPu/tie sets use
        # the full user_friends dict).
        max_f = max((len(v) for v in user_friends.values()), default=1)
        cap = cfg.int("social.max_friends", 0)
        if cap and max_f > cap:
            max_f = cap
        friends_padded = np.full((user_nums, max_f), user_nums, dtype=np.int32)
        for u, fs in user_friends.items():
            friends_padded[u, : min(len(fs), max_f)] = fs[:max_f]

    # Split.
    if cfg.bool("data.split_by_time", False) and "time" in df.columns:
        df = df.sort_values(["u_id", "time"], kind="stable").reset_index(drop=True)
    if cfg.split_way == "loo":
        train_df, test_df = _split_loo(df)
    else:
        ratios = tuple(cfg.float_list("data.split_ratio", [0.7, 0.2, 0.1]))
        train_df, test_df = _split_random(df, ratios, rng)

    ui_train = train_df.groupby("u_id")["i_id"].apply(list).to_dict()
    ui_test = test_df.groupby("u_id")["i_id"].apply(list).to_dict()

    neg_samples = cfg.neg_samples
    candidate_eval = cfg.candidate_eval
    if candidate_eval:
        ui_test = _sample_candidates(ui_train, ui_test, item_nums,
                                     neg_samples, rng)

    data = RankingData(
        user_nums=user_nums, item_nums=item_nums,
        ui_train=ui_train, ui_test=ui_test, ratings_num=ratings_num,
        candidate_eval=candidate_eval, neg_samples=neg_samples,
        user_friends=user_friends, friends_padded=friends_padded,
    )
    if logger is not None:
        logger.info(" Data: dataset=%s, split_way=%s, neg_samples=%d, %s",
                    cfg.str("data.dataset", "?"), cfg.split_way,
                    neg_samples, data.stats_line())
    return data
