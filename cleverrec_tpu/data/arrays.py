"""Packing host dicts into fixed-shape arrays for the device.

The reference feeds ragged Python structures through feed_dict per batch
(RankingRecommender.py:40-46).  On TPU everything must be static-shaped, so
we pack once per run:

- the flattened positive pairs (every (u, i) in train — the unit the
  reference's epoch samplers iterate, utils/sampler.py:50-52),
- a per-user SORTED seen-items table padded with the sentinel
  ``item_nums`` (sorting enables O(log L) membership tests inside the
  jitted negative sampler),
- the test-side candidate matrix with ground truth at the tail
  (preserving the reference's candidate ordering invariant).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from cleverrec_tpu.data.dataset import RankingData
from cleverrec_tpu.metrics import pad_lists
from cleverrec_tpu.sampling import MemberTable, build_member_table


@dataclass
class DeviceData:
    """Fixed-shape numpy arrays ready to ship to the device."""

    user_nums: int
    item_nums: int
    # Training positives (flattened (u, i) pairs).
    pos_u: np.ndarray            # [N] int32
    pos_i: np.ndarray            # [N] int32
    # Seen-items membership (train interactions): sorted rows + bitmap.
    seen: MemberTable
    # Test side.
    test_users: np.ndarray       # [T] int32
    cand: np.ndarray | None      # [T, C] int32, pad == 0 (masked) — candidate eval
    cand_mask: np.ndarray | None  # [T, C] bool
    real_padded: np.ndarray      # [T, Tmax] int32, PAD_ITEM-padded (host metrics)
    # Social (optional).
    friends_padded: np.ndarray | None = None  # [U, F] int32, sentinel == user_nums

    @property
    def num_pairs(self) -> int:
        return int(self.pos_u.shape[0])


def build_device_data(data: RankingData) -> DeviceData:
    # Flatten positives.
    n = sum(len(v) for v in data.ui_train.values())
    pos_u = np.empty(n, dtype=np.int32)
    pos_i = np.empty(n, dtype=np.int32)
    ofs = 0
    for u, items in data.ui_train.items():
        k = len(items)
        pos_u[ofs: ofs + k] = u
        pos_i[ofs: ofs + k] = items
        ofs += k

    # The [U, I] complement table (exact zero-rejection negatives) is
    # GB-scale on Epinions-class catalogs; building it on HOST meant a
    # GB-scale host->device transfer (minutes over this container's
    # tunneled chip).  Build it ON DEVICE from the 32x-smaller bitmap
    # instead — bit-for-bit the same layout (complement_from_bits).
    from cleverrec_tpu.sampling import attach_device_complement
    seen = attach_device_complement(
        build_member_table(data.ui_train, data.user_nums, data.item_nums,
                           complement_budget=0),
        data.item_nums)

    test_users = np.fromiter(data.ui_test.keys(), dtype=np.int32,
                             count=len(data.ui_test))
    cand = cand_mask = None
    if data.candidate_eval:
        neg = data.neg_samples
        cand_lists = [data.ui_test[int(u)] for u in test_users]
        width = max(len(c) for c in cand_lists)
        cand = np.zeros((len(test_users), width), dtype=np.int32)
        cand_mask = np.zeros((len(test_users), width), dtype=bool)
        reals = []
        for r, c in enumerate(cand_lists):
            cand[r, : len(c)] = c
            cand_mask[r, : len(c)] = True
            reals.append(c[neg:])
        real_padded = pad_lists(reals)
    else:
        real_padded = pad_lists([data.ui_test[int(u)] for u in test_users])

    return DeviceData(
        user_nums=data.user_nums, item_nums=data.item_nums,
        pos_u=pos_u, pos_i=pos_i, seen=seen,
        test_users=test_users, cand=cand, cand_mask=cand_mask,
        real_padded=real_padded,
        friends_padded=data.friends_padded,
    )
