"""Loader tests mirroring the reference unittest/test_loader.py semantics:
orientation grouping, batch accounting, rank sharding, padding."""
import numpy as np

from simpledet_tpu.data.loader import Loader, aspect_group


def fake_roidb(n_v, n_h):
    db = []
    for i in range(n_v):
        db.append({"h": 200, "w": 100, "im_id": i, "x": i})
    for i in range(n_h):
        db.append({"h": 100, "w": 200, "im_id": 100 + i, "x": 100 + i})
    return db


class IdentityTransform:
    def apply(self, r):
        r["image"] = np.full((4, 4, 3), r["x"], np.float32)
        r["im_info"] = np.array([4, 4, 1.0], np.float32)
        r["gt_bbox"] = np.zeros((5, 5), np.float32)
        return r


def test_aspect_grouping_batches_uniform():
    db = fake_roidb(5, 3)
    loader = Loader(db, [IdentityTransform()], 2, shuffle=True,
                    num_workers=0, keys=("data",))
    seen = 0
    for batch in loader:
        ids = batch["data"][:, 0, 0, 0].astype(int)
        orient = ["v" if i < 100 else "h" for i in ids]
        assert len(set(orient)) == 1, "mixed orientations in one batch"
        seen += 1
    # 5 vertical -> 3 batches (padded), 3 horizontal -> 2 batches
    assert seen == 5


def test_empty_group_ok():
    db = fake_roidb(4, 0)
    loader = Loader(db, [IdentityTransform()], 2, shuffle=False, num_workers=0,
                    keys=("data",))
    assert len(list(loader)) == 2


def test_rank_sharding_partitions():
    db = fake_roidb(6, 4)
    all_ids = set()
    for rank in range(3):
        l = Loader(list(db), [IdentityTransform()], 1, shuffle=False,
                   num_workers=0, rank=rank, num_ranks=3, keys=("data",))
        for b in l:
            all_ids.add(int(b["data"][0, 0, 0, 0]))
    assert len(all_ids) == 10  # full coverage, no overlap


def test_threaded_matches_sync():
    db = fake_roidb(8, 0)
    sync = [b["data"][:, 0, 0, 0].tolist() for b in
            Loader(list(db), [IdentityTransform()], 2, shuffle=True, seed=1,
                   num_workers=0, keys=("data",))]
    thr = [b["data"][:, 0, 0, 0].tolist() for b in
           Loader(list(db), [IdentityTransform()], 2, shuffle=True, seed=1,
                  num_workers=4, keys=("data",))]
    assert sync == thr


def test_pad_last_false_emits_valid_mask():
    db = fake_roidb(3, 0)
    loader = Loader(db, [IdentityTransform()], 2, shuffle=False,
                    num_workers=0, keys=("data",), pad_last=False)
    batches = list(loader)
    assert batches[-1]["valid"].tolist() == [True, False]
