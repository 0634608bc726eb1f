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


def test_deferred_norm_uint8_chain_and_device_parity():
    """Norm2DImage defers by default: the host chain stays uint8 through
    Resize/Flip/Pad, and ops/image.py::device_normalize reproduces the
    host (x - mean) / std exactly on the valid region while re-zeroing the
    padded border (the reference pads AFTER normalizing, so padding is 0
    in normalized space — core/detection_input.py:285-315)."""
    import cv2
    import jax.numpy as jnp

    from simpledet_tpu.data.transforms import (Flip2DImageBbox, Norm2DImage,
                                               Pad2DImageBbox,
                                               Resize2DImageBbox,
                                               apply_transforms)
    from simpledet_tpu.ops.image import device_normalize, find_pixel_norm

    class NormP:
        mean = (122.7717, 115.9465, 102.9801)
        std = (58.395, 57.12, 57.375)   # non-unit: exercises the divide path

    class ResizeP:
        short, long = 32, 52

    class PadP:
        short, long, max_num_gt = 32, 52, 4

    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (40, 60, 3), np.uint8)
    rec = {"image": img.copy(), "flipped": True,
           "gt_bbox": np.array([[5, 5, 30, 30]], np.float32),
           "gt_class": np.array([1], np.float32)}
    chain = [Norm2DImage(NormP), Resize2DImageBbox(ResizeP),
             Flip2DImageBbox(), Pad2DImageBbox(PadP)]
    assert find_pixel_norm(chain) is not None
    rec = apply_transforms(rec, chain)
    assert rec["image"].dtype == np.uint8  # stayed uint8 end-to-end

    batch = rec["image"][None]
    im_info = rec["im_info"][None]
    out = np.asarray(device_normalize(jnp.asarray(batch),
                                      jnp.asarray(im_info),
                                      NormP.mean, NormP.std))
    h, w = int(im_info[0, 0]), int(im_info[0, 1])
    expect = ((batch[0, :h, :w].astype(np.float32)
               - np.asarray(NormP.mean, np.float32))
              / np.asarray(NormP.std, np.float32))
    np.testing.assert_allclose(out[0, :h, :w], expect, atol=1e-5)
    assert np.all(out[0, h:] == 0) and np.all(out[0, :, w:] == 0)

    # float passthrough: already-normalized data is returned unchanged
    f = jnp.asarray(rng.randn(1, 8, 8, 3), jnp.float32)
    assert device_normalize(f, jnp.asarray([[8, 8, 1.0]]),
                            NormP.mean, NormP.std) is f

    # host fallback: host=True normalizes eagerly like the reference
    rec2 = {"image": img.copy(), "flipped": False,
            "gt_bbox": np.zeros((0, 4), np.float32),
            "gt_class": np.zeros((0,), np.float32)}
    host_chain = [Norm2DImage(NormP, host=True), Resize2DImageBbox(ResizeP)]
    assert find_pixel_norm(host_chain) is None
    rec2 = apply_transforms(rec2, host_chain)
    assert rec2["image"].dtype == np.float32
