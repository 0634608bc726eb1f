"""COCO RLE codec + crowd/RLE pipeline tests.

The wire-format fixtures are hand-computed from the COCO RLE spec (5-bit
little-endian chunks offset by 48, 0x20 continuation, delta from index 3,
sign extension via bit 0x10) — NOT produced by the codec under test.
Reference semantics: /root/reference/operator_cxx/proposal_mask_target.cc
links maskApi for exactly this format.
"""
import numpy as np

from simpledet_tpu.data.rle import (_counts_to_string, _string_to_counts,
                                    decode_rle, encode_rle,
                                    mask_to_polygons, segmentation_to_mask)


def test_uncompressed_decode_hand_computed():
    # 3x4 mask, column-major runs: [2, 3, 4, 3]
    # cols: c0 = [0,0,1], c1 = [1,1,0], c2 = [0,0,0], c3 = [1,1,1]
    rle = {"size": [3, 4], "counts": [2, 3, 4, 3]}
    expect = np.array([[0, 1, 0, 1],
                       [0, 1, 0, 1],
                       [1, 0, 0, 1]], np.uint8)
    np.testing.assert_array_equal(decode_rle(rle), expect)


def test_compressed_string_hand_computed():
    # Hand-derived chunk math:
    #  6 -> 6 & 0x1f = 6, bit4 clear, remainder 0 -> stop: chr(48+6) = '6'
    # 20 -> 20 has bit4 set, 20>>5 = 0 != -1 -> continue:
    #       chr(48 + (20 | 0x20)) = chr(100) = 'd', then chunk 0 -> '0'
    #  1 -> '1'
    # From index 3 the count is delta-encoded vs counts[i-2]:
    #  counts = [6, 20, 1, 20] -> deltas [6, 20, 1, 0]; 0 -> '0'
    assert _counts_to_string([6, 20, 1, 20]) == "6d010"
    assert _string_to_counts("6d010") == [6, 20, 1, 20]
    # negative delta: counts [5, 1, 2, 0] -> deltas [5, 1, 2, -1].
    # -1 & 0x1f = 31 (bit4 set), -1 >> 5 = -1 -> stop, sign-extends back:
    # chr(48+31) = 'O'
    assert _counts_to_string([5, 1, 2, 0]) == "512O"
    assert _string_to_counts("512O") == [5, 1, 2, 0]


def test_roundtrip_random_masks():
    rng = np.random.RandomState(0)
    for trial in range(5):
        h, w = int(rng.randint(1, 40)), int(rng.randint(1, 40))
        mask = (rng.rand(h, w) > 0.6).astype(np.uint8)
        rle = encode_rle(mask)
        assert isinstance(rle["counts"], str)
        np.testing.assert_array_equal(decode_rle(rle), mask)


def test_roundtrip_edge_masks():
    for mask in (np.zeros((5, 7), np.uint8), np.ones((5, 7), np.uint8),
                 np.eye(6, dtype=np.uint8)):
        np.testing.assert_array_equal(decode_rle(encode_rle(mask)), mask)


def test_large_counts_multi_chunk():
    # counts > 31 need multiple 5-bit chunks
    mask = np.zeros((50, 50), np.uint8)
    mask[10:40, 5:45] = 1
    np.testing.assert_array_equal(decode_rle(encode_rle(mask)), mask)


def test_segmentation_to_mask_all_flavors():
    # polygon flavor
    poly = [[2.0, 2.0, 8.0, 2.0, 8.0, 8.0, 2.0, 8.0]]
    m_poly = segmentation_to_mask(poly, 12, 12)
    assert m_poly[5, 5] == 1 and m_poly[0, 0] == 0
    # uncompressed + compressed RLE flavors agree
    rle_u = encode_rle(m_poly)
    m_rle = segmentation_to_mask(rle_u, 12, 12)
    np.testing.assert_array_equal(m_rle, m_poly)
    m_unc = segmentation_to_mask(
        {"size": [12, 12],
         "counts": _string_to_counts(rle_u["counts"])}, 12, 12)
    np.testing.assert_array_equal(m_unc, m_poly)


def test_mask_to_polygons_roundtrip_coverage():
    mask = np.zeros((100, 100), np.uint8)
    mask[5:70, 8:85] = 1
    polys = mask_to_polygons(mask)
    assert polys, "no contour found"
    re = segmentation_to_mask([p.tolist() for p in polys], 100, 100)
    # rasterized contour must cover the original region almost exactly
    inter = np.logical_and(re, mask).sum()
    union = np.logical_or(re, mask).sum()
    assert inter / union > 0.9


def test_preprocess_gt_poly_decodes_rle():
    from simpledet_tpu.data.mask_transforms import PreprocessGtPoly
    mask = np.zeros((60, 64), np.uint8)
    mask[4:46, 6:58] = 1
    rec = {"gt_poly": [encode_rle(mask),
                       [[1.0, 1.0, 5.0, 1.0, 5.0, 5.0, 1.0, 5.0]]]}
    out = PreprocessGtPoly().apply(rec)
    assert len(out["gt_poly"]) == 2
    assert all(isinstance(s, np.ndarray) for inst in out["gt_poly"]
               for s in inst)
    # the decoded-RLE instance covers the same region
    re = segmentation_to_mask([s.tolist() for s in out["gt_poly"][0]],
                              60, 64)
    inter = np.logical_and(re, mask).sum()
    assert inter / mask.sum() > 0.85


def test_create_coco_roidb_crowd_ignore(tmp_path):
    import json

    from simpledet_tpu.data.roidb import create_coco_roidb
    mask = np.zeros((40, 60), np.uint8)
    mask[10:30, 20:50] = 1
    ann = {
        "images": [{"id": 1, "file_name": "a.jpg", "height": 40,
                    "width": 60}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 7, "iscrowd": 0,
             "bbox": [2, 2, 10, 10], "area": 100,
             "segmentation": [[2, 2, 11, 2, 11, 11, 2, 11]]},
            {"id": 2, "image_id": 1, "category_id": 7, "iscrowd": 1,
             "bbox": [20, 10, 30, 20], "area": 600,
             "segmentation": encode_rle(mask)},
        ],
        "categories": [{"id": 7, "name": "x"}],
    }
    p = tmp_path / "ann.json"
    p.write_text(json.dumps(ann))
    # reference default: crowd dropped
    roidb = create_coco_roidb(str(p), str(tmp_path), with_poly=True)
    assert roidb[0]["gt_class"] == [1]
    # include_crowd: crowd kept as class -2 ignore region w/ RLE passthrough
    roidb = create_coco_roidb(str(p), str(tmp_path), with_poly=True,
                              include_crowd=True)
    assert roidb[0]["gt_class"] == [1, -2]
    assert isinstance(roidb[0]["gt_poly"][1], dict)
