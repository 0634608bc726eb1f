"""Pure-numpy COCO RLE codec + segmentation normalization helpers.

The environment has no pycocotools; the reference links COCO's maskApi
for RLE handling inside ProposalMaskTarget
(/root/reference/operator_cxx/proposal_mask_target.cc:10,20-96). This
module implements the public COCO RLE wire format from its spec:

  * counts are run lengths over the mask flattened in COLUMN-major
    (Fortran) order, alternating background/foreground starting with
    background;
  * the compressed string packs each count little-endian in 5-bit chunks,
    chunk values offset by 48 into printable ASCII, bit 0x20 marking
    continuation; counts from index 3 on are delta-encoded against the
    count two positions back; negative deltas are sign-extended (bit
    0x10 of the final chunk).

Crowd (iscrowd=1) COCO instances store RLE segmentations; non-crowd RLE
instances are legal too. `segmentation_to_mask` accepts every COCO
segmentation flavor, and `mask_to_polygons` converts a decoded RLE mask
back into polygon lists so crowd/RLE records flow through the same
host-transform + on-device edge-rasterization pipeline as polygons.
"""
import numpy as np


def _string_to_counts(s):
    if isinstance(s, bytes):
        s = s.decode("ascii")
    cnts = []
    p = 0
    while p < len(s):
        x = 0
        k = 0
        more = True
        while more:
            c = ord(s[p]) - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            p += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * (k + 1))
            k += 1
        if len(cnts) > 2:
            x += cnts[-2]
        cnts.append(x)
    return cnts


def _counts_to_string(cnts):
    out = []
    for i in range(len(cnts)):
        x = int(cnts[i])
        if i > 2:
            x -= int(cnts[i - 2])
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = (x != -1) if (c & 0x10) else (x != 0)
            if more:
                c |= 0x20
            out.append(chr(c + 48))
    return "".join(out)


def decode_rle(rle):
    """COCO RLE dict {'size': [h, w], 'counts': str|bytes|list} ->
    [h, w] uint8 binary mask."""
    h, w = rle["size"]
    counts = rle["counts"]
    if isinstance(counts, (str, bytes)):
        counts = _string_to_counts(counts)
    counts = np.asarray(counts, np.int64)
    assert counts.sum() == h * w, \
        f"RLE counts sum {counts.sum()} != h*w {h * w}"
    vals = (np.arange(len(counts)) % 2).astype(np.uint8)
    flat = np.repeat(vals, counts)
    return flat.reshape((w, h)).T  # column-major layout


def encode_rle(mask):
    """[h, w] binary mask -> COCO compressed RLE dict."""
    m = np.asarray(mask)
    h, w = m.shape
    flat = (m.T.reshape(-1) > 0).astype(np.uint8)  # column-major
    if flat.size == 0:
        return {"size": [h, w], "counts": ""}
    change = np.nonzero(flat[1:] != flat[:-1])[0] + 1
    bounds = np.concatenate([[0], change, [flat.size]])
    counts = np.diff(bounds).tolist()
    if flat[0] == 1:
        counts = [0] + counts
    return {"size": [int(h), int(w)], "counts": _counts_to_string(counts)}


def segmentation_to_mask(seg, h, w):
    """Any COCO segmentation -> [h, w] uint8 mask.

    list of polygons -> rasterized union (even-odd per polygon, merged);
    dict with list counts (uncompressed RLE) or str/bytes counts
    (compressed RLE) -> decoded.
    """
    if isinstance(seg, dict):
        return decode_rle(seg)
    if isinstance(seg, list) and len(seg) \
            and not isinstance(seg[0], (list, np.ndarray)):
        seg = [seg]  # single flat polygon
    from simpledet_tpu import native
    polys = [np.asarray(p, np.float64) for p in (seg or [])
             if len(np.asarray(p).ravel()) >= 6]
    if not polys:
        return np.zeros((int(h), int(w)), np.uint8)
    return native.rasterize_polygons(polys, int(h), int(w))


def mask_to_polygons(mask):
    """[h, w] binary mask -> list of flat [x0, y0, x1, y1, ...] float
    polygons (external contours). Lossy for masks with holes — fine for
    the crowd/ignore path, where only coarse coverage matters."""
    import cv2
    m = np.ascontiguousarray((np.asarray(mask) > 0).astype(np.uint8))
    contours, _ = cv2.findContours(m, cv2.RETR_EXTERNAL,
                                   cv2.CHAIN_APPROX_SIMPLE)
    polys = []
    for c in contours:
        c = c.reshape(-1, 2).astype(np.float32)
        if len(c) >= 3:
            polys.append(c.reshape(-1))
    return polys
