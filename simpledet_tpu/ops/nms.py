"""Static-shape greedy NMS and soft-NMS as jit-compatible jnp functions.

Replaces the reference's CUDA bitmask NMS (operator_cxx/contrib/nms.cu,
proposal.cu:263 nms_kernel) and the cython CPU kernels
(operator_py/cython/cpu_nms.pyx). Greedy NMS is inherently sequential in its
exact form; we precompute the NxK IoU matrix on the MXU/VPU and run the greedy
scan as a lax.scan whose body is O(N) vector work, keeping everything
statically shaped. A Pallas blocked variant lives in kernels/nms_pallas.py.

Conventions: scores of invalid (padded) boxes must be -inf (or use valid mask);
all outputs are fixed-size, padded with zeros / -1 indices.
"""
import jax
import jax.numpy as jnp

from simpledet_tpu.ops.bbox import bbox_overlaps

NEG_INF = -1e10


def nms_keep_sorted(sorted_boxes, sorted_valid, thr, legacy_plus_one=True):
    """Greedy-NMS keep mask for boxes already sorted by descending score.

    sorted_boxes: [N, 4]; sorted_valid: [N] bool. Returns keep [N] bool.
    Exactly reproduces sequential greedy NMS given the sort order.
    """
    n = sorted_boxes.shape[0]
    iou = bbox_overlaps(sorted_boxes, sorted_boxes, legacy_plus_one)
    sup = (iou > thr) & sorted_valid[None, :] & sorted_valid[:, None]

    def step(suppressed, xs):
        row, i = xs
        keep_i = jnp.logical_not(suppressed[i]) & sorted_valid[i]
        suppressed = jnp.where(keep_i, suppressed | row, suppressed)
        return suppressed, keep_i

    init = jnp.zeros((n,), dtype=bool)
    idx = jnp.arange(n)
    # a box never suppresses itself
    sup = sup & (idx[:, None] != idx[None, :])
    _, keep = jax.lax.scan(step, init, (sup, idx))
    return keep & sorted_valid


def nms_keep_sorted_fixpoint(sorted_boxes, sorted_valid, thr,
                             legacy_plus_one=True):
    """Exact greedy-NMS keep mask via fixpoint iteration (vectorized).

    Greedy NMS's keep set G is the unique fixpoint of the antitone map
    f(K)[i] = not any_{j<i}(K[j] and iou[j,i] > thr). Iterating f from
    K0 = all-true alternates between supersets and subsets of G (even
    iterates shrink toward G from above, odd grow from below) and reaches
    G in O(longest suppression chain) iterations — typically < 16 for RPN
    proposals vs the 2000-step serial scan. Each iteration is one masked
    [N, N] any-reduce on the VPU. The loop stops when f(f(K)) == K, which
    (for this antitone f) only holds at the true fixpoint; a step counter
    caps the trip count at N for safety.

    Exactness vs the sequential scan is asserted in tests/test_nms.py,
    including adversarial suppression chains.
    """
    n = sorted_boxes.shape[0]
    iou = bbox_overlaps(sorted_boxes, sorted_boxes, legacy_plus_one)
    idx = jnp.arange(n)
    # sup[j, i]: j (higher-scored, j < i) can suppress i
    sup = ((iou > thr) & sorted_valid[None, :] & sorted_valid[:, None]
           & (idx[:, None] < idx[None, :]))
    # materialize: without the barrier XLA fuses the whole IoU computation
    # into the while body and re-evaluates the [N, N] overlap matrix every
    # fixpoint iteration (profiled 14x ~0.4ms/iter at flagship scale vs one
    # 40MB pred buffer read per iteration)
    sup = jax.lax.optimization_barrier(sup)

    def f(k):
        return ~jnp.any(sup & k[:, None], axis=0)

    # Progressive stabilization: once every possible suppressor of box i is
    # stable at its greedy value, i becomes stable next iteration — so any
    # fixpoint of f (or of f^2) equals G, and k == f(k) is a sound stop.
    def cond(st):
        prev, cur, t = st
        return (t < n + 2) & ~jnp.all(prev == cur)

    def body(st):
        _, cur, t = st
        return cur, f(cur), t + 1

    init = jnp.ones((n,), dtype=bool)
    _, keep, _ = jax.lax.while_loop(cond, body,
                                    (jnp.zeros((n,), bool), init,
                                     jnp.int32(0)))
    return keep & sorted_valid


def _keep_fn(sboxes, svalid, thr, legacy_plus_one):
    """Dispatch: exact fixpoint iteration (vectorized, converges in
    ~chain-depth [N,N] passes) by default; the serial lax.scan with
    SIMPLEDET_NMS=scan; Pallas VMEM kernel with SIMPLEDET_NMS=pallas."""
    import os
    impl = os.environ.get("SIMPLEDET_NMS", "")
    if impl == "scan" or os.environ.get("SIMPLEDET_NO_PALLAS"):
        return nms_keep_sorted(sboxes, svalid, thr, legacy_plus_one)
    if impl == "pallas":
        try:
            from simpledet_tpu.kernels.nms_pallas import (
                nms_keep_sorted_pallas, pallas_available)
            if pallas_available():
                return nms_keep_sorted_pallas(sboxes, svalid, thr,
                                              legacy_plus_one)
        except Exception:  # pragma: no cover
            pass
    return nms_keep_sorted_fixpoint(sboxes, svalid, thr, legacy_plus_one)


def nms(boxes, scores, thr, max_out, valid=None, legacy_plus_one=True):
    """Greedy NMS. boxes [N,4], scores [N] -> (boxes [max_out,4], scores [max_out],
    idx [max_out] into the input, valid_out [max_out] bool), ordered by score.

    Padded outputs carry score=NEG_INF, idx=-1, boxes=0.
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    masked_scores = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-masked_scores)
    sboxes = boxes[order]
    svalid = valid[order]
    keep = _keep_fn(sboxes, svalid, thr, legacy_plus_one)

    # Compact kept boxes to the front, preserving score order:
    # rank of each kept row = cumsum(keep) - 1; non-kept rows pushed to the back.
    kept_scores = jnp.where(keep, masked_scores[order], NEG_INF)
    if max_out > n:  # static pad so outputs are always [max_out, ...]
        pad = max_out - n
        kept_scores = jnp.pad(kept_scores, (0, pad), constant_values=NEG_INF)
        sboxes = jnp.pad(sboxes, ((0, pad), (0, 0)))
        order = jnp.pad(order, (0, pad), constant_values=-1)
    take = jnp.argsort(-kept_scores)[:max_out]
    out_boxes = sboxes[take]
    out_scores = kept_scores[take]
    out_valid = out_scores > NEG_INF / 2
    out_idx = jnp.where(out_valid, order[take], -1)
    out_boxes = jnp.where(out_valid[:, None], out_boxes, 0.0)
    return out_boxes, jnp.where(out_valid, scores[out_idx], NEG_INF), out_idx, out_valid


def set_nms(boxes, scores, set_ids, thr, max_out, valid=None,
            legacy_plus_one=True):
    """Set-suppression-exempt greedy NMS (reference operator_py/nms.py:77):
    boxes sharing a set id (the double predictions of one proposal) never
    suppress each other. Same outputs as nms()."""
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    masked_scores = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-masked_scores)
    sboxes = boxes[order]
    svalid = valid[order]
    ssets = set_ids[order]

    iou = bbox_overlaps(sboxes, sboxes, legacy_plus_one)
    sup = (iou > thr) & svalid[None, :] & svalid[:, None]
    sup = sup & (ssets[:, None] != ssets[None, :])
    idx = jnp.arange(n)
    sup = sup & (idx[:, None] != idx[None, :])

    def step(suppressed, xs):
        row, i = xs
        keep_i = jnp.logical_not(suppressed[i]) & svalid[i]
        suppressed = jnp.where(keep_i, suppressed | row, suppressed)
        return suppressed, keep_i

    _, keep = jax.lax.scan(step, jnp.zeros((n,), bool), (sup, idx))
    keep = keep & svalid

    kept_scores = jnp.where(keep, masked_scores[order], NEG_INF)
    if max_out > n:
        pad = max_out - n
        kept_scores = jnp.pad(kept_scores, (0, pad), constant_values=NEG_INF)
        sboxes = jnp.pad(sboxes, ((0, pad), (0, 0)))
        order = jnp.pad(order, (0, pad), constant_values=-1)
    take = jnp.argsort(-kept_scores)[:max_out]
    out_scores = kept_scores[take]
    out_valid = out_scores > NEG_INF / 2
    out_idx = jnp.where(out_valid, order[take], -1)
    out_boxes = jnp.where(out_valid[:, None], sboxes[take], 0.0)
    return out_boxes, jnp.where(out_valid, scores[out_idx], NEG_INF), \
        out_idx, out_valid


def py_weighted_nms(boxes, scores, thr_lo, thr_hi, max_out, valid=None,
                    legacy_plus_one=True):
    """Box-voting NMS (reference operator_py/nms.py:110 py_weighted_nms):
    greedy keep at thr_lo; each kept box's coords are replaced by the
    score-weighted average of boxes with IoU > thr_hi against it."""
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    kb, ks, kidx, kv = nms(boxes, scores, thr_lo, max_out, valid=valid,
                           legacy_plus_one=legacy_plus_one)
    iou = bbox_overlaps(kb, boxes, legacy_plus_one)          # [K, N]
    w = jnp.where((iou > thr_hi) & valid[None, :],
                  jnp.maximum(scores, 0.0)[None, :], 0.0)
    wsum = jnp.maximum(jnp.sum(w, -1, keepdims=True), 1e-12)
    voted = (w @ boxes) / wsum
    voted = jnp.where(kv[:, None], voted, 0.0)
    return voted, ks, kidx, kv


def soft_nms(boxes, scores, max_out, thr=0.3, sigma=0.5, score_thresh=0.001,
             method="gaussian", valid=None, legacy_plus_one=True):
    """Soft-NMS (linear / gaussian decay), mirrors cpu_soft_nms in the
    reference operator_py/cython/cpu_nms.pyx.

    Sequential: at each of max_out steps pick the current argmax, decay the
    rest. Returns (boxes [max_out,4], scores [max_out], idx [max_out], valid).

    Reference semantics (cpu_nms.pyx:97-204): each round the max-score box
    still in the pool becomes a detection at its current (possibly decayed)
    score; remaining pool scores are decayed by overlap against it, and any
    box whose decayed score falls below ``score_thresh`` is dropped from the
    pool entirely (never selected, never returned). Boxes that *start* below
    the threshold remain selectable until decayed — the reference only drops
    on update.
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)

    def step(carry, _):
        cur_scores, alive = carry
        masked = jnp.where(alive, cur_scores, NEG_INF)
        i = jnp.argmax(masked)
        s_i = masked[i]
        sel_valid = s_i > NEG_INF / 2
        box_i = boxes[i]
        iou = bbox_overlaps(box_i[None, :], boxes, legacy_plus_one)[0]
        if method == "linear":
            decay = jnp.where(iou > thr, 1.0 - iou, 1.0)
        elif method == "hard":
            decay = jnp.where(iou > thr, 0.0, 1.0)
        else:
            decay = jnp.exp(-(iou * iou) / sigma)
        new_scores = cur_scores * decay
        # the reference runs the drop check for every box with ANY overlap
        # (iw>0 and ih>0), even when the weight is 1.0
        alive = alive & ~((iou > 0) & (new_scores < score_thresh))
        alive = alive.at[i].set(False)
        return (new_scores, alive), (box_i, s_i, i, sel_valid)

    _, (out_boxes, out_scores, out_idx, out_valid) = jax.lax.scan(
        step, (scores, valid), None, length=max_out)
    out_idx = jnp.where(out_valid, out_idx, -1)
    out_boxes = jnp.where(out_valid[:, None], out_boxes, 0.0)
    out_scores = jnp.where(out_valid, out_scores, NEG_INF)
    return out_boxes, out_scores, out_idx, out_valid
