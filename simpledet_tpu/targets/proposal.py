"""RPN proposal generation — fully on-device, statically shaped.

Replaces the reference's C++/CUDA Proposal/Proposal_v2/Proposal_v3 ops
(operator_cxx/contrib/proposal*.cu: grid enum, delta decode, clip, min-size
filter, score sort, greedy bitmask NMS) with jnp decode + ops/nms. v3
semantics (used by FPN, models/FPN/builder.py:275-311): returns (proposal,
score) pairs per level; cross-level selection is a top-k over the concat
(mxnext.tvm.get_top_proposal).

Padding convention: invalid output rows are all-zero boxes; downstream
ProposalTarget treats y2 == 0 as padding (operator_cxx/proposal_target-inl.h:173-175).
"""
import jax
import jax.numpy as jnp

from simpledet_tpu.ops.bbox import clip_boxes, decode_boxes
from simpledet_tpu.ops.nms import NEG_INF, nms
from simpledet_tpu.ops.topk import fast_top_k


def gen_proposals(scores, deltas, anchors, im_hw, *,
                  pre_nms_top_n, post_nms_top_n, nms_thr, min_size=0,
                  legacy_plus_one=True):
    """Single-image, single-level proposal generation.

    scores: [N] fg probabilities; deltas: [N, 4]; anchors: [N, 4] constant.
    im_hw: [2] resized image (h, w) to clip against.
    Returns (boxes [post_nms_top_n, 4], scores [post_nms_top_n]) score-sorted,
    padded with zero boxes / NEG_INF scores.
    """
    boxes = decode_boxes(anchors, deltas, legacy_plus_one=legacy_plus_one)
    boxes = clip_boxes(boxes, im_hw, legacy_plus_one=legacy_plus_one)
    off = 1.0 if legacy_plus_one else 0.0
    ws = boxes[:, 2] - boxes[:, 0] + off
    hs = boxes[:, 3] - boxes[:, 1] + off
    valid = (ws >= min_size) & (hs >= min_size)
    masked = jnp.where(valid, scores, NEG_INF)

    k = min(pre_nms_top_n, scores.shape[0])
    top_scores, top_idx = fast_top_k(masked, k)
    top_boxes = boxes[top_idx]
    top_valid = top_scores > NEG_INF / 2

    out_boxes, out_scores, _, out_valid = nms(
        top_boxes, top_scores, nms_thr, post_nms_top_n, valid=top_valid,
        legacy_plus_one=legacy_plus_one)
    out_boxes = jnp.where(out_valid[:, None], out_boxes, 0.0)
    return out_boxes, jnp.where(out_valid, out_scores, NEG_INF)


def top_proposals(level_boxes, level_scores, top_n):
    """Cross-level top-k by score (mxnext.tvm.get_top_proposal analog).

    level_boxes: list of [Ki, 4]; level_scores: list of [Ki]. Padded entries
    carry NEG_INF scores and are never selected unless everything is padding.
    Returns (boxes [top_n, 4], scores [top_n]).
    """
    boxes = jnp.concatenate(level_boxes, axis=0)
    scores = jnp.concatenate(level_scores, axis=0)
    top_scores, idx = jax.lax.top_k(scores, top_n)
    top_boxes = boxes[idx]
    ok = top_scores > NEG_INF / 2
    return jnp.where(ok[:, None], top_boxes, 0.0), top_scores
