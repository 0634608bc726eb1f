"""Detection loss primitives as pure-jnp functions.

TPU rewrites of the reference's C++/CUDA loss ops:
  * sigmoid focal loss            (operator_cxx/contrib/focal_loss{-inl.h,.cu},
                                   alpha=0.25 gamma=2, 'valid' fg normalization)
  * smooth-L1                     (mxnext X.smooth_l1)
  * sigmoid cross entropy w/ ignore (operator_cxx/contrib/sigmoid_cross_entropy*)
  * bbox_norm fg-count gradient normalization (operator_cxx/contrib/bbox_norm*)
    folded directly into the loss math: dividing the LOSS by fg_count is
    identical to dividing the gradients.

All are shape-static and batch-broadcastable; normalization counts computed
with jnp.sum span the GLOBAL batch under pjit (the reference's `sync_loss`
cross-device fg-count sync, models/retinanet/builder.py:254-257, for free).
"""
import jax
import jax.numpy as jnp


def smooth_l1(diff, sigma=1.0):
    """Elementwise smooth-L1 with transition point 1/sigma^2
    (mxnext X.smooth_l1 / py-faster-rcnn convention)."""
    sigma2 = sigma * sigma
    ad = jnp.abs(diff)
    return jnp.where(ad < 1.0 / sigma2, 0.5 * sigma2 * diff * diff,
                     ad - 0.5 / sigma2)


def sigmoid_focal_loss(logits, label, *, alpha=0.25, gamma=2.0):
    """Per-anchor multi-class sigmoid focal loss (summed over classes).

    logits: [..., N, C-1] (no background column); label: [..., N] int-valued
    float with 0 = background, k in 1..C-1 = class k, -1 = ignore.
    Returns per-anchor loss [..., N]; ignored anchors contribute 0.

    Matches FocalLoss (operator_cxx/contrib/focal_loss-inl.h): for the target
    class FL = -alpha (1-p)^gamma log(p); for every other class
    FL = -(1-alpha) p^gamma log(1-p).
    """
    num_fg_class = logits.shape[-1]
    lbl = label.astype(jnp.int32)
    # one-hot over foreground classes; bg/ignore rows are all-zero
    onehot = jax.nn.one_hot(lbl - 1, num_fg_class, dtype=logits.dtype)
    p = jax.nn.sigmoid(logits)
    # numerically stable log-sigmoid forms
    log_p = jax.nn.log_sigmoid(logits)
    log_1p = jax.nn.log_sigmoid(-logits)
    pos = -alpha * jnp.power(1.0 - p, gamma) * log_p
    neg = -(1.0 - alpha) * jnp.power(p, gamma) * log_1p
    per_class = jnp.where(onehot > 0, pos, neg)
    loss = jnp.sum(per_class, axis=-1)
    return jnp.where(label >= 0, loss, 0.0)


def sigmoid_cross_entropy(logits, label, weight=None, ignore_label=-1):
    """Mean-reduced BCE with ignore (operator_cxx/contrib/
    sigmoid_cross_entropy*, used for mask loss
    models/maskrcnn/builder.py:307-312).

    logits/label broadcastable; label == ignore_label entries excluded from
    both numerator and the mean denominator.
    """
    valid = label != ignore_label
    log_p = jax.nn.log_sigmoid(logits)
    log_1p = jax.nn.log_sigmoid(-logits)
    ce = -(label * log_p + (1.0 - label) * log_1p)
    if weight is not None:
        ce = ce * weight
        valid = valid & (weight > 0)
    n = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(jnp.where(valid, ce, 0.0)) / n
