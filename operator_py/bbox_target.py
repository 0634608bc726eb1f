"""Compat shim: reference operator_py/bbox_target.py — the pure-numpy
ProposalTarget oracle (BboxTargetOperator:96). Here the oracle role is
played by the deterministic mode of the on-device implementation plus the
numpy oracles in tests/oracles.py; this module exposes a numpy wrapper with
the reference's call shape for external users."""
import numpy as np


def bbox_target(rois, gt_bboxes, *, image_rois=512, fg_fraction=0.25,
                fg_thresh=0.5, bg_thresh_hi=0.5, bg_thresh_lo=0.0,
                num_reg_class=81, class_agnostic=False,
                bbox_mean=(0., 0., 0., 0.), bbox_std=(0.1, 0.1, 0.2, 0.2),
                seed=0):
    """rois [R, 4], gt_bboxes [G, 5] -> dict of sampled rois/labels/targets
    (numpy in/out; computed by the jitted implementation)."""
    import jax
    import jax.numpy as jnp

    from simpledet_tpu.targets.proposal_target import proposal_target

    out = proposal_target(
        jax.random.PRNGKey(seed), jnp.asarray(rois, jnp.float32),
        jnp.asarray(gt_bboxes, jnp.float32), image_rois=image_rois,
        fg_fraction=fg_fraction, fg_thr=fg_thresh, bg_thr_hi=bg_thresh_hi,
        bg_thr_lo=bg_thresh_lo, num_reg_class=num_reg_class,
        class_agnostic=class_agnostic, bbox_mean=bbox_mean,
        bbox_std=bbox_std)
    return {k: np.asarray(v) for k, v in out.items()}
