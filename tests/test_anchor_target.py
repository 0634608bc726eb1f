import numpy as np
import jax
import jax.numpy as jnp

from simpledet_tpu.ops.anchors import generate_anchor_grid
from simpledet_tpu.targets.anchor_target import anchor_target, batched_anchor_target
from simpledet_tpu.targets.sampling import subsample_labels
from tests.oracles import np_anchor_target


def make_case(seed, h=160, w=224, num_gt=5, max_gt=10):
    rng = np.random.RandomState(seed)
    anchors = generate_anchor_grid(h // 16, w // 16, 16, (8,), (0.5, 1.0, 2.0))
    gt = np.full((max_gt, 5), -1, dtype=np.float32)
    for i in range(num_gt):
        x1 = rng.uniform(0, w - 60)
        y1 = rng.uniform(0, h - 60)
        bw = rng.uniform(20, 120)
        bh = rng.uniform(20, 120)
        gt[i] = [x1, y1, min(x1 + bw, w - 1), min(y1 + bh, h - 1), rng.randint(1, 10)]
    return anchors, gt, np.array([h, w], np.float32)


def test_anchor_target_matches_oracle_deterministic():
    for seed in range(3):
        anchors, gt, im_hw = make_case(seed)
        got_l, got_t, got_w = jax.jit(
            lambda g, hw: anchor_target(
                jax.random.PRNGKey(0), jnp.asarray(anchors), g, hw,
                deterministic=True)
        )(jnp.asarray(gt), jnp.asarray(im_hw))
        valid_gt = gt[gt[:, 4] != -1]
        want_l, want_t, want_w = np_anchor_target(
            anchors, valid_gt[:, :4], im_hw, 0, 0.3, 0.7, 0.0, 256, 0.5)
        np.testing.assert_array_equal(np.asarray(got_l), want_l)
        np.testing.assert_allclose(np.asarray(got_t), want_t, rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(got_w), want_w)


def test_anchor_target_no_gt():
    anchors, gt, im_hw = make_case(0, num_gt=0)
    l, t, w = anchor_target(jax.random.PRNGKey(0), jnp.asarray(anchors),
                            jnp.asarray(gt), jnp.asarray(im_hw),
                            deterministic=True)
    l = np.asarray(l)
    n_valid = int(((anchors[:, 0] >= 0) & (anchors[:, 1] >= 0) &
                   (anchors[:, 2] < im_hw[1]) & (anchors[:, 3] < im_hw[0])).sum())
    # all sampled labels are bg, none positive
    assert (l == 1).sum() == 0
    assert (l == 0).sum() == min(256, n_valid)
    assert np.asarray(w).sum() == 0


def test_anchor_target_sample_counts_random():
    anchors, gt, im_hw = make_case(1, h=512, w=672, num_gt=8)
    l, _, _ = anchor_target(jax.random.PRNGKey(3), jnp.asarray(anchors),
                            jnp.asarray(gt), jnp.asarray(im_hw))
    l = np.asarray(l)
    assert (l == 1).sum() <= 128
    assert (l == 1).sum() + (l == 0).sum() == 256


def test_batched_anchor_target_shapes():
    anchors, gt, im_hw = make_case(2, h=512, w=672)
    gtb = jnp.stack([jnp.asarray(gt)] * 2)
    hwb = jnp.stack([jnp.asarray(im_hw)] * 2)
    l, t, w = batched_anchor_target(jax.random.PRNGKey(0),
                                    jnp.asarray(anchors), gtb, hwb)
    assert l.shape == (2, anchors.shape[0])
    assert t.shape == (2, anchors.shape[0], 4)
    # different rng per image -> bg samples differ
    assert not np.array_equal(np.asarray(l[0]), np.asarray(l[1]))


def test_subsample_exact_counts():
    label = jnp.asarray([1.0] * 200 + [0.0] * 300 + [-1.0] * 12)
    out = np.asarray(subsample_labels(jax.random.PRNGKey(0), label, 256, 0.5))
    assert (out == 1).sum() == 128
    assert (out == 0).sum() == 128
    # fg deficit backfilled by bg
    label2 = jnp.asarray([1.0] * 10 + [0.0] * 500)
    out2 = np.asarray(subsample_labels(jax.random.PRNGKey(0), label2, 256, 0.5))
    assert (out2 == 1).sum() == 10
    assert (out2 == 0).sum() == 246


def test_ignore_regions_excluded():
    """class -2 rows (crowd ignore regions) neither assign positives nor
    leave covered anchors as background."""
    import jax
    from simpledet_tpu.ops.anchors import generate_anchor_grid
    from simpledet_tpu.targets.anchor_target import anchor_target

    anchors = generate_anchor_grid(8, 8, 8, (4,), (1.0,))
    gt = np.full((4, 5), -1, np.float32)
    gt[0] = [0, 0, 30, 30, -2]      # ignore region over the top-left
    gt[1] = [34, 34, 62, 62, 2]     # real gt elsewhere
    label, target, weight = anchor_target(
        jax.random.PRNGKey(0), jnp.asarray(anchors), jnp.asarray(gt),
        jnp.asarray([64., 64.]), image_anchor=64, deterministic=True)
    label = np.asarray(label)
    # anchors mostly covered by the ignore region (IoF > 0.5): never bg
    a = anchors
    iw = np.maximum(np.minimum(a[:, 2], 30) - np.maximum(a[:, 0], 0) + 1, 0)
    ih = np.maximum(np.minimum(a[:, 3], 30) - np.maximum(a[:, 1], 0) + 1, 0)
    area = (a[:, 2] - a[:, 0] + 1) * (a[:, 3] - a[:, 1] + 1)
    iof = iw * ih / area
    assert (label[iof > 0.5] != 0).all()
    assert (label == 1).sum() > 0   # real gt still assigned
