"""Static-shape random subsampling primitives.

The reference subsamples fg/bg index sets with np.random.choice /
random_shuffle on the host (core/detection_input.py:480-495,
operator_cxx/proposal_target.cc SampleROI). On TPU we keep everything
on-device and statically shaped: "choose k of the set bits, at random" is
expressed as a randomized top-k over masked priorities.

deterministic=True reproduces the reference's DEBUG mode
(core/detection_input.py:485-494: disable the index prefix, i.e. keep the
highest-indexed candidates), used for oracle parity tests.
"""
import jax
import jax.numpy as jnp

from simpledet_tpu.ops.topk import fast_top_k


def _priorities(rng, n, deterministic):
    if deterministic:
        # keep highest indices (reference DEBUG disables the prefix)
        return jnp.arange(n, dtype=jnp.float32)
    return jax.random.uniform(rng, (n,))


def random_topk_mask(rng, mask, k, deterministic=False):
    """Select min(k, sum(mask)) elements of `mask` uniformly at random.

    Returns a boolean mask of the selected elements (k must be static).
    """
    n = mask.shape[0]
    prio = jnp.where(mask, _priorities(rng, n, deterministic), -jnp.inf)
    # random priorities: an approximate top-k of iid uniforms is still a
    # uniform random subset, so the TPU ApproxTopK path is distributionally
    # equivalent (deterministic mode keeps the exact path: monotone prios)
    if deterministic:
        _, idx = jax.lax.top_k(prio, k)
    else:
        _, idx = fast_top_k(prio, k)
    sel = jnp.zeros((n,), bool).at[idx].set(True)
    return sel & mask


def random_rank(rng, mask, deterministic=False):
    """Random rank (0 = first chosen) of each set element of mask; unset
    elements get rank n. Enables dynamic-k selection: keep = rank < k."""
    n = mask.shape[0]
    prio = jnp.where(mask, _priorities(rng, n, deterministic), -jnp.inf)
    order = jnp.argsort(-prio)
    rank = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    return jnp.where(mask, rank, n)


def subsample_labels(rng, label, num_sample, fg_fraction, deterministic=False,
                     return_fg_idx=False):
    """Reference _sample_anchor semantics (core/detection_input.py:480-495):

    label: [N] with {1: fg, 0: bg, -1: ignore}. Keep at most
    num_fg = fg_fraction*num_sample positives (random subset; excess -> -1),
    then at most num_sample - kept_fg backgrounds. Returns new label; with
    return_fg_idx=True returns (label, fg_idx [num_fg]) where fg_idx holds
    the indices of the kept positives padded with n — callers that need the
    fg set (regression-target gathers) reuse the top-k the selection already
    ran instead of a nonzero() (which lowers to a full [N] sort on TPU,
    profiled at ~5 ms at flagship scale).
    """
    rng_fg, rng_bg = jax.random.split(rng)
    num_fg = int(fg_fraction * num_sample)
    n = label.shape[0]

    fg_mask = label == 1
    prio_fg = jnp.where(fg_mask, _priorities(rng_fg, n, deterministic),
                        -jnp.inf)
    if deterministic:
        vals_fg, idx_fg = jax.lax.top_k(prio_fg, num_fg)
    else:
        vals_fg, idx_fg = fast_top_k(prio_fg, num_fg)
    sel_fg = jnp.isfinite(vals_fg)
    keep_fg = jnp.zeros((n,), bool).at[idx_fg].set(sel_fg) & fg_mask
    label = jnp.where(fg_mask & ~keep_fg, -1.0, label)

    n_fg_kept = jnp.sum(label == 1)
    num_bg = num_sample - n_fg_kept
    bg_mask = label == 0
    prio = jnp.where(bg_mask, _priorities(rng_bg, n, deterministic), -jnp.inf)
    if deterministic:
        vals, idx = jax.lax.top_k(prio, num_sample)  # sorted descending
    else:
        vals, idx = fast_top_k(prio, num_sample)     # sorted descending
    pos = jnp.arange(num_sample)
    sel = (pos < num_bg) & jnp.isfinite(vals)
    keep_bg = jnp.zeros((n,), bool).at[idx].set(sel)
    label = jnp.where(bg_mask & ~keep_bg, -1.0, label)
    if return_fg_idx:
        fg_idx = jnp.where(sel_fg, idx_fg, n)
        return label, fg_idx
    return label
