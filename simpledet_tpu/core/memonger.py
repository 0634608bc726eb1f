"""Automatic remat planning to a memory budget.

The reference binary-searches a gradient-checkpoint plan until the
symbolic graph fits a memory threshold (utils/memonger_v2.py:226
search_plan_to_layer: bisect the mirror threshold up to a named layer).
The TPU analog searches over jax.checkpoint policies instead of graph
rewrites: candidates are ordered from no remat to the most aggressive
memonger_until stage, each one compile-only evaluated (XLA's own buffer
assignment via compiled.memory_analysis() — exact, not a heuristic), and
the plan picked is the LIGHTEST one whose peak HBM fits the budget.

Wired via `ModelParam.memonger_budget_gb` (detection_train.py); the
manual `memonger` / `memonger_until` knobs still force a specific plan.

MEASURED REALITY (round 5, v5e, flagship bf16 800x1333): policy remat
does NOT reduce this model's compiled peak —
batch 8: none 5.22 / dots 5.33 / stage2 5.32 / stage4 6.28 GiB;
batch 32: none 16.13 GiB (stage4 fails to compile). A single
jax.checkpoint block recomputes the whole forward before the backward,
so the rematerialized activations have the same peak liveness as the
saved ones; only per-stage SEGMENTED checkpointing (restructuring the
module) would change the peak. The planner is honest about this: it
compares the compiler's own numbers and picks no-remat when remat does
not pay, or reports that no candidate fits the budget.
"""

# lightest -> heaviest recompute:
#   False     - no remat
#   True      - dots-saveable policy (matmul/conv outputs kept)
#   stage2..4 - save only backbone stage exits >= N; everything earlier
#               recomputes in the backward pass (memonger_until analog)
CANDIDATES = (False, True, "stage2", "stage3", "stage4")


def peak_hbm_bytes(compiled):
    """Peak device memory of a compiled executable: XLA's buffer
    assignment (temps + args + outputs - donated aliases)."""
    mem = compiled.memory_analysis()
    if mem is None:
        return None
    return (getattr(mem, "temp_size_in_bytes", 0)
            + getattr(mem, "argument_size_in_bytes", 0)
            + getattr(mem, "output_size_in_bytes", 0)
            - getattr(mem, "alias_size_in_bytes", 0))


def plan_remat(make_step, state, batch, rng, budget_bytes, *,
               candidates=CANDIDATES, logger=None):
    """Bisect `candidates` (ordered lightest->heaviest recompute) for the
    lightest remat plan whose compiled peak HBM fits budget_bytes.

    make_step: remat_setting -> step_fn(state, batch, rng). Compile-only:
    nothing executes, so this works over the TPU tunnel in seconds per
    candidate (the reference re-bound full executors per probe,
    memonger_v2.py search_plan_to_layer).

    Returns (chosen_setting, peak_bytes, history). Falls back to the
    heaviest candidate (with a warning) when even it exceeds the budget,
    and to no-remat when the backend cannot report memory analysis.
    """
    import jax

    history = []

    def peak_of(setting):
        step = make_step(setting)
        if not hasattr(step, "lower"):      # plain callable: wrap
            step = jax.jit(step)
        compiled = step.lower(state, batch, rng).compile()
        p = peak_hbm_bytes(compiled)
        history.append((setting, p))
        if logger:
            logger.info(
                f"memonger probe remat={setting!r}: peak "
                f"{p / 2**30:.2f} GiB" if p is not None else
                f"memonger probe remat={setting!r}: no memory analysis")
        return p

    # bisect: find leftmost candidate that fits (candidates are ordered by
    # decreasing peak memory, so fits(i) is monotone in i)
    lo, hi = 0, len(candidates) - 1
    best = None
    first_peak = peak_of(candidates[0])
    if first_peak is None:
        return candidates[0], None, history
    if first_peak <= budget_bytes:
        return candidates[0], first_peak, history
    while lo < hi:
        mid = (lo + hi) // 2
        if mid == 0:
            lo = 1
            continue
        p = peak_of(candidates[mid])
        if p is not None and p <= budget_bytes:
            hi = mid
            best = (candidates[mid], p)
        else:
            lo = mid + 1
    final = candidates[lo]
    if best is not None and best[0] == final:
        peak = best[1]
    else:
        peak = peak_of(final)
    if peak is not None and peak > budget_bytes and logger:
        logger.info(
            f"memonger: even remat={final!r} needs {peak / 2**30:.2f} GiB "
            f"> budget {budget_bytes / 2**30:.2f} GiB; using it anyway")
    return final, peak, history
