"""Resume correctness + distributed LR scaling rules.

Reference semantics: optimizer state restored from -%04d.states
(core/detection_module.py:813-842) and the schedule continues from
begin_epoch; multi-worker linear scaling (detection_train.py:196-213).
"""
import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from simpledet_tpu.core.checkpoint import load_checkpoint, save_checkpoint
from simpledet_tpu.core.optimizer import freeze_mask, make_optimizer
from simpledet_tpu.core.schedule import apply_dp_scaling, warmup_multifactor
from simpledet_tpu.core.train import TrainState


class _Tiny(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.Dense(4)(nn.relu(nn.Dense(8)(x)))


def _make_state(sched):
    model = _Tiny()
    x = jnp.ones((2, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    mask = freeze_mask(params, [])
    tx = make_optimizer(sched, momentum=0.9, wd=1e-4, trainable_mask=mask)
    return model, TrainState.create(apply_fn=model.apply, params=params,
                                    tx=tx)


def _step(model, state, x, y):
    def loss_fn(p):
        return jnp.mean((model.apply({"params": p}, x) - y) ** 2)
    grads = jax.grad(loss_fn)(state.params)
    return state.apply_gradients(grads=grads)


def test_resume_matches_uninterrupted(tmp_path):
    # schedule with warmup + a decay boundary inside the run, so a replayed
    # warmup or reset count would visibly diverge
    sched = warmup_multifactor(0.1, [3], warmup_lr=0.01, warmup_iter=2)
    rng = np.random.RandomState(0)
    xs = [jnp.asarray(rng.randn(2, 3), jnp.float32) for _ in range(6)]
    ys = [jnp.asarray(rng.randn(2, 4), jnp.float32) for _ in range(6)]

    model, state_a = _make_state(sched)
    for i in range(6):
        state_a = _step(model, state_a, xs[i], ys[i])

    # interrupted run: 3 steps, checkpoint, restore, 3 more
    model, state_b = _make_state(sched)
    for i in range(3):
        state_b = _step(model, state_b, xs[i], ys[i])
    prefix = str(tmp_path / "ckpt")
    save_checkpoint(prefix, 1, state_b.params, state_b.opt_state,
                    step=state_b.step)

    model, state_c = _make_state(sched)
    params, opt_state, step = load_checkpoint(prefix, 1, state_c.params)
    assert step == 3
    state_c = state_c.replace(params=params, opt_state=opt_state, step=step)
    for i in range(3, 6):
        state_c = _step(model, state_c, xs[i], ys[i])

    for a, b in zip(jax.tree.leaves(state_a.params),
                    jax.tree.leaves(state_c.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
    # momentum buffers must match too, not just params
    for a, b in zip(jax.tree.leaves(state_a.opt_state),
                    jax.tree.leaves(state_c.opt_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_params_only_resume_fast_forwards_schedule():
    import optax.tree_utils as otu
    sched = warmup_multifactor(0.1, [10], warmup_lr=0.01, warmup_iter=4)
    model, state = _make_state(sched)
    # synthesize the detection_train.py params-only path: count -> 6
    opt_state = otu.tree_set(state.opt_state, count=jnp.asarray(6, jnp.int32))
    state = state.replace(opt_state=opt_state, step=6)
    x = jnp.ones((2, 3))
    y = jnp.zeros((2, 4))
    before = jax.tree.map(np.asarray, state.params)
    state = _step(model, state, x, y)
    # step 6 is past warmup (lr=0.1, not warmup's 0.01..): the update
    # magnitude reflects the full lr
    counts = [np.asarray(x) for x in jax.tree.leaves(state.opt_state)
              if np.asarray(x).dtype == np.int32]
    assert counts and all(c == 7 for c in counts)
    np.testing.assert_allclose(float(sched(6)), 0.1, rtol=1e-6)
    delta = np.abs(np.asarray(state.params["Dense_0"]["kernel"])
                   - before["Dense_0"]["kernel"]).max()
    assert delta > 0


def test_apply_dp_scaling_rules():
    # fake 2-process run, reference detection_train.py:196-213
    lr, lr_iter, warm = apply_dp_scaling(
        0.02, [60000, 80000], 500, num_workers=2, total_iter=90000,
        warmup_in_pct=True)
    assert lr == 0.04
    assert lr_iter == [30000, 40000]
    assert warm == 250
    # negative boundaries resolve against total_iter before scaling
    lr, lr_iter, warm = apply_dp_scaling(
        0.02, [-30000], 500, num_workers=2, total_iter=90000)
    assert lr_iter == [30000]
    assert warm == 500  # in_pct unset: warmup untouched (reference :212-213)
    # single worker is a no-op
    lr, lr_iter, warm = apply_dp_scaling(0.02, [60000], 500, num_workers=1)
    assert (lr, lr_iter, warm) == (0.02, [60000], 500)
