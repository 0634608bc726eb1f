"""Capture a jax.profiler trace of the flagship train step on the real chip
and print the top HLO ops by self time (parsed with tensorboard-plugin-profile,
no TensorBoard UI needed).

Usage:
    python tools/perf_trace.py [config] [--batch N] [--steps N] [--top N]
"""
import glob
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json

import numpy as np

TRACE_DIR = "/tmp/simpledet_trace"


def build_step(cfg_path, batch_image):
    import jax
    import jax.numpy as jnp

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               "/tmp/simpledet_jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from simpledet_tpu.core.config import load_config
    from simpledet_tpu.core.optimizer import freeze_mask, make_optimizer
    from simpledet_tpu.core.train import TrainState, make_train_step

    cfg = load_config(cfg_path)
    out = cfg.get_config(is_train=True)
    ModelParam = out[6]
    model = ModelParam.train_symbol

    b, h, w = batch_image, 800, 1333
    rng = np.random.RandomState(0)
    gt = np.full((b, 100, 5), -1, np.float32)
    for i in range(20):
        x1, y1 = rng.uniform(0, 600, 2)
        gt[:, i] = [x1, y1, x1 + rng.uniform(30, 300),
                    y1 + rng.uniform(30, 200), rng.randint(1, 81)]
    batch = {
        "data": jnp.asarray(rng.randn(b, h, w, 3), jnp.float32),
        "im_info": jnp.asarray(np.tile([[h, w, 1.0]], (b, 1)), jnp.float32),
        "gt_bbox": jnp.asarray(gt),
    }
    variables = jax.jit(
        lambda k1, k2, d, ii, g: model.init(
            {"params": k1, "sampling": k2}, d, ii, g, mode="train"))(
        jax.random.PRNGKey(0), jax.random.PRNGKey(1),
        batch["data"][:1], batch["im_info"][:1], batch["gt_bbox"][:1])
    tx = make_optimizer(lambda s: 0.01, momentum=0.9, wd=1e-4,
                        trainable_mask=freeze_mask(
                            variables["params"],
                            ["conv0", "stage1", "scale", "bias"]))
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"], tx=tx)
    step_fn = make_train_step(model, mesh=None, donate=False)
    return step_fn, state, batch


def capture(step_fn, state, batch, n_steps):
    import jax

    key = jax.random.PRNGKey(7)
    for i in range(3):  # warmup + compile
        state, losses, _ = step_fn(state, batch, jax.random.fold_in(key, i))
    jax.device_get(losses)

    os.makedirs(TRACE_DIR, exist_ok=True)
    jax.profiler.start_trace(TRACE_DIR)
    for i in range(n_steps):
        state, losses, _ = step_fn(state, batch,
                                   jax.random.fold_in(key, 100 + i))
    jax.device_get(losses)
    jax.profiler.stop_trace()


def _opcode(expr):
    """Extract the HLO opcode from an instruction expression like
    '%name = bf16[...]{...} fusion(...), kind=kOutput, ...'."""
    try:
        rhs = expr.split(" = ", 1)[1]
        # skip the result type (everything up to the first space after the
        # closing brace of the layout, or just the first token if no type)
        i = rhs.find("} ")
        tok = rhs[i + 2:] if i >= 0 else rhs
        # tuples have nested types: find the opcode as the first identifier
        # followed by '('
        import re
        m = re.search(r"([a-zA-Z-]+[a-zA-Z_\-.0-9]*)\(", tok)
        return m.group(1) if m else tok.split("(")[0].strip()
    except Exception:
        return "?"


def parse_trace(top_n, n_steps):
    """Aggregate device-side HLO op times straight from the xplane proto
    (the installed tensorboard-plugin-profile is ABI-incompatible with the
    installed TF, so we read the XSpace ourselves)."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(
        TRACE_DIR, "plugins/profile/*/*.xplane.pb")))
    if not paths:
        print("no xplane found under", TRACE_DIR)
        return
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    plane = next(p for p in xs.planes if "TPU" in p.name or "GPU" in p.name)
    em = {e.id: e for e in plane.event_metadata.values()}

    agg = {}  # display_name -> [total_ps, count, expr]
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            md = em[ev.metadata_id]
            name = md.display_name or md.name
            a = agg.setdefault(name, [0, 0, md.name])
            a[0] += ev.duration_ps
            a[1] += 1
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    total = sum(v[0] for _, v in rows)
    print(f"total XLA-op device time: {total / n_steps / 1e9:.2f} ms/step "
          f"over {n_steps} steps ({len(rows)} distinct ops)")
    print(f"{'us/step':>9} {'%':>5} {'calls':>6}  name")
    for name, (ps, cnt, expr) in rows[:top_n]:
        print(f"{ps / n_steps / 1e6:9.0f} {100 * ps / total:5.1f} "
              f"{cnt // n_steps:6d}  {name}")
        print(f"{'':23}{expr[:140]}")
    by_op = {}
    for name, (ps, cnt, expr) in rows:
        by_op[_opcode(expr)] = by_op.get(_opcode(expr), 0) + ps
    print("\nby opcode (ms/step):")
    for k, v in sorted(by_op.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {v / n_steps / 1e9:8.2f}  {100 * v / total:5.1f}%  {k}")


def main():
    argv = sys.argv[1:]
    cfg_path = next((a for a in argv if a.endswith(".py")),
                    "config/faster_r50v1_fpn_bf16_1x.py")
    batch = int(argv[argv.index("--batch") + 1]) if "--batch" in argv else 2
    steps = int(argv[argv.index("--steps") + 1]) if "--steps" in argv else 5
    top_n = int(argv[argv.index("--top") + 1]) if "--top" in argv else 25

    if "--parse-only" not in argv:
        step_fn, state, b = build_step(cfg_path, batch)
        capture(step_fn, state, b, steps)
    parse_trace(top_n, steps)


if __name__ == "__main__":
    main()
