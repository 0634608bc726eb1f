"""Per-instruction HBM traffic budget of the compiled flagship train step.

Round-3 roofline analysis (doc/BENCHMARK.md) showed the bf16 step is
HBM-bound (~43 GB/step at ~75% of v5e bandwidth) but had no breakdown of
WHERE the bytes go. This tool compiles the step (no execution needed
beyond compile; works over the tunnel) and walks the optimized HLO's
entry computation: every top-level instruction reads its operands from
HBM and writes its output (instructions inside fusions don't touch HBM),
so bytes(instr) = out_bytes + sum(operand bytes). That approximates
traffic well for an HBM-bound program modulo caching of small operands.

Prints the top-N instructions and a per-category rollup.

Usage:
    python tools/perf_hbm_budget.py [config] [--batch N] [--top N] [--remat]
"""
import os
import re
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
from collections import defaultdict

import numpy as np

DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}

SHAPE_RE = re.compile(r"(pred|[su]\d+|bf16|f16|f32|f64)\[([\d,]*)\]")


def shape_bytes(type_str):
    """Total bytes of an HLO type string (handles tuples)."""
    total = 0
    for m in SHAPE_RE.finditer(type_str):
        dt, dims = m.group(1), m.group(2)
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


INSTR_RE = re.compile(r"^\s+(%?[\w.-]+)\s*=\s*(\([^)]*\)|\S+)\s+([\w-]+)\(")


def parse_entry(hlo_text):
    """Yield (name, type_str, opcode, operand_names, raw_line) for the entry
    computation's instructions."""
    entry = hlo_text[hlo_text.rindex("ENTRY "):]
    for line in entry.splitlines():
        m = INSTR_RE.match(line)
        if not m:
            continue
        name, type_str, opcode = m.group(1).lstrip("%"), m.group(2), m.group(3)
        # operand refs: %name tokens in the call args (first paren group)
        args = line[m.end():]
        depth = 1
        out = []
        for ch in args:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    break
            out.append(ch)
        operands = re.findall(r"%([\w.-]+)", "".join(out))
        yield name, type_str, opcode, operands, line


FREE_OPS = {"parameter", "constant", "get-tuple-element", "bitcast", "tuple",
            "iota"}


def category(opcode, line):
    if opcode == "fusion":
        k = re.search(r"kind=(\w+)", line)
        kind = k.group(1) if k else "?"
        # pull a metadata op hint if present
        hint = re.search(r'metadata={op_name="([^"]*)"', line)
        tag = ""
        if hint:
            parts = hint.group(1).split("/")
            tag = "/".join(parts[1:3]) if len(parts) > 2 else hint.group(1)
        return f"fusion:{kind}:{tag[:48]}"
    return opcode


def source_hint(line):
    """metadata op_name tail — names the jax-level op a copy/pad/slice
    serves, which is what you need to know to remove it."""
    hint = re.search(r'metadata={op_name="([^"]*)"', line)
    if not hint:
        return "?"
    parts = hint.group(1).split("/")
    return "/".join(parts[-3:])[-80:]


def main():
    import jax
    import jax.numpy as jnp

    from simpledet_tpu.core.config import load_config
    from simpledet_tpu.core.optimizer import freeze_mask, make_optimizer
    from simpledet_tpu.core.train import TrainState, make_train_step
    from simpledet_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    argv = sys.argv[1:]
    cfg_path = next((a for a in argv if a.endswith(".py")),
                    "config/faster_r50v1_fpn_bf16_1x.py")
    b = int(argv[argv.index("--batch") + 1]) if "--batch" in argv else 2
    top = int(argv[argv.index("--top") + 1]) if "--top" in argv else 25

    cfg = load_config(cfg_path)
    out = cfg.get_config(is_train=True)
    ModelParam = out[6]
    if "--remat" in argv:
        ModelParam.memonger = True
    model = ModelParam.train_symbol

    h, w = 800, 1333
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
    remat = ModelParam.memonger_until or True if ModelParam.memonger else False
    step = make_train_step(model, mesh=None, donate=False, remat=remat)
    rng_key = jax.random.PRNGKey(7)
    lowered = jax.jit(lambda s, bt, k: step(s, bt, k)).lower(
        state, batch, rng_key)
    compiled = lowered.compile()
    hlo = compiled.as_text()

    sizes = {}
    rows = []
    for name, type_str, opcode, operands, line in parse_entry(hlo):
        out_b = shape_bytes(type_str)
        sizes[name] = (out_b, opcode)
        if opcode in FREE_OPS:
            continue
        read_b = 0
        for op_name in operands:
            if op_name in sizes:
                ob, oop = sizes[op_name]
                if oop not in ("constant",):
                    read_b += ob
        rows.append((out_b + read_b, out_b, read_b, name,
                     category(opcode, line)))

    if "--dump" in argv:
        with open("/tmp/step_hlo.txt", "w") as f:
            f.write(hlo)
        print("dumped HLO to /tmp/step_hlo.txt")

    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    print(f"batch {b}  entry-level instructions: {len(rows)}  "
          f"approx total HBM traffic: {total/1e9:.2f} GB/step "
          f"({total/1e9/b:.2f} GB/img)")
    print(f"\ntop {top} instructions (GB = read+write):")
    for t, ob, rb, name, cat in rows[:top]:
        print(f"  {t/1e9:6.3f} GB  (w {ob/1e9:5.2f} r {rb/1e9:5.2f})  "
              f"{cat:<56.56}  {name[:40]}")

    agg = defaultdict(float)
    for t, ob, rb, name, cat in rows:
        agg[cat.split(":")[0] if not cat.startswith("fusion") else cat] += t
    print("\nby category:")
    for cat, t in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {t/1e9:7.3f} GB  {cat}")

    # data-movement attribution: where do the copies/pads/slices COME from
    move = defaultdict(float)
    for name, type_str, opcode, operands, line in parse_entry(hlo):
        if opcode in ("copy", "pad", "slice", "copy-start", "transpose",
                      "dynamic-slice", "concatenate"):
            out_b = shape_bytes(type_str)
            read_b = sum(sizes[o][0] for o in operands
                         if o in sizes and sizes[o][1] != "constant")
            move[f"{opcode}: {source_hint(line)}"] += out_b + read_b
    print("\ndata movement by source (top 25):")
    for src, t in sorted(move.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {t/1e9:7.3f} GB  {src}")


if __name__ == "__main__":
    main()
