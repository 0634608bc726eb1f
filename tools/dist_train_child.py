"""One process of a multi-process CPU training run (tests/test_distributed.py).

Usage:
  python tools/dist_train_child.py --process-id I --num-processes N \
      --port P --config config/micro_test.py --out OUT.json \
      [--max-iter K] [--local-devices 4]

Sets up a 4-virtual-device CPU backend, joins the jax.distributed cluster
via SIMPLEDET_DISTRIBUTED=<coordinator>,<nproc>,<pid> (the explicit form
detection_train.py parses), runs train_net, and dumps per-step losses plus
the loader's actual record shard to OUT.json. The analog of the
reference's DMLC worker (scripts/dist_worker.sh:6, detection_train.py:42-44)
— but testable on one machine with no ssh/scheduler.
"""
import argparse
import json
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--config", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--max-iter", type=int, default=None)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--workdir", default=None,
                    help="chdir here first (per-process experiments/)")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={args.local_devices}")
    os.environ["SIMPLEDET_DISTRIBUTED"] = (
        f"localhost:{args.port},{args.num_processes},{args.process_id}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    from jax._src import xla_bridge as _xb
    _xb._backend_factories.pop("axon", None)

    if args.workdir:
        os.makedirs(args.workdir, exist_ok=True)
        os.chdir(args.workdir)

    # record the actual loader shards train_net constructs (rank, rec_ids)
    import simpledet_tpu.data.loader as loader_mod
    shards = []
    orig_loader = loader_mod.Loader

    class RecordingLoader(orig_loader):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            shards.append({"rank": kw.get("rank", 0),
                           "num_ranks": kw.get("num_ranks", 1),
                           "rec_ids": [r.get("rec_id") for r in self.roidb]})

    loader_mod.Loader = RecordingLoader

    config_path = args.config if os.path.isabs(args.config) \
        else os.path.join(repo, args.config)
    from detection_train import train_net
    hist = []
    train_net(config_path, max_iter_override=args.max_iter,
              loss_history=hist)

    out = {
        "process_id": args.process_id,
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "global_devices": jax.device_count(),
        "local_devices": jax.local_device_count(),
        "losses": hist,
        "loader_shards": shards,
        "cwd": os.getcwd(),
    }
    with open(args.out, "w") as f:
        json.dump(out, f)
    print("CHILD_DONE", args.process_id, flush=True)


if __name__ == "__main__":
    main()
