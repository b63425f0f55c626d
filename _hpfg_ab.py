"""One HPFG bench leg for the round-5 A/B sweep (VERDICT r4 #3).

The pool-form and fused-dispatch A/Bs were all decided on the mean_teacher
config (BENCH_NOTES Session-12); HPFG's cost mix is different (dual
students + teacher: pool-backward glue and small-stage XLA convs weigh
~2x). This re-runs the cheap dispatch-level candidates on the flagship
config itself. Flags are read at import time — run each leg in a fresh
process:

    HPFG_POOL=halves python -u _hpfg_ab.py halves

Writes _chain/hpfg_ab_<leg>.json and prints one JSON line.
"""

import json
import os
import sys

leg = sys.argv[1] if len(sys.argv) > 1 else "default"
# optional: bench a different config row (default: the HPFG flagship)
ALGO = sys.argv[2] if len(sys.argv) > 2 else "hpfg"
CFG = (sys.argv[3] if len(sys.argv) > 3
       else "configs/hpfg_unet_plus_30k_224x224_ACDC.yaml")

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_default_prng_impl", "rbg")

from hpfg_tpu.utils.runtime import (enable_persistent_cache,  # noqa: E402
                                    require_live_device)


def main() -> int:
    require_live_device(f"hpfg_ab:{leg}")
    enable_persistent_cache(platform=jax.devices()[0].platform)
    import bench_all

    row = bench_all.bench_one(ALGO, CFG)
    row["leg"] = leg
    row["env"] = {k: v for k, v in os.environ.items()
                  if k.startswith("HPFG_")}
    os.makedirs(os.path.join(REPO, "_chain"), exist_ok=True)
    with open(os.path.join(REPO, "_chain", f"hpfg_ab_{leg}.json"), "w") as f:
        json.dump(row, f, indent=1)
    print(json.dumps({"leg": leg, "img_per_s": row["value"],
                      "step_ms": row["step_ms"], "mfu": row.get("mfu")}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
