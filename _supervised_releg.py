"""Re-measure the bench_all supervised row (the original run hit the
'image'-key counting bug -> images_per_step 0, value 0.0) and patch it in
place in BENCH_ALL_r04.json. Run with the TPU free."""

import json
import os
import sys

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_default_prng_impl", "rbg")

from hpfg_tpu.utils.runtime import (enable_persistent_cache,  # noqa: E402
                                    require_healthy_dispatch,
                                    require_live_device)


def main() -> int:
    require_live_device("supervised_releg")
    enable_persistent_cache(platform=jax.devices()[0].platform)
    require_healthy_dispatch("supervised_releg")
    from bench_all import CONFIGS, bench_one
    name, cfg_path = CONFIGS[0]
    assert name == "supervised"
    row = bench_one(name, cfg_path)
    print(json.dumps(row), flush=True)
    path = os.path.join(REPO, "BENCH_ALL_r04.json")
    art = json.load(open(path))
    art["rows"] = [row if r["metric"] == row["metric"] else r
                   for r in art["rows"]]
    art["note_supervised"] = ("supervised row re-measured after fixing the "
                              "'image'-key counting bug (value was 0.0)")
    with open(path, "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps({"supervised_releg_ok": True, "value": row["value"]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
