"""Re-run the cache probe's 'off' leg and merge it into CACHE_PROBE_r03.json.

The chain-r5 orchestrator run hit a probe-script bug on mode=off (fixed in
_cache_probe.py); the other three legs are valid. This reruns just 'off'
as a subprocess (ONE TPU job — run only when the chip is free) and rewrites
the artifact's row + marginal_ms.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))
ART = os.path.join(REPO, "CACHE_PROBE_r03.json")

p = subprocess.run(
    [sys.executable, "-u", os.path.join(REPO, "_cache_probe.py"), "run", "off"],
    capture_output=True, text=True, timeout=3600, cwd=REPO)
lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
if p.returncode != 0 or not lines:
    print(f"off leg FAILED rc={p.returncode}\n{p.stderr[-1500:]}")
    sys.exit(1)
row = json.loads(lines[-1])
print(f"off leg: {lines[-1]}")

with open(ART) as f:
    art = json.load(f)
art["rows"] = [row if r.get("mode") == "off" else r for r in art["rows"]]
base = {r["mode"]: r.get("ms_per_iter") for r in art["rows"]
        if "ms_per_iter" in r}
art["marginal_ms"] = {
    "rotflip_vs_off": round(base["rotflip"] - base["off"], 2),
    "rotonly_vs_off": round(base["rotonly"] - base["off"], 2),
    "full_vs_off": round(base["on"] - base["off"], 2),
}
with open(ART, "w") as f:
    json.dump(art, f, indent=1)
print(json.dumps(art["marginal_ms"]))
