"""Small-dch fwd/bwd kernel envelope (probe round 3 follow-up).

The round-3 pipeline bench crashed with a scoped-VMEM OOM (36.75M of
16M) in the FORWARD kernel at nb=128 / Et=9216 / 2D=16 — the classifier
convs of a skew-heavy bridged graph. fits_vmem's fitted model was
calibrated at dch>=64 and under-estimates at small dch, where the f32
one-hot scratch dominates. This probe walks Et at dch in {8, 16, 32}
(bf16) to map the real small-dch boundary; same harness as
tools/probe_bwd_vmem.py.

Usage: nohup python tools/probe_bwd_vmem3.py > tools/probe_bwd_vmem3.log 2>&1 &
"""
import json
import sys

repo = __file__.rsplit("/", 2)[0]
sys.path.insert(0, repo)

import importlib.util

spec = importlib.util.spec_from_file_location(
    "probe_base", repo + "/tools/probe_bwd_vmem.py"
)
# reuse run_case/build from the base probe without executing its grid
src = open(repo + "/tools/probe_bwd_vmem.py").read()
head = src.split("ET_LADDER = ")[0]
ns = {"__file__": repo + "/tools/probe_bwd_vmem.py"}
exec(compile(head, "probe_base", "exec"), ns)  # noqa: S102
run_case = ns["run_case"]
res = ns["res"]
json_mod = json

OUT = repo + "/tools/probe_bwd_vmem3.json"
ET_LADDER = [2176, 3072, 4352, 5120, 6144, 7168, 8192, 9216, 10240]
GRID = [(128, 8, "bf16"), (128, 16, "bf16"), (128, 32, "bf16")]

for nb, d, dtype in GRID:
    for et in ET_LADDER:
        case = run_case(nb, d, dtype, et)
        res["cases"].append(case)
        print(json_mod.dumps(case), flush=True)
        with open(OUT, "w") as f:
            json_mod.dump(res, f, indent=1)
        if not case.get("fwd_ok"):
            break

print("done")
