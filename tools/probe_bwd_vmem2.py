"""Continuation of probe_bwd_vmem.py (session cut it off mid-grid).

Covers: (nb=256, D=128) bf16 from Et=2560 and f32 full ladder, plus a
3x determinism re-run of the one anomalous forward case the first probe
recorded (nb=128, D=256, bf16, Et=2560: fwd_rel_err 0.60 amid 0.03
neighbors — flaky numerics vs deterministic miscompile?).

Usage: python tools/probe_bwd_vmem2.py
Writes tools/probe_bwd_vmem2.json incrementally.
"""
import importlib.util
import json
import sys

repo = __file__.rsplit("/", 2)[0]
sys.path.insert(0, repo)

spec = importlib.util.spec_from_file_location(
    "probe1_defs", repo + "/tools/probe_bwd_vmem.py"
)
# reuse run_case/build from the first probe without re-running its grid:
# import the module source up to the grid loop
src = open(repo + "/tools/probe_bwd_vmem.py").read()
head = src.split("ET_LADDER = ")[0]
ns = {"__file__": repo + "/tools/probe_bwd_vmem.py"}
exec(compile(head, "probe_bwd_vmem_head", "exec"), ns)  # noqa: S102
run_case = ns["run_case"]

OUT = repo + "/tools/probe_bwd_vmem2.json"
res = {"platform": ns["res"]["platform"], "cases": []}


def record(case):
    res["cases"].append(case)
    print(json.dumps(case), flush=True)
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)


# 1. anomaly determinism: 3 repeats of the bad forward case
for rep in range(3):
    c = run_case(128, 256, "bf16", 2560)
    c["anomaly_rep"] = rep
    record(c)

# 2. finish the nb=256 grid
for dtype, ladder in (
    ("bf16", [2560, 3072, 3584, 4352, 5120]),
    ("f32", [512, 1024, 1536, 2176, 2560, 3072, 3584, 4352, 5120]),
):
    fwd_dead = False
    bwd_dead = False
    extra = 0
    for et in ladder:
        if fwd_dead or (bwd_dead and extra >= 2):
            break
        case = run_case(256, 128, dtype, et)
        record(case)
        if not case.get("fwd_ok"):
            fwd_dead = True
        elif case.get("bwd_ok") is False:
            bwd_dead = True
        if bwd_dead:
            extra += 1

print("done")
