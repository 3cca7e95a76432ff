#!/bin/bash
# Capture .explain("formatted") for the r13-touched queries into
# plans/r13/<q>_<tag>.txt — and, NEW in r13 (VERDICT item 7), the
# PRE-CHECKPOINT plans that the final explain of a checkpoint-truncated
# pipeline hides behind its LogicalRDD leaf: running with
# SPARK_GRAFT_PLAN_TAP=1 makes the tapped operators (BFS round expansion,
# star-CC round, MSF round selection, LOF knn) print their formatted
# plans between PLANTAP markers, which this script splices into
# plans/r13/<label>_<tag>.txt.
# Usage: tools/r13_plans.sh <tag> <q1,q2,...>
set -e
TAG=${1:?tag}
QS=${2:?queries}
SF=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
OUTDIR=${PLANS_OUT:-plans/r13}
mkdir -p "$OUTDIR"
OUT=$(mktemp)
SPARK_GRAFT_PLAN_TAP=1 sbt -batch "runMain graft.PlanProbe $SF $QS --full" > "$OUT" 2>/dev/null
python3 - "$OUT" "$TAG" "$OUTDIR" <<'EOF'
import sys, re
body = open(sys.argv[1]).read()
tag = sys.argv[2]
outdir = sys.argv[3]
# pre-checkpoint taps
for m in re.finditer(r"^PLANTAP (\S+) BEGIN$(.*?)^PLANTAP \1 END$", body,
                     flags=re.M | re.S):
    label, plan = m.group(1), m.group(2)
    fn = f"{outdir}/{label.replace('.', '_')}_{tag}.txt"
    with open(fn, "w") as f:
        f.write(f"PLANTAP {label} (pre-checkpoint plan)\n{plan.strip()}\n")
    print("wrote", fn)
body = re.sub(r"^PLANTAP (\S+) BEGIN$.*?^PLANTAP \1 END$", "", body,
              flags=re.M | re.S)
# final plans, split on SHAPE lines
parts = re.split(r"^SHAPE (\S+) (.*)$", body, flags=re.M)
it = parts[1:]
for i in range(0, len(it), 3):
    name, shape, plan = it[i], it[i+1], it[i+2]
    with open(f"{outdir}/{name}_{tag}.txt", "w") as f:
        f.write(f"SHAPE {name} {shape}\n{plan.strip()}\n")
    print("wrote", f"{outdir}/{name}_{tag}.txt")
EOF
