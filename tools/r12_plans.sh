#!/bin/bash
# Capture .explain("formatted") for the r12-touched queries into
# plans/r12/<q>_<tag>.txt. Usage: tools/r12_plans.sh <tag> <q1,q2,...>
set -e
TAG=${1:?tag}
QS=${2:?queries}
SF=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
mkdir -p plans/r12
OUT=$(mktemp)
sbt -batch "runMain graft.PlanProbe $SF $QS --full" > "$OUT" 2>/dev/null
python3 - "$OUT" "$TAG" <<'EOF'
import sys, re
body = open(sys.argv[1]).read()
tag = sys.argv[2]
# split on SHAPE lines
parts = re.split(r"^SHAPE (\S+) (.*)$", body, flags=re.M)
# parts: [prefix, name, shapeinfo, plantext, name, shapeinfo, plantext...]
it = parts[1:]
for i in range(0, len(it), 3):
    name, shape, plan = it[i], it[i+1], it[i+2]
    with open(f"plans/r12/{name}_{tag}.txt", "w") as f:
        f.write(f"SHAPE {name} {shape}\n{plan.strip()}\n")
    print("wrote", f"plans/r12/{name}_{tag}.txt")
EOF
