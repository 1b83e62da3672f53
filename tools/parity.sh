#!/bin/bash
# Multi-scale oracle parity: run graft.Verify + the DuckDB oracle diff at
# three scale factors and write the committed PARITY.md summary.
#
#   tools/parity.sh            # sf0.001 sf0.01 sf0.1
#   tools/parity.sh sf0.001    # subset
#
# Compile first (tools/run.sh does not build): sbt compile.
set -e
cd "$(dirname "$0")/.."
SFS=("${@:-sf0.001}")
if [ $# -eq 0 ]; then SFS=(sf0.001 sf0.01 sf0.1); fi
STAMP=$(date -u +"%Y-%m-%d %H:%M UTC")
OUT=PARITY.md
{
  echo "# Oracle parity — multi-scale"
  echo
  echo "One command: \`tools/parity.sh\` — runs \`graft.Verify\` then"
  echo "\`tools/oracle_check.py\` (DuckDB replay, exact value diff) at each"
  echo "scale factor. Last run: $STAMP, commit $(git rev-parse --short HEAD)."
  echo
} > "$OUT"
FAIL=0
for sf in "${SFS[@]}"; do
  dir=/tmp/parity_$sf
  echo "== $sf ==" >&2
  SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" tools/run.sh graft.Verify \
    "/root/testdata/$sf" "$dir" 2>"/tmp/parity_$sf.err"
  python3 tools/oracle_check.py "/root/testdata/$sf" "$dir" \
    > "/tmp/parity_$sf.check"
  line=$(tail -1 "/tmp/parity_$sf.check")
  grep -v '^PASS' "/tmp/parity_$sf.check" | head -20 >&2
  echo "- **$sf**: $line" >> "$OUT"
  echo "$sf: $line" >&2
  case "$line" in *" 0 fail"*) ;; *) FAIL=1 ;; esac
done
if [ $FAIL -ne 0 ]; then echo "PARITY FAILURES — see above" >&2; exit 1; fi
