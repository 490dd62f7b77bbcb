#!/bin/bash
# Resumable per-query oracle sweep: runs check_oracle.py one query at a
# time, appending to $3, skipping queries already recorded there — so a
# crashed or killed sweep resumes instead of redoing the DuckDB work.
# Usage: sweep_oracle.sh <verify_out_dir> <sf_dir> <log>
set -u
out="$1"; sf="$2"; log="$3"
touch "$log"
for d in $(ls "$out" | grep -v oracle_sql.json | sort); do
  if grep -qE "^(PASS|FAIL) $d[ :]" "$log"; then continue; fi
  timeout 1800 python3 "$(dirname "$0")/check_oracle.py" "$out" "$sf" "$d" \
    | grep -vE "^$|passed," >> "$log" 2>&1
  rc=${PIPESTATUS[0]}
  if [ "$rc" = "124" ]; then echo "FAIL $d: TIMEOUT(1800s)" >> "$log"; fi
done
echo "SWEEP COMPLETE" >> "$log"
