#!/bin/bash
# round-5 out-of-core SQL verb battery at 1B rows on the real chip
cd /root/repo
for v in orderby head distinct setops countdistinct join window; do
  echo "=== verb $v $(date -u +%FT%TZ)" >> round5_battery.log
  timeout 2400 python -m tpu_qe bench-bigsql --verb $v --n $((1<<30)) \
    >> round5_measured.jsonl 2>> round5_battery.log
  echo "rc=$? $(date -u +%FT%TZ)" >> round5_battery.log
done
echo "=== battery done $(date -u +%FT%TZ)" >> round5_battery.log
