#!/bin/bash
# Machine-state probe (BASELINE.md scaling protocol): a fixed-total-work
# single-thread loop whose wall time tracks effective-core speed, plus the
# hypervisor steal fraction over a 3 s window from /proc/stat.
#
# Calibration (2026-08-20, trial 12): this loop reads ~2.6-3.1 s on the
# steal-free degraded state where pipeline per-core throughput was the
# round's lowest; estimated good-state band ~1.7 s (the old uncommitted
# loop's ~1.1 s band). steal_pct can read 0.0 on a degraded state — the
# host also caps cycles/bandwidth invisibly — so gate trials on the wall.
set -u
t0=$(date +%s.%N)
python3 - <<'EOF'
s = 0
for i in range(20_000_000):
    s += i ^ (i >> 3)
EOF
t1=$(date +%s.%N)
wall=$(echo "$t1 $t0" | awk '{printf "%.2f", $1-$2}')

read -r _ u1 n1 s1 i1 w1 irq1 sirq1 st1 _ < /proc/stat
sleep 3
read -r _ u2 n2 s2 i2 w2 irq2 sirq2 st2 _ < /proc/stat
tot=$(( (u2-u1)+(n2-n1)+(s2-s1)+(i2-i1)+(w2-w1)+(irq2-irq1)+(sirq2-sirq1)+(st2-st1) ))
steal=$(echo "$st2 $st1 $tot" | awk '{printf "%.1f", 100*($1-$2)/$3}')
echo "probe_wall_s=$wall steal_pct=$steal"
