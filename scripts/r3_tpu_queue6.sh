#!/usr/bin/env bash
# Follow-on TPU job: wait for r3_tpu_queue5.sh, then measure the no-crop
# blind-docking compile bill across two fresh processes with the
# persistent XLA cache enabled (VERDICT r2 item 10 done-condition:
# second process pays ~0 compile time).
set -u
cd /root/repo

if [ -f /tmp/r3_queue5.pid ]; then
    while kill -0 "$(cat /tmp/r3_queue5.pid)" 2>/dev/null; do sleep 60; done
fi
sleep 200
scripts/tpu_retry.sh /tmp/nocrop_p1.log 3600 python scripts/tpu_nocrop_dock.py
sleep 200
scripts/tpu_retry.sh /tmp/nocrop_p2.log 3600 python scripts/tpu_nocrop_dock.py
echo "[r3_queue6] done" >> /tmp/r3_queue.log
