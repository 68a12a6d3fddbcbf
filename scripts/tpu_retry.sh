#!/usr/bin/env bash
# Run a TPU job with hang-retry: the axon tunnel stochastically drops during
# claim/compile leaving the client hung forever. timeout + cooldown + retry.
# usage: tpu_retry.sh LOGFILE TIMEOUT_S CMD...
LOG=$1; T=$2; shift 2
for attempt in 1 2 3; do
    echo "[tpu_retry] attempt $attempt: $*" >> "$LOG"
    timeout "$T" "$@" >> "$LOG" 2>&1
    code=$?
    if [ $code -eq 0 ]; then
        echo "[tpu_retry] success on attempt $attempt" >> "$LOG"
        exit 0
    fi
    echo "[tpu_retry] exit $code; cooling down 200s" >> "$LOG"
    sleep 200
done
echo "[tpu_retry] all attempts failed" >> "$LOG"
exit 1
