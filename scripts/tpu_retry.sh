#!/usr/bin/env bash
# Run a TPU job with hang-retry: the axon tunnel stochastically drops during
# claim/compile leaving the client hung forever, and occasionally goes down
# entirely for tens of minutes (both tunnel ports refuse connections; a
# client started in that state sleeps in a connect-retry loop forever).
# Pre-flight: wait for the tunnel port before each attempt.
# usage: tpu_retry.sh LOGFILE TIMEOUT_S CMD...
LOG=$1; T=$2; shift 2

tunnel_up() {
    (exec 3<>/dev/tcp/127.0.0.1/8083) 2>/dev/null && { exec 3>&-; return 0; }
    return 1
}

wait_tunnel() {
    local waited=0
    until tunnel_up; do
        if [ "$waited" -eq 0 ]; then
            echo "[tpu_retry] tunnel down; waiting" >> "$LOG"
        fi
        sleep 60
        waited=$((waited + 60))
        if [ "$waited" -ge 14400 ]; then
            echo "[tpu_retry] tunnel still down after ${waited}s" >> "$LOG"
            return 1
        fi
    done
    if [ "$waited" -gt 0 ]; then
        echo "[tpu_retry] tunnel back after ${waited}s; cooling 180s" >> "$LOG"
        sleep 180
    fi
    return 0
}

for attempt in 1 2 3 4 5; do
    wait_tunnel || exit 2
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
