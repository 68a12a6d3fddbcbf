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

# Stall watchdog: a tunnel drop mid-run leaves the client alive but
# sleeping forever (observed: 2% CPU, log silent).  If the job writes
# nothing for STALL_S seconds, kill it so the retry loop recovers from
# the checkpoint instead of burning the whole timeout.  Long XLA
# compiles legitimately go silent for many minutes — keep this above
# the longest observed compile gap (override: TPU_RETRY_STALL_S).
STALL_S=${TPU_RETRY_STALL_S:-1800}

run_with_watchdog() {
    timeout "$T" "$@" >> "$LOG" 2>&1 &
    local pid=$!
    while kill -0 "$pid" 2>/dev/null; do
        sleep 60
        local age=$(( $(date +%s) - $(stat -c %Y "$LOG" 2>/dev/null || date +%s) ))
        if [ "$age" -ge "$STALL_S" ]; then
            echo "[tpu_retry] log silent ${age}s — killing stalled job" >> "$LOG"
            kill "$pid" 2>/dev/null
            sleep 10
            kill -9 "$pid" 2>/dev/null
            wait "$pid" 2>/dev/null
            return 99
        fi
    done
    wait "$pid"
}

for attempt in 1 2 3 4 5; do
    wait_tunnel || exit 2
    echo "[tpu_retry] attempt $attempt: $*" >> "$LOG"
    run_with_watchdog "$@"
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
