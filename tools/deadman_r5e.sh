#!/bin/bash
# Round-5e deadman: at the deadline, stop the quality chain and leave the
# host idle for the driver's end-of-round bench.py (r4's BENCH was rc=124
# because a leftover quality driver starved the 1-core host — never again).
# Kills by explicit pid (conductor pidfile, then the watchdog's tree via
# tools/stop_quality_run.py) — never by name pattern.
DEADLINE="${1:-14:30}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO" || exit 1
while [ "$(date +%H:%M)" \< "$DEADLINE" ]; do sleep 20; done
echo "[deadman $(date +%T)] deadline $DEADLINE reached — stopping chain" >> .r5_conductor.log
if [ -f /tmp/conductor5e.pid ]; then
    kill "$(cat /tmp/conductor5e.pid)" 2>/dev/null && \
        echo "[deadman] conductor killed" >> .r5_conductor.log
fi
/opt/venv/bin/python tools/stop_quality_run.py >> .r5_conductor.log 2>&1
echo "[deadman $(date +%T)] host idle" >> .r5_conductor.log
