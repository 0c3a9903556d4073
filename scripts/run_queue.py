"""Serial experiment-queue runner for on-chip measurement rounds.

One real TPU chip => experiments must run strictly serially.  This runner
tails a queue file (``results/r4_queue.txt``) so new experiments can be
APPENDED while it runs, executes each line's command, and appends one JSON
record per experiment to ``results/r4_results.jsonl``.

Queue line format:    <tag> | <shell command>
Blank lines / lines starting with '#' are skipped (but still advance the
cursor, so edit only BELOW the cursor position).

The runner exits when the queue is drained AND ``results/r4_queue.CLOSE``
exists; otherwise it sleeps and polls for appended lines.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULTS = os.path.join(REPO, "results")
QUEUE = os.path.join(RESULTS, "r4_queue.txt")
CURSOR = os.path.join(RESULTS, "r4_cursor")
OUT = os.path.join(RESULTS, "r4_results.jsonl")
LOG = os.path.join(RESULTS, "r4_log.txt")
CLOSE = os.path.join(RESULTS, "r4_queue.CLOSE")
TIMEOUT_S = 3 * 3600  # one experiment should never exceed 3 h


def read_cursor() -> int:
    try:
        with open(CURSOR) as f:
            return int(f.read().strip() or 0)
    except FileNotFoundError:
        return 0


def write_cursor(n: int) -> None:
    with open(CURSOR, "w") as f:
        f.write(str(n))


def log(msg: str) -> None:
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def main() -> int:
    os.makedirs(RESULTS, exist_ok=True)
    while True:
        try:
            with open(QUEUE) as f:
                lines = f.read().splitlines()
        except FileNotFoundError:
            lines = []
        n = read_cursor()
        if n >= len(lines):
            if os.path.exists(CLOSE):
                log("queue drained and CLOSE sentinel present — exiting")
                return 0
            time.sleep(20)
            continue
        line = lines[n].strip()
        write_cursor(n + 1)
        if not line or line.startswith("#"):
            continue
        tag, _, cmd = line.partition("|")
        tag, cmd = tag.strip(), cmd.strip()
        log(f"run #{n + 1} [{tag}]: {cmd}")
        t0 = time.time()
        try:
            proc = subprocess.run(
                cmd, shell=True, cwd=REPO, capture_output=True, text=True,
                timeout=TIMEOUT_S)
            rc = proc.returncode
            stdout, stderr = proc.stdout, proc.stderr
        except subprocess.TimeoutExpired as e:
            rc = -9
            stdout = (e.stdout or b"").decode() if isinstance(
                e.stdout, bytes) else (e.stdout or "")
            stderr = "TIMEOUT"
        wall = time.time() - t0
        with open(LOG, "a") as f:
            f.write(f"--- [{tag}] stderr tail ---\n")
            f.write("\n".join(stderr.splitlines()[-30:]) + "\n")
        parsed = None
        for out_line in reversed(stdout.splitlines()):
            out_line = out_line.strip()
            if out_line.startswith("{"):
                try:
                    parsed = json.loads(out_line)
                except json.JSONDecodeError:
                    pass
                break
        rec = {"tag": tag, "cmd": cmd, "rc": rc,
               "wall_s": round(wall, 1), "result": parsed}
        if parsed is None:
            rec["stdout_tail"] = stdout[-500:]
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        log(f"done #{n + 1} [{tag}] rc={rc} wall={wall:.0f}s "
            f"result={'ok' if parsed else 'NO-JSON'}")


if __name__ == "__main__":
    sys.exit(main())
