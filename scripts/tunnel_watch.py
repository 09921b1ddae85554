"""Poll the TPU tunnel until it answers, logging each attempt.

The axon tunnel serializes clients and a TPU-side crash can wedge it for
a long time (STATUS.md round-3 notes); this watcher probes in killable
subprocesses (utils/platform.probe_device_alive) on an interval so a
recovery is noticed promptly without any client being held open.

Usage: python scripts/tunnel_watch.py [--interval 300] [--log PATH]
Exits 0 the first time the probe answers.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--interval", type=float, default=300.0)
    ap.add_argument("--timeout", type=float, default=240.0)
    ap.add_argument("--log", default="/tmp/tunnel_watch.jsonl")
    args = ap.parse_args()

    from ramsesgpu_tpu.utils.platform import probe_device_alive

    log = Path(args.log)
    while True:
        t0 = time.time()
        alive, detail = probe_device_alive(timeout_s=args.timeout)
        rec = {"ts": time.time(), "alive": alive, "detail": detail,
               "probe_s": round(time.time() - t0, 1)}
        with log.open("a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)
        if alive:
            return 0
        time.sleep(max(0.0, args.interval - (time.time() - t0)))


if __name__ == "__main__":
    sys.exit(main())
