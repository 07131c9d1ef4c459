"""Background KVM-steal logger for scaling-rep provenance.

Appends one line every --interval seconds to BENCH/steal_log_r5.txt in
the format scaling_assemble.py joins on:

    2026-08-18 12:31:21 UTC steal_pct 6.69 busy_pct 9.4

steal_pct is the guest's stolen-time share of total jiffies between
two /proc/stat samples (what the hypervisor withheld — a direct
co-tenant-contention signal); busy_pct is everything non-idle.

Usage:
    nohup python scripts/steal_logger.py --interval 20 \
        >> /tmp/steal_logger.log 2>&1 &
"""

from __future__ import annotations

import argparse
import os
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(REPO, "BENCH", "steal_log_r5.txt")


def _cpu_jiffies() -> tuple[int, int, int]:
    """(total, idle+iowait, steal) from the aggregate cpu line."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:11]]
    # user nice system idle iowait irq softirq steal guest guest_nice
    total = sum(vals[:8])
    idle = vals[3] + vals[4]
    steal = vals[7]
    return total, idle, steal


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--interval", type=float, default=20.0)
    args = ap.parse_args()
    prev = _cpu_jiffies()
    while True:
        time.sleep(args.interval)
        cur = _cpu_jiffies()
        dt_total = cur[0] - prev[0]
        if dt_total <= 0:
            prev = cur
            continue
        steal_pct = 100.0 * (cur[2] - prev[2]) / dt_total
        busy_pct = 100.0 * (dt_total - (cur[1] - prev[1])) / dt_total
        prev = cur
        stamp = time.strftime("%Y-%m-%d %H:%M:%S UTC", time.gmtime())
        with open(LOG, "a") as f:
            f.write(f"{stamp} steal_pct {steal_pct:.2f} "
                    f"busy_pct {busy_pct:.1f}\n")


if __name__ == "__main__":
    main()
