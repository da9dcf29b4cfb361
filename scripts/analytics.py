#!/usr/bin/env python
"""Devnet analytics (.devnet/analytics.sh equivalent): block-time and
rounds-per-block analysis against a node's REST endpoint.

Usage: python scripts/analytics.py [--endpoint http://127.0.0.1:3030/testnet]
                                   [--start N] [--end N]
"""

import argparse
import json
import statistics
import sys
import urllib.request


def fetch(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--endpoint", default="http://127.0.0.1:3030/testnet")
    ap.add_argument("--start", type=int, default=None)
    ap.add_argument("--end", type=int, default=None)
    args = ap.parse_args()
    base = args.endpoint.rstrip("/")

    latest = fetch(f"{base}/block/height/latest")
    end = args.end if args.end is not None else latest
    start = args.start if args.start is not None else max(0, end - 100)
    if end <= start:
        print("need at least two blocks", file=sys.stderr)
        return 1

    blocks = []
    for lo in range(start, end + 1, 50):
        hi = min(lo + 50, end + 1)
        blocks.extend(fetch(f"{base}/blocks/{lo}/{hi}"))

    times = [b["timestamp"] for b in blocks]
    rounds = [b["round"] for b in blocks]
    ntx = [b.get("num_transmissions", 0) for b in blocks]
    # skip the genesis edge (timestamp 0) and clock-skew outliers
    deltas = [t2 - t1 for t1, t2 in zip(times, times[1:]) if 0 < t2 - t1 < 3600]
    round_deltas = [r2 - r1 for r1, r2 in zip(rounds, rounds[1:])]

    print(f"blocks analysed      : {blocks[0]['height']}..{blocks[-1]['height']}")
    if deltas:
        print(f"avg block time       : {statistics.mean(deltas):.2f}s "
              f"(median {statistics.median(deltas):.2f}s, "
              f"p95 {sorted(deltas)[int(len(deltas) * 0.95)]}s)")
    if round_deltas:
        print(f"rounds per block     : {statistics.mean(round_deltas):.2f} "
              f"(median {statistics.median(round_deltas):.1f})")
    print(f"avg transmissions/blk: {statistics.mean(ntx):.2f}")
    print(f"total transmissions  : {sum(ntx)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
