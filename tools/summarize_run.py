"""Summarize a training run's train.log into a loss-curve table.

Usage: python tools/summarize_run.py exp/flagship_run/train.log [--every 4]
Prints a markdown table of (epoch, iters, valid loss) plus throughput stats.
"""

import argparse
import re
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("log")
    ap.add_argument("--every", type=int, default=4)
    args = ap.parse_args()

    valid_re = re.compile(
        r"(\d+) / \S+ iters, (\d+) / \S+ epochs - valid loss: ([-\d.a-zA-Z]+)")
    thr_re = re.compile(r"current loss: [-\d.a-zA-Z]+ \(([\d.]+) utts/s\)")
    err_re = re.compile(r"test error rate: (\d+) / (\d+) = ([\d.]+)%")

    valids, thrs, errs = [], [], []
    with open(args.log) as f:
        for line in f:
            m = valid_re.search(line)
            if m:
                valids.append((int(m.group(2)), int(m.group(1)),
                               float(m.group(3))))
            m = thr_re.search(line)
            if m:
                thrs.append(float(m.group(1)))
            m = err_re.search(line)
            if m:
                errs.append((int(m.group(1)), int(m.group(2)),
                             float(m.group(3))))

    print("| epoch | optimizer iters | valid loss |")
    print("|---|---|---|")
    for i, (ep, it, vl) in enumerate(valids):
        if i % args.every == 0 or i == len(valids) - 1:
            print(f"| {ep} | {it} | {vl:.2f} |")
    if thrs:
        steady = sorted(thrs)[len(thrs) // 2:]
        print(f"\nmedian-upper-half throughput: "
              f"{sum(steady) / len(steady):.1f} utt/s "
              f"({len(thrs)} report windows)", file=sys.stderr)
    for e, n, pct in errs[-3:]:
        print(f"test error rate: {e}/{n} = {pct:.2f}%", file=sys.stderr)


if __name__ == "__main__":
    main()
