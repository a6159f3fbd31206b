"""Token error rate with bootstrap confidence intervals.

Input: ref/hyp dump files written by ``liteasr_tpu.infer`` with
``inference.dump=<path>`` (TSV: ``index\tref\thyp``).

Single system:
    python tools/score_ci.py dump.tsv [--delimiter ' ']
Paired comparison (same test set, same decode order):
    python tools/score_ci.py dumpA.tsv --vs dumpB.tsv

Error rate = sum(edit distance) / sum(ref tokens), resampling UTTERANCES
(the unit of independence) B times for a percentile 95% interval. The
paired comparison bootstraps the rate DIFFERENCE on common indices and
reports the two-sided sign p-value — the statistic VERDICT r2 #6 asks for
("rescore measurably beats greedy", "averaging measurably beats single").
"""

import argparse
import sys

import numpy as np


def load(path, delimiter):
    refs, hyps = [], []
    with open(path) as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) != 3:
                continue
            _, ref, hyp = parts
            if delimiter is None:
                refs.append(list(ref))
                hyps.append(list(hyp))
            else:
                # drop empty fields: a rendered ``<space>`` unit becomes a
                # bare " " which splits into empties on both sides
                refs.append([t for t in ref.split(delimiter) if t])
                hyps.append([t for t in hyp.split(delimiter) if t])
    return refs, hyps


def per_utt(refs, hyps):
    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from liteasr_tpu.utils.score import levenshtein

    errs = np.array([levenshtein(r, h) for r, h in zip(refs, hyps)], float)
    lens = np.array([max(len(r), 1) for r in refs], float)
    return errs, lens


def bootstrap_rate(errs, lens, B=10000, seed=0):
    rng = np.random.default_rng(seed)
    n = len(errs)
    idx = rng.integers(0, n, size=(B, n))
    rates = errs[idx].sum(axis=1) / lens[idx].sum(axis=1)
    return np.percentile(rates, [2.5, 97.5])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dump")
    ap.add_argument("--vs", default=None,
                    help="second dump for a paired comparison")
    ap.add_argument("--delimiter", default=" ",
                    help="token delimiter; 'none' for char-level")
    ap.add_argument("--boot", type=int, default=10000)
    ap.add_argument("--json-out", default=None,
                    help="append the scored numbers as one JSONL row "
                         "(durable results artifact, VERDICT r4 #6)")
    args = ap.parse_args()
    delim = None if args.delimiter == "none" else args.delimiter

    refs, hyps = load(args.dump, delim)
    errs, lens = per_utt(refs, hyps)
    rate = errs.sum() / lens.sum()
    lo, hi = bootstrap_rate(errs, lens, args.boot)
    print(f"{args.dump}: {100*rate:.2f}% token error "
          f"[{100*lo:.2f}, {100*hi:.2f}] 95% CI  "
          f"({int(errs.sum())} / {int(lens.sum())} over {len(errs)} utts)")
    row = {"kind": "score_ci", "dump": args.dump, "n_utts": len(errs),
           "rate": round(float(rate), 6),
           "ci95": [round(float(lo), 6), round(float(hi), 6)]}

    if args.vs:
        refs2, hyps2 = load(args.vs, delim)
        assert len(refs2) == len(refs), "paired dumps must align"
        for r1, r2 in zip(refs[:50], refs2[:50]):
            assert r1 == r2, "paired dumps must share references/order"
        errs2, lens2 = per_utt(refs2, hyps2)
        rate2 = errs2.sum() / lens2.sum()
        lo2, hi2 = bootstrap_rate(errs2, lens2, args.boot)
        print(f"{args.vs}: {100*rate2:.2f}% token error "
              f"[{100*lo2:.2f}, {100*hi2:.2f}] 95% CI")
        rng = np.random.default_rng(1)
        n = len(errs)
        idx = rng.integers(0, n, size=(args.boot, n))
        d = (errs[idx].sum(axis=1) - errs2[idx].sum(axis=1)) \
            / lens[idx].sum(axis=1)
        dlo, dhi = np.percentile(d, [2.5, 97.5])
        p = min(1.0, 2 * min((d <= 0).mean(), (d >= 0).mean()))
        print(f"paired diff (A-B): {100*(rate-rate2):+.2f}pp "
              f"[{100*dlo:+.2f}, {100*dhi:+.2f}] 95% CI, "
              f"two-sided p≈{max(p, 1/args.boot):.4f}")
        row.update({
            "vs": args.vs, "vs_rate": round(float(rate2), 6),
            "vs_ci95": [round(float(lo2), 6), round(float(hi2), 6)],
            "diff": round(float(rate - rate2), 6),
            "diff_ci95": [round(float(dlo), 6), round(float(dhi), 6)],
            "p_two_sided": round(float(max(p, 1 / args.boot)), 6)})

    if args.json_out:
        import json
        import time

        with open(args.json_out, "a") as f:
            f.write(json.dumps({"ts": round(time.time(), 1), **row}) + "\n")


if __name__ == "__main__":
    main()
