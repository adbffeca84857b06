"""Summarize eval_syn results dirs into a QUALITY.md-style table.

  python tools/summarize_eval.py runs/eval_r4 [runs/eval_r4_goldens ...]

Each argument is a directory holding syn_1m/ syn_1_5m/ syn_2m/ results.csv
(the `src/eval_syn.py` output layout). Decay averages empty-bubble samples
(n_tgt_speakers == 0); the remaining columns average positive samples —
matching the summary lines eval_syn itself prints (reference
`src/eval_syn.py:232-263` semantics).
"""
import os
import sys

import pandas as pd


def summarize(root):
    rows = []
    for radius in ("syn_1m", "syn_1_5m", "syn_2m"):
        path = os.path.join(root, radius, "results.csv")
        if not os.path.exists(path):
            continue
        df = pd.read_csv(path, index_col=0)
        neg = df[df.n_tgt_speakers == 0]
        pos = df[df.n_tgt_speakers > 0]
        rows.append({
            "radius": radius.replace("syn_", "").replace("_", "."),
            "n": len(df),
            "decay_dB": neg.decay.mean(),
            "snri_dB": pos.snri.mean(),
            "sisdri_dB": pos.sisdri.mean(),
            "pesq_in": pos.pesq_in.mean(),
            "pesq_out": pos.pesq.mean(),
            "stoi_in": pos.stoi_in.mean(),
            "stoi_out": pos.stoi.mean(),
        })
    return pd.DataFrame(rows)


def main():
    for root in sys.argv[1:]:
        print(f"== {root}")
        df = summarize(root)
        if df.empty:
            print("  (no results.csv found)")
            continue
        with pd.option_context("display.float_format", "{:.2f}".format):
            print(df.to_string(index=False))


if __name__ == "__main__":
    main()
