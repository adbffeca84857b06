"""Radius-weights ablation table (VERDICT r4 #4).

Compares N eval_syn goldens result dirs (e.g. the round-5 equal-step /
equal-seed finetune legs: main RW=1,1.1,1.3 / flat RW=1,1,1 / skew
RW=1,1.3,1.7) into one table that attributes the 1 m <-> 1.5/2 m trade to
the --radius_weights knob:

  python tools/ablation_table.py main=runs/eval_r5m_goldens \
      flat=runs/eval_r5flat_goldens skew=runs/eval_r5skew_goldens

Per leg and radius it prints mean positive-sample SI-SDRi + empty-bubble
decay, then a per-sample breakout (the reference goldens are 3 samples per
radius: 00000 empty, 00001 one-speaker, 00002 two-in-bubble — the diagnosed
failure regime, QUALITY.md round-4 dissection).
"""
import os
import sys

import pandas as pd


def load(root):
    per_radius, per_sample = [], []
    for radius, label in (("syn_1m", "1m"), ("syn_1_5m", "1.5m"),
                          ("syn_2m", "2m")):
        path = os.path.join(root, radius, "results.csv")
        if not os.path.exists(path):
            continue
        df = pd.read_csv(path, index_col=0, dtype={"sample": str})
        neg = df[df.n_tgt_speakers == 0]
        pos = df[df.n_tgt_speakers > 0]
        per_radius.append({"radius": label,
                           "sisdri_dB": pos.sisdri.mean(),
                           "decay_dB": neg.decay.mean()})
        for _, r in df.iterrows():
            per_sample.append({
                "radius": label, "sample": r["sample"],
                "n_in": int(r.n_tgt_speakers),
                "val": r.decay if r.n_tgt_speakers == 0 else r.sisdri})
    return pd.DataFrame(per_radius), pd.DataFrame(per_sample)


def main():
    legs = [a.split("=", 1) for a in sys.argv[1:]]
    agg, samp = None, None
    for name, root in legs:
        a, s = load(root)
        if a.empty:
            print(f"# {name}: no results under {root}")
            continue
        a = a.set_index("radius").add_prefix(f"{name}_")
        s = s.set_index(["radius", "sample", "n_in"]).rename(
            columns={"val": name})
        agg = a if agg is None else agg.join(a)
        samp = s if samp is None else samp.join(s)
    if agg is None:
        sys.exit("no leg had results")
    with pd.option_context("display.float_format", "{:.2f}".format,
                           "display.width", 120):
        print("== per-radius (mean positive-sample SI-SDRi dB / "
              "empty-bubble decay dB)")
        print(agg.to_string())
        print("\n== per-sample (decay dB for n_in=0 rows, SI-SDRi dB "
              "otherwise)")
        print(samp.reset_index().to_string(index=False))


if __name__ == "__main__":
    main()
