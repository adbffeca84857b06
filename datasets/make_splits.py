"""Build corpus split files (vctk_split.json / WHAM_split.json layouts).

The reference ships fixed splits (VCTK 76/11/22 speakers, WHAM
1104/158/316 files train/val/test); this tool regenerates the same-format
files from local corpus directories with the same ratios:

  python datasets/make_splits.py vctk  /path/to/VCTK/wav48 -o datasets/vctk_split.json
  python datasets/make_splits.py wham  /path/to/wham_noise -o datasets/WHAM_split.json
"""
import argparse
import json
import os
import random


def split_items(items, ratios=(0.7, 0.1, 0.2), seed=0):
    random.Random(seed).shuffle(items)
    n = len(items)
    n_train = int(n * ratios[0])
    n_val = int(n * ratios[1])
    return {"train": sorted(items[:n_train]),
            "val": sorted(items[n_train:n_train + n_val]),
            "test": sorted(items[n_train + n_val:])}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("kind", choices=["vctk", "wham"])
    p.add_argument("corpus_dir")
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    if args.kind == "vctk":
        items = [d for d in os.listdir(args.corpus_dir)
                 if os.path.isdir(os.path.join(args.corpus_dir, d))]
    else:
        items = [f for f in os.listdir(args.corpus_dir)
                 if f.endswith(".wav")]
    splits = split_items(items, seed=args.seed)
    with open(args.output, "w") as f:
        json.dump(splits, f, indent=2)
    print({k: len(v) for k, v in splits.items()}, "->", args.output)


if __name__ == "__main__":
    main()
