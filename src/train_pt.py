"""The main training script for training on synthetic data.

CLI-compatible rebuild of the reference trainer
(`/root/reference/src/train_pt.py`): same arguments (--config --run_dir
--seed --use_nondeterministic_cudnn --project_name), same config schema, same
run-dir layout (config.json copy, checkpoints/last.pt + best.pt, resume from
last.pt), per-epoch train/val with fixed VAL_SEED for validation.
"""
import argparse
import json
import multiprocessing
import os
import shutil
import time

import sound_bubble_tpu.utils as utils
from sound_bubble_tpu.data.loader import DataLoader
from sound_bubble_tpu.train.logging import init_run
from sound_bubble_tpu.train.loop import test_epoch, train_epoch

VAL_SEED = 0
CURRENT_EPOCH = 0


def seed_from_epoch(seed):
    utils.seed_all(seed + CURRENT_EPOCH)


def train(args: argparse.Namespace):
    global CURRENT_EPOCH
    utils.ensure_platform()
    # multi-host bring-up must precede any other backend touch (no-op when
    # SB_COORDINATOR / SB_AUTO_DISTRIBUTED are unset)
    from sound_bubble_tpu.parallel.launch import (
        is_primary, maybe_initialize_distributed, shard_dataset,
    )
    maybe_initialize_distributed()
    utils.seed_all(args.seed)

    with open(args.config, "rb") as f:
        params = json.load(f)

    data_train = shard_dataset(utils.import_attr(params["train_dataset"])(
        **params["train_data_args"], split="train"))
    data_val = shard_dataset(utils.import_attr(params["val_dataset"])(
        **params["val_data_args"], split="val"))

    num_workers = min(multiprocessing.cpu_count(), params["num_workers"])
    train_loader = DataLoader(data_train, batch_size=params["batch_size"],
                              shuffle=True, num_workers=num_workers,
                              worker_init_fn=lambda x: seed_from_epoch(args.seed))
    test_loader = DataLoader(data_val, batch_size=params["eval_batch_size"],
                             num_workers=num_workers,
                             worker_init_fn=lambda x: utils.seed_all(VAL_SEED))

    hl_module = utils.import_attr(params["pl_module"])(
        **params["pl_module_args"])
    if getattr(args, "bf16", False):
        # bf16 trunk with fp32 master params and fp32 waveform/STFT front-end
        # (same mixed-precision recipe as src/train_stream.py --bf16; the
        # fused LSTM scans are already the library default, ops/rnn.py)
        import dataclasses as _dc
        cfg = getattr(hl_module.net, "cfg", None)
        if cfg is not None and hasattr(cfg, "compute_dtype"):
            hl_module.net = type(hl_module.net)(
                _dc.replace(cfg, compute_dtype="bf16"))
            hl_module._build_steps()
            print("bf16 trunk enabled (fp32 master params / front-end)")
        else:
            print("--bf16 ignored: model has no compute_dtype config")

    run_name = os.path.basename(args.run_dir.rstrip("/"))
    checkpoints_dir = os.path.join(args.run_dir, "checkpoints")
    os.makedirs(checkpoints_dir, exist_ok=True)
    if not os.path.exists(os.path.join(args.run_dir, "config.json")):
        shutil.copyfile(args.config, os.path.join(args.run_dir, "config.json"))

    best_path = os.path.join(checkpoints_dir, "best.pt")
    state_path = os.path.join(checkpoints_dir, "last.pt")
    if os.path.exists(state_path):
        hl_module.load_state(state_path)
    start_epoch = hl_module.epoch

    project_name = params.get("project_name", "AcousticBubble")
    wandb_run = (init_run(project_name, run_name, run_dir=args.run_dir,
                          notes="", tags=["speech", "audio", "tpu"])
                 if is_primary() else None)

    try:
        for epoch in range(start_epoch, params["epochs"]):
            CURRENT_EPOCH = epoch
            seed_from_epoch(args.seed)
            hl_module.on_epoch_start()
            print("CURRENT learning rate: {:0.08f}".format(
                hl_module.get_current_lr()))

            print("[TRAINING]")
            t1 = time.time()
            profile_dir = os.environ.get("SB_PROFILE_DIR")
            if profile_dir and epoch == start_epoch:
                # capture a device trace of the first epoch (view with
                # tensorboard / xprof); the reference only had wall-clock
                # timers (SURVEY §5.1)
                import jax
                with jax.profiler.trace(profile_dir):
                    train_loss = train_epoch(hl_module, train_loader, None)
            else:
                train_loss = train_epoch(hl_module, train_loader, None)
            print(f"Train epoch time: {time.time() - t1:02f}s")
            print("\nTrain set: Average Loss: {:.4f}\n".format(train_loss))

            utils.seed_all(VAL_SEED)
            print("[TESTING]")
            test_loss = test_epoch(hl_module, test_loader, None)
            print("\nTest set: Average Loss: {:.4f}\n".format(test_loss))

            # params/opt-state are replicated, so every host holds the same
            # values — only host 0 writes them (shared-FS safe)
            if is_primary():
                hl_module.on_epoch_end(best_path, wandb_run)
                hl_module.dump_state(state_path)
            else:
                hl_module.on_epoch_end(None, None)
            print()
            print("=" * 25, "FINISHED EPOCH", epoch, "=" * 25)
            print()
    except KeyboardInterrupt:
        print("Interrupted")
    except Exception:
        import traceback
        traceback.print_exc()


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str,
                        help="Path to experiment config")
    parser.add_argument("--run_dir", type=str,
                        help="Path to experiment directory")
    parser.add_argument("--seed", type=int, default=0,
                        help="Random seed for reproducibility")
    parser.add_argument("--use_nondeterministic_cudnn", action="store_true",
                        help="Accepted for CLI compatibility (no-op on TPU)")
    parser.add_argument("--project_name", type=str, default="AcousticBubble",
                        help="Project name for experiment tracking")
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 trunk (fp32 master params); extension "
                             "over the reference CLI, off by default")
    train(parser.parse_args())
