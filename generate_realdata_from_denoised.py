"""Real-recording training-mixture builder (CLI).

Argument-compatible rebuild of the reference's
`/root/reference/generate_realdata_from_denoised.py`: builds training
mixtures from denoised real recordings organized as
<data_dir>/<split>/<room>/<distance_config>/{speakerNN_omni[_noisy|_noise].wav,
metadata.csv}; picks near/far/noise recordings per room and distance, random
trims, scales the far set with the exact SNR quadratic (denoising-error
aware), writes the standard sample-dir format, and audits the achieved SNR.

The SNR math lives in `sound_bubble_tpu.datagen.mixing` (shared with the
synthetic generator); `snr_at_reference` / `rescale_mixture_to_target_snr`
are re-exported here for reference-API compatibility.
"""
import argparse
import json
import multiprocessing.dummy as mp
import os
import random

import numpy as np
import pandas as pd
import tqdm

import sound_bubble_tpu.utils as utils
from sound_bubble_tpu.data.audio_io import read_audio_file
from sound_bubble_tpu.datagen.mixing import (  # noqa: F401 (reference API)
    REFERENCE_CHANNEL, rescale_mixture_to_target_snr, snr_at_reference,
)

EXCLUDED_DISTANCES = ()


def handle_error(err):
    print("Error happen " + "!" * 30)
    print(err)


def random_trim_voices_omni(noisy_path, denoised_path, start_frame, end_frame,
                            num_samples, args, is_near=False,
                            random_state=None):
    """Random window of both recordings, padded/trimmed to num_samples; far
    sources get a random amplitude scale (reference `:135-188`)."""
    if random_state is None:
        random_state = np.random.RandomState()
    noisy = read_audio_file(noisy_path)
    denoised = read_audio_file(denoised_path)
    frames = min(noisy.shape[-1], denoised.shape[-1])
    if end_frame is None:
        end_frame = max(frames - num_samples, start_frame + 1)
    begin = np.random.randint(start_frame, end_frame)
    mix = noisy[:, begin:begin + num_samples]
    gt = denoised[:, begin:begin + num_samples]

    remain = num_samples - gt.shape[-1]
    if remain > 0:
        pad_front = random_state.randint(0, remain)
        mix = np.pad(mix, ((0, 0), (pad_front, remain - pad_front)))
        gt = np.pad(gt, ((0, 0), (pad_front, remain - pad_front)))
    scale = 1.0
    if not is_near:
        scale = random_state.uniform(args.amplitude_scale_min,
                                     args.amplitude_scale_max)
    return mix * scale, gt * scale


def write_data(room_name, output_dir, distances, angles, heights, speaker_ids,
               mixture, gt, target_snr, snr_clipped, args):
    metadata = {}
    for vidx, d in enumerate(distances):
        angle = 90 - angles[vidx]
        pos = np.array([np.cos(angle), np.sin(angle), 0.0]) * d
        pos[2] = heights[vidx]
        metadata[f"voice{vidx:02d}"] = dict(
            dis=float(d), angle=float(angle), speaker_id=speaker_ids[vidx],
            position=pos.tolist())
    for midx in range(mixture.shape[0]):
        metadata[f"mic{midx:02d}"] = dict(position=[0, 0, 0])
    metadata.update(real=True, room=room_name, input_snr=target_snr,
                    snr_clipped=int(bool(snr_clipped)), n_BG=0)
    os.makedirs(output_dir, exist_ok=True)
    for vidx, audio in enumerate(gt):
        for midx in range(audio.shape[0]):
            if (args.reference_channels_only and midx != REFERENCE_CHANNEL):
                continue
            utils.write_audio_file(
                os.path.join(output_dir, f"mic{midx:02d}_voice{vidx:02d}.wav"),
                audio[midx], args.sr)
    utils.write_audio_file(os.path.join(output_dir, "mixture.wav"), mixture,
                           args.sr)
    with open(os.path.join(output_dir, "metadata.json"), "w") as f:
        json.dump(metadata, f, indent=4)


def create_and_write_mixture(curr_dir, room, room_dir, split,
                             metadata_at_distance, near_distances,
                             far_distances, noise_distances, args):
    rng = random.Random(curr_dir + args.seed)
    np_rng = np.random.RandomState(curr_dir + args.seed)

    near = rng.choices(near_distances,
                       k=rng.randint(args.near_speakers_min,
                                     args.near_speakers_max))
    far = rng.choices(far_distances,
                      k=rng.randint(args.far_speakers_min,
                                    args.far_speakers_max))
    noises = rng.choices(noise_distances,
                         k=rng.randint(args.noise_sources_min,
                                       args.noise_sources_max))
    combo = near + far + noises

    speaker_ids, heights, angles = [], [], []
    near_noisy, far_noisy, near_den, far_den = [], [], [], []
    num_samples = int(round(args.duration * args.sr))
    for idx, d in enumerate(combo):
        is_near = d in near
        is_noise = idx >= len(near) + len(far)
        config_name, meta = metadata_at_distance[d]
        rec = rng.randint(0, meta.shape[0] - 1)
        info = meta.iloc[rec]
        heights.append(float(info["height"]))
        angles.append(float(info["angle"]))
        speaker_ids.append("noise" if is_noise
                           else str(info["speaker_id"]).split("/")[-1])
        suffix = "_noise" if is_noise else ""
        noisy_path = os.path.join(
            room_dir, config_name, f"speaker{rec:02d}_omni{suffix}_noisy.wav")
        den_path = os.path.join(
            room_dir, config_name, f"speaker{rec:02d}_omni{suffix}.wav")
        mix, den = random_trim_voices_omni(noisy_path, den_path, 0, None,
                                           num_samples, args, is_near, np_rng)
        assert np.abs(den).max() > 0, "Denoised audio should not be zero."
        (near_den if is_near else far_den).append(den)
        (near_noisy if is_near else far_noisy).append(mix)

    # one randomly chosen source keeps its noisy (un-denoised) version
    noisy_idx = rng.randint(0, len(near_den) + len(far_den) - 1)
    near_list = [near_noisy[i] if i == noisy_idx else near_den[i].copy()
                 for i in range(len(near_den))]
    far_list = [far_noisy[i] if i + len(near_den) == noisy_idx
                else far_den[i].copy() for i in range(len(far_den))]

    if near_den:
        lo, hi = ((args.train_target_snr_min, args.train_target_snr_max)
                  if split == "train"
                  else (args.test_target_snr_min, args.test_target_snr_max))
        target_snr = np_rng.uniform(lo, hi)
        adjusted, far_list = rescale_mixture_to_target_snr(
            near_list, far_list, near_den, target_snr)
    else:
        target_snr = adjusted = None

    mixture = None
    for a in near_list + far_list:
        mixture = a.copy() if mixture is None else mixture + a
    if np.abs(mixture).max() > 1:
        div = np.abs(mixture).max()
        mixture /= div
        near_den = [a / div for a in near_den]
    if near_den:
        achieved = snr_at_reference(mixture, near_den)
        assert abs(achieved - adjusted) < 1e-3, \
            f"Omni SNR {achieved} is not equal to target SNR {adjusted}"

    out_dir = os.path.join(args.output_dir, split, f"{curr_dir:05d}")
    write_data(room, out_dir, [c for c in combo], angles, heights,
               speaker_ids, mixture, near_den, adjusted,
               adjusted != target_snr, args)
    return 0


def process_dataset(data_dir, split, n_outputs, args):
    rooms = sorted(r for r in os.listdir(data_dir) if not r.startswith("."))
    per_room = np.full(len(rooms), n_outputs // len(rooms), np.uint32)
    per_room[:n_outputs % len(rooms)] += 1
    order = np.arange(n_outputs)
    np.random.shuffle(order)
    it = 0
    for room_idx, room in enumerate(rooms):
        room_dir = os.path.join(data_dir, room)
        configs = [c for c in os.listdir(room_dir) if not c.startswith(".")]
        metadata_at_distance = {}
        for config in configs:
            df = pd.read_csv(os.path.join(room_dir, config, "metadata.csv"))
            dist = df["distance"]
            assert dist.max() == dist.min(), \
                "Expected the distances for all samples to be the same."
            d = int(dist.iloc[0])
            if d not in EXCLUDED_DISTANCES:
                metadata_at_distance[d] = (config, df)
        distances = sorted(metadata_at_distance)
        near = [d for d in distances if d < args.distance_cutoff]
        far = [d for d in distances if d > args.distance_cutoff]
        assert near, ("No speakers inside the given cutoff. It should be in "
                      "centimeters.")
        assert far, ("No speakers outside the given cutoff. It should be in "
                     "centimeters.")

        pbar = tqdm.tqdm(total=int(per_room[room_idx]))
        pool = mp.Pool(max(args.num_workers, 1))
        for _ in range(int(per_room[room_idx])):
            pool.apply_async(
                create_and_write_mixture,
                args=(int(order[it]), room, room_dir, split,
                      metadata_at_distance, near, far, far, args),
                callback=lambda _: pbar.update(),
                error_callback=handle_error)
            it += 1
        pool.close()
        pool.join()
        pbar.close()


def main(args):
    random.seed(args.seed)
    np.random.seed(args.seed)
    for split in ["train", "val", "test"]:
        n_outputs = getattr(args, f"n_outputs_{split}")
        if n_outputs > 0:
            process_dataset(os.path.join(args.data_dir, split), split,
                            n_outputs, args)
    with open(os.path.join(args.output_dir, "args.json"), "w") as f:
        json.dump(args.__dict__, f, indent=4)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("data_dir", type=str,
                        help="Directory with denoised real recordings")
    parser.add_argument("output_dir", type=str)
    parser.add_argument("--wham_noise_start", type=int, default=0)
    parser.add_argument("--distance_cutoff", type=float, default=150,
                        help="Near/far cutoff in centimeters")
    parser.add_argument("--n_outputs_train", type=int, default=0)
    parser.add_argument("--n_outputs_test", type=int, default=0)
    parser.add_argument("--n_outputs_val", type=int, default=0)
    parser.add_argument("--duration", type=float, default=5)
    parser.add_argument("--sr", type=int, default=24000)
    parser.add_argument("--far_speakers_min", type=int, default=1)
    parser.add_argument("--far_speakers_max", type=int, default=2)
    parser.add_argument("--near_speakers_min", type=int, default=0)
    parser.add_argument("--near_speakers_max", type=int, default=2)
    parser.add_argument("--noise_sources_min", type=int, default=0)
    parser.add_argument("--noise_sources_max", type=int, default=1)
    parser.add_argument("--reference_channels_only", action="store_true")
    parser.add_argument("--amplitude_scale_min", type=float, default=0.5)
    parser.add_argument("--amplitude_scale_max", type=float, default=1.0)
    parser.add_argument("--train_target_snr_min", type=float, default=-10)
    parser.add_argument("--train_target_snr_max", type=float, default=5)
    parser.add_argument("--test_target_snr_min", type=float, default=-5)
    parser.add_argument("--test_target_snr_max", type=float, default=5)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--num_workers", type=int, default=1)
    main(parser.parse_args())
