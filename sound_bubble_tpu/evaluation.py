"""Shared eval-CLI plumbing (testcase loading + inference) used by
src/eval_syn.py, src/eval.py and src/test_samples.py.

Semantics pinned to the reference CLIs (`/root/reference/src/eval_syn.py`,
`test_samples.py`): GT = sum of mic00 per-voice tracks with distance <=
threshold; one-hot dis_embed 1m->[0,0,1], 1.5m->[0,1,0], 2m->[1,0,0];
dis_threshold == -1 runs the model without distance conditioning (eval.py
non-conditioned path).
"""
from __future__ import annotations

import json
import os

import numpy as np

from sound_bubble_tpu.utils import read_audio_file

ONE_HOT = {1.0: [0.0, 0.0, 1.0], 1.5: [0.0, 1.0, 0.0], 2.0: [1.0, 0.0, 0.0]}


def load_testcase(sample_dir: str, sr: int, distance_threshold: float):
    with open(os.path.join(sample_dir, "metadata.json"), "rb") as f:
        metadata = json.load(f)
    mixture = read_audio_file(os.path.join(sample_dir, "mixture.wav"), sr)

    gt = np.zeros((1, mixture.shape[-1]))
    speakers = [k for k in metadata if k.startswith("voice")]
    dis_near, dis_far, angle_near, angle_far = [], [], [], []
    tgt_speakers = []
    for speaker in speakers:
        d = (metadata[speaker]["dis"] / 100 if metadata["real"]
             else metadata[speaker]["dis"])
        angle = metadata[speaker].get("angle")
        if d <= distance_threshold:
            dis_near.append(d)
            angle_near.append(angle)
            solo = read_audio_file(
                os.path.join(sample_dir, f"mic00_{speaker}.wav"), sr)
            gt += solo
            tgt_speakers.append(metadata[speaker])
        else:
            dis_far.append(d)
            angle_far.append(angle)
    spatial_info = {"angle_near": angle_near, "dis_near": dis_near,
                    "angle_far": angle_far, "dis_far": dis_far}
    return metadata, mixture, gt, tgt_speakers, spatial_info


def run_testcase(model, mixture: np.ndarray, device=None,
                 dis_threshold: float = -1) -> np.ndarray:
    """Offline inference on one multichannel mixture [M, N] -> [n_srcs, N]."""
    mixture = np.asarray(mixture, np.float32)
    inputs = {"mixture": mixture[None]}
    if dis_threshold != -1:
        if float(dis_threshold) not in ONE_HOT:
            raise ValueError("Invalid distance threshold")
        inputs["dis_embed"] = np.asarray([ONE_HOT[float(dis_threshold)]],
                                         np.float32)
    outputs = model(inputs)
    return np.asarray(outputs["output"])[0]
