"""Config plumbing: dotted-path plugin system, Params, seeding, model loading.

The reference's entire plugin system is `import_attr` resolving dotted class
paths from JSON configs (`/root/reference/src/utils.py:10-12`). We keep that,
plus an alias table so the reference's own config files (naming
`src.models...`, `torch.optim...`, asteroid/auraloss-based losses) work
UNMODIFIED against this framework.
"""
from __future__ import annotations

import importlib
import json
import os
import random

import numpy as np

# reference dotted path -> our implementation
ALIASES = {
    # models
    "src.models.tfgridnet_realtime_clean_dis_embd3.net.Net":
        "sound_bubble_tpu.models.tfgridnet.model.net_from_params",
    "src.models.tfgridnet_realtime_clean_optim.net.Net":
        "sound_bubble_tpu.models.tfgridnet.model.net_optim_from_params",
    "src.models.Waveformer.net.Net":
        "sound_bubble_tpu.models.waveformer.model.Net",
    "src.models.Convtasnet.net.Net":
        "sound_bubble_tpu.models.convtasnet.model.Net",
    "src.models.DCCRN.network.Net":
        "sound_bubble_tpu.models.dccrn.model.Net",
    "src.models.resep_vb.net.Net":
        "sound_bubble_tpu.models.resep.model.Net",
    "src.models.Waveformer.non_causal_dcc_tf.Net":
        "sound_bubble_tpu.models.dcc_tf.model.Net",
    "src.models.DCCRN.non_causal_dcc_tf.Net":
        "sound_bubble_tpu.models.dcc_tf.model.Net",
    # training runtime
    "src.hl_modules.distance_based_hl_module.PLModule":
        "sound_bubble_tpu.train.module.PLModule",
    # losses
    "src.losses.SNRLP.SNRLPLoss": "sound_bubble_tpu.losses.snrlp.SNRLPLoss",
    "src.losses.SNRLosses.SNRLosses": "sound_bubble_tpu.losses.sdr.SNRLosses",
    "src.losses.MultiResoLoss.MultiResoFuseLoss":
        "sound_bubble_tpu.losses.multires_stft.MultiResoFuseLoss",
    "src.losses.LogPowerLoss.LogPowerLoss":
        "sound_bubble_tpu.losses.basic.LogPowerLoss",
    "src.losses.CompositeLoss.CompositeLoss":
        "sound_bubble_tpu.losses.basic.CompositeLoss",
    "src.losses.Perceptual_Loss.PLCPALoss":
        "sound_bubble_tpu.losses.plcpa.PLCPALoss",
    "src.losses.Hubert_Loss.HubertLoss":
        "sound_bubble_tpu.losses.ssl_feature.HubertLoss",
    "src.losses.Hubert_FuseLoss.Hubert_FuseLoss":
        "sound_bubble_tpu.losses.ssl_feature.Hubert_FuseLoss",
    "src.losses.WavLM_Loss.WavLM_Loss":
        "sound_bubble_tpu.losses.ssl_feature.WavLM_Loss",
    "src.losses.WavLM_FuseLoss.WavLM_FuseLoss":
        "sound_bubble_tpu.losses.ssl_feature.WavLM_FuseLoss",
    # optimizers / schedulers (torch names in the reference configs)
    "torch.optim.Adam": "sound_bubble_tpu.train.optim.Adam",
    "torch.optim.AdamW": "sound_bubble_tpu.train.optim.AdamW",
    "torch.optim.lr_scheduler.ReduceLROnPlateau":
        "sound_bubble_tpu.train.optim.ReduceLROnPlateau",
    "torch.optim.lr_scheduler.StepLR": "sound_bubble_tpu.train.optim.StepLR",
    "torch.optim.lr_scheduler.ExponentialLR":
        "sound_bubble_tpu.train.optim.ExponentialLR",
    "torch.optim.lr_scheduler.ConstantLR":
        "sound_bubble_tpu.train.optim.ConstantLR",
    "torch.optim.lr_scheduler.LinearLR":
        "sound_bubble_tpu.train.optim.LinearLR",
    # datasets
    "src.datasets.general_multisrc_dataset_dis_embed.Dataset":
        "sound_bubble_tpu.data.dataset.DistanceEmbedDataset",
    "src.datasets.multisrc_dataset_with_perturbations.Dataset":
        "sound_bubble_tpu.data.dataset.FixedThresholdDataset",
    # perturbations
    "src.datasets.perturbations.SpeedPerturbation.SpeedPerturbation":
        "sound_bubble_tpu.data.perturbations.SpeedPerturbation",
    "src.datasets.perturbations.SampleShiftPerturbation.SampleShiftPerturbation":
        "sound_bubble_tpu.data.perturbations.SampleShiftPerturbation",
    "src.datasets.perturbations.FrequencyMaskingPerturbation.FrequencyMaskingPerturbation":
        "sound_bubble_tpu.data.perturbations.FrequencyMaskingPerturbation",
    "src.datasets.perturbations.ChannelGainPerturbation.ChannelGainPerturbation":
        "sound_bubble_tpu.data.perturbations.ChannelGainPerturbation",
    "src.datasets.perturbations.ChannelDropPerturbation.ChannelDropPerturbation":
        "sound_bubble_tpu.data.perturbations.ChannelDropPerturbation",
    "src.datasets.perturbations.PeakNormPerturbation.PeakNormPerturbation":
        "sound_bubble_tpu.data.perturbations.PeakNormPerturbation",
    "src.datasets.perturbations.WhitePinkBrownPerturbation.WhitePinkBrownPerturbation":
        "sound_bubble_tpu.data.perturbations.WhitePinkBrownPerturbation",
}


def import_attr(import_path: str):
    import_path = ALIASES.get(import_path, import_path)
    module, attr = import_path.rsplit(".", 1)
    return getattr(importlib.import_module(module), attr)


def cast_bf16(tree):
    """Cast every fp32 leaf of a pytree to bfloat16 (mixed-precision forward:
    fp32 master params stay outside; the LSTM carry and LayerNorm stats stay
    fp32 inside — see ops/rnn._cell and models.tfgridnet.LayerNorm)."""
    import jax
    import jax.numpy as jnp

    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, tree)


class Params:
    """JSON config with attribute access (reference `Params`)."""

    def __init__(self, json_path):
        with open(json_path) as f:
            self.__dict__.update(json.load(f))

    def save(self, json_path):
        with open(json_path, "w") as f:
            json.dump(self.__dict__, f, indent=4)

    def update(self, json_path):
        with open(json_path) as f:
            self.__dict__.update(json.load(f))

    @property
    def dict(self):
        return self.__dict__


def read_json(path):
    with open(path, "rb") as f:
        return json.load(f)


def read_audio_file(file_path, sr):
    """Read audio resampled to `sr` (librosa.load semantics: float [C, T])."""
    from sound_bubble_tpu.data.audio_io import read_audio_file as _read
    from sound_bubble_tpu.data.audio_io import read_audio_sr
    from sound_bubble_tpu.data.resample import resample_poly_np

    data = _read(file_path)
    orig = read_audio_sr(file_path)
    if sr is not None and orig != sr:
        data = resample_poly_np(data, sr, orig)
    return data


def write_audio_file(file_path, data, sr, subtype="PCM_16"):
    from sound_bubble_tpu.data.audio_io import write_audio_file as _write

    _write(file_path, data, sr, subtype)


def save_audio_file(file_path, wavform, sample_rate=48000, rescale=True):
    """Reference `save_audio_file_torch`: peak-normalize to 0.9 then write."""
    wavform = np.asarray(wavform)
    if rescale:
        wavform = wavform / np.max(wavform) * 0.9
    write_audio_file(file_path, wavform, sample_rate)


def seed_all(seed: int):
    random.seed(seed)
    np.random.seed(seed)


def ensure_platform():
    """Honor JAX_PLATFORMS even when a platform plugin force-overrides it.

    The axon TPU plugin re-registers itself at import time, so the env var
    alone is ignored; calling this before any jax computation re-pins the
    backend the user asked for. No-op when the env var is unset."""
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        import jax
        jax.config.update("jax_platforms", want)


def load_net(experiment_config, return_params: bool = False):
    """Build the PLModule described by a config (no checkpoint)."""
    params = Params(experiment_config)
    params.pl_module_args["init_ckpt"] = None
    pl_module = import_attr(params.pl_module)(**params.pl_module_args)
    if return_params:
        return pl_module, read_json(experiment_config)
    return pl_module


# In torch these differed by DataParallel wrapping; here there is no wrapper.
load_net_torch = load_net


def load_torch_pretrained(run_dir, return_params: bool = False,
                          map_location=None):
    """Load run_dir/config.json + checkpoints/best.pt (reference
    `load_torch_pretrained`, `src/utils.py:112-135`)."""
    config_path = os.path.join(run_dir, "config.json")
    pl_module, params = load_net(config_path, return_params=True)
    ckpt_path = os.path.join(run_dir, "checkpoints", "best.pt")
    if not os.path.exists(ckpt_path):
        raise FileNotFoundError(
            f"Given run ({run_dir}) doesn't have any pretrained checkpoints!")
    pl_module.load_state(ckpt_path)
    print("Loaded module at epoch", pl_module.epoch)
    if return_params:
        return pl_module, params
    return pl_module


load_pretrained = load_torch_pretrained
