"""The reference's own experiment configs must work UNMODIFIED: the alias
registry maps their dotted class paths onto this framework. (Reads the
read-only reference mount; skipped when absent.)"""
import os

import numpy as np
import pytest

REF = "/root/reference"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
@pytest.mark.parametrize("config", [
    "syn_experiments/pretrain_stage.json",
    "syn_experiments/finetune_stage.json",
    "real_experiments/raspberrypi_model_pretrain.json",
    "real_experiments/orangpi_model_pretrain.json",
])
def test_reference_config_builds_module(config):
    import sound_bubble_tpu.utils as utils

    path = os.path.join(REF, config)
    if not os.path.exists(path):
        pytest.skip(f"{config} not in reference")
    module = utils.load_net(path)  # builds model, loss, optimizer, scheduler
    n = sum(int(np.prod(p.shape)) for p in
            __import__("jax").tree_util.tree_leaves(module.params))
    assert n > 10_000
    # forward through the inference handle
    cfg = module.net.cfg
    x = np.zeros((1, cfg.num_ch, cfg.stft_chunk_size * 2), np.float32)
    out = module.model({"mixture": x,
                        "dis_embed": np.asarray([[0, 0, 1.0]], np.float32)})
    assert out["output"].shape[-1] == x.shape[-1]


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")
def test_golden_samples_load():
    """The reference's in-repo golden sample dirs load through our dataset
    and eval plumbing."""
    from sound_bubble_tpu.evaluation import load_testcase

    base = os.path.join(REF, "test_samples", "syn_1m")
    if not os.path.isdir(base):
        pytest.skip("no golden samples")
    for name in sorted(os.listdir(base)):
        meta, mixture, gt, tgt, spatial = load_testcase(
            os.path.join(base, name), 24000, 1.0)
        assert mixture.shape[0] == 6
        if len(tgt) == 0:
            assert np.abs(gt).max() == 0
        else:
            assert np.abs(gt).max() > 0
