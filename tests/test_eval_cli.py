"""Eval CLI end-to-end on fixture data: train a checkpoint, evaluate a
directory of golden samples, aggregate results."""
import json
import subprocess
import sys
import types

import numpy as np
import pandas as pd
import pytest

from tests.fixture_data import make_synthetic_dataset
from tests.test_train import _make_config


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    root = tmp_path_factory.mktemp("evaldata")
    make_synthetic_dataset(root, "syn_1m", "train", n_samples=2,
                           duration=0.25)
    make_synthetic_dataset(root, "syn_1m", "val", n_samples=2, seed=1,
                           duration=0.25)
    make_synthetic_dataset(root, "syn_1m", "test", n_samples=3, seed=2,
                           duration=0.3)
    cfg_path = _make_config(tmp_path_factory.mktemp("cfg"),
                            root / "syn_1m" / "train", root / "syn_1m" / "val")
    cfg = json.loads(cfg_path.read_text())
    cfg["epochs"] = 1
    cfg_path.write_text(json.dumps(cfg))
    run_dir = tmp_path_factory.mktemp("run")
    from src.train_pt import train
    train(types.SimpleNamespace(config=str(cfg_path), run_dir=str(run_dir),
                                seed=0, use_nondeterministic_cudnn=False,
                                project_name="t"))
    return root, run_dir


def test_eval_syn_outputs(trained_run, tmp_path):
    root, run_dir = trained_run
    from src.eval_syn import main
    args = types.SimpleNamespace(
        test_dir=str(root / "syn_1m" / "test"), run_dir=str(run_dir),
        output_dir=str(tmp_path / "out"), distance_threshold=1.0, sr=24000,
        save_id=-1, use_cuda=False)
    main(args)
    df = pd.read_csv(tmp_path / "out" / "results.csv")
    assert len(df) == 3
    assert set(df["n_tgt_speakers"]) <= {0, 1, 2}
    # zero-speaker rows have decay; others have sisdri
    for _, row in df.iterrows():
        if row["n_tgt_speakers"] == 0:
            assert np.isfinite(row["decay"])
        else:
            assert np.isfinite(row["sisdri"])
    assert (tmp_path / "out" / "infos.json").exists()
    assert (tmp_path / "out" / "args.json").exists()


def test_print_results_runs(trained_run, tmp_path, capsys):
    root, run_dir = trained_run
    from src.eval_syn import main as eval_main
    from src.print_syn_results import main as print_main
    out = tmp_path / "out2"
    eval_main(types.SimpleNamespace(
        test_dir=str(root / "syn_1m" / "test"), run_dir=str(run_dir),
        output_dir=str(out), distance_threshold=1.0, sr=24000,
        save_id=-1, use_cuda=False))
    print_main(types.SimpleNamespace(results_dir=str(out)))
    captured = capsys.readouterr().out
    assert "SI-SDRi" in captured or "Decay" in captured


def test_eval_unconditioned_threshold(trained_run, tmp_path):
    """eval.py with distance_threshold=-1 must run the model without
    dis_embed — needs an unconditioned model; here we check the error path
    for the conditioned model instead (wrong threshold -> ValueError)."""
    root, run_dir = trained_run
    from sound_bubble_tpu.evaluation import run_testcase
    import sound_bubble_tpu.utils as utils
    model = utils.load_torch_pretrained(str(run_dir)).model
    with pytest.raises(ValueError, match="Invalid distance threshold"):
        run_testcase(model, np.zeros((6, 320), np.float32), None, 0.7)
