"""Epoch loops (reference `/root/reference/src/training/tain_val.py` surface).

`device` is accepted for API parity; device placement is handled inside the
PLModule's jitted steps (batch sharded over the mesh).
"""
from __future__ import annotations

import tqdm


def to_device(batch, device=None):
    return batch  # placement happens in PLModule._step


def train_epoch(hl_module, train_loader, device=None) -> float:
    hl_module.train()
    total, n = 0.0, 0
    pbar = tqdm.tqdm(total=len(train_loader))
    for batch_idx, batch in enumerate(train_loader):
        hl_module.reset_grad()
        loss, b = hl_module.training_step(batch, batch_idx)
        hl_module.backprop()
        total += loss * b
        n += b
        pbar.set_postfix(loss="%.05f" % loss)
        pbar.update()
    pbar.close()
    return total / max(n, 1)


def test_epoch(hl_module, test_loader, device=None) -> float:
    hl_module.eval()
    total, n = 0.0, 0
    pbar = tqdm.tqdm(total=len(test_loader))
    for batch_idx, batch in enumerate(test_loader):
        loss, b = hl_module.validation_step(batch, batch_idx)
        total += loss * b
        n += b
        pbar.set_postfix(loss="%.05f" % loss)
        pbar.update()
    pbar.close()
    return total / max(n, 1)
