"""PLModule — the training runtime (reference "HL module" re-built for JAX).

Public surface mirrors `/root/reference/src/hl_modules/distance_based_hl_module.py`:
training_step/validation_step/on_epoch_start/on_epoch_end/dump_state/
load_state/train/eval/reset_grad/backprop/log_metric/log_statistic/
get_current_lr/get_avg_metric_at_epoch — so the reference's train loop and
eval CLIs port argument-for-argument.

TPU-native internals:
- one jitted, donated train step: forward -> loss -> grad -> clip -> Adam,
  with the batch sharded over the `data` mesh axis and params replicated
  (XLA emits the gradient all-reduce; `use_dp` toggles the mesh like the
  reference's DataParallel flag);
- LR is a runtime scalar (host-owned, scheduler-driven) so plateau schedules
  never trigger recompilation;
- metric math runs device-side in a jitted helper, per-sample bookkeeping
  (speaker-count buckets, decay, input-SNR stats) on host.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

import sound_bubble_tpu.utils as utils
from sound_bubble_tpu.metrics.metrics import Metrics, compute_decay
from sound_bubble_tpu.parallel.mesh import (
    get_mesh, pad_batch, replicated, shard_batch,
)
from sound_bubble_tpu.train.checkpoint import (
    load_checkpoint, save_checkpoint, to_numpy_tree,
)


class PLModule:
    def __init__(self, model, model_params, sr,
                 optimizer, optimizer_params,
                 scheduler=None, scheduler_params=None,
                 loss=None, loss_params=None,
                 metrics=(), init_ckpt=None,
                 grad_clip=None,
                 use_dp=True,
                 val_log_interval=10,  # unused, kept for config compatibility
                 samples_per_speaker_number=3):
        self.net = utils.import_attr(model)(**model_params)
        self.model_path = model
        self.sr = sr
        self.use_dp = use_dp
        self.samples_per_speaker_number = samples_per_speaker_number
        self.metrics = [Metrics(m) for m in metrics]
        self.metric_values = {}
        self.statistics = {}
        self.monitor = "val/loss"
        self.monitor_mode = "min"
        self.mode = None
        self.val_samples = {}
        self.train_samples = {}
        self.snr_metric = Metrics("snr")
        self.loss_fn = utils.import_attr(loss)(**loss_params)
        self._per_sample_cache = {}
        self.grad_clip = grad_clip
        if self.grad_clip is not None:
            print(f"USING GRAD CLIP: {self.grad_clip}")

        # --- parameter init (shapes from the model config) ---
        cfg = getattr(self.net, "cfg", None)
        if cfg is not None:
            n_ch, n_dummy = cfg.num_ch, cfg.stft_chunk_size
        else:  # baseline zoo models carry mic count under various names
            n_ch = next(getattr(self.net, k) for k in
                        ("num_ch", "n_mics", "num_mic", "num_mics")
                        if hasattr(self.net, k))
            n_dummy = 2400
        dummy = {"mixture": jnp.zeros((1, n_ch, n_dummy)),
                 "dis_embed": jnp.zeros((1, 3))}
        key = jax.random.PRNGKey(int(np.random.randint(0, 2 ** 31 - 1)))
        variables = self.net.init(key, dummy)
        self.params = variables["params"]
        # non-param collections (e.g. DCCRN BatchNorm running stats) are
        # carried by the trainer and checkpointed alongside the params
        self.model_state = {k: v for k, v in variables.items()
                            if k != "params"}

        if init_ckpt is not None:
            state = load_checkpoint(init_ckpt)
            weights = state["model"] if "model" in state else state["state_dict"]
            self.params = jax.tree_util.tree_map(jnp.asarray, weights)
            print(f"Warm-started weights from {init_ckpt}")

        self.optim_name = optimizer
        self.opt_params = optimizer_params
        self.optimizer = utils.import_attr(optimizer)(
            self.params, grad_clip=grad_clip, **optimizer_params)

        self.scheduler_name = scheduler
        self.scheduler_params = scheduler_params
        self.scheduler = self.init_scheduler(scheduler, scheduler_params)
        self.epoch = 0

        self.mesh = get_mesh() if use_dp else get_mesh(1)
        self._rep = replicated(self.mesh)
        self.params = jax.device_put(self.params, self._rep)
        if self.model_state:
            self.model_state = jax.device_put(self.model_state, self._rep)
        self.optimizer.state = jax.device_put(self.optimizer.state, self._rep)
        self._build_steps()

    # ----------------------------------------------------------- jit steps --
    def _build_steps(self):
        net, loss_fn, tx = self.net, self.loss_fn, self.optimizer.tx
        uses_bs = getattr(net, "uses_batch_stats", False)

        def _masked_loss(est, target, w):
            per = jnp.atleast_1d(loss_fn(est=est, gt=target))
            if per.shape[0] == est.shape[0]:
                # per-sample loss -> mask-weighted mean (exact under padding)
                return jnp.sum(per * w) / jnp.sum(w)
            return jnp.mean(per)

        def forward_loss(params, mstate, inputs, target, w):
            variables = {"params": params, **mstate}
            if uses_bs:  # train mode: batch stats + running-average update
                out, new_ms = net.apply(variables, inputs, train=True,
                                        mutable=list(mstate))
            else:
                out, new_ms = net.apply(variables, inputs), mstate
            est = out["output"]
            return _masked_loss(est, target, w), (est, new_ms)

        def val_forward(params, mstate, inputs, target, w):
            out = net.apply({"params": params, **mstate}, inputs)
            est = out["output"]
            return _masked_loss(est, target, w), est

        def train_step(params, mstate, opt_state, lr, inputs, target, w):
            (loss, (est, mstate)), grads = jax.value_and_grad(
                forward_loss, has_aux=True)(params, mstate, inputs, target, w)
            updates, opt_state = tx.update(grads, opt_state, params)
            updates = jax.tree_util.tree_map(lambda u: u * lr, updates)
            params = optax.apply_updates(params, updates)
            return params, mstate, opt_state, loss, est

        donate = (0, 2)
        self._train_step = jax.jit(train_step, donate_argnums=donate)
        self._val_step = jax.jit(val_forward)

    def _loss_is_per_sample(self, target_shape) -> bool:
        """True when loss_fn(est, gt) returns a per-sample [B] vector (so the
        trainer may pad-and-mask batches to a mesh multiple)."""
        key = tuple(target_shape)
        cached = self._per_sample_cache.get(key)
        if cached is not None:
            return cached
        try:
            spec = jax.ShapeDtypeStruct(key, jnp.float32)
            s = jax.eval_shape(
                lambda e, g: jnp.atleast_1d(self.loss_fn(est=e, gt=g)),
                spec, spec)
            result = key[0] > 1 and s.shape[0] == key[0]
        except Exception:
            result = False
        self._per_sample_cache[key] = result
        return result

    # ------------------------------------------------------- reference API --
    def load_state(self, path, map_location=None):
        state = load_checkpoint(path)
        self.params = jax.device_put(
            jax.tree_util.tree_map(jnp.asarray, state["model"]), self._rep)
        if "model_state" in state:
            self.model_state = jax.device_put(jax.tree_util.tree_map(
                jnp.asarray, state["model_state"]), self._rep)
        self.optimizer = utils.import_attr(self.optim_name)(
            self.params, grad_clip=self.grad_clip, **self.opt_params)
        if self.scheduler is not None:
            self.scheduler = self.init_scheduler(self.scheduler_name,
                                                 self.scheduler_params)
        self.optimizer.load_state_dict(state["optimizer"])
        self.optimizer.state = jax.device_put(self.optimizer.state, self._rep)
        if self.scheduler is not None and "scheduler" in state:
            self.scheduler.load_state_dict(state["scheduler"])
        self.epoch = state["current_epoch"]
        self.metric_values = state["metric_values"]
        if "statistics" in state:
            self.statistics = state["statistics"]
        self._build_steps()

    def dump_state(self, path):
        state = dict(model=to_numpy_tree(self.params),
                     optimizer=self.optimizer.state_dict(),
                     current_epoch=self.epoch,
                     metric_values=self.metric_values,
                     statistics=self.statistics)
        if self.model_state:
            state["model_state"] = to_numpy_tree(self.model_state)
        if self.scheduler is not None:
            state["scheduler"] = self.scheduler.state_dict()
        save_checkpoint(path, state)

    def get_current_lr(self):
        return self.optimizer.lr

    def on_epoch_start(self):
        print()
        print("=" * 25, "STARTING EPOCH", self.epoch, "=" * 25)
        print()

    def get_avg_metric_at_epoch(self, metric, epoch=None):
        epoch = self.epoch if epoch is None else epoch
        entry = self.metric_values[epoch][metric]
        return entry["epoch"] / entry["num_elements"]

    def on_epoch_end(self, best_path, wandb_run):
        """best_path/wandb_run may be None (non-primary hosts in multi-host
        DP): the scheduler/epoch bookkeeping still runs — it must stay in
        lockstep across hosts — but nothing is written."""
        assert self.epoch + 1 == len(self.metric_values), \
            "Current epoch must be equal to length of metrics (0-indexed)"
        monitor_last = self.get_avg_metric_at_epoch(self.monitor)
        if jax.process_count() > 1:
            # every host monitors a different val shard; compute the EXACT
            # global mean by all-gathering (sum, count) — a mean of per-host
            # means over-weights small shards
            from jax.experimental import multihost_utils
            entry = self.metric_values[self.epoch][self.monitor]
            sums = multihost_utils.process_allgather(
                np.asarray([entry["epoch"], entry["num_elements"]],
                           np.float64))
            monitor_last = float(sums[:, 0].sum() / sums[:, 1].sum())
            # store the GLOBAL average back into this epoch's history so
            # later epochs' best-checkpoint comparisons are global-vs-global
            # (host-local averages differ when val shards differ in
            # difficulty — ADVICE r2 #3)
            entry["epoch"] = monitor_last * entry["num_elements"]

        save = best_path is not None
        for epoch in range(len(self.metric_values) - 1):
            at_epoch = self.get_avg_metric_at_epoch(self.monitor, epoch)
            if self.monitor_mode == "max" and monitor_last < at_epoch:
                save = False
                break
            if self.monitor_mode == "min" and monitor_last > at_epoch:
                save = False
                break
        if save:
            print("Current checkpoint is the best! Saving it...")
            self.dump_state(best_path)

        print(f"Val loss: {self.get_avg_metric_at_epoch('val/loss'):.02f}")
        for name in ("val/snr_i", "val/si_snr_i", "val/si_sdr_i"):
            if name in self.metric_values[self.epoch]:
                print(f"{name}: {self.get_avg_metric_at_epoch(name):.02f}dB")

        if wandb_run is None:
            if self.scheduler is not None:
                from sound_bubble_tpu.train.optim import ReduceLROnPlateau
                if isinstance(self.scheduler, ReduceLROnPlateau):
                    self.scheduler.step(monitor_last)
                else:
                    self.scheduler.step()
            self.epoch += 1
            return

        wandb_run.log({"lr-Adam": self.get_current_lr()}, commit=False,
                      step=self.epoch + 1)
        for metric in self.metric_values[self.epoch]:
            wandb_run.log({metric: self.get_avg_metric_at_epoch(metric)},
                          commit=False, step=self.epoch + 1)
        for statistic in self.statistics:
            if not self.statistics[statistic]["logged"]:
                data = self.statistics[statistic]["data"]
                red = self.statistics[statistic]["reduction"]
                if red == "mean":
                    wandb_run.log({statistic: float(np.mean(data))},
                                  commit=False)
                elif red == "sum":
                    wandb_run.log({statistic: float(np.sum(data))},
                                  commit=False)
                elif red == "histogram":
                    wandb_run.log({statistic + "/mean": float(np.mean(data))},
                                  commit=False)
                else:
                    raise AssertionError(f"Unknown reduction {red}.")
                self.statistics[statistic]["logged"] = True

        self._log_audio_samples(wandb_run)
        wandb_run.log({"epoch": self.epoch}, commit=True, step=self.epoch + 1)

        if self.scheduler is not None:
            from sound_bubble_tpu.train.optim import ReduceLROnPlateau
            if isinstance(self.scheduler, ReduceLROnPlateau):
                self.scheduler.step(monitor_last)
            else:
                self.scheduler.step()
        self.epoch += 1

    def _log_audio_samples(self, wandb_run):
        from sound_bubble_tpu.data.audio_io import write_audio_file
        import os
        base = getattr(wandb_run, "dir", None)
        for split, store in (("train", self.train_samples),
                             ("val", self.val_samples)):
            for spk_num, samples in store.items():
                if base is not None:
                    d = os.path.join(base, "samples",
                                     f"epoch{self.epoch}_{split}_{spk_num}spk")
                    os.makedirs(d, exist_ok=True)
                    for i, s in enumerate(samples):
                        for k in ("mixture", "target", "output"):
                            write_audio_file(
                                os.path.join(d, f"{i}_{k}.wav"),
                                np.asarray(s[k]), self.sr)
            store.clear()

    def log_statistic(self, name, value, reduction="mean"):
        if name not in self.statistics:
            self.statistics[name] = dict(logged=False, data=[],
                                         reduction=reduction)
        self.statistics[name]["data"].append(value)

    def log_metric(self, name, value, batch_size=1, on_step=False,
                   on_epoch=True, prog_bar=True, sync_dist=True):
        epoch = self.epoch
        store = self.metric_values.setdefault(epoch, {})
        entry = store.setdefault(name, dict(step=None, epoch=None))
        value = float(value)
        if on_step:
            if entry["step"] is None:
                entry["step"] = []
            entry["step"].append(value)
        if on_epoch:
            if entry["epoch"] is None:
                entry["epoch"] = 0
                entry["num_elements"] = 0
            entry["epoch"] += value * batch_size
            entry["num_elements"] += batch_size

    # --------------------------------------------------------------- steps --
    def _model_inputs(self, inputs):
        keep = {"mixture", "label"}
        cfg = getattr(self.net, "cfg", None)
        if cfg is not None and cfg.conditional:
            keep.add("dis_embed")
        return {k: v for k, v in inputs.items() if k in keep}

    def _step(self, batch, batch_idx, step="train"):
        inputs, targets = batch
        batch_size = inputs["mixture"].shape[0]
        n_dev = self.mesh.devices.size
        model_inputs = self._model_inputs(inputs)
        target_np = np.asarray(targets["target"])

        # Pad-and-mask to a mesh multiple so partial batches keep full data
        # parallelism (exact for per-sample losses; non-separable scalar
        # losses fall back to shard_batch's replicate-with-warning path).
        weights = np.ones(batch_size, np.float32)
        if (batch_size % n_dev != 0
                and self._loss_is_per_sample(target_np.shape)):
            model_inputs, weights = pad_batch(model_inputs, n_dev)
            target_np, _ = pad_batch(target_np, n_dev)
        dev_inputs = shard_batch(model_inputs, self.mesh)
        target = shard_batch(target_np, self.mesh)
        w = shard_batch(weights, self.mesh)

        if step == "train":
            (self.params, self.model_state, self.optimizer.state, loss,
             est) = self._train_step(
                self.params, self.model_state, self.optimizer.state,
                jnp.asarray(self.optimizer.lr, jnp.float32),
                dev_inputs, target, w)
        else:
            loss, est = self._val_step(self.params, self.model_state,
                                       dev_inputs, target, w)
        if jax.process_count() > 1:
            # metrics are computed host-locally on this process's rows of the
            # global batch (the global est is not fully addressable here)
            shards = sorted(est.addressable_shards,
                            key=lambda s: s.index[0].start or 0)
            est = np.concatenate([np.asarray(s.data) for s in shards])
        est = est[:batch_size]

        mix = np.asarray(inputs["mixture"][:, 0:1])
        gt = np.asarray(targets["target"])
        est_np = np.asarray(est)
        n_speakers = np.asarray(targets["num_target_speakers"])
        n_far = np.asarray(targets["num_interfering_speakers"])
        n_noises = np.asarray(targets.get("num_noises",
                                          np.zeros(batch_size, np.int64)))
        loss_f = float(loss)

        self.log_metric(f"{step}/loss", loss_f, batch_size=batch_size,
                        on_step=(step == "train"), on_epoch=True)

        for metric in self.metrics:
            if step == "train" and metric.name in ("PESQ", "STOI"):
                continue
            vals = np.asarray(metric(est=est_np, gt=gt, mix=mix))
            for i in range(batch_size):
                if n_speakers[i] > 0:
                    assert np.abs(gt[i]).max() > 0, "Expected gt > 0"
                    self.log_metric(f"{step}/{metric.name}", vals[i],
                                    batch_size=1)
                    if metric.name == "si_sdr_i":
                        self.log_metric(
                            f"{step}/{metric.name}_{int(n_speakers[i])}spk",
                            vals[i], batch_size=1)

        decays = np.asarray(compute_decay(est_np, mix))
        for i in range(batch_size):
            if n_speakers[i] == 0:
                self.log_metric(f"{step}/decay", decays[i], batch_size=1)

        key = f"stat/{step}_input_snr"
        if key not in self.statistics or not self.statistics[key]["logged"]:
            in_snr = np.asarray(self.snr_metric(est=mix, gt=gt, mix=mix))
            for i in range(batch_size):
                if n_speakers[i] > 0:
                    self.log_statistic(key, float(in_snr[i]),
                                       reduction="histogram")
                self.log_statistic(f"stat/{step}_num_tgt_speakers",
                                   int(n_speakers[i]), reduction="histogram")
                self.log_statistic(f"stat/{step}_num_far_speakers",
                                   int(n_far[i]), reduction="histogram")
                self.log_statistic(f"stat/{step}_num_noises",
                                   int(n_noises[i]), reduction="histogram")

        sample = {"mixture": mix, "output": est_np, "target": gt,
                  "n_tgt_speakers": n_speakers}
        return loss_f, sample

    def train(self):
        self.mode = "train"

    def eval(self):
        self.mode = "val"

    def _collect_samples(self, sample, store, limit):
        n_speakers = sample["n_tgt_speakers"]
        for i in range(len(n_speakers)):
            spk = int(n_speakers[i])
            bucket = store.setdefault(spk, [])
            if len(bucket) < limit:
                bucket.append({k: sample[k][i] for k in
                               ("mixture", "output", "target")})

    def training_step(self, batch, batch_idx):
        loss, sample = self._step(batch, batch_idx, step="train")
        self._collect_samples(sample, self.train_samples, 3)
        return loss, len(sample["n_tgt_speakers"])

    def validation_step(self, batch, batch_idx):
        loss, sample = self._step(batch, batch_idx, step="val")
        self._collect_samples(sample, self.val_samples,
                              self.samples_per_speaker_number)
        return loss, len(sample["n_tgt_speakers"])

    def reset_grad(self):
        pass  # grads are functional; kept for loop-API parity

    def backprop(self):
        pass  # the jitted train step already applied the update

    def init_scheduler(self, scheduler, scheduler_params):
        if scheduler is None:
            return None
        if scheduler == "sequential":
            from sound_bubble_tpu.train.optim import SequentialLR
            scheds, milestones = [], []
            for spec in scheduler_params:
                scheds.append(utils.import_attr(spec["name"])(
                    self.optimizer, **spec["params"]))
                milestones.append(spec["epochs"])
            for i in range(1, len(milestones)):
                milestones[i] += milestones[i - 1]
            milestones.pop()
            return SequentialLR(self.optimizer, scheds, milestones)
        return utils.import_attr(scheduler)(self.optimizer, **scheduler_params)

    # ---- inference handle (used by eval CLIs / the streaming wrapper) ----
    @functools.cached_property
    def model(self):
        """Callable standing in for the reference's `pl_module.model`:
        `model(inputs, input_state=None, pad=True)` and `init_buffers`."""
        return ModelHandle(self)


class ModelHandle:
    def __init__(self, module: "PLModule"):
        self._module = module
        self._jit = jax.jit(
            lambda p, ms, i, s, pad: module.net.apply(
                {"params": p, **ms}, i, s, pad),
            static_argnames=("pad",))

    @property
    def cfg(self):
        return getattr(self._module.net, "cfg", None)

    def init_buffers(self, batch_size, device=None):
        if self.cfg is not None:
            from sound_bubble_tpu.models.tfgridnet.model import init_state
            return init_state(self.cfg, batch_size)
        if hasattr(self._module.net, "init_buffers"):
            return self._module.net.init_buffers(batch_size)
        return None

    def __call__(self, inputs, input_state=None, pad=True):
        if input_state is None:
            input_state = self.init_buffers(
                np.asarray(inputs["mixture"]).shape[0])
        dev = {k: jnp.asarray(np.asarray(v)) for k, v in
               self._module._model_inputs(inputs).items()}
        return self._jit(self._module.params, self._module.model_state,
                         dev, input_state, pad)

    # torch-API shims (no-ops in jax)
    def to(self, device):
        return self

    def train(self):
        return self

    def eval(self):
        return self
