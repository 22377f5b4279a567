"""Training runtime: the fit/validate/test loop.

TPU-native equivalent of the reference's Lightning assembly
(/root/reference/deadtrees/train.py:27-139 + Trainer internals +
configured callbacks, configs/callbacks/default.yaml):

- datamodule / model / loss / optimizer built from the composed config
  (train.py:51-96 instantiations);
- per-epoch loop: compiled data-parallel train steps (steps.py) over the
  device mesh, validation with confusion matrices, metric aggregation;
- MultiStage schedule (callbacks/multistage.py): encoder frozen until
  ``unfreeze_epoch`` (a STATIC step variant — XLA removes the encoder
  backward), fresh lr-reduced Adam at ``lr_reduce_epoch``;
- checkpointing: best-on-``val/dice`` top-1 + last (core/checkpoint.py),
  early stopping patience 200 (same monitor);
- test-after-training reloading the best checkpoint (train.py:119-121);
- per-file sample counters dumped to train/val_stats.csv at teardown
  (segmodel.py:151-155, 409-418);
- observability: CSV metrics logger + optional W&B (logger config), sample
  grids + CM figures saved per val epoch (visualization/), optional
  jax.profiler trace dir, ``detect_anomaly`` finite-loss assertions
  (SURVEY.md §5.1-5.2 rebuild notes);
- returns the optimized metric for sweeps (train.py:116-139).
"""

from __future__ import annotations

import logging
import time
from collections import Counter
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from deadtrees_tpu.core.checkpoint import (
    AsyncCheckpointWriter,
    BestCheckpointKeeper,
    save_checkpoint,
)
from deadtrees_tpu.data.pipeline import DataConfig, DeadtreesDataModule
from deadtrees_tpu.models import create_model, init_model
from deadtrees_tpu.parallel import create_mesh, replicate, shard_batch
from deadtrees_tpu.train.loss import build_loss
from deadtrees_tpu.train.optim import (
    MultiStageConfig,
    OptimizerConfig,
    cosine_annealing_schedule,
    make_optimizer,
)
from deadtrees_tpu.train.steps import (
    TrainState,
    make_eval_step,
    make_predict_step,
    make_train_step,
)

log = logging.getLogger(__name__)


class MetricsLogger:
    """CSV metrics sink (+ optional W&B when importable)."""

    def __init__(self, save_dir: Path, use_wandb: bool = False, wandb_cfg=None):
        # multi-host: only process 0 writes files / talks to W&B (the
        # reference's rank-zero guard, utils/utils.py:19-29)
        self.enabled = jax.process_index() == 0
        self.save_dir = Path(save_dir)
        if self.enabled:
            self.save_dir.mkdir(parents=True, exist_ok=True)
        self.rows: List[Dict[str, Any]] = []
        self.wandb = None
        if use_wandb and self.enabled:
            try:
                import wandb

                self.wandb = wandb
                wandb.init(project=(wandb_cfg or {}).get("project", "deadtrees-tpu"))
            except Exception as e:  # pragma: no cover
                log.warning(f"wandb unavailable ({e}); falling back to CSV only")

    def log(self, metrics: Dict[str, float], step: int) -> None:
        row = {"step": step, **{k: float(v) for k, v in metrics.items()}}
        self.rows.append(row)
        if self.wandb:
            self.wandb.log(metrics, step=step)

    def log_param_histograms(self, params, step: int) -> None:
        """W&B watch-model analogue (reference WatchModelWithWandb,
        wandb_callbacks.py:23-32): per-layer parameter histograms. The
        torch ``wandb.watch`` hooks don't exist for jax, so histograms are
        logged explicitly per validation epoch. No-op without W&B."""
        if not self.wandb:
            return
        hists = {}
        for path, leaf in jax.tree_util.tree_leaves_with_path(params):
            name = jax.tree_util.keystr(path).strip("'[]").replace("']['", "/")
            hists[f"params/{name}"] = self.wandb.Histogram(
                np.asarray(leaf).ravel()
            )
        self.wandb.log(hists, step=step)

    def log_artifact(self, path, kind: str = "checkpoint") -> None:
        """Checkpoint/code artifact upload (reference
        UploadCheckpointsAsArtifact / UploadCodeAsArtifact,
        wandb_callbacks.py:52-98). No-op without W&B (this environment has
        no egress — the CSV/figure files on disk are the offline record)."""
        if not self.wandb:
            return
        art = self.wandb.Artifact(f"run-{kind}", type=kind)
        art.add_file(str(path))
        self.wandb.log_artifact(art)

    def flush(self) -> None:
        if not self.rows or not self.enabled:
            return
        import csv

        keys = sorted({k for r in self.rows for k in r})
        with open(self.save_dir / "metrics.csv", "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=keys)
            w.writeheader()
            w.writerows(self.rows)

    def finish(self) -> None:
        self.flush()
        if self.wandb:
            self.wandb.finish()


def _mean_metrics(batch_metrics: List[Dict[str, Any]], prefix: str) -> Dict[str, float]:
    out: Dict[str, float] = {}
    if not batch_metrics:
        return out
    for k in batch_metrics[0]:
        if k in ("cm", "cm_masked"):
            continue
        vals = [float(m[k]) for m in batch_metrics]
        out[f"{prefix}/{k}"] = float(np.mean(vals))
    return out


class Trainer:
    def __init__(self, config: Dict[str, Any], work_dir: Optional[Path] = None):
        self.cfg = config
        self.work_dir = Path(work_dir or ".")
        self.stats = {"train": Counter(), "val": Counter(), "test": Counter()}
        self._stop_requested = False

    # -- preemption ---------------------------------------------------------
    def request_stop(self) -> None:
        """Ask the fit loop to stop at the next step boundary, write
        last.ckpt, and return normally with ``result['preempted'] = 1.0``.
        Thread-safe; also what the SIGTERM trap calls. The reference has no
        preemption story (docker restart + manual resume only,
        docker-compose.yml:13); on preemptible TPU pods the manager sends
        SIGTERM with a grace window — this turns it into a clean
        checkpoint+resume cycle."""
        self._stop_requested = True

    def _sigterm_trap(self):
        """Context manager installing a SIGTERM handler for the duration of
        fit() (main thread only; no-op elsewhere). Multi-host note: the
        launcher must deliver SIGTERM to EVERY process — a single stopped
        process would leave the others waiting in collectives."""
        import contextlib
        import signal

        @contextlib.contextmanager
        def trap():
            try:
                prev = signal.signal(
                    signal.SIGTERM,
                    lambda *_: (
                        log.warning(
                            "SIGTERM: stopping at the next step boundary "
                            "and checkpointing"
                        ),
                        self.request_stop(),
                    ),
                )
            except ValueError:  # not the main thread
                yield
                return
            try:
                yield
            finally:
                signal.signal(signal.SIGTERM, prev)

        return trap()

    # -- assembly ----------------------------------------------------------
    def _build(self):
        cfg = self.cfg
        tc = cfg.get("trainer", {})
        mc = cfg["model"]["network"]
        tr = cfg["model"]["training"]
        dmc = cfg.get("datamodule", {})

        seed = cfg.get("seed") or 0
        np.random.seed(seed)

        classes = mc.get("classes", 3)
        self.class_names = (
            list(classes) if isinstance(classes, (list, tuple)) else None
        )
        self.num_classes = (
            len(classes) if isinstance(classes, (list, tuple)) else int(classes)
        )
        self.in_channels = int(mc.get("in_channels", 4))

        # datamodule (layout switch mirrors train.py:44-68)
        data_dir = cfg.get("data_dir")
        sub = [Path(data_dir) / s for s in ("train", "val", "test")]
        if all(p.is_dir() for p in sub):
            data_dir = [str(p) for p in sub]
        self.datamodule = DeadtreesDataModule(
            DataConfig(
                data_dir=data_dir,
                pattern=dmc.get("pattern", "*.tar"),
                batch_size=int(dmc.get("batch_size", 32)),
                pattern_extra=dmc.get("pattern_extra"),
                batch_size_extra=dmc.get("batch_size_extra"),
                num_workers=int(dmc.get("num_workers", 2)),
                in_channels=self.in_channels,
                classes=self.num_classes,
                distmap=True,
                seed=seed,
            )
        )
        self.datamodule.setup()

        # model
        dtype = jnp.bfloat16 if tc.get("precision", "bf16") == "bf16" else jnp.float32
        self.model = create_model(
            mc.get("architecture", "efficientunet++"),
            mc.get("encoder_name", "timm-efficientnet-b5"),
            encoder_weights=mc.get("encoder_weights"),
            decoder_channels=tuple(mc.get("decoder_channels", (256, 128, 64, 32, 16))),
            in_channels=self.in_channels,
            classes=self.num_classes,
            dtype=dtype,
        )
        self.hparams = {
            "architecture": mc.get("architecture", "efficientunet++"),
            "encoder_name": mc.get("encoder_name", "timm-efficientnet-b5"),
            "decoder_channels": list(mc.get("decoder_channels", (256, 128, 64, 32, 16))),
            "in_channels": self.in_channels,
            "classes": self.num_classes,
            "encoder_weights": mc.get("encoder_weights"),
        }
        # param shapes are spatial-size independent: init at 64² (cheap
        # compile), train/eval jit at the actual tile size lazily
        variables = init_model(self.model, jax.random.PRNGKey(seed), image_size=64)
        n_params = sum(
            int(np.prod(p.shape))
            for p in jax.tree_util.tree_leaves(variables["params"])
        )
        log.info(f"Model: {self.hparams['architecture']} ({n_params/1e6:.1f}M params)")

        # optimizer. accumulate_grad_batches (the Lightning Trainer knob):
        # k micro-batches average into one optimizer update — effective
        # batch k× the HBM-feasible one; the schedule counts UPDATES, so
        # steps_per_epoch is divided by k.
        self.grad_accum = max(1, int(tc.get("accumulate_grad_batches", 1)))
        self.opt_config = OptimizerConfig(
            learning_rate=float(tr.get("learning_rate", 3e-4)),
            cosineannealing_tmax=int(tr.get("cosineannealing_tmax", 10)),
            gradient_clip_val=float(tc.get("gradient_clip_val", 0.5)),
            steps_per_epoch=max(
                -(-max(self.datamodule.steps_per_epoch, 1) // self.grad_accum),
                1,
            ),
            accumulate_grad_batches=self.grad_accum,
        )
        tx = make_optimizer(self.opt_config)
        self.state = TrainState.create(
            params=variables["params"], batch_stats=variables["batch_stats"], tx=tx
        )

        # mesh + replication
        self.mesh = create_mesh(tc.get("devices"))
        self.state = replicate(self.state, self.mesh)
        log.info(f"Mesh: {self.mesh.devices.size} device(s) on axis 'data'")

        # loss + steps
        self.loss = build_loss(mc.get("losses", ["GDICE", "FOCAL", "BOUNDARY"]),
                               self.num_classes)
        self.train_step = make_train_step(
            self.model,
            self.loss,
            num_classes=self.num_classes,
            remat=bool(tc.get("remat", False)),
            # frozen-BN fine-tuning: BN runs on running stats while all
            # weights (incl. BN affine) train — net-wide analogue of the
            # reference's MultiStage encoder.eval() freeze stage, and a
            # measured throughput mode (PERF.md r3)
            frozen_bn=bool(tc.get("frozen_bn", False)),
        )
        self.eval_step = make_eval_step(self.model, self.loss,
                                        num_classes=self.num_classes)
        # built ONCE: a fresh closure per val epoch would recompile the
        # predict program every epoch (minutes each on the real flagship)
        self.predict_step = make_predict_step(self.model)

        # callbacks config
        cb = cfg.get("callbacks", {})
        ms = cb.get("multistage")
        self.multistage = (
            MultiStageConfig(
                unfreeze_epoch=int(ms.get("unfreeze_epoch", 20)),
                lr_reduce_epoch=ms.get("lr_reduce_epoch"),
                lr_reduce_fraction=ms.get("lr_reduce_fraction"),
            )
            if ms
            else None
        )
        if self.multistage and mc.get("encoder_weights") is None:
            # reference errors out when freezing an untrained encoder
            # (multistage.py:26-30); we log instead of exiting
            log.warning(
                "MultiStage encoder freeze requested without pretrained "
                "encoder weights"
            )
        mck = cb.get("model_checkpoint", {})
        self.keeper = BestCheckpointKeeper(
            self.work_dir / mck.get("dirpath", "checkpoints/"),
            monitor=mck.get("monitor", "val/dice"),
            mode=mck.get("mode", "max"),
        )
        # async checkpointing (default on): the host snapshot happens
        # synchronously (donation safety), the ~1-2 s msgpack encode +
        # file write of the 379 MB flagship state runs on a worker thread.
        # fit()/test() wait() before reading the files back.
        self._ckpt_writer = (
            AsyncCheckpointWriter()
            if mck.get("async_write", True) is not False
            else None
        )
        es = cb.get("early_stopping", {})
        self.es_patience = int(es.get("patience", 200))
        self.es_monitor = es.get("monitor", "val/dice")
        self.es_mode = es.get("mode", "max")

        # W&B-extras knobs (reference wandb_callbacks.py analogues,
        # configs/callbacks/wandb.yaml). `false` disables a feature; a
        # mapping tunes it; absent keys keep the defaults below.
        wm = cb.get("watch_model", {})
        self.watch_params = wm is not False
        # histogram throttle in global steps (wandb.watch(log_freq=...));
        # 0 = every val epoch
        self.watch_log_freq = (
            int(wm.get("log_freq", 0)) if isinstance(wm, dict) else 0
        )
        self._last_hist_step: Optional[int] = None
        uca = cb.get("upload_ckpts_as_artifact", {})
        self.upload_ckpts = uca is not False
        self.upload_best_only = (
            bool(uca.get("upload_best_only", True))
            if isinstance(uca, dict) else True
        )
        self.log_cm_figures = bool(cb.get("log_confusion_matrix", True))
        lip = cb.get("log_image_predictions", {})
        self.log_sample_figures = lip is not False
        self.sample_figure_count = (
            int(lip.get("num_samples", 8)) if isinstance(lip, dict) else 8
        )

        # SWA (reference recipe protocol.md:28 / Lightning
        # stochastic_weight_avg): average params from swa_epoch_start on,
        # recalibrate BN at the end, save swa.ckpt alongside best/last
        swa = cb.get("swa")
        self.swa_start: Optional[int] = (
            int(swa.get("swa_epoch_start", 0)) if swa else None
        )
        self._swa_params = None
        self._swa_count = 0

        lg = cfg.get("logger") or {}
        self.metrics = MetricsLogger(
            self.work_dir / lg.get("save_dir", "logs/metrics"),
            use_wandb=lg.get("kind") == "wandb",
            wandb_cfg=lg,
        )

    # -- loops --------------------------------------------------------------
    def _epoch_step_cap(self, limit_train) -> Optional[int]:
        """Steps this process may take this epoch. Multi-host: every process
        MUST take the same number of jitted steps per epoch or the
        collective-backed step hangs waiting for processes whose local
        stream ran dry (uneven shard assignment / unequal shard sample
        counts). datamodule.steps_per_epoch is the min-over-processes safe
        bound; single-process runs stay unbounded (stream exhaustion ends
        the epoch). The process count comes from the datamodule (which
        resolves an explicit cfg.process_count override before
        jax.process_count()) so simulated multi-host configurations — the
        dryrun's uneven-shard assertion, tests — exercise this exact
        path."""
        cap = None if limit_train is None else int(limit_train)
        pc = getattr(self.datamodule, "process_count", None)
        if pc is None:
            pc = jax.process_count()
        if pc > 1:
            safe = int(self.datamodule.steps_per_epoch)
            cap = safe if cap is None else min(cap, safe)
        return cap

    def _run_val_epoch(self, epoch: int, max_batches: Optional[int]) -> Dict[str, float]:
        batch_metrics, cms, cms_masked = [], [], []
        first_batch = None
        for i, batch in enumerate(self.datamodule.val_batches()):
            if max_batches is not None and i >= max_batches:
                break
            files = batch.pop("files", [])
            self.stats["val"].update(files)
            device_batch = shard_batch(
                {k: v for k, v in batch.items()}, self.mesh
            )
            m = self.eval_step(self.state, device_batch, jnp.int32(epoch))
            if first_batch is None:
                first_batch = batch
            cms.append(np.asarray(m["cm"]))
            if "cm_masked" in m:
                cms_masked.append(np.asarray(m["cm_masked"]))
            batch_metrics.append(m)

        out = _mean_metrics(batch_metrics, "val")
        if cms and self.log_cm_figures:
            cm = np.sum(cms, axis=0)
            cm_masked = np.sum(cms_masked, axis=0) if cms_masked else None
            self._save_cm_figures(cm, cm_masked, epoch)
        if first_batch is not None and self.log_sample_figures:
            self._save_sample_figure(first_batch, epoch)
        return out

    def _save_cm_figures(self, cm, cm_masked, epoch: int) -> None:
        if jax.process_index() != 0:
            return
        try:
            from deadtrees_tpu.visualization import show_cm

            row = cm.sum(axis=1, keepdims=True)
            cm_norm = np.where(row > 0, cm / np.maximum(row, 1), 0.0)
            cmm_norm = None
            if cm_masked is not None:
                rowm = cm_masked.sum(axis=1, keepdims=True)
                cmm_norm = np.where(rowm > 0, cm_masked / np.maximum(rowm, 1), 0.0)
            fig = show_cm(cm_norm, cmm_norm, class_names=self.class_names)
            out = self.work_dir / "figures"
            out.mkdir(parents=True, exist_ok=True)
            fig.savefig(out / f"cm_val_epoch{epoch:03d}.png", dpi=72)
            import matplotlib.pyplot as plt

            plt.close(fig)
        except Exception as e:  # pragma: no cover
            log.debug(f"CM figure skipped: {e}")

    def _save_sample_figure(self, batch, epoch: int) -> None:
        if jax.process_index() != 0:
            return
        try:
            from deadtrees_tpu.visualization import show

            pred, probs = self.predict_step(
                self.state.params, self.state.batch_stats, batch["image"]
            )
            fig = show(
                np.asarray(batch["image"]),
                np.asarray(batch["mask"]),
                np.asarray(probs),
                n_samples=min(batch["image"].shape[0],
                              self.sample_figure_count),
            )
            out = self.work_dir / "figures"
            out.mkdir(parents=True, exist_ok=True)
            fig.savefig(out / f"samples_epoch{epoch:03d}.png", dpi=72)
            import matplotlib.pyplot as plt

            plt.close(fig)
        except Exception as e:  # pragma: no cover
            log.debug(f"sample figure skipped: {e}")

    def resume(self, ckpt_path) -> int:
        """Restore params/batch_stats/opt_state/step from a checkpoint;
        returns the epoch to resume FROM (reference surface:
        trainer.resume_from_checkpoint, configs/trainer/default.yaml:10)."""
        from flax import serialization

        from deadtrees_tpu.core.checkpoint import load_checkpoint

        ckpt = load_checkpoint(ckpt_path)
        opt_state = self.state.opt_state
        if "opt_state" in ckpt:
            opt_state = serialization.from_bytes(opt_state, ckpt["opt_state"])
        self.state = self.state.replace(
            params=ckpt["params"],
            batch_stats=ckpt["batch_stats"],
            opt_state=opt_state,
            step=jnp.asarray(int(ckpt.get("step", 0)), jnp.int32),
        )
        self.state = replicate(self.state, self.mesh)
        start_epoch = int(ckpt.get("epoch", -1)) + 1
        log.info(f"Resumed from {ckpt_path} at epoch {start_epoch}")
        return start_epoch

    def fit(self) -> Dict[str, float]:
        self._build()
        tc = self.cfg.get("trainer", {})
        max_epochs = int(tc.get("max_epochs", 300))
        min_epochs = int(tc.get("min_epochs", 1))
        limit_train = tc.get("limit_train_batches")
        limit_val = tc.get("limit_val_batches")
        detect_anomaly = bool(tc.get("detect_anomaly", False))
        profiler_dir = tc.get("profiler_dir")

        start_epoch = 0
        if tc.get("resume_from_checkpoint"):
            start_epoch = self.resume(tc["resume_from_checkpoint"])

        if profiler_dir:
            jax.profiler.start_trace(str(profiler_dir))

        rng = jax.random.PRNGKey(self.cfg.get("seed") or 0)
        best = None
        since_improve = 0
        last_val: Dict[str, float] = {}
        preempted = False

        import contextlib

        trap = contextlib.ExitStack()
        if tc.get("handle_sigterm", True):
            trap.enter_context(self._sigterm_trap())
        try:
            for epoch in range(start_epoch, max_epochs):
                frozen = bool(
                    self.multistage and epoch < self.multistage.unfreeze_epoch
                )
                if (
                    self.multistage
                    and self.multistage.lr_reduce_epoch is not None
                    and epoch == int(self.multistage.lr_reduce_epoch)
                ):
                    log.info(
                        f"NEW STAGE (epoch {epoch}): fresh Adam at lr/"
                        f"{self.multistage.lr_reduce_fraction}"
                    )
                    tx = make_optimizer(
                        self.opt_config,
                        lr_scale=1.0 / float(self.multistage.lr_reduce_fraction),
                    )
                    self.state = self.state.replace_tx(tx)
                    self.state = replicate(self.state, self.mesh)

                t0 = time.perf_counter()
                rng, erng = jax.random.split(rng)
                n_steps = 0
                train_metrics: List[Dict] = []
                step_cap = self._epoch_step_cap(limit_train)
                for i, batch in enumerate(self.datamodule.train_batches(erng)):
                    if step_cap is not None and i >= int(step_cap):
                        break
                    if self._stop_requested:
                        break
                    files = batch.pop("files", [])
                    self.stats["train"].update(files)
                    batch.pop("lu", None)  # unused in training (segmodel.py:212)
                    device_batch = shard_batch(batch, self.mesh)
                    self.state, m = self.train_step(
                        self.state, device_batch, jnp.int32(epoch), frozen=frozen
                    )
                    if detect_anomaly and not np.isfinite(float(m["total_loss"])):
                        log.warning(f"Non-finite loss at epoch {epoch} step {i}")
                    train_metrics.append(m)
                    n_steps += 1
                dt = time.perf_counter() - t0

                if self._stop_requested:
                    # save the mid-epoch state as last.ckpt with epoch-1 so
                    # resume REPLAYS the interrupted epoch in full
                    log.warning(
                        f"Stop requested: checkpointing mid-epoch {epoch} "
                        f"after {n_steps} step(s) and exiting cleanly"
                    )
                    self._ckpt_saver(epoch - 1)(
                        self.keeper.directory / "last.ckpt"
                    )
                    preempted = True
                    break

                epoch_train = _mean_metrics(train_metrics, "train")
                val = self._run_val_epoch(
                    epoch, int(limit_val) if limit_val is not None else None
                )
                last_val = val
                lr = float(
                    cosine_annealing_schedule(
                        self.opt_config, self.opt_config.learning_rate
                    )(int(self.state.step) // self.grad_accum)
                )
                self.metrics.log(
                    {**epoch_train, **val, "epoch": epoch, "lr": lr,
                     "steps_per_sec": n_steps / max(dt, 1e-9)},
                    step=int(self.state.step),
                )
                log.info(
                    f"epoch {epoch}: train_loss="
                    f"{epoch_train.get('train/total_loss', float('nan')):.4f} "
                    f"val_dice={val.get('val/dice', float('nan')):.4f} "
                    f"({n_steps} steps, {dt:.1f}s)"
                )

                if self.swa_start is not None and epoch >= self.swa_start:
                    self._update_swa()

                step_now = int(self.state.step)
                if self.watch_params and (
                    self._last_hist_step is None
                    or step_now - self._last_hist_step >= self.watch_log_freq
                ):
                    self.metrics.log_param_histograms(
                        self.state.params, step_now
                    )
                    self._last_hist_step = step_now

                monitored = val.get(self.es_monitor, None)
                if monitored is not None:
                    improved = self.keeper.is_improvement(monitored)
                    self.keeper.update(
                        monitored, epoch, self._ckpt_saver(epoch),
                        save_many_fn=self._ckpt_saver_many(epoch),
                        delete_fn=self._ckpt_deleter(),
                    )
                    if improved:
                        since_improve = 0
                        best = monitored
                    else:
                        since_improve += 1
                    if since_improve >= self.es_patience and epoch + 1 >= min_epochs:
                        log.info(f"Early stopping at epoch {epoch}")
                        break
                if self._stop_requested:  # landed between epochs: keeper
                    preempted = True      # already saved last.ckpt
                    break
        finally:
            trap.close()
            if profiler_dir:
                jax.profiler.stop_trace()
            if self._ckpt_writer is not None:
                # all queued checkpoint writes on disk (and their errors
                # surfaced) before anything reads the files back — but a
                # write failure must not MASK an in-flight training error
                import sys as _sys

                if _sys.exc_info()[0] is None:
                    self._ckpt_writer.wait()
                else:
                    try:
                        self._ckpt_writer.wait()
                    except Exception:
                        log.exception("async checkpoint write failed")
            self.teardown()

        result = dict(last_val)
        if preempted:
            result["preempted"] = 1.0
        if best is not None:
            result["best/" + self.es_monitor] = best
        if self.keeper.best_path:
            log.info(f"Best checkpoint path:\n{self.keeper.best_path}")
            result["best_ckpt"] = str(self.keeper.best_path)
            if self.upload_ckpts:
                self.metrics.log_artifact(self.keeper.best_path, "checkpoint")
        if self.upload_ckpts and not self.upload_best_only:
            last = self.keeper.directory / "last.ckpt"
            if last.exists():
                self.metrics.log_artifact(last, "checkpoint-last")
        if self._swa_params is not None:
            swa_path = self._finalize_swa()
            if swa_path:
                result["swa_ckpt"] = str(swa_path)
                if self.upload_ckpts and not self.upload_best_only:
                    self.metrics.log_artifact(swa_path, "checkpoint-swa")
        self.metrics.finish()
        return result

    # -- SWA ----------------------------------------------------------------
    def _update_swa(self) -> None:
        n = self._swa_count
        if self._swa_params is None:
            # deep copy: the train step DONATES state buffers, so references
            # into state.params would be invalidated next epoch
            self._swa_params = jax.tree_util.tree_map(
                jnp.copy, self.state.params
            )
        else:
            self._swa_params = jax.tree_util.tree_map(
                lambda avg, p: avg + (p - avg) / (n + 1),
                self._swa_params,
                self.state.params,
            )
        self._swa_count = n + 1

    def _finalize_swa(self):
        """Recalibrate BN running stats under the averaged params with a
        few train batches, then save swa.ckpt."""
        log.info(f"SWA: averaged {self._swa_count} epochs; recalibrating BN")
        model = self.model
        bn_state = jax.tree_util.tree_map(jnp.zeros_like, self.state.batch_stats)

        @jax.jit
        def bn_pass(params, batch_stats, img):
            _, mut = model.apply(
                {"params": params, "batch_stats": batch_stats},
                img, train=True, mutable=["batch_stats"],
            )
            return mut["batch_stats"]

        batch_stats = self.state.batch_stats
        seen = 0
        for batch in self.datamodule.train_batches(jax.random.PRNGKey(0)):
            batch_stats = bn_pass(self._swa_params, batch_stats, batch["image"])
            seen += 1
            if seen >= 10:
                break
        del bn_state
        path = self.keeper.directory / "swa.ckpt"
        save_checkpoint(
            path,
            params=self._swa_params,
            batch_stats=batch_stats,
            hparams=self.hparams,
            step=int(self.state.step),
            epoch=-1,
        )
        return path

    def _ckpt_saver(self, epoch: int):
        def kwargs():
            return dict(
                params=self.state.params,
                batch_stats=self.state.batch_stats,
                hparams=self.hparams,
                opt_state=self.state.opt_state,  # enables exact resume
                step=int(self.state.step),
                epoch=epoch,
            )

        def save(path):
            if jax.process_index() != 0:
                return
            if self._ckpt_writer is not None:
                self._ckpt_writer.save(path, **kwargs())
            else:
                save_checkpoint(path, **kwargs())

        return save

    def _ckpt_saver_many(self, epoch: int):
        """One snapshot → several paths (keeper last+best coalescing)."""
        single = self._ckpt_saver(epoch)

        def save_many(paths):
            if jax.process_index() != 0:
                return
            if self._ckpt_writer is not None:
                self._ckpt_writer.save_many(
                    paths,
                    params=self.state.params,
                    batch_stats=self.state.batch_stats,
                    hparams=self.hparams,
                    opt_state=self.state.opt_state,
                    step=int(self.state.step),
                    epoch=epoch,
                )
            else:
                for p in paths:
                    single(p)

        return save_many

    def _ckpt_deleter(self):
        """Old-best removal, ordered after its write when saves are async."""

        def delete(path):
            if jax.process_index() != 0:
                return
            if self._ckpt_writer is not None:
                self._ckpt_writer.delete(path)
            elif Path(path).exists():
                Path(path).unlink()

        return delete

    def test(
        self, ckpt_path: Optional[str] = None, tta: Optional[int] = None
    ) -> Dict[str, float]:
        """Test loop, optionally from a checkpoint (train.py:119-121 /
        eval.py:117-119).

        ``tta`` (or config key ``tta``): dihedral test-time-augmentation
        views for the test metrics only — val epochs keep the fast plain
        step. The TTA step is built per call (test runs once; the
        recompile-per-epoch concern of the shared eval_step doesn't apply).
        """
        tta = int(self.cfg.get("tta", 0) or 0) if tta is None else int(tta)
        eval_step = self.eval_step
        if tta:
            eval_step = make_eval_step(
                self.model, self.loss, num_classes=self.num_classes, tta=tta
            )
        if ckpt_path:
            from deadtrees_tpu.core.checkpoint import load_checkpoint

            if self._ckpt_writer is not None:
                self._ckpt_writer.wait()  # the file may still be in flight
            ckpt = load_checkpoint(ckpt_path)
            self.state = self.state.replace(
                params=replicate(ckpt["params"], self.mesh),
                batch_stats=replicate(ckpt["batch_stats"], self.mesh),
            )
        batch_metrics, cms, cms_masked = [], [], []
        for batch in self.datamodule.test_batches():
            files = batch.pop("files", [])
            self.stats["test"].update(files)
            device_batch = shard_batch(batch, self.mesh)
            m = eval_step(self.state, device_batch, jnp.int32(0))
            cms.append(np.asarray(m["cm"]))
            if "cm_masked" in m:
                cms_masked.append(np.asarray(m["cm_masked"]))
            batch_metrics.append(m)
        out = _mean_metrics(batch_metrics, "test")
        if cms:
            cm = np.sum(cms, axis=0)
            log.info(f"CM - DEFAULT - PIXEL:\n{cm}")
            if cms_masked:
                log.info(f"CM - FORESTONLY - PIXEL:\n{np.sum(cms_masked, axis=0)}")
        return out

    def teardown(self) -> None:
        """Dump per-file sample counters (segmodel.py:409-418)."""
        if jax.process_index() != 0:
            return
        import csv

        for split in ("train", "val"):
            with open(self.work_dir / f"{split}_stats.csv", "w", newline="") as f:
                w = csv.writer(f)
                w.writerow(["filename", "count"])
                w.writerows(sorted(self.stats[split].items()))


def train(config: Dict[str, Any], work_dir: Optional[Path] = None) -> Any:
    """Top-level train entry (reference train.py:27-139). Returns the
    optimized metric value when configured (for sweeps), else the result
    dict."""
    trainer = Trainer(config, work_dir=work_dir)
    result = trainer.fit()
    if config.get("test_after_training") and trainer.datamodule.test_shards:
        test_metrics = trainer.test(result.get("best_ckpt"))
        result.update(test_metrics)
        trainer.teardown()
    optimized = config.get("optimized_metric")
    if optimized:
        return result.get(optimized)
    return result
