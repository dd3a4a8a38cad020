"""Training callbacks, phases and streaming IoU scores.

Python port of the reference callback framework
(``latticenet_py/callbacks/``): the same hook names
(``before_forward_pass`` / ``after_forward_pass`` / ``epoch_started`` /
``epoch_ended`` / ``phase_started`` / ``phase_ended``), the ``Phase`` state
object, and the streaming per-class intersection/union accumulator that the
reference computes on-device per sample (``callbacks/scores.py:22-66``).

Device discipline: ``Scores.accumulate`` takes per-class I/U arrays that the
jitted step already reduced on device; only tiny (nr_classes,) vectors cross
to the host, once per sample — never the full point predictions.
"""

from __future__ import annotations

import csv
import time
from pathlib import Path

import numpy as np


class Callback:
    """Hook surface (reference ``callbacks/callback.py:15-45``)."""

    def before_forward_pass(self, **kw):
        pass

    def after_forward_pass(self, **kw):
        pass

    def epoch_started(self, **kw):
        pass

    def epoch_ended(self, **kw):
        pass

    def phase_started(self, **kw):
        pass

    def phase_ended(self, **kw):
        pass

    def after_backward_pass(self, **kw):
        pass


class CallbacksGroup(Callback):
    """Dispatches every hook to each member (``callbacks/callback.py:48-89``)."""

    def __init__(self, callbacks):
        self.callbacks = list(callbacks)

    def _dispatch(self, name, **kw):
        for cb in self.callbacks:
            getattr(cb, name)(**kw)

    def before_forward_pass(self, **kw):
        self._dispatch("before_forward_pass", **kw)

    def after_forward_pass(self, **kw):
        self._dispatch("after_forward_pass", **kw)

    def epoch_started(self, **kw):
        self._dispatch("epoch_started", **kw)

    def epoch_ended(self, **kw):
        self._dispatch("epoch_ended", **kw)

    def phase_started(self, **kw):
        self._dispatch("phase_started", **kw)

    def phase_ended(self, **kw):
        self._dispatch("phase_ended", **kw)

    def after_backward_pass(self, **kw):
        self._dispatch("after_backward_pass", **kw)


class Phase:
    """Train/test phase state (reference ``callbacks/phase.py:5-23``)."""

    def __init__(self, name: str, loader, grad: bool):
        self.name = name
        self.loader = loader
        self.grad = grad
        self.epoch_nr = 0
        self.samples_processed_this_epoch = 0
        self.iter_nr = 0
        self.scores = Scores()
        self.loss_acum_per_epoch = 0.0


def iou_counts(pred: np.ndarray, target: np.ndarray, nr_classes: int, ignore_index: int = -1):
    """Per-class (intersection, union) for one sample — numpy fallback path."""
    valid = target != ignore_index
    pred, target = pred[valid], target[valid]
    inter = np.zeros(nr_classes, np.int64)
    union = np.zeros(nr_classes, np.int64)
    for c in range(nr_classes):
        p = pred == c
        t = target == c
        inter[c] = np.sum(p & t)
        union[c] = np.sum(p | t)
    return inter, union


def iou_counts_device(logp, target, nr_classes: int, ignore_index: int = -1, point_mask=None):
    """Jit-friendly per-class I/U — call inside the step fn, return tiny vectors."""
    import jax.numpy as jnp

    pred = jnp.argmax(logp, axis=-1)
    valid = target != ignore_index
    if point_mask is not None:
        valid = valid & point_mask
    classes = jnp.arange(nr_classes)
    p = (pred[:, None] == classes) & valid[:, None]
    t = (target[:, None] == classes) & valid[:, None]
    inter = jnp.sum(p & t, axis=0)
    union = jnp.sum(p | t, axis=0)
    return inter, union


class Scores:
    """Streaming mIoU accumulator (reference ``callbacks/scores.py:8-188``)."""

    def __init__(self):
        self.clear()

    def clear(self):
        self.intersection = None
        self.union = None
        self.best_iou = -1.0
        self.best_epoch = -1

    def accumulate(self, inter, union):
        inter = np.asarray(inter, np.int64)
        union = np.asarray(union, np.int64)
        if self.intersection is None:
            self.intersection = np.zeros_like(inter)
            self.union = np.zeros_like(union)
        self.intersection += inter
        self.union += union

    def per_class_iou(self) -> np.ndarray:
        if self.intersection is None:
            return np.zeros(0)
        with np.errstate(divide="ignore", invalid="ignore"):
            return np.where(self.union > 0, self.intersection / np.maximum(self.union, 1), np.nan)

    def avg_class_iou(self, print_per_class: bool = False, class_names=None) -> float:
        iou = self.per_class_iou()
        if print_per_class and iou.size:
            for c, v in enumerate(iou):
                name = class_names[c] if class_names else f"class_{c}"
                print(f"  {name}: iou {v:.4f}")
        return float(np.nanmean(iou)) if iou.size else 0.0

    def update_best(self, epoch: int) -> bool:
        miou = self.avg_class_iou()
        if miou > self.best_iou:
            self.best_iou = miou
            self.best_epoch = epoch
            return True
        return False

    def write_iou_to_csv(self, path):
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["class", "iou"])
            for c, v in enumerate(self.per_class_iou()):
                w.writerow([c, v])
            w.writerow(["mean", self.avg_class_iou()])


class StateCallback(Callback):
    """Loss/IoU accumulation + periodic stdout summary
    (reference ``callbacks/state_callback.py:6-44``)."""

    def __init__(self, nr_classes: int, ignore_index: int = -1):
        self.nr_classes = nr_classes
        self.ignore_index = ignore_index

    def after_forward_pass(self, phase: Phase = None, loss: float = 0.0, inter=None, union=None, **kw):
        phase.loss_acum_per_epoch += float(loss)
        phase.samples_processed_this_epoch += 1
        phase.iter_nr += 1
        if inter is not None:
            phase.scores.accumulate(inter, union)

    def epoch_started(self, phase: Phase = None, **kw):
        phase.loss_acum_per_epoch = 0.0
        phase.samples_processed_this_epoch = 0
        phase.scores.intersection = None
        phase.scores.union = None

    def epoch_ended(self, phase: Phase = None, **kw):
        n = max(phase.samples_processed_this_epoch, 1)
        miou = phase.scores.avg_class_iou()
        print(
            f"[{phase.name}] epoch {phase.epoch_nr}: "
            f"loss {phase.loss_acum_per_epoch / n:.4f}  mIoU {miou:.4f}"
        )
        phase.epoch_nr += 1


class CheckpointCallback(Callback):
    """Full-train-state checkpointing at each test-epoch end, named like the
    reference's ``model_e_{epoch}_{mIoU}.pt`` (``state_callback.py:33-41``) —
    but saving optimizer/step state too, which the reference never did (its
    'resume' could only reload weights; SURVEY.md §5)."""

    def __init__(self, checkpoint_dir, get_state, save_checkpoint: bool = True):
        self.dir = Path(checkpoint_dir)
        self.get_state = get_state
        self.save = save_checkpoint

    def epoch_ended(self, phase: Phase = None, **kw):
        if not self.save or phase.grad:  # save on test phases, like the reference
            return
        from lattice_net_tpu.train.checkpoint import save_checkpoint

        # always refresh a rolling "last" checkpoint so a crash never loses
        # more than one eval interval (the best-only policy of round 1 could
        # lose everything since the last mIoU improvement).
        save_checkpoint(self.dir / "last.ckpt", self.get_state())
        if phase.scores.update_best(phase.epoch_nr):
            miou = phase.scores.best_iou
            path = self.dir / f"model_e_{phase.epoch_nr}_{miou:.4f}.ckpt"
            save_checkpoint(path, self.get_state())
            phase.scores.write_iou_to_csv(self.dir / f"iou_e_{phase.epoch_nr}.csv")


class TensorboardCallback(Callback):
    """Scalar logging (reference ``callbacks/tensorboard_callback.py``); no-op
    if tensorboardX/tensorboard isn't importable."""

    def __init__(self, logdir, experiment_name="lnn"):
        self.writer = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.writer = SummaryWriter(str(Path(logdir) / experiment_name))
        except Exception:
            pass

    def after_forward_pass(self, phase: Phase = None, loss: float = 0.0, lr: float = None, **kw):
        if self.writer and phase.iter_nr % 10 == 0:
            self.writer.add_scalar(f"{phase.name}/loss", float(loss), phase.iter_nr)
            if lr is not None:
                self.writer.add_scalar(f"{phase.name}/lr", float(lr), phase.iter_nr)

    def epoch_ended(self, phase: Phase = None, **kw):
        if self.writer:
            self.writer.add_scalar(
                f"{phase.name}/miou", phase.scores.avg_class_iou(), phase.epoch_nr
            )


class PlyDumpCallback(Callback):
    """Offline stand-in for the reference's live ViewerCallback
    (``callbacks/viewer_callback.py:15-83``): at each test-phase end, dump the
    last sample's prediction and GT-diff clouds as PLY files under
    ``<out_dir>/epoch_<n>/``.  Feed it per-sample data via after_forward_pass
    kwargs ``positions``/``pred``/``target`` (hosts arrays); samples without
    them are skipped."""

    def __init__(
        self,
        out_dir,
        nr_classes: int,
        ignore_index: int = -1,
        every_n_epochs: int = 1,
        html: bool = False,
    ):
        self.out_dir = Path(out_dir)
        self.nr_classes = nr_classes
        self.ignore_index = ignore_index
        self.every = max(1, every_n_epochs)
        self.html = html
        self._last = None

    def after_forward_pass(self, phase=None, positions=None, pred=None, target=None, **kw):
        if positions is not None and pred is not None:
            self._last = (np.asarray(positions), np.asarray(pred), target)

    def epoch_ended(self, phase: Phase = None, **kw):
        if phase.grad or self._last is None or phase.epoch_nr % self.every:
            return
        from lattice_net_tpu.misc import viz

        positions, pred, target = self._last
        d = self.out_dir / f"epoch_{phase.epoch_nr}"
        viz.prediction_cloud(d / "prediction.ply", positions[:, :3], pred, self.nr_classes)
        if target is not None:
            viz.diff_cloud(d / "diff.ply", positions[:, :3], pred, np.asarray(target), self.ignore_index)
        if self.html:
            from lattice_net_tpu.misc.viz_html import write_html_viewer

            colors = viz.class_color_map(self.nr_classes)[np.asarray(pred) % self.nr_classes]
            write_html_viewer(
                d / "prediction.html", positions[:, :3], colors,
                title=f"epoch {phase.epoch_nr} prediction",
            )
        self._last = None


class TimingCallback(Callback):
    """Per-phase wall-clock + samples/sec (replaces the easypbr Profiler hooks)."""

    def __init__(self):
        self.t0 = None

    def phase_started(self, phase: Phase = None, **kw):
        self.t0 = time.perf_counter()

    def phase_ended(self, phase: Phase = None, **kw):
        if self.t0 is None:
            return
        dt = time.perf_counter() - self.t0
        n = max(phase.samples_processed_this_epoch, 1)
        print(f"[{phase.name}] {n} samples in {dt:.1f}s ({n / dt:.2f} samples/s)")
