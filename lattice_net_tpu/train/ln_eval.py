"""Evaluation CLI: ``python -m lattice_net_tpu.train.ln_eval <config.cfg>``.

Rebuild of ``latticenet_py/ln_eval.py``: restores a checkpoint, runs the test
split, accumulates per-class IoU, and optionally writes benchmark-server
submissions (SemanticKITTI ``.label`` binaries / ScanNet txt predictions).

Every point of every cloud is predicted: clouds larger than the static point
budget are processed in padded chunks and the predictions stitched back, so
submission files carry exactly one label per input point — the behaviour of
the reference's dynamic-shape eval (``ln_eval.py:168-193``), reproduced under
XLA's static shapes.  Outputs are named by each scan's stable identity
(sequence/scan id), not its enumeration order.
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

import numpy as np


def predict_cloud_chunked(predict_fn, prepared, n_points: int, model_params) -> np.ndarray:
    """Predict labels for ALL N points using fixed-size padded forwards.

    ``predict_fn(batch) -> (n_points,) int32`` is the jitted single-chunk
    forward; clouds beyond ``n_points`` are split into consecutive chunks,
    each with its own lattice hierarchy (receptive field is local to the
    chunk — the closest static-shape analogue of the reference's full-cloud
    dynamic forward).
    """
    from lattice_net_tpu.parallel import make_batch

    positions, values, target = prepared
    n = positions.shape[0]
    preds = np.empty(n, np.int32)
    for start in range(0, n, n_points):
        stop = min(start + n_points, n)
        chunk = (positions[start:stop], values[start:stop], target[start:stop])
        batch = make_batch([chunk], model_params, n_points)
        p = np.asarray(predict_fn(batch))
        preds[start:stop] = p[: stop - start]
    return preds


def unstripe_predictions(lab_s, ids_s, n: int) -> np.ndarray:
    """Scatter per-stripe predictions back to original point order.

    ``lab_s`` (n_shards, per) predictions, ``ids_s`` (n_shards, per) original
    point indices from ``shard_points_host`` (-1 = padding).  Every real
    point appears exactly once across stripes."""
    lab = np.asarray(lab_s).reshape(-1)
    ids = np.asarray(ids_s).reshape(-1)
    preds = np.empty(n, np.int32)
    preds[ids[ids >= 0]] = lab[ids >= 0]
    return preds


class EvalSetup:
    """Everything the eval-side tools share: restored params + a jitted
    single-chunk argmax predictor over the config's model/lattice knobs.
    Built once by :func:`setup_predictor`; used by ``ln_eval`` and
    ``misc/lnn_make_teaser`` (previously duplicated in both)."""

    def __init__(self, **kw):
        self.__dict__.update(kw)


def setup_predictor(
    config_path: str,
    checkpoint: str = "",
    overrides=(),
    n_points: int = 0,
    sp: int = 0,
    sp_approx: bool = False,
):
    import jax

    from lattice_net_tpu.config import (
        EvalParams,
        LatticeParams,
        apply_overrides,
        load_config,
        model_params_from_config,
    )
    from lattice_net_tpu.lattice.structure import build_hierarchy, default_capacity_schedule
    from lattice_net_tpu.models import LNN, prepare_cloud
    from lattice_net_tpu.parallel import make_batch
    from lattice_net_tpu.train.ln_train import create_loader

    cfg = apply_overrides(load_config(config_path), overrides)
    ep = EvalParams.from_config(cfg)
    lp = LatticeParams.from_config(cfg)
    checkpoint = checkpoint or ep.checkpoint_path

    loader = create_loader(ep.dataset_name, cfg, "test")
    nr_classes = loader.nr_classes
    ignore_index = getattr(loader, "ignore_index", -1)
    mp = model_params_from_config(cfg, nr_classes)
    sigma = lp.sigmas[0] if len(set(lp.sigmas)) == 1 else np.asarray(lp.sigmas)
    caps = default_capacity_schedule(lp.hash_table_capacity, mp.nr_downsamples)

    first = loader.get_cloud(0)
    n_points = n_points or 1 << int(np.ceil(np.log2(max(len(first.V), 512))))
    model = LNN(mp)

    b0 = make_batch([prepare_cloud(first, mp)], mp, n_points)
    # one-off setup build+init on the host CPU — in a pure-CPU SUBPROCESS
    # when this process holds an accelerator: initializing the in-process
    # XLA:CPU backend leaves the axon session unable to re-dispatch the
    # predict program (INVALID_ARGUMENT on an early re-dispatch; same
    # failure class as the round-4 trainer crashes, see
    # train/setup_worker.py forensics — the round-4 stream runs predate
    # the runtime getting stricter).
    from lattice_net_tpu.train.ln_train import _run_setup_worker
    from lattice_net_tpu.train.setup_worker import build_and_init

    if jax.default_backend() != "cpu" and os.environ.get("LNT_SETUP_SUBPROC", "1") == "1":
        res = _run_setup_worker({
            "mp": mp, "sigma": sigma, "caps": caps,
            "pos": np.asarray(b0["positions"][0]),
            "mask": np.asarray(b0["point_mask"][0]),
            "values": np.asarray(b0["values"][0]),
        })
        params = res["params"]
    else:
        params, _ = build_and_init(
            mp, sigma, caps, np.asarray(b0["positions"][0]),
            np.asarray(b0["point_mask"][0]), np.asarray(b0["values"][0]),
        )
    if checkpoint:
        from lattice_net_tpu.train.checkpoint import load_params

        params = load_params(checkpoint, params)
        print(f"restored checkpoint {checkpoint}")

    def _predict_impl(params, batch):
        h = build_hierarchy(
            batch["positions"][0], sigma, mp.nr_downsamples, caps,
            point_mask=batch["point_mask"][0],
            point_feats=batch["values"][0],
        )
        logp, _ = model.apply(params, h, batch["positions"][0], batch["values"][0])
        return jax.numpy.argmax(logp, axis=-1)

    _predict = jax.jit(_predict_impl)

    sharded_predict = None
    if sp > 0:
        # EXACT full-receptive-field prediction for clouds striped over sp
        # devices — unlike the chunked fallback, ghost-point halos preserve
        # cross-boundary context, so results equal a single-device
        # full-cloud forward (tests/test_lattice_sharded.py)
        import jax.numpy as jnp
        from jax.sharding import Mesh

        from lattice_net_tpu.parallel.lattice_sharded import (
            make_sharded_lnn_forward,
            shard_points_host,
        )

        devices = jax.devices()
        if len(devices) < sp:
            raise ValueError(f"--sp {sp} needs {sp} devices, have {len(devices)}")
        mesh = Mesh(np.asarray(devices[:sp]), ("sp",))
        per = -(-n_points // sp)
        sfwd = make_sharded_lnn_forward(
            mesh, model, sigma, mp.nr_downsamples, caps, halo_budget=per,
            check_band=not sp_approx,
        )

        def sharded_predict(prepared):
            positions, values, _ = prepared
            if positions.shape[0] > per * sp:
                return None  # over budget: caller falls back to chunked
            pos_s, val_s, mask_s, ids_s, bounds = shard_points_host(
                positions, values, sigma, sp, per=per
            )
            logp_s, _, ov_s = sfwd(params, pos_s, val_s, mask_s, bounds)
            ov = int(np.asarray(ov_s).sum())
            if ov:
                print(f"WARNING: sharded forward overflowed {ov} (table/halo) — "
                      "predictions near stripe boundaries may be degraded")
            return unstripe_predictions(
                jnp.argmax(logp_s, -1), ids_s, positions.shape[0]
            )

    return EvalSetup(
        cfg=cfg, ep=ep, loader=loader, nr_classes=nr_classes,
        ignore_index=ignore_index, mp=mp, sigma=sigma, caps=caps,
        n_points=n_points, model=model, params=params,
        predict_fn=lambda batch: _predict(params, batch),
        # un-jitted variant for composition INSIDE another jitted program:
        # a nested pjit call lowers to a nested computation, and programs
        # with that structure stopped re-dispatching on the current axon
        # runtime (stream harness bisect, round 5)
        predict_impl=lambda batch: _predict_impl(params, batch),
        predict_impl_p=_predict_impl,  # (params, batch) — params as an arg
        sharded_predict=sharded_predict,
    )


def run(
    config_path: str,
    checkpoint: str = "",
    write_predictions: bool | None = None,
    overrides=(),
    n_points: int = 0,
    sp: int = 0,
    sp_approx: bool = False,
):
    from lattice_net_tpu.models import prepare_cloud
    from lattice_net_tpu.train.callbacks import Scores, iou_counts

    s = setup_predictor(config_path, checkpoint, overrides, n_points, sp, sp_approx)
    ep, loader, mp, sigma = s.ep, s.loader, s.mp, s.sigma
    nr_classes, ignore_index, n_points, predict_fn = (
        s.nr_classes, s.ignore_index, s.n_points, s.predict_fn,
    )
    do_write = ep.do_write_predictions if write_predictions is None else write_predictions

    scores = Scores()
    out_dir = Path(ep.output_predictions_path or "predictions")

    from lattice_net_tpu.lattice.ops import check_positions

    for i, cloud in enumerate(loader):
        prepared = prepare_cloud(cloud, mp)
        check_positions(prepared[0], prepared[1], sigma=sigma)
        pred = s.sharded_predict(prepared) if s.sharded_predict else None
        if pred is None:
            pred = predict_cloud_chunked(predict_fn, prepared, n_points, mp)
        target = prepared[2]
        assert pred.shape[0] == len(cloud.V), "one prediction per input point"
        inter, union = iou_counts(pred, target, nr_classes, ignore_index)
        scores.accumulate(inter, union)

        if do_write:
            name = cloud.name or f"{i:06d}"
            if ep.dataset_name == "semantickitti":
                from lattice_net_tpu.data.semantic_kitti import write_kitti_label_file

                # name is "<sequence>/<scan>"; server layout:
                # sequences/<seq>/predictions/<scan>.label
                seq, _, scan = name.partition("/")
                rel = (
                    Path("sequences") / seq / "predictions" / f"{scan}.label"
                    if scan
                    else Path(f"{name}.label")
                )
                write_kitti_label_file(out_dir / rel, pred)
            elif ep.dataset_name == "scannet":
                from lattice_net_tpu.data.scannet import write_scannet_prediction

                write_scannet_prediction(out_dir / f"{name}.txt", pred)
            else:
                out_dir.mkdir(parents=True, exist_ok=True)
                np.savetxt(out_dir / f"pred_{name}.txt", pred, fmt="%d")

    names = getattr(loader, "label_names", lambda: None)()
    miou = scores.avg_class_iou(print_per_class=True, class_names=names)
    print(f"mIoU: {miou:.4f}")
    return miou


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config")
    ap.add_argument("--checkpoint", default="")
    ap.add_argument("--write-predictions", action="store_true", default=None)
    ap.add_argument(
        "--n-points",
        type=int,
        default=0,
        help="static per-chunk point budget (0 = fit the first cloud whole); "
        "smaller values force chunked prediction — used to quantify the "
        "chunked-vs-full receptive-field gap",
    )
    ap.add_argument(
        "--sp", type=int, default=0,
        help="stripe each cloud over N devices for EXACT full-receptive-field "
        "prediction (ghost-point halos) instead of lossy chunking",
    )
    ap.add_argument(
        "--sp-approx", action="store_true",
        help="allow stripes narrower than the receptive band",
    )
    ap.add_argument(
        "overrides",
        nargs="*",
        help="config overrides of the form section.key=value (e.g. eval.checkpoint_path=...)",
    )
    args = ap.parse_args()
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"),
    )
    run(
        args.config, args.checkpoint, args.write_predictions, args.overrides,
        args.n_points, sp=args.sp, sp_approx=args.sp_approx,
    )


if __name__ == "__main__":
    main()
