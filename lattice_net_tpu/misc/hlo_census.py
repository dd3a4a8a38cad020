"""Static HLO op census of the flagship inference / train programs.

Counts the expensive op classes (sort, gather, scatter, while, reduce-window,
dot/conv) in the *unoptimized* HLO of the exact programs ``bench.py`` times,
with operand byte volumes, so hot-path regressions and rewrite opportunities
are visible WITHOUT the chip.  Unoptimized HLO is backend-agnostic: XLA can
fuse elementwise work but cannot delete a sort or scatter, so these counts
are the program's irreducible "data-movement bill".

The TPU-native stand-in for eyeballing the reference's kernel launch list
(``src/Lattice.cu`` nvprof runs).  Run on CPU:

    python -m lattice_net_tpu.misc.hlo_census [--train] [--per-op]
"""

from __future__ import annotations

import argparse
import collections
import re

import numpy as np

_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")

_BYTES = {
    "f32": 4, "f64": 8, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "s64": 8, "u64": 8,
    "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1,
}


def _shape_bytes(text: str) -> int:
    """Sum byte sizes of every dtype[shape] group in an HLO result type."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(text):
        if dt not in _BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _BYTES[dt]
    return total


# op-class -> regex on the HLO instruction name ("%x = f32[..] sort(..)")
_CLASSES = {
    "sort": re.compile(r"= [^=]*\bsort\("),
    "gather": re.compile(r"= [^=]*\bgather\("),
    "scatter": re.compile(r"= [^=]*\bscatter\("),
    "dot": re.compile(r"= [^=]*\bdot\("),
    "conv": re.compile(r"= [^=]*\bconvolution\("),
    "while": re.compile(r"= [^=]*\bwhile\("),
    "custom-call": re.compile(r"= [^=]*\bcustom-call\("),
    "reduce-window": re.compile(r"= [^=]*\breduce-window\("),
    "dynamic-slice": re.compile(r"= [^=]*\bdynamic-slice\("),
    "dynamic-update-slice": re.compile(r"= [^=]*\bdynamic-update-slice\("),
}


def census(hlo_text: str):
    counts = collections.Counter()
    volume = collections.Counter()
    rows = collections.defaultdict(list)
    for line in hlo_text.splitlines():
        line = line.strip()
        for cls, rx in _CLASSES.items():
            m = rx.search(line)
            if m:
                counts[cls] += 1
                # result type = everything between " = " and the op keyword
                # (handles tuple results like "(s32[..], f32[..]) sort(...)")
                start = line.find(" = ")
                result_ty = line[start + 3 : m.end() - len(cls) - 1] if start >= 0 else ""
                b = _shape_bytes(result_ty)
                volume[cls] += b
                rows[cls].append((b, line[:160]))
                break
    return counts, volume, rows


def _print(counts, volume, rows, per_op: bool):
    print(f"{'class':<22}{'count':>7}{'result MB':>12}")
    for cls in sorted(counts, key=lambda c: -volume[c]):
        print(f"{cls:<22}{counts[cls]:>7}{volume[cls] / 1e6:>12.2f}")
    if per_op:
        for cls in sorted(counts, key=lambda c: -volume[c]):
            print(f"\n== {cls} ==")
            for b, line in sorted(rows[cls], reverse=True)[:40]:
                print(f"  {b / 1e6:8.2f} MB  {line}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--train", action="store_true", help="census the train step")
    ap.add_argument("--per-op", action="store_true", help="list individual ops")
    ap.add_argument("--n-points", type=int, default=1 << 17)
    ap.add_argument(
        "--f32", action="store_true",
        help="census the f32 conv path (default forces LNT_CONV_DTYPE=bf16 so "
        "the CPU lowering matches the TPU production dtypes; Pallas kernel "
        "choices still differ — this tool counts XLA-op structure only)",
    )
    args = ap.parse_args()

    import os

    if not args.f32:
        os.environ.setdefault("LNT_CONV_DTYPE", "bf16")

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from lattice_net_tpu.lattice.structure import build_hierarchy
    from lattice_net_tpu.models import LNN, ModelParams

    mp = ModelParams(
        nr_classes=20,
        pointnet_channels_per_layer=(16, 32),
        pointnet_start_nr_channels=32,
        nr_downsamples=2,
        nr_blocks_down_stage=(1, 1),
        nr_blocks_bottleneck=1,
        nr_blocks_up_stage=(1, 1),
        nr_levels_down_with_normal_resnet=3,
        nr_levels_up_with_normal_resnet=3,
    )
    sigma = 0.6
    n = args.n_points
    caps = (1 << 16, 1 << 15, 1 << 13)
    rng = np.random.default_rng(0)
    positions = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 10)
    values = jnp.zeros((n, 1), jnp.float32)
    model = LNN(mp)
    h0 = build_hierarchy(positions, sigma, mp.nr_downsamples, caps)
    params = model.init(jax.random.PRNGKey(0), h0, positions, values)

    if not args.train:
        def fwd(params, positions, values):
            h = build_hierarchy(positions, sigma, mp.nr_downsamples, caps,
                                point_feats=values)
            logp, _ = model.apply(params, h, positions, values)
            return jnp.argmax(logp, axis=-1).astype(jnp.int32)

        hlo = (
            jax.jit(fwd)
            .lower(params, positions, values)
            .compiler_ir("hlo")
            .as_hlo_text()
        )
    else:
        from lattice_net_tpu.parallel import TrainState, make_train_step
        from lattice_net_tpu.train import make_optimizer

        target = jnp.asarray(rng.integers(1, 20, n), jnp.int32)
        tx = make_optimizer(
            1e-3, weight_decay=1e-4, schedule="cosine_warm_restarts", t0_steps=1000
        )
        state = TrainState.create(params, tx)
        batch = {
            "positions": positions[None],
            "values": values[None],
            "target": target[None],
            "point_mask": jnp.ones((1, n), bool),
        }
        step = make_train_step(
            model, tx, sigma, mp.nr_downsamples, caps, full_mask=True
        )
        hlo = (
            jax.jit(step)
            .lower(state, batch, jax.random.PRNGKey(2))
            .compiler_ir("hlo")
            .as_hlo_text()
        )

    counts, volume, rows = census(hlo)
    _print(counts, volume, rows, args.per_op)


if __name__ == "__main__":
    main()
