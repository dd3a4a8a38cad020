"""Data-parallel training over device meshes (new capability vs the reference).

The reference is strictly single-GPU (SURVEY.md §2.3: device 0 hard-coded, no
torch.distributed anywhere).  Here training scales the TPU way:

  * a batch of clouds is padded to a static ``(B, N, ...)`` block;
  * the per-cloud forward (hierarchy build + U-Net + loss) is ``jax.vmap``-ed
    over the batch — structures are independent per cloud, so batching is
    pure vectorisation, no cross-cloud indexing;
  * devices come in via ``jax.shard_map`` over a ``Mesh`` axis ``dp``: the
    batch is sharded on its leading axis, gradients are ``psum``-averaged
    over ICI, and every device applies the same optimizer update (replicated
    state, no parameter server).

This module is deliberately free of host sync: the returned step functions
are jittable end-to-end, including the lattice-structure build.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lattice_net_tpu.lattice.structure import build_hierarchy, static_general_branches
from lattice_net_tpu.losses import segmentation_loss

try:  # jax >= 0.6 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray

    @classmethod
    def create(cls, params, tx):
        # Canonicalize every optimizer-state leaf to a STRONG-typed array.
        # optax states can carry weak-typed scalars (e.g.
        # contrib.reduce_on_plateau's ``avg_value`` inits as ~float32[]);
        # a jitted train step returns them strong-typed, so the step-1 call
        # sees one differing aval and RETRACES — a second full compile of
        # the biggest program in the process (~2.5 min over the axon
        # tunnel) and the trigger for the round-4 INVALID_ARGUMENT trainer
        # crashes (two back-to-back large compiles mid-execution-stream;
        # docs/runs/onestep_r5.log reproduces key 751e... then 76fc...).
        # astype(dtype) on the same dtype drops weak_type, making the
        # initial avals a fixed point of the step.
        def strong(x):
            a = jnp.asarray(x)
            return a.astype(a.dtype) if getattr(a, "weak_type", False) else a

        opt_state = jax.tree.map(strong, tx.init(params))
        return cls(params=params, opt_state=opt_state, step=jnp.zeros((), jnp.int32))


_batch_rng = np.random.default_rng(0)


def make_batch(
    clouds,
    model_params,
    n_points: int,
    rng: np.random.Generator | None = None,
    canonical=None,
    device: bool = True,
):
    """Pad a list of (positions, values, target) triples to a static batch.

    Returns dict of stacked arrays: positions (B,N,d), values (B,N,C),
    target (B,N) int32, point_mask (B,N) bool.  The padding mask threads
    through hierarchy build (padded points create no vertices) and the loss.
    ``device=False`` returns host numpy (required when batching in a
    background thread — see the comment at the return).

    Clouds larger than ``n_points`` are randomly subsampled; the module-level
    generator advances across calls so training sees a different subset each
    epoch (pass ``rng`` for reproducible selection).  Evaluation must NOT rely
    on this path — use ``train.ln_eval``'s chunked full-cloud prediction.

    ``canonical`` (a sigma, or None) reorders each cloud host-side by
    (level-0 simplex, rank) so the device build may take the corner-dedup
    fast path (``build_hierarchy(..., canonical_points=True)``); the padded
    suffix stays last, preserving the prefix-mask precondition.  The lattice
    is permutation invariant, so this changes nothing numerically.
    """
    rng = _batch_rng if rng is None else rng
    ps, vs, ts, ms = [], [], [], []
    for positions, values, target in clouds:
        n = positions.shape[0]
        if n > n_points:
            sel = rng.choice(n, n_points, replace=False)
            positions, values, target = positions[sel], values[sel], target[sel]
            n = n_points
        if canonical is not None:
            from lattice_net_tpu.lattice.host_order import canonical_point_order_np

            order = canonical_point_order_np(positions, canonical)
            positions, values, target = positions[order], values[order], target[order]
        pad = n_points - n
        ps.append(np.pad(positions, ((0, pad), (0, 0))))
        vs.append(np.pad(values, ((0, pad), (0, 0))))
        ts.append(np.pad(target, (0, pad)))
        ms.append(np.arange(n_points) < n)
    out = {
        "positions": np.stack(ps).astype(np.float32),
        "values": np.stack(vs).astype(np.float32),
        "target": np.stack(ts).astype(np.int32),
        "point_mask": np.stack(ms),
    }
    if not device:
        # host-only batch: callers that build batches in a BACKGROUND THREAD
        # (the trainer's prefetch) must not touch the device there — on the
        # axon runtime a non-main-thread H2D poisons the tunnel session and
        # every later RPC (compile or execute) dies with INVALID_ARGUMENT.
        # The jitted step transfers host numpy on the main thread instead.
        return out
    return {k: jnp.asarray(v) for k, v in out.items()}


def make_loss_fn(
    model,
    sigma,
    nr_levels: int,
    capacities: Sequence[int],
    ignore_index: int = -1,
    class_weights=None,
    canonical_points: bool = False,
    force_vmap: bool = False,
    full_mask: bool = False,
) -> Callable:
    """Batched (vmapped) loss over a padded batch of clouds.

    ``canonical_points=True`` takes the corner-dedup fast level-0 build; the
    batch must then come from ``make_batch(..., canonical=sigma)`` (host-side
    reorder).  Any order stays correct (the build falls back per lax.cond),
    but an uncanonical batch would forfeit the speed-up.

    ``full_mask=True`` promises every batch's point_mask is ALL TRUE (the
    loader emits fixed-size clouds, no padding — e.g. the procedural KITTI
    generators).  The build then runs mask-free, which unlocks the
    sort-based inverse permutation for the point->vertex map (~2.5 ms/step
    at KITTI scale; the scatter path is required under real masks).  The
    LOSS still applies the mask array, so a violated promise skews the
    lattice (padding points become vertices) but never the loss masking.

    A batch of ONE cloud (the production shape: one scan per step / per DP
    shard) bypasses ``vmap`` and squeezes the batch axis so XLA sees the
    unbatched program — identical semantics (the single cloud still gets
    ``split(rng, 1)[0]``, matching what vmap would feed slot 0), but no
    degenerate (1, ...) leading dims.  ``force_vmap=True`` keeps the vmapped
    lowering for A/B profiling (misc/profile_train.py).
    """

    capacities = tuple(int(c) for c in capacities)

    def per_cloud(params, positions, values, target, point_mask, rng, train):
        from lattice_net_tpu.train.callbacks import iou_counts_device

        h = build_hierarchy(
            positions, sigma, nr_levels, capacities,
            point_mask=None if full_mask else point_mask,
            canonical_points=canonical_points, point_feats=values,
        )
        kwargs = {}
        if train:
            kwargs = {"deterministic": False, "rngs": {"dropout": rng}}
        logp, _ = model.apply(params, h, positions, values, **kwargs)
        loss = segmentation_loss(logp, target, ignore_index, class_weights, point_mask)
        valid = point_mask & (target != ignore_index)
        correct = (jnp.argmax(logp, -1) == target) & valid
        nr_classes = logp.shape[-1]
        inter, union = iou_counts_device(logp, target, nr_classes, ignore_index, point_mask)
        overflow = sum(s.nr_overflow for s in h.structures)
        return loss, (
            jnp.sum(correct), jnp.sum(valid), h.structures[0].nr_verts, overflow, inter, union,
            jnp.sum(point_mask),
        )

    def loss_fn(params, batch, rng, train=True):
        b = batch["positions"].shape[0]
        rngs = jax.random.split(rng, b)
        if b == 1 and not force_vmap:
            loss1, aux1 = per_cloud(
                params,
                batch["positions"][0],
                batch["values"][0],
                batch["target"][0],
                batch["point_mask"][0],
                rngs[0],
                train,
            )
            losses = loss1[None]
            aux = jax.tree.map(lambda x: jnp.asarray(x)[None], aux1)
        else:
            # under vmap every build lax.cond would execute BOTH branches
            # (select lowering); collapse them to the general branch at trace
            # time — identical outputs, one branch's cost
            with static_general_branches():
                losses, aux = jax.vmap(
                    lambda p, v, t, m, r: per_cloud(params, p, v, t, m, r, train)
                )(batch["positions"], batch["values"], batch["target"], batch["point_mask"], rngs)
        correct, valid, nr_verts, overflow, inter, union, nr_points = aux
        # *_mean metrics average over ALL batch slots, including dummy padding
        # slots (masked-out clouds that build ~0 vertices): consumers comparing
        # vertex/point scales must use the ratio or rescale by B / nr_real
        metrics = {
            "loss": jnp.mean(losses),
            "acc": jnp.sum(correct) / jnp.maximum(jnp.sum(valid), 1),
            "nr_verts_mean": jnp.mean(nr_verts),
            "nr_overflow_mean": jnp.mean(overflow.astype(jnp.float32)),
            "nr_points_mean": jnp.mean(nr_points.astype(jnp.float32)),
            "iou_intersection": jnp.sum(inter, axis=0),
            "iou_union": jnp.sum(union, axis=0),
        }
        return jnp.mean(losses), metrics

    return loss_fn


def make_train_step(
    model, tx, sigma, nr_levels, capacities, ignore_index=-1, class_weights=None,
    canonical_points=False, full_mask=False,
):
    """Single-device (or inner, per-shard) jittable train step."""
    loss_fn = make_loss_fn(
        model, sigma, nr_levels, capacities, ignore_index, class_weights,
        canonical_points=canonical_points, full_mask=full_mask,
    )

    # reduce_on_plateau (and other extra-args transforms) consume the loss
    # at update time; plain transforms must not receive the kwarg.
    wants_value = isinstance(tx, optax.GradientTransformationExtraArgs)

    def train_step(
        state: TrainState, batch, rng, lr_scale=None, axis_name: str | None = None
    ):
        # lr_scale (optional traced scalar): multiplies the OPTIMIZER UPDATES.
        # Passing 0.0 turns the step into a bit-exact no-op on params
        # (u * 0.0 == 0.0 for finite updates; p + 0.0 == p in IEEE f32)
        # while still producing the full metrics for `batch` — which lets
        # the trainer run its EVAL phase through this same executable.  The
        # axon runtime cannot re-dispatch a second distinct large executable
        # in one process (INVALID_ARGUMENT on its second dispatch; bisected
        # in docs/runs/onestep_r5_eval*.log — chained carries and
        # device-resident args were tried and do not help), so one process
        # gets ONE large program and eval rides it with frozen updates.
        # lr_scale=None (the default) keeps the HLO byte-identical to the
        # scale-free step for callers that never eval (bench, dp, sharded).
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            metrics = jax.lax.pmean(metrics, axis_name)
        extra = {"value": metrics["loss"]} if wants_value else {}
        updates, opt_state = tx.update(grads, state.opt_state, state.params, **extra)
        if lr_scale is not None:
            updates = jax.tree.map(lambda u: u * lr_scale, updates)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state, step=state.step + 1), metrics

    return train_step


def make_dp_train_step(
    model,
    tx,
    mesh: Mesh,
    sigma,
    nr_levels,
    capacities,
    ignore_index=-1,
    class_weights=None,
    axis: str = "dp",
    canonical_points=False,
):
    """Data-parallel train step: batch sharded over ``axis``, grads psum over ICI.

    State is replicated; each device computes grads for its local clouds, a
    single ``pmean`` (one all-reduce on the interconnect) averages them, and
    the optimizer update is applied redundantly-but-identically per device —
    the standard JAX DP recipe (scaling-book style), with zero host traffic.
    """
    inner = make_train_step(
        model, tx, sigma, nr_levels, capacities, ignore_index, class_weights,
        canonical_points=canonical_points,
    )

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), {k: P(axis) for k in ("positions", "values", "target", "point_mask")}, P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def dp_step(state, batch, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        return inner(state, batch, rng, axis_name=axis)

    def step(state, batch, rng):
        return dp_step(state, batch, rng)

    return jax.jit(step)


def replicate_state(state, mesh: Mesh):
    """Place a TrainState replicated across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(state, sharding)


def shard_batch(batch, mesh: Mesh, axis: str = "dp"):
    sharding = NamedSharding(mesh, P(axis))
    return jax.device_put(batch, sharding)
