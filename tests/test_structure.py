"""Structure-builder invariants: dedup, lookup, neighbours, hierarchy, overflow."""

import numpy as np
import jax
import pytest
import jax.numpy as jnp

from lattice_net_tpu.lattice import permutohedral as pm
from lattice_net_tpu.lattice import structure as st


def _cloud(rng, n=200, d=3, scale=2.0):
    return rng.normal(size=(n, d)).astype(np.float32) * scale


def test_build_structure_dedup(rng):
    pts = _cloud(rng)
    s, vid, w = st.build_structure(jnp.asarray(pts), 0.5, capacity=4096)
    nr = int(s.nr_verts)
    assert 0 < nr < 4096
    assert int(s.nr_overflow) == 0

    # keys table rows [0, nr) hold strictly (lexicographically) sorted unique keys
    keys_np = np.asarray(s.keys)
    rows = [tuple(k) for k in keys_np[:nr]]
    assert rows == sorted(set(rows))
    assert (keys_np[nr:] == st.SENTINEL).all()

    # vid agrees with direct key lookup, and matches the ground-truth dedup
    keys, bary = pm.splat_coords(jnp.asarray(pts) / 0.5)
    looked = np.asarray(s.lookup(keys))
    np.testing.assert_array_equal(looked, np.asarray(vid))
    uniq = {tuple(k) for k in np.asarray(keys).reshape(-1, 3)}
    assert len(uniq) == nr
    np.testing.assert_allclose(np.asarray(w), np.asarray(bary))


def test_point_mask_excludes_points(rng):
    pts = _cloud(rng, n=100)
    mask = np.zeros(100, dtype=bool)
    mask[:50] = True
    s_m, vid_m, _ = st.build_structure(jnp.asarray(pts), 0.5, 2048, point_mask=jnp.asarray(mask))
    s_h, _, _ = st.build_structure(jnp.asarray(pts[:50]), 0.5, 2048)
    assert int(s_m.nr_verts) == int(s_h.nr_verts)
    nr = int(s_m.nr_verts)
    np.testing.assert_array_equal(np.asarray(s_m.keys)[:nr], np.asarray(s_h.keys)[:nr])
    # masked points map every edge to the invalid index
    assert (np.asarray(vid_m)[50:] == s_m.capacity).all()
    assert (np.asarray(vid_m)[:50] < nr).all()


def test_overflow_drops_tail(rng):
    pts = _cloud(rng, n=300)
    cap = 16
    s, vid, _ = st.build_structure(jnp.asarray(pts), 0.3, cap)
    assert int(s.nr_verts) == cap
    assert int(s.nr_overflow) > 0
    vid = np.asarray(vid)
    assert ((vid < cap) | (vid == cap)).all()
    # stored table is still consistent (sorted, unique)
    rows = [tuple(k) for k in np.asarray(s.keys)[:cap]]
    assert rows == sorted(set(rows))


def test_neighbors_same_level_symmetry(rng):
    pts = _cloud(rng)
    s, _, _ = st.build_structure(jnp.asarray(pts), 0.5, 4096)
    nbr = np.asarray(st.build_neighbors_same_level(s))
    nr = int(s.nr_verts)
    cap = s.capacity
    d1 = s.pos_dim + 1
    assert nbr.shape == (cap, 2 * d1)
    assert (nbr[nr:] == cap).all()
    # symmetry: if v's +axis-a neighbour is u, then u's -axis-a neighbour is v
    some_found = 0
    for v in range(nr):
        for a in range(d1):
            u = nbr[v, 2 * a]
            if u < cap:
                some_found += 1
                assert nbr[u, 2 * a + 1] == v
    assert some_found > 0


def test_neighbor_keys_correct(rng):
    pts = _cloud(rng, n=150)
    s, _, _ = st.build_structure(jnp.asarray(pts), 0.5, 4096)
    nbr = np.asarray(st.build_neighbors_same_level(s))
    keys = np.asarray(s.keys)
    nr = int(s.nr_verts)
    d = s.pos_dim
    moves = np.asarray(st._axis_moves_np(d))
    key_set = {tuple(k) for k in keys[:nr]}
    for v in range(min(nr, 50)):
        for a in range(d + 1):
            expect_p = tuple(keys[v] + moves[a])
            got = nbr[v, 2 * a]
            if expect_p in key_set:
                assert tuple(keys[got]) == expect_p
            else:
                assert got == s.capacity


def test_hierarchy_shapes_and_coarse_counts(rng):
    pts = _cloud(rng, n=400)
    caps = (4096, 2048, 1024)
    h = st.build_hierarchy(jnp.asarray(pts), 0.4, nr_levels=2, capacities=caps)
    assert len(h.structures) == 3
    counts = [int(s.nr_verts) for s in h.structures]
    # coarser levels have (weakly) fewer vertices
    assert counts[0] >= counts[1] >= counts[2] > 0
    assert h.splat_idx.shape == (400, 4)
    for i, nbr in enumerate(h.neighbors_coarsen):
        assert nbr.shape == (caps[i + 1], 2 * 4 + 1)
    for i, nbr in enumerate(h.neighbors_finefy):
        assert nbr.shape == (caps[i], 2 * 4 + 1)


def test_cross_level_tables_consistent(rng):
    pts = _cloud(rng, n=300)
    h = st.build_hierarchy(jnp.asarray(pts), 0.5, nr_levels=1, capacities=(4096, 2048))
    fine, coarse = h.structures
    down = np.asarray(h.neighbors_coarsen[0])  # coarse queries into fine
    up = np.asarray(h.neighbors_finefy[0])  # fine queries into coarse
    fine_keys = np.asarray(fine.keys)
    coarse_keys = np.asarray(coarse.keys)
    nrf, nrc = int(fine.nr_verts), int(coarse.nr_verts)

    # coarsen centre: fine key must equal 2 * coarse key
    hits = 0
    for v in range(nrc):
        c = down[v, -1]
        if c < fine.capacity:
            hits += 1
            np.testing.assert_array_equal(fine_keys[c], coarse_keys[v] * 2)
    assert hits > 0

    # finefy centre: defined only for all-even fine keys, pointing at key/2
    for v in range(nrf):
        c = up[v, -1]
        k = fine_keys[v]
        if (k % 2 == 0).all():
            if c < coarse.capacity:
                np.testing.assert_array_equal(coarse_keys[c], k // 2)
        else:
            assert c == coarse.capacity

    # adjointness: coarse v lists fine u at +axis slot  <=>  fine u lists coarse v at -axis slot
    checked = 0
    for v in range(nrc):
        for a in range(4):
            u = down[v, 2 * a]
            if u < fine.capacity:
                assert up[u, 2 * a + 1] == v
                checked += 1
    assert checked > 0


def test_build_is_jittable(rng):
    pts = jnp.asarray(_cloud(rng, n=128))

    @jax.jit
    def build(p):
        return st.build_hierarchy(p, 0.5, 1, (1024, 512))

    h = build(pts)
    h2 = build(pts + 0.0)
    assert int(h.structures[0].nr_verts) == int(h2.structures[0].nr_verts)


def test_pack_key_pairs_order_and_roundtrip(rng):
    # packed lex order must equal unpacked lex order, and unpack inverts pack
    keys = rng.integers(-st.PACK_BOUND + 1, st.PACK_BOUND - 1, size=(500, 3)).astype(np.int32)
    keys[:5] = st.SENTINEL  # sentinel rows stay sentinel and sort last
    packed = np.asarray(st.pack_key_pairs(jnp.asarray(keys)))
    back = np.asarray(st.unpack_key_pairs(jnp.asarray(packed), 3))
    np.testing.assert_array_equal(back, keys)

    def lexcmp(a, b):
        return (tuple(a) < tuple(b)) if not np.array_equal(a, b) else False

    for i in range(0, 480, 7):
        a, b = keys[i], keys[i + 1]
        assert lexcmp(a, b) == (tuple(packed[i]) < tuple(packed[i + 1])) or np.array_equal(a, b)


def test_packed_table_matches_keys(rng):
    pts = jnp.asarray(_cloud(rng, n=300))
    s, _, _ = st.build_structure(pts, 0.5, 1024)
    np.testing.assert_array_equal(
        np.asarray(st.pack_key_pairs(s.keys)), np.asarray(s.keys2)
    )


def test_coarse_build_without_point_maps_matches(rng):
    # need_point_maps=False must produce the identical key table
    pts = jnp.asarray(_cloud(rng, n=400))
    s_full, vid, bw = st.build_structure(pts, 1.0, 1024, lvl=1)
    s_slim, vid2, bw2 = st.build_structure(pts, 1.0, 1024, lvl=1, need_point_maps=False)
    assert vid2 is None and bw2 is None
    assert vid is not None
    np.testing.assert_array_equal(np.asarray(s_full.keys), np.asarray(s_slim.keys))
    assert int(s_full.nr_verts) == int(s_slim.nr_verts)


def test_simplex_coarse_matches_resplat(rng):
    # the nested-triangulation reduction must reproduce the resplat coarse
    # key SET exactly on these deterministic clouds (d=3)
    for seed in range(4):
        r = np.random.default_rng(seed)
        pts = jnp.asarray(r.normal(size=(4000, 3)).astype(np.float32) * r.uniform(1, 4))
        h_fast = st.build_hierarchy(pts, 0.3, 2, (4096, 2048, 1024), coarse_mode="simplex")
        h_ref = st.build_hierarchy(pts, 0.3, 2, (4096, 2048, 1024), coarse_mode="resplat")
        for lvl in (1, 2):
            a, b = h_fast.structures[lvl], h_ref.structures[lvl]
            assert int(a.nr_verts) == int(b.nr_verts), f"seed {seed} lvl {lvl}"
            np.testing.assert_array_equal(
                np.asarray(a.keys), np.asarray(b.keys), err_msg=f"seed {seed} lvl {lvl}"
            )


def test_simplex_coarse_point_mask(rng):
    # masked points must not create coarse vertices in simplex mode
    pts = jnp.asarray(_cloud(rng, n=600))
    mask = jnp.arange(600) < 300
    h_fast = st.build_hierarchy(pts, 0.5, 1, (2048, 1024), point_mask=mask, coarse_mode="simplex")
    h_ref = st.build_hierarchy(pts, 0.5, 1, (2048, 1024), point_mask=mask, coarse_mode="resplat")
    np.testing.assert_array_equal(
        np.asarray(h_fast.structures[1].keys), np.asarray(h_ref.structures[1].keys)
    )


def test_simplex_reps_overflow_falls_back(rng):
    # force the rep budget below the unique-simplex count: the lax.cond must
    # take the full-resplat branch and still produce the exact key table
    pts = jnp.asarray(_cloud(rng, n=400, scale=6.0))
    caps = (64, 512)  # s_cap = min(n, caps[0]) = 64 << unique simplices
    h_fast = st.build_hierarchy(pts, 0.4, 1, caps, coarse_mode="simplex")
    h_ref = st.build_hierarchy(pts, 0.4, 1, caps, coarse_mode="resplat")
    np.testing.assert_array_equal(
        np.asarray(h_fast.structures[1].keys), np.asarray(h_ref.structures[1].keys)
    )


def test_canonical_point_order(rng):
    pts = jnp.asarray(_cloud(rng, n=3000, scale=3.0))
    perm = st.canonical_point_order(pts, 0.4)
    assert sorted(np.asarray(perm).tolist()) == list(range(3000))
    pts_s = jnp.take(pts, perm, axis=0)

    h_plain = st.build_hierarchy(pts_s, 0.4, 2, (4096, 2048, 1024))
    h_canon = st.build_hierarchy(pts_s, 0.4, 2, (4096, 2048, 1024), canonical_points=True)
    for lvl in range(3):
        np.testing.assert_array_equal(
            np.asarray(h_plain.structures[lvl].keys),
            np.asarray(h_canon.structures[lvl].keys),
            err_msg=f"lvl {lvl}",
        )
    # key tables are permutation-invariant vs the unsorted cloud
    h_uns = st.build_hierarchy(pts, 0.4, 2, (4096, 2048, 1024))
    for lvl in range(3):
        np.testing.assert_array_equal(
            np.asarray(h_uns.structures[lvl].keys),
            np.asarray(h_canon.structures[lvl].keys),
        )
    # per-point splat rows follow the permutation
    np.testing.assert_array_equal(
        np.asarray(h_uns.splat_idx)[np.asarray(perm)], np.asarray(h_canon.splat_idx)
    )


def test_canonical_order_clusters_splat_idx(rng):
    # the point of the canonical order: per-subtile splat-index spans become
    # window-sized on realistically dense scans (enabling the Pallas
    # clustered gathers; sparse clouds simply take the cond fallback)
    from lattice_net_tpu.data.synth_kitti import make_scene

    n = 1 << 15
    pts = jnp.asarray(make_scene(n, seed=0).V)
    perm = st.canonical_point_order(pts, 0.6)
    h = st.build_hierarchy(jnp.take(pts, perm, axis=0), 0.6, 1, (16384, 8192),
                           canonical_points=True)
    idx = np.asarray(h.splat_idx)  # (n, 4)
    cap = 16384
    spans = []
    for s in range(0, n - 256, 256):
        blk = idx[s : s + 256]
        valid = blk < cap
        if valid.any():
            spans.append(blk[valid].max() - blk[valid].min())
    # column 0 (remainder-0 vertex) stays window-local; columns 1..3 hop
    # between rank-class regions whose spacing scales with the table, so a
    # windowed gather over ALL columns is impractical — documented negative
    # result: the head keeps plain row gathers (fused + bf16 instead)
    col0 = []
    for s in range(0, n - 256, 256):
        blk = idx[s : s + 256, 0]
        v = blk < cap
        if v.any():
            col0.append(blk[v].max() - blk[v].min())
    assert np.percentile(col0, 99) < 640, np.percentile(col0, 99)


def test_explicit_simplex_mode_validates_envelope(rng):
    # an explicit coarse_mode="simplex" outside the 31-bit signature
    # envelope must raise, not silently merge distinct simplices
    pts = jnp.asarray(rng.uniform(-1, 1, size=(64, 2)), jnp.float32)  # d != 3
    with pytest.raises(ValueError, match="simplex"):
        st.build_hierarchy(pts, 0.3, 1, (512, 256), coarse_mode="simplex")
    pts3 = jnp.asarray(rng.uniform(-1, 1, size=(64, 3)), jnp.float32)
    with pytest.raises(ValueError, match="simplex"):
        # capacity 2^23 pushes sig_bits past 30
        st.build_hierarchy(pts3, 0.3, 1, (1 << 23, 256), coarse_mode="simplex")


def test_check_positions_sigma_bound():
    # the packed-key bound must be enforced at the data boundary when sigma
    # is provided (ADVICE r1: silently overflowing int32 keys corrupt sorts)
    from lattice_net_tpu.lattice.ops import check_positions

    p = np.zeros((8, 3), np.float32)
    p[0] = 1e5  # 100 km scene
    check_positions(p)  # no sigma: only dtype/finite checks
    with pytest.raises(ValueError, match="too large"):
        check_positions(p, sigma=0.6)
    check_positions(p, sigma=100.0)  # large sigma keeps keys in bound


def _edges_equiv(n, d1, cap, e_fast, e_ref):
    # vertex stream and run ends must match exactly; perm may order edges
    # differently WITHIN a run (intra-run order is semantically free) but
    # must be a bijection mapping each position to an edge of that vertex
    vf, vr = np.asarray(e_fast.vertex), np.asarray(e_ref.vertex)
    np.testing.assert_array_equal(vf, vr)
    np.testing.assert_array_equal(np.asarray(e_fast.ends), np.asarray(e_ref.ends))
    pf = np.asarray(e_fast.perm)
    valid = vf < cap
    assert len(np.unique(pf[valid])) == valid.sum()  # bijection on valid rows
    pr = np.asarray(e_ref.perm)
    # perm must map to edges of the same vertex set: reconstruct vertex from
    # the reference stream's mapping edge -> vertex
    edge_vertex = np.full(n * d1, cap, np.int32)
    edge_vertex[pr[valid]] = vr[valid]
    np.testing.assert_array_equal(edge_vertex[pf[valid]], vf[valid])


def test_canonical_fast_build_matches_generic(rng):
    from lattice_net_tpu.data.synth_kitti import make_scene

    n = 1 << 13
    pts = jnp.asarray(make_scene(n, seed=3).V)
    sigma = 0.6
    caps = (8192, 4096, 2048)
    perm = st.canonical_point_order(pts, sigma)
    pts_c = jnp.take(pts, perm, axis=0)

    h_ref = st.build_hierarchy(pts_c, sigma, 2, caps, canonical_points=False)
    h_fast = st.build_hierarchy(pts_c, sigma, 2, caps, canonical_points=True)

    for sr, sf in zip(h_ref.structures, h_fast.structures):
        assert int(sr.nr_verts) == int(sf.nr_verts)
        # the sparse 8k-point scene overflows L0 — the fast build must agree
        # on the overflow count and keep the identical table prefix
        assert int(sr.nr_overflow) == int(sf.nr_overflow)
        np.testing.assert_array_equal(np.asarray(sr.keys), np.asarray(sf.keys))
    np.testing.assert_array_equal(
        np.asarray(h_ref.splat_idx), np.asarray(h_fast.splat_idx)
    )
    np.testing.assert_allclose(
        np.asarray(h_ref.splat_weights), np.asarray(h_fast.splat_weights)
    )
    _edges_equiv(n, 4, caps[0], h_fast.edges, h_ref.edges)
    for a, b in zip(h_ref.neighbors_same, h_fast.neighbors_same):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # downstream segment reductions agree (the intra-run order differs, so
    # float sums may differ in the last ulp only)
    from lattice_net_tpu.lattice import ops as lops

    vals = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    rows_f, ids_f = lops.distribute_sorted(
        pts_c, vals, h_fast.edges, caps[0], splat_weights=h_fast.splat_weights
    )
    rows_r, ids_r = lops.distribute_sorted(
        pts_c, vals, h_ref.edges, caps[0], splat_weights=h_ref.splat_weights
    )
    sf = lops.seg_sum_sorted(rows_f, h_fast.edges, caps[0])
    sr = lops.seg_sum_sorted(rows_r, h_ref.edges, caps[0])
    np.testing.assert_allclose(np.asarray(sf), np.asarray(sr), rtol=1e-5, atol=1e-5)


def test_canonical_fast_build_masked_suffix(rng):
    pts = jnp.asarray(rng.uniform(-3, 3, size=(512, 3)), jnp.float32)
    mask = jnp.arange(512) < 400
    perm = st.canonical_point_order(pts, 0.3, point_mask=mask)
    pts_c = jnp.take(pts, perm, axis=0)
    mask_c = jnp.take(mask, perm)
    assert bool(jnp.all(mask_c[:400])) and not bool(jnp.any(mask_c[400:]))

    h_ref = st.build_hierarchy(pts_c, 0.3, 1, (2048, 1024), point_mask=mask_c)
    h_fast = st.build_hierarchy(
        pts_c, 0.3, 1, (2048, 1024), point_mask=mask_c, canonical_points=True
    )
    assert int(h_ref.structures[0].nr_verts) == int(h_fast.structures[0].nr_verts)
    np.testing.assert_array_equal(
        np.asarray(h_ref.structures[0].keys), np.asarray(h_fast.structures[0].keys)
    )
    np.testing.assert_array_equal(
        np.asarray(h_ref.splat_idx), np.asarray(h_fast.splat_idx)
    )
    _edges_equiv(512, 4, 2048, h_fast.edges, h_ref.edges)


def test_canonical_fast_build_overflow_falls_back(rng):
    # rep slots below the unique-simplex count: the lax.cond must take the
    # generic path and still produce the right structure.  s_cap is derived
    # from capacities[0]//2, so a small capacity forces a small budget.
    pts = jnp.asarray(rng.uniform(-8, 8, size=(4096, 3)), jnp.float32)
    # sigma small -> ~every point its own simplex -> runs >> s_cap
    h_ref = st.build_hierarchy(pts, 0.2, 1, (4096, 2048), canonical_points=False)
    h_fast = st.build_hierarchy(pts, 0.2, 1, (4096, 2048), canonical_points=True)
    assert int(h_ref.structures[0].nr_verts) == int(h_fast.structures[0].nr_verts)
    np.testing.assert_array_equal(
        np.asarray(h_ref.structures[0].keys), np.asarray(h_fast.structures[0].keys)
    )
    np.testing.assert_array_equal(
        np.asarray(h_ref.splat_idx), np.asarray(h_fast.splat_idx)
    )


def test_host_canonical_order_matches_device_grouping(rng):
    # the numpy host-order twin (data-prep path) must produce the same
    # simplex grouping quality as the device order: reordered points take
    # the canonical fast build and yield tables identical to the generic
    # build; runs of equal simplex are contiguous for ~all points.
    from lattice_net_tpu.lattice.host_order import canonical_point_order_np

    pts_np = _cloud(rng, n=3000, scale=3.0)
    order = canonical_point_order_np(pts_np, 0.4)
    assert sorted(order.tolist()) == list(range(3000))
    pts_c = jnp.asarray(pts_np[order])

    h_fast = st.build_hierarchy(pts_c, 0.4, 2, (4096, 2048, 1024), canonical_points=True)
    h_ref = st.build_hierarchy(pts_c, 0.4, 2, (4096, 2048, 1024), canonical_points=False)
    for lvl in range(3):
        np.testing.assert_array_equal(
            np.asarray(h_fast.structures[lvl].keys),
            np.asarray(h_ref.structures[lvl].keys),
            err_msg=f"lvl {lvl}",
        )
    np.testing.assert_array_equal(np.asarray(h_fast.splat_idx), np.asarray(h_ref.splat_idx))

    # grouping quality: the device order and the host order agree on the
    # simplex partition for (nearly) every point; float32 host rounding may
    # fragment a handful of borderline points, never more
    def adjacent_runs(col):
        return int(np.count_nonzero(col[1:] != col[:-1])) + 1

    perm_dev = np.asarray(st.canonical_point_order(jnp.asarray(pts_np), 0.4))
    h_dev = st.build_hierarchy(jnp.asarray(pts_np[perm_dev]), 0.4, 2, (4096, 2048, 1024))
    runs_host = adjacent_runs(np.asarray(h_ref.splat_idx)[:, 0])
    runs_dev = adjacent_runs(np.asarray(h_dev.splat_idx)[:, 0])
    assert runs_host <= runs_dev * 1.02 + 5, (runs_host, runs_dev)


def test_make_batch_canonical_matches_plain_loss(rng):
    # host-side canonical reorder + canonical_points build must leave the
    # train loss and grads exactly invariant (lattice permutation invariance)
    import optax

    from lattice_net_tpu.models import LNN, ModelParams
    from lattice_net_tpu.parallel import TrainState, make_batch, make_train_step

    n, n_points = 1500, 2048
    pts = _cloud(rng, n=n, scale=2.0)
    vals = rng.normal(size=(n, 1)).astype(np.float32)
    tgt = rng.integers(0, 4, n).astype(np.int32)
    mp = ModelParams(
        nr_classes=4,
        pointnet_channels_per_layer=(8, 16),
        pointnet_start_nr_channels=8,
        nr_downsamples=1,
        nr_blocks_down_stage=(1, 1),
        nr_blocks_bottleneck=1,
        nr_blocks_up_stage=(1, 1),
    )
    sigma, caps = 0.4, (4096, 2048)
    b_plain = make_batch([(pts, vals, tgt)], mp, n_points)
    b_canon = make_batch([(pts, vals, tgt)], mp, n_points, canonical=sigma)

    model = LNN(mp)
    h0 = st.build_hierarchy(
        b_plain["positions"][0], sigma, mp.nr_downsamples, caps,
        point_mask=b_plain["point_mask"][0],
    )
    params = model.init(
        jax.random.PRNGKey(0), h0, b_plain["positions"][0], b_plain["values"][0]
    )
    tx = optax.adamw(1e-3)
    rng_j = jax.random.PRNGKey(3)

    from lattice_net_tpu.parallel import make_loss_fn

    loss_plain = make_loss_fn(model, sigma, mp.nr_downsamples, caps)
    loss_canon = make_loss_fn(model, sigma, mp.nr_downsamples, caps, canonical_points=True)
    (l1, _), g1 = jax.jit(jax.value_and_grad(loss_plain, has_aux=True))(
        params, b_plain, rng_j
    )
    (l2, _), g2 = jax.jit(jax.value_and_grad(loss_canon, has_aux=True))(
        params, b_canon, rng_j
    )
    # loss equality catches ANY p/v/t misalignment in the reorder (a shifted
    # pairing changes the loss value); exact grad equality is NOT a property
    # the model admits — PointNet's max-pool winner can flip on f32
    # reassociation ties under a permutation, discretely rerouting a few
    # gradient paths — so grads are compared in aggregate only.
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    v1 = np.concatenate([np.asarray(x).ravel() for x in jax.tree.leaves(g1)])
    v2 = np.concatenate([np.asarray(x).ravel() for x in jax.tree.leaves(g2)])
    rel = np.linalg.norm(v1 - v2) / max(np.linalg.norm(v2), 1e-12)
    assert rel < 5e-2, rel

    # the jitted train step itself must run and stay finite on the canonical
    # batch (the optimizer path is covered by equality of the grads above)
    step_canon = jax.jit(make_train_step(
        model, tx, sigma, mp.nr_downsamples, caps, canonical_points=True
    ))
    s2, m2 = step_canon(TrainState.create(params, tx), b_canon, rng_j)
    assert np.isfinite(float(m2["loss"]))


def test_merged_lookup_tables_identical(rng, monkeypatch):
    # the merged lookups (default since round 2) share one [table; queries]
    # sort per fine level between the same-level and coarsen lookups; every
    # neighbour table must be bit-identical to the per-call path
    # (LNT_MERGED_LOOKUP=0), including with padding points
    pts = _cloud(rng, 3000)
    mask = np.ones(3000, bool)
    mask[2500:] = False
    caps = (4096, 2048, 1024)
    monkeypatch.setenv("LNT_MERGED_LOOKUP", "0")
    h_ref = st.build_hierarchy(jnp.asarray(pts), 0.4, 2, caps, point_mask=jnp.asarray(mask))
    monkeypatch.setenv("LNT_MERGED_LOOKUP", "1")
    h_mrg = st.build_hierarchy(jnp.asarray(pts), 0.4, 2, caps, point_mask=jnp.asarray(mask))
    for a, b in zip(h_ref.neighbors_same, h_mrg.neighbors_same):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(h_ref.neighbors_coarsen, h_mrg.neighbors_coarsen):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(h_ref.neighbors_finefy, h_mrg.neighbors_finefy):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_static_general_branches_bitexact(rng):
    """static_general_branches() must trace the general branch of every
    fast-path cond and produce BIT-IDENTICAL hierarchies (the fast branches
    are shortcuts, not approximations): key tables, splat maps, neighbour
    tables, edge streams all equal."""
    pts = jnp.asarray(_cloud(rng, n=512))
    caps = (2048, 1024, 512)

    h_fast = jax.jit(lambda p: st.build_hierarchy(p, 0.5, 2, caps))(pts)

    with st.static_general_branches():
        h_gen = jax.jit(lambda p: st.build_hierarchy(p, 0.5, 2, caps))(pts)

    for a, b in zip(jax.tree_util.tree_leaves(h_fast), jax.tree_util.tree_leaves(h_gen)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the context must restore: outside, conds trace again (smoke: rebuild)
    h2 = jax.jit(lambda p: st.build_hierarchy(p, 0.5, 2, caps))(pts)
    np.testing.assert_array_equal(
        np.asarray(h2.splat_idx), np.asarray(h_fast.splat_idx)
    )


def test_invperm_sort_build_identical(rng, monkeypatch):
    # LNT_INVPERM_SORT=1 (2-op sort instead of the inverse-permutation
    # scatter) must produce bit-identical structures + point maps for
    # unmasked builds; masked builds must keep working (scatter path).
    pts = jnp.asarray(_cloud(rng, n=500))

    def _full(flag):
        monkeypatch.setattr(st, "_INVPERM_SORT", flag)
        return st.build_structure(pts, 0.5, capacity=4096, with_edges=True)

    s0, vid0, w0, e0 = _full(False)
    s1, vid1, w1, e1 = _full(True)
    np.testing.assert_array_equal(np.asarray(vid0), np.asarray(vid1))
    np.testing.assert_array_equal(np.asarray(s0.keys), np.asarray(s1.keys))
    np.testing.assert_array_equal(np.asarray(e0.perm), np.asarray(e1.perm))
    np.testing.assert_array_equal(np.asarray(e0.vertex), np.asarray(e1.vertex))

    # masked build under the flag: must fall back to the scatter (same result)
    mask = jnp.asarray(rng.random(500) > 0.2)
    monkeypatch.setattr(st, "_INVPERM_SORT", True)
    sm1, vidm1, _ = st.build_structure(pts, 0.5, capacity=4096, point_mask=mask)
    monkeypatch.setattr(st, "_INVPERM_SORT", False)
    sm0, vidm0, _ = st.build_structure(pts, 0.5, capacity=4096, point_mask=mask)
    np.testing.assert_array_equal(np.asarray(vidm0), np.asarray(vidm1))


def test_ends_sort_build_identical(rng, monkeypatch):
    # LNT_ENDS_SORT=1 (sort-compaction run-end table) must be bit-identical,
    # masked and unmasked, including at capacity > n*(d+1).
    pts = jnp.asarray(_cloud(rng, n=400))
    mask = jnp.asarray(rng.random(400) > 0.2)
    for pm in (None, mask):
        for cap in (512, 4096):  # 4096 > 400*4: exercises the pad branch
            monkeypatch.setattr(st, "_ENDS_SORT", False)
            s0, v0, w0, e0 = st.build_structure(
                pts, 0.5, capacity=cap, point_mask=pm, with_edges=True
            )
            monkeypatch.setattr(st, "_ENDS_SORT", True)
            s1, v1, w1, e1 = st.build_structure(
                pts, 0.5, capacity=cap, point_mask=pm, with_edges=True
            )
            np.testing.assert_array_equal(np.asarray(e0.ends), np.asarray(e1.ends))
            np.testing.assert_array_equal(np.asarray(s0.keys), np.asarray(s1.keys))
            np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))


def test_merge_ff_lookup_identical(rng, monkeypatch):
    # LNT_MERGE_FF=1 (run-start fill-forward verification) must equal the
    # gather-verified merge_lookup for hits, near-misses, and garbage.
    pts = jnp.asarray(_cloud(rng, n=500))
    s, _, _ = st.build_structure(pts, 0.5, capacity=2048)
    rng = np.random.default_rng(7)
    real = s.keys[: s.capacity // 2]
    shifted = real + jnp.asarray(rng.integers(-2, 3, real.shape), jnp.int32)
    garbage = jnp.asarray(rng.integers(-60, 60, (300, 3)), jnp.int32)
    # duplicated queries: multiple equal queries must all resolve alike
    q = jnp.concatenate([real, shifted, garbage, real[:50], shifted[:50]])
    monkeypatch.setattr(st, "_MERGE_FF", False)
    a = np.asarray(s.merge_lookup(q))
    monkeypatch.setattr(st, "_MERGE_FF", True)
    b = np.asarray(s.merge_lookup(q))
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, np.asarray(s.lookup(q)))


def test_blur_matches_key_oracle(rng):
    # ops.blur must equal the scalar oracle: for each occupied vertex, find
    # the vertices at key +/- the axis move and average 0.25/0.5/0.25
    # (missing -> 0), per LatticeGPU.cuh:975-1037.
    from lattice_net_tpu.lattice import ops as lops

    pts = _cloud(rng, n=300)
    s, _, _ = st.build_structure(jnp.asarray(pts), 0.5, capacity=2048)
    nbr = st.build_neighbors_same_level(s)
    nr = int(s.nr_verts)
    d = s.pos_dim
    vals = jnp.asarray(rng.normal(size=(s.capacity, 5)).astype(np.float32))

    keys_np = np.asarray(s.keys)[:nr]
    key_to_id = {tuple(k): i for i, k in enumerate(keys_np)}
    moves = st._axis_moves_np(d)
    vals_np = np.asarray(vals)

    for axis in range(d + 1):
        out = np.asarray(lops.blur(vals, nbr, axis))
        for v in range(nr):
            kp = tuple(keys_np[v] + moves[axis])
            km = tuple(keys_np[v] - moves[axis])
            vp = vals_np[key_to_id[kp]] if kp in key_to_id else 0.0
            vm = vals_np[key_to_id[km]] if km in key_to_id else 0.0
            want = 0.25 * vp + 0.5 * vals_np[v] + 0.25 * vm
            np.testing.assert_allclose(out[v], want, rtol=1e-6, atol=1e-6)

    # bilateral_blur = sequential per-axis passes
    seq = vals
    for axis in range(d + 1):
        seq = lops.blur(seq, nbr, axis)
    np.testing.assert_allclose(
        np.asarray(lops.bilateral_blur(vals, nbr))[:nr], np.asarray(seq)[:nr],
        rtol=1e-6,
    )


def test_create_splatting_mask(rng):
    from lattice_net_tpu.lattice import ops as lops

    pts = _cloud(rng, n=500)
    s, vid, _ = st.build_structure(jnp.asarray(pts), 1.5, capacity=1024)
    cap = s.capacity
    max_pts = 4
    key = jax.random.PRNGKey(0)
    mask = lops.create_splatting_mask(key, vid, max_pts, cap)
    assert mask.shape == vid.shape and mask.dtype == jnp.bool_

    vid_np = np.asarray(vid).reshape(-1)
    m_np = np.asarray(mask).reshape(-1)
    # invalid edges never survive
    assert not m_np[vid_np >= cap].any()
    counts = np.bincount(vid_np[vid_np < cap], minlength=cap)
    # edges onto under-capacity vertices always survive
    under = (vid_np < cap) & (counts[np.minimum(vid_np, cap - 1)] <= max_pts)
    assert m_np[under].all()
    # overfilled vertices keep ~max_pts in expectation (loose statistical bound)
    over_ids = np.nonzero(counts > 2 * max_pts)[0]
    if len(over_ids):
        kept = np.array([m_np[vid_np == v].sum() for v in over_ids])
        assert kept.mean() < 3 * max_pts
    # deterministic under the same key
    mask2 = lops.create_splatting_mask(key, vid, max_pts, cap)
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(mask2))
