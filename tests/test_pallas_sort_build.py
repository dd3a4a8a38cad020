"""LNT_PALLAS_SORT=1 hierarchy build must be bit-identical to the default.

The Pallas bitonic network claims drop-in equivalence with
``lax.sort(ops, num_keys=len(ops))`` at every eligible build sort
(full-lex-equivalent call sites, fenced via ``unique_payload=True`` in
``structure._lex_sort``).  The flag is read ONCE at import into a module
constant, so the A/B must run in a subprocess.
"""

import json
import os
import subprocess
import sys

SCRIPT = r"""
import json, os, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from lattice_net_tpu.lattice import structure as st

rng = np.random.default_rng(0)
pos = jnp.asarray(rng.normal(size=(1500, 3)).astype(np.float32) * 8.0)
h = jax.jit(lambda p: st.build_hierarchy(p, 0.6, 2, (4096, 2048, 512)))(pos)
digest = {}
for name, leaf in zip(
    ("splat_idx", "splat_w", "keys0", "nv", "nb0", "nbc0", "edgev", "edgep"),
    (
        h.splat_idx,
        h.splat_weights,
        h.structures[0].keys,
        jnp.stack([s.nr_verts for s in h.structures]),
        h.neighbors_same[0],
        h.neighbors_coarsen[0],
        h.edges.vertex,
        h.edges.perm,
    ),
):
    arr = np.asarray(leaf)
    digest[name] = [int(np.sum(arr.astype(np.int64))) if arr.dtype.kind in "iu"
                    else float(np.sum(arr.astype(np.float64))), list(arr.shape)]
print(json.dumps(digest))
"""


def _run(pallas: bool):
    env = dict(os.environ)
    env["LNT_PALLAS_SORT"] = "1" if pallas else "0"
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=1200,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_pallas_sort_build_bit_identical():
    base = _run(pallas=False)
    fast = _run(pallas=True)
    assert base == fast, f"default={base}\npallas={fast}"
