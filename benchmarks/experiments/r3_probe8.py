"""r3_probe8: gaussian_notrunc — separable einsum vs range-pruned pallas.

The separable path has no work pruning (every atom against every voxel on
the MXU); the pallas kernel with the notrunc effective radius
(pallas_deposit.NOTRUNC_EPS) prunes planes/chunks like the exact path.
Where does each win?  Witness-read protocol, random rigid transforms.
"""

import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from molvoxel_tpu.utils.timing import enable_compilation_cache

enable_compilation_cache(".jax_cache")

import jax
import jax.numpy as jnp

from molvoxel_tpu.core.config import GridSpec, small_atom_bucket
from molvoxel_tpu.core.transform import do_random_transform
from molvoxel_tpu.data import read_pdb, read_sdf
from molvoxel_tpu.ops.pallas_deposit import voxelize_pallas_batch
from molvoxel_tpu.ops.separable import voxelize_separable_batch

prot = read_pdb("/root/reference/test/10gs/10gs_protein_nowater.pdb").without_hydrogens()
prot_types = np.asarray([{"C": 0, "N": 1, "O": 2, "S": 3}.get(s, 3) for s in prot.symbols])
prot_feats = np.eye(4, dtype=np.float32)[prot_types]
lig = read_sdf("/root/reference/test/10gs/10gs_ligand.sdf")
lig_feats = np.eye(4, dtype=np.float32)[
    np.asarray([{"C": 0, "N": 1, "O": 2, "S": 3}.get(s, 3) for s in lig.symbols])
]


def pad(coords, feats, batch):
    v, c = feats.shape
    vp = small_atom_bucket(v)
    bc = np.zeros((batch, vp, 3), np.float32)
    bw = np.zeros((batch, vp, c), np.float32)
    bc[:, :v] = coords[None] - coords.mean(0)
    bw[:, :v] = feats[None]
    mask = np.zeros((batch, vp), bool)
    mask[:, :v] = True
    return jnp.asarray(bc), jnp.asarray(bw), jnp.asarray(mask), vp


def measure(name, coords, feats, dim, batch, impl, out_dtype="bfloat16", iters=17, sigma=0.5):
    spec = GridSpec(0.5, dim)
    bc, bw, mask, vp = pad(coords, feats, batch)
    radii = jnp.ones((vp,), jnp.float32)

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(key, n):
        def body(i, acc):
            keys = jax.random.split(jax.random.fold_in(key, i), batch)
            crd = jax.vmap(lambda k, c: do_random_transform(k, c, None, 0.5, True))(keys, bc)
            if impl == "pallas":
                out = voxelize_pallas_batch(
                    crd, bw, radii, spec=spec, density_type="gaussian_notrunc",
                    sigma=sigma, mask=mask, out_dtype=out_dtype,
                )
            else:
                out = voxelize_separable_batch(
                    crd, bw, radii, spec=spec, sigma=sigma, mask=mask,
                    materialize=True, out_dtype=out_dtype,
                )
            return acc + jnp.sum(out[:1].astype(jnp.float32)) * 1e-6
        return jax.lax.fori_loop(0, n, body, 0.0)

    def run(n):
        t0 = time.time()
        float(loop(jax.random.PRNGKey(n), n))
        return time.time() - t0

    run(1)
    run(iters)
    base = min(run(1) for _ in range(3))
    best = min(run(iters) for _ in range(3))
    us = (best - base) / ((iters - 1) * batch) * 1e6
    print(f"{name:34s} {impl:9s} {us:9.1f} us/mol  {1e6/us:9.0f} mols/s", flush=True)


for impl in ("separable", "pallas"):
    measure("protein 48^3 (3.3k atoms)", prot.coords, prot_feats, 48, 8, impl)
for impl in ("separable", "pallas"):
    measure("protein 96^3 (3.3k atoms)", prot.coords, prot_feats, 96, 4, impl)
for impl in ("separable", "pallas"):
    measure("protein 128^3 (3.3k atoms)", prot.coords, prot_feats, 128, 4, impl)
for impl in ("separable", "pallas"):
    measure("ligand 128^3 (61 atoms)", lig.coords, lig_feats, 128, 8, impl, iters=33)

# sharp-gaussian regime: r_eff = 6.44*sigma*r shrinks with sigma, so the
# pruned kernel should win where the separable cost is sigma-independent
print("--- sigma=0.25 ---", flush=True)

for impl in ("separable", "pallas"):
    measure("protein 96^3 sigma=0.25", prot.coords, prot_feats, 96, 4, impl, sigma=0.25)
for impl in ("separable", "pallas"):
    measure("protein 128^3 sigma=0.25", prot.coords, prot_feats, 128, 4, impl, sigma=0.25)
