"""r4 probe: why are fp8 grids SLOWER than bf16 on a write-bound path?

VERDICT r3 weak #3: fp8 e4m3 output is half the bytes of bf16 yet measures
slower (9.4 vs 8.9 us/mol).  This isolates the two suspects with a
store-only Pallas microkernel:

  A. out-block DMA rate per dtype (direct store of a VMEM tile), and
  B. the cast epilogue cost (f32 VMEM scratch -> cast -> store, the
     production cast-store shape, pallas_deposit._kernel_v5 cast mode).

Grid = many steps, each owning one (8, 64, 1024) out tile (the production
ligand tile); per-step time * steps ~= bytes / rate.
"""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent.parent
sys.path.insert(0, str(REPO))

from molvoxel_tpu.utils.timing import enable_compilation_cache  # noqa: E402

enable_compilation_cache(str(REPO / ".jax_cache"))

import functools  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from molvoxel_tpu.utils.timing import measure_device_fn  # noqa: E402

CT, DL, HWT = 8, 64, 1024
STEPS = 64


def store_kernel(x_ref, o_ref, acc_ref=None, *, odt, cast, work_loops):
    # simulate the production epilogue: accumulate in f32 scratch (cast mode)
    # or straight into the out block, then one full-tile store
    if cast:
        acc_ref[...] = x_ref[0].astype(jnp.float32) * 1.000001
        for _ in range(work_loops):
            acc_ref[...] = acc_ref[...] * 1.000001
        o_ref[0] = acc_ref[...].astype(odt)
    else:
        v = x_ref[0].astype(jnp.float32) * 1.000001
        for _ in range(work_loops):
            v = v * 1.000001
        o_ref[0] = v.astype(odt)


def run(out_dtype: str, cast: bool, work_loops: int = 0) -> float:
    odt = jnp.dtype(out_dtype)
    kernel = functools.partial(store_kernel, odt=odt, cast=cast, work_loops=work_loops)
    scratch = [pltpu.VMEM((CT, DL, HWT), jnp.float32)] if cast else []

    x = jnp.ones((1, CT, DL, HWT), jnp.bfloat16)

    def step(key):
        seed = jax.random.randint(key, (), 0, 3).astype(jnp.bfloat16)
        out = pl.pallas_call(
            kernel,
            grid=(STEPS,),
            in_specs=[pl.BlockSpec((1, CT, DL, HWT), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, CT, DL, HWT), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((STEPS, CT, DL, HWT), odt),
            scratch_shapes=scratch,
        )(x + seed)
        return out[:1].astype(jnp.float32)  # witness read

    per_call = measure_device_fn(step, iters=33)
    bytes_written = STEPS * CT * DL * HWT * odt.itemsize
    return per_call, bytes_written / per_call / 1e9


def main():
    for out_dtype in ("float32", "bfloat16", "float8_e4m3fn"):
        for cast in (False, True):
            per, rate = run(out_dtype, cast)
            print(f"{out_dtype:14s} cast={int(cast)}  {per*1e6:8.1f} us/call  {rate:7.1f} GB/s", flush=True)
    # does VPU work hide under the store, per dtype?  (cast mode, 8 extra passes)
    for out_dtype in ("bfloat16", "float8_e4m3fn"):
        per, rate = run(out_dtype, True, work_loops=8)
        print(f"{out_dtype:14s} cast=1 +8vpu {per*1e6:8.1f} us/call  {rate:7.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
