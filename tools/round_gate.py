"""One-command on-device gate: golden parity + kernel-surface checks (+ bench).

The CPU test suite runs the Pallas kernels in interpret mode, which provably
misses real-Mosaic bugs (the tpu.iota int-only crash, the nvc=0 crash — both
caught only on hardware).  This gate is what a round runs before it ends:

    timeout 580 python tools/round_gate.py            # parity + kernel checks
    timeout 1200 python tools/round_gate.py --bench   # ... + headline bench
    timeout 1800 python tools/round_gate.py --big     # ... + 256^3 slab probe

It prints ONE summary JSON line and exits non-zero on any regression.

Checks, all on the CURRENT jax backend (the real chip under the axon tunnel):
1. replay every committed golden through the public API (tools/device_parity).
2. exercise the kernel surfaces the goldens do NOT reach, comparing the
   Pallas kernel against the independent dense XLA path on-chip:
   - non-128-aligned grid (dim 20: HW=400 -> streamed-tile fallback),
   - 128^3 protein-scale grid (Morton sort + closed-form ranges),
   - depth-slab execution (d_offset/d_count, the depth-sharded unit),
   - bf16 output lane vs the f32 parity lane,
   - binary density x bf16 output (the scalar-splat select relayout crash),
   - fp8 (e4m3) output lane (2^-3 relative bar),
   - channel-wise radii via the v5 virtual-atom expansion vs dense,
   - the int16 wire-format stream step vs the 3-array step,
   - gaussian_notrunc on the PRUNED kernel vs the separable path (r4),
   - the Pallas BACKWARD kernel vs the dense-path VJP (r4),
   - the backward bf16 (lowp) lane vs the f32 backward (r5),
   - the channel-wise backward via virtual-atom expansion vs dense (r5),
   - (--big) a 256^3 depth slab, where whole-row tiles exceed VMEM and the
     kernel must stream (hwt_rows=None path), plus the FULL 256^3
     depth-slab assembly driver (r4).
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from molvoxel_tpu.utils.timing import enable_compilation_cache  # noqa: E402

enable_compilation_cache(str(REPO / ".jax_cache"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from molvoxel_tpu.core.config import GridSpec  # noqa: E402
from molvoxel_tpu.ops.batch import voxelize_batch  # noqa: E402


def _random_case(rng, v, c, spread):
    coords = rng.uniform(-spread, spread, size=(1, v, 3)).astype(np.float32)
    weights = rng.uniform(0.0, 1.0, size=(1, v, c)).astype(np.float32)
    mask = np.ones((1, v), bool)
    mask[0, -max(v // 16, 1):] = False  # exercise padded-atom masking
    return jnp.asarray(coords), jnp.asarray(weights), jnp.asarray(mask)


def _run(coords, weights, mask, spec, *, impl, out_dtype="float32", d_offset=0, d_count=None,
         density_type="gaussian"):
    keys = jax.random.split(jax.random.PRNGKey(7), coords.shape[0])
    radii = jnp.full((coords.shape[1],), 1.0, jnp.float32)
    out = voxelize_batch(
        coords, weights, radii, mask, None, keys, 0.0,
        spec=spec, density_type=density_type, sigma=0.5, random_rotation=False,
        impl=impl, out_dtype=out_dtype, d_offset=d_offset, d_count=d_count,
    )
    return np.asarray(jax.device_get(out))


def kernel_checks(big: bool) -> dict:
    """Pallas-vs-dense on-chip comparisons over the non-golden kernel surfaces."""
    rng = np.random.default_rng(3)
    results = {}

    def record(name, err, tol):
        ok = bool(err <= tol)
        results[name] = {"max_err": float(err), "tol": tol, "ok": ok}
        print(f"{'ok  ' if ok else 'FAIL'} kernel:{name:28s} max_err={err:.2e} (tol {tol:g})", flush=True)

    # 1. non-128-aligned grid: dim 20 -> HW=400, streamed-tile fallback
    spec = GridSpec(resolution=0.5, dimension=20)
    coords, weights, mask = _random_case(rng, 128, 4, spec.width / 2)
    p = _run(coords, weights, mask, spec, impl="pallas")
    d = _run(coords, weights, mask, spec, impl="dense")
    record("dim20_unaligned", np.abs(p - d).max(), 1e-5)

    # 2. 128^3 protein-scale grid (sort + ranges active: V=512 > 128)
    spec = GridSpec(resolution=0.5, dimension=128)
    coords, weights, mask = _random_case(rng, 512, 4, spec.width / 2)
    p = _run(coords, weights, mask, spec, impl="pallas")
    d = _run(coords, weights, mask, spec, impl="dense")
    record("dim128_protein", np.abs(p - d).max(), 1e-5)

    # 3. depth-slab execution == full-grid slice (the depth-sharding unit)
    spec = GridSpec(resolution=0.5, dimension=64)
    coords, weights, mask = _random_case(rng, 128, 4, spec.width / 2)
    slab = _run(coords, weights, mask, spec, impl="pallas", d_offset=16, d_count=32)
    full = _run(coords, weights, mask, spec, impl="pallas")
    record("depth_slab_64", np.abs(slab - full[:, :, 16:48]).max(), 1e-5)

    # 4. bf16 output lane vs the f32 parity lane (quantization only)
    b16 = _run(coords, weights, mask, spec, impl="pallas", out_dtype="bfloat16")
    tol = float(max(np.abs(full).max(), 1.0)) * 2**-7
    record("bf16_output_lane", np.abs(b16.astype(np.float32) - full).max(), tol)

    # 4b. binary density x bf16 output: the lowp select used to build its
    #     0/1 density from scalar bf16 splats, which needs an i1 mask
    #     (8,128)->(16,128) splat relayout Mosaic rejects (HTTP 500, caught
    #     only on-device — round 3).  Binary counts are small integers, so
    #     bf16 is exact here and the lane must match f32 bitwise-as-floats.
    bin_f32 = _run(coords, weights, mask, spec, impl="pallas", density_type="binary")
    bin_b16 = _run(coords, weights, mask, spec, impl="pallas", density_type="binary",
                   out_dtype="bfloat16")
    tol_b = float(max(np.abs(bin_f32).max(), 1.0)) * 2**-7
    record("binary_bf16_lane", np.abs(bin_b16.astype(np.float32) - bin_f32).max(), tol_b)

    # 5. fp8 (e4m3) output lane: 3 mantissa bits -> 2^-4 relative step;
    #    values also saturate into e4m3's coarse exponent grid near 0
    f8 = _run(coords, weights, mask, spec, impl="pallas", out_dtype="float8_e4m3fn")
    tol8 = float(max(np.abs(full).max(), 1.0)) * 2**-3
    record("fp8_output_lane", np.abs(f8.astype(np.float32) - full).max(), tol8)

    # 6. channel-wise radii via virtual-atom expansion on the v5 kernel
    #    vs the independent dense channel-wise path
    spec_cw = GridSpec(resolution=0.5, dimension=32)
    coords, weights, mask = _random_case(rng, 64, 4, spec_cw.width / 2)
    keys = jax.random.split(jax.random.PRNGKey(7), 1)
    radii_c = jnp.asarray([0.9, 1.1, 1.3, 1.6], jnp.float32)

    def run_cw(impl):
        return np.asarray(jax.device_get(voxelize_batch(
            coords, weights, radii_c, mask, None, keys, 0.0,
            spec=spec_cw, density_type="gaussian", sigma=0.5, random_rotation=False,
            impl=impl, channelwise=True,
        )))

    record("channelwise_expansion", np.abs(run_cw("pallas") - run_cw("dense")).max(), 1e-5)

    # 6b. separable channel-wise batch lane (the gaussian_notrunc x
    #     channel-wise route, ops/separable.py:119) vs the independent dense
    #     channel-wise path — pure-XLA on-chip, not reachable by any golden
    from molvoxel_tpu.ops.dense import voxelize_dense_channelwise as _dense_cw
    from molvoxel_tpu.ops.separable import voxelize_separable_batch_channelwise

    s_cw = np.asarray(voxelize_separable_batch_channelwise(
        coords, weights, radii_c, spec=spec_cw, sigma=0.5, mask=mask,
    ))
    d_cw = np.asarray(_dense_cw(
        coords[0], weights[0], radii_c, spec=spec_cw, density_type="gaussian_notrunc",
        sigma=0.5, mask=mask[0],
    ))
    record("separable_channelwise", np.abs(s_cw[0] - d_cw).max(), 2e-5)

    # 7. int16 wire-format stream step vs the 3-array step (quantization only)
    from molvoxel_tpu.data.feed import pack_wire, wire_scale
    from molvoxel_tpu.data.pipeline import PaddedBatch
    from molvoxel_tpu.parallel.stream import _fused_scan_step, _fused_scan_step_wire

    spec_w = GridSpec(resolution=0.5, dimension=32)
    bw_, vpw = 8, 64
    wrng = np.random.default_rng(5)
    wcoords = wrng.uniform(-6, 6, (bw_, vpw, 3)).astype(np.float32)
    wtypes = wrng.integers(0, 4, (bw_, vpw)).astype(np.int8)
    wtypes[:, -8:] = -1
    kwargs = dict(chunk=4, num_channels=4, radii_value=1.0, random_translation=0.0,
                  spec=spec_w, density_type="gaussian", sigma=0.5, random_rotation=False,
                  out_dtype="float32")
    key = jax.random.PRNGKey(3)
    plain = float(_fused_scan_step(
        jnp.asarray(wcoords), jnp.asarray(wtypes), jnp.zeros((bw_, 3), jnp.float32),
        key, jnp.int32(0), **kwargs))
    scale = wire_scale(spec_w)
    batch = PaddedBatch(wcoords, None, wtypes >= 0, None, None,
                        np.full((bw_,), vpw, np.int32), types=wtypes, num_channels=4)
    wired = float(_fused_scan_step_wire(
        jnp.asarray(pack_wire(batch, scale)), key, jnp.int32(0),
        **kwargs, inv_scale=1.0 / scale))
    record("wire_format_step", abs(plain - wired), 1e-3 * max(abs(plain), 1.0))

    # 8. notrunc on the PRUNED kernel (r4: underflow-radius thresh) vs the
    #    independent separable path, at a scale where routing picks pallas
    from molvoxel_tpu.ops.pallas_deposit import voxelize_pallas_batch
    from molvoxel_tpu.ops.separable import voxelize_separable_batch

    spec_nt = GridSpec(resolution=0.5, dimension=64)
    coords, weights, mask = _random_case(rng, 512, 4, spec_nt.width / 2)
    radii_v = jnp.ones((512,), jnp.float32)
    p_nt = np.asarray(voxelize_pallas_batch(
        coords, weights, radii_v, spec=spec_nt, density_type="gaussian_notrunc",
        sigma=0.5, mask=mask,
    ))
    s_nt = np.asarray(voxelize_separable_batch(
        coords, weights, radii_v, spec=spec_nt, sigma=0.5, mask=mask,
    ))
    record("notrunc_pruned_kernel", np.abs(p_nt - s_nt).max(), 2e-5)

    # 9. Pallas BACKWARD kernel vs the dense-path VJP, on-chip
    from molvoxel_tpu.ops.dense import voxelize_dense
    from molvoxel_tpu.ops.pallas_deposit import voxelize_pallas_bwd_batch

    spec_b = GridSpec(resolution=0.5, dimension=32)
    coords, weights, mask = _random_case(rng, 256, 4, spec_b.width / 2)
    radii_v = jnp.ones((256,), jnp.float32)
    ct = jnp.asarray(rng.normal(size=(1, 4, 32, 32, 32)).astype(np.float32))
    dc, dw, dr = voxelize_pallas_bwd_batch(
        coords, weights, radii_v, ct, spec=spec_b, density_type="gaussian",
        sigma=0.5, mask=mask,
    )

    def fdense(c, w, r):
        return voxelize_dense(c, w, r, spec=spec_b, density_type="gaussian", sigma=0.5,
                              mask=mask[0])

    _, vjp = jax.vjp(fdense, coords[0], weights[0], radii_v)
    ec, ew, er = vjp(ct[0])
    err_b = max(
        np.abs(np.asarray(dc[0]) - np.asarray(ec)).max(),
        np.abs(np.asarray(dw[0]) - np.asarray(ew)).max(),
        np.abs(np.asarray(dr) - np.asarray(er)).max(),
    )
    record("backward_kernel", err_b, 5e-3)  # grads scale with cotangent magnitude

    # 9b. backward bf16 (lowp) lane vs the f32 backward kernel (r5): bf16
    #     cotangent block + single-pass matmuls must track within ~2^-8 of
    #     the gradient scale
    dcl, dwl, drl = voxelize_pallas_bwd_batch(
        coords, weights, radii_v, ct, spec=spec_b, density_type="gaussian",
        sigma=0.5, mask=mask, lowp=True,
    )
    gscale = max(
        float(np.abs(np.asarray(dc)).max()),
        float(np.abs(np.asarray(dw)).max()),
        float(np.abs(np.asarray(dr)).max()),
        1.0,
    )
    err_l = max(
        np.abs(np.asarray(dcl) - np.asarray(dc)).max(),
        np.abs(np.asarray(dwl) - np.asarray(dw)).max(),
        np.abs(np.asarray(drl) - np.asarray(dr)).max(),
    )
    record("backward_lowp_lane", err_l, 3e-2 * gscale)

    # 9b2. backward on a depth SLAB (d_offset/d_count — the depth-sharded
    #      training unit): slab cotangent in, gradients must match the dense
    #      slab VJP
    dcs, dws, drs = voxelize_pallas_bwd_batch(
        coords, weights, radii_v, ct[:, :, 8:24], spec=spec_b, density_type="gaussian",
        sigma=0.5, mask=mask, d_offset=8, d_count=16,
    )

    def fdense_slab(c, w, r):
        return voxelize_dense(c, w, r, spec=spec_b, density_type="gaussian", sigma=0.5,
                              mask=mask[0], d_offset=8, d_count=16)

    _, vjp_s = jax.vjp(fdense_slab, coords[0], weights[0], radii_v)
    ecs, ews, ers = vjp_s(ct[0, :, 8:24])
    err_s = max(
        np.abs(np.asarray(dcs[0]) - np.asarray(ecs)).max(),
        np.abs(np.asarray(dws[0]) - np.asarray(ews)).max(),
        np.abs(np.asarray(drs) - np.asarray(ers)).max(),
    )
    record("backward_depth_slab", err_s, 5e-3)

    # 9c. channel-wise backward through the virtual-atom expansion (r5)
    #     vs the dense channel-wise VJP
    from molvoxel_tpu.ops.dense import voxelize_dense_channelwise
    from molvoxel_tpu.ops.pallas_deposit import voxelize_pallas_bwd_batch_channelwise

    coords_cw, weights_cw, mask_cw = _random_case(rng, 256, 4, spec_b.width / 2)
    radii_cw = jnp.asarray([0.9, 1.1, 1.3, 1.6], jnp.float32)
    dcc, dwc, drc = voxelize_pallas_bwd_batch_channelwise(
        coords_cw, weights_cw, radii_cw, ct, spec=spec_b, density_type="gaussian",
        sigma=0.5, mask=mask_cw,
    )

    def fdense_cw(c, w, r):
        return voxelize_dense_channelwise(
            c, w, r, spec=spec_b, density_type="gaussian", sigma=0.5, mask=mask_cw[0]
        )

    _, vjp_cw = jax.vjp(fdense_cw, coords_cw[0], weights_cw[0], radii_cw)
    ecc, ewc, erc = vjp_cw(ct[0])
    err_cw = max(
        np.abs(np.asarray(dcc[0]) - np.asarray(ecc)).max(),
        np.abs(np.asarray(dwc[0]) - np.asarray(ewc)).max(),
        np.abs(np.asarray(drc) - np.asarray(erc)).max(),
    )
    record("backward_channelwise", err_cw, 5e-3)

    if big:
        # 5. 256^3 depth slab: whole-row tiles exceed VMEM -> streamed path
        spec = GridSpec(resolution=0.25, dimension=256)
        coords, weights, mask = _random_case(rng, 256, 4, spec.width / 2)
        p = _run(coords, weights, mask, spec, impl="pallas", d_offset=96, d_count=64)
        d = _run(coords, weights, mask, spec, impl="dense", d_offset=96, d_count=64)
        record("dim256_slab_streamed", np.abs(p - d).max(), 1e-5)

        # 10. FULL 256^3 assembly from depth slabs (ops/batch.py
        #     voxelize_batch_sliced): every assembled slab must equal the
        #     direct d_offset/d_count call bit-for-bit
        from molvoxel_tpu.ops.batch import pick_slab_depth, voxelize_batch_sliced

        slab = pick_slab_depth(spec, 4)
        keys = jax.random.split(jax.random.PRNGKey(7), 1)
        radii_v = jnp.full((256,), 1.0, jnp.float32)
        assembled = voxelize_batch_sliced(
            coords, weights, radii_v, mask, None, keys, 0.0,
            spec=spec, slab_depth=slab, density_type="gaussian", sigma=0.5,
            out_dtype="bfloat16",
        )
        probe_off = 2 * slab
        direct = _run(coords, weights, mask, spec, impl="pallas",
                      d_offset=probe_off, d_count=slab, out_dtype="bfloat16")
        err = np.abs(
            assembled[:, :, probe_off : probe_off + slab].astype(np.float32)
            - direct.astype(np.float32)
        ).max()
        record("dim256_full_assembly", err, 0.0)

    return results


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bench", action="store_true", help="also run bench.py and fold in its JSON")
    ap.add_argument("--big", action="store_true", help="include the 256^3 streamed-slab check")
    ap.add_argument("--skip-parity", action="store_true")
    args = ap.parse_args()

    t0 = time.time()
    summary: dict = {"backend": jax.default_backend()}

    if not args.skip_parity:
        from tools.device_parity import main as parity_main

        rc = parity_main()
        summary["parity_ok"] = rc == 0
    else:
        summary["parity_ok"] = None

    checks = kernel_checks(args.big)
    summary["kernel_checks_ok"] = all(c["ok"] for c in checks.values())
    summary["kernel_checks"] = {k: round(v["max_err"], 9) for k, v in checks.items()}

    if args.bench:
        out = subprocess.run(
            [sys.executable, str(REPO / "bench.py")], capture_output=True, text=True, timeout=900
        )
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else "{}"
        try:
            summary["bench"] = json.loads(line)
        except json.JSONDecodeError:
            summary["bench"] = {"error": line[:200]}

    summary["ok"] = bool(summary.get("parity_ok") is not False and summary["kernel_checks_ok"])
    summary["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(summary))
    return 0 if summary["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
