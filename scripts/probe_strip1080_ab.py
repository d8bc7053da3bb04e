"""Round-5 probe: fused quality kernel strip-height A/B at 1080p/1440p/4K.

The 4K strip-16 -> strip-32 A/B (probes/WIDE_FUSED_r05.json: 83.7 -> 76.7 ms
per 16-frame chunk) showed halved grid-cell count wins once the scoped-VMEM
budget is raised — contradicting the round-4 "taller strips will NOT pay"
note, which predates the 64 MB unlock. This probe extends the sweep to
strips 48/64 at ALL production widths (the SSIM pooling geometry was
generalized for nbr_y/nbr_c > 8 — quality_pallas._ssim_row_band_y/_c
strides + _ssim_from_windows static slice heights).

Per resolution, times the production fused composition (fused scale-0
kernel + VIF tail + ADM) at the headline chunk size, strips {32 default,
48, 64}, depth-1 fetch pipelining like the bench loops; plus an on-device
numeric check of strip 48/64 vs 32 at b=2.

Run (background; the first fetch can stall minutes):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_strip1080_ab.py
"""

import functools
import json
import time
import traceback

import numpy as np

import jax
import jax.numpy as jnp

from rtvqa_tpu.obs.jaxcache import enable_persistent_cache

enable_persistent_cache()

T0 = time.perf_counter()
RESULTS: dict = {}
REPS = 5


def note(msg):
    print(f"[probe] {msg} (+{time.perf_counter() - T0:.1f}s)", flush=True)


def main():
    from bench import device_frame_fns
    from rtvqa_tpu.kernels.adm_pallas import adm_features_pallas
    from rtvqa_tpu.kernels.quality_pallas import quality_fused_pallas
    from rtvqa_tpu.kernels.vif_pallas import vif_tail_pallas

    note(f"backend={jax.default_backend()} devices={jax.devices()}")
    np.asarray(jax.jit(lambda: jnp.zeros(8, jnp.float32))())
    note("first-fetch sync done")

    @functools.partial(jax.jit, static_argnames=("strip",))
    def chunk(ry, ru, rv, dy, du, dv, pb, strip=None):
        h, w = ry.shape[-2], ry.shape[-1]
        fq = quality_fused_pallas(
            ry, ru, rv, dy, du, dv, pb, crop=False, wide_strip=strip
        )
        hs, ws = (h + 1) // 2, (w + 1) // 2
        tail = vif_tail_pallas(fq["dec_ref"], fq["dec_dis"], h=hs, w=ws)
        adm = adm_features_pallas(ry, dy)
        packed = jnp.stack([
            fq["vif_scale0"], tail["vif_scale1"], tail["vif_scale2"],
            tail["vif_scale3"], adm["adm2"], fq["sse_y"],
            fq["ssim_y_sum"], fq["sad_sum"],
        ])
        return packed, fq["blur_carry"]

    for label, h, w, nq in (
        ("1080p", 1080, 1920, 128),
        ("1440p", 1440, 2560, 36),
        ("4k", 2160, 3840, 16),
    ):
        note(f"=== {label}: {w}x{h}, chunk {nq} ===")
        gen, distort = device_frame_fns(nq, h, w)
        ry, ru, rv = gen(0)
        dy = distort(ry, 1)
        np.asarray(dy[0, 0, :8])
        note(f"{label} inputs staged")

        fill = jax.jit(lambda c: jnp.full((h, w), c, jnp.float32))
        blurs = [fill(np.float32(1e-3 * (r + 1))) for r in range(REPS + 1)]

        for strip in (None, 48, 64):
            name = f"q/{label}/s{strip or 32}"
            try:
                disp = lambda b: chunk(ry, ru, rv, dy, ru, rv, b, strip=strip)
                np.asarray(disp(blurs[-1])[0])  # compile + warm
                note(f"{name} compiled")
                times = []
                prev = None
                t_all = time.perf_counter()
                for rep in range(REPS):
                    t0 = time.perf_counter()
                    out = disp(blurs[rep])[0]
                    if prev is not None:
                        np.asarray(prev)
                    prev = out
                    times.append(time.perf_counter() - t0)
                np.asarray(prev)
                total = time.perf_counter() - t_all
                RESULTS[name] = {
                    "pipelined_s_per_rep": round(total / REPS, 4),
                    "chunk": nq,
                }
                note(f"{name}: {total / REPS:.4f} s/rep ({nq} frames)")
            except Exception as e:
                RESULTS[name] = {"error": f"{type(e).__name__}: {e}"}
                note(f"{name} FAILED: {e}")
                traceback.print_exc()

        # numeric check at b=2 vs the default strip
        try:
            args2 = (ry[:2], ru[:2], rv[:2], dy[:2], ru[:2], rv[:2], blurs[0])
            base = np.asarray(chunk(*args2)[0])
            errs = {}
            for strip in (48, 64):
                got = np.asarray(chunk(*args2, strip=strip)[0])
                errs[f"s{strip}"] = float(
                    np.max(np.abs(got - base) / (np.abs(base) + 1e-9))
                )
            RESULTS[f"eq/{label}"] = errs
            note(f"eq/{label}: {errs}")
        except Exception as e:
            RESULTS[f"eq/{label}"] = {"error": str(e)}
            note(f"eq/{label} FAILED: {e}")

    with open("probes/STRIP_AB_r05.json", "w") as f:
        json.dump(RESULTS, f, indent=1)
    note("wrote probes/STRIP_AB_r05.json")


if __name__ == "__main__":
    main()
