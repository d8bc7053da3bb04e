"""Round-5 probe: the fused quality kernel + wide ADM configs at 1440p/4K.

VERDICT r4 next #2: until round 5, ``_chunk_fused_tpu`` routed w > 2048 to
the round-2 composition (XLA program A + per-scale Pallas VIF/ADM) because
the fused kernel's strip-16 config measured 17.0 MB of scoped VMEM at 3840
lanes — over Mosaic's DEFAULT 16 MB budget. Round 4b established the budget
is raisable (vif_tail raw runs at 32 MB; the chip has 128 MB), so this probe
answers, ON DEVICE and within one session (A/B rule, CLAUDE.md):

  q/<res>/old      — the round-4 composition (program A + Pallas VIF/ADM)
  q/<res>/fused    — _chunk_fused_tpu with the VIF tail (new default path)
  q/<res>/chain    — _chunk_fused_tpu with the per-scale VIF chain
  q/4k/fused_s32   — wide_strip=32 (half the grid cells, ~2x scoped VMEM)
  adm/4k/*         — standalone ADM: old (strip 8 + f32 staging) vs new
                     (strip 24 + raw-int8 @ 64 MB) vs forced tail
  plus minimal numeric checks vs the XLA oracles at b=2.

Run (tmux; the first fetch can stall minutes):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_wide_fused.py
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
REPS = 3


def note(msg):
    print(f"[probe] {msg} (+{time.perf_counter() - T0:.1f}s)", flush=True)


def phase(name):
    def deco(fn):
        def run(*a, **k):
            try:
                out = fn(*a, **k)
                RESULTS[name] = out
                note(f"{name}: {out}")
            except Exception as e:
                RESULTS[name] = {"error": f"{type(e).__name__}: {e}"}
                note(f"{name} FAILED: {e}")
                traceback.print_exc()
        return run
    return deco


def time_reps(disp, variants, n_outputs_fetch=1):
    """Median of REPS timed dispatch+fetch rounds; ``variants`` are distinct
    tiny inputs per rep (de-memoization)."""
    np.asarray(disp(variants[-1])[0] if n_outputs_fetch else disp(variants[-1]))
    times = []
    for rep in range(REPS):
        t0 = time.perf_counter()
        out = disp(variants[rep])
        np.asarray(out[0] if isinstance(out, tuple) else out)
        times.append(time.perf_counter() - t0)
    return times


def main():
    from bench import device_frame_fns
    from rtvqa_tpu.metrics.full_reference import (
        _chunk_fused_tpu, _program_a, _program_b, auto_chunk,
    )

    note(f"backend={jax.default_backend()} devices={jax.devices()}")
    np.asarray(jax.jit(lambda: jnp.zeros(8, jnp.float32))())
    note("first-fetch sync done")

    @jax.jit
    def old_chunk(ry, ru, rv, dy, du, dv, pb):
        pa, blur = _program_a(ry, ru, rv, dy, du, dv, pb, jnp.bool_(True))
        pbk = _program_b(ry, dy)
        return jnp.concatenate([pa, pbk], axis=0), blur

    @functools.partial(
        jax.jit, static_argnames=("vif_tail", "adm_tail", "wide_strip")
    )
    def new_chunk(ry, ru, rv, dy, du, dv, pb, vif_tail=None, adm_tail=None,
                  wide_strip=None):
        if wide_strip is not None:
            # thread wide_strip through a local copy of the fused body
            from rtvqa_tpu.kernels.adm_pallas import adm_features_pallas
            from rtvqa_tpu.kernels.quality_pallas import quality_fused_pallas
            from rtvqa_tpu.kernels.vif_pallas import vif_tail_pallas

            h, w = ry.shape[-2], ry.shape[-1]
            fq = quality_fused_pallas(
                ry, ru, rv, dy, du, dv, pb, crop=False,
                wide_strip=wide_strip,
            )
            hs, ws = (h + 1) // 2, (w + 1) // 2
            tail = vif_tail_pallas(fq["dec_ref"], fq["dec_dis"], h=hs, w=ws)
            adm = adm_features_pallas(ry, dy)
            return (fq["vif_scale0"] + tail["vif_scale1"]
                    + adm["adm2"] + fq["sse_y"] + fq["sad_sum"]), fq["blur_carry"]
        return _chunk_fused_tpu(
            ry, ru, rv, dy, du, dv, pb, jnp.bool_(True), None, None, None,
            vif_tail=vif_tail, adm_tail=adm_tail,
        )

    for label, h, w in (("4k", 2160, 3840), ("1440p", 1440, 2560)):
        chunk = auto_chunk(w, h)
        note(f"=== {label}: {w}x{h}, chunk {chunk} ===")
        gen, distort = device_frame_fns(chunk, h, w)
        ry, ru, rv = gen(0)
        dy = distort(ry, 1)
        np.asarray(dy[0, 0, :8])
        note(f"{label} inputs staged")

        fill = jax.jit(lambda c: jnp.full((h, w), c, jnp.float32))
        blurs = [fill(np.float32(1e-3 * (r + 1))) for r in range(REPS + 1)]

        @phase(f"q/{label}/old")
        def _(blurs=blurs, args=(ry, ru, rv, dy, ru, rv)):
            return time_reps(lambda b: old_chunk(*args, b), blurs)

        _()

        @phase(f"q/{label}/fused")
        def _(blurs=blurs, args=(ry, ru, rv, dy, ru, rv)):
            return time_reps(lambda b: new_chunk(*args, b), blurs)

        _()

        @phase(f"q/{label}/chain")
        def _(blurs=blurs, args=(ry, ru, rv, dy, ru, rv)):
            return time_reps(
                lambda b: new_chunk(*args, b, vif_tail=False), blurs
            )

        _()

        if label == "4k":
            @phase("q/4k/fused_s32")
            def _(blurs=blurs, args=(ry, ru, rv, dy, ru, rv)):
                return time_reps(
                    lambda b: new_chunk(*args, b, wide_strip=32), blurs
                )

            _()

            # --- standalone ADM variants (b = chunk) -----------------------
            from rtvqa_tpu.kernels.adm_pallas import (
                adm_finalize, adm_scale_pallas, adm_tail_pallas,
            )

            @functools.partial(
                jax.jit, static_argnames=("wide_strip", "wide_raw", "tail")
            )
            def adm_var(ry, dy, salt, wide_strip=None, wide_raw=True,
                        tail=False):
                h_, w_ = ry.shape[-2], ry.shape[-1]
                h2, w2 = (h_ + 1) // 2, (w_ + 1) // 2
                num, den, o, t = adm_scale_pallas(
                    ry, dy, 0, h=h_, w=w_, crop=False,
                    wide_strip=wide_strip, wide_raw=wide_raw,
                )
                if tail:
                    tl = adm_tail_pallas(o, t, h=h2, w=w2)
                    num = num + tl["num"]
                    den = den + tl["den"]
                else:
                    hs, ws = h2, w2
                    for scale in (1, 2, 3):
                        n_s, d_s, o, t = adm_scale_pallas(
                            o, t, scale, h=hs, w=ws, crop=False,
                            wide_strip=wide_strip, wide_raw=wide_raw,
                        )
                        hs, ws = (hs + 1) // 2, (ws + 1) // 2
                        num = num + n_s
                        den = den + d_s
                return adm_finalize(num, den, ry.shape) + salt

            salts = [jnp.float32(1e-6 * r) for r in range(REPS + 1)]
            for name, kw in (
                ("adm/4k/old_s8_f32", dict(wide_strip=8, wide_raw=False)),
                ("adm/4k/new_s24_raw", dict()),
                ("adm/4k/new_tail", dict(tail=True)),
            ):
                @phase(name)
                def _(kw=kw):
                    return time_reps(
                        lambda s: adm_var(ry, dy, s, **kw), salts
                    )

                _()

    # --- numeric checks at b=2 (4K) ------------------------------------------
    from rtvqa_tpu.kernels.adm_pallas import adm_features_pallas
    from rtvqa_tpu.kernels.quality_pallas import quality_fused_pallas
    from rtvqa_tpu.kernels.vif_pallas import vif_tail_pallas
    from rtvqa_tpu.metrics.quality import psnr_frames, ssim_frames
    from rtvqa_tpu.vmaf.adm import adm_features
    from rtvqa_tpu.vmaf.filters import filter1d_sep
    from rtvqa_tpu.vmaf.motion import FILTER_5
    from rtvqa_tpu.vmaf.vif import vif_features

    h, w, b = 2160, 3840, 2
    rng = np.random.default_rng(7)
    ry = rng.integers(0, 256, (b, h, w), np.uint8)
    dy = np.clip(ry.astype(np.int16)
                 + rng.integers(-6, 7, ry.shape, dtype=np.int16),
                 0, 255).astype(np.uint8)
    ru = rng.integers(0, 256, (b, h // 2, w // 2), np.uint8)
    du = np.clip(ru.astype(np.int16)
                 + rng.integers(-6, 7, ru.shape, dtype=np.int16),
                 0, 255).astype(np.uint8)
    pb = np.asarray(filter1d_sep(
        rng.integers(0, 256, (h, w)).astype(np.float32), FILTER_5))
    ryq, dyq = jax.device_put(ry), jax.device_put(dy)

    def rel(a, b):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        return float(np.max(np.abs(a - b) / np.maximum(np.abs(b), 1e-6)))

    @phase("check/4k")
    def _():
        out = {}
        vx = {k: np.asarray(v) for k, v in
              vif_features(ry.astype(np.float32), dy.astype(np.float32)).items()}
        fq = quality_fused_pallas(ryq, ru, ru, dyq, du, du, pb, fast3=False,
                                  crop=False)
        out["vif0"] = rel(fq["vif_scale0"], vx["vif_scale0"])
        p = psnr_frames(ry, ru, ru, dy, du, du)
        out["mse_y"] = rel(np.asarray(fq["sse_y"]) / (h * w), p["mse_y"])
        s = ssim_frames(ry, ru, ru, dy, du, du)
        out["ssim_y"] = rel(
            np.asarray(fq["ssim_y_sum"]) / ((h // 4 - 1) * (w // 4 - 1)),
            s["ssim_y"])
        blurred = np.asarray(filter1d_sep(ry.astype(np.float32), FILTER_5))
        prevs = np.concatenate([pb[None], blurred[:-1]])
        out["sad"] = rel(np.asarray(fq["sad_sum"]) / (h * w),
                         np.abs(blurred - prevs).mean(axis=(-2, -1)))
        hs, ws = (h + 1) // 2, (w + 1) // 2
        tail = vif_tail_pallas(fq["dec_ref"], fq["dec_dis"], fast3=False,
                               h=hs, w=ws)
        for k in (1, 2, 3):
            out[f"vif{k}"] = rel(tail[f"vif_scale{k}"], vx[f"vif_scale{k}"])
        ax = adm_features(ry.astype(np.float32), dy.astype(np.float32))
        ap = adm_features_pallas(ryq, dyq)
        out["adm2"] = rel(ap["adm2"], ax["adm2"])
        return out

    _()

    print("PROBE_JSON " + json.dumps(RESULTS), flush=True)


if __name__ == "__main__":
    main()
