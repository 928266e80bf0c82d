"""Component-level timing of the DSP front end on the real chip.

Times (device scan chains, two-length difference):
  frame      : frame_waveform XLA pre-pass (B*T, n_fft) materialisation
  kern_part  : partial-tile Pallas kernel + HBM sum + log (round-2 path)
  kern_res   : weights-resident Pallas kernel, fused accumulate+log
  logmel     : full log_mel_spectrogram (kernel + edge-gather)
  pipeline   : full make_input_pipeline (both pathway layouts + channel dim)

Usage: ASF_BENCH_BATCH=128 python scripts/bench_dsp_v2.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from asf_tpu.utils.jax_setup import apply_platform_env, enable_compilation_cache

apply_platform_env()
enable_compilation_cache()

BATCH = int(os.environ.get("ASF_BENCH_BATCH", 128))


from asf_tpu.utils.timing import chain_timer  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from asf_tpu.config import get_cfg
    from asf_tpu.dsp.logmel import LogMelParams, log_mel_spectrogram
    from asf_tpu.engine.steps import make_input_pipeline
    from asf_tpu.ops.logmel_pallas import (
        PallasLogMel,
        _partial_mel,
        _resident_logmel,
        _round_up,
        frame_waveform,
    )

    cfg = get_cfg()
    cfg.TPU.USE_PALLAS_DSP = True
    cfg.TPU.DSP_PRECISION = "BFLOAT16"
    p = LogMelParams(cfg)
    pal = p.pallas
    clip = p.clip_samples
    t_frames = 1 + clip // p.hop
    t_pad = _round_up(t_frames, 8)

    rng = np.random.default_rng(0)
    wave = jnp.asarray(rng.standard_normal((BATCH, clip)).astype(np.float32) * 0.1)
    n_valid = jnp.full((BATCH,), clip, jnp.int32)

    print(f"batch {BATCH}, t_frames {t_frames} (pad {t_pad}), n_fft {p.n_fft}, "
          f"kf_res {pal.w_cos.shape[1]}", flush=True)

    sup = (pal.s0a, pal.s1a)
    t = chain_timer(
        lambda w: frame_waveform(
            w, t_pad, pal.hop, pal.n_fft, support=sup
        ).astype(jnp.bfloat16),
        wave,
    )
    print(f"frame      : {t*1e3:7.2f} ms  (support {pal.ksup}/{pal.n_fft})", flush=True)

    # resident kernel (frames rebuilt in-chain so timing includes nothing else)
    # production divisor search (logmel_pallas.py __call__): a hardcoded
    # r_tile silently skips the remainder rows when BATCH*t_pad is not a
    # multiple — the grid would cover only floor(rows/r_tile) tiles.
    def pick_r(cap):
        return next(r for r in range(cap, 7, -8) if (BATCH * t_pad) % r == 0)

    def res_only(w):
        f = frame_waveform(w, t_pad, pal.hop, pal.n_fft, support=sup)
        f = f.reshape(BATCH * t_pad, pal.ksup).astype(jnp.bfloat16)
        return _resident_logmel(
            f, pal.w_cos, pal.w_sin, pal.mel_w,
            k_chunk=pal.k_tile, r_tile=pick_r(256),
            precision=pal.precision, interpret=False, eps=1e-6,
        )

    t_res = chain_timer(res_only, wave)
    print(f"frame+res  : {t_res*1e3:7.2f} ms", flush=True)

    # partial-tile path for comparison (round-2 tiles: k=256, r<=512)
    pal2 = PallasLogMel(p.dft_w, p.mel_w, p.n_fft, p.hop,
                        compute_dtype=jnp.bfloat16, k_tile=256, r_tile_cap=512)
    pal2.resident = False

    def part_only(w):
        f = frame_waveform(w, t_pad, pal2.hop, pal2.n_fft, support=(pal2.s0a, pal2.s1a))
        f = f.reshape(BATCH * t_pad, pal2.ksup).astype(jnp.bfloat16)
        part = _partial_mel(
            f, pal2.w_cos, pal2.w_sin, pal2.mel_w,
            k_tile=256, r_tile=pick_r(512),
            precision=pal2.precision, interpret=False,
        )
        return jnp.log(jnp.sum(part, axis=0) + 1e-6)

    t_part = chain_timer(part_only, wave)
    print(f"frame+part : {t_part*1e3:7.2f} ms", flush=True)

    t = chain_timer(lambda w: log_mel_spectrogram(w, p, n_valid_samples=n_valid), wave)
    print(f"logmel     : {t*1e3:7.2f} ms  (+edge gather)", flush=True)

    pipeline = make_input_pipeline(cfg)
    t = chain_timer(lambda w: pipeline(w, n_valid, None, train=False)[1], wave)
    print(f"pipeline   : {t*1e3:7.2f} ms  (both pathways + channel)", flush=True)


if __name__ == "__main__":
    main()
