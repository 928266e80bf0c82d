"""Microbenchmark: SlowFast-R50 trunk+head forward vs full pipeline, and
batch scaling. Device-side scan chains (see bench.py on why)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from asf_tpu.utils.jax_setup import apply_platform_env

apply_platform_env()  # honour ASF_PLATFORM/ASF_CPU_DEVICES

from asf_tpu.utils.timing import chain_timer  # noqa: E402


def main():
    from asf_tpu.config import get_cfg
    from asf_tpu.engine.steps import make_input_pipeline
    from asf_tpu.models import build_model

    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "AudioSlowFast"
    cfg.MODEL.NUM_CLASSES = [309]
    cfg.RESNET.DEPTH = 50
    cfg.RESNET.NUM_BLOCK_TEMP_KERNEL = [[3, 3], [4, 4], [6, 6], [3, 3]]
    cfg.RESNET.FREQUENCY_STRIDES = [[1, 1], [2, 2], [2, 2], [2, 2]]
    cfg.RESNET.FREQUENCY_DILATIONS = [[1, 1], [1, 1], [1, 1], [1, 1]]
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg.TPU.USE_PALLAS_DSP = True
    cfg.TPU.DSP_PRECISION = "BFLOAT16"

    model = build_model(cfg)
    pipeline = make_input_pipeline(cfg)
    clip = int(round(cfg.AUDIO_DATA.SAMPLING_RATE * cfg.AUDIO_DATA.CLIP_SECS)) - 1
    rng = np.random.default_rng(0)

    for batch in (64, 128, 256):
        wave = jnp.asarray(rng.standard_normal((batch, clip)).astype(np.float32) * 0.1)
        nv = jnp.full((batch,), clip, jnp.int32)
        paths = pipeline(wave, nv, None, train=False)
        variables = model.init(jax.random.PRNGKey(0), paths, train=False)

        def model_only(x):
            t, f = x.shape[1], x.shape[2]
            fast = x[..., None]
            slow = fast[:, :: cfg.SLOWFAST.ALPHA]
            out = model.apply(variables, [slow, fast], train=False)
            return out[0] if isinstance(out, (tuple, list)) else out

        def full(w):
            out = model.apply(variables, pipeline(w, nv, None, train=False), train=False)
            return out[0] if isinstance(out, (tuple, list)) else out

        spec = jnp.squeeze(paths[1], -1)
        dt_m = chain_timer(model_only, spec)
        dt_f = chain_timer(full, wave)
        print(
            f"batch={batch:4d} model_only={dt_m*1e3:7.2f}ms ({batch/dt_m:9.0f} clips/s) "
            f"full={dt_f*1e3:7.2f}ms ({batch/dt_f:9.0f} clips/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
