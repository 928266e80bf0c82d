"""One-off inference CLI: run a checkpoint on a single audio file.

TPU-native counterpart of the reference's ``tools/predict.py``
(/root/reference/audio_slowfast/tools/predict.py:25-92): loads a checkpoint,
computes the log-mel spectrogram of the given audio file (on device, instead
of host librosa), runs the fully-convolutional eval forward, and renders
verb/noun score heatmaps. Headless-friendly: figures are written to
``OUTPUT_DIR/predict_scores.png`` instead of ``plt.show()``.

Usage:
    python -m asf_tpu.tools.predict path/to/audio.wav --cfg cfg.yaml \
        TEST.CHECKPOINT_FILE_PATH checkpoints/SLOWFAST_EPIC.pyth
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

import numpy as np

from asf_tpu.config import get_cfg
from asf_tpu.utils.logging import get_logger, setup_logging

logger = get_logger(__name__)


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description="Run a trained model on one audio file."
    )
    parser.add_argument("path", help="The audio file (wav)")
    parser.add_argument("--cfg", dest="cfg_file", default=None, help="Config yaml")
    parser.add_argument(
        "--labels-dir",
        default="data/epic-kitchens-100-annotations",
        help="Directory with EPIC_100_{verb,noun}_classes.csv (optional)",
    )
    parser.add_argument(
        "opts",
        default=[],
        nargs="*",
        help="KEY VALUE config overrides (asf_tpu/config/defaults.py)",
    )
    if argv is None and len(sys.argv) == 1:
        parser.print_help()
    # argparse.REMAINDER (as the reference uses) would swallow --cfg when it
    # follows the positional audio path; parse_known_args keeps flag order
    # free and treats leftovers as KEY VALUE overrides.
    args, extra = parser.parse_known_args(argv)
    args.opts = list(args.opts) + list(extra)
    return args


def read_labels(fname):
    """Class-id -> key mapping from an EPIC classes csv (predict.py:18-22)."""
    with open(fname, newline="") as csvfile:
        return [d["key"] for d in csv.DictReader(csvfile)]


def resample_linear(wave: np.ndarray, sr: int, target_sr: int) -> np.ndarray:
    """Host-side linear resampling (the reference delegates to librosa.load)."""
    if sr == target_sr:
        return wave
    n_out = int(round(len(wave) * target_sr / sr))
    x_out = np.arange(n_out, dtype=np.float64) * (sr / target_sr)
    return np.interp(x_out, np.arange(len(wave), dtype=np.float64), wave).astype(
        np.float32
    )


def load_audio(cfg, path):
    """wav file -> list of on-device pathway tensors [(1, T/alpha, F, 1), ...].

    Mirrors predict.py:68-92 (librosa log-mel of the WHOLE file, edge-pad to
    at least NUM_FRAMES, pack pathways) but computes the spectrogram with the
    jitted on-device front end.
    """
    import jax.numpy as jnp

    from asf_tpu.data.vggsound import load_wav
    from asf_tpu.dsp.logmel import LogMelParams, log_mel_spectrogram
    from asf_tpu.dsp.pathways import slow_indices

    wave, sr = load_wav(path)
    if wave.ndim > 1:
        wave = wave.mean(axis=1)
    wave = resample_linear(wave, sr, cfg.AUDIO_DATA.SAMPLING_RATE)

    params = LogMelParams(cfg)
    n_frames = 1 + len(wave) // params.hop
    t_out = max(cfg.AUDIO_DATA.NUM_FRAMES, n_frames)
    # The SlowFast lateral fusions require T % ALPHA == 0 (stride-ALPHA fuse
    # convs must land on the slow pathway's grid); round down to the nearest
    # valid length for arbitrary-duration files.
    if cfg.MODEL.ARCH in cfg.MODEL.MULTI_PATHWAY_ARCH:
        t_out -= t_out % cfg.SLOWFAST.ALPHA
    spec = log_mel_spectrogram(
        jnp.asarray(wave[None]), params, out_frames=t_out
    )  # (1, T, F); frames past the signal are edge-replicated
    spec = spec[..., None]  # channel-last

    if cfg.MODEL.ARCH in cfg.MODEL.MULTI_PATHWAY_ARCH:
        idx = jnp.asarray(slow_indices(spec.shape[1], cfg.SLOWFAST.ALPHA))
        return [jnp.take(spec, idx, axis=1), spec]
    return [spec]


def main(argv=None):
    import jax

    from asf_tpu.checkpoint import manager as cu
    from asf_tpu.engine.steps import TrainState
    from asf_tpu.models import build_model
    from asf_tpu.utils.parser import load_config

    args = parse_args(argv)
    # load_config handles cfg_file=None and still applies KEY VALUE opts —
    # the reference's predict always merges opts too (predict.py parse_args).
    cfg = load_config(args)
    setup_logging(cfg.OUTPUT_DIR)

    if cfg.MODEL.MODEL_NAME == "AudioSlowFastGRU":
        raise SystemExit(
            "predict supports single-clip models only (the reference's "
            "predict.py likewise assumes AudioSlowFast); set "
            "MODEL.MODEL_NAME AudioSlowFast for one-off inference."
        )
    model = build_model(cfg)
    inputs = load_audio(cfg, args.path)
    variables = model.init(jax.random.PRNGKey(cfg.RNG_SEED), inputs, train=False)
    state = TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=None,
        step=0,
    )
    state = cu.load_test_checkpoint(cfg, state)

    preds = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        inputs,
        train=False,
    )
    if not isinstance(preds, (list, tuple)):
        preds = [preds]
    preds = [np.asarray(p) for p in preds]
    for p in preds:
        logger.info("pred shape=%s min=%.4f max=%.4f", p.shape, p.min(), p.max())

    names = ["verb", "noun"] if len(preds) > 1 else ["class"]
    label_files = {
        "verb": os.path.join(args.labels_dir, "EPIC_100_verb_classes.csv"),
        "noun": os.path.join(args.labels_dir, "EPIC_100_noun_classes.csv"),
    }

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, len(preds), figsize=(8 * len(preds), 10))
    if len(preds) == 1:
        axes = [axes]
    for ax, name, p in zip(axes, names, preds):
        scores = p.reshape(-1, p.shape[-1])
        ax.imshow(scores.T, aspect="auto")
        ax.set_title(name)
        lf = label_files.get(name)
        if lf and os.path.exists(lf):
            keys = read_labels(lf)
            ticks = np.linspace(0, len(keys) - 1, min(40, len(keys)), dtype=int)
            ax.set_yticks(ticks)
            ax.set_yticklabels(np.asarray(keys)[ticks])
        top = int(scores.sum(0).argmax())
        logger.info("top-1 %s class id: %d", name, top)
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    out = os.path.join(cfg.OUTPUT_DIR, "predict_scores.png")
    fig.savefig(out, bbox_inches="tight")
    logger.info("Saved score heatmaps to %s", out)
    return preds


if __name__ == "__main__":
    main()
